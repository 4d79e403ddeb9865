#!/bin/bash
# sf100 full-suite capacity campaign, attempt 13 (round-11 continuation).
# Attempt 12 ran sole-tenant to 229/234 but lost five queries to ONE
# disk-capacity cascade, and the disk-sampler x query-timeline alignment
# attributes it precisely: attempts 8-12 dropped the RELEASE_PER_FAMILY /
# MIN_FREE_GB flags that made attempt 7 disk-FLAT, so lineage-pinned
# snapshot blocks from finished families ratcheted the free-space FLOOR
# down to ~13-15 GB (~48 GB dead-resident) by the q* family; every spiky
# query then dove from that floor to near-zero (q64 and text_bigram_lm
# died mid-shuffle at <1 GB free), and the sink family's ~16 GB of
# round-trip outputs on top of it ENOSPC'd three writes whose
# first-writer-wins memos then POISONED the in-suite retries (a failed
# write stayed marked written, so run 2 read a missing/empty dir or
# dropped table). Three fixes this attempt: (1) attempt 7's flags are
# RESTORED — family-boundary release bounds the floor, disk-low release
# at 20 GB is the in-family safety net; (2) Bench reaps each sink
# query's scratch via graft.sources.Sinks.cleanup; (3) the sink write
# memos heal on failure (remove memo + partial output, retry re-writes).
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=/root/repo/data/sf100
export SPARK_GRAFT_SHUFFLE=256
export SPARK_GRAFT_SNAPSHOT_LEVEL=DISK_ONLY
export SPARK_GRAFT_RDD_COMPRESS=true
export SPARK_GRAFT_SKIP_PREFIX=stream
export SPARK_GRAFT_RELEASE_PER_FAMILY=1
export SPARK_GRAFT_MIN_FREE_GB=20
export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf100_attempt13.json
(while true; do df -B1 / | tail -1 | awk '{print systime(), $4}'; sleep 10; done > /root/repo/disk_sf100_a13.log) &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null' EXIT
java -Xmx48g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/frozen_classes:/opt/spark/jars/*" graft.Bench \
  > /root/repo/sf100_a13_stdout.log 2> /root/repo/sf100_a13_stderr.log
echo "exit=$?" >> /root/repo/sf100_a13_stdout.log
