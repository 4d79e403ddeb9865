#!/bin/bash
# sf100 full-suite capacity campaign, attempt 12 (round-11 continuation).
# Same recipe as attempt 11 (all r11 scale fixes: cosine+stride kNN build,
# windowed dedup_embedding/dedup_semantic), plus the hardened bench:
# abort-on-stopped-context, immediate error flushing, DONE lines, the
# host-calib field, and an EXPLICIT streaming exemption (the documented
# cost model: a replay-fed stream query's sf100 number would measure the
# benchmark's own replay build). Attempt 11 was killed by the session
# clock while sharing the box with attempt 10's still-live JVM for its
# first 40 minutes; this run owns the volume and the cores.
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
export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf100_attempt12.json
(while true; do df -B1 / | tail -1 | awk '{print systime(), $4}'; sleep 10; done > /root/repo/disk_sf100_a12.log) &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null' EXIT
java -Xmx48g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/frozen_classes:/opt/spark/jars/*" graft.Bench \
  > /root/repo/sf100_a12_stdout.log 2> /root/repo/sf100_a12_stderr.log
echo "exit=$?" >> /root/repo/sf100_a12_stdout.log
