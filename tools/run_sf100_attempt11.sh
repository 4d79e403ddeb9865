#!/bin/bash
# sf100 full-suite capacity campaign, attempt 11 (final r11 HEAD: windowed SemDeDup;
# cosine/stride kNN build 53 min -> ~10 min, and dedup_embedding's
# quadratic in-bucket self-join -> rank-windowed linear pairing; attempt 8
# was killed 50+ min into the OLD dedup_embedding to make room for this).
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
export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf100_attempt11.json
(while true; do df -B1 / | tail -1 | awk '{print systime(), $4}'; sleep 10; done > /root/repo/disk_sf100_a11.log) &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null' EXIT
java -Xmx48g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/frozen_classes:/opt/spark/jars/*" graft.Bench \
  > /root/repo/sf100_a11_stdout.log 2> /root/repo/sf100_a11_stderr.log
echo "exit=$?" >> /root/repo/sf100_a11_stdout.log
