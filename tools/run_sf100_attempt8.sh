#!/bin/bash
# sf100 full-suite capacity campaign, attempt 8 (post cosine-assignment fix:
# normalized kNN seed/sub-seed matrices kill the norm-magnet skew that made
# ann_knn_graph's build CPU-bound for 53+ min in attempt 7).
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
export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf100_attempt8.json
(while true; do df -B1 / | tail -1 | awk '{print systime(), $4}'; sleep 10; done > /root/repo/disk_sf100_a8.log) &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null' EXIT
java -Xmx48g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > /root/repo/sf100_a8_stdout.log 2> /root/repo/sf100_a8_stderr.log
echo "exit=$?" >> /root/repo/sf100_a8_stdout.log
