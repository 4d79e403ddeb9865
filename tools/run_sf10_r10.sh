#!/bin/bash
# Full-suite sf10 re-measure at round-10 HEAD (r8 close: 615.5 s; mid-round 534.7 s)
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=/root/repo/data/sf10
export SPARK_GRAFT_SHUFFLE=128
export SPARK_GRAFT_SNAPSHOT_LEVEL=DISK_ONLY
export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10_r10.json
java -Xmx16g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/frozen_classes:/opt/spark/jars/*" graft.Bench \
  > /root/repo/sf10_r10_stdout.log 2> /root/repo/sf10_r10_stderr.log
echo "exit=$?" >> /root/repo/sf10_r10_stdout.log
