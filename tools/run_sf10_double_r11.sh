#!/bin/bash
# Quiesced-volume back-to-back sf10 double run (the r10 verdict's ask #7):
# the r10 sf10 numbers carried unreproducible per-query inflations from
# I/O contention; two identical runs on an otherwise idle box establish
# the steady sf10 reference, with per-query deltas expected <1.5x. Runs
# STRICTLY AFTER the sf100 campaign exits (one JVM per box, full stop).
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
export SPARK_GRAFT_RDD_COMPRESS=true
for run in 1 2; do
  export SPARK_GRAFT_BENCH_OUT=/root/repo/bench_sf10_r11_run$run.json
  java -Xmx16g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/root/repo/target/frozen_classes:/opt/spark/jars/*" graft.Bench \
    > /root/repo/sf10_r11_run${run}_stdout.log 2> /root/repo/sf10_r11_run${run}_stderr.log
  echo "exit=$?" >> /root/repo/sf10_r11_run${run}_stdout.log
done
