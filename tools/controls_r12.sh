#!/bin/bash
# Round-12 same-code 2x controls + louvain attribution probe — run
# ISOLATED. The 4x rows were measured against r11's 2x numbers
# (cross-round); these re-measure 2x on final r12 code so each slope is
# same-code, then attribute the distributed-louvain stage.
set -x
cd /root/repo
echo "=== dedup 2x control ==="
GRAFT_SCALE_MULT=2 SPARK_DRIVER_MEM=24g sbt -batch "set Test/testOptions := Seq(); testOnly graft.DedupScaleSpec" 2>&1 | grep -E "DEDUPSCALE|succeeded|failed"
echo "=== streaming 2x control ==="
GRAFT_SCALE_MULT=2 SPARK_DRIVER_MEM=24g sbt -batch "set Test/testOptions := Seq(); testOnly graft.StreamingScaleSpec" 2>&1 | grep -E "STREAMSCALE|succeeded|failed"
echo "=== louvain probe (100k/200k, GRAFT_TIMING) ==="
echo ":paste /tmp/louvain_probe.scala" | GRAFT_TIMING=1 /opt/spark/bin/spark-shell \
  --master 'local[32]' \
  --driver-memory 24g \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=16 \
  --jars target/scala-2.13/scarfspark_2.13-0.1.0.jar 2>&1 | grep -E "DLOUVAIN|probe"
echo "=== done ==="
