#!/bin/bash
# Round-12 slope measurement chain — run ISOLATED (nothing else on the
# box): clean 2x e2e re-measure (the switched facade path), then the 4x
# rows for the three @Slow scale suites (VERDICT r11 Next-round #3).
set -x
cd /root/repo
echo "=== e2e 2x (clean) ==="
GRAFT_SCALE_MULT=2 sbt -batch "set Test/testOptions := Seq(); testOnly graft.E2eScaleSpec" 2>&1 | grep -E "e2e-50k|succeeded|failed"
echo "=== e2e 4x ==="
GRAFT_SCALE_MULT=4 SPARK_DRIVER_MEM=24g sbt -batch "set Test/testOptions := Seq(); testOnly graft.E2eScaleSpec" 2>&1 | grep -E "e2e-50k|succeeded|failed"
echo "=== dedup 4x ==="
GRAFT_SCALE_MULT=4 SPARK_DRIVER_MEM=24g sbt -batch "set Test/testOptions := Seq(); testOnly graft.DedupScaleSpec" 2>&1 | grep -E "DEDUPSCALE|succeeded|failed"
echo "=== streaming 4x ==="
GRAFT_SCALE_MULT=4 SPARK_DRIVER_MEM=24g sbt -batch "set Test/testOptions := Seq(); testOnly graft.StreamingScaleSpec" 2>&1 | grep -E "STREAMSCALE|succeeded|failed"
echo "=== done ==="
