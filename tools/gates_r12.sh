#!/bin/bash
# Round-12 close-out gates, sequential: timed 2-way-sharded verify at
# sf0.01 (the new documented default), sharded sf0.1 sweep, full test
# suite (both tiers), entry smoke, then the bench record last (isolated).
set -x
cd /root/repo
echo "=== sharded verify sf0.01 (timed) ==="
T0=$(date +%s)
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r12_final shard:0/2" > /tmp/vshard0.log 2>&1 &
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r12_final shard:1/2" > /tmp/vshard1.log 2>&1 &
wait
T1=$(date +%s)
echo "SHARDED_DUMP_SECONDS=$((T1-T0))"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_r12_final 2>&1 | tail -3
T2=$(date +%s)
echo "TOTAL_VERIFY_SECONDS=$((T2-T0))"
echo "=== sharded sweep sf0.1 ==="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_r12_sf01 shard:0/2" > /tmp/wshard0.log 2>&1 &
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_r12_sf01 shard:1/2" > /tmp/wshard1.log 2>&1 &
wait
python3 tools/compare.py /root/testdata/sf0.1 /tmp/verify_r12_sf01 > SWEEP_r12_sf01.log 2>&1
tail -3 SWEEP_r12_sf01.log
echo "=== full test suite (both tiers) ==="
sbt -batch "set Test/testOptions := Seq(); test" 2>&1 | grep -E "Tests:|All tests|TESTS FAILED|error" | tail -5
echo "=== entry smoke ==="
sbt -batch "runMain graft.EntrySmoke" 2>&1 | grep ENTRY
echo "=== bench sf0.1 (committed record) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
echo "=== done ==="
