#!/bin/bash
# Round-14 green check + baseline: test -> Verify(sf0.01) -> oracle compare -> Bench(sf0.1)
cd /root/repo
echo "=== PHASE 1: sbt test + Verify sf0.01 ==="
SPARK_GRAFT_CPUS=8 sbt -batch "test" "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r14_base" 2>&1 | tail -40
echo "=== PHASE 2: oracle compare ==="
python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_r14_base > /tmp/compare_r14_base.txt 2>&1
tail -8 /tmp/compare_r14_base.txt
echo "=== PHASE 3: baseline bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"|\[bench\]' | tail -20
echo "=== DONE ==="
