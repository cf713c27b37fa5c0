#!/bin/bash
# Solo/batched sf100 Bench runs, r16 protocol (r15f): RUNS=1 WARM=0,
# partitions=320, 48g driver, zstd shuffle. Usage:
#   tools/sf100_run.sh <label> <comma-separated-query-list>
set -u
cd /root/repo
LABEL=$1; QUERIES=$2
SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_SF_DIR=target/sf100 \
SPARK_GRAFT_BENCH_PARTITIONS=320 \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_WARM=0 \
SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
sbt "runMain graft.Bench" > "target/sf100_${LABEL}.log" 2>&1
echo "EXIT=$? LABEL=$LABEL"
grep -E "\[bench\] done" "target/sf100_${LABEL}.log"
