#!/bin/bash
# r16: the sf100 board tail — every batch registry entry without an
# sf100 number or a named exclusion (VERDICT r15 item 4 / missing #2).
# Ordered CHEAPEST-FIRST (sf10 wall ascending) so a deadline cut still
# maximizes coverage; anchors q104/q07 lead for the window stamp.
# RUNS=1 WARM=0, partitions=320, 48g, zstd (r15f protocol).
set -u
cd /root/repo
TAIL=$(cat target/tail_list.txt)
SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_SF_DIR=target/sf100 \
SPARK_GRAFT_BENCH_PARTITIONS=320 \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_WARM=0 \
SPARK_GRAFT_BENCH_ONLY="$TAIL" \
sbt "runMain graft.Bench" > target/sf100_tail.log 2>&1
echo "EXIT=$?"
