#!/bin/bash
set -x
cd /root/repo
sbt "runMain graft.GenScale /root/testdata/sf0.1 target/sf100 1000" > target/gen_sf100.log 2>&1
sbt "runMain graft.GenScale /root/testdata/sf0.1 target/sf10 100" > target/gen_sf10.log 2>&1
sbt "runMain graft.GenScale /root/testdata/sf0.1 target/sf1 10" > target/gen_sf1.log 2>&1
echo DONE_ALL
