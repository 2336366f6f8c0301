#!/bin/bash
# Post-fix TPU measurement batch (run from the repo root, one at a time —
# two TPU clients contend). Writes one log per stage under /tmp/tpubatch.
set -x
mkdir -p /tmp/tpubatch
cd /root/repo
timeout 1200 python -u benchmarks/check_exactness.py 20000 512 8  > /tmp/tpubatch/exact512.log 2>&1
timeout 1200 python -u benchmarks/check_exactness.py 20000 1024 8 > /tmp/tpubatch/exact1024.log 2>&1
timeout 1500 python -u benchmarks/bisect_delta.py 20000 512 64    > /tmp/tpubatch/bisect.log 2>&1
timeout 1800 python -u benchmarks/bench_scale.py 100000 1024      > /tmp/tpubatch/scale100k.log 2>&1
timeout 3000 python -u benchmarks/bench_scale.py 500000 2048 0.1  > /tmp/tpubatch/scale500k.log 2>&1
timeout 1800 python -u bench.py                                   > /tmp/tpubatch/bench.log 2>&1
tail -2 /tmp/tpubatch/*.log
