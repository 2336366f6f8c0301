#!/bin/bash
# Round-3 post-fix TPU measurement batch, highest-value-first so a
# mid-batch tunnel drop still leaves the headline on disk. One TPU
# client at a time (two contend). One log per stage under /tmp/tpubatch.
set -x
mkdir -p /tmp/tpubatch
cd /root/repo
timeout 1200 python -u bench.py                                   > /tmp/tpubatch/bench.log 2>&1
timeout  900 python -u benchmarks/check_exactness.py 20000 512 8  > /tmp/tpubatch/exact512.log 2>&1
timeout  900 python -u benchmarks/check_exactness.py 20000 1024 8 > /tmp/tpubatch/exact1024.log 2>&1
timeout  900 python -u benchmarks/check_exactness.py 20000 2048 8 > /tmp/tpubatch/exact2048.log 2>&1
timeout 1200 python -u benchmarks/bench_scale.py 100000 1024      > /tmp/tpubatch/scale100k.log 2>&1
timeout 1200 python -u benchmarks/mfu_report.py                   > /tmp/tpubatch/mfu.log 2>&1
timeout 1500 python -u benchmarks/bisect_delta.py 20000 512 64    > /tmp/tpubatch/bisect.log 2>&1
tail -2 /tmp/tpubatch/*.log
