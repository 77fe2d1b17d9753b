#!/bin/bash
# Round-3 measurement queue — run when the TPU tunnel is healthy
# (probe p50 < ~5 ms; check /tmp/tpu_status.log). Each step logs to
# /tmp/r3_logs/. Ordered by priority: flagship mixed diagnosis first.
set -x
mkdir -p /tmp/r3_logs
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 1200 python -u scripts/tune_mixed_r3.py    2>&1 | grep -v WARNING | tee /tmp/r3_logs/mixed.log
timeout 1200 python -u scripts/tune_attn_core_r3.py 2>&1 | grep -v WARNING | tee /tmp/r3_logs/attn_core.log
timeout 1800 python -u scripts/bench_zoo.py cvt levit 2>&1 | grep -v WARNING | tee /tmp/r3_logs/zoo_bn.log
timeout 1800 python -u scripts/profile_scalable.py 2>&1 | grep -v WARNING | tee /tmp/r3_logs/scalable.log
timeout 1800 python -u bench.py                    2>&1 | grep -v WARNING | tee /tmp/r3_logs/bench.log
timeout 900  python -u scripts/tpu_smoke.py        2>&1 | grep -v WARNING | tee /tmp/r3_logs/smoke.log
timeout 1800 python -u scripts/bench_train.py converge 2>&1 | grep -v WARNING | tee /tmp/r3_logs/converge.log
