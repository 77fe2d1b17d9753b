#!/bin/bash
# Round-3 TPU measurement batch: run the moment the service is healthy.
# Each stage logs to /tmp/r3_tpu/<name>.log; stages are independent so a
# mid-batch degradation only loses the stage it hits.
set -u
mkdir -p /tmp/r3_tpu
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ===" | tee -a /tmp/r3_tpu/driver.log
  timeout 1800 "$@" > /tmp/r3_tpu/"$name".log 2>&1
  echo "--- $name exit $? at $(date +%H:%M:%S)" | tee -a /tmp/r3_tpu/driver.log
}

# 0. health gate
python - <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo/scripts")
from r3util import probe_ms
ms = probe_ms()
print(f"probe {ms:.2f} ms")
import os; sys.exit(0 if ms < float(os.environ.get("VIT_TPU_GATE_MS", "12")) else 1)
EOF
if [ $? -ne 0 ]; then echo "service degraded; aborting" ; exit 1; fi

run smoke       python scripts/tpu_smoke.py
run probe_int8  python scripts/probe_int8.py
run bench_quant python scripts/bench_quant.py
run bench       python bench.py
# VERDICT r2 #1: the flagship config must hold >=2.05x AND self-noise
# parity "reproduced twice" — run the benchmark a second time.
run bench2      python bench.py
echo "all done $(date +%H:%M:%S)" | tee -a /tmp/r3_tpu/driver.log
