#!/bin/bash
# Round-3: wait for the TPU service to leave its degraded episode, then
# reproduce the flagship benchmark (VERDICT r2 #1 asks for the >=2.05x +
# self-noise-parity config reproduced twice; the first clean run is in
# /tmp/r3_tpu/bench.log). Polls the trivial-matmul probe every 5 min;
# healthy = p50 < 8 ms (normal episodes measure 1-3 ms, degraded 130-250).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r3_tpu
for i in $(seq 1 120); do
  probe=$(timeout 300 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo/scripts")
from r3util import probe_ms
print(f"{probe_ms():.1f}")
EOF
)
  rc=$?
  echo "$(date +%H:%M:%S) attempt $i probe=${probe:-timeout} rc=$rc" >> /tmp/r3_tpu/bench2_wait.log
  if [ $rc -eq 0 ] && [ -n "$probe" ] && awk "BEGIN{exit !($probe < 8)}"; then
    echo "$(date +%H:%M:%S) healthy ($probe ms) — running bench2" >> /tmp/r3_tpu/bench2_wait.log
    timeout 2400 python bench.py > /tmp/r3_tpu/bench2.log 2>&1
    echo "$(date +%H:%M:%S) bench2 exit $?" >> /tmp/r3_tpu/bench2_wait.log
    # Only stop once a non-degraded benchmark line landed.
    if grep -q '"degraded_service": false' /tmp/r3_tpu/bench2.log; then
      echo "$(date +%H:%M:%S) clean bench2 captured — done" >> /tmp/r3_tpu/bench2_wait.log
      exit 0
    fi
  fi
  sleep 300
done
echo "gave up after 120 attempts" >> /tmp/r3_tpu/bench2_wait.log
exit 1
