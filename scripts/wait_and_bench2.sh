#!/bin/bash
# Round-3: reproduce the flagship benchmark (VERDICT r2 #1: the >=2.05x +
# self-noise-parity config, reproduced twice; first clean run is in
# /tmp/r3_tpu/bench.log) and then the int8 batch sweep.
#
# Polls the trivial-matmul probe every 5 min. A CLEAN window (p50 < 8 ms —
# healthy episodes measure 1-3 ms, degraded 14-250) gets the canonical run;
# if none appears within 2 h, one fallback run is taken in a merely-OK
# window (p50 < 60 ms): its ratios are still informative (ours and the
# reference time through the same tunnel in the same process) even though
# absolute img/s is depressed. The loop keeps hunting for a clean window
# either way.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r3_tpu
START=$(date +%s)
DEG_DONE=0
for i in $(seq 1 120); do
  probe=$(timeout 300 python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo/scripts")
from r3util import probe_ms
print(f"{probe_ms():.1f}")
EOF
)
  rc=$?
  now=$(date +%s); elapsed=$(( (now - START) / 60 ))
  echo "$(date +%H:%M:%S) attempt $i probe=${probe:-timeout} rc=$rc elapsed=${elapsed}m" >> /tmp/r3_tpu/bench2_wait.log
  if [ $rc -eq 0 ] && [ -n "$probe" ]; then
    if awk "BEGIN{exit !($probe < 8)}"; then
      echo "$(date +%H:%M:%S) CLEAN window ($probe ms) — bench2" >> /tmp/r3_tpu/bench2_wait.log
      timeout 2400 python bench.py > /tmp/r3_tpu/bench2.log 2>&1
      echo "$(date +%H:%M:%S) bench2 exit $?" >> /tmp/r3_tpu/bench2_wait.log
      if grep -q '"degraded_service": false' /tmp/r3_tpu/bench2.log; then
        echo "$(date +%H:%M:%S) clean bench2 captured — running int8 sweep" >> /tmp/r3_tpu/bench2_wait.log
        timeout 2400 python scripts/bench_quant.py sweep > /tmp/r3_tpu/quant_sweep.log 2>&1
        echo "$(date +%H:%M:%S) sweep exit $? — done" >> /tmp/r3_tpu/bench2_wait.log
        exit 0
      fi
    elif [ "$DEG_DONE" -eq 0 ] && [ "$elapsed" -ge 120 ] && awk "BEGIN{exit !($probe < 60)}"; then
      echo "$(date +%H:%M:%S) fallback window ($probe ms) — degraded bench2" >> /tmp/r3_tpu/bench2_wait.log
      timeout 2400 python bench.py > /tmp/r3_tpu/bench2_degraded.log 2>&1
      echo "$(date +%H:%M:%S) degraded bench2 exit $?" >> /tmp/r3_tpu/bench2_wait.log
      DEG_DONE=1
    fi
  fi
  sleep 300
done
echo "gave up after 120 attempts" >> /tmp/r3_tpu/bench2_wait.log
exit 1
