#!/bin/bash
# Round-5 end-of-round zoo consistency pass: wait (bounded) for a healthy
# tunnel window (probe p50 < 40 ms), then rerun the FULL zoo in one
# process so PERF_ZOO.json rows share one episode. Each probe is itself
# time-bounded; after MAX_TRIES the zoo runs regardless (ratios are
# same-process per family either way).
cd /root/repo
MAX_TRIES=${MAX_TRIES:-10}
for i in $(seq 1 "$MAX_TRIES"); do
  P50=$(timeout 180 env PYTHONPATH=/root/repo:$PYTHONPATH python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp, numpy as np
x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
np.asarray(f(x))
ts = []
for _ in range(9):
    t0 = time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter() - t0)
print(int(sorted(ts)[4] * 1e3))
EOF
)
  echo "probe attempt $i: p50=${P50:-timeout}ms" >&2
  if [ -n "$P50" ] && [ "$P50" -lt 40 ] 2>/dev/null; then
    echo "healthy window (p50=${P50}ms) — running full zoo" >&2
    break
  fi
  sleep 240
done
exec python scripts/bench_zoo.py
