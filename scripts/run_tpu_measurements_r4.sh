#!/bin/bash
# Round-4 TPU measurement batch.
#
# VERDICT r3 #8: the ledger must not be able to drift from the raw logs —
# so this runner writes every log AND the exact command line straight into
# measurements/r4/ at run time. `measurements/r4/MANIFEST.tsv` records
# (name, exact command, exit code, wall seconds, start time) per stage; the
# README's quoted numbers must come from these files and nowhere else.
#
# Stages are independent: a mid-batch degraded episode only loses the stage
# it hits. bench.py itself is degradation-proof since round 4 (gate 3x45s,
# then measures anyway), so there is no health gate here.
set -u
LEDGER=/root/repo/measurements/r4
mkdir -p "$LEDGER"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

MANIFEST="$LEDGER/MANIFEST.tsv"
[ -f "$MANIFEST" ] || printf 'name\tcommand\texit\twall_s\tstarted\n' > "$MANIFEST"

# Optional stage selection: `run_tpu_measurements_r4.sh bench bench2`
# runs only those stages (default: all).
ONLY="$*"

run() {
  name=$1; shift
  if [ -n "$ONLY" ]; then
    case " $ONLY " in *" $name "*) ;; *) return ;; esac
  fi
  start=$(date +%H:%M:%S)
  t0=$SECONDS
  timeout "${STAGE_TIMEOUT:-1800}" "$@" > "$LEDGER/$name.log" 2>&1
  rc=$?
  printf '%s\t%s\t%d\t%d\t%s\n' "$name" "$*" "$rc" "$((SECONDS - t0))" "$start" >> "$MANIFEST"
  echo "$name: exit $rc ($((SECONDS - t0))s)"
}

run bench        python bench.py
run bench2       python bench.py
run int8_acc     python scripts/int8_accuracy_r4.py
run zoo_tail_ab  python scripts/tune_zoo_tail_r4b.py
run serve_load   python scripts/serve_load_r4.py
run convergence  python scripts/convergence_r4.py
run zoo          python scripts/bench_zoo.py vit simple_vit deepvit t2t vit_small_datasets twins_svt region_vit crossformer
echo "all done $(date +%H:%M:%S)"
