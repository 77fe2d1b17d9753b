"""Benchmark: ViT-L/16 @224 bf16 inference throughput vs. the jit-compiled
reference (the BASELINE.json north-star metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference never calls jax.jit (SURVEY.md §6.3 item 21); the comparator
is its ``apply`` wrapped in jax.jit with dropout 0, per BASELINE.md. Parity
is checked by importing the reference's params into our layout and comparing
max-logit error (target <=1e-2).

Time budget (round-4 redesign — BENCH_r03.json was empty because the old
probe gate alone could eat 26 min of the driver's ~30-min budget):
  * the service-health gate is capped at PROBE_ATTEMPTS x PROBE_WAIT_S
    (~2 min worst case); on exhaustion we MEASURE ANYWAY — two independent
    round-3 runs showed vs_baseline stable to 3 decimals through degraded
    episodes (measurements/r3/bench.log vs bench2.log: 2.164/2.163x,
    2.086/2.087x) because ours and the reference time through the same
    tunnel. ``degraded_service`` + ``probe_matmul_p50_ms`` stay as flags.
  * the watchdog fires at WATCHDOG_S and prints the BEST PARTIAL result
    (stages below fill RESULTS incrementally, flagship fields first) with
    ``watchdog_fired: true`` instead of wedging the driver.
  * under a degraded episode the timing loops shrink (ITERS_DEGRADED) —
    the ratio is what matters and it is iteration-count-stable.
tests/test_bench_budget.py asserts the worst-case wall arithmetic stays
under 1700 s (< the driver's ~1800 s kill).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

CFG = dict(
    image_size=224, patch_size=16, num_classes=1000,
    dim=1024, depth=24, heads=16, mlp_dim=4096,
)
BATCH = 128
ITERS = 20
ITERS_DEGRADED = 8   # ratios are iteration-count-stable (measurements/r3)
PROBE_ATTEMPTS = 3   # gate worst case: 3 probes (~15 s) + 2 waits
PROBE_WAIT_S = 45
WATCHDOG_S = 1200    # covers gate + measurement; < driver budget by >=600 s

# Filled incrementally, flagship fields first, so a watchdog firing mid-run
# still reports everything measured so far.
RESULTS: dict = {
    "metric": "ViT-L/16 @224 bf16 inference throughput (batch 128, 1 chip)",
    "value": 0.0,
    "unit": "images/sec/chip",
    "vs_baseline": 0.0,
}
_EMITTED = threading.Lock()


def _emit(extra: dict | None = None) -> None:
    """Print the single JSON result line exactly once (main or watchdog)."""
    if not _EMITTED.acquire(blocking=False):
        return
    out = dict(RESULTS)
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def timed_throughput(fn, *args, iters=None, batch=BATCH):
    # Sync by pulling the LAST output to host: device execution is
    # serialized, so one device_get fences the whole queue. (On this
    # environment's tunneled backend, block_until_ready can return before
    # execution finishes — it under-reports fast models by >10x.)
    iters = iters or ITERS
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def timed_latency(fn, *args, iters=None):
    """Per-iteration latencies with a per-iteration host sync.

    Unlike ``timed_throughput`` (pipelined; total/iters is a *mean*), each
    dispatch here is fenced individually so the samples are real and a
    percentile is meaningful. The per-dispatch tunnel round-trip (~1.1 ms,
    PERFORMANCE.md) is included in every sample.
    Returns (p50_seconds, p90_seconds)."""
    iters = iters or ITERS
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)), float(np.percentile(ts, 90))


def probe_service(threshold_ms=None, attempts=PROBE_ATTEMPTS, wait_s=PROBE_WAIT_S):
    """The tunneled TPU service has degraded episodes that depress every
    absolute timing. Probe with a small matmul; if slow, wait briefly and
    retry so an unattended run lands on a healthy service when possible —
    but NEVER gate the measurement on health: on exhaustion the caller
    measures anyway (ratios are episode-stable, see module docstring).
    ``VIT_TPU_PROBE_GATE_MS`` optionally overrides the retry threshold."""
    if threshold_ms is None:
        threshold_ms = float(os.environ.get("VIT_TPU_PROBE_GATE_MS", "8"))
    f = jax.jit(lambda a: a @ a)
    x = jnp.ones((2048, 2048), jnp.bfloat16)
    probe_ms = None
    for i in range(attempts):
        np.asarray(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        probe_ms = float(np.percentile(ts, 50) * 1e3)
        if probe_ms <= threshold_ms:
            # the reported degraded flag stays anchored to the canonical
            # 8 ms bar even when the retry gate was overridden wider
            return probe_ms, probe_ms > 8.0
        if i + 1 < attempts:
            print(f"# probe matmul p50 {probe_ms:.1f} ms > {threshold_ms} — "
                  f"degraded service, retry {i + 1}/{attempts} in {wait_s}s",
                  file=sys.stderr)
            time.sleep(wait_s)
    print(f"# probe gate exhausted at p50 {probe_ms:.1f} ms — measuring "
          "anyway (ratios are episode-stable; absolutes depressed)",
          file=sys.stderr)
    return probe_ms, True


def _arm_watchdog(seconds=WATCHDOG_S):
    """Hard wall-clock cap armed before ANY device call. During degraded
    tunnel episodes a single device call can BLOCK indefinitely (observed:
    trivial matmuls never returning for hours on 2026-08-17); a blocked PJRT
    call sits in C, so no Python signal/timeout can interrupt it. The
    watchdog thread emits the best PARTIAL result line (RESULTS is filled
    flagship-first) and exits rather than wedging the driver."""

    def fire():
        _emit({
            "watchdog_fired": True,
            "error": f"watchdog: run exceeded {seconds}s — degraded/hung "
                     "TPU service episode (see PERFORMANCE.md); fields "
                     "present were measured before the cutoff",
        })
        # Deliberately exit 0: the driver must parse the partial JSON line
        # (round 3's rc=124 produced parsed=null and lost the round's perf
        # record). A watchdog run is unmistakable in-band instead:
        # watchdog_fired=true, the error field, and value/vs_baseline left
        # at 0.0 unless they were measured before the cutoff.
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    from vit_tpu.models import ViT
    from vit_tpu.utils import (
        enable_compilation_cache,
        fp64_vit_forward,
        import_reference_vit_params,
        max_logit_err,
    )

    watchdog = _arm_watchdog()
    enable_compilation_cache()  # repeat runs skip the (tunneled) compile
    probe_ms, degraded = probe_service()
    iters = ITERS_DEGRADED if degraded else ITERS
    RESULTS.update(probe_matmul_p50_ms=round(probe_ms, 2),
                   degraded_service=degraded, timing_iters=iters)

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.float32)

    # --- reference, jit-compiled, fp32 (it has no dtype control) ---
    sys.path.insert(0, "/root/reference/vit_flax")
    import vit as ref_vit  # noqa: E402

    ref_model = ref_vit.ViT(**CFG, dropout=0.0, emb_dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
            "emb_dropout": jax.random.PRNGKey(3)}
    # jit the init too: eager init dispatches per-op (pathological over the
    # TPU tunnel in this environment)
    ref_params = jax.jit(lambda: ref_model.init(rngs, img[:1]))()
    ref_apply = jax.jit(lambda p, x: ref_model.apply(p, x, rngs=rngs))
    ref_ips, ref_lat = timed_throughput(ref_apply, ref_params, img, iters=iters)
    RESULTS.update(baseline_images_per_sec=round(ref_ips, 2),
                   baseline_latency_ms=round(ref_lat * 1e3, 2))

    # Parity goldens, calibrated per PARITY.md: the jitted reference has
    # exactly two observed execution classes (batch-8 and batch>=16 compile
    # to programs whose logits differ by the self-noise; all batch>=16
    # programs agree bitwise — measured, scripts/parity_unroll_probe.py-era
    # probes). Both are legitimate goldens; distances to each are reported,
    # and the benchmark-class (batch-128) program — the one whose throughput
    # is the baseline — is the primary comparison. Ours is batch-invariant.
    ref_logits_b128 = ref_apply(ref_params, img)[:8]   # benchmark class
    ref_logits = ref_apply(ref_params, img[:8])        # small-batch class
    self_noise = max_logit_err(ref_logits, ref_logits_b128)
    RESULTS["reference_self_noise"] = round(self_noise, 5)

    # --- mixed-precision flagship FIRST (fp32 residual stream, bf16 MXU):
    # the north-star config — tracks the reference execution to within its
    # own noise (PARITY.md) at >=2x its throughput ---
    our_params = import_reference_vit_params(ref_params, CFG["depth"])
    mixed_model = ViT(**CFG, dtype=jnp.bfloat16, residual_dtype=jnp.float32)
    mixed_apply = jax.jit(lambda p, x: mixed_model.apply(p, x))
    mixed_ips, _ = timed_throughput(mixed_apply, our_params, img, iters=iters)
    mixed_logits = mixed_apply(our_params, img[:8])
    mixed_err = max_logit_err(mixed_logits, ref_logits)
    mixed_err_bench_class = max_logit_err(mixed_logits, ref_logits_b128)
    RESULTS.update({
        "mixed_precision_images_per_sec": round(mixed_ips, 2),
        "mixed_precision_vs_baseline": round(mixed_ips / ref_ips, 3),
        "mixed_precision_max_logit_err": round(mixed_err, 5),
        # distance to the BENCHMARK-class reference program (batch 128 —
        # the compilation whose throughput is the 1.00x baseline); the
        # field above is distance to its batch-8 recompilation, the other
        # legitimate golden. The two goldens differ by reference_self_noise.
        "mixed_precision_max_logit_err_vs_benchmark_class":
            round(mixed_err_bench_class, 5),
        # the north-star pair in one flag: a config >= 2x the baseline whose
        # distance to the golden is within the golden's own execution noise
        "flagship_mixed_meets_2x_and_self_noise_parity": bool(
            mixed_ips / ref_ips >= 2.0 and mixed_err_bench_class <= self_noise
        ),
    })

    # --- ours, bf16 end-to-end, Pallas kernels, imported weights (the
    # headline `value`; fastest full-precision-weights config) ---
    our_model = ViT(**CFG, dtype=jnp.bfloat16)
    img_bf16 = img.astype(jnp.bfloat16)
    our_apply = jax.jit(lambda p, x: our_model.apply(p, x))
    our_ips, _ = timed_throughput(our_apply, our_params, img_bf16, iters=iters)
    max_err = max_logit_err(our_apply(our_params, img_bf16[:8]), ref_logits)
    RESULTS.update({
        "value": round(our_ips, 2),
        "vs_baseline": round(our_ips / ref_ips, 3),
        "max_logit_err_vs_reference": round(max_err, 5),
    })

    # --- MFU (VERDICT r4 #7): analytic model FLOPs/img over the chip's
    # measured bf16 peak (197 TF/s, PERFORMANCE.md "speed of light"), so the
    # flagship number is normalizable across degraded-service episodes and
    # future hardware. 2 FLOPs per MAC; attention counted at its quadratic
    # cost (QK^T + PV), patchify + head included. ---
    n_tok = (CFG["image_size"] // CFG["patch_size"]) ** 2 + 1
    _d, _mlp, _depth = CFG["dim"], CFG["mlp_dim"], CFG["depth"]
    flops_img = (
        2 * n_tok * (CFG["patch_size"] ** 2 * 3) * _d           # patchify GEMM
        + _depth * (
            8 * n_tok * _d * _d                                 # qkv + out proj
            + 4 * n_tok * n_tok * _d                            # QK^T + PV
            + 4 * n_tok * _d * _mlp                             # MLP pair
        )
        + 2 * _d * CFG["num_classes"]                           # classifier
    )
    peak_tflops = float(os.environ.get("VIT_TPU_PEAK_BF16_TFLOPS", "197"))
    achieved_tflops = our_ips * flops_img / 1e12
    RESULTS.update({
        "model_gflops_per_image": round(flops_img / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "peak_bf16_tflops_assumed": peak_tflops,
        "mfu": round(achieved_tflops / peak_tflops, 4),
    })

    # --- latency percentiles (true per-iteration fences, not a mean);
    # small-batch rows expose the dispatch floor batch-128 hides ---
    our_p50, our_p90 = timed_latency(our_apply, our_params, img_bf16, iters=iters)
    b1_p50, _ = timed_latency(our_apply, our_params, img_bf16[:1], iters=iters)
    b8_p50, _ = timed_latency(our_apply, our_params, img_bf16[:8], iters=iters)
    RESULTS.update({
        "p50_batch_latency_ms": round(our_p50 * 1e3, 2),
        "p90_batch_latency_ms": round(our_p90 * 1e3, 2),
        "p50_batch1_latency_ms": round(b1_p50 * 1e3, 2),
        "p50_batch8_latency_ms": round(b8_p50 * 1e3, 2),
    })

    # --- int8 serving mode (fused W8A8 kernels; a different accuracy point
    # than the parity configs — the serving-throughput ceiling; accuracy
    # characterized statistically in PERFORMANCE.md int8 section) ---
    try:
        from vit_tpu.utils.quantize import quantize_vit, vit_apply_w8a8

        qvars = quantize_vit(our_params)
        q_apply = jax.jit(
            lambda v, x: vit_apply_w8a8(our_model, v, x, mode="w8a8_kernel")
        )
        int8_ips, _ = timed_throughput(q_apply, qvars, img_bf16, iters=iters)
        RESULTS.update(int8_kernel_images_per_sec=round(int8_ips, 2),
                       int8_kernel_vs_baseline=round(int8_ips / ref_ips, 3))
    except Exception as e:  # never let the serving mode sink the headline
        print(f"# int8 mode skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # --- fp64 ground truth (pure host NumPy — tunnel-immune; last because
    # everything above is flagship-critical and this is calibration) ---
    truth = fp64_vit_forward(
        jax.device_get(ref_params), np.asarray(img[:8]),
        patch_size=CFG["patch_size"], depth=CFG["depth"], heads=CFG["heads"],
    )
    RESULTS.update({
        "reference_max_logit_err_vs_fp64":
            round(max_logit_err(ref_logits, truth), 5),
        "mixed_precision_max_logit_err_vs_fp64":
            round(max_logit_err(mixed_logits, truth), 5),
    })

    watchdog.cancel()
    _emit()


if __name__ == "__main__":
    main()
