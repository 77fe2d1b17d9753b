"""Benchmark: ViT-L/16 @224 bf16 inference throughput vs. the jit-compiled
reference (the BASELINE.json north-star metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference never calls jax.jit (SURVEY.md §6.3 item 21); the comparator
is its ``apply`` wrapped in jax.jit with dropout 0, per BASELINE.md. Parity
is checked by importing the reference's params into our layout and comparing
max-logit error (target <=1e-2).
"""

from __future__ import annotations

import json
import os
import sys
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


def timed_throughput(fn, *args, iters=ITERS, batch=BATCH):
    # Sync by pulling the LAST output to host: device execution is
    # serialized, so one device_get fences the whole queue. (On this
    # environment's tunneled backend, block_until_ready can return before
    # execution finishes — it under-reports fast models by >10x.)
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def timed_latency(fn, *args, iters=ITERS):
    """Per-iteration latencies with a per-iteration host sync.

    Unlike ``timed_throughput`` (pipelined; total/iters is a *mean*), each
    dispatch here is fenced individually so the samples are real and a
    percentile is meaningful. The per-dispatch tunnel round-trip (~1.1 ms,
    PERFORMANCE.md) is included in every sample.
    Returns (p50_seconds, p90_seconds)."""
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)), float(np.percentile(ts, 90))


def probe_service(threshold_ms=None, attempts=10, wait_s=150):
    """The tunneled TPU service has degraded episodes that poison every
    timing (observed: trivial matmuls hanging for minutes). Probe with a
    small matmul; if slow, wait and retry a few times so an unattended
    bench run lands on a healthy service when possible.
    ``VIT_TPU_PROBE_GATE_MS`` overrides the threshold (e.g. to take a
    ratio-only run in a marginal window instead of waiting 25 min)."""
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
        print(f"# probe matmul p50 {probe_ms:.1f} ms > {threshold_ms} — degraded "
              f"service, retry {i + 1}/{attempts} in {wait_s}s", file=sys.stderr)
        time.sleep(wait_s)
    return probe_ms, True


def _arm_watchdog(seconds=2700):
    """Hard wall-clock cap. During degraded tunnel episodes a single device
    call can BLOCK indefinitely (observed: trivial matmuls never returning
    for hours on 2026-08-17); a blocked PJRT call sits in C, so no Python
    signal/timeout can interrupt it. The watchdog thread emits one
    parseable failure line and exits the process rather than wedging the
    driver."""
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "ViT-L/16 @224 bf16 inference throughput (batch 128, 1 chip)",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"watchdog: no result within {seconds}s — degraded/hung "
                     "TPU service episode (see PERFORMANCE.md)",
        }), flush=True)
        os._exit(3)

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
    ref_ips, ref_lat = timed_throughput(ref_apply, ref_params, img)

    # --- ours, bf16, Pallas kernels, imported weights ---
    our_model = ViT(**CFG, dtype=jnp.bfloat16)
    our_params = import_reference_vit_params(ref_params, CFG["depth"])
    img_bf16 = img.astype(jnp.bfloat16)
    our_apply = jax.jit(lambda p, x: our_model.apply(p, x))
    our_ips, _ = timed_throughput(our_apply, our_params, img_bf16)
    our_p50, our_p90 = timed_latency(our_apply, our_params, img_bf16)
    # small-batch serving latency (BASELINE.md names p50 latency; batch-128
    # alone hides the small-batch dispatch floor)
    b1_p50, _ = timed_latency(our_apply, our_params, img_bf16[:1])
    b8_p50, _ = timed_latency(our_apply, our_params, img_bf16[:8])

    # --- parity on a small slice, calibrated per PARITY.md: the jitted
    # reference has exactly two observed execution classes (batch-8 and
    # batch>=16 compile to programs whose logits differ by the self-noise;
    # all batch>=16 programs agree bitwise — measured, scripts/
    # parity_unroll_probe.py era probes). Both are legitimate goldens;
    # distances to each are reported, and the benchmark-class (batch-128)
    # program — the one whose throughput is the baseline — is the primary
    # comparison. Ours is batch-invariant (b8 vs b128: 0.0).
    ref_logits = ref_apply(ref_params, img[:8])        # small-batch class
    ref_logits_b128 = ref_apply(ref_params, img)[:8]   # benchmark class
    self_noise = max_logit_err(ref_logits, ref_logits_b128)
    max_err = max_logit_err(our_apply(our_params, img_bf16[:8]), ref_logits)

    # --- mixed-precision mode (fp32 residual stream, bf16 MXU): tracks the
    # reference execution to within its own noise (PARITY.md) ---
    mixed_model = ViT(**CFG, dtype=jnp.bfloat16, residual_dtype=jnp.float32)
    mixed_apply = jax.jit(lambda p, x: mixed_model.apply(p, x))
    mixed_ips, _ = timed_throughput(mixed_apply, our_params, img)
    mixed_logits = mixed_apply(our_params, img[:8])
    mixed_err = max_logit_err(mixed_logits, ref_logits)
    mixed_err_bench_class = max_logit_err(mixed_logits, ref_logits_b128)

    # --- int8 serving mode (fused W8A8 kernels; a different accuracy point
    # than the parity configs — reported as the serving ceiling, measured
    # 1.5x the bf16 kernel path at batch 128 on 2026-08-18) ---
    int8_ips = None
    try:
        from vit_tpu.utils.quantize import quantize_vit, vit_apply_w8a8

        qvars = quantize_vit(our_params)
        q_apply = jax.jit(
            lambda v, x: vit_apply_w8a8(our_model, v, x, mode="w8a8_kernel")
        )
        int8_ips, _ = timed_throughput(q_apply, qvars, img_bf16)
    except Exception as e:  # never let the serving mode sink the headline
        print(f"# int8 mode skipped: {type(e).__name__}: {e}", file=sys.stderr)

    truth = fp64_vit_forward(
        jax.device_get(ref_params), np.asarray(img[:8]),
        patch_size=CFG["patch_size"], depth=CFG["depth"], heads=CFG["heads"],
    )
    ref_vs_truth = max_logit_err(ref_logits, truth)
    mixed_vs_truth = max_logit_err(mixed_logits, truth)

    watchdog.cancel()
    print(json.dumps({
        "metric": "ViT-L/16 @224 bf16 inference throughput (batch 128, 1 chip)",
        "value": round(our_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(our_ips / ref_ips, 3),
        "baseline_images_per_sec": round(ref_ips, 2),
        # true percentiles over individually-fenced iterations (not a mean)
        "p50_batch_latency_ms": round(our_p50 * 1e3, 2),
        "p90_batch_latency_ms": round(our_p90 * 1e3, 2),
        "p50_batch1_latency_ms": round(b1_p50 * 1e3, 2),
        "p50_batch8_latency_ms": round(b8_p50 * 1e3, 2),
        "baseline_latency_ms": round(ref_lat * 1e3, 2),
        "max_logit_err_vs_reference": round(max_err, 5),
        "mixed_precision_images_per_sec": round(mixed_ips, 2),
        "mixed_precision_vs_baseline": round(mixed_ips / ref_ips, 3),
        "mixed_precision_max_logit_err": round(mixed_err, 5),
        # distance to the BENCHMARK-class reference program (batch 128 —
        # the compilation whose throughput is the 1.00x baseline); the
        # field above is distance to its batch-8 recompilation, the other
        # legitimate golden. The two goldens differ by reference_self_noise.
        "mixed_precision_max_logit_err_vs_benchmark_class": round(mixed_err_bench_class, 5),
        # the north-star pair in one flag: a config >= 2x the baseline whose
        # distance to the golden is within the golden's own execution noise
        "flagship_mixed_meets_2x_and_self_noise_parity": bool(
            mixed_ips / ref_ips >= 2.0 and mixed_err_bench_class <= self_noise
        ),
        # calibration (PARITY.md): the reference's own execution noise and
        # both sides' distance from the exact fp64 function — the ≤1e-2
        # target vs one compilation is below the reference's self-noise
        "reference_self_noise": round(self_noise, 5),
        "reference_max_logit_err_vs_fp64": round(ref_vs_truth, 5),
        "mixed_precision_max_logit_err_vs_fp64": round(mixed_vs_truth, 5),
        # int8 fused-kernel serving mode (utils/quantize.py w8a8_kernel) —
        # the serving-throughput ceiling; not a parity config (max|dlogit|
        # ~0.11 vs bf16, see PERFORMANCE.md int8 section)
        "int8_kernel_images_per_sec": round(int8_ips, 2) if int8_ips else None,
        "int8_kernel_vs_baseline": round(int8_ips / ref_ips, 3) if int8_ips else None,
        # service-health probe (trivial-matmul p50 before timing anything;
        # a degraded tunnel episode poisons absolute numbers)
        "probe_matmul_p50_ms": round(probe_ms, 2),
        "degraded_service": degraded,
    }))


if __name__ == "__main__":
    main()
