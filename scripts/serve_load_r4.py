"""Round-4 serving-under-load benchmark (VERDICT r3 item 7).

Drives ``BatchingServer`` with OPEN-LOOP Poisson arrivals (arrival times are
pre-drawn; a slow server cannot slow the generator down, so queueing shows
up as latency, exactly like production) at three offered loads spanning the
host's measured decode ceiling (~156-188 img/s on this 1-core VM,
PERFORMANCE.md Serving), and reports end-to-end p50/p99 latency (submit ->
logits row) plus achieved throughput. A ``max_wait_ms`` sweep at the middle
load justifies the 5 ms default.

Model: ViT-L/16 @224 bf16 (the flagship serving config), batch-64 pipeline,
320x480 JPEG requests through the native decoder.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/serve_load_r4.py
"""

import io
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

CFG = dict(image_size=224, patch_size=16, num_classes=1000,
           dim=1024, depth=24, heads=16, mlp_dim=4096)
N_JPEGS = 256          # unique payloads, cycled
N_REQ = 1500           # requests per load point
LOADS = (50, 120, 250)  # offered img/s: comfortable / near-ceiling / over
WAIT_SWEEP_MS = (1.0, 5.0, 20.0)


def make_jpegs(n, h=320, w=480, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        out.append(buf.getvalue())
    return out


def run_load(server, jpegs, rate, n_req, seed=1):
    """Open-loop Poisson at ``rate`` req/s; returns latency samples + wall."""
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_req))
    done_at = [None] * n_req
    futures = []
    t0 = time.perf_counter()
    for i in range(n_req):
        now = time.perf_counter() - t0
        if arrivals[i] > now:
            time.sleep(arrivals[i] - now)
        ts = time.perf_counter()
        f = server.submit(jpegs[i % len(jpegs)])
        # resolution timestamped by the resolver thread, not by when this
        # (possibly lagging) collection loop gets around to .result()
        f.add_done_callback(
            lambda _f, i=i: done_at.__setitem__(i, time.perf_counter())
        )
        futures.append((ts, f))
    for _, f in futures:
        f.result(timeout=300)
    wall = time.perf_counter() - t0
    lat = np.array([done_at[i] - futures[i][0] for i in range(n_req)])
    return lat, wall


def stats(lat, wall, n_req, rate):
    return {
        "offered_ips": rate,
        "achieved_ips": round(n_req / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 1),
        "max_ms": round(float(lat.max()) * 1e3, 1),
    }


def main():
    from r3util import probe_ms

    from vit_tpu.data import JpegDecoder
    from vit_tpu.models import ViT
    from vit_tpu.pipeline import InferencePipeline
    from vit_tpu.serving import BatchingServer
    from vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# probe {probe_ms():.1f} ms", flush=True)

    model = ViT(**CFG, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
    )()
    pipeline = InferencePipeline(model, variables, image_size=224, batch_size=64)
    # compile every batch-bucket program before traffic starts
    pipeline.warm()
    jpegs = make_jpegs(N_JPEGS)
    print(f"# {N_JPEGS} jpegs ready; {N_REQ} requests per load point", flush=True)

    results = {"loads": [], "int8_loads": [], "wait_sweep": []}
    for rate in LOADS:
        with BatchingServer(pipeline, decoder=JpegDecoder(size=224),
                            max_batch=64, max_wait_ms=5.0) as server:
            server.classify(jpegs[0])  # warm the server path
            lat, wall = run_load(server, jpegs, rate, N_REQ)
        row = stats(lat, wall, N_REQ, rate)
        results["loads"].append(row)
        print(f"load {rate:4d} img/s offered: {row}", flush=True)

    # The int8 serving mode: ViT-L's bf16 small-batch device time is the
    # 24-layer dispatch floor (~40 ms/batch — the device itself caps tiny-
    # batch service at ~25 batch/s), where the fused int8 kernels run
    # batch-8 in ~8 ms. This is the latency-critical serving config.
    from vit_tpu.utils.quantize import quantize_vit, vit_apply_w8a8

    qvars = quantize_vit(variables)
    q_pipeline = InferencePipeline(
        model, qvars, image_size=224, batch_size=64,
        apply_fn=lambda v, x: vit_apply_w8a8(model, v, x, mode="auto"),
    ).warm()
    for rate in LOADS:
        with BatchingServer(q_pipeline, decoder=JpegDecoder(size=224),
                            max_batch=64, max_wait_ms=5.0) as server:
            server.classify(jpegs[0])
            lat, wall = run_load(server, jpegs, rate, N_REQ)
        row = stats(lat, wall, N_REQ, rate)
        results["int8_loads"].append(row)
        print(f"int8 load {rate:4d} img/s offered: {row}", flush=True)

    mid = LOADS[1]
    for wait_ms in WAIT_SWEEP_MS:
        with BatchingServer(pipeline, decoder=JpegDecoder(size=224),
                            max_batch=64, max_wait_ms=wait_ms) as server:
            server.classify(jpegs[0])
            lat, wall = run_load(server, jpegs, mid, N_REQ, seed=2)
        row = {"max_wait_ms": wait_ms, **stats(lat, wall, N_REQ, mid)}
        results["wait_sweep"].append(row)
        print(f"max_wait {wait_ms:4.1f} ms @ {mid} img/s: {row}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
