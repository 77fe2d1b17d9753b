"""BatchingServer: dynamic request batching over the InferencePipeline."""

import io
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.data import JpegDecoder
from vit_tpu.models import ViT
from vit_tpu.pipeline import InferencePipeline
from vit_tpu.serving import BatchingServer


def _pipeline(batch_size=4):
    model = ViT(image_size=32, patch_size=8, num_classes=10, dim=64, depth=1,
                heads=2, dim_head=32, mlp_dim=128)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    return InferencePipeline(model, variables, image_size=32,
                             batch_size=batch_size, dtype=jnp.float32)


def _jpeg(seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
        buf, format="JPEG", quality=95
    )
    return buf.getvalue()


def test_concurrent_requests_match_direct_pipeline():
    pipe = _pipeline(batch_size=4)
    decoder = JpegDecoder(size=40)
    jpegs = [_jpeg(i) for i in range(10)]
    # ground truth: each image classified alone through the same pipeline
    want = {i: pipe(decoder([j])[None][0]) for i, j in enumerate(jpegs)}

    with BatchingServer(pipe, decoder=decoder, max_batch=4, max_wait_ms=20) as srv:
        results = {}

        def worker(i):
            results[i] = srv.classify(jpegs[i], timeout=60)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for i in range(10):
        np.testing.assert_allclose(results[i], want[i][0], atol=1e-5)


def test_deadline_flushes_partial_batch():
    pipe = _pipeline(batch_size=4)
    with BatchingServer(pipe, decoder=JpegDecoder(size=40),
                        max_batch=4, max_wait_ms=10) as srv:
        out = srv.classify(_jpeg(0), timeout=60)  # 1 of 4: deadline must fire
        assert out.shape == (10,) and np.isfinite(out).all()


def test_predecoded_arrays_and_corrupt_jpeg_isolation():
    pipe = _pipeline(batch_size=4)
    decoder = JpegDecoder(size=40)
    good = _jpeg(1)
    arr = decoder([_jpeg(2)])[0]
    with BatchingServer(pipe, decoder=decoder, max_batch=4, max_wait_ms=30) as srv:
        f_bad = srv.submit(b"definitely not a jpeg")
        f_good = srv.submit(good)
        f_arr = srv.submit(arr)
        with pytest.raises(Exception):
            f_bad.result(timeout=60)
        # the corrupt request must not poison its batchmates
        assert np.isfinite(f_good.result(timeout=60)).all()
        assert np.isfinite(f_arr.result(timeout=60)).all()
        # and the server keeps serving afterwards
        assert np.isfinite(srv.classify(_jpeg(3), timeout=60)).all()


def test_close_rejects_new_requests():
    pipe = _pipeline(batch_size=2)
    srv = BatchingServer(pipe, decoder=JpegDecoder(size=40), max_wait_ms=5)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(_jpeg(0))


def test_wrong_shape_predecoded_array_fails_only_itself():
    """A pre-decoded array whose shape doesn't match the decoder output
    must fail its own future, not its batchmates (per-request isolation)."""
    pipe = _pipeline(batch_size=4)
    decoder = JpegDecoder(size=40)
    with BatchingServer(pipe, decoder=decoder, max_batch=4, max_wait_ms=30) as srv:
        f_bad = srv.submit(np.zeros((32, 32, 3), np.uint8))  # decoder is 40
        f_good = srv.submit(_jpeg(5))
        with pytest.raises(ValueError):
            f_bad.result(timeout=60)
        assert np.isfinite(f_good.result(timeout=60)).all()


def test_pending_batch_resolves_without_followup_traffic():
    """The overlap pipeline keeps one batch in flight; with no further
    traffic the idle tick must still resolve it (bounded by max_wait)."""
    pipe = _pipeline(batch_size=2)
    with BatchingServer(pipe, decoder=JpegDecoder(size=40),
                        max_batch=2, max_wait_ms=10) as srv:
        f = srv.submit(_jpeg(7))
        assert np.isfinite(f.result(timeout=60)).all()


def test_close_joins_when_final_batch_fully_fails_decode():
    """A corrupt-only batch flushed by the shutdown sentinel must still end
    the batcher thread: the sentinel is consumed as the flush trigger, so
    the loop has to notice `closed` instead of blocking on an empty queue."""
    pipe = _pipeline()
    srv = BatchingServer(pipe, decoder=JpegDecoder(size=40), max_batch=4,
                         max_wait_ms=500)
    f = srv.submit(b"definitely not a jpeg")
    srv.close(timeout=3)
    assert not srv._thread.is_alive()
    with pytest.raises(Exception):
        f.result(timeout=1)


def test_pipeline_depth_variants():
    """The in-flight window (pipeline_depth — the round-4 small-batch
    throughput lever) must not change results or strand futures at any
    depth, including the legacy one-batch lookahead (depth 1)."""
    import pytest

    pipe = _pipeline(batch_size=4)
    decoder = JpegDecoder(size=40)
    jpegs = [_jpeg(i) for i in range(12)]
    want = {i: pipe(decoder([j])[None][0])[0] for i, j in enumerate(jpegs)}
    for depth in (1, 3):
        with BatchingServer(pipe, decoder=decoder, max_batch=4,
                            max_wait_ms=2, pipeline_depth=depth) as srv:
            futs = [srv.submit(j) for j in jpegs]
            for i, f in enumerate(futs):
                np.testing.assert_allclose(f.result(timeout=60), want[i],
                                           atol=1e-5)
        # close() after the context: every future must already be done
        assert all(f.done() for f in futs)


def test_multichip_serving_dp_mesh_parity_and_sharding():
    """Multi-chip serving (VERDICT r4 #6): the bucketed pipeline programs
    run THROUGH the dp mesh — the batch axis lands sharded over 'data'
    (so throughput scales with n_data), the params are replicated, and
    request->logits through a BatchingServer on top matches the
    single-device pipeline bit-for-tolerance."""
    from jax.sharding import PartitionSpec as P

    from vit_tpu.parallel import make_mesh
    from vit_tpu.parallel.mesh import DATA_AXIS

    model = ViT(image_size=32, patch_size=8, num_classes=10, dim=64, depth=1,
                heads=2, dim_head=32, mlp_dim=128)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, img)
    single = InferencePipeline(model, variables, image_size=32,
                               batch_size=4, dtype=jnp.float32)

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    pipe = InferencePipeline(model, variables, image_size=32, batch_size=8,
                             batch_buckets=[4, 8], mesh=mesh,
                             dtype=jnp.float32)

    # the compiled program really shards the batch: logits inherit P('data')
    raw = jnp.zeros((8, 32, 32, 3), jnp.uint8)
    out = pipe._fn(pipe.variables, raw)
    assert out.sharding.spec == P(DATA_AXIS), out.sharding
    assert len(out.sharding.mesh.devices.flatten()) == 8

    # request -> logits parity through the batching front-end on the mesh
    decoder = JpegDecoder(size=40)
    jpegs = [_jpeg(100 + i) for i in range(10)]
    want = {i: single(decoder([j])[None][0])[0] for i, j in enumerate(jpegs)}
    with BatchingServer(pipe, decoder=decoder, max_batch=8,
                        max_wait_ms=20) as srv:
        futs = [srv.submit(j) for j in jpegs]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=120), want[i],
                                       atol=1e-5)
