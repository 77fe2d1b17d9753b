"""Tests for the preprocessing pipeline, checkpointing, and profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_tpu.models import ViT
from vit_tpu.pipeline import InferencePipeline, center_crop, preprocess

MODEL = ViT(image_size=32, patch_size=8, num_classes=10, dim=64, depth=1,
            heads=4, mlp_dim=128, dim_head=16)


def _variables():
    img = jnp.ones((1, 32, 32, 3))
    return MODEL.init({"params": jax.random.PRNGKey(0)}, img)


def test_preprocess_shapes_and_dtype():
    raw = (np.random.rand(2, 48, 48, 3) * 255).astype(np.uint8)
    out = preprocess(jnp.asarray(raw), image_size=32, dtype=jnp.float32)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32


def test_center_crop():
    x = jnp.arange(5 * 5, dtype=jnp.float32).reshape(1, 5, 5, 1)
    c = center_crop(x, (3, 3))
    np.testing.assert_array_equal(np.asarray(c[0, :, :, 0]),
                                  np.asarray(x[0, 1:4, 1:4, 0]))


def test_pipeline_ragged_batches():
    variables = _variables()
    pipe = InferencePipeline(MODEL, variables, image_size=32, batch_size=4,
                             dtype=jnp.float32)
    raw = (np.random.rand(6, 40, 40, 3) * 255).astype(np.uint8)
    out = pipe(raw)
    assert out.shape == (6, 10)
    # same images in a different batching give the same logits
    out2 = pipe(raw[:3])
    np.testing.assert_allclose(out[:3], out2, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from vit_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    variables = _variables()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, variables)
    restored = restore_checkpoint(path, target=variables)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 variables, restored)


def test_cost_analysis_reports_flops():
    from vit_tpu.utils.profiling import cost_analysis

    variables = _variables()
    img = jnp.ones((4, 32, 32, 3))
    costs = cost_analysis(lambda v, x: MODEL.apply(v, x), variables, img)
    assert costs.get("flops", 0) > 1e6


def test_benchmark_timer():
    from vit_tpu.utils.profiling import benchmark

    variables = _variables()
    img = jnp.ones((4, 32, 32, 3))
    fn = jax.jit(lambda v, x: MODEL.apply(v, x))
    stats = benchmark(fn, variables, img, iters=3, warmup=1, items_per_call=4)
    assert stats["p50_s"] > 0 and stats["items_per_sec"] > 0


def test_health_probe_and_retry():
    from vit_tpu.utils import probe_devices, with_retry

    report = probe_devices()
    assert report["ok"] and report["devices"] == 8
    assert report["collective_ok"]

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return 42

    assert with_retry(flaky, attempts=3, backoff_s=0.0)() == 42


def test_checked_catches_nan():
    from vit_tpu.utils import checked

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = checked(jax.jit(bad))
    safe(jnp.ones((4,)))  # fine
    import pytest as _pytest
    with _pytest.raises(Exception):
        safe(-jnp.ones((4,)))


def test_train_state_checkpoint_roundtrip(tmp_path):
    from vit_tpu.train import create_train_state
    from vit_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    img = jnp.ones((1, 32, 32, 3))
    state = create_train_state(MODEL, jax.random.PRNGKey(0), img)
    path = str(tmp_path / "train_ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, target=state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert int(restored.step) == 0


def test_registry_covers_all_17_families():
    from vit_tpu.models import MODEL_REGISTRY

    assert len(MODEL_REGISTRY) == 17
