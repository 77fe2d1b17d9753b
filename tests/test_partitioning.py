"""The Pallas kernels execute UNDER a GSPMD mesh (VERDICT r4 item 1).

Through round 4 every multi-chip program forced the XLA op path because the
kernels' custom calls carried no partitioning rules. These tests assert the
round-5 fix end-to-end on the virtual 8-device CPU mesh: the kernels
(interpret mode — same kernel logic, interpreter execution) stay in jitted
programs over a ``{'data': 4, 'model': 2}`` mesh, their batch/head grids are
sharded in place (observed via ``ops.partitioning.PARTITION_EVENTS``, which
records every partitioned lowering at compile time), and the results match
the XLA op path bit-for-tolerance.

No reference counterpart: the reference has no kernels and no parallelism
(SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu import ops
from vit_tpu.ops import partitioning


@pytest.fixture(autouse=True)
def _fresh_events():
    """Partition callbacks fire during XLA compilation — disable the
    persistent compilation cache so a warm cache from a previous suite run
    cannot skip them, and start each test with a clean event log."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    partitioning.PARTITION_EVENTS.clear()
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def _mesh(shape=(4, 2), names=("data", "model")):
    n = int(np.prod(shape))
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, names)


def _events_with_factor(factor, axis):
    return [
        e for e in partitioning.PARTITION_EVENTS
        if e["factors"].get(factor) == axis
    ]


def test_flash_attention_partitions_batch_and_heads():
    """[B, H, N, D] flash: batch shards over 'data', heads over 'model' —
    the head-parallel TP story — with zero communication and XLA parity."""
    mesh = _mesh()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (8, 4, 144, 32), jnp.float32)
    k = jax.random.normal(k2, (8, 4, 144, 32), jnp.float32)
    v = jax.random.normal(k3, (8, 4, 144, 32), jnp.float32)
    sh = NamedSharding(mesh, P("data", "model"))
    q, k, v = jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)

    fn = jax.jit(
        lambda q, k, v: ops.flash_attention(q, k, v, interpret=True)
    )
    out = fn(q, k, v)
    ref = ops.reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    # the kernel really lowered per-shard: batch->data AND heads->model
    assert _events_with_factor("b", "data"), partitioning.PARTITION_EVENTS
    assert _events_with_factor("h", "model"), partitioning.PARTITION_EVENTS
    # local shard shapes reached the kernel (global B=8 H=4 -> 2 x 2)
    ev = _events_with_factor("b", "data")[0]
    assert ev["global_shapes"][0] == (8, 4, 144, 32)
    # output sharding followed the inputs (infer rule): no implicit gather
    assert out.sharding.spec == P("data", "model")


def test_fused_attention_block_batch_grid_shards():
    """The whole-dim fused block (LN->qkv->attn->out->+res) shards its
    batch grid; replicated weights stay replicated."""
    mesh = _mesh((4,), ("data",))
    d, heads, n = 64, 4, 48
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (8, n, d), jnp.float32)
    ln_s = jnp.ones((d,)) + 0.1 * jax.random.normal(ks[1], (d,))
    ln_b = 0.1 * jax.random.normal(ks[2], (d,))
    wqkv = jax.random.normal(ks[3], (d, 3 * d)) * 0.05
    wout = jax.random.normal(ks[4], (d, d)) * 0.05
    bout = 0.1 * jax.random.normal(ks[5], (d,))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))

    fn = jax.jit(
        lambda *a: ops.fused_attention_block(*a, heads, interpret=True)
    )
    out = fn(x, ln_s, ln_b, wqkv, wout, bout)
    ref = ops.xla_attention_block(
        x, ln_s, ln_b, wqkv, wout, bout, heads, (d // heads) ** -0.5, 1e-6,
        None, None,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    assert _events_with_factor("b", "data"), partitioning.PARTITION_EVENTS
    assert out.sharding.spec == P("data")


def test_fused_mlp_tokens_shard_weights_gather():
    """fused_mlp shards the token/batch dim; a TP-sharded w1 arriving at
    this whole-dim kernel is gathered by the compiler (need-replication
    factors), so the result is still exact."""
    mesh = _mesh()
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (8, 32, 64), jnp.float32)
    w1 = jax.random.normal(ks[1], (64, 128)) * 0.05
    w2 = jax.random.normal(ks[2], (128, 64)) * 0.05
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    # column-sharded w1 (the TP layout) must be gathered, not mis-sliced
    w1 = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))

    fn = jax.jit(
        lambda x, w1, w2: ops.fused_mlp(x, w1, None, w2, None, interpret=True)
    )
    out = fn(x, w1, w2)
    ref = ops.reference_mlp(x, w1, None, w2, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    assert _events_with_factor("b", "data"), partitioning.PARTITION_EVENTS


def test_model_forward_kernels_on_mesh_matches_xla():
    """A whole-model GSPMD forward keeps the kernels in the program: tiny
    ViT jitted over {'data':4,'model':2} with the interpret backend equals
    the plain XLA path."""
    from vit_tpu.models import ViT

    model = ViT(image_size=32, patch_size=8, num_classes=10, dim=64,
                depth=2, heads=4, mlp_dim=128, dim_head=16)
    img = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, img)
    with ops.force_backend("xla"):
        ref = model.apply(variables, img)

    mesh = _mesh()
    img_s = jax.device_put(img, NamedSharding(mesh, P("data")))
    var_s = jax.device_put(variables, NamedSharding(mesh, P()))

    def fwd(variables, img):
        with ops.force_backend("interpret"):
            return model.apply(variables, img)

    out = jax.jit(fwd)(var_s, img_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
    assert _events_with_factor("b", "data"), (
        "no kernel partitioned over the data axis — the model fell back "
        f"to XLA ops: {partitioning.PARTITION_EVENTS}"
    )


def test_train_step_kernels_on_gspmd_matches_xla_backend():
    """make_train_step(backend='interpret') runs the fused kernels inside
    the partitioned dp x tp train step and matches the XLA-backend step."""
    from vit_tpu.models import ViT
    from vit_tpu.parallel import make_mesh
    from vit_tpu.train import create_train_state, make_train_step, shard_batch

    model = ViT(image_size=32, patch_size=8, num_classes=10, dim=64,
                depth=2, heads=4, mlp_dim=128, dim_head=16)
    mesh = make_mesh(n_data=4, n_model=2)
    img = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    labels = jnp.arange(8) % 10

    state_k = create_train_state(model, jax.random.PRNGKey(1), img[:1], mesh=mesh)
    state_x = create_train_state(model, jax.random.PRNGKey(1), img[:1], mesh=mesh)
    img_s, labels_s = shard_batch(img, mesh), shard_batch(labels, mesh)

    step_k = make_train_step(model, backend="interpret")
    step_x = make_train_step(model, backend="xla")
    for _ in range(2):
        state_k, loss_k = step_k(state_k, img_s, labels_s)
        state_x, loss_x = step_x(state_x, img_s, labels_s)
    assert _events_with_factor("b", "data"), (
        "kernels did not partition inside the train step"
    )
    np.testing.assert_allclose(float(loss_k), float(loss_x), atol=1e-4, rtol=1e-4)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state_k.params, state_x.params
    )
    assert max(jax.tree.leaves(err)) < 1e-4, err
