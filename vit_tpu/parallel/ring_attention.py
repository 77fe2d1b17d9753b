"""Ring attention: sequence-parallel softmax attention over the device mesh.

The single-chip long-context story is ``ops.flash_attention_kv_blocked``
(online softmax, K/V streamed block-by-block through VMEM). This is its
multi-chip form (SURVEY.md §2.3's ring-over-ICI extension point, built):
the sequence is sharded over a mesh axis, each device keeps its Q shard
resident and its K/V shard in motion — at step i every device contracts its
queries against the K/V block that started i hops away, then rotates the
block to its ring neighbor with ``lax.ppermute``. After P steps every query
has seen every key with only P-1 point-to-point transfers of one shard
each (the last block's rotation would be discarded, so it is skipped) — no
all-gather, no materialized global K/V, and the permutes ride ICI
neighbor-to-neighbor.

The running (m, l, acc) rescale is the same online-softmax algebra the
kv-blocked kernel uses; the local contraction is plain XLA einsums (each
device sees only an N/P-token block — below the fused kernels' win
threshold at zoo shapes).

Zoo sequences (<= 3.2k tokens) never need this — it exists so the framework
scales past single-chip HBM, and it is exercised on the virtual CPU mesh in
tests (sharded-vs-single parity, collective placement).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _local_pass(q, k_blk, v_blk, scale, precision=None):
    """One ring step's local contribution: unnormalized PV plus the
    per-row (max, sumexp) statistics needed for the global rescale.

    Returns fp32 (m, l, pv): m = rowmax(s), l = rowsum(exp(s - m)),
    pv = exp(s - m) @ v."""
    s = jnp.einsum(
        "bhid,bhjd->bhij", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1)  # (b, h, nq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    pv = jnp.einsum(
        "bhij,bhjd->bhid", p.astype(v_blk.dtype), v_blk,
        preferred_element_type=jnp.float32,
    )
    return m, l, pv.astype(jnp.float32)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    scale: Optional[float] = None,
) -> jax.Array:
    """Sequence-parallel attention: ``[B, H, N, D]`` in/out, with the N axis
    sharded over ``axis_name`` of ``mesh``.

    ``N`` must divide by the axis size. Inputs may be unsharded host
    arrays (the returned jitted computation shards them) or already placed
    with ``P(None, None, axis_name)`` on the sequence dim.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    p_devices = mesh.shape[axis_name]
    n = q.shape[2]
    assert n % p_devices == 0, f"sequence {n} must divide ring size {p_devices}"
    return _ring_fn(mesh, axis_name, float(scale))(q, k, v)


@functools.lru_cache(maxsize=None)
def _ring_fn(mesh: Mesh, axis_name: str, scale: float):
    """Build-and-jit once per (mesh, axis, scale): a fresh jit closure per
    call would defeat the executable cache and recompile the whole sharded
    program every invocation (shapes still key the jit cache as usual)."""
    p_devices = mesh.shape[axis_name]

    def per_device(q_loc, k_loc, v_loc):
        # ring neighbor rotation: shard j -> device j+1 (mod P); after step
        # i this device holds the K/V shard that started i hops behind it.
        perm = [(j, (j + 1) % p_devices) for j in range(p_devices)]

        def body(carry, _):
            m, l, acc, k_blk, v_blk = carry
            m_i, l_i, pv_i = _local_pass(q_loc, k_blk, v_blk, scale)
            m_new = jnp.maximum(m, m_i)
            a_old = jnp.exp(m - m_new)
            a_new = jnp.exp(m_i - m_new)
            l = l * a_old + l_i * a_new
            acc = acc * a_old[..., None] + pv_i * a_new[..., None]
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            return (m_new, l, acc, k_blk, v_blk), None

        b, h, nq_loc, _ = q_loc.shape
        dv = v_loc.shape[-1]
        carry = (
            jnp.full((b, h, nq_loc), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, nq_loc), jnp.float32),
            jnp.zeros((b, h, nq_loc, dv), jnp.float32),
            k_loc,
            v_loc,
        )
        # lax.scan (not fori_loop) so the ring is reverse-differentiable —
        # the backward replays the rotation in reverse via the transposed
        # permutation XLA derives from ppermute. The last shard is
        # contracted outside the scan: its rotation result would be
        # discarded, so 2*(P-1) permutes suffice, not 2*P.
        (m, l, acc, k_blk, v_blk), _ = jax.lax.scan(
            body, carry, None, length=p_devices - 1
        )
        m_i, l_i, pv_i = _local_pass(q_loc, k_blk, v_blk, scale)
        m_new = jnp.maximum(m, m_i)
        a_old = jnp.exp(m - m_new)
        a_new = jnp.exp(m_i - m_new)
        l = l * a_old + l_i * a_new
        acc = acc * a_old[..., None] + pv_i * a_new[..., None]
        return (acc / l[..., None]).astype(v_loc.dtype)

    seq_spec = P(None, None, axis_name, None)
    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=False,
    )
    return jax.jit(sharded)
