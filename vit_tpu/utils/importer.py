"""Reference-checkpoint importer (SURVEY.md §5 'checkpoint/resume' row).

The reference names parameters by Flax call order (``Transformer_0/
Attention_3/Dense_0`` — a consequence of its Python-loop stacking,
SURVEY.md §3.1); this maps that layout onto this framework's named modules
so reference-trained parameters run here and logit-parity tests can compare
the two implementations on identical weights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def import_reference_deepvit_params(
    ref_params: Dict[str, Any], depth: int, *, scan: bool = True
) -> Dict[str, Any]:
    """Map a reference ``deepvit.py`` tree onto ``vit_tpu.models.DeepViT``.

    DeepViT layout matches vit.py plus per-layer ``reattn_weights`` and a
    re-attention LayerNorm inside each Attention (deepvit.py:68-72). Note
    the reattention path never scans (talking XLA path), so this importer
    always emits per-layer modules.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]
    out = import_reference_vit_params(ref_params, depth, scan=scan)
    enc = out["params"]["encoder"]

    def reattn(i):
        a = tr[f"Attention_{i}"]
        ln = a["LayerNorm_0"]
        return a["reattn_weights"], {"scale": ln["scale"], "bias": ln["bias"]}

    if scan and depth > 1:
        import jax

        ws, lns = zip(*(reattn(i) for i in range(depth)))
        enc["blocks"]["attn"]["reattn_weights"] = jnp.stack(ws)
        enc["blocks"]["attn"]["reattn_norm"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *lns
        )
    else:
        for i in range(depth):
            w, ln = reattn(i)
            enc[f"attn_{i}"]["reattn_weights"] = w
            enc[f"attn_{i}"]["reattn_norm"] = ln
    return out


def import_reference_lsa_params(
    ref_params: Dict[str, Any], depth: int, dim_head: int = 64, *, scan: bool = True
) -> Dict[str, Any]:
    """Map a reference ``vit_small_datasets.py`` tree onto
    ``vit_tpu.models.ViTSmallDatasets``.

    Layout: SPT_0 tokenizer, Transformer_0/{LSA_i, FeedForward_i,
    PreNorm_i (scale-only LNs)}, top-level LayerNorm_0 (head, scale-only) and
    Dense_0 (head). The reference's constant LSA temperature becomes our
    learned ``log_temperature`` initialized to the same value.
    """
    import jax

    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]
    log_tau = jnp.log(jnp.asarray(dim_head, jnp.float32) ** -0.5)

    def layer(i):
        attn_norm = tr[f"PreNorm_{2 * i}"]["LayerNorm_0"]
        ff_norm = tr[f"PreNorm_{2 * i + 1}"]["LayerNorm_0"]
        attn = tr[f"LSA_{i}"]
        ff = tr[f"FeedForward_{i}"]
        zeros = jnp.zeros_like(attn_norm["scale"])
        return (
            {
                "norm_scale": attn_norm["scale"],
                "norm_bias": zeros,
                "qkv_kernel": attn["Dense_0"]["kernel"],
                "out_kernel": attn["Dense_1"]["kernel"],
                "out_bias": attn["Dense_1"]["bias"],
                "log_temperature": log_tau,
            },
            {
                "ln_scale": ff_norm["scale"],
                "ln_bias": jnp.zeros_like(ff_norm["scale"]),
                "w1": ff["Dense_0"]["kernel"],
                "b1": ff["Dense_0"]["bias"],
                "w2": ff["Dense_1"]["kernel"],
                "b2": ff["Dense_1"]["bias"],
            },
        )

    encoder: Dict[str, Any] = {}
    if scan and depth > 1:
        attns, ffs = zip(*(layer(i) for i in range(depth)))
        encoder["blocks"] = {
            "attn": jax.tree.map(lambda *xs: jnp.stack(xs), *attns),
            "ff": jax.tree.map(lambda *xs: jnp.stack(xs), *ffs),
        }
    else:
        for i in range(depth):
            a, f = layer(i)
            encoder[f"attn_{i}"] = a
            encoder[f"ff_{i}"] = f

    head_scale = p["LayerNorm_0"]["scale"]
    return {
        "params": {
            "cls": p["cls"],
            "pos_embedding": p["pos_embedding"],
            "spt": {
                "norm": {"scale": p["SPT_0"]["LayerNorm_0"]["scale"]},
                "proj": {
                    "kernel": p["SPT_0"]["Dense_0"]["kernel"],
                    "bias": p["SPT_0"]["Dense_0"]["bias"],
                },
            },
            "encoder": encoder,
            "head_norm": {"scale": head_scale, "bias": jnp.zeros_like(head_scale)},
            "head": {
                "kernel": p["Dense_0"]["kernel"],
                "bias": p["Dense_0"]["bias"],
            },
        }
    }


def import_reference_simple_vit_params(
    ref_params: Dict[str, Any], depth: int, *, scan: bool = True
) -> Dict[str, Any]:
    """Map a reference ``simple_vit.py`` tree onto ``vit_tpu.models.SimpleViT``.

    Layout: Dense_1 = patch projection, Dense_0 = head, LayerNorm_0 = head
    norm (scale only); per-layer norms live INSIDE Attention_i/FeedForward_i
    (bias-free), and the out-projection carries no bias — zeros are
    substituted where this framework keeps bias parameters.
    """
    import jax

    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]

    def layer(i):
        attn = tr[f"Attention_{i}"]
        ff = tr[f"FeedForward_{i}"]
        dim_zeros = jnp.zeros_like(attn["LayerNorm_0"]["scale"])
        return (
            {
                "norm_scale": attn["LayerNorm_0"]["scale"],
                "norm_bias": dim_zeros,
                "qkv_kernel": attn["Dense_0"]["kernel"],
                "out_kernel": attn["Dense_1"]["kernel"],
                "out_bias": dim_zeros,
            },
            {
                "ln_scale": ff["LayerNorm_0"]["scale"],
                "ln_bias": dim_zeros,
                "w1": ff["Dense_0"]["kernel"],
                "b1": ff["Dense_0"]["bias"],
                "w2": ff["Dense_1"]["kernel"],
                "b2": ff["Dense_1"]["bias"],
            },
        )

    encoder: Dict[str, Any] = {}
    if scan and depth > 1:
        attns, ffs = zip(*(layer(i) for i in range(depth)))
        encoder["blocks"] = {
            "attn": jax.tree.map(lambda *xs: jnp.stack(xs), *attns),
            "ff": jax.tree.map(lambda *xs: jnp.stack(xs), *ffs),
        }
    else:
        for i in range(depth):
            a, f = layer(i)
            encoder[f"attn_{i}"] = a
            encoder[f"ff_{i}"] = f

    return {
        "params": {
            "patch_embed": {
                "proj": {
                    "kernel": p["Dense_1"]["kernel"],
                    "bias": p["Dense_1"]["bias"],
                }
            },
            "encoder": encoder,
            "head_norm": {"scale": p["LayerNorm_0"]["scale"]},
            "head": {
                "kernel": p["Dense_0"]["kernel"],
                "bias": p["Dense_0"]["bias"],
            },
        }
    }


def _encoder_layers(tr, depth, *, scan, bias_free_norms=False, out_bias=True):
    """Shared vit-style Transformer mapping: Attention_i/FeedForward_i +
    PreNorm pairs -> our raw-param blocks (optionally scan-stacked)."""
    import jax

    def layer(i):
        attn_norm = tr[f"PreNorm_{2 * i}"]["LayerNorm_0"]
        ff_norm = tr[f"PreNorm_{2 * i + 1}"]["LayerNorm_0"]
        attn = tr[f"Attention_{i}"]
        ff = tr[f"FeedForward_{i}"]
        zeros = jnp.zeros_like(attn_norm["scale"])
        a = {
            "norm_scale": attn_norm["scale"],
            "norm_bias": attn_norm.get("bias", zeros),
            "qkv_kernel": attn["Dense_0"]["kernel"],
        }
        if "Dense_1" in attn:  # out projection exists (project_out)
            a["out_kernel"] = attn["Dense_1"]["kernel"]
            a["out_bias"] = attn["Dense_1"].get(
                "bias", jnp.zeros((attn["Dense_1"]["kernel"].shape[1],), jnp.float32)
            )
        f = {
            "ln_scale": ff_norm["scale"],
            "ln_bias": ff_norm.get("bias", jnp.zeros_like(ff_norm["scale"])),
            "w1": ff["Dense_0"]["kernel"],
            "b1": ff["Dense_0"]["bias"],
            "w2": ff["Dense_1"]["kernel"],
            "b2": ff["Dense_1"]["bias"],
        }
        return a, f

    encoder = {}
    if scan and depth > 1:
        attns, ffs = zip(*(layer(i) for i in range(depth)))
        encoder["blocks"] = {
            "attn": jax.tree.map(lambda *xs: jnp.stack(xs), *attns),
            "ff": jax.tree.map(lambda *xs: jnp.stack(xs), *ffs),
        }
    else:
        for i in range(depth):
            a, f = layer(i)
            encoder[f"attn_{i}"] = a
            encoder[f"ff_{i}"] = f
    return encoder


def import_reference_t2t_params(
    ref_params: Dict[str, Any], depth: int, n_t2t_layers: int = 3
) -> Dict[str, Any]:
    """Map a reference ``t2t.py`` tree onto ``vit_tpu.models.T2TViT``.

    Tokenizer stages RearrangeUnfoldTransformer_i each hold a 1-head
    depth-1 Transformer (no out projection — heads==1, dim_head==dim);
    Dense_0 is the final tokenizer projection, Transformer_0 the main
    encoder, LayerNorm_0 + Dense_1 the head.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params
    out: Dict[str, Any] = {
        "cls": p["cls"],
        "pos_embedding": p["pos_embedding"],
        "proj": {"kernel": p["Dense_0"]["kernel"], "bias": p["Dense_0"]["bias"]},
        "encoder": _encoder_layers(p["Transformer_0"], depth, scan=True),
        "head_norm": {"scale": p["LayerNorm_0"]["scale"]},
        "head": {"kernel": p["Dense_1"]["kernel"], "bias": p["Dense_1"]["bias"]},
    }
    for i in range(n_t2t_layers - 1):  # last t2t layer has no transformer
        tr = p[f"RearrangeUnfoldTransformer_{i}"]["Transformer_0"]
        out[f"t2t_{i}"] = _encoder_layers(tr, 1, scan=False)
    return {"params": out}


def import_reference_pit_params(ref_params: Dict[str, Any], depth: int) -> Dict[str, Any]:
    """Map a reference ``pit.py`` tree onto ``vit_tpu.models.PiT``.

    Only single-stage configs are importable: the reference's Pool never
    executes (``not_last`` bug, pit.py:199) so its multi-stage models
    degenerate to a flat encoder, while this build actually pools — the
    architectures only coincide when there is one stage.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params
    # reference call order names the head Dense_0 and the patch projection
    # Dense_1 (pit.py builds mlp_head's Dense before the projection runs)
    return {
        "params": {
            "cls": p["cls"],
            "pos_embedding": p["pos_embedding"],
            "proj": {"kernel": p["Dense_1"]["kernel"], "bias": p["Dense_1"]["bias"]},
            "stage_0": _encoder_layers(p["Transformer_0"], depth, scan=True),
            "head_norm": {"scale": p["LayerNorm_0"]["scale"]},
            "head": {"kernel": p["Dense_0"]["kernel"], "bias": p["Dense_0"]["bias"]},
        }
    }


def import_reference_cait_params(
    ref_params: Dict[str, Any], depth: int, cls_depth: int
) -> Dict[str, Any]:
    """Map a reference ``cait.py`` tree onto ``vit_tpu.models.CaiT``.

    Reference attention uses separate q (Dense_0) / kv (Dense_1) kernels
    even for self-attention — concatenated into our fused qkv_kernel for the
    patch stage; the class stage keeps the split layout. Talking-heads
    mixes map directly; LayerScale is the reference's constant epsilon
    (it never learns it, bug register #6) so imported values equal our
    initializer's. Note reference LayerScale bands epsilon by LAYER index
    (bug register #20) — identical to ours for models up to depth 18.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params

    def stage(tr, n_layers, self_attention: bool, eps_vals):
        out: Dict[str, Any] = {}
        for i in range(n_layers):
            attn = tr[f"Attention_{i}"]
            ff = tr[f"FeedForward_{i}"]
            attn_norm = tr[f"PreNorm_{2 * i}"]["LayerNorm_0"]
            ff_norm = tr[f"PreNorm_{2 * i + 1}"]["LayerNorm_0"]
            zeros = jnp.zeros_like(attn_norm["scale"])
            if self_attention:
                out[f"attn_{i}"] = {
                    "norm_scale": attn_norm["scale"],
                    "norm_bias": zeros,
                    "qkv_kernel": jnp.concatenate(
                        [attn["Dense_0"]["kernel"], attn["Dense_1"]["kernel"]], axis=1
                    ),
                    "out_kernel": attn["Dense_2"]["kernel"],
                    "out_bias": attn["Dense_2"]["bias"],
                    "mix_heads_pre": attn["mix_heads_pre_attn"],
                    "mix_heads_post": attn["mix_heads_post_attn"],
                }
            else:
                out[f"attn_{i}"] = {
                    "norm": {"scale": attn_norm["scale"], "bias": zeros},
                    "to_q": {"kernel": attn["Dense_0"]["kernel"]},
                    "to_kv": {"kernel": attn["Dense_1"]["kernel"]},
                    "to_out": {
                        "kernel": attn["Dense_2"]["kernel"],
                        "bias": attn["Dense_2"]["bias"],
                    },
                    "mix_heads_pre": attn["mix_heads_pre_attn"],
                    "mix_heads_post": attn["mix_heads_post_attn"],
                }
            out[f"ff_{i}"] = {
                "ln_scale": ff_norm["scale"],
                "ln_bias": zeros,
                "w1": ff["Dense_0"]["kernel"],
                "b1": ff["Dense_0"]["bias"],
                "w2": ff["Dense_1"]["kernel"],
                "b2": ff["Dense_1"]["bias"],
            }
            dim = attn_norm["scale"].shape[0]
            out[f"ls_attn_{i}"] = jnp.full((dim,), eps_vals, jnp.float32)
            out[f"ls_ff_{i}"] = jnp.full((dim,), eps_vals, jnp.float32)
        return out

    eps = 0.1 if depth <= 18 else (1e-5 if depth <= 24 else 1e-6)
    head_scale = p["LayerNorm_0"]["scale"]
    return {
        "params": {
            "cls": p["cls"],
            "pos_embedding": p["pos_embedding"],
            "patch_embed": {
                "proj": {"kernel": p["Dense_0"]["kernel"], "bias": p["Dense_0"]["bias"]}
            },
            "patch_stage": stage(p["Transformer_0"], depth, True, eps),
            "cls_stage": stage(p["Transformer_1"], cls_depth, False, eps),
            "head_norm": {"scale": head_scale, "bias": jnp.zeros_like(head_scale)},
            "head": {"kernel": p["Dense_1"]["kernel"], "bias": p["Dense_1"]["bias"]},
        }
    }


def import_reference_parallel_vit_params(
    ref_params: Dict[str, Any], depth: int, branches: int = 2
) -> Dict[str, Any]:
    """Map a reference ``parallel_vit.py`` tree onto
    ``vit_tpu.models.ParallelViT`` (never scanned — branch submodules).

    Reference order: per depth d, branch b: Attention_{d*B+b},
    FeedForward_{d*B+b}; PreNorm_{d*2B+b} (attn) and PreNorm_{d*2B+B+b}
    (ff), all scale-only. Out projections carry no bias; zeros substituted.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]

    encoder: Dict[str, Any] = {}
    for d in range(depth):
        for b in range(branches):
            attn = tr[f"Attention_{d * branches + b}"]
            ff = tr[f"FeedForward_{d * branches + b}"]
            attn_norm = tr[f"PreNorm_{d * 2 * branches + b}"]["LayerNorm_0"]
            ff_norm = tr[f"PreNorm_{d * 2 * branches + branches + b}"]["LayerNorm_0"]
            zeros = jnp.zeros_like(attn_norm["scale"])
            encoder[f"attn_{d}_{b}"] = {
                "norm_scale": attn_norm["scale"],
                "norm_bias": zeros,
                "qkv_kernel": attn["Dense_0"]["kernel"],
                "out_kernel": attn["Dense_1"]["kernel"],
                "out_bias": zeros,
            }
            encoder[f"ff_{d}_{b}"] = {
                "ln_scale": ff_norm["scale"],
                "ln_bias": zeros,
                "w1": ff["Dense_0"]["kernel"],
                "b1": ff["Dense_0"]["bias"],
                "w2": ff["Dense_1"]["kernel"],
                "b2": ff["Dense_1"]["bias"],
            }

    head_scale = p["LayerNorm_0"]["scale"]
    out = {
        "cls": p["cls"],
        "pos_embedding": p["pos_embedding"],
        "patch_embed": {
            "proj": {"kernel": p["Dense_0"]["kernel"], "bias": p["Dense_0"]["bias"]}
        },
        "encoder": encoder,
        "head_norm": {"scale": head_scale, "bias": jnp.zeros_like(head_scale)},
        "head": {"kernel": p["Dense_1"]["kernel"]},
    }
    if "bias" in p["Dense_1"]:
        out["head"]["bias"] = p["Dense_1"]["bias"]
    else:
        out["head"]["bias"] = jnp.zeros((p["Dense_1"]["kernel"].shape[1],), jnp.float32)
    return {"params": out}


def import_reference_patch_merger_params(
    ref_params: Dict[str, Any], depth: int, merge_at: int, num_tokens_out: int
) -> Dict[str, Any]:
    """Map a reference ``patch_merger.py`` tree onto
    ``vit_tpu.models.PatchMergerViT``.

    The reference's merger queries are a fixed ``PRNGKey(0)`` draw rather
    than a parameter (bug register #4); the same draw seeds our learned
    ``queries`` so logits match at import time.
    """
    import jax

    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]
    dim = p["Dense_1"]["kernel"].shape[1]

    encoder: Dict[str, Any] = {}
    for i in range(depth):
        attn = tr[f"Attention_{i}"]
        ff = tr[f"FeedForward_{i}"]
        attn_norm = tr[f"PreNorm_{2 * i}"]["LayerNorm_0"]
        ff_norm = tr[f"PreNorm_{2 * i + 1}"]["LayerNorm_0"]
        zeros = jnp.zeros_like(attn_norm["scale"])
        encoder[f"attn_{i}"] = {
            "norm_scale": attn_norm["scale"],
            "norm_bias": zeros,
            "qkv_kernel": attn["Dense_0"]["kernel"],
            "out_kernel": attn["Dense_1"]["kernel"],
            "out_bias": zeros,
        }
        encoder[f"ff_{i}"] = {
            "ln_scale": ff_norm["scale"],
            "ln_bias": zeros,
            "w1": ff["Dense_0"]["kernel"],
            "b1": ff["Dense_0"]["bias"],
            "w2": ff["Dense_1"]["kernel"],
            "b2": ff["Dense_1"]["bias"],
        }

    merger_scale = tr["PatchMerger_0"]["LayerNorm_0"]["scale"]
    head_scale = p["LayerNorm_0"]["scale"]
    encoder_and_merger = dict(encoder)
    encoder_and_merger["merger"] = {
        "queries": jax.random.normal(jax.random.PRNGKey(0), (num_tokens_out, dim)),
        "norm": {"scale": merger_scale, "bias": jnp.zeros_like(merger_scale)},
    }
    return {
        "params": {
            # the reference allocates num_patches+1 rows (a cls slot it never
            # uses — mean pool) and slices [:n] at apply; drop the extra row
            "pos_embedding": p["pos_embedding"][:, :-1],
            "patch_embed": {
                "proj": {"kernel": p["Dense_1"]["kernel"], "bias": p["Dense_1"]["bias"]}
            },
            **encoder_and_merger,
            "head_norm": {"scale": head_scale, "bias": jnp.zeros_like(head_scale)},
            "head": {"kernel": p["Dense_0"]["kernel"], "bias": p["Dense_0"]["bias"]},
        }
    }


def import_reference_vit_params(
    ref_params: Dict[str, Any], depth: int, *, scan: bool = True
) -> Dict[str, Any]:
    """Map a reference ``vit.py`` param tree onto ``vit_tpu.models.ViT``.

    Reference layout (vit.py): Dense_0 = patch projection, Dense_1 = head,
    LayerNorm_0 = head norm, Transformer_0/{Attention_i, FeedForward_i,
    PreNorm_{2i} (attn norm), PreNorm_{2i+1} (ff norm)}.

    ``scan=True`` (the encoder's default) stacks the per-layer params along
    a leading depth axis for the nn.scan'd block; ``scan=False`` produces
    the per-layer ``attn_i``/``ff_i`` layout.
    """
    p = ref_params["params"] if "params" in ref_params else ref_params
    tr = p["Transformer_0"]

    def layer(i):
        attn_norm = tr[f"PreNorm_{2 * i}"]["LayerNorm_0"]
        ff_norm = tr[f"PreNorm_{2 * i + 1}"]["LayerNorm_0"]
        attn = tr[f"Attention_{i}"]
        ff = tr[f"FeedForward_{i}"]
        return (
            {
                "norm_scale": attn_norm["scale"],
                "norm_bias": attn_norm["bias"],
                "qkv_kernel": attn["Dense_0"]["kernel"],
                "out_kernel": attn["Dense_1"]["kernel"],
                "out_bias": attn["Dense_1"]["bias"],
            },
            {
                "ln_scale": ff_norm["scale"],
                "ln_bias": ff_norm["bias"],
                "w1": ff["Dense_0"]["kernel"],
                "b1": ff["Dense_0"]["bias"],
                "w2": ff["Dense_1"]["kernel"],
                "b2": ff["Dense_1"]["bias"],
            },
        )

    encoder: Dict[str, Any] = {}
    if scan and depth > 1:
        import jax

        attns, ffs = zip(*(layer(i) for i in range(depth)))
        encoder["blocks"] = {
            "attn": jax.tree.map(lambda *xs: jnp.stack(xs), *attns),
            "ff": jax.tree.map(lambda *xs: jnp.stack(xs), *ffs),
        }
    else:
        for i in range(depth):
            a, f = layer(i)
            encoder[f"attn_{i}"] = a
            encoder[f"ff_{i}"] = f

    return {
        "params": {
            "cls": p["cls"],
            "pos_embedding": p["pos_embedding"],
            "patch_embed": {
                "proj": {
                    "kernel": p["Dense_0"]["kernel"],
                    "bias": p["Dense_0"]["bias"],
                }
            },
            "encoder": encoder,
            "head_norm": {
                "scale": p["LayerNorm_0"]["scale"],
                "bias": p["LayerNorm_0"]["bias"],
            },
            "head": {
                "kernel": p["Dense_1"]["kernel"],
                "bias": p["Dense_1"]["bias"],
            },
        }
    }
