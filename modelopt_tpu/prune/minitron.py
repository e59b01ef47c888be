"""Minitron-style structured pruning of decoders: activation-based
importance for attention KV-groups / FFN channels / hidden dims / layers,
then pytree slicing to a smaller DecoderConfig.

(reference: modelopt/torch/prune/plugins/mcore_minitron.py — importance
estimators :955,1104-1450, layer dropping :154, MCoreMinitronSearcher :247.
The reference needs DynamicModules + hooks; here pruning is literally array
slicing on the params pytree, and importances come from the same capture
pass the quantization algorithms use.)

Conventions:
  * attention pruned at KV-group granularity (a kv head + its G query
    heads), preserving GQA structure;
  * importances are mean |activation| over calibration tokens, all-reduced
    implicitly when run under a sharded mesh (global reductions).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from ..models.transformer import Decoder
from ..quant.algorithms.capture import capture_inputs


def estimate_importances(bundle: ModelBundle, forward_loop=None, max_tokens=4096):
    """Returns dict with per-layer 'kv_groups' [L, KH], 'ffn' [L, I],
    'hidden' [Hd], 'layers' [L] importance scores."""
    cfg = bundle.module.cfg
    H, KH, D = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
    G = H // KH
    caps = capture_inputs(bundle, forward_loop, max_tokens=max_tokens)

    kv_imp, ffn_imp, hidden_acc = [], [], []
    mamba_imp = {}
    for i in range(cfg.num_layers):
        o_in = caps.get(f"layers_{i}/attn/o_proj")  # [K, H*D]
        if o_in is not None:
            per_head = jnp.mean(jnp.abs(o_in.reshape(-1, KH, G, D)), axis=(0, 2, 3))
            kv_imp.append(per_head)
        else:
            # hybrid models: mamba layers contribute a zero row so the
            # stacked array stays layer-index aligned
            kv_imp.append(jnp.zeros((KH,), jnp.float32))
        d_in = caps.get(f"layers_{i}/mlp/down_proj")  # [K, I]
        if d_in is not None:
            ffn_imp.append(jnp.mean(jnp.abs(d_in), axis=0))
        else:
            # MLP-less layers (e.g. mixer-only hybrid blocks) also get a
            # zero row so imps['ffn'][i] stays layer-index aligned
            ffn_imp.append(jnp.zeros((cfg.intermediate_size,), jnp.float32))
        q_in = caps.get(f"layers_{i}/attn/q_proj")  # [K, Hd] (normed hidden)
        if q_in is not None:
            hidden_acc.append(jnp.mean(jnp.abs(q_in), axis=0))
        m_in = caps.get(f"layers_{i}/mixer/in_proj")  # [K, Hd] (mamba)
        if m_in is not None:
            hidden_acc.append(jnp.mean(jnp.abs(m_in), axis=0))
        mo_in = caps.get(f"layers_{i}/mixer/out_proj")  # [K, nh*P]
        if mo_in is not None:
            nh, P = cfg.mamba_num_heads, cfg.mamba_head_dim
            mamba_imp[i] = jnp.mean(
                jnp.abs(mo_in.reshape(-1, nh, P)), axis=(0, 2))

    # layer importance: 1 - cosine(input, output) of each block (drop the
    # most-similar blocks first — reference's depth pruning criterion)
    layer_imp = _layer_importances(bundle)
    return {
        "kv_groups": jnp.stack(kv_imp) if kv_imp else None,
        "ffn": jnp.stack(ffn_imp) if ffn_imp else None,
        "hidden": jnp.mean(jnp.stack(hidden_acc), axis=0) if hidden_acc else None,
        "layers": layer_imp,
        # per-mamba-head importance (reference: mcore_minitron mamba_num_heads
        # pruning, hidden_size_divisor/mamba_head_dim machinery :789-832)
        "mamba_heads": mamba_imp or None,
    }


def _layer_importances(bundle: ModelBundle):
    cfg = bundle.module.cfg
    ids = bundle.example_inputs[0] if bundle.example_inputs else None
    if ids is None:
        return None
    with bundle.contexts():
        _, state = bundle.module.apply(
            bundle.variables, ids, capture_intermediates=True, mutable=["intermediates"]
        )
    inter = state["intermediates"]
    outs = []
    x_in = inter["embed_tokens"]["__call__"][0]
    for i in range(cfg.num_layers):
        x_out = inter[f"layers_{i}"]["__call__"][0][0]
        a = x_in.astype(jnp.float32).reshape(-1, x_in.shape[-1])
        b = x_out.astype(jnp.float32).reshape(-1, x_out.shape[-1])
        cos = jnp.mean(
            jnp.sum(a * b, -1)
            / jnp.maximum(jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-9)
        )
        outs.append(1.0 - cos)
        x_in = x_out
    return jnp.stack(outs)


def _top_idx(scores, k):
    idx = np.argsort(-np.asarray(scores))[:k]
    return np.sort(idx)


def minitron_prune(
    bundle: ModelBundle,
    constraints: dict,
    forward_loop=None,
) -> ModelBundle:
    """constraints: any of {"num_kv_heads": n, "intermediate_size": n,
    "hidden_size": n, "num_layers": n, "mamba_num_heads": n} (absolute
    targets; mamba heads prune per B/C group so the GQA-style group
    structure survives — reference: mcore_minitron mamba_num_heads)."""
    cfg = bundle.module.cfg
    imps = estimate_importances(bundle, forward_loop)
    H, KH, D = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
    G = H // KH
    params = jax.tree.map(lambda x: x, bundle.variables["params"])  # copy

    new_kh = constraints.get("num_kv_heads", KH)
    new_i = constraints.get("intermediate_size", cfg.intermediate_size)
    new_hd = constraints.get("hidden_size", cfg.hidden_size)
    new_l = constraints.get("num_layers", cfg.num_layers)
    new_mnh = constraints.get("mamba_num_heads", cfg.mamba_num_heads)
    assert new_kh <= KH and new_i <= cfg.intermediate_size
    assert new_hd <= cfg.hidden_size and new_l <= cfg.num_layers
    if new_mnh != cfg.mamba_num_heads:
        assert new_mnh % cfg.mamba_groups == 0, \
            "mamba_num_heads must stay divisible by mamba_groups"

    # ---- depth: keep the most important layers, preserve order ----------
    if new_l < cfg.num_layers:
        keep_layers = _top_idx(imps["layers"], new_l)
    else:
        keep_layers = np.arange(cfg.num_layers)

    # ---- hidden dims: global ranking ------------------------------------
    hidden_idx = (
        _top_idx(imps["hidden"], new_hd) if new_hd < cfg.hidden_size else None
    )

    new_layers = {}
    for li, i in enumerate(keep_layers):
        layer = dict(params[f"layers_{i}"])
        if "attn" in layer:
            attn = dict(layer["attn"])
            kv_idx = (
                _top_idx(imps["kv_groups"][i], new_kh) if new_kh < KH
                else np.arange(KH)
            )
            # qkv slicing at group granularity
            qk = attn["q_proj"]["kernel"].reshape(-1, KH, G, D)[:, kv_idx].reshape(
                cfg.hidden_size, -1
            )
            attn["q_proj"] = {**attn["q_proj"], "kernel": qk}
            for name in ("k_proj", "v_proj"):
                kk = attn[name]["kernel"].reshape(-1, KH, D)[:, kv_idx].reshape(
                    cfg.hidden_size, -1
                )
                attn[name] = {**attn[name], "kernel": kk}
            ok = attn["o_proj"]["kernel"].reshape(KH, G, D, -1)[kv_idx].reshape(
                -1, cfg.hidden_size
            )
            attn["o_proj"] = {**attn["o_proj"], "kernel": ok}
            layer["attn"] = attn
        if "mixer" in layer and new_mnh < cfg.mamba_num_heads:
            layer["mixer"] = _slice_mamba_heads(
                layer["mixer"], cfg, new_mnh,
                (imps.get("mamba_heads") or {}).get(i))

        if "mlp" in layer:
            mlp = dict(layer["mlp"])
            ffn_idx = (
                _top_idx(imps["ffn"][i], new_i)
                if new_i < cfg.intermediate_size
                else np.arange(cfg.intermediate_size)
            )
            mlp["gate_proj"] = {**mlp["gate_proj"], "kernel": mlp["gate_proj"]["kernel"][:, ffn_idx]}
            mlp["up_proj"] = {**mlp["up_proj"], "kernel": mlp["up_proj"]["kernel"][:, ffn_idx]}
            mlp["down_proj"] = {**mlp["down_proj"], "kernel": mlp["down_proj"]["kernel"][ffn_idx, :]}
            layer["mlp"] = mlp

        new_layers[f"layers_{li}"] = layer

    new_params = {k: v for k, v in params.items() if not k.startswith("layers_")}
    new_params.update(new_layers)

    # ---- hidden slicing across everything -------------------------------
    if hidden_idx is not None:
        new_params = _slice_hidden(new_params, hidden_idx)

    new_pattern = cfg.hybrid_pattern
    if new_pattern is not None and new_l < cfg.num_layers:
        new_pattern = "".join(new_pattern[i] for i in keep_layers)
    new_plan = cfg.layer_plan
    if new_plan is not None and new_l < cfg.num_layers:
        new_plan = tuple(cfg.layer_plan[i] if i < len(cfg.layer_plan)
                         else () for i in keep_layers)
    new_cfg = dataclasses.replace(
        cfg,
        num_kv_heads=new_kh,
        num_heads=new_kh * G,
        intermediate_size=new_i,
        hidden_size=new_hd,
        num_layers=new_l,
        head_dim=D,
        mamba_num_heads=new_mnh,
        hybrid_pattern=new_pattern,
        layer_plan=new_plan,
    )
    return bundle.replace(
        module=Decoder(new_cfg),
        variables={**bundle.variables, "params": new_params},
    )


def _slice_mamba_heads(mixer: dict, cfg, new_nh: int, head_imp):
    """Slice a Mamba2 mixer's params to ``new_nh`` heads, keeping the B/C
    group structure (heads pruned per group, best-scoring kept). Layout
    (models/ssm.py): in_proj cols = [z (nh*P) | x (nh*P) | B (ng*N) |
    C (ng*N) | dt (nh)]; conv covers [x | B | C]."""
    nh, P, N = cfg.mamba_num_heads, cfg.mamba_head_dim, cfg.mamba_state_dim
    ng, dc = cfg.mamba_groups, cfg.mamba_conv_width
    hpg, new_hpg = nh // ng, new_nh // ng
    if head_imp is None:
        head_imp = jnp.zeros((nh,), jnp.float32)
    scores = np.asarray(head_imp).reshape(ng, hpg)
    keep = np.concatenate([
        g * hpg + np.sort(np.argsort(-scores[g])[:new_hpg])
        for g in range(ng)
    ])                                                  # global head ids
    d_in = nh * P
    chan = (keep[:, None] * P + np.arange(P)[None]).reshape(-1)  # x/z chans

    out = dict(mixer)
    k = mixer["in_proj"]["kernel"]
    z_cols, x_cols = k[:, :d_in][:, chan], k[:, d_in:2 * d_in][:, chan]
    bc_cols = k[:, 2 * d_in:2 * d_in + 2 * ng * N]
    dt_cols = k[:, 2 * d_in + 2 * ng * N:][:, keep]
    out["in_proj"] = {**mixer["in_proj"], "kernel": jnp.concatenate(
        [z_cols, x_cols, bc_cols, dt_cols], axis=1)}
    conv_keep = np.concatenate([chan, d_in + np.arange(2 * ng * N)])
    out["conv_kernel"] = mixer["conv_kernel"][:, conv_keep]
    out["conv_bias"] = mixer["conv_bias"][conv_keep]
    for name in ("A_log", "D", "dt_bias"):
        out[name] = mixer[name][keep]
    out["norm_scale"] = mixer["norm_scale"][chan]
    out["out_proj"] = {**mixer["out_proj"],
                       "kernel": mixer["out_proj"]["kernel"][chan, :]}
    return out


def _slice_hidden(params, idx):
    """Slice every hidden-sized axis: embeddings' feature dim, kernels'
    hidden-facing dims, norm scales."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        leaf = tree
        name = path[-1]
        if name == "embedding":
            return leaf[:, idx]
        if name == "scale" or (name == "bias" and leaf.ndim == 1 and leaf.shape[0] == len(idx)):
            return leaf[idx] if leaf.shape[0] > len(idx) else leaf
        if name == "kernel" and leaf.ndim == 2:
            parent = path[-2]
            if parent in ("q_proj", "k_proj", "v_proj", "qkv_proj", "gate_proj",
                          "up_proj", "gate_up_proj", "fc_in", "lm_head", "router",
                          "in_proj"):
                return leaf[idx, :]
            if parent in ("o_proj", "down_proj", "fc_out", "out_proj"):
                return leaf[:, idx]
        return leaf

    return walk(params)
