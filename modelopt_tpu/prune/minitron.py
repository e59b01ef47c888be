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
    for i in range(cfg.num_layers):
        o_in = caps.get(f"layers_{i}/attn/o_proj")  # [K, H*D]
        if o_in is not None:
            per_head = jnp.mean(jnp.abs(o_in.reshape(-1, KH, G, D)), axis=(0, 2, 3))
            kv_imp.append(per_head)
        d_in = caps.get(f"layers_{i}/mlp/down_proj")  # [K, I]
        if d_in is not None:
            ffn_imp.append(jnp.mean(jnp.abs(d_in), axis=0))
        q_in = caps.get(f"layers_{i}/attn/q_proj")  # [K, Hd] (normed hidden)
        if q_in is not None:
            hidden_acc.append(jnp.mean(jnp.abs(q_in), axis=0))

    # layer importance: 1 - cosine(input, output) of each block (drop the
    # most-similar blocks first — reference's depth pruning criterion)
    layer_imp = _layer_importances(bundle)
    return {
        "kv_groups": jnp.stack(kv_imp) if kv_imp else None,
        "ffn": jnp.stack(ffn_imp) if ffn_imp else None,
        "hidden": jnp.mean(jnp.stack(hidden_acc), axis=0) if hidden_acc else None,
        "layers": layer_imp,
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
    "hidden_size": n, "num_layers": n} (absolute targets)."""
    cfg = bundle.module.cfg
    imps = estimate_importances(bundle, forward_loop)
    H, KH, D = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
    G = H // KH
    params = jax.tree.map(lambda x: x, bundle.variables["params"])  # copy

    new_kh = constraints.get("num_kv_heads", KH)
    new_i = constraints.get("intermediate_size", cfg.intermediate_size)
    new_hd = constraints.get("hidden_size", cfg.hidden_size)
    new_l = constraints.get("num_layers", cfg.num_layers)
    assert new_kh <= KH and new_i <= cfg.intermediate_size
    assert new_hd <= cfg.hidden_size and new_l <= cfg.num_layers

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
        layer = params[f"layers_{i}"]
        attn = dict(layer["attn"])
        kv_idx = (
            _top_idx(imps["kv_groups"][i], new_kh) if new_kh < KH else np.arange(KH)
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

        mlp = dict(layer["mlp"])
        ffn_idx = (
            _top_idx(imps["ffn"][i], new_i)
            if new_i < cfg.intermediate_size
            else np.arange(cfg.intermediate_size)
        )
        mlp["gate_proj"] = {**mlp["gate_proj"], "kernel": mlp["gate_proj"]["kernel"][:, ffn_idx]}
        mlp["up_proj"] = {**mlp["up_proj"], "kernel": mlp["up_proj"]["kernel"][:, ffn_idx]}
        mlp["down_proj"] = {**mlp["down_proj"], "kernel": mlp["down_proj"]["kernel"][ffn_idx, :]}

        new_layers[f"layers_{li}"] = {**layer, "attn": attn, "mlp": mlp}

    new_params = {k: v for k, v in params.items() if not k.startswith("layers_")}
    new_params.update(new_layers)

    # ---- hidden slicing across everything -------------------------------
    if hidden_idx is not None:
        new_params = _slice_hidden(new_params, hidden_idx)

    new_cfg = dataclasses.replace(
        cfg,
        num_kv_heads=new_kh,
        num_heads=new_kh * G,
        intermediate_size=new_i,
        hidden_size=new_hd,
        num_layers=new_l,
        head_dim=D,
    )
    return bundle.replace(
        module=Decoder(new_cfg),
        variables={**bundle.variables, "params": new_params},
    )


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
                          "up_proj", "gate_up_proj", "fc_in", "lm_head", "router"):
                return leaf[idx, :]
            if parent in ("o_proj", "down_proj", "fc_out"):
                return leaf[:, idx]
        return leaf

    return walk(params)
