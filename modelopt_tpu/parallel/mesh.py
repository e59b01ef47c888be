"""Device-mesh utilities: named meshes + rule-based parameter sharding.

The reference consumes torch.distributed process groups
(reference: modelopt/torch/utils/distributed.py:341 ParallelState); the TPU
design replaces all of it with one ``jax.sharding.Mesh`` with named axes
(dp, tp, ep, sp) and rule-derived ``NamedSharding``s. Collectives are
inserted by XLA from the shardings (scaling-book recipe) — there is no NCCL
wrapper layer to port.

Quantizer-state note: calibration statistics ('quant' collection) are scalars
or small per-channel vectors; they are replicated. Because calibration
reductions (jnp.max/mean) run under GSPMD on sharded activations/weights,
their values are globally consistent across dp/tp/ep *by construction* —
the invariant the reference maintains with explicit all-reduces
(model_calib.py:390-498) and re-sharding hooks.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict, devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh from ``{"dp": 2, "tp": 4}``-style axis sizes.

    Axis order follows dict order; put the fastest-varying (ICI-adjacent)
    axis last — tp innermost is the right default on v5e/v5p.
    """
    devices = list(devices if devices is not None else jax.devices())
    sizes = list(axis_sizes.values())
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axis_sizes.keys()))


# ---------------------------------------------------------------------------
# Partition rules: ordered (path-regex, PartitionSpec) pairs, first match wins.
# Paths are '/'-joined variable paths like 'layers_3/attn/q_proj/kernel'.
# ---------------------------------------------------------------------------
DECODER_RULES: tuple = (
    # MoE expert weights: experts over ep, out-features over tp
    (r".*/moe/(gate_proj|up_proj)/kernel", P("ep", None, "tp")),
    (r".*/moe/down_proj/kernel", P("ep", "tp", None)),
    (r".*/moe/router/kernel", P(None, None)),
    # shared experts (deepseek/llama4): dense MLP inside the moe scope
    (r".*/moe/shared_experts/(gate_proj|up_proj)/kernel", P(None, "tp")),
    (r".*/moe/shared_experts/down_proj/kernel", P("tp", None)),
    # MoE expert biases (gpt-oss)
    (r".*/moe/(gate_proj|up_proj)/bias", P("ep", "tp")),
    (r".*/moe/down_proj/bias", P("ep", None)),
    # attention: column-parallel qkv (incl. fused), row-parallel output
    (r".*/(q_proj|k_proj|v_proj|qkv_proj)/kernel", P(None, "tp")),
    (r".*/(q_proj|k_proj|v_proj|qkv_proj)/bias", P("tp")),
    (r".*/o_proj/kernel", P("tp", None)),
    # MLA: per-head expansions are column-parallel; the shared latent
    # projections/norms stay replicated (the latent row is per-token
    # shared state, tiny next to the per-head tensors)
    (r".*/(q_b_proj|kv_b_proj)/kernel", P(None, "tp")),
    (r".*/(q_a_proj|kv_a_proj)/kernel", P(None, None)),
    # Mamba2 mixers (hybrid Nemotron-H/Bamba class): column-parallel
    # in_proj, row-parallel out_proj — the mcore sharding
    # (reference: export/plugins/mcore_nemotron.py COL_TP in_proj /
    # ROW_TP out_proj). The z/xBC/dt split and conv/SSM internals run on
    # whatever sharding GSPMD propagates; the conv window and SSM state
    # ride the cache slots (kv_cache_shardings: dp over slots, tp over
    # the lane dim). A/dt/D/conv params are tiny and replicate.
    (r".*/mixer/in_proj/kernel", P(None, "tp")),
    (r".*/mixer/out_proj/kernel", P("tp", None)),
    # dense MLP: column-parallel in, row-parallel out (incl. fused gate_up
    # and nemotron's ungated up/down)
    (r".*/mlp/(gate_proj|up_proj|gate_up_proj|fc_in)/kernel", P(None, "tp")),
    (r".*/mlp/(gate_proj|up_proj|gate_up_proj|fc_in)/bias", P("tp")),
    (r".*/mlp/(down_proj|fc_out)/kernel", P("tp", None)),
    # embeddings / lm head: vocab-parallel
    (r".*embed_tokens/embedding", P("tp", None)),
    (r".*embed_positions/embedding", P(None, None)),
    (r".*lm_head/kernel", P(None, "tp")),
    # everything else (norms, biases, quant stats): replicated
    (r".*", P()),
)


def spec_for_path(path: str, rules=DECODER_RULES, mesh: Optional[Mesh] = None) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            if mesh is not None:
                # drop axes the mesh doesn't have (e.g. no 'ep' on dense runs)
                spec = P(*[
                    a if (a is None or a in mesh.axis_names) else None for a in spec
                ])
            return spec
    return P()


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (str(k),))
    else:
        yield "/".join(prefix), tree


def variable_shardings(variables, mesh: Mesh, rules=DECODER_RULES):
    """Pytree of NamedShardings matching ``variables``' structure."""

    def walk(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (str(k),)) for k, v in tree.items()}
        path = "/".join(prefix)
        spec = spec_for_path(path, rules, mesh)
        # guard: don't shard dims the array can't split evenly
        arr = tree
        fixed = []
        for i, a in enumerate(spec):
            if a is None or i >= getattr(arr, "ndim", 0):
                fixed.append(None)
                continue
            size = mesh.shape[a] if not isinstance(a, tuple) else int(
                np.prod([mesh.shape[x] for x in a])
            )
            fixed.append(a if arr.shape[i] % size == 0 else None)
        return NamedSharding(mesh, P(*fixed) if fixed else P())

    return walk(variables)


def shard_variables(variables, mesh: Mesh, rules=DECODER_RULES):
    """device_put every variable according to the rules."""
    shardings = variable_shardings(variables, mesh, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), variables, shardings,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def shard_bundle(bundle, mesh: Mesh, rules=DECODER_RULES):
    return bundle.replace(variables=shard_variables(bundle.variables, mesh, rules))


def kv_cache_shardings(cache, mesh: Mesh):
    """NamedShardings for a serving KV cache pytree (make_cache /
    make_paged_cache layout): k/v rows are [B, S, KH*D] (heads merged into
    the lane dim) — slots shard over ``dp``, the merged head-dim over
    ``tp``; lengths/page tables and other small state replicate. Dims that
    don't divide their mesh axis stay unsharded (same guard as
    variable_shardings)."""

    def spec_for(path, arr):
        name = path[-1] if path else ""
        if name in ("k", "v") and getattr(arr, "ndim", 0) == 3:
            B, _, KHD = arr.shape
            dp = "dp" if ("dp" in mesh.axis_names and B % mesh.shape["dp"] == 0
                          and mesh.shape["dp"] > 1) else None
            tp = "tp" if ("tp" in mesh.axis_names
                          and KHD % mesh.shape["tp"] == 0
                          and mesh.shape["tp"] > 1) else None
            return P(dp, None, tp)
        return P()

    def walk(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        if isinstance(tree, tuple):
            return tuple(walk(v, prefix) for v in tree)
        return NamedSharding(mesh, spec_for(prefix, tree))

    return walk(cache)
