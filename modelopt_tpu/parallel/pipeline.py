"""Pipeline parallelism: GPipe microbatch schedule over a named mesh axis.

The reference tolerates pipeline-parallel models built by Megatron and syncs
quantizer state across PP ranks (reference: modelopt/torch/utils/
distributed.py:341 ParallelState with a pipeline_parallel_group;
model_calib.py sync notes). On TPU there is no rank loop to port: the
pipeline is ONE jitted program — layer stacks are stacked into a leading
stage dimension sharded over the ``pp`` mesh axis, and a ``shard_map`` +
``lax.ppermute`` GPipe schedule streams microbatches through the stages.
XLA overlaps the per-stage compute with the ICI/DCN activation transfer.

Because the whole schedule is traced, the backward pass (QAT under PP)
falls out of ``jax.grad`` — no 1F1B hand-scheduling, no send/recv pairs to
keep deadlock-free.  Put ``pp`` on the DCN (outer) axis of a hybrid mesh:
activations cross hosts once per stage boundary per microbatch, which is
exactly the traffic pattern PP is chosen for.

Layout contract: every ``layers_{i}`` subtree of every variable collection
must be structurally identical (homogeneous decoder — true for all model-zoo
configs without puzzle-style per-layer surgery).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map


# ---------------------------------------------------------------------------
# Parameter restructuring: layers_{i} dicts -> stacked [S, L/S, ...] pytree
# ---------------------------------------------------------------------------
def split_layer_variables(variables: dict, num_layers: int):
    """Split each collection into (layer subtrees list, everything else)."""
    layer_vars = []
    rest: dict = {}
    for col, tree in variables.items():
        if not isinstance(tree, dict):
            rest[col] = tree
            continue
        rest[col] = {k: v for k, v in tree.items() if not k.startswith("layers_")}
    for i in range(num_layers):
        per_layer = {}
        for col, tree in variables.items():
            if isinstance(tree, dict) and f"layers_{i}" in tree:
                per_layer[col] = tree[f"layers_{i}"]
        layer_vars.append(per_layer)
    return layer_vars, rest


def stack_pipeline_stages(variables: dict, num_layers: int, num_stages: int):
    """Stack per-layer variable trees into a [S, L/S, ...] leading-dim
    pytree (plus the non-layer remainder). The stage dim is what gets
    sharded over the ``pp`` mesh axis."""
    if num_layers % num_stages != 0:
        raise ValueError(f"{num_layers} layers not divisible into {num_stages} stages")
    per_stage = num_layers // num_stages
    layer_vars, rest = split_layer_variables(variables, num_layers)
    ref = jax.tree.structure(layer_vars[0])
    for i, lv in enumerate(layer_vars[1:], 1):
        if jax.tree.structure(lv) != ref:
            raise ValueError(
                f"layers_0 and layers_{i} differ structurally — pipeline "
                "stages need a homogeneous layer stack"
            )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_vars)
    stacked = jax.tree.map(
        lambda a: a.reshape(num_stages, per_stage, *a.shape[1:]), stacked
    )
    return stacked, rest


def unstack_pipeline_stages(stacked, rest: dict, num_layers: int) -> dict:
    """Inverse of stack_pipeline_stages (for checkpoint round-trips)."""
    flat = jax.tree.map(
        lambda a: a.reshape(num_layers, *a.shape[2:]), stacked
    )
    out = {col: dict(tree) if isinstance(tree, dict) else tree
           for col, tree in rest.items()}
    for i in range(num_layers):
        layer_i = jax.tree.map(lambda a: a[i], flat)
        for col, sub in layer_i.items():
            out.setdefault(col, {})[f"layers_{i}"] = sub
    return out


# ---------------------------------------------------------------------------
# GPipe schedule under shard_map
# ---------------------------------------------------------------------------
def gpipe(
    layer_fn: Callable,
    stacked_vars,
    x: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pp",
):
    """Run ``x`` through the stage-stacked layer stack on ``mesh``.

    layer_fn(layer_variables, h) -> h applies ONE decoder layer.
    x: [B, ...] activations; B must divide into num_microbatches.
    Returns activations with x's shape, computed as if the layers ran
    sequentially (parity with the unpipelined model is exact up to
    reduction order).

    Schedule: classic GPipe fill/steady/drain — T = M + S - 1 ticks; at
    tick t stage s computes microbatch (t - s) if 0 <= t - s < M, and
    activations hop one stage over ``ppermute`` between ticks. Bubble
    fraction (S-1)/(M+S-1); pick M >= 4*S for training.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = x.reshape(M, B // M, *x.shape[1:])

    def stage_fn(stage_vars, h):
        def body(h, lv):
            return layer_fn(lv, h), None
        h, _ = jax.lax.scan(body, h, stage_vars)
        return h

    fwd = [(i, (i + 1) % S) for i in range(S)]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(*[None] * mb.ndim)),
        out_specs=P(*[None] * mb.ndim),
        check_vma=False,
    )
    def run(stacked, mb):
        sid = jax.lax.axis_index(axis)
        stage_vars = jax.tree.map(lambda a: a[0], stacked)  # local stage

        def tick(carry, t):
            buf, outs = carry
            # stage 0 ingests microbatch t (clamped; masked-out later),
            # other stages ingest what the previous stage just sent
            src = mb[jnp.clip(t, 0, M - 1)]
            h = jnp.where(sid == 0, src, buf)
            y = stage_fn(stage_vars, h)
            # last stage finishes microbatch t - (S - 1) at tick t
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(sid == S - 1, t >= S - 1)
            outs = jnp.where(
                write,
                jax.lax.dynamic_update_index_in_dim(outs, y, widx, 0),
                outs,
            )
            buf = jax.lax.ppermute(y, axis, fwd)
            return (buf, outs), None

        init = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # replicate the last stage's outputs (out_specs P(None) demands
        # identical values on every shard)
        return jax.lax.psum(
            jnp.where(sid == S - 1, outs, jnp.zeros_like(outs)), axis
        )

    out = run(stacked_vars, mb)
    return out.reshape(B, *x.shape[1:])


def stage_sharding(mesh: Mesh, axis: str = "pp"):
    """NamedSharding placing the leading stage dim of stacked variables on
    the pp axis (apply with jax.device_put / as pjit in_shardings)."""
    def shard(tree):
        return jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(axis, *[None] * (a.ndim - 1)))
            ),
            tree,
        )
    return shard


# ---------------------------------------------------------------------------
# Decoder integration: full LM forward with the layer stack pipelined
# ---------------------------------------------------------------------------
def make_block_layer_fn(cfg, positions, mask):
    """layer_fn for gpipe from the model zoo's Block (prefill/training path,
    no KV cache — serving decode keeps tp/dp sharding where it wins)."""
    from ..models.transformer import Block

    block = Block(cfg, layer_index=0)

    def layer_fn(layer_vars, h):
        out, _ = block.apply(layer_vars, h, positions, mask)
        return out

    return layer_fn


def pipeline_lm_forward(
    cfg,
    variables: dict,
    input_ids: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int = 4,
    axis: str = "pp",
    stacked=None,
):
    """Full causal-LM forward (embed -> pipelined layers -> norm -> logits).

    Embedding/head run replicated (they are excluded from quantization
    presets and tiny next to the layer stack); the layer stack — with its
    quantizers live, so PTQ/QAT semantics match the sequential model —
    runs under the GPipe schedule. Pass ``stacked`` (from
    stack_pipeline_stages, device_put via stage_sharding) to avoid
    re-stacking every call; ``variables`` then only needs the non-layer
    remainder.
    """
    p = variables["params"]
    B, T = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    key_pos = positions[:, None, :]
    valid = key_pos <= positions[:, :, None]
    if cfg.attention_window is not None:
        in_window = key_pos > positions[:, :, None] - cfg.attention_window
        sink = key_pos < cfg.attention_sink
        valid = valid & (in_window | sink)
    mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

    x = jnp.take(p["embed_tokens"]["embedding"], input_ids, axis=0).astype(
        cfg.dtype or jnp.float32
    )
    if stacked is None:
        stacked, _ = stack_pipeline_stages(variables, cfg.num_layers, mesh.shape[axis])
        stacked = stage_sharding(mesh, axis)(stacked)

    # microbatch positions/mask alongside x? They are batch-major and
    # identical across microbatches here (fresh prefill), so closing over
    # the per-microbatch slice shape is enough: slice them to one
    # microbatch inside layer_fn via the leading dim of h.
    mbB = B // num_microbatches
    layer_fn = make_block_layer_fn(cfg, positions[:mbB], mask[:mbB])
    h = gpipe(layer_fn, stacked, x, mesh, num_microbatches, axis)

    from ..nn.layers import RMSNorm

    h = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype).apply(
        {"params": p["final_norm"]}, h
    )
    if cfg.tie_word_embeddings:
        logits = h @ p["embed_tokens"]["embedding"].T.astype(h.dtype)
    else:
        logits = h @ p["lm_head"]["kernel"].astype(h.dtype)
    return logits
