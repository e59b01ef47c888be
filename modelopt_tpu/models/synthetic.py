"""Build large compressed bundles without materializing full-precision
weights — for benchmarking models whose bf16 form wouldn't fit HBM (e.g. a
16 GB Llama-3-8B on a 16 GB v5e; its INT4-packed form fits with room for
KV cache).

Walks the module's ``eval_shape`` variable tree; eligible kernels are
generated layer-by-layer on device and packed immediately (peak transient =
one kernel), everything else is initialized normally. The resulting bundle
carries proper quantize+compress mode records, so it behaves exactly like
the output of ``mtq.quantize(...); mtq.compress(...)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bundle import ModeRecord, ModelBundle
from ..core.tree import set_in
from ..quant.config import get_config
from ..quant.qtensor import compressible_format, quantize_qtensor


def build_compressed_bundle(module, example_inputs, quant_preset, seed=0,
                            init_scale=0.02):
    """Returns a ModelBundle with packed weights for every kernel the preset
    quantizes, and normally-initialized params elsewhere."""
    cfg = get_config(quant_preset)
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *example_inputs)

    params: dict = {}
    quant: dict = {}
    key = jax.random.PRNGKey(seed)
    # jitted builders cached by (kind, shape, dtype, spec) — layers share
    # shapes, so a 32-layer model compiles a handful of programs, not one
    # per parameter
    fns: dict = {}

    def cached(kind, shape, dtype, fn_maker, *args):
        sig = (kind, shape, str(dtype), args)
        if sig not in fns:
            fns[sig] = jax.jit(fn_maker(shape, dtype, *args))
        return fns[sig]

    def walk(tree, prefix=()):
        nonlocal params, quant, key
        if isinstance(tree, dict) or hasattr(tree, "items"):
            for k, v in tree.items():
                walk(v, prefix + (str(k),))
            return
        path = prefix
        pathstr = "/".join(path)
        key, sub = jax.random.split(key)
        leaf_shape, leaf_dtype = tree.shape, tree.dtype
        is_kernel = path[-1] == "kernel" and len(leaf_shape) in (2, 3)
        if is_kernel:
            dense = pathstr.rsplit("/kernel", 1)[0]
            specs = cfg.resolve(dense + "/weight_quantizer")
            spec = specs[0] if specs else None
            pack_shape = leaf_shape
            if spec is not None and len(leaf_shape) == 3:
                # MoE expert kernels [E, in, out]: pack the FOLDED
                # [in, E*out] view (same fold as quant/compress.py);
                # positive-axis (explicit per-expert) specs don't fold
                axes = tuple(spec.axis or ())
                if spec.block is not None:
                    axes = axes + tuple(int(a) for a, _ in spec.block.sizes)
                if any(a >= 0 for a in axes):
                    spec = None
                else:
                    E, fin, fout = leaf_shape
                    pack_shape = (fin, E * fout)
            if spec is not None and spec.enable and compressible_format(spec, pack_shape):
                fn = cached(
                    "pack", pack_shape, jnp.bfloat16,
                    lambda shape, dtype, spec: (
                        lambda k: quantize_qtensor(
                            jax.random.normal(k, shape, dtype) * init_scale, spec
                        )[0]
                    ),
                    spec,
                )
                qt = fn(sub)
                quant = set_in(quant, tuple(dense.split("/")) + ("qweight",), qt)
                return
        if path[-1] == "scale":  # norm scales start at 1
            arr = cached("ones", leaf_shape, leaf_dtype,
                         lambda shape, dtype: (lambda: jnp.ones(shape, dtype)))()
        elif jnp.issubdtype(leaf_dtype, jnp.floating):
            arr = cached(
                "normal", leaf_shape, leaf_dtype,
                lambda shape, dtype: (
                    lambda k: (jax.random.normal(k, shape) * init_scale).astype(dtype)
                ),
            )(sub)
        else:
            arr = cached("zeros", leaf_shape, leaf_dtype,
                         lambda shape, dtype: (lambda: jnp.zeros(shape, dtype)))()
        params = set_in(params, path, arr)

    walk(shapes["params"], ())

    records = (
        ModeRecord("quantize", cfg, {}),
        ModeRecord("compress", {}, {"compressed": "synthetic"}),
    )
    return ModelBundle(
        module=module,
        variables={"params": params, "quant": quant},
        example_inputs=example_inputs,
        records=records,
    )
