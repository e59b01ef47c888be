"""Public quantization API — the counterpart of ``mtq.*``
(reference: modelopt/torch/quantization/model_quant.py:61,144,269).

Usage:

    import modelopt_tpu.quant as mtq

    qmodel = mtq.quantize(model, mtq.INT8_DEFAULT_CFG, forward_loop)

``forward_loop`` receives a callable ``model_fn(*args, **kwargs)`` that runs
the model while accumulating calibration statistics; call it once per
calibration batch. (The reference passes the model itself; in JAX the stats
live in a variables pytree that must be threaded, so the loop receives a
stateful closure instead.)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from ..core.bundle import PHASE_CALIB, ModelBundle, apply_mode
from .config import QuantizeConfig, get_config
from . import mode as _mode  # noqa: F401  (registers the quantize mode)

# Registry of calibration algorithms: name -> fn(bundle, forward_loop, **kw)
# (reference: per-algorithm calibrate modes, quantization/mode.py:411-571)
CALIB_ALGORITHMS: dict[str, Callable] = {}


def register_calib_algorithm(name: str):
    def deco(fn):
        CALIB_ALGORITHMS[name] = fn
        return fn

    return deco


def quantize(bundle: ModelBundle, config, forward_loop=None) -> ModelBundle:
    """Apply the quantize mode and calibrate
    (reference: model_quant.py:144)."""
    bundle = apply_mode(bundle, "quantize", config)
    cfg: QuantizeConfig = bundle.records[-1].config
    return calibrate(
        bundle, cfg.algorithm_name, forward_loop, **cfg.algorithm_kwargs
    )


def calibrate(
    bundle: ModelBundle, algorithm: Optional[str] = "max", forward_loop=None, **kwargs
) -> ModelBundle:
    """Run a calibration algorithm (reference: model_quant.py:61)."""
    if algorithm is None:
        return bundle
    try:
        fn = CALIB_ALGORITHMS[algorithm]
    except KeyError:
        raise KeyError(
            f"Unknown calibration algorithm {algorithm!r}; "
            f"registered: {sorted(CALIB_ALGORITHMS)}"
        ) from None
    return fn(bundle, forward_loop, **kwargs)


@register_calib_algorithm("max")
def max_calibrate(bundle: ModelBundle, forward_loop=None) -> ModelBundle:
    """Max (absolute) calibration (reference: model_calib.py:311).

    Weight amax is collected on the same pass as activation stats. If no
    ``forward_loop`` is given, one pass over ``bundle.example_inputs`` runs —
    sufficient for weight-only configs where activation quantizers are
    disabled or dynamic.

    Distributed semantics: run this under a mesh context with sharded
    variables/batches and every jnp.max inside is a global (cross-shard)
    reduction — DP/TP/EP amax sync for free (vs. reference's explicit
    all-reduces, model_calib.py:390-498).
    """
    step = jax.jit(bundle.make_fn(phase=PHASE_CALIB, mutable=["quant"]))
    state = {"vars": dict(bundle.variables)}

    def model_fn(*args, **kwargs):
        out, muts = step(state["vars"], *args, **kwargs)
        if "quant" in muts:  # fully-dynamic configs create no calib state
            state["vars"] = {**state["vars"], "quant": muts["quant"]}
        return out

    if forward_loop is not None:
        forward_loop(model_fn)
    else:
        if not bundle.example_inputs:
            raise ValueError(
                "max_calibrate needs a forward_loop or bundle.example_inputs"
            )
        model_fn(*bundle.example_inputs)
    return bundle.replace(variables=state["vars"])


# --------------------------------------------------------------------------
# Introspection / toggling
# --------------------------------------------------------------------------
def disable_quantizer(bundle: ModelBundle, pattern: str) -> ModelBundle:
    """Disable quantizers matching ``pattern``
    (reference: model_quant.py:695)."""
    return _update_rules(bundle, {pattern: {"enable": False}})


def enable_quantizer(bundle: ModelBundle, pattern: str) -> ModelBundle:
    return _update_rules(bundle, {pattern: {"enable": True}})


def _update_rules(bundle: ModelBundle, rules: dict) -> ModelBundle:
    records = list(bundle.records)
    for i in range(len(records) - 1, -1, -1):
        if records[i].mode == "quantize":
            import dataclasses

            cfg = get_config(records[i].config).updated(rules)
            records[i] = dataclasses.replace(records[i], config=cfg)
            return bundle.replace(records=tuple(records))
    raise ValueError("model has no quantize mode applied")


def quantizer_specs(bundle: ModelBundle):
    """Trace the model abstractly and list (path, resolved specs) for every
    quantization point — the basis of print_quant_summary
    (reference: model_quant.py:706)."""
    from ..nn import quantizer as qz

    captured: list = []
    token = qz._CAPTURE.set(captured)
    try:
        fn = bundle.make_fn(phase=PHASE_CALIB, mutable=["quant"])
        jax.eval_shape(fn, bundle.variables, *bundle.example_inputs)
    finally:
        qz._CAPTURE.reset(token)
    return captured


def print_quant_summary(bundle: ModelBundle) -> str:
    lines = []
    for path, specs in quantizer_specs(bundle):
        if not specs:
            lines.append(f"{path}: disabled")
        else:
            descs = []
            for s in specs:
                kind = f"{s.num_bits}" if not s.is_fp else f"e{s.fp_format.exp_bits}m{s.fp_format.man_bits}"
                extra = ""
                if s.block is not None:
                    extra = f" block{dict(s.block.sizes)}" + (
                        f" scale={s.block.scale_format}" if s.block.scale_format else ""
                    )
                elif s.axis is not None:
                    extra = f" axis={s.axis}"
                descs.append(kind + extra)
            lines.append(f"{path}: {' -> '.join(descs)}")
    out = "\n".join(lines)
    print(out)
    return out
