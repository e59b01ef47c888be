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
import jax.numpy as jnp

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
    bundle = calibrate(
        bundle, cfg.algorithm_name, forward_loop, **cfg.algorithm_kwargs
    )
    if cfg.algorithm_name is not None:
        validate_calibration(bundle, raise_on_error=False)
    return bundle


def validate_calibration(bundle: ModelBundle, raise_on_error: bool = True):
    """Calibration-completeness check: every stored amax must be finite and
    strictly positive on EVERY element. A zero slice almost always means an
    expert/branch that no calibration token routed through — the failure
    the reference guards with its MoE calibration-completeness assert
    (reference: model_calib.py:226). Returns the list of offending paths.
    """
    import warnings

    from ..core.tree import flatten_with_paths

    bad = []
    for path, leaf in flatten_with_paths(bundle.variables.get("quant", {})):
        if not path.endswith("amax"):
            continue
        arr = jnp.asarray(leaf)
        finite = bool(jnp.all(jnp.isfinite(arr)))
        pos = bool(jnp.all(arr > 0))
        if not (finite and pos):
            bad.append(path)
    if bad:
        msg = (
            "calibration incomplete: zero/non-finite amax at "
            + ", ".join(bad[:8])
            + (" ..." if len(bad) > 8 else "")
            + " — for MoE, feed calibration data that routes through every "
            "expert (reference: model_calib.py:226)"
        )
        if raise_on_error:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    return bad


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


def fold_weight(bundle: ModelBundle) -> ModelBundle:
    """Bake fake-quantization into the stored weights and disable the weight
    quantizers (reference: model_quant.py:725). The model then runs at full
    speed with quantized-valued weights — e.g. before export or QAT-free
    deployment of weight-only configs."""
    from ..core.tree import get_in, set_in
    from .fake_quant import fake_quantize
    from ..nn.quantizer import _broadcast_amax

    variables = bundle.variables
    folded = []
    for path, specs in quantizer_specs(bundle):
        if not path.endswith("/weight_quantizer") or not specs:
            continue
        spec = specs[0]
        if not spec.enable:
            continue
        dense_path = path.rsplit("/weight_quantizer", 1)[0]
        kpath = tuple(dense_path.split("/")) + ("kernel",)
        w = get_in(variables.get("params", {}), kpath)
        if w is None:
            continue
        amax = get_in(variables.get("quant", {}), tuple(path.split("/")) + ("amax",))
        kw = {}
        if amax is not None:
            if spec.block is not None and spec.block.dynamic:
                kw["tensor_amax"] = amax
            elif spec.block is not None:
                kw["amax"] = amax
            else:
                kw["amax"] = _broadcast_amax(amax, w)
        wq = fake_quantize(w.astype(jnp.float32), spec, **kw).astype(w.dtype)
        variables = {**variables, "params": set_in(variables["params"], kpath, wq)}
        folded.append(dense_path)
    out = bundle.replace(variables=variables)
    return _update_rules(out, {p + "/weight_quantizer": {"enable": False} for p in folded})


def compute_quantization_mse(bundle: ModelBundle, batch=None) -> dict:
    """Per-quantization-point output-MSE diagnostics
    (reference: model_quant.py:737)."""
    from .algorithms.capture import capture_inputs, quant_linears
    from .algorithms.capture import fq_with_amax, weight_amax_map

    captured = capture_inputs(
        bundle, (lambda f: f(*([batch] if batch is not None else bundle.example_inputs)))
        if batch is not None else None,
    )
    out = {}
    for info in quant_linears(bundle, captured):
        amax = weight_amax_map(info.kernel, info.wspec)
        wq = fq_with_amax(info.kernel, amax, info.wspec)
        diff = info.x @ (wq - info.kernel)
        ref = info.x @ info.kernel
        out[info.dense_path] = {
            "weight_mse": float(jnp.mean((wq - info.kernel) ** 2)),
            "output_rel_err": float(
                jnp.linalg.norm(diff) / jnp.maximum(jnp.linalg.norm(ref), 1e-12)
            ),
        }
    return out


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
