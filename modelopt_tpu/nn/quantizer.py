"""TensorQuantizer as a linen module + trace-time quantization contexts.

The functional re-architecture of the reference's universal quantizer
(reference: modelopt/torch/quantization/nn/modules/tensor_quantizer.py:136).
Where the reference stores amax/pre_quant_scale as buffers on a mutated
nn.Module, here they are entries in the model's ``'quant'`` variable
collection, and the quantizer's *behavior* (collect vs. quantize vs. off) is
chosen by a trace-time phase:

    PHASE_CALIB: pass through unquantized, max-update the calib statistics
                 (mutable=['quant'] apply). Under pjit/GSPMD on a sharded
                 mesh, jnp.max over a sharded tensor is a *global* max, so the
                 reference's entire DP/TP/EP amax all-reduce machinery
                 (model_calib.py:390-498) collapses into ordinary reductions.
    PHASE_QUANT: fake-quantize with the calibrated statistics.
    PHASE_OFF:   identity.

The active QuantizeConfig is bound with ``quantization_active`` — a static,
trace-time context: jitted entry points must be built per (config, phase)
(ModelBundle.make_fn does this).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.bundle import (
    PHASE_CALIB,
    PHASE_CAPTURE,
    PHASE_OFF,
    PHASE_QUANT,
    current_phase as _core_current_phase,
)
from ..quant.config import QuantizeConfig
from ..quant.fake_quant import _blocked, fake_quantize, reduce_amax
from ..quant.qspec import QuantizerSpec

_ACTIVE_CFG: contextvars.ContextVar = contextvars.ContextVar("quant_cfg", default=None)
# When set to a list, quantizers record (path, resolved_specs) at trace time
# — used by print_quant_summary and the search algorithms.
_CAPTURE: contextvars.ContextVar = contextvars.ContextVar("quant_capture", default=None)
# fnmatch pattern limiting which quantizers sow in CAPTURE phase — the
# layerwise (memory-bounded) calibration replay
# (reference: layerwise_calibrate, model_calib.py:2051)
_CAPTURE_FILTER: contextvars.ContextVar = contextvars.ContextVar(
    "quant_capture_filter", default=None
)
# {dense_path: zero-valued array} added to each module's OUTPUT in CAPTURE
# phase. jax.grad w.r.t. these perturbations yields dL/d(output) at every
# quantized module in ONE backward pass — the TPU-native equivalent of the
# reference's backward hooks feeding the AutoQuantize gradient score
# (reference: algorithms.py:1432 _get_auto_quantize_score).
_PERTURB: contextvars.ContextVar = contextvars.ContextVar(
    "quant_perturb", default=None
)


@contextlib.contextmanager
def output_perturbations(perturbs: dict):
    """Bind a {dense_path: zeros_like(output)} dict whose entries are added
    to module outputs in CAPTURE phase (see ``_PERTURB``)."""
    tok = _PERTURB.set(perturbs)
    try:
        yield
    finally:
        _PERTURB.reset(tok)


@contextlib.contextmanager
def quantization_active(cfg: QuantizeConfig, phase: str = None):
    """Bind the active QuantizeConfig (phase arg kept for API compat; the
    phase itself is set globally by ModelBundle.contexts)."""
    t1 = _ACTIVE_CFG.set(cfg)
    try:
        yield
    finally:
        _ACTIVE_CFG.reset(t1)


def active_quant_config() -> Optional[QuantizeConfig]:
    return _ACTIVE_CFG.get()


def current_phase() -> str:
    return _core_current_phase()


def _needs_static_amax(spec: QuantizerSpec) -> bool:
    if spec.dynamic:
        return False
    if spec.block is None:
        return True
    if not spec.block.dynamic:
        return True  # static per-block scales
    return spec.block.two_level  # dynamic blocks but calibrated tensor amax


def _stat_shape_and_value(x, spec: QuantizerSpec):
    """Calibration statistic for one batch: (value, kind)."""
    if spec.block is not None:
        if spec.block.dynamic:  # two-level: per-tensor amax only
            return jnp.max(jnp.abs(x)).astype(jnp.float32), "scalar"
        xb, _, baxes = _blocked(x.astype(jnp.float32), spec.block)
        return jnp.max(jnp.abs(xb), axis=baxes, keepdims=True), "block"
    if spec.axis is None:
        return jnp.max(jnp.abs(x)).astype(jnp.float32), "scalar"
    # keep trailing axes; store without leading singleton dims
    keep = tuple(a % x.ndim for a in spec.axis)
    if any(a < x.ndim - len(keep) for a in keep):
        # non-trailing kept axes: store full keepdims shape (weights only —
        # their shape is stable across calls)
        return reduce_amax(x.astype(jnp.float32), spec.axis, keepdims=True), "keepdims"
    red = tuple(i for i in range(x.ndim) if i not in keep)
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=red), "trailing"


def _broadcast_amax(amax, x):
    if amax.ndim < x.ndim:
        amax = amax.reshape((1,) * (x.ndim - amax.ndim) + amax.shape)
    return amax


class TensorQuantizer(nn.Module):
    """Quantization point. Instantiated by Quant* layers under canonical names
    (``input_quantizer`` / ``weight_quantizer`` / ``output_quantizer`` /
    ``k_quantizer`` / ``v_quantizer``) so wildcard configs written against the
    reference's naming carry over (reference: nn/modules/quant_linear.py:38).

    ``fixed_spec`` bypasses config resolution (used by techniques that pin a
    format, e.g. KV-cache quantizers created with an explicit spec).
    """

    fixed_spec: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x, with_scale: bool = False, skip_fake: bool = False):
        """with_scale=True: for an fp8 per-tensor static spec in QUANT phase,
        return ``(codes_e4m3, scale)`` so callers can store real quantized
        data (e.g. the fp8 KV cache); otherwise returns ``(x', None)``.

        skip_fake=True: the caller feeds a fused real-quant GEMM whose
        backend quantizes the activations on-device (per-token dynamic) —
        apply pre_quant_scale / capture as usual but skip the fake-quant
        rounding, which would round the same grid twice (callers assert the
        resolved spec matches the backend's quantization)."""

        def ret(y, scale=None):
            return (y, scale) if with_scale else y

        cfg = active_quant_config()
        phase = current_phase()
        if phase == PHASE_OFF:
            return ret(x)
        if self.fixed_spec is not None:
            specs = (self.fixed_spec,)
        elif cfg is None:
            # no active quantize config: still participate in CAPTURE phase
            # (algorithms like sparsegpt run on unquantized bundles too)
            if phase != PHASE_CAPTURE:
                return ret(x)
            specs = None
        else:
            specs = cfg.resolve("/".join(self.path))
        cap = _CAPTURE.get()
        if cap is not None:
            cap.append(("/".join(self.path), specs))

        # pre-quant scale (SmoothQuant / AWQ): created by calibration
        # algorithms, applied before any quantization — and also when this
        # quantizer itself is disabled (weight-only AWQ still rescales the
        # activation path; reference: tensor_quantizer.py pre_quant_scale).
        if self.has_variable("quant", "pre_quant_scale"):
            pqs = self.get_variable("quant", "pre_quant_scale")
            x = (x * pqs).astype(x.dtype)

        if phase == PHASE_CAPTURE:
            # record this quantization point's input for layer-wise algorithms
            # (reference: cached activations in awq/gptq, model_calib.py:1395)
            last = self.path[-1] if self.path else ""
            filt = _CAPTURE_FILTER.get()
            from fnmatch import fnmatch as _fnm

            if last == "input_quantizer":
                if filt is None or _fnm("/".join(self.path), filt):
                    self.sow("quant_capture", "x", x.reshape(-1, x.shape[-1]))
            elif (last in ("q_quantizer", "k_quantizer", "v_quantizer")
                  and filt is not None and _fnm("/".join(self.path), filt)):
                # attention tensors sow only under an explicit filter (used
                # by skip-softmax threshold calibration)
                self.sow("quant_capture", "x", x.reshape(-1, x.shape[-1]))
            if self.path and self.path[-1] == "output_quantizer":
                perturbs = _PERTURB.get()
                if perturbs is not None:
                    p = perturbs.get("/".join(self.path[:-1]))
                    if p is not None:
                        x = x + p.astype(x.dtype)
            return ret(x)

        if not specs:
            return ret(x)
        if skip_fake and phase == PHASE_QUANT:
            return ret(x)

        # real-codes path for per-tensor static specs (KV cache storage):
        # fp8 e4m3 or int8 codes + one fp32 scale
        if (
            with_scale
            and phase == PHASE_QUANT
            and len(specs) == 1
            and specs[0].enable
            and specs[0].block is None
            and specs[0].axis is None
            and not specs[0].dynamic
            and not specs[0].rotate
            and self.has_variable("quant", "amax")
        ):
            sp = specs[0]
            amax = self.get_variable("quant", "amax")
            if sp.is_fp and (sp.fp_format.exp_bits, sp.fp_format.man_bits) == (4, 3):
                scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 448.0
                codes = jnp.clip(x.astype(jnp.float32) / scale, -448.0, 448.0).astype(
                    jnp.float8_e4m3fn
                )
                return codes, scale
            if not sp.is_fp and sp.num_bits == 8:
                scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
                codes = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0
                ).astype(jnp.int8)
                return codes, scale

        # Hadamard rotation (QuaRot-style): quantize in the rotated basis,
        # rotate back — calibration statistics are likewise collected on the
        # rotated tensor (reference: config.py:289 RotateConfig).
        rotated = any(s.enable and s.rotate for s in specs)
        if rotated:
            from ..quant.rotation import hadamard_rotate

            x = hadamard_rotate(x)
        for i, spec in enumerate(specs):
            if not spec.enable:
                continue
            x = self._apply_one(x, spec, "amax" if i == 0 else f"amax_{i}", phase)
        if rotated:
            from ..quant.rotation import hadamard_rotate

            x = hadamard_rotate(x)
        return ret(x)

    def _apply_one(self, x, spec: QuantizerSpec, amax_name: str, phase: str):
        # affine (asymmetric) quantization: track min/max, quantize the
        # centered tensor, restore the bias (reference: calib/bias.py:100
        # BiasCalibrator + bias attrs in QuantizerAttributeConfig)
        if spec.bias_mode is not None and spec.block is None:
            return self._apply_affine(x, spec, phase)
        needs_amax = _needs_static_amax(spec)
        if phase == PHASE_CALIB:
            if needs_amax and not self.is_initializing():
                stat, _ = _stat_shape_and_value(x, spec)
                var = self.variable(
                    "quant", amax_name, lambda: jnp.zeros(stat.shape, jnp.float32)
                )
                var.value = jnp.maximum(var.value, stat)
            return x

        # PHASE_QUANT
        amax = None
        tensor_amax = None
        if needs_amax:
            if not self.has_variable("quant", amax_name):
                raise ValueError(
                    f"Quantizer {'/'.join(self.path)} has no calibrated "
                    f"'{amax_name}'. Run calibrate() first (or use a dynamic spec)."
                )
            a = self.get_variable("quant", amax_name)
            if spec.block is not None and spec.block.dynamic:
                tensor_amax = a  # two-level: calibrated per-tensor amax
            elif spec.block is not None:
                amax = a  # static per-block amax (already keepdims-shaped)
            else:
                amax = _broadcast_amax(a, x)
        return fake_quantize(x, spec, amax=amax, tensor_amax=tensor_amax)

    def _apply_affine(self, x, spec: QuantizerSpec, phase: str):
        import dataclasses

        keep = spec.axis
        if phase == PHASE_CALIB:
            if not self.is_initializing():
                if keep is None:
                    xmax, xmin = jnp.max(x).astype(jnp.float32), jnp.min(x).astype(jnp.float32)
                else:
                    kset = tuple(a % x.ndim for a in keep)
                    red = tuple(i for i in range(x.ndim) if i not in kset)
                    xmax = jnp.max(x, axis=red).astype(jnp.float32)
                    xmin = jnp.min(x, axis=red).astype(jnp.float32)
                vmax = self.variable("quant", "xmax",
                                     lambda: jnp.full(xmax.shape, -jnp.inf, jnp.float32))
                vmin = self.variable("quant", "xmin",
                                     lambda: jnp.full(xmin.shape, jnp.inf, jnp.float32))
                vmax.value = jnp.maximum(vmax.value, xmax)
                vmin.value = jnp.minimum(vmin.value, xmin)
            return x
        if not self.has_variable("quant", "xmax"):
            raise ValueError(
                f"Affine quantizer {'/'.join(self.path)} not calibrated"
            )
        xmax = _broadcast_amax(self.get_variable("quant", "xmax"), x)
        xmin = _broadcast_amax(self.get_variable("quant", "xmin"), x)
        bias = (xmax + xmin) / 2.0
        amax = jnp.maximum((xmax - xmin) / 2.0, 1e-12)
        sym = dataclasses.replace(spec, bias_mode=None)
        centered = (x.astype(jnp.float32) - bias)
        return (fake_quantize(centered, sym, amax=amax) + bias).astype(x.dtype)
