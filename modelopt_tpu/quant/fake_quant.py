"""Fake-quantization as pure JAX functions with straight-through estimators.

This layer replaces the reference's autograd Functions + CUDA/Triton kernels
(reference: modelopt/torch/quantization/tensor_quant.py:319,402,497,571 and
modelopt/torch/kernels/) with composable jnp ops. XLA fuses the whole
scale→round→clip→rescale chain into a few VPU ops, so no hand-written kernel
is needed for fake-quant on TPU; Pallas kernels are reserved for packed-weight
dequant-GEMM and quantized-KV attention (see modelopt_tpu/kernels/).

STE composition: ``ste_round``/``ste_cast`` pass gradients through the
rounding, while ``jnp.clip`` naturally zeroes gradients outside the
representable range — together reproducing the reference STE semantics
(reference: tensor_quant.py:291-317) while keeping the scale path
differentiable for LSQ-style learned amax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .formats import FPFormat, cast_to_fp, parse_format
from .qspec import BlockSpec, QuantizerSpec

_TINY = 1e-24


# --------------------------------------------------------------------------
# Straight-through primitives
# --------------------------------------------------------------------------
@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


ste_round.defvjp(lambda x: (jnp.round(x), None), lambda _, g: (g,))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def ste_cast(x, fmt: FPFormat):
    return cast_to_fp(x, fmt)


ste_cast.defvjp(
    lambda x, fmt: (cast_to_fp(x, fmt), None),
    lambda fmt, _, g: (g,),
)


# --------------------------------------------------------------------------
# amax / reduction helpers
# --------------------------------------------------------------------------
def reduce_amax(x, axis=None, keepdims=True):
    """Max of |x| reduced over all dims *except* ``axis`` (the kept dims).

    Mirrors reference semantics where ``axis`` names the dims that retain
    separate amax values (reference: modelopt/torch/quantization/utils.py
    reduce_amax).
    """
    x = jnp.abs(x)
    if axis is None:
        return jnp.max(x) if not keepdims else jnp.max(x, keepdims=True)
    keep = tuple(a % x.ndim for a in axis)
    red = tuple(i for i in range(x.ndim) if i not in keep)
    return jnp.max(x, axis=red, keepdims=keepdims)


def _blocked(x, block: BlockSpec):
    """Reshape ``x`` so each blocked axis is split into (n_blocks, block).

    Returns (xb, unblock_fn, block_axes) where ``block_axes`` are the axes of
    xb holding intra-block elements (to be reduced for per-block amax).
    Dims must divide evenly (models pad to multiples; see quantizer.py).
    Equivalent to the reference's block reshape
    (reference: nn/modules/tensor_quantizer.py:975-1085).
    """
    sizes = block.sizes_dict
    shape = x.shape
    # Zero-pad non-divisible dims up to a block multiple (the reference pads
    # too); zeros never dominate a block amax so scales are unaffected.
    pads = [(0, 0)] * x.ndim
    padded_shape = list(shape)
    need_pad = False
    bs_per_dim = [None] * x.ndim
    for i, d in enumerate(shape):
        bs = None
        for ax, s in sizes.items():
            if ax % x.ndim == i:
                bs = s
        if bs is None:
            continue
        if bs <= 0:
            bs = d  # size 0 = the whole dim (per-token / per-row scales)
        bs = min(bs, max(d, 1))
        bs_per_dim[i] = bs
        if d % bs != 0:
            pad = bs - d % bs
            pads[i] = (0, pad)
            padded_shape[i] = d + pad
            need_pad = True
    if need_pad:
        x = jnp.pad(x, pads)
    new_shape = []
    block_axes = []
    for i, d in enumerate(padded_shape):
        bs = bs_per_dim[i]
        if bs is None:
            new_shape.append(d)
        else:
            new_shape.extend([d // bs, bs])
            block_axes.append(len(new_shape) - 1)
    xb = x.reshape(new_shape)

    def unblock(y):
        y = y.reshape(padded_shape)
        if need_pad:
            y = y[tuple(slice(0, s) for s in shape)]
        return y

    return xb, unblock, tuple(block_axes)


# --------------------------------------------------------------------------
# Core fake-quant kernels (pure, differentiable-with-STE)
# --------------------------------------------------------------------------
def fake_quant_int(x, amax, num_bits=8, unsigned=False, narrow_range=False):
    """Integer fake quantization: symmetric affine with 2^(b-1)-1 levels.

    (reference: tensor_quant.py:319 FakeTensorQuantFunction)
    """
    bound = 2 ** (num_bits - (0 if unsigned else 1)) - 1
    min_bound = 0 if unsigned else (-bound if narrow_range else -bound - 1)
    amax = jnp.maximum(jnp.abs(amax), _TINY).astype(jnp.float32)
    scale = bound / amax
    xq = ste_round(jnp.clip(x.astype(jnp.float32) * scale, min_bound, bound))
    return (xq / scale).astype(x.dtype)


def fake_quant_fp(x, amax, fmt: FPFormat):
    """FP fake quantization: scale so amax maps to the format max, cast, rescale.

    (reference: tensor_quant.py:402 ScaledE4M3Function generalized to any (E,M))
    """
    amax = jnp.maximum(jnp.abs(amax), _TINY).astype(jnp.float32)
    scale = fmt.maxval / amax
    y = ste_cast(jnp.clip(x.astype(jnp.float32) * scale, -fmt.maxval, fmt.maxval), fmt)
    return (y / scale).astype(x.dtype)


def _fake_quant_flat(x, amax, spec: QuantizerSpec):
    if spec.is_fp:
        return fake_quant_fp(x, amax, spec.fp_format)
    return fake_quant_int(x, amax, spec.num_bits, spec.unsigned, spec.narrow_range)


def _block_scales_two_level(block_amax, elem_max, scale_fmt: FPFormat, tensor_amax):
    """NVFP4-style two-level scales: per-block scale quantized to ``scale_fmt``
    (e4m3) relative to an fp32 per-tensor scale.

    (reference: qtensor/nvfp4_tensor.py:88-205 get_weights_scaling_factor)
    """
    s2 = jnp.maximum(tensor_amax.astype(jnp.float32), _TINY) / (
        elem_max * scale_fmt.maxval
    )
    s1 = cast_to_fp(block_amax / elem_max / s2, scale_fmt)
    return jnp.maximum(s1 * s2, _TINY)


def _block_scales_e8m0(block_amax, elem_max: float):
    """MX shared power-of-two scale: 2^ceil(log2(amax / elem_max)), clamped
    to >= 2^-127 — the ceil guarantees the block max never clips
    (reference: qtensor/mxfp4_tensor.py:74-75 e8m0_scale; matches the real
    storage in quant/qtensor.py quantize_mxfp4/8)."""
    from .qtensor import _ceil_log2, _exp2_int

    descale = jnp.maximum(block_amax, _TINY) / elem_max
    e = jnp.maximum(_ceil_log2(descale), -127)
    return _exp2_int(e)


def fake_quant_block(x, spec: QuantizerSpec, amax=None, tensor_amax=None):
    """Block fake quantization (dynamic or static, one- or two-level scales).

    - dynamic one-level (e.g. MXFP8/MXFP4): per-block scale from this call's
      block amax, quantized to e8m0 if ``scale_format == 'e8m0'``.
    - dynamic two-level (NVFP4): per-block e4m3 scale over an fp32 per-tensor
      scale; ``tensor_amax`` comes from calibration when static, else from x.
    """
    block = spec.block
    assert block is not None
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xb, unblock, block_axes = _blocked(xf, block)
    block_amax = jnp.max(jnp.abs(xb), axis=block_axes, keepdims=True)
    if amax is not None and not block.dynamic:
        block_amax = amax  # calibrated static block scales

    scale_fmt = parse_format(block.scale_format) if block.scale_format else None
    elem_max = spec.maxval

    if block.four_over_six and scale_fmt is not None and block.two_level:
        # NVFP4 4/6: per block, pick scale-to-6 vs scale-to-4 by lower MSE;
        # the clipped-max grid often wins on outlier-light blocks. E4M3
        # scale normalization bound is 256 (reference: numeric_utils.py:41
        # E4M3_MAX_46, config.py four_over_six block key).
        fmt = spec.fp_format
        t_amax = tensor_amax if tensor_amax is not None else jnp.max(jnp.abs(xf))
        s2 = jnp.maximum(t_amax.astype(jnp.float32), _TINY) / (elem_max * 256.0)
        cands = []
        for m in (6.0, 4.0):
            s1 = cast_to_fp(block_amax / m / s2, scale_fmt)
            sc = jnp.maximum(s1 * s2, _TINY)
            y = ste_cast(jnp.clip(xb / sc, -fmt.maxval, fmt.maxval), fmt) * sc
            err = jnp.sum(jnp.square(y - xb), axis=block_axes, keepdims=True)
            cands.append((y, err))
        (y6, e6), (y4, e4) = cands
        y = jnp.where(e4 < e6, y4, y6)
        return unblock(y).astype(orig_dtype)

    if scale_fmt is not None and scale_fmt.man_bits == 0:
        scale = _block_scales_e8m0(block_amax, elem_max)
    elif scale_fmt is not None and block.two_level:
        t_amax = tensor_amax if tensor_amax is not None else jnp.max(jnp.abs(xf))
        scale = _block_scales_two_level(block_amax, elem_max, scale_fmt, t_amax)
    else:
        scale = jnp.maximum(block_amax, _TINY) / elem_max

    if spec.is_fp:
        fmt = spec.fp_format
        y = ste_cast(jnp.clip(xb / scale, -fmt.maxval, fmt.maxval), fmt) * scale
    else:
        bound = spec.int_bound
        y = ste_round(jnp.clip(xb / scale, -bound - 1, bound)) * scale
    return unblock(y).astype(orig_dtype)


def fake_quantize(x, spec: QuantizerSpec, amax=None, tensor_amax=None):
    """Main dispatch: fake-quantize ``x`` according to ``spec``.

    ``amax`` is the calibrated amax (broadcast-compatible with x per
    spec.axis), or None for dynamic per-call statistics. This is the
    functional equivalent of ``TensorQuantizer._fake_quantize``
    (reference: nn/modules/tensor_quantizer.py:890).
    """
    if not spec.enable:
        return x
    if spec.block is not None:
        return fake_quant_block(x, spec, amax=amax, tensor_amax=tensor_amax)
    if amax is None:
        amax = reduce_amax(x, spec.axis)
    return _fake_quant_flat(x, amax, spec)
