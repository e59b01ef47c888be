"""Quantization-aware linen layers.

The reference swaps nn.Module classes in place via a registry
(reference: modelopt/torch/quantization/nn/modules/quant_linear.py:38,
conversion.py:213 replace_quant_module). In JAX graph surgery is unnecessary:
models in this framework are built from these layers, whose quantizer
submodules are *identity until a QuantizeConfig is active* — an unquantized
model and its quantized version share one architecture and one params pytree.

Sharding: pass logical axis names via ``kernel_axes`` — they become flax
logical partitioning metadata consumed by ``parallel.mesh`` when sharding
over a device mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .quantizer import TensorQuantizer

Dtype = Any
default_kernel_init = nn.initializers.lecun_normal()


def _maybe_partition(init: Callable, axes: Optional[tuple]):
    return nn.with_logical_partitioning(init, axes) if axes else init


class QuantDense(nn.Module):
    """Linear layer with input/weight/output quantization points.

    Kernel layout is JAX-convention ``[in_features, out_features]``.
    (reference: nn/modules/quant_linear.py QuantLinear)
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros_init()
    kernel_axes: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        x_in = x
        compressed = self.has_variable("quant", "qweight")
        act_int8 = skip_fake = False
        if compressed:
            from ..nn.quantizer import active_quant_config
            from ..quant.backends import act_backend_quantizes

            cfg = active_quant_config()
            aspecs = (cfg.resolve("/".join(self.path) + "/input_quantizer")
                      if cfg else None)
            act_int8 = bool(
                aspecs and aspecs[0].enable and not aspecs[0].is_fp
                and aspecs[0].num_bits == 8
            )
            # per-token dynamic int8: the fused backend quantizes once on
            # device; the layer-level fake-quant would round twice and cost
            # an extra elementwise sweep per GEMM
            skip_fake = act_backend_quantizes(aspecs)
        x = TensorQuantizer(name="input_quantizer")(x, skip_fake=skip_fake)
        dtype = self.dtype or x.dtype
        if compressed:
            # compressed (real-quant) path: packed weight + fused dequant-GEMM
            # (reference: compressed-inference GEMMs, backends/gemm_registry.py)
            from ..nn.quantizer import active_quant_config
            from ..quant.backends import qgemm

            cfg = active_quant_config()
            specs = cfg.resolve("/".join(self.path) + "/weight_quantizer") if cfg else None
            if not specs:
                raise ValueError(
                    f"{'/'.join(self.path)}: qweight present but no active "
                    "weight-quantizer spec to interpret it"
                )
            qt = self.get_variable("quant", "qweight")
            x2d = x.reshape(-1, in_features)
            # int8 activations ride the int8 MXU: W8A8 on compute-bound
            # (prefill-sized) calls, the fused W4A8 kernel at decode —
            # size dispatch happens in backends.qgemm
            y2d = qgemm(x2d, qt, specs[0], (in_features, self.features),
                        out_dtype=dtype, act_int8=act_int8,
                        act_raw=skip_fake)
            y = y2d.reshape(*x.shape[:-1], self.features)
        else:
            kernel = self.param(
                "kernel",
                _maybe_partition(self.kernel_init, self.kernel_axes),
                (in_features, self.features),
                self.param_dtype,
            )
            # structured sparsity mask (2:4 etc.), applied before
            # quantization — reference order: SparseModule then quantizer
            # (reference: sparsity/weight_sparsity/module.py:32)
            if self.has_variable("sparse", "mask"):
                kernel = kernel * self.get_variable("sparse", "mask").astype(kernel.dtype)
            kernel = TensorQuantizer(name="weight_quantizer")(kernel)
            y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        # SVDQuant low-rank branch: kernel holds the quantized residual R and
        # the 16-bit path x @ L1 @ L2 restores the outlier component; any
        # smoothing scale is pre-folded into L1 so the branch reads the raw
        # input (reference: svdquant, model_calib.py:1980 + SVDQuantLinear).
        if self.has_variable("quant", "svd_lora_a"):
            la = self.get_variable("quant", "svd_lora_a").astype(dtype)
            lb = self.get_variable("quant", "svd_lora_b").astype(dtype)
            y = y + (x_in.astype(dtype) @ la) @ lb
        # PEFT LoRA adapter (composes with quantized / compressed base =
        # QLoRA; reference: modelopt/torch/peft/lora/layer.py)
        if self.has_variable("lora", "lora_a"):
            a = self.get_variable("lora", "lora_a").astype(dtype)
            b = self.get_variable("lora", "lora_b").astype(dtype)
            scale = self.get_variable("lora", "lora_scale")
            y = y + ((x_in.astype(dtype) @ a) @ b) * scale.astype(dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                _maybe_partition(self.bias_init, (self.kernel_axes[-1],) if self.kernel_axes else None),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(dtype)
        return TensorQuantizer(name="output_quantizer")(y)


class QuantEinsum(nn.Module):
    """Einsum layer with quantization points — covers fused QKV, attention
    output projections and MoE expert weights (a kernel with a leading expert
    dim gets per-expert scales simply by keeping that dim in ``axis``/blocks,
    the functional equivalent of the reference's GroupedQuantizer,
    reference: tensor_quantizer.py:1865)."""

    einsum_str: str
    kernel_shape: Sequence[int]
    use_bias: bool = False
    bias_shape: Optional[Sequence[int]] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init
    kernel_axes: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, gates=None):
        """``gates`` [B, T, E] (only for the per-expert contraction
        ``bteo,eod->bted``) fuses the routed combine into this layer: the
        return value is the gate-weighted sum [B, T, D] and, on the
        int8-MXU compressed path, the whole thing is ONE kernel
        (backends.moe_down_qgemm) — the [B, T, E, D] per-expert output
        never materializes. The output_quantizer then applies to the
        combined tensor."""
        compressed = self.has_variable("quant", "qweight")
        act_int8 = skip_fake = False
        if compressed and self.einsum_str in ("btd,edf->btef",
                                              "bteo,eod->bted"):
            from ..nn.quantizer import active_quant_config
            from ..quant.backends import act_backend_quantizes

            cfg = active_quant_config()
            aspecs = (cfg.resolve("/".join(self.path) + "/input_quantizer")
                      if cfg else None)
            act_int8 = bool(
                aspecs and aspecs[0].enable and not aspecs[0].is_fp
                and aspecs[0].num_bits == 8
            )
            skip_fake = act_backend_quantizes(aspecs)
        x = TensorQuantizer(name="input_quantizer")(x, skip_fake=skip_fake)
        dtype = self.dtype or x.dtype
        if compressed:
            # compressed MoE experts: the packed tensor holds the FOLDED
            # [in, E*out] view (see quant/compress.py) — per-expert scales
            # fall out of the distinct columns. Known expert einsums
            # re-associate so no weight transpose ever materializes.
            from ..nn.quantizer import active_quant_config
            from ..quant.backends import qgemm
            from ..quant.qtensor import dequantize_qtensor

            cfg = active_quant_config()
            specs = (cfg.resolve("/".join(self.path) + "/weight_quantizer")
                     if cfg else None)
            if not specs:
                raise ValueError(
                    f"{'/'.join(self.path)}: qweight present but no active "
                    "weight-quantizer spec to interpret it"
                )
            E, fin, fout = self.kernel_shape
            qt = self.get_variable("quant", "qweight")
            if self.einsum_str == "btd,edf->btef":
                # gate/up experts: the folded view IS a plain [fin, E*fout]
                # GEMM — ride the fused dequant-GEMM backends like QuantDense
                x2d = x.astype(dtype).reshape(-1, fin)
                y2d = qgemm(x2d, qt, specs[0], (fin, E * fout),
                            out_dtype=dtype, act_int8=act_int8,
                            act_raw=skip_fake)
                y = y2d.reshape(*x.shape[:-1], E, fout)
            elif self.einsum_str == "bteo,eod->bted" and gates is not None:
                # fused down-projection + routed combine (one kernel on the
                # int8-MXU path; grouped kernel + einsum otherwise)
                from ..quant.backends import moe_down_qgemm

                B_, T_ = x.shape[:2]
                x3 = x.astype(dtype).reshape(B_ * T_, E, fin)
                g2 = gates.reshape(B_ * T_, E)
                y2 = moe_down_qgemm(x3, qt, specs[0], (E, fin, fout), g2,
                                    out_dtype=dtype, act_int8=act_int8,
                                    act_raw=skip_fake)
                y = y2.reshape(B_, T_, fout)
            elif self.einsum_str == "bteo,eod->bted":
                # per-expert contraction (block-diagonal in the folded
                # view): the grouped kernel runs all expert GEMMs in one
                # pallas_call at decode shapes; dequantize+einsum otherwise
                from ..quant.backends import grouped_qgemm

                B_, T_ = x.shape[:2]
                x3 = x.astype(dtype).reshape(B_ * T_, E, fin)
                y3 = grouped_qgemm(x3, qt, specs[0], (E, fin, fout),
                                   out_dtype=dtype, act_int8=act_int8,
                                   act_raw=skip_fake)
                y = y3.reshape(B_, T_, E, fout)
            else:
                w2d = dequantize_qtensor(qt, specs[0], (fin, E * fout))
                kernel = w2d.astype(dtype).reshape(fin, E, fout).transpose(1, 0, 2)
                y = jnp.einsum(self.einsum_str, x.astype(dtype), kernel)
        else:
            kernel = self.param(
                "kernel",
                _maybe_partition(self.kernel_init, self.kernel_axes),
                tuple(self.kernel_shape),
                self.param_dtype,
            )
            kernel = TensorQuantizer(name="weight_quantizer")(kernel)
            y = jnp.einsum(self.einsum_str, x.astype(dtype),
                           kernel.astype(dtype))
        down_fused = gates is not None and self.einsum_str == "bteo,eod->bted"
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), tuple(self.bias_shape), self.param_dtype
            )
            if down_fused and y.ndim == 3:
                # combined output: the per-expert bias enters gate-weighted
                # (sum_e g_e * (y_e + b_e) = fused_y + gates @ bias)
                y = y + jnp.einsum("bte,ef->btf", gates.astype(dtype),
                                   bias.astype(dtype))
            else:
                y = y + bias.astype(dtype)
        if down_fused and y.ndim == 4:
            # fake-quant / fallback path: combine here so callers see the
            # same [B, T, D] contract as the fused kernel
            y = jnp.einsum("bted,bte->btd", y, gates.astype(dtype))
        return TensorQuantizer(name="output_quantizer")(y)


class QuantEmbed(nn.Module):
    """Embedding with optional weight quantization
    (reference: nn/modules/quant_embedding.py). ``attend`` reuses the
    embedding as a tied LM head with its own quantization point."""

    num_embeddings: int
    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    embedding_init: Callable = nn.initializers.normal(stddev=0.02)
    embedding_axes: Optional[tuple] = None

    def setup(self):
        self.embedding = self.param(
            "embedding",
            _maybe_partition(self.embedding_init, self.embedding_axes),
            (self.num_embeddings, self.features),
            self.param_dtype,
        )
        self.weight_quantizer = TensorQuantizer()
        self.lm_head_quantizer = TensorQuantizer()

    def __call__(self, ids):
        emb = self.weight_quantizer(self.embedding)
        out = jnp.take(emb, ids, axis=0)
        return out.astype(self.dtype) if self.dtype else out

    def attend(self, query):
        emb = self.lm_head_quantizer(self.embedding)
        return jnp.dot(query, emb.T.astype(query.dtype))


class QuantConv(nn.Module):
    """N-D convolution with quantization points (feature-last layout),
    covering the reference's QuantConv1d/2d/3d
    (reference: nn/modules/quant_conv.py)."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x):
        ndim = len(self.kernel_size)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, in_features, self.features),
            self.param_dtype,
        )
        x = TensorQuantizer(name="input_quantizer")(x)
        kernel = TensorQuantizer(name="weight_quantizer")(kernel)
        dtype = self.dtype or x.dtype
        if ndim == 2:
            y = lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=tuple(self.strides or (1,) * ndim),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        elif ndim == 1:
            y = lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=tuple(self.strides or (1,)),
                padding=self.padding,
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        else:
            y = lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype),
                window_strides=tuple(self.strides or (1,) * ndim),
                padding=self.padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)
        return TensorQuantizer(name="output_quantizer")(y)


class LayerNorm1p(nn.Module):
    """LayerNorm with zero-init weight applied as (1 + w) plus bias
    (Nemotron / Megatron layernorm1p convention)."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.zeros_init(), (d,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (d,),
                          self.param_dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * (1.0 + scale.astype(jnp.float32)) + bias.astype(jnp.float32)
        return y.astype(self.dtype or x.dtype)


class RMSNorm(nn.Module):
    """RMSNorm (no quantization points; norms stay high-precision on TPU).

    ``scale_offset=1.0`` gives the Gemma convention: zero-initialized
    weight, output = norm(x) * (offset + w), multiplied in f32 before the
    downcast."""

    epsilon: float = 1e-6
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    scale_axes: Optional[tuple] = None
    scale_offset: float = 0.0

    @nn.compact
    def __call__(self, x):
        init = (nn.initializers.zeros_init() if self.scale_offset
                else nn.initializers.ones_init())
        scale = self.param(
            "scale",
            _maybe_partition(init, self.scale_axes),
            (x.shape[-1],),
            self.param_dtype,
        )
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.epsilon)
        return (y * (self.scale_offset + scale.astype(jnp.float32))).astype(
            self.dtype or x.dtype
        )


class QuantLSTM(nn.Module):
    """Unidirectional LSTM with quantization points, scanned with lax.scan
    (reference: nn/modules/quant_rnn.py QuantLSTM — a VF rewrite of cuDNN
    LSTM with per-layer quantizers).

    The input projection is a full QuantDense over the whole sequence (one
    big GEMM: input + weight quantizers, every calibration algorithm,
    compress()). The recurrent kernel is quantized ONCE outside the scan —
    weight quantizers are input-independent, and quantizer state cannot
    mutate inside a scan body — then the scan consumes the materialized
    (fake-quant or dequantized-packed) value. The recurrent input h is
    tanh-bounded, so it carries no data-dependent quantizer.

    __call__(x [B, T, F]) -> (outputs [B, T, H], (h [B, H], c [B, H])).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, init_state=None):
        H = self.features
        B = x.shape[0]
        dtype = self.dtype or x.dtype
        # fused input projection, all four gates at once (i f g o)
        ih = QuantDense(4 * H, use_bias=self.use_bias, dtype=dtype,
                        param_dtype=self.param_dtype, name="ih_proj")
        gates_x = ih(x)  # [B, T, 4H] — batched over time in ONE GEMM
        # recurrent kernel, quantized/unpacked outside the scan
        if self.has_variable("quant", "qweight"):
            from ..nn.quantizer import active_quant_config
            from ..quant.qtensor import dequantize_qtensor

            cfg = active_quant_config()
            specs = (cfg.resolve("/".join(self.path) + "/weight_quantizer")
                     if cfg else None)
            if not specs:
                raise ValueError(
                    f"{'/'.join(self.path)}: qweight present but no active "
                    "weight-quantizer spec to interpret it"
                )
            qt = self.get_variable("quant", "qweight")
            w_hh = dequantize_qtensor(qt, specs[0], (H, 4 * H)).astype(dtype)
        else:
            kernel = self.param("kernel", default_kernel_init, (H, 4 * H),
                                self.param_dtype)
            w_hh = TensorQuantizer(name="weight_quantizer")(kernel)
            w_hh = w_hh.astype(dtype)
        if init_state is None:
            h0 = jnp.zeros((B, H), dtype)
            c0 = jnp.zeros((B, H), dtype)
        else:
            h0, c0 = init_state

        def step(carry, gx):
            h, c = carry
            g = gx + jnp.dot(h, w_hh)
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(gg)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(step, (h0, c0),
                                  gates_x.transpose(1, 0, 2))
        return ys.transpose(1, 0, 2), (h, c)


class QuantPool(nn.Module):
    """Max/avg N-D pooling with input/output quantization points
    (reference: nn/modules/quant_pooling.py QuantMaxPool/QuantAvgPool/
    QuantAdaptiveAvgPool — pooling has no weights; the registry entries
    exist so activation quantizers can sit on pooling layers). Feature-last
    layout; ``window`` lengths set the dimensionality; ``window=None``
    pools globally (adaptive output size 1)."""

    window: Optional[Sequence[int]] = None
    strides: Optional[Sequence[int]] = None
    kind: str = "avg"  # "avg" | "max"
    padding: str = "VALID"

    @nn.compact
    def __call__(self, x):
        x = TensorQuantizer(name="input_quantizer")(x)
        if self.window is None:  # adaptive/global
            axes = tuple(range(1, x.ndim - 1))
            y = (jnp.max(x, axes, keepdims=True) if self.kind == "max"
                 else jnp.mean(x, axes, keepdims=True))
        else:
            ndim = len(self.window)
            win = (1, *self.window, 1)
            strides = (1, *(self.strides or self.window), 1)
            assert x.ndim == ndim + 2, (x.shape, self.window)
            if self.kind == "max":
                y = lax.reduce_window(x, -jnp.inf, lax.max, win, strides,
                                      self.padding)
            else:
                y = lax.reduce_window(x, 0.0, lax.add, win, strides,
                                      self.padding)
                n = 1
                for w in self.window:
                    n *= int(w)
                y = y / n
        return TensorQuantizer(name="output_quantizer")(y)
