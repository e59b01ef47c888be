"""Hardware (TPU) test tier — the analogue of the reference's tests/gpu/
CUDA-kernel parity suite (reference: tests/gpu/torch/quantization/
test_tensor_quant_cuda.py). Run with:

    MODELOPT_TPU_TESTS=1 python -m pytest tests/tpu -q

Skipped automatically on CPU-only environments. Keep each test to ONE or
two jitted programs — remote compiles cost ~1 min each on the axon tunnel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a TPU backend"
)


def test_fake_quant_formats_on_hw(rng):
    from modelopt_tpu.quant.fake_quant import fake_quantize
    from modelopt_tpu.quant.qspec import BlockSpec, QuantizerSpec

    x = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)
    spec = QuantizerSpec(
        num_bits=(2, 1),
        block=BlockSpec(sizes=((-1, 16),), dynamic=True, scale_format="e4m3",
                        two_level=True),
    )
    y = jax.jit(lambda x: fake_quantize(x, spec))(x)
    err = float(jnp.sqrt(jnp.mean((y - x) ** 2)))
    sqnr = 10 * np.log10(float(jnp.mean(x**2)) / max(err**2, 1e-30))
    assert 15 < sqnr < 30  # NVFP4 lands ~20 dB on gaussian data


def test_w4a16_kernel_parity_on_hw(rng):
    from modelopt_tpu.kernels import quant_gemm as kq
    from modelopt_tpu.quant import qtensor as qt

    K, N, M = 1024, 512, 16
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    p = qt.quantize_int4(w, block=128)
    y = kq.w4a16_gemm(x, p["data"], p["scale"], block=128, out_dtype=jnp.float32)
    ref = x @ qt.dequantize_int4(p, 128).astype(jnp.bfloat16)
    rel = float(jnp.linalg.norm(y - ref.astype(jnp.float32)) / jnp.linalg.norm(ref.astype(jnp.float32)))
    assert rel < 5e-3


def test_decode_attention_fp8_on_hw(rng):
    from modelopt_tpu.kernels.attention import decode_attention

    B, S, KH, G, D = 4, 128, 2, 4, 128
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KH, D)) / 50).astype(jnp.float8_e4m3fn)
    v = jnp.asarray(rng.standard_normal((B, S, KH, D)) / 50).astype(jnp.float8_e4m3fn)
    lengths = jnp.asarray([3, 50, 100, 128], jnp.int32)
    out = decode_attention(q, k.reshape(B, S, KH * D), v.reshape(B, S, KH * D),
                           lengths, k_scale=50.0, v_scale=50.0,
                           out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    # masked slots: batch 0 attends only 3 keys — all outputs bounded by
    # the max |v| over those keys * 50
    vmax = float(jnp.max(jnp.abs(v[0, :3].astype(jnp.float32) * 50.0)))
    assert float(jnp.max(jnp.abs(out[0]))) <= vmax + 1e-3


def test_fused_decode_sinks_softcap_on_hw(rng):
    """Mosaic compile + sanity of the fused write+attend kernel with
    learned sinks and softcap on the lane-merged layout."""
    from modelopt_tpu.kernels.attention import fused_decode_attention

    B, S, KH, G, D = 4, 128, 2, 4, 128
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, KH * D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, KH * D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, 1, KH * D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, 1, KH * D)), jnp.bfloat16)
    pos = jnp.asarray([3, 50, 100, 126], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal((KH, G)), jnp.float32)
    out, ck, cv = fused_decode_attention(q, kn, vn, k, v, pos,
                                         sinks=sinks, softcap=30.0,
                                         out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    # the write landed: cache row pos[b] equals the new token's row
    got = np.asarray(ck)[np.arange(B), np.asarray(pos)]
    np.testing.assert_allclose(got, np.asarray(kn)[:, 0], rtol=1e-2,
                               atol=1e-2)


def test_fused_decode_int8_mxu_on_hw(rng):
    """Mosaic compile + parity of the int8-MXU decode path (raw int8 codes
    in the score and P.V dots) against the dequantized XLA reference."""
    from modelopt_tpu.kernels.attention import fused_decode_attention

    B, S, KH, G, D = 4, 128, 2, 4, 128
    ks = 4.0 / 127
    q = jnp.asarray(rng.standard_normal((B, KH, G, D)), jnp.bfloat16)
    k8 = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, S, KH * D)) / ks), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, S, KH * D)) / ks), -127, 127), jnp.int8)
    kn = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, 1, KH * D)) / ks), -127, 127), jnp.int8)
    vn = jnp.asarray(np.clip(np.round(
        rng.standard_normal((B, 1, KH * D)) / ks), -127, 127), jnp.int8)
    pos = jnp.asarray([3, 50, 100, 126], jnp.int32)
    out, ck, cv = fused_decode_attention(q, kn, vn, k8, v8, pos,
                                         k_scale=ks, v_scale=ks,
                                         out_dtype=jnp.float32)
    # dequantized reference with the new token spliced in
    kd = np.asarray(ck, np.float32).reshape(B, S, KH, D) * ks
    vd = np.asarray(cv, np.float32).reshape(B, S, KH, D) * ks
    qf = np.asarray(q, np.float32)
    for b in range(B):
        L = int(pos[b]) + 1
        for h in range(KH):
            s = qf[b, h] @ kd[b, :L, h].T / np.sqrt(D)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref = p @ vd[b, :L, h]
            np.testing.assert_allclose(np.asarray(out[b, h]), ref,
                                       rtol=5e-2, atol=5e-2)
    # the write landed
    got = np.asarray(ck)[np.arange(B), np.asarray(pos)]
    np.testing.assert_array_equal(got, np.asarray(kn)[:, 0])


def test_mla_latent_decode_on_hw(rng):
    """MLA single-shared-KV-head reformulation on hardware (fp8 latent)."""
    from modelopt_tpu.kernels.attention import decode_attention

    B, S, H, Dc = 4, 128, 8, 640  # padded latent row width (512+64 -> 640)
    q_eff = jnp.asarray(rng.standard_normal((B, 1, H, Dc)), jnp.bfloat16)
    rows = jnp.asarray(rng.standard_normal((B, S, Dc)) / 50).astype(
        jnp.float8_e4m3fn)
    lengths = jnp.asarray([3, 50, 100, 128], jnp.int32)
    out = decode_attention(q_eff, rows, rows, lengths, k_scale=50.0,
                           v_scale=50.0, out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_on_hw(rng):
    from modelopt_tpu.kernels.flash_attention import _xla_reference, flash_attention

    B, T, KH, G, D = 1, 512, 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, KH, G, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, KH, D)), jnp.bfloat16)
    out = flash_attention(q, k, v, True, None, 0, 256)
    ref = _xla_reference(q, k, v, True, None, 0)
    rel = float(
        jnp.linalg.norm((out - ref).astype(jnp.float32))
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    assert rel < 2e-2, rel


def test_grouped_w4a16_on_hw(rng):
    """Mosaic compile + parity of the grouped per-expert kernel on the
    folded [K, E*N] layout."""
    from modelopt_tpu.kernels import quant_gemm as kq
    from modelopt_tpu.quant import qtensor as qt

    E, K, N, M = 4, 512, 256, 16
    w = jnp.asarray(rng.standard_normal((K, E * N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.grouped_w4a16_gemm(x, packed["data"], packed["scale"], N,
                              block=128, out_dtype=jnp.float32)
    wd = qt.dequantize_int4(packed, 128).astype(jnp.bfloat16)
    ref = jnp.einsum("emk,ken->emn", x, wd.reshape(K, E, N))
    rel = float(jnp.linalg.norm(y - ref.astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    assert rel < 5e-3, rel


def test_w4a16_straddle_on_hw(rng):
    """Mosaic lowering of the straddle-block path (K2 % block != 0, the
    K=1408 DeepSeek shape at the default block 128)."""
    from modelopt_tpu.kernels import quant_gemm as kq
    from modelopt_tpu.quant import qtensor as qt

    K, N, M = 1408, 256, 16
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = qt.quantize_int4(w, block=128)
    y = kq.w4a16_gemm(x, packed["data"], packed["scale"], block=128,
                      out_dtype=jnp.float32)
    ref = x @ qt.dequantize_int4(packed, 128).astype(jnp.bfloat16)
    rel = float(jnp.linalg.norm(y - ref.astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32)))
    assert rel < 5e-3, rel


def test_w4a8_prefill_mtiled_on_hw(rng):
    """Large-M (prefill) grid of the int4 kernels: 2-D (M, N) parallel
    grid with whole-K tiles must lower on real Mosaic and match the exact
    integer reference (round-5 serving prefill path)."""
    from modelopt_tpu.kernels import quant_gemm as kq
    from modelopt_tpu.quant import qtensor as qt

    K, N, M = 1024, 512, 600  # two m-tiles after padding
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    p = qt.quantize_int4(w, block=128)
    y = kq.w4a8_gemm(xq, p["data"], p["scale"], block=128,
                     out_dtype=jnp.float32)

    def ref(xq, p):
        q = qt.unpack_int4(p["data"])
        out = jnp.zeros((M, N), jnp.float32)
        for b in range(K // 128):
            d = jax.lax.dot_general(
                xq[:, b * 128:(b + 1) * 128].astype(jnp.int32),
                q[b * 128:(b + 1) * 128],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            out = out + d.astype(jnp.float32) * p["scale"][b][None, :]
        return out

    r = jax.jit(ref)(xq, p)
    rel = float(jnp.max(jnp.abs(y - r)) / (jnp.max(jnp.abs(r)) + 1e-9))
    assert rel < 1e-5, rel


def test_flash_prefill_cached_on_hw(rng):
    """Cached-prefill flash attention (chunk queries vs the whole int8 KV
    slab, per-slot start offsets) vs the einsum reference."""
    from modelopt_tpu.kernels.flash_attention import flash_prefill_attention

    B, T, KH, G, D, S = 2, 256, 4, 2, 128, 512
    q = jnp.asarray(rng.standard_normal((B, T, KH, G, D)), jnp.bfloat16)
    ck = jnp.asarray(rng.integers(-127, 128, (B, S, KH * D)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (B, S, KH * D)), jnp.int8)
    ks, vs = jnp.float32(0.012), jnp.float32(0.008)
    start = jnp.asarray([0, 256], jnp.int32)
    out = jax.jit(lambda q: flash_prefill_attention(
        q, ck, cv, start, k_scale=ks, v_scale=vs,
        out_dtype=jnp.float32))(q)

    def ref(q):
        k4 = ((ck.astype(jnp.float32) * ks).astype(jnp.bfloat16)
              .reshape(B, S, KH, D).astype(jnp.float32))
        v4 = ((cv.astype(jnp.float32) * vs).astype(jnp.bfloat16)
              .reshape(B, S, KH, D).astype(jnp.float32))
        sc = jnp.einsum("btkgd,bskd->bkgts", q.astype(jnp.float32), k4) \
            / jnp.sqrt(D)
        qpos = start[:, None, None, None, None] \
            + jnp.arange(T)[None, None, None, :, None]
        kpos = jnp.arange(S)[None, None, None, None, :]
        sc = jnp.where(kpos <= qpos, sc, -1e9)
        pr = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bkgts,bskd->btkgd", pr, v4)

    r = jax.jit(ref)(q)
    err = float(jnp.max(jnp.abs(out - r)))
    assert err < 0.02, err  # bf16 dot tolerance


def test_dense_kv_write_narrow_slab_on_hw(rng):
    """Narrow cache slabs (KHD//128 below the packed sublane tile) must
    take the XLA fallback, not fail Mosaic lowering (round-5 regression:
    the 128-wide fp8 MLA latent slab)."""
    from modelopt_tpu.kernels.attention import dense_kv_write

    for W, dtype in ((128, jnp.float8_e4m3fn), (256, jnp.int8),
                     (128, jnp.bfloat16)):
        cache = jax.jit(lambda: jnp.zeros((2, 16, W), dtype))()
        vals = jax.jit(lambda: jnp.ones((2, 4, W), jnp.float32).astype(dtype))()
        out = dense_kv_write(cache, vals, jnp.asarray([0, 8], jnp.int32))
        assert float(jnp.sum(out.astype(jnp.float32))) == 2 * 4 * W
