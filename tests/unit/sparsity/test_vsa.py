"""VSA (video sparse attention) — exactness, monotonicity, DiT + mode
integration (reference: sparsity/attention_sparsity/methods/vsa.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.sparsity.vsa import (
    VSAConfig, tile_metadata, video_sparse_attention, vsa_stats,
)


def _dense_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _qkv(key, B=2, S=None, H=2, D=16, shape=(4, 4, 4)):
    S = S or int(np.prod(shape))
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (B, S, H, D), jnp.float32) for k in ks]


def test_tile_metadata_roundtrip_ragged():
    # ragged grid: 5x6x7 tokens, 4x4x4 tiles -> padded slots + reverse map
    idx, rev, sizes, valid = tile_metadata((5, 6, 7), (4, 4, 4))
    S = 5 * 6 * 7
    x = np.arange(S)
    tiled = x[np.asarray(idx)]
    flat_valid = np.asarray(valid).reshape(-1)
    assert sorted(tiled[flat_valid].tolist()) == list(range(S))
    assert (tiled[np.asarray(rev)] == x).all()
    assert int(sizes.sum()) == S
    assert sizes.min() >= 1


def test_topk_full_gate_zero_is_dense():
    q, k, v = _qkv(jax.random.PRNGKey(0), shape=(2, 4, 4))
    cfg = VSAConfig(block_size_3d=(1, 2, 2), top_k_ratio=1.0, gate_init=0.0)
    out = video_sparse_attention(q, k, v, video_shape=(2, 4, 4), config=cfg,
                                 gate_compress=jnp.zeros_like(q))
    ref = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_topk_full_gate_zero_is_dense_ragged():
    q, k, v = _qkv(jax.random.PRNGKey(3), S=3 * 5 * 5, shape=None)
    cfg = VSAConfig(block_size_3d=(2, 4, 4), top_k_ratio=1.0, gate_init=0.0)
    out = video_sparse_attention(q, k, v, video_shape=(3, 5, 5), config=cfg,
                                 gate_compress=jnp.zeros_like(q))
    ref = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_error_decreases_with_topk():
    q, k, v = _qkv(jax.random.PRNGKey(1), shape=(4, 4, 4))
    ref = np.asarray(_dense_attention(q, k, v))
    errs = []
    for r in (0.25, 0.5, 1.0):
        cfg = VSAConfig(block_size_3d=(2, 2, 2), top_k_ratio=r, gate_init=0.0)
        out = video_sparse_attention(q, k, v, video_shape=(4, 4, 4),
                                     config=cfg,
                                     gate_compress=jnp.zeros_like(q))
        errs.append(float(np.abs(np.asarray(out) - ref).mean()))
    assert errs[2] < 1e-5
    assert errs[1] < errs[0]


def test_compression_branch_gate():
    # top_k 1.0 + gate 1.0: output = sparse(dense) + compression branch;
    # the compression term must move the output by a bounded, nonzero amount
    q, k, v = _qkv(jax.random.PRNGKey(2), shape=(1, 4, 4))
    cfg = VSAConfig(block_size_3d=(1, 2, 2), top_k_ratio=1.0, gate_init=0.5)
    out_g = video_sparse_attention(q, k, v, video_shape=(1, 4, 4), config=cfg)
    out_0 = video_sparse_attention(q, k, v, video_shape=(1, 4, 4), config=cfg,
                                   gate_compress=jnp.zeros_like(q))
    diff = np.abs(np.asarray(out_g) - np.asarray(out_0))
    assert diff.mean() > 1e-4
    assert np.isfinite(np.asarray(out_g)).all()


def test_jit_and_stats():
    q, k, v = _qkv(jax.random.PRNGKey(4), shape=(4, 4, 4))
    cfg = VSAConfig(block_size_3d=(4, 4, 4), top_k_ratio=0.5)
    fn = jax.jit(lambda a, b, c: video_sparse_attention(
        a, b, c, video_shape=(4, 4, 4), config=cfg))
    out = fn(q, k, v)
    assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()
    st = vsa_stats((4, 4, 4), cfg)
    assert st["total_blocks"] == 1 and st["top_k"] == 1


def test_dit_vsa_mode():
    from modelopt_tpu.core.bundle import (
        ModelBundle, modelopt_state, restore_from_modelopt_state,
    )
    from modelopt_tpu.models.dit import DiT, dit_config_s
    from modelopt_tpu.sparsity import sparsify_attention_vsa

    cfg = dit_config_s(dtype=jnp.float32)
    module = DiT(cfg)
    B = 2
    x = jax.random.normal(
        jax.random.PRNGKey(9),
        (B, cfg.image_size, cfg.image_size, cfg.in_channels), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), x, t, y)
    bundle = ModelBundle(module=module, variables=dict(variables),
                         example_inputs=(x, t, y))
    dense = bundle.make_fn()(bundle.variables, x, t, y)

    vb = sparsify_attention_vsa(bundle, block_size_3d=(1, 2, 2),
                                top_k_ratio=1.0, gate_init=0.0)
    # gate 0 + full top-k: VSA output equals the dense DiT exactly
    out = vb.make_fn()(vb.variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
    # gate param exists + restore/replay round-trips the record
    assert "gate_compress" in vb.variables["params"]["blocks_0"]
    state = modelopt_state(vb)
    fresh = ModelBundle(module=DiT(dit_config_s(dtype=jnp.float32)),
                        variables=dict(variables), example_inputs=(x, t, y))
    rb = restore_from_modelopt_state(fresh, state)
    rb = rb.replace(variables=vb.variables)
    out2 = rb.make_fn()(rb.variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


def test_sparse_topk_quality_on_structured_data():
    # clustered q/k (each tile shares a centroid direction): attention mass
    # concentrates on few tiles, the coarse means represent them well, and
    # top-50% VSA tracks dense attention closely even with gate 0
    B, H, D = 1, 2, 16
    shape = (2, 4, 4)
    bs = (2, 2, 2)
    _, _, sizes, _ = tile_metadata(shape, bs)
    nt = int(sizes.shape[0])
    E = int(np.prod(bs))
    cent = 3.0 * jax.random.normal(jax.random.PRNGKey(5), (nt, H, D))
    _, rev, _, _ = tile_metadata(shape, bs)
    tile_of_token = np.asarray(rev) // E  # token id -> its tile
    toks = jnp.asarray(np.asarray(cent)[tile_of_token])[None]
    noise = lambda s: 0.3 * jax.random.normal(jax.random.PRNGKey(s),
                                              (B, nt * E, H, D))
    q = toks + noise(6)
    k = toks + noise(7)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, nt * E, H, D))
    ref = np.asarray(_dense_attention(q, k, v))
    cfg = VSAConfig(block_size_3d=bs, top_k_ratio=0.5, gate_init=0.0)
    out = video_sparse_attention(q, k, v, video_shape=shape, config=cfg,
                                 gate_compress=jnp.zeros_like(q))
    rel = np.abs(np.asarray(out) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.1
