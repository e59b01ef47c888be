"""Calibrated data-dependent attention sparsity (skip-softmax).

Reference analogues: sparsity/attention_sparsity/methods/
flash_skip_softmax.py (skipping), calibration/calibrate.py (thresholds),
calibration/ruler_dataset.py (long-context calibration data)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.kernels.block_sparse_attention import (
    block_sparse_decode_attention_xla,
)
from modelopt_tpu.models import Decoder, make_cache, tiny_test_config
from modelopt_tpu.sparsity import (
    SkipSoftmaxConfig,
    calibrate_skip_softmax,
    ruler_needle_batches,
    sparsify_attention_dynamic,
)
from modelopt_tpu.sparsity.skip_softmax import (
    block_upper_bounds,
    init_block_summaries,
    select_blocks,
    update_block_summaries,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestSelection:
    def test_upper_bound_is_sound(self):
        """ub must dominate every true score in its block."""
        r = _rng()
        B, S, KH, G, D, bs = 2, 256, 2, 2, 32, 64
        k = jnp.asarray(r.standard_normal((B, S, KH, D)), jnp.float32)
        q = jnp.asarray(r.standard_normal((B, KH, G, D)), jnp.float32)
        kb = k.reshape(B, S // bs, bs, KH, D)
        kmax, kmin = kb.max(axis=2), kb.min(axis=2)
        ub = np.asarray(block_upper_bounds(q, kmax, kmin))  # [B, nb]
        # true scores per head pair
        scores = np.einsum("bhgd,bshd->bhgs", np.asarray(q), np.asarray(k)) / np.sqrt(D)
        blk_true = scores.reshape(B, KH, G, S // bs, bs).max(axis=-1)
        assert (ub[:, None, None, :] >= blk_true.max(axis=(1, 2))[:, None, None, :] - 1e-4).all()

    def test_incremental_summaries_match_batch(self):
        r = _rng()
        B, S, KH, D, bs = 2, 128, 2, 16, 32
        k = jnp.asarray(r.standard_normal((B, S, KH, D)), jnp.float32)
        kmax, kmin = init_block_summaries(B, S, KH, D, bs)
        # write in three chunks like chunked prefill + decode
        start = jnp.zeros((B,), jnp.int32)
        for lo, hi in ((0, 96), (96, 127), (127, 128)):
            kmax, kmin = update_block_summaries(
                kmax, kmin, k[:, lo:hi], jnp.full((B,), lo, jnp.int32), bs
            )
        ref = k.reshape(B, S // bs, bs, KH, D)
        np.testing.assert_allclose(np.asarray(kmax), np.asarray(ref.max(axis=2)))
        np.testing.assert_allclose(np.asarray(kmin), np.asarray(ref.min(axis=2)))

    def test_select_keeps_sink_recent_and_hot(self):
        r = _rng()
        B, S, KH, G, D, bs = 1, 512, 2, 2, 16, 64
        nb = S // bs
        k = jnp.asarray(r.standard_normal((B, S, KH, D)) * 0.05, jnp.float32)
        q = jnp.asarray(r.standard_normal((B, KH, G, D)), jnp.float32)
        # plant a hot block at index 3 aligned with q
        hot = jnp.broadcast_to(q[:, :, 0, :][:, None], (B, bs, KH, D)) * 5.0
        k = k.at[:, 3 * bs:4 * bs].set(hot)
        kb = k.reshape(B, nb, bs, KH, D)
        cfg = SkipSoftmaxConfig(block_size=bs, tau=4.0, budget=0.4,
                                sink_blocks=1, recent_blocks=2)
        sel, nvalid = select_blocks(q, kb.max(axis=2), kb.min(axis=2),
                                    jnp.asarray([S]), cfg)
        chosen = set(np.asarray(sel)[0][: int(nvalid[0])].tolist())
        assert 3 in chosen           # hot block
        assert 0 in chosen           # sink
        assert {nb - 1, nb - 2} <= chosen  # recent
        assert int(nvalid[0]) < nb   # something was skipped

    def test_fallback_matches_full_attention_when_all_kept(self):
        r = _rng()
        B, S, KH, G, D, bs = 2, 256, 2, 2, 32, 64
        nb = S // bs
        k = jnp.asarray(r.standard_normal((B, S, KH, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, S, KH, D)), jnp.float32)
        q = jnp.asarray(r.standard_normal((B, KH, G, D)), jnp.float32)
        lengths = jnp.asarray([S, S - 17])
        sel = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None], (B, nb))
        nvalid = jnp.full((B,), nb, jnp.int32)
        out = block_sparse_decode_attention_xla(
            q, k, v, sel, nvalid, lengths, block_size=bs, out_dtype=jnp.float32
        )
        # dense reference
        s = np.einsum("bhgd,bshd->bhgs", np.asarray(q), np.asarray(k)) / np.sqrt(D)
        pos = np.arange(S)[None, None, None, :]
        s = np.where(pos < np.asarray(lengths)[:, None, None, None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhgs,bshd->bhgd", p, np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TestEndToEnd:
    def _decode_compare(self, tau, budget):
        """Prefill then decode a few tokens with and without skip-softmax;
        return (rel_err, skipped_fraction proxy)."""
        # f32 so "lossless at full budget" is a real invariant, not bf16
        # rounding-order noise
        cfg = tiny_test_config(max_position_embeddings=512,
                               dtype=jnp.float32, param_dtype=jnp.float32)
        module = Decoder(cfg)
        r = _rng(1)
        ids = jnp.asarray(r.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=module, variables=dict(variables),
                             example_inputs=(ids,))
        sb = sparsify_attention_dynamic(bundle, block_size=64, tau=tau,
                                        budget=budget)
        MAXLEN = 512
        prompt = jnp.asarray(r.integers(0, cfg.vocab_size, (2, 320)), jnp.int32)

        def run(b):
            c = make_cache(b.module.cfg, 2, MAXLEN)
            logits, c2 = b.apply(prompt, cache=c)
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            outs = []
            cache = c2
            for _ in range(4):
                logits, cache = b.apply(tok, cache=cache)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                outs.append(logits)
            return jnp.concatenate(outs, axis=1)

        dense_l = run(bundle)
        sparse_l = run(sb)
        rel = float(jnp.linalg.norm(sparse_l - dense_l)
                    / jnp.linalg.norm(dense_l))
        return rel

    def test_full_budget_high_tau_is_lossless(self):
        rel = self._decode_compare(tau=1e9, budget=1.0)
        assert rel < 1e-3, rel

    def test_calibrated_tau_bounded_error(self):
        rel = self._decode_compare(tau=8.0, budget=0.6)
        assert rel < 0.15, rel

    def test_ruler_calibration_picks_tau(self):
        cfg = tiny_test_config(max_position_embeddings=512)
        module = Decoder(cfg)
        r = _rng(2)
        ids = jnp.asarray(r.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=module, variables=dict(variables),
                             example_inputs=(ids,))
        batches = ruler_needle_batches(cfg.vocab_size, num_batches=1,
                                       batch_size=1, seq_len=384)
        sb, info = calibrate_skip_softmax(
            bundle, batches, recall_target=0.98, block_size=64,
            tau_grid=(2.0, 6.0, 12.0),
        )
        assert sb.module.cfg.skip_softmax is not None
        assert info["tau"] in (2.0, 6.0, 12.0)
        # calibrated tau meets the target on the calibration data
        assert info["recalls"][str(info["tau"])] >= 0.98 or info["tau"] == 12.0

    def test_mode_record_replays(self):
        cfg = tiny_test_config()
        module = Decoder(cfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        variables = module.init(jax.random.PRNGKey(0), ids)
        bundle = ModelBundle(module=module, variables=dict(variables),
                             example_inputs=(ids,))
        sb = sparsify_attention_dynamic(bundle, block_size=64, tau=5.0)
        assert sb.module.cfg.skip_softmax.tau == 5.0
        assert sb.records[-1].mode == "skip_softmax"
