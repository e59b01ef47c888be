"""Mamba2 (SSD) mixer + hybrid decoder tests (reference surface:
megatron mamba support in prune/plugins/mcore_minitron.py + the
mamba_moe PTQ presets; the SSD math is arXiv:2405.21060)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, make_cache, tiny_hybrid_test_config
from modelopt_tpu.models.ssm import ssd_scan, ssd_step


def _naive_recurrence(x, dt, A, B, C, h0):
    """Literal h_t = exp(dt A) h + dt B x ; y = C h reference."""
    Bz, T, nh, P = x.shape
    h = np.asarray(h0, np.float64).copy()
    ys = np.zeros((Bz, T, nh, P))
    xn, dtn = np.asarray(x, np.float64), np.asarray(dt, np.float64)
    Bn, Cn, An = (np.asarray(a, np.float64) for a in (B, C, A))
    for t in range(T):
        a = np.exp(dtn[:, t] * An)[..., None, None]        # [Bz,nh,1,1]
        h = a * h + np.einsum("bh,bhn,bhp->bhnp", dtn[:, t], Bn[:, t],
                              xn[:, t])
        ys[:, t] = np.einsum("bhn,bhnp->bhp", Cn[:, t], h)
    return ys, h


def _rand_ssd(key, Bz=2, T=19, nh=3, P=5, N=4):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (Bz, T, nh, P))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (Bz, T, nh)))
    A = -jnp.exp(jax.random.normal(ks[2], (nh,)))
    B = jax.random.normal(ks[3], (Bz, T, nh, N))
    C = jax.random.normal(ks[4], (Bz, T, nh, N))
    h0 = jax.random.normal(jax.random.PRNGKey(9), (Bz, nh, N, P))
    return x, dt, A, B, C, h0


def test_ssd_scan_matches_naive_recurrence():
    x, dt, A, B, C, h0 = _rand_ssd(jax.random.PRNGKey(0))
    y, hT = ssd_scan(x, dt, A, B, C, h0, chunk=8)  # T=19: ragged chunks
    y_ref, h_ref = _naive_recurrence(x, dt, A, B, C, h0)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hT), h_ref, rtol=1e-4, atol=1e-4)


def test_ssd_scan_gradients_finite_at_large_decay():
    """Large dt*|A| makes the (s > t) log-decay exponent overflow f32 if
    the triangular mask is applied AFTER exponentiation — the forward
    survives the jnp.where but gradients NaN (advisor round-4 finding).
    Pin: grads of dt/A/x stay finite at realistic magnitudes."""
    x, dt, A, B, C, h0 = _rand_ssd(jax.random.PRNGKey(3), T=64)
    dt = dt * 8.0          # dt*|A| sums past ~90 within a chunk -> e^+big
    A = A * 4.0

    def loss(x, dt, A):
        y, hT = ssd_scan(x, dt, A, B, C, h0, chunk=64)
        return jnp.sum(y) + jnp.sum(hT)

    gx, gdt, gA = jax.grad(loss, argnums=(0, 1, 2))(x, dt, A)
    for g in (gx, gdt, gA):
        assert np.all(np.isfinite(np.asarray(g)))


def test_ssd_step_matches_scan():
    x, dt, A, B, C, h0 = _rand_ssd(jax.random.PRNGKey(1), T=1)
    y, hT = ssd_step(x[:, 0], dt[:, 0], A, B[:, 0], C[:, 0], h0)
    y2, hT2 = ssd_scan(x, dt, A, B, C, h0, chunk=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2[:, 0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT2),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def hybrid_bundle():
    cfg = tiny_hybrid_test_config(dtype=jnp.float32, param_dtype=jnp.float32)
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 24)),
                      jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    return ModelBundle(module=m, variables=dict(v), example_inputs=(ids,))


def test_hybrid_forward_finite(hybrid_bundle):
    ids = hybrid_bundle.example_inputs[0]
    logits, _ = hybrid_bundle.apply(ids)
    assert logits.shape == (2, 24, 256)
    assert np.isfinite(np.asarray(logits)).all()
    # mamba layers own mixer params, attention layer owns attn params
    p = hybrid_bundle.variables["params"]
    assert "mixer" in p["layers_0"] and "mixer" in p["layers_2"]
    assert "attn" in p["layers_1"]


def test_hybrid_decode_matches_full_forward(hybrid_bundle):
    """Teacher-forced one-token-at-a-time decode (conv window + SSM state
    through the cache) must reproduce the full-sequence logits."""
    bundle = hybrid_bundle
    cfg = bundle.module.cfg
    ids = bundle.example_inputs[0]
    B, T = ids.shape
    full, _ = bundle.apply(ids)

    cache = make_cache(cfg, B, 32)
    fn = jax.jit(bundle.make_fn())
    outs = []
    for t in range(T):
        logits, cache = fn(bundle.variables, ids[:, t:t + 1], cache)
        outs.append(logits[:, 0])
    step = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(step, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_hybrid_chunked_prefill_matches(hybrid_bundle):
    """Prefill in two chunks through the cache == full forward (the SSD
    initial-state path)."""
    bundle = hybrid_bundle
    cfg = bundle.module.cfg
    ids = bundle.example_inputs[0]
    full, _ = bundle.apply(ids)
    cache = make_cache(cfg, ids.shape[0], 32)
    fn = jax.jit(bundle.make_fn(), static_argnums=())
    l1, cache = fn(bundle.variables, ids[:, :13], cache)
    l2, cache = fn(bundle.variables, ids[:, 13:], cache)
    got = np.concatenate([np.asarray(l1), np.asarray(l2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_hybrid_quantizes_fp8(hybrid_bundle):
    import modelopt_tpu.quant as mtq

    bundle = hybrid_bundle
    ids = bundle.example_inputs[0]
    q = mtq.quantize(bundle, mtq.FP8_DEFAULT_CFG, lambda f: f(ids))
    logits, _ = q.apply(ids)
    assert np.isfinite(np.asarray(logits)).all()
    # mamba in/out projections carry quantizer state
    lq = q.variables["quant"]["layers_0"]["mixer"]
    assert "in_proj" in lq and "out_proj" in lq
    base, _ = bundle.apply(ids)
    lp0 = jax.nn.log_softmax(np.asarray(base, np.float32), -1)
    lp1 = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
    kl = float(np.mean(np.sum(np.exp(lp0) * (lp0 - lp1), -1)))
    assert kl < 0.05


def test_hybrid_compress_and_decode(hybrid_bundle):
    """Compressed (real int8 codes) hybrid still decodes through the
    cache — the quant backends serve the mamba projections too."""
    import modelopt_tpu.quant as mtq

    bundle = hybrid_bundle
    cfg = bundle.module.cfg
    ids = bundle.example_inputs[0]
    q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG, lambda f: f(ids))
    qc = mtq.compress(q)
    cache = make_cache(cfg, ids.shape[0], 32)
    fn = jax.jit(qc.make_fn())
    logits, cache = fn(qc.variables, ids, cache)
    logits2, cache = fn(qc.variables, ids[:, :1], cache)
    assert np.isfinite(np.asarray(logits2)).all()


def test_pure_mamba_via_no_mlp_plan():
    """Pure-Mamba2 stack: all-M pattern + no_mlp layer plan."""
    cfg = tiny_hybrid_test_config(
        dtype=jnp.float32, param_dtype=jnp.float32,
        hybrid_pattern="MMM",
        layer_plan=((("no_mlp", True),),) * 3,
    )
    m = Decoder(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 12)),
                      jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids)
    logits, _ = m.apply(v, ids)
    assert np.isfinite(np.asarray(logits)).all()
    p = v["params"]
    assert all("mlp" not in p[f"layers_{i}"] for i in range(3))


class TestHybridServing:
    """Engine-level correctness for stateful layers: bucket-padded
    prefill must not pollute the SSM/conv state, and slot reuse must not
    inherit the previous request's state."""

    @pytest.fixture(scope="class")
    def bundle(self):
        cfg = tiny_hybrid_test_config(dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      max_position_embeddings=128)
        m = Decoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        return ModelBundle(module=m, variables=dict(v),
                           example_inputs=(ids,))

    @staticmethod
    def _naive_greedy(bundle, prompt, n):
        toks = list(prompt)
        fn = jax.jit(bundle.make_fn())
        for _ in range(n):
            logits, _ = fn(bundle.variables,
                           jnp.asarray([toks], jnp.int32))
            toks.append(int(jnp.argmax(logits[0, -1])))
        return toks[len(prompt):]

    def test_speculative_refused_for_hybrid(self, bundle):
        # the verify forward would irreversibly push rejected drafts into
        # SSM/conv state — the engine must refuse, not silently corrupt
        from modelopt_tpu.serve import ServingEngine

        with pytest.raises(NotImplementedError, match="hybrid"):
            ServingEngine(bundle, max_batch=1, max_seq_len=64,
                          prefill_buckets=(16,), speculative=2)

    def test_paged_refused_for_hybrid(self, bundle):
        # uniform per-layer page pools can't hold mamba conv/SSM state;
        # must refuse clearly, not die on a concat shape error
        from modelopt_tpu.serve import ServingEngine

        with pytest.raises(NotImplementedError, match="paged KV"):
            ServingEngine(bundle, max_batch=2, max_seq_len=64, paged=True,
                          page_size=16, prefill_buckets=(16,))

    def test_padded_prefill_matches_naive(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        # prompt length 5 into a bucket of 16: 11 padding tokens would
        # corrupt the SSM state without the valid_to masking
        prompt = [5, 17, 42, 7, 101]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(16,))
        req = eng.submit(prompt, max_new_tokens=6)
        eng.run()
        assert req.out_tokens == self._naive_greedy(bundle, prompt, 6)

    def test_slot_reuse_resets_state(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        eng = ServingEngine(bundle, max_batch=1, max_seq_len=64,
                            prefill_buckets=(8,))
        r1 = eng.submit([9, 9, 1, 30, 2, 4], max_new_tokens=4)
        eng.run()
        # second request reuses the only slot; its state must start clean
        r2 = eng.submit([11, 3, 8], max_new_tokens=5)
        eng.run()
        assert r2.out_tokens == self._naive_greedy(bundle, [11, 3, 8], 5)

    def test_burst_decode_matches(self, bundle):
        from modelopt_tpu.serve import ServingEngine

        prompt = [2, 4, 6, 8]
        eng = ServingEngine(bundle, max_batch=2, max_seq_len=64,
                            prefill_buckets=(8,), multi_step=4)
        req = eng.submit(prompt, max_new_tokens=8)
        eng.run()
        assert req.out_tokens == self._naive_greedy(bundle, prompt, 8)


def test_mamba2_hf_logit_parity():
    """Real torch parity: HF Mamba2ForCausalLM (random init) imported via
    from_hf must match logits — the strongest validation of the SSD math,
    head/group expansion order, conv semantics, and the gated norm."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    from transformers.models.mamba2.modeling_mamba2 import Mamba2ForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = tfm.Mamba2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_heads=8, head_dim=16, state_size=32, n_groups=2,
        expand=2, conv_kernel=4, chunk_size=8,
        tie_word_embeddings=False, time_step_limit=(0.0, float("inf")),
    )
    torch.manual_seed(0)
    hf = Mamba2ForCausalLM(cfg).eval().float()
    b = from_hf(hf, cfg)
    assert b.module.cfg.hybrid_pattern == "MM"
    assert b.module.cfg.mamba_num_heads == 8
    ids_t = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8, 11, 6, 2, 3]])
    with torch.no_grad():
        ref = hf(ids_t).logits.numpy()
    out = b.apply(jnp.asarray(ids_t.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err


def test_bamba_hybrid_hf_logit_parity():
    """Hybrid torch parity: IBM Bamba (Mamba2 blocks + attention blocks +
    per-block SwiGLU MLP) imported via from_hf matches HF logits — pins
    the HYBRID wiring (pattern mapping, partial-rotary attention next to
    SSM blocks, pre_ff norm placement)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers.models.bamba import BambaConfig
    from transformers.models.bamba.modeling_bamba import BambaForCausalLM

    from modelopt_tpu.models.hf_import import from_hf

    cfg = BambaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, mamba_n_heads=8, mamba_d_head=16,
        mamba_d_state=32, mamba_n_groups=2, mamba_expand=2,
        mamba_d_conv=4, mamba_chunk_size=8,
        attn_layer_indices=[1], tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = BambaForCausalLM(cfg).eval().float()
    b = from_hf(hf, cfg)
    assert b.module.cfg.hybrid_pattern == "M*M"
    ids_t = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8, 11, 6]])
    with torch.no_grad():
        ref = hf(ids_t).logits.numpy()
    out = b.apply(jnp.asarray(ids_t.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err


def test_nemotron_h_hybrid_import_logit_parity():
    """Nemotron-H import (backbone.layers.N.mixer holding a Mamba2 mixer,
    a NoPE attention, or a squared-ReLU MLP per hybrid_override_pattern —
    reference naming: export/plugins/mcore_nemotron.py:51). Torch parity
    reference composed from HF's own Mamba2Mixer plus hand-built NoPE
    GQA attention and relu^2 MLP, so the full hybrid stack is pinned
    numerically, not just structurally."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers.models.mamba2.configuration_mamba2 import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

    from modelopt_tpu.models.hf_import import from_hf

    H, V, I = 64, 128, 96
    NH, KV, HD = 4, 2, 16
    pattern = "M*-M"
    m2cfg = Mamba2Config(
        vocab_size=V, hidden_size=H, state_size=16, num_heads=8,
        head_dim=16, n_groups=2, expand=2, conv_kernel=4, chunk_size=8,
    )

    def rms(x, w, eps=1e-5):
        v = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + eps) * w.float())

    class Attn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.q_proj = torch.nn.Linear(H, NH * HD, bias=False)
            self.k_proj = torch.nn.Linear(H, KV * HD, bias=False)
            self.v_proj = torch.nn.Linear(H, KV * HD, bias=False)
            self.o_proj = torch.nn.Linear(NH * HD, H, bias=False)

        def forward(self, x):
            B, T, _ = x.shape
            q = self.q_proj(x).view(B, T, NH, HD).transpose(1, 2)
            k = self.k_proj(x).view(B, T, KV, HD).transpose(1, 2)
            v = self.v_proj(x).view(B, T, KV, HD).transpose(1, 2)
            k = k.repeat_interleave(NH // KV, dim=1)
            v = v.repeat_interleave(NH // KV, dim=1)
            s = (q @ k.transpose(-1, -2)) / (HD ** 0.5)
            mask = torch.triu(torch.full((T, T), float("-inf")), 1)
            p = torch.softmax(s + mask, dim=-1)
            return self.o_proj((p @ v).transpose(1, 2).reshape(B, T, -1))

    class Mlp(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.up_proj = torch.nn.Linear(H, I, bias=False)
            self.down_proj = torch.nn.Linear(I, H, bias=False)

        def forward(self, x):
            return self.down_proj(torch.relu(self.up_proj(x)) ** 2)

    torch.manual_seed(0)
    blocks, norms = [], []
    for i, c in enumerate(pattern):
        blocks.append(Mamba2Mixer(m2cfg, layer_idx=i) if c == "M"
                      else Attn() if c == "*" else Mlp())
        norms.append(torch.nn.Parameter(torch.rand(H) * 0.5 + 0.75))
    emb = torch.nn.Embedding(V, H)
    norm_f = torch.nn.Parameter(torch.rand(H) * 0.5 + 0.75)
    head = torch.nn.Linear(H, V, bias=False)

    ids_t = torch.tensor([[5, 3, 7, 2, 9, 1, 4, 8, 11, 6]])
    with torch.no_grad():
        x = emb(ids_t)
        for blk, w in zip(blocks, norms):
            x = x + blk(rms(x, w).to(x.dtype))
        ref = head(rms(x, norm_f).to(x.dtype)).numpy()

    sd = {"backbone.embeddings.weight": emb.weight,
          "backbone.norm_f.weight": norm_f, "lm_head.weight": head.weight}
    for i, blk in enumerate(blocks):
        sd[f"backbone.layers.{i}.norm.weight"] = norms[i]
        for n, p in blk.state_dict().items():
            sd[f"backbone.layers.{i}.mixer.{n}"] = p

    hf_cfg = {
        "model_type": "nemotron_h", "vocab_size": V, "hidden_size": H,
        "num_hidden_layers": len(pattern), "num_attention_heads": NH,
        "num_key_value_heads": KV, "attention_head_dim": HD,
        "intermediate_size": I, "hybrid_override_pattern": pattern,
        "mamba_num_heads": 8, "mamba_head_dim": 16, "ssm_state_size": 16,
        "n_groups": 2, "conv_kernel": 4, "chunk_size": 8,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
    }
    b = from_hf(sd, hf_cfg)
    assert b.module.cfg.hybrid_pattern == "M**M"
    assert "no_attn" in b.module.cfg.layer_opts(2)
    out = b.apply(jnp.asarray(ids_t.numpy()))
    lg = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    err = np.abs(lg - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err
