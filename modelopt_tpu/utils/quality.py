"""Quantization-quality ladder on a synthetically-trained decoder.

The reference's accuracy baseline is an MMLU-delta table per format
(reference: examples/benchmark.md:37-40). No real weights/tokenizer are
mountable in this environment (zero egress), so the regenerable quality
evidence is measured the same way on a *trained* model: a tiny decoder is
trained to convergence on a fixed synthetic Markov language, then each
quantization format+algorithm is applied with real calibration and scored
by held-out perplexity delta and mean logits-KL against the bf16 model.

The orderings this produces (fp8 ~lossless, gptq <= rtn, awq <= max-int4,
w4a16 <= w4a8) are pinned as regression tests in
tests/unit/quant/test_quality_ladder.py; `python quality.py` at the repo
root regenerates the committed QUALITY.json artifact that bench.py embeds
in its aux output.

Everything is deterministic (fixed seeds, CPU-friendly sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import ModelBundle

# (preset, human label). Order = the report order, not the quality order.
DEFAULT_LADDER = (
    ("FP8_DEFAULT_CFG", "fp8"),
    ("INT8_SMOOTHQUANT_CFG", "int8_sq"),
    ("NVFP4_DEFAULT_CFG", "nvfp4"),
    ("MXFP4_DEFAULT_CFG", "mxfp4"),
    ("W4A8_INT8_DYNAMIC_CFG", "w4a8_int4_rtn"),
    ("W4A8_INT8KV_CFG", "w4a8_int8kv_awq"),  # the bench serving headline
    ("INT4_BLOCKWISE_WEIGHT_ONLY_CFG", "w4a16_rtn"),
    ("INT4_AWQ_CFG", "w4a16_awq"),
    ("GPTQ", "w4a16_gptq"),  # INT4 blockwise + gptq algorithm
    ("NVFP4_SVDQUANT_CFG", "nvfp4_svdquant"),  # low-rank absorb recovery
)


def make_markov_batches(vocab=256, batch=32, seqlen=64, n_batches=12, seed=0,
                        branching=6, traj_seed=None):
    """Deterministic synthetic language: a sparse Markov chain with Zipfian
    next-token weights — low-entropy enough that a tiny decoder learns it
    well (ppl far below uniform), so quantization damage is measurable.

    ``traj_seed``: draw FRESH trajectories from the SAME chain (the chain
    is defined by ``seed``) — e.g. QAT finetuning data that matches the
    training language without repeating its sequences. None keeps the
    original single-stream draws bit-identical."""
    rng = np.random.default_rng(seed)
    nxt = rng.integers(0, vocab, size=(vocab, branching))
    if traj_seed is not None:
        rng = np.random.default_rng(traj_seed)
    w = 1.0 / np.arange(1, branching + 1) ** 1.2
    probs = w / w.sum()
    cum = np.cumsum(probs)

    toks = np.empty((n_batches, batch, seqlen), np.int32)
    state = rng.integers(0, vocab, size=(n_batches, batch))
    for t in range(seqlen):
        toks[:, :, t] = state
        choice = np.searchsorted(cum, rng.random(state.shape))
        state = nxt[state, choice]
    return [jnp.asarray(toks[i]) for i in range(n_batches)]


def train_tiny_lm(steps=400, seed=0, vocab=256, hidden=128, layers=4,
                  lr=3e-3, log=False, batch=32):
    """Train a tiny Llama-style decoder on the Markov language; returns the
    trained ModelBundle plus (train, calib, eval) batch lists.

    The embedding is initialized with per-channel lognormal scales so the
    residual stream carries realistic channel-scale diversity (the outlier
    regime where smoothing algorithms matter)."""
    from ..models import Decoder, tiny_test_config

    cfg = tiny_test_config(
        vocab_size=vocab, hidden_size=hidden, num_layers=layers,
        num_heads=8, num_kv_heads=4, intermediate_size=2 * hidden,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    module = Decoder(cfg)
    # fresh batch every step: the model must learn the chain's transition
    # structure, not memorize sequences (memorization inverts the ladder —
    # quantization noise then *helps* held-out ppl)
    batches = make_markov_batches(vocab=vocab, batch=batch, seed=seed + 100,
                                  n_batches=steps + 4)
    train, calib, evalb = batches[:steps], batches[steps:steps + 2], \
        batches[steps + 2:]

    variables = module.init(jax.random.PRNGKey(seed), train[0])
    params = variables["params"]
    # channel-outlier regime: norm scales initialized lognormal means the
    # activations entering every quantized projection carry realistic
    # per-channel magnitude spread (the regime where awq/smoothquant
    # matter); largely persists through short training
    scale_rng = np.random.default_rng(seed + 1)

    def _spread_scales(path, x):
        if getattr(path[-1], "key", None) == "scale" and x.ndim == 1:
            return x * jnp.asarray(
                np.exp(0.8 * scale_rng.standard_normal(x.shape[0])),
                x.dtype)
        return x

    params = jax.tree_util.tree_map_with_path(_spread_scales, params)

    tx = optax.adamw(lr, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            logits, _ = module.apply({"params": p}, ids)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], ids[:, 1:]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state,
                                       train[i % len(train)])
        if log and i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    bundle = ModelBundle(module=module, variables={"params": params},
                         example_inputs=(train[0],))
    return bundle, train, calib, evalb


def eval_ppl(bundle: ModelBundle, batches, ref_logits=None):
    """Held-out perplexity; if ref_logits given also mean KL(ref || model)
    per token (the quantization-damage metric that is independent of the
    data distribution)."""
    fn = jax.jit(bundle.make_fn())
    total_nll, total_kl, total_tok = 0.0, 0.0, 0
    out_logits = []
    for bi, ids in enumerate(batches):
        logits, _ = fn(bundle.variables, ids)
        out_logits.append(logits)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1).mean()
        total_nll += float(nll) * ids[:, 1:].size
        total_tok += ids[:, 1:].size
        if ref_logits is not None:
            rlp = jax.nn.log_softmax(
                ref_logits[bi][:, :-1].astype(jnp.float32), axis=-1)
            kl = jnp.sum(jnp.exp(rlp) * (rlp - lp), axis=-1).mean()
            total_kl += float(kl) * ids[:, 1:].size
    ppl = float(np.exp(total_nll / total_tok))
    kl = total_kl / total_tok if ref_logits is not None else None
    return ppl, kl, out_logits


def qat_recovery(steps=400, seed=0, preset="MXFP4_DEFAULT_CFG",
                 qat_steps=120, lr=5e-4, log=False, **model_kw):
    """PTQ-damage -> QAT-recovery measurement (the reference's QAT
    val-loss table shape: PTQ 3.321 -> QAT 1.294 for INT4w/INT8a on
    Llama2-7B, benchmark.md:58-63). Quantize with an aggressive format,
    then STE-finetune the quantized bundle on fresh batches and re-score:
    the recovered delta must land well inside the PTQ delta.

    Returns {"preset", "bf16_ppl", "ptq_delta_ppl", "qat_delta_ppl",
    "recovery_frac"}."""
    import modelopt_tpu.quant as mtq
    from ..quant.qat import qat_finetune

    bundle, _, calib, evalb = train_tiny_lm(steps=steps, seed=seed, log=log,
                                            **model_kw)
    bf16_ppl, _, _ = eval_ppl(bundle, evalb)

    def forward_loop(fn):
        for ids in calib:
            fn(ids)

    q = mtq.quantize(bundle, getattr(mtq, preset), forward_loop)
    ptq_ppl, _, _ = eval_ppl(q, evalb)
    # fresh trajectories from the SAME chain train_tiny_lm used
    ft_batches = make_markov_batches(vocab=model_kw.get("vocab", 256),
                                     seed=seed + 100, traj_seed=seed + 777,
                                     n_batches=qat_steps)
    qat, losses = qat_finetune(q, ft_batches, learning_rate=lr)
    qat_ppl, _, _ = eval_ppl(qat, evalb)
    # CONTROL: finetune the unquantized model on the SAME batches — on an
    # undertrained base, extra steps improve ppl by themselves, and the
    # honest recovery question is "how close does QAT land to the bf16
    # model given the same extra training", not "to the frozen baseline"
    bf16_ft, _ = qat_finetune(bundle, ft_batches, learning_rate=lr)
    bf16_ft_ppl, _, _ = eval_ppl(bf16_ft, evalb)
    ptq_d, qat_d = ptq_ppl - bf16_ppl, qat_ppl - bf16_ppl
    qat_vs_ft = qat_ppl - bf16_ft_ppl
    out = {
        "preset": preset,
        "bf16_ppl": round(bf16_ppl, 4),
        "ptq_delta_ppl": round(ptq_d, 4),
        "qat_delta_ppl": round(qat_d, 4),
        "bf16_finetuned_ppl": round(bf16_ft_ppl, 4),
        # the controlled gap: quantized-QAT vs equally-finetuned bf16
        "qat_delta_vs_finetuned_bf16": round(qat_vs_ft, 4),
        "recovery_frac": round(1.0 - qat_d / ptq_d, 4) if ptq_d > 0 else None,
    }
    if log:
        print(f"qat recovery [{preset}]: ptq Δ{ptq_d:+.4f} -> "
              f"qat Δ{qat_d:+.4f} (vs equally-finetuned bf16: "
              f"{qat_vs_ft:+.4f})")
    return out


def quality_ladder(steps=400, seed=0, ladder=DEFAULT_LADDER, log=False,
                   **model_kw):
    """Returns {"bf16_ppl": float, "rungs": {label: {ppl, delta_ppl, kl}}}.
    ``model_kw`` (vocab/hidden/layers) scales the trained LM — the
    committed artifact uses a larger on-chip profile (see quality.py)."""
    import modelopt_tpu.quant as mtq

    bundle, _, calib, evalb = train_tiny_lm(steps=steps, seed=seed, log=log,
                                            **model_kw)
    bf16_ppl, _, ref_logits = eval_ppl(bundle, evalb)

    def forward_loop(fn):
        for ids in calib:
            fn(ids)

    rungs = {}
    for preset, label in ladder:
        if preset == "GPTQ":
            cfg = dict(mtq.INT4_BLOCKWISE_WEIGHT_ONLY_CFG)
            cfg["algorithm"] = {"method": "gptq", "layerwise": True}
        else:
            cfg = getattr(mtq, preset)
        q = mtq.quantize(bundle, cfg, forward_loop)
        ppl, kl, _ = eval_ppl(q, evalb, ref_logits=ref_logits)
        rungs[label] = {
            "ppl": round(ppl, 4),
            "delta_ppl": round(ppl - bf16_ppl, 4),
            "kl_vs_bf16": round(kl, 6),
        }
        if log:
            print(f"{label}: ppl {ppl:.4f} (Δ {ppl - bf16_ppl:+.4f}) "
                  f"KL {kl:.6f}")
    return {"bf16_ppl": round(bf16_ppl, 4), "rungs": rungs}
