"""DFlash: block-parallel draft with KV injection.

The DFlash draft predicts a BLOCK of K future tokens in ONE forward — no
draft autoregression at all (reference: modelopt/torch/speculative/plugins/
modeling_dflash.py DFlashModule/DFlashAttention, hf_dflash.py training).
Mechanics reproduced here, TPU-idiomatically as a wrapper module (no
in-place model surgery):

  * the draft input is a noise block: [emb(anchor token), mask_emb x(K-1)]
    — mask positions are a LEARNED embedding, not a tokenizer id (this
    framework has no tokenizer dependency);
  * multi-layer target hidden states ("taps", the same machinery EAGLE-3
    uses) are fused by one projection + RMSNorm into the draft width;
  * every draft layer's Q comes from the noise block, K/V from
    [fused context ; noise block] — so block positions see the whole
    verified context AND each other (bidirectional inside the block);
  * QK-norm per head (the reference draft is Qwen3-flavored);
  * base embedding and LM head are shared with the target model.

One draft forward = K parallel token predictions; verification is the same
lossless greedy verify as EAGLE/Medusa (decoding.speculative_decode).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.transformer import Decoder, DecoderConfig, MLP, _rope
from ..nn.layers import QuantDense, RMSNorm
from ..utils.evaluate import lm_cross_entropy


@dataclasses.dataclass
class DFlashConfig:
    num_draft_layers: int = 2
    block_size: int = 4  # K tokens drafted per forward
    # target layers whose hidden states are fused as draft context
    # (None -> uniformly spread, reference build_target_layer_ids)
    feature_layers: Optional[tuple] = None
    loss_decay: float = 0.8  # exponential decay over in-block positions

    def __post_init__(self):
        if isinstance(self.feature_layers, list):
            self.feature_layers = tuple(self.feature_layers)

    def to_dict(self):
        d = dataclasses.asdict(self)
        if d["feature_layers"] is not None:
            d["feature_layers"] = list(d["feature_layers"])
        return d


def build_target_layer_ids(num_target_layers: int, num_taps: int) -> tuple:
    """Uniformly spread tap layers over [1, L-3] (reference:
    modeling_dflash.py:103 build_target_layer_ids)."""
    if num_taps == 1:
        return (num_target_layers // 2,)
    start = min(1, num_target_layers - 1)
    end = max(start, num_target_layers - 3)
    span = end - start
    return tuple(
        round(start + (i * span) / (num_taps - 1)) for i in range(num_taps)
    )


class DFlashLayer(nn.Module):
    """Draft layer: Q from the K-token noise block, K/V from
    [context ; block], QK-norm, bidirectional inside the block."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, ctx, block_positions, ctx_positions, ctx_mask):
        """x [B, K, H] noise block; ctx [B, S, H] fused target hidden;
        ctx_mask [B, S] 1 = context position is valid (<= anchor)."""
        cfg = self.cfg
        H, KH, D = cfg.num_heads, cfg.kv_heads, cfg.dims_per_head
        B, K, _ = x.shape
        S = ctx.shape[1]
        dense = lambda feats, name: QuantDense(  # noqa: E731
            feats, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        h = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="input_norm")(x)

        # one k_proj/v_proj shared across context and block (same module
        # instance applied twice — matches the reference's weight sharing)
        q_proj = dense(H * D, "q_proj")
        k_proj = dense(KH * D, "k_proj")
        v_proj = dense(KH * D, "v_proj")
        q = q_proj(h).reshape(B, K, H, D)
        k_ctx = k_proj(ctx).reshape(B, S, KH, D)
        k_blk = k_proj(h).reshape(B, K, KH, D)
        v_ctx = v_proj(ctx).reshape(B, S, KH, D)
        v_blk = v_proj(h).reshape(B, K, KH, D)

        # QK-norm per head dim (Qwen3-style; reference q_norm/k_norm)
        qn = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="q_norm")
        kn = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="k_norm")
        q = qn(q)
        k_ctx, k_blk = kn(k_ctx), kn(k_blk)

        q = _rope(q, block_positions, cfg.rope_theta)
        k_ctx = _rope(k_ctx, ctx_positions, cfg.rope_theta)
        k_blk = _rope(k_blk, block_positions, cfg.rope_theta)

        k = jnp.concatenate([k_ctx, k_blk], axis=1)  # [B, S+K, KH, D]
        v = jnp.concatenate([v_ctx, v_blk], axis=1)
        G = H // KH
        qg = q.reshape(B, K, KH, G, D)
        scores = jnp.einsum(
            "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(D))
        # context masked to <= anchor; block fully bidirectional
        valid = jnp.concatenate(
            [ctx_mask.astype(bool), jnp.ones((B, K), bool)], axis=1
        )
        scores = jnp.where(valid[:, None, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bkgts,bskd->btkgd", probs, v.astype(cfg.dtype))
        out = dense(cfg.hidden_size, "o_proj")(out.reshape(B, K, H * D))
        x = x + out

        h2 = RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="post_attn_norm")(x)
        return x + MLP(cfg, name="mlp")(h2)


class DFlashModel(nn.Module):
    """Base decoder + DFlash block-parallel draft. Methods:
      __call__      — base forward (logits, cache[, features])
      draft_block   — K parallel draft logits from (anchor token, context
                      features, anchor position)
    """

    cfg: DecoderConfig
    dflash_cfg: DFlashConfig = dataclasses.field(default_factory=DFlashConfig)

    def resolved_taps(self) -> tuple:
        """Tap layer ids — plain helper (usable outside init/apply).
        Deduplicated: the Decoder taps each layer index at most once, so
        duplicates (tiny models) must not inflate feature_width."""
        taps = self.dflash_cfg.feature_layers
        if taps is None:
            taps = build_target_layer_ids(
                self.cfg.num_layers, min(3, self.cfg.num_layers)
            )
        return tuple(sorted(set(taps)))

    def setup(self):
        self.taps = self.resolved_taps()
        self.base = Decoder(dataclasses.replace(self.cfg, hidden_taps=self.taps))
        self.fc = QuantDense(self.cfg.hidden_size, use_bias=False,
                             dtype=self.cfg.dtype,
                             param_dtype=self.cfg.param_dtype, name="fc")
        self.hidden_norm = RMSNorm(epsilon=self.cfg.norm_eps,
                                   dtype=self.cfg.dtype, name="hidden_norm")
        self.layers = [
            DFlashLayer(self.cfg, name=f"draft_{i}")
            for i in range(self.dflash_cfg.num_draft_layers)
        ]
        self.norm = RMSNorm(epsilon=self.cfg.norm_eps, dtype=self.cfg.dtype,
                            name="norm")
        self.mask_embedding = self.param(
            "mask_embedding", nn.initializers.normal(0.02),
            (self.cfg.hidden_size,), self.cfg.param_dtype,
        )

    def feature_width(self) -> int:
        # taps + final hidden (Decoder.output_hidden concatenation)
        return self.cfg.hidden_size * (len(self.resolved_taps()) + 1)

    def __call__(self, input_ids, cache=None, positions=None, output_hidden=False,
                 logits_index=None):
        return self.base(input_ids, cache, positions,
                         output_hidden=output_hidden, logits_index=logits_index)

    def init_all(self, input_ids):
        logits, _, features = self(input_ids, output_hidden=True)
        B = input_ids.shape[0]
        anchor = input_ids[:, -1:]
        pos = jnp.full((B,), input_ids.shape[1] - 1, jnp.int32)
        self.draft_block(anchor, features, pos)
        return logits

    def draft_block(self, anchor_token, features, anchor_positions):
        """anchor_token [B, 1]; features [B, S, F] tapped base hidden;
        anchor_positions [B] (position of the anchor token in the sequence).
        Returns logits [B, K, V] for the K tokens after the anchor."""
        cfg = self.cfg
        K = self.dflash_cfg.block_size
        B, S, _ = features.shape
        ctx = self.hidden_norm(self.fc(features))  # [B, S, H]

        emb = self.base.get_variable("params", "embed_tokens")["embedding"]
        a = jnp.take(emb, anchor_token[:, 0], axis=0).astype(cfg.dtype)  # [B, H]
        m = jnp.broadcast_to(
            self.mask_embedding.astype(cfg.dtype)[None, None], (B, K - 1, cfg.hidden_size)
        )
        x = jnp.concatenate([a[:, None], m], axis=1)  # [B, K, H]

        block_positions = (
            anchor_positions[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
        )
        ctx_positions = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (B, S)
        )
        ctx_mask = ctx_positions <= anchor_positions[:, None]

        for layer in self.layers:
            x = layer(x, ctx, block_positions, ctx_positions, ctx_mask)
        x = self.norm(x)
        if cfg.tie_word_embeddings:
            return jnp.dot(x, emb.T.astype(x.dtype))
        k = self.base.get_variable("params", "lm_head")["kernel"]
        return jnp.dot(x, k.astype(x.dtype))


def make_dflash_train_step(bundle, tx, rng_seed: int = 0):
    """Block-parallel draft training: sample one anchor per sequence, mask
    context beyond it, CE over the K-token block with exponential decay
    (reference: hf_dflash.py anchor sampling + decayed loss). Works online
    (features from the frozen base) — for offline shards pair with
    hidden_states.HiddenStateDataset like the EAGLE offline step."""
    import optax

    module: DFlashModel = bundle.module
    K = module.dflash_cfg.block_size
    decay = module.dflash_cfg.loss_decay

    def loss_fn(draft_params, frozen_params, batch, anchor):
        params = {**frozen_params, **draft_params}
        variables = {**bundle.variables, "params": params}
        with bundle.contexts():
            _, _, features = module.apply(variables, batch, output_hidden=True)
            B, T = batch.shape
            anchor_tok = jnp.take_along_axis(batch, anchor[:, None], axis=1)
            logits = module.apply(
                variables, anchor_tok, features, anchor,
                method=DFlashModel.draft_block,
            )  # [B, K, V]
        # labels: tokens anchor+1 .. anchor+K
        idx = anchor[:, None] + 1 + jnp.arange(K, dtype=jnp.int32)[None]
        idx = jnp.minimum(idx, T - 1)
        labels = jnp.take_along_axis(batch, idx, axis=1)
        w = decay ** jnp.arange(K, dtype=jnp.float32)
        ce = jnp.stack(
            [lm_cross_entropy(logits[:, j:j + 1], labels[:, j:j + 1])
             for j in range(K)]
        )
        return jnp.sum(ce * w) / jnp.sum(w)

    def _draft_params(params):
        return {k: v for k, v in params.items() if k != "base"}

    def init_state():
        draft_params = _draft_params(bundle.variables["params"])
        return draft_params, tx.init(draft_params), jax.random.PRNGKey(rng_seed)

    @jax.jit
    def step(state, batch):
        draft_params, opt_state, rng = state
        rng, sub = jax.random.split(rng)
        B, T = batch.shape
        anchor = jax.random.randint(sub, (B,), 0, max(T - K - 1, 1))
        frozen = {"base": bundle.variables["params"]["base"]}
        loss, grads = jax.value_and_grad(loss_fn)(draft_params, frozen,
                                                  batch, anchor)
        updates, opt_state = tx.update(grads, opt_state, draft_params)
        import optax as _o

        draft_params = _o.apply_updates(draft_params, updates)
        return (draft_params, opt_state, rng), loss

    return init_state, step
