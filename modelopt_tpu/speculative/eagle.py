"""EAGLE-style speculative decoding: a one-block draft transformer predicts
the base model's next hidden state from [embedding(token); hidden], sharing
the base LM head (reference: modelopt/torch/speculative/eagle/eagle_model.py:21,
plugins/hf_eagle.py — re-architected as a wrapper module instead of in-place
model mutation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.transformer import Block, Decoder, DecoderConfig
from ..nn.layers import QuantDense, RMSNorm
from ..utils.evaluate import lm_cross_entropy


@dataclasses.dataclass
class EagleConfig:
    num_draft_layers: int = 1

    def to_dict(self):
        return dataclasses.asdict(self)


class EagleHead(nn.Module):
    """fuse([emb; hidden]) -> draft decoder block(s) -> draft hidden."""

    cfg: DecoderConfig
    num_layers: int = 1

    @nn.compact
    def __call__(self, emb, hidden, positions):
        cfg = self.cfg
        x = QuantDense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="fc")(
            jnp.concatenate([emb, hidden.astype(emb.dtype)], axis=-1)
        )
        B, T = positions.shape
        k_pos = positions[:, None, :]
        mask = jnp.where(k_pos <= positions[:, :, None], 0.0, -1e9).astype(jnp.float32)
        for i in range(self.num_layers):
            x, _ = Block(cfg, name=f"layers_{i}")(x, positions, mask, None)
        return RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm")(x)


class EagleModel(nn.Module):
    """Base decoder + EAGLE draft head. Methods:
      __call__    — base forward (logits, cache[, hidden])
      draft       — draft logits from (prev tokens, base hidden)
    """

    cfg: DecoderConfig
    eagle_cfg: EagleConfig = dataclasses.field(default_factory=EagleConfig)

    def setup(self):
        self.base = Decoder(self.cfg)
        self.eagle = EagleHead(self.cfg, self.eagle_cfg.num_draft_layers)

    def __call__(self, input_ids, cache=None, positions=None, output_hidden=False):
        return self.base(input_ids, cache, positions, output_hidden=output_hidden)

    def init_all(self, input_ids):
        """Init helper touching both base and draft params."""
        logits, _, hidden = self(input_ids, output_hidden=True)
        self.draft(input_ids, hidden)
        return logits

    def draft(self, input_ids, hidden, positions=None):
        """Draft next-token logits for each position: token t's embedding is
        fused with the base hidden state at t (which encodes up to t)."""
        B, T = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        emb = self._embed(input_ids)
        h = self.eagle(emb, hidden, positions)
        return self._lm_head(h), h

    def _embed(self, ids):
        # reuse the base embedding table
        emb = self.base.get_variable("params", "embed_tokens")["embedding"]
        return jnp.take(emb, ids, axis=0).astype(self.cfg.dtype)

    def _lm_head(self, x):
        if self.cfg.tie_word_embeddings:
            emb = self.base.get_variable("params", "embed_tokens")["embedding"]
            return jnp.dot(x, emb.T.astype(x.dtype))
        k = self.base.get_variable("params", "lm_head")["kernel"]
        return jnp.dot(x, k.astype(x.dtype))


def make_eagle_train_step(bundle, tx):
    """Draft-head training: frozen base produces hidden states; the draft
    learns to predict token t+1 from (token t's embedding, hidden t) — CE on
    shifted targets + hidden-state regression, the EAGLE recipe
    (reference: eagle training loss in plugins/hf_eagle.py)."""
    import optax

    module: EagleModel = bundle.module

    def loss_fn(eagle_params, frozen_params, batch):
        params = {**frozen_params, "eagle": eagle_params}
        variables = {**bundle.variables, "params": params}
        with bundle.contexts():
            logits, _, hidden = module.apply(variables, batch, output_hidden=True)
            draft_logits, draft_h = module.apply(
                variables, batch, hidden, method=EagleModel.draft
            )
        # draft at position t predicts token t+1 (same target as base shift)
        ce = lm_cross_entropy(draft_logits[:, :-1], batch[:, 1:])
        # hidden regression: draft hidden t ~ base hidden t+1
        hr = jnp.mean(
            (draft_h[:, :-1].astype(jnp.float32) - jax.lax.stop_gradient(
                hidden[:, 1:].astype(jnp.float32)
            )) ** 2
        )
        return ce + 0.1 * hr

    def init_state():
        eagle_params = bundle.variables["params"]["eagle"]
        return eagle_params, tx.init(eagle_params)

    @jax.jit
    def step(state, batch):
        eagle_params, opt_state = state
        frozen = {k: v for k, v in bundle.variables["params"].items() if k != "eagle"}
        loss, grads = jax.value_and_grad(loss_fn)(eagle_params, frozen, batch)
        updates, opt_state = tx.update(grads, opt_state, eagle_params)
        import optax as _o

        eagle_params = _o.apply_updates(eagle_params, updates)
        return (eagle_params, opt_state), loss

    return init_state, step
