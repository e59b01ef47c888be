"""Medusa speculative decoding: K extra LM heads predict tokens t+1..t+K
from the last hidden state (reference: modelopt/torch/speculative/medusa/
medusa_model.py:32)."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.transformer import Decoder, DecoderConfig
from ..utils.evaluate import lm_cross_entropy


@dataclasses.dataclass
class MedusaConfig:
    medusa_num_heads: int = 3
    medusa_num_layers: int = 1  # residual MLP blocks per head

    def to_dict(self):
        return dataclasses.asdict(self)


class ResBlock(nn.Module):
    hidden: int
    dtype: object

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc")(x)
        return x + nn.silu(h)


class MedusaModel(nn.Module):
    cfg: DecoderConfig
    medusa_cfg: MedusaConfig = dataclasses.field(default_factory=MedusaConfig)

    def setup(self):
        self.base = Decoder(self.cfg)
        heads = []
        for k in range(self.medusa_cfg.medusa_num_heads):
            blocks = [
                ResBlock(self.cfg.hidden_size, self.cfg.dtype,
                         name=f"head_{k}_block_{j}")
                for j in range(self.medusa_cfg.medusa_num_layers)
            ]
            heads.append(blocks)
        self.head_blocks = heads
        self.head_outs = [
            nn.Dense(self.cfg.vocab_size, use_bias=False, dtype=self.cfg.dtype,
                     name=f"head_{k}_out")
            for k in range(self.medusa_cfg.medusa_num_heads)
        ]

    def __call__(self, input_ids, cache=None, positions=None, output_hidden=False,
                 logits_index=None):
        return self.base(input_ids, cache, positions,
                         output_hidden=output_hidden, logits_index=logits_index)

    def init_all(self, input_ids):
        """Init helper touching base and all medusa heads."""
        logits, _, hidden = self(input_ids, output_hidden=True)
        self.medusa_logits(hidden)
        return logits

    def medusa_logits(self, hidden):
        """[B, T, H] -> list of K head logits [B, T, V]."""
        outs = []
        for blocks, out in zip(self.head_blocks, self.head_outs):
            x = hidden
            for b in blocks:
                x = b(x)
            outs.append(out(x))
        return outs


def make_medusa_train_step(bundle, tx):
    """Train medusa heads (base frozen): head k predicts token t+1+k
    (reference: medusa training loss)."""
    import optax

    module: MedusaModel = bundle.module
    K = module.medusa_cfg.medusa_num_heads

    def loss_fn(head_params, frozen_params, batch):
        params = {**frozen_params, **head_params}
        variables = {**bundle.variables, "params": params}
        with bundle.contexts():
            _, _, hidden = module.apply(variables, batch, output_hidden=True)
            heads = module.apply(variables, jax.lax.stop_gradient(hidden),
                                 method=MedusaModel.medusa_logits)
        loss = 0.0
        for k, logits in enumerate(heads):
            shift = k + 1
            if batch.shape[1] <= shift:
                continue
            loss = loss + lm_cross_entropy(logits[:, :-shift], batch[:, shift:])
        return loss / K

    def split_params(params):
        head = {k: v for k, v in params.items() if k.startswith("head_")}
        frozen = {k: v for k, v in params.items() if not k.startswith("head_")}
        return head, frozen

    def init_state():
        head, _ = split_params(bundle.variables["params"])
        return head, tx.init(head)

    @jax.jit
    def step(state, batch):
        head, opt_state = state
        _, frozen = split_params(bundle.variables["params"])
        loss, grads = jax.value_and_grad(loss_fn)(head, frozen, batch)
        updates, opt_state = tx.update(grads, opt_state, head)
        import optax as _o

        head = _o.apply_updates(head, updates)
        return (head, opt_state), loss

    return init_state, step
