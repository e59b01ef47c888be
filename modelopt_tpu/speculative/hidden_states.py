"""Offline hidden-state capture + streaming for draft-model training.

The reference trains EAGLE drafts against hidden states captured from a
serving cluster and streamed over RDMA
(reference: modelopt/torch/speculative/plugins/hf_streaming_dataset.py —
EagleFetchPayload = (token_ids [seq], hidden_states [seq, n_layers, H],
loss_mask [seq])). On TPU the idiomatic equivalent is an OFFLINE store:
one jitted, batched base-model pass captures the draft features (final
hidden, plus EAGLE-3 taps when configured) and persists them as numpy
shards; training then streams shards from disk with no base forward in
the loop — the expensive model runs exactly once per corpus.

Payload schema per shard (mirrors EagleFetchPayload, batched):
  token_ids  int32  [N, T]
  features   float16 [N, T, F]   (F = module.feature_width())
  loss_mask  int32  [N, T]
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def capture_hidden_states(bundle, token_batches: Iterable, out_dir: str,
                          loss_masks: Optional[Iterable] = None) -> int:
    """Run the bundle's base forward over ``token_batches`` ([B, T] int32
    each) and write one ``shard_{i:05d}.npz`` per batch into ``out_dir``.
    Returns the number of shards written.

    Works for any bundle whose apply supports ``output_hidden`` (Decoder,
    EagleModel, MedusaModel) — for EAGLE-3 bundles the captured features
    include the configured mid-layer taps (cfg.hidden_taps), exactly what
    the draft consumes."""
    os.makedirs(out_dir, exist_ok=True)
    fn = bundle.make_fn()

    @jax.jit
    def forward(variables, ids):
        _, _, hidden = fn(variables, ids, None, output_hidden=True)
        return hidden

    masks = iter(loss_masks) if loss_masks is not None else None
    n = 0
    for batch in token_batches:
        ids = jnp.asarray(batch, jnp.int32)
        feats = forward(bundle.variables, ids)
        mask = (np.asarray(next(masks), np.int32) if masks is not None
                else np.ones(ids.shape, np.int32))
        np.savez(
            os.path.join(out_dir, f"shard_{n:05d}.npz"),
            token_ids=np.asarray(ids, np.int32),
            features=np.asarray(feats, np.float16),
            loss_mask=mask,
        )
        n += 1
    return n


class HiddenStateDataset:
    """Streams captured shards from disk; yields
    (token_ids [B,T] int32, features [B,T,F] f32, loss_mask [B,T] f32).

    Shards load lazily one at a time (an 8B corpus of features does not fit
    host memory, and the TPU relay makes big host arrays expensive —
    features go to device per-batch)."""

    def __init__(self, shard_dir: str):
        self.paths = sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no shards under {shard_dir}")

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[tuple]:
        for p in self.paths:
            with np.load(p) as z:
                yield (
                    jnp.asarray(z["token_ids"], jnp.int32),
                    jnp.asarray(z["features"], jnp.float32),
                    jnp.asarray(z["loss_mask"], jnp.float32),
                )

    def epochs(self, n: int) -> Iterator[tuple]:
        for _ in range(n):
            yield from self


def make_offline_eagle_train_step(bundle, tx):
    """Draft training against PRE-CAPTURED features: no base forward in the
    loop (reference: the streaming-dataset training path in
    plugins/hf_eagle.py — base hidden states arrive with the batch).

    Returns (init_state, step) where
    ``step(state, (tokens, features, loss_mask)) -> (state, loss)``.
    Loss = masked CE of draft logits against next tokens + hidden-state
    regression to the base's final hidden (last H slice of features)."""
    import optax

    from ..utils.evaluate import lm_cross_entropy
    from .eagle import EagleModel

    module: EagleModel = bundle.module
    H = module.cfg.hidden_size

    def loss_fn(draft_params, batch):
        tokens, features, mask = batch
        params = {**bundle.variables["params"], **draft_params}
        variables = {**bundle.variables, "params": params}
        with bundle.contexts():
            draft_logits, draft_h = module.apply(
                variables, tokens, features, method=EagleModel.draft
            )
        m = mask[:, 1:]
        ce = lm_cross_entropy(draft_logits[:, :-1], tokens[:, 1:], mask=m)
        target = features[..., -H:]
        sq = jnp.sum(
            (draft_h[:, :-1].astype(jnp.float32)
             - target[:, 1:].astype(jnp.float32)) ** 2, axis=-1
        )
        hr = jnp.sum(sq * m) / (jnp.sum(m) * H + 1e-6)
        return ce + 0.1 * hr

    def _draft_params(params):
        return {k: v for k, v in params.items() if k != "base"}

    def init_state():
        draft_params = _draft_params(bundle.variables["params"])
        return draft_params, tx.init(draft_params)

    @jax.jit
    def step(state, batch):
        draft_params, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(draft_params, batch)
        updates, opt_state = tx.update(grads, opt_state, draft_params)
        import optax as _o

        draft_params = _o.apply_updates(draft_params, updates)
        return (draft_params, opt_state), loss

    return init_state, step
