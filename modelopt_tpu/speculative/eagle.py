"""EAGLE-style speculative decoding: a one-block draft transformer predicts
the base model's next hidden state from [embedding(token); features], sharing
the base LM head (reference: modelopt/torch/speculative/eagle/eagle_model.py:21,
plugins/hf_eagle.py — re-architected as a wrapper module instead of in-place
model mutation).

EAGLE-1: features = the base's final-norm hidden state.
EAGLE-3 (``feature_layers``): features = concat of tapped mid-layer hidden
states + the final hidden ("low/mid/high" taps, reference hf_eagle.py
EAGLE-3 feature collection); a fuse projection maps them to model width
once, and the draft autoregression then runs on its OWN hidden states for
unverified steps (no feature-prediction constraint).
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
    # EAGLE-3 style multi-layer taps: indices of base layers whose hidden
    # states are concatenated with the final hidden as draft features
    # (None = EAGLE-1, final hidden only)
    feature_layers: Optional[tuple] = None
    # reduced DRAFT vocabulary (reference: hf_eagle.py d2t buffer +
    # utils.py:43 calibrate_frequent_vocab): the draft head scores only
    # the ``draft_vocab_size`` most frequent tokens and a d2t offset
    # buffer maps draft indices back to target ids. None = full vocab
    # (shared base lm_head).
    draft_vocab_size: Optional[int] = None

    def __post_init__(self):
        if isinstance(self.feature_layers, list):
            self.feature_layers = tuple(self.feature_layers)

    def to_dict(self):
        d = dataclasses.asdict(self)
        if d["feature_layers"] is not None:
            d["feature_layers"] = list(d["feature_layers"])
        return d


class EagleHead(nn.Module):
    """fuse([emb; g]) -> draft decoder block(s) -> draft hidden (g is the
    model-width draft state: fused base features or prior draft hidden).
    ``mask`` overrides the causal default — the TTT trainer passes the
    multi-step block mask (see make_eagle_train_step)."""

    cfg: DecoderConfig
    num_layers: int = 1

    @nn.compact
    def __call__(self, emb, g, positions, mask=None):
        cfg = self.cfg
        x = QuantDense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="fc")(
            jnp.concatenate([emb, g.astype(emb.dtype)], axis=-1)
        )
        B, T = positions.shape
        if mask is None:
            k_pos = positions[:, None, :]
            mask = jnp.where(k_pos <= positions[:, :, None], 0.0,
                             -1e9).astype(jnp.float32)
        elif mask.ndim == 2:
            mask = jnp.broadcast_to(mask[None], (B, T, T))
        for i in range(self.num_layers):
            x, _ = Block(cfg, name=f"layers_{i}")(x, positions, mask, None)
        return RMSNorm(epsilon=cfg.norm_eps, dtype=cfg.dtype, name="norm")(x)


class EagleModel(nn.Module):
    """Base decoder + EAGLE draft head. Methods:
      __call__       — base forward (logits, cache[, features])
      fuse_features  — base features [B,T,F] -> draft state g [B,T,H]
      draft_fused    — draft logits from (tokens, g sequence)
      draft          — convenience: fuse + draft_fused
    """

    cfg: DecoderConfig
    eagle_cfg: EagleConfig = dataclasses.field(default_factory=EagleConfig)

    def setup(self):
        base_cfg = self.cfg
        if self.eagle_cfg.feature_layers is not None:
            base_cfg = dataclasses.replace(
                self.cfg, hidden_taps=tuple(self.eagle_cfg.feature_layers)
            )
        self.base = Decoder(base_cfg)
        self.eagle = EagleHead(self.cfg, self.eagle_cfg.num_draft_layers)
        if self.eagle_cfg.feature_layers is not None:
            self.fuse = QuantDense(
                self.cfg.hidden_size, use_bias=False, dtype=self.cfg.dtype,
                param_dtype=self.cfg.param_dtype, name="fuse",
            )
        vd = self.eagle_cfg.draft_vocab_size
        if vd is not None and vd < self.cfg.vocab_size:
            # reduced draft vocab: own head + d2t offset buffer
            # (d2t[i] = target_id - i, the reference's convention)
            self.draft_head = QuantDense(
                vd, use_bias=False, dtype=self.cfg.dtype,
                param_dtype=self.cfg.param_dtype, name="draft_head",
            )
            self.d2t = self.variable(
                "buffers", "d2t", lambda: jnp.zeros((vd,), jnp.int32))

    @property
    def reduced_vocab(self) -> bool:
        vd = self.eagle_cfg.draft_vocab_size
        return vd is not None and vd < self.cfg.vocab_size

    def feature_width(self) -> int:
        taps = self.eagle_cfg.feature_layers
        return self.cfg.hidden_size * (1 + (len(taps) if taps else 0))

    def __call__(self, input_ids, cache=None, positions=None, output_hidden=False,
                 logits_index=None):
        return self.base(input_ids, cache, positions,
                         output_hidden=output_hidden, logits_index=logits_index)

    def init_all(self, input_ids):
        """Init helper touching both base and draft params."""
        logits, _, hidden = self(input_ids, output_hidden=True)
        self.draft(input_ids, hidden)
        return logits

    def fuse_features(self, features):
        """[B, T, F] base features -> [B, T, H] draft state. Identity for
        EAGLE-1 (F == H); learned projection for EAGLE-3 taps."""
        if self.eagle_cfg.feature_layers is None:
            return features
        return self.fuse(features)

    def draft_fused(self, input_ids, g, positions=None, mask=None,
                    full_vocab: bool = True):
        """Draft next-token logits from an H-wide draft-state sequence
        (fused base features at verified steps, the draft's own hidden at
        unverified steps). With a reduced draft vocab the logits come back
        in TARGET-id space (-inf outside the draft support) unless
        ``full_vocab=False`` (the trainer's draft-space view)."""
        B, T = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        emb = self._embed(input_ids)
        h = self.eagle(emb, g, positions, mask)
        return self._lm_head(h, full_vocab=full_vocab), h

    def draft(self, input_ids, features, positions=None):
        """Draft next-token logits for each position: token t's embedding is
        fused with the base features at t (which encode up to t)."""
        return self.draft_fused(input_ids, self.fuse_features(features), positions)

    def _embed(self, ids):
        # reuse the base embedding table
        emb = self.base.get_variable("params", "embed_tokens")["embedding"]
        return jnp.take(emb, ids, axis=0).astype(self.cfg.dtype)

    def _lm_head(self, x, full_vocab: bool = True):
        if self.reduced_vocab:
            dl = self.draft_head(x)  # [..., Vd] draft-vocab logits
            if not full_vocab:
                return dl
            # scatter into target-id space (-inf elsewhere): every
            # downstream consumer — greedy argmax, tree top_k, even the
            # rejection-sampling q (support a subset of p) — works
            # unchanged on the full-vocab view
            vd = dl.shape[-1]
            tgt = jnp.arange(vd, dtype=jnp.int32) + self.d2t.value
            out = jnp.full((*dl.shape[:-1], self.cfg.vocab_size), -1e9,
                           dl.dtype)
            return out.at[..., tgt].set(dl)
        if self.cfg.tie_word_embeddings:
            emb = self.base.get_variable("params", "embed_tokens")["embedding"]
            return jnp.dot(x, emb.T.astype(x.dtype))
        k = self.base.get_variable("params", "lm_head")["kernel"]
        return jnp.dot(x, k.astype(x.dtype))


def _ttt_mask(s: int, T: int) -> jnp.ndarray:
    """Additive [(s+1)T, (s+1)T] mask for TTT step ``s`` over the
    CONCATENATED per-step draft sequences (block j = the draft's step-j
    inputs). Implements the reference rule
    (plugins/hf_eagle.py:551 _compute_ttt_attention_mask /
    speculative/utils.py:539 get_ttt_msk_func): a step-j query at token t
    attends step-0 keys up to t - j plus ONE diagonal key per intermediate
    step i at token t - (j - i) — exactly the keys its inference-time
    autoregression would have."""
    import numpy as np

    n = (s + 1) * T
    q = np.arange(n)[:, None]
    kv = np.arange(n)[None, :]
    jq, tq = q // T, q % T
    ik, tk = kv // T, kv % T
    ok = (ik == 0) & (tk <= tq - jq)
    ok |= (ik >= 1) & (ik <= jq) & (tk == tq - (jq - ik))
    return jnp.asarray(np.where(ok, 0.0, -1e9), jnp.float32)


def make_eagle_train_step(bundle, tx, ttt_steps: int = 1,
                          ttt_decay: float = 0.9):
    """Draft-head training: frozen base produces hidden states; the draft
    learns to predict token t+1 from (token t's embedding, features t) — CE
    on shifted targets + hidden-state regression, the EAGLE recipe
    (reference: eagle training loss in plugins/hf_eagle.py).

    ``ttt_steps > 1`` adds training-time-test steps (reference
    hf_eagle.py:766 TTT loop): step s feeds the draft its OWN step-(s-1)
    hidden states (rolled right one token) under the multi-step attention
    mask, and its CE targets shift by 1+s with ``ttt_decay**s`` weighting —
    the self-conditioning regime the draft actually faces at inference
    depth s."""
    import optax

    module: EagleModel = bundle.module
    H = module.cfg.hidden_size
    V = module.cfg.vocab_size
    vd = module.eagle_cfg.draft_vocab_size
    reduced = vd is not None and vd < V
    if reduced:
        # target->draft lookup built from the calibrated d2t offsets
        # (calibrate_draft_vocab); targets outside the draft vocabulary
        # are MASKED out of the CE (the reference's convention)
        d2t = bundle.variables["buffers"]["d2t"]
        t2d = jnp.full((V,), -1, jnp.int32).at[
            jnp.arange(vd, dtype=jnp.int32) + d2t
        ].set(jnp.arange(vd, dtype=jnp.int32))

    def draft_ce(dls, labels):
        """CE of draft logits vs TARGET-id labels (draft-space mapping +
        out-of-vocab masking when the draft vocab is reduced)."""
        import optax

        if not reduced:
            return lm_cross_entropy(dls, labels)
        ld = t2d[labels]
        valid = (ld >= 0).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            dls, jnp.maximum(ld, 0))
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def loss_fn(draft_params, frozen_params, batch):
        params = {**frozen_params, **draft_params}
        variables = {**bundle.variables, "params": params}
        B, T = batch.shape
        with bundle.contexts():
            logits, _, features = module.apply(variables, batch, output_hidden=True)
            g0 = module.apply(variables, features,
                              method=EagleModel.fuse_features)
        positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        total = 0.0
        gs = [g0]
        h_prev = None
        for s in range(ttt_steps):
            if s > 0:
                # step-s input state = previous step's hidden, rolled right
                # (draft hidden of token t pairs with token t+1's embedding)
                gs.append(jnp.concatenate(
                    [jnp.zeros_like(h_prev[:, :1]), h_prev[:, :-1]], axis=1))
            ids_cat = jnp.concatenate([batch] * (s + 1), axis=1)
            g_cat = jnp.concatenate(gs, axis=1)
            pos_cat = jnp.concatenate([positions] * (s + 1), axis=1)
            with bundle.contexts():
                dl, dh = module.apply(
                    variables, ids_cat, g_cat, pos_cat, _ttt_mask(s, T),
                    False, method=EagleModel.draft_fused)
            dls, dhs = dl[:, s * T:], dh[:, s * T:]
            h_prev = dhs
            if T > s + 1:
                # step-s logits at position p predict token p+1; the first
                # s positions ride zero-padded rolled state — masked out
                ce = draft_ce(dls[:, s:-1], batch[:, 1 + s:])
                total = total + (ttt_decay ** s) * ce
            if s == 0:
                # hidden regression: draft hidden t ~ base FINAL hidden t+1
                # (the last H slice of the feature vector under EAGLE-3 taps)
                target = features[..., -H:]
                hr = jnp.mean(
                    (dhs[:, :-1].astype(jnp.float32) - jax.lax.stop_gradient(
                        target[:, 1:].astype(jnp.float32))) ** 2)
                total = total + 0.1 * hr
        return total

    def _draft_params(params):
        return {k: v for k, v in params.items() if k != "base"}

    def init_state():
        draft_params = _draft_params(bundle.variables["params"])
        return draft_params, tx.init(draft_params)

    @jax.jit
    def step(state, batch):
        draft_params, opt_state = state
        frozen = {"base": bundle.variables["params"]["base"]}
        loss, grads = jax.value_and_grad(loss_fn)(draft_params, frozen, batch)
        updates, opt_state = tx.update(grads, opt_state, draft_params)
        import optax as _o

        draft_params = _o.apply_updates(draft_params, updates)
        return (draft_params, opt_state), loss

    return init_state, step


def calibrate_draft_vocab(bundle, token_batches):
    """Build the d2t draft->target offset buffer from calibration token
    frequencies (reference: speculative/utils.py:43
    calibrate_frequent_vocab): draft index i maps to the i-th most common
    token, stored as the offset ``d2t[i] = target_id - i``. Returns the
    bundle with ``variables['buffers']['d2t']`` set."""
    import numpy as np

    module: EagleModel = bundle.module
    vd = module.eagle_cfg.draft_vocab_size
    V = module.cfg.vocab_size
    if vd is None or vd >= V:
        return bundle
    counts = np.zeros(V, np.int64)
    for b in token_batches:
        counts += np.bincount(np.asarray(b).ravel(), minlength=V)
    if int((counts > 0).sum()) < vd:
        import warnings

        warnings.warn(
            f"calibration data covers only {(counts > 0).sum()} distinct "
            f"tokens < draft_vocab_size={vd}; the tail of the draft vocab "
            "is arbitrary — use more calibration data")
    order = np.argsort(-counts, kind="stable")[:vd]
    d2t = (order - np.arange(vd)).astype(np.int32)
    buffers = {**bundle.variables.get("buffers", {}),
               "d2t": jnp.asarray(d2t)}
    return bundle.replace(
        variables={**bundle.variables, "buffers": buffers})
