"""Draft-verify speculative decoding loop.

Greedy speculative decoding is LOSSLESS: the emitted tokens are identical to
plain greedy decoding of the base model — drafts only change how many base
forwards are needed. (reference consumes external engines for this,
examples/specdec_bench/; here it's built in.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bundle import ModelBundle
from .dflash import DFlashModel
from .eagle import EagleModel
from .medusa import MedusaModel


def speculative_decode(
    bundle: ModelBundle, prompt_tokens, max_new_tokens: int = 32, draft_len: int = 4
):
    """Greedy speculative decode. Returns (tokens, stats) where stats has
    'base_forwards' and 'acceptance_rate' (accepted draft tokens per
    proposed)."""
    module = bundle.module
    is_eagle = isinstance(module, EagleModel)
    is_medusa = isinstance(module, MedusaModel)
    is_dflash = isinstance(module, DFlashModel)
    if not (is_eagle or is_medusa or is_dflash):
        raise ValueError(
            "speculative_decode needs an eagle/medusa/dflash-converted bundle"
        )

    fwd = jax.jit(
        lambda v, ids: module.apply(v, ids, output_hidden=True)
    )
    if is_eagle:
        draft_fn = jax.jit(
            lambda v, ids, hidden: module.apply(v, ids, hidden, method=EagleModel.draft)
        )
    elif is_dflash:
        # one forward drafts the whole block (KV injection over the tapped
        # context features)
        block_fn = jax.jit(
            lambda v, tok, feats, pos: module.apply(
                v, tok, feats, pos, method=DFlashModel.draft_block
            )
        )
        draft_len = min(draft_len, module.dflash_cfg.block_size)
    else:
        heads_fn = jax.jit(
            lambda v, hidden: module.apply(v, hidden, method=MedusaModel.medusa_logits)
        )

    variables = bundle.variables
    toks = list(map(int, prompt_tokens))
    base_forwards = 0
    proposed = accepted = 0

    # initial forward over the prompt
    ids = jnp.asarray([toks], jnp.int32)
    logits, _, hidden = fwd(variables, ids)
    base_forwards += 1
    next_tok = int(jnp.argmax(logits[0, -1]))
    toks.append(next_tok)
    last_hidden = hidden[:, -1:]

    while len(toks) - len(prompt_tokens) < max_new_tokens:
        # --- draft K tokens -------------------------------------------
        draft = []
        if is_eagle:
            h = last_hidden
            cur = next_tok
            for _ in range(draft_len):
                dlog, h_new = draft_fn(variables, jnp.asarray([[cur]], jnp.int32), h)
                cur = int(jnp.argmax(dlog[0, -1]))
                draft.append(cur)
                h = h_new[:, -1:]
        elif is_dflash:
            # anchor = the newest verified token; ctx = tapped features of
            # everything before it (block position 0 predicts anchor+1)
            anchor = jnp.asarray([[next_tok]], jnp.int32)
            pos = jnp.asarray([len(toks) - 1], jnp.int32)
            blog = block_fn(variables, anchor, hidden, pos)  # [1, K, V]
            draft = [int(t) for t in np.asarray(jnp.argmax(blog[0], axis=-1))][:draft_len]
        else:
            heads = heads_fn(variables, last_hidden)
            for k in range(min(draft_len, len(heads))):
                draft.append(int(jnp.argmax(heads[k][0, -1])))

        # --- verify with ONE base forward over context + draft ---------
        ids = jnp.asarray([toks + draft], jnp.int32)
        logits, _, hidden = fwd(variables, ids)
        base_forwards += 1
        # base greedy prediction at each position of the window
        start = len(toks) - 1  # position of next_tok
        n_acc = 0
        emitted = []
        for j, d in enumerate(draft):
            pred = int(jnp.argmax(logits[0, start + j]))
            emitted.append(pred)
            if pred == d:
                n_acc += 1
            else:
                break
        else:
            # all drafts accepted: also take the bonus token
            emitted.append(int(jnp.argmax(logits[0, start + len(draft)])))
        proposed += len(draft)
        accepted += n_acc
        toks.extend(emitted[: n_acc + 1])
        next_tok = toks[-1]
        last_hidden = hidden[:, len(toks) - 2 : len(toks) - 1]

    new = toks[len(prompt_tokens):][: max_new_tokens]
    stats = {
        "base_forwards": base_forwards,
        "acceptance_rate": accepted / max(proposed, 1),
        "tokens_per_forward": len(new) / max(base_forwards, 1),
    }
    return new, stats
