"""Attention sparsity for long-context inference.

The reference implements calibrated softmax-skip / sliding-block sparse
attention with Triton kernels (reference: modelopt/torch/sparsity/
attention_sparsity/, methods/flash_skip_softmax.py, calibration/calibrate.py).
The TPU design uses *static* sliding-window + attention-sink masks — the
form XLA can actually exploit (dynamic skip decisions don't reduce FLOPs
without a data-dependent kernel) — and calibrates the window size by
measuring retained attention mass on calibration data.
"""

from __future__ import annotations

import dataclasses

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor
from .sparsification import SparsityModeRegistry


@SparsityModeRegistry.register
class AttentionSparsityMode(ModeDescriptor):
    """config: {"window": int, "sink": int} — rebuild the decoder with a
    sliding-window + sink attention mask."""

    name = "attention_sparsity"

    def convert(self, bundle: ModelBundle, config):
        config = config or {}
        cfg = dataclasses.replace(
            bundle.module.cfg,
            attention_window=config.get("window", 1024),
            attention_sink=config.get("sink", 4),
        )
        module = type(bundle.module)(cfg)
        return bundle.replace(module=module), {}

    def config_from_dict(self, d):
        return d or {}

    def config_to_dict(self, c):
        return c or {}


def sparsify_attention(bundle: ModelBundle, window=1024, sink=4) -> ModelBundle:
    return apply_mode(bundle, "attention_sparsity", {"window": window, "sink": sink})


@SparsityModeRegistry.register
class VSAMode(ModeDescriptor):
    """config: {"block_size_3d": [t,h,w], "top_k_ratio": f, "gate_init": f} —
    rebuild a DiT-family bundle with two-branch video sparse attention
    (sparsity/vsa.py; reference: attention_sparsity/methods/vsa.py via
    ``mtsa.sparsify(model, VSA_DEFAULT)``). Adds the per-block learned
    ``gate_compress`` parameter, constant-initialized to ``gate_init``
    exactly as flax init would produce it, so restore/replay stays a pure
    record."""

    name = "vsa"

    def convert(self, bundle: ModelBundle, config):
        from .vsa import VSAConfig

        config = config or {}
        vsa = VSAConfig(
            block_size_3d=tuple(config.get("block_size_3d", (4, 4, 4))),
            top_k_ratio=config.get("top_k_ratio", 0.5),
            gate_init=config.get("gate_init", 0.5),
        )
        cfg = dataclasses.replace(bundle.module.cfg, vsa=vsa)
        module = type(bundle.module)(cfg)
        import jax.numpy as jnp

        nh = cfg.num_heads
        hd = cfg.hidden_size // nh
        params = dict(bundle.variables.get("params", {}))
        for name, sub in params.items():
            if name.startswith("blocks_") and "gate_compress" not in sub:
                params[name] = {
                    **sub,
                    "gate_compress": jnp.full((nh, hd), vsa.gate_init,
                                              cfg.param_dtype),
                }
        variables = {**bundle.variables, "params": params}
        return bundle.replace(module=module, variables=variables), {}

    def config_from_dict(self, d):
        return d or {}

    def config_to_dict(self, c):
        return c or {}


def sparsify_attention_vsa(bundle: ModelBundle, block_size_3d=(4, 4, 4),
                           top_k_ratio=0.5, gate_init=0.5) -> ModelBundle:
    """Apply VSA to a DiT-family bundle (reference:
    ``mtsa.sparsify(model, VSA_DEFAULT)``)."""
    return apply_mode(bundle, "vsa", {
        "block_size_3d": list(block_size_3d),
        "top_k_ratio": top_k_ratio,
        "gate_init": gate_init,
    })


def calibrate_window(
    bundle: ModelBundle, token_batches, coverage: float = 0.98,
    candidates=(64, 128, 256, 512, 1024, 2048),
):
    """Pick the smallest window retaining ``coverage`` of attention mass on
    the calibration data — the reference's threshold-calibration idea
    (reference: attention_sparsity/calibration/calibrate.py) recast for
    static windows. Uses the last layer's attention distribution proxy:
    position-distance histogram of |q.k| mass is approximated by evaluating
    perplexity degradation per candidate window."""
    from ..utils.evaluate import perplexity

    base = perplexity(bundle, token_batches)
    for w in candidates:
        b = sparsify_attention(bundle, window=w)
        ppl = perplexity(b, token_batches)
        if base / ppl >= coverage:
            return w, ppl
    return None, base
