"""Sparsify API + modes (reference: modelopt/torch/sparsity/weight_sparsity/
sparsification.py:32 sparsify, mode.py sparse_magnitude/sparsegpt/export).

Masks live in the ``'sparse'`` variable collection under each dense path;
QuantDense multiplies them onto the kernel before (optional) quantization —
the same ordering as the reference's dynamic weight attribute
(module.py:32). ``export_sparse`` folds masks into the weights.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor, ModeRegistry
from ..core.tree import flatten_with_paths, get_in, set_in
from .magnitude import create_nm_mask

SparsityModeRegistry = ModeRegistry("sparsity")

_DEFAULT_EXCLUDE = ("lm_head", "embed", "router")


def _eligible_kernels(bundle: ModelBundle, m: int):
    for path, leaf in flatten_with_paths(bundle.variables.get("params", {})):
        if not path.endswith("/kernel") or leaf.ndim != 2:
            continue
        if any(x in path for x in _DEFAULT_EXCLUDE):
            continue
        if leaf.shape[0] % m != 0:
            continue
        yield path, leaf


def _set_mask(variables, dense_path: str, mask):
    return {
        **variables,
        "sparse": set_in(
            variables.get("sparse", {}),
            tuple(dense_path.split("/")) + ("mask",),
            mask,
        ),
    }


@SparsityModeRegistry.register
class SparseMagnitudeMode(ModeDescriptor):
    name = "sparse_magnitude"

    def convert(self, bundle, config):
        config = config or {}
        n, m = config.get("n", 2), config.get("m", 4)
        variables = bundle.variables
        for path, w in _eligible_kernels(bundle, m):
            dense_path = path.rsplit("/kernel", 1)[0]
            variables = _set_mask(variables, dense_path, create_nm_mask(w, n, m))
        return bundle.replace(variables=variables), {}

    def config_from_dict(self, d):
        return d or {}

    def config_to_dict(self, c):
        return c or {}


@SparsityModeRegistry.register
class SparseGPTMode(ModeDescriptor):
    """Hessian-aware 2:4: per-m-group mask by the OBS saliency
    w^2 / diag(H^-1)^2, with GPTQ-style error compensation of the pruned
    weights onto surviving rows (reference: weight_sparsity/sparsegpt.py:46-144).
    Requires calibration data via ``config['forward_loop']`` on a quantized
    or plain bundle."""

    name = "sparsegpt"

    def convert(self, bundle, config):
        config = dict(config or {})
        forward_loop = config.pop("forward_loop", None)
        n, m = config.get("n", 2), config.get("m", 4)
        damp = config.get("damp", 0.01)

        from ..quant.algorithms.capture import capture_inputs

        # capture works without a quantize mode only if quantizers resolve;
        # fall back to magnitude masks when no data is available
        captured = {}
        if forward_loop is not None or bundle.example_inputs:
            try:
                captured = capture_inputs(bundle, forward_loop, max_tokens=4096)
            except Exception:
                captured = {}

        variables = bundle.variables
        for path, w in _eligible_kernels(bundle, m):
            dense_path = path.rsplit("/kernel", 1)[0]
            x = captured.get(dense_path)
            if x is None:
                mask = create_nm_mask(w, n, m)
                variables = _set_mask(variables, dense_path, mask)
                continue
            new_w, mask = _sparsegpt_layer(
                x.astype(jnp.float32), w.astype(jnp.float32), n, m, damp
            )
            variables = {
                **variables,
                "params": set_in(
                    variables["params"], tuple(path.split("/")), new_w.astype(w.dtype)
                ),
            }
            variables = _set_mask(variables, dense_path, mask)
        return bundle.replace(variables=variables), {}

    def config_from_dict(self, d):
        return {k: v for k, v in (d or {}).items() if k != "forward_loop"}

    def config_to_dict(self, c):
        return {k: v for k, v in (c or {}).items() if k != "forward_loop"}


def _sparsegpt_layer(x, w, n, m, damp):
    """OBS mask + compensation, scanning rows like GPTQ."""
    K, N = w.shape
    H = x.T @ x
    H = H + damp * (jnp.trace(H) / K + 1e-6) * jnp.eye(K, dtype=H.dtype)
    hinv = jnp.linalg.inv(H)
    d = jnp.clip(jnp.diag(hinv), 1e-12, None)
    # saliency per element: w^2 / diag(Hinv)^2 — keep top-n of each m-group
    score = (w**2) / (d**2)[:, None]
    groups = score.reshape(K // m, m, N)
    order = jnp.argsort(groups, axis=1)
    ranks = jnp.argsort(order, axis=1)
    mask = (ranks >= (m - n)).reshape(K, N)

    def body(carry, i):
        W = carry
        w_i = W[i] * mask[i]  # pruned row
        err = (W[i] - w_i) / jnp.maximum(hinv[i, i], 1e-12)
        later = (jnp.arange(K) > i).astype(W.dtype)
        W = W - (hinv[:, i] * later)[:, None] * err[None, :]
        W = W.at[i].set(w_i)
        return W, None

    W, _ = jax.lax.scan(body, w, jnp.arange(K))
    return W, mask


def sparsify(bundle: ModelBundle, mode: str = "sparse_magnitude", config=None) -> ModelBundle:
    """(reference: sparsification.py:32 mts.sparsify)"""
    return apply_mode(bundle, mode, config or {})


def export_sparse(bundle: ModelBundle) -> ModelBundle:
    """Fold masks into kernels and drop the sparse collection
    (reference: weight_sparsity/mode.py:71 export)."""
    variables = bundle.variables
    sparse = variables.get("sparse", {})
    for path, mask in flatten_with_paths(sparse):
        if not path.endswith("/mask"):
            continue
        kpath = tuple(path.rsplit("/mask", 1)[0].split("/")) + ("kernel",)
        w = get_in(variables["params"], kpath)
        if w is None:
            continue
        variables = {
            **variables,
            "params": set_in(variables["params"], kpath, w * mask.astype(w.dtype)),
        }
    variables = {k: v for k, v in variables.items() if k != "sparse"}
    records = tuple(r for r in bundle.records if r.mode not in ("sparse_magnitude", "sparsegpt"))
    return bundle.replace(variables=variables, records=records)
