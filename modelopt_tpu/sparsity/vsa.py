"""Video Sparse Attention (VSA) — two-branch block-sparse attention for
video/image diffusion transformers.

TPU recast of the reference's VSA method (reference: modelopt/torch/
sparsity/attention_sparsity/methods/vsa.py, vsa_utils.py — token tiling into
3-D video blocks, a coarse "compression" branch over tile means, and a fine
"sparse" branch restricted to the top-K tiles ranked by the coarse attention,
combined as ``out = out_compression * gate + out_sparse``).

The reference dispatches to a Triton kernel (fastvideo_kernel) that decides
block survival inside the kernel. On TPU the selection moves OUTSIDE the
matmuls, where XLA can exploit it with static shapes:

  1. tile/untile are trace-time-constant gathers (numpy index maps cached
     per (video_shape, block_size_3d) — the reference's ``@lru_cache`` on
     vsa_utils becomes a Python-level cache of static index arrays);
  2. the compression branch is a dense tiles x tiles attention over
     mean-pooled tiles (nt^2 work, negligible);
  3. the sparse branch GATHERS the top-K KV tiles per query tile into a
     [..., topk*E, D] operand and runs exact attention against only those —
     an honest topk/nt FLOP reduction with static shapes (XLA batched
     gather), no data-dependent control flow inside jit.

Images are videos with T=1: DiT wires this in with video_shape
(1, H/P, W/P) — see models/dit.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VSAConfig:
    """Static VSA parameters (hashable — lives inside model configs).

    block_size_3d: tile dims (t, h, w) — the reference's default (4, 4, 4).
    top_k_ratio: fraction of KV tiles each query tile attends to finely.
    gate_init: initial value of the learned compression gate (the reference
      reads a ``gate_compress`` parameter from the model layer; models built
      here initialize it to this constant).
    """

    block_size_3d: Tuple[int, int, int] = (4, 4, 4)
    top_k_ratio: float = 0.5
    gate_init: float = 0.5

    def __post_init__(self):
        t, h, w = self.block_size_3d
        if min(t, h, w) <= 0:
            raise ValueError(f"block_size_3d must be positive, got {self.block_size_3d}")
        if not 0.0 < self.top_k_ratio <= 1.0:
            raise ValueError(f"top_k_ratio must be in (0, 1], got {self.top_k_ratio}")


@functools.lru_cache(maxsize=32)
def tile_metadata(video_shape: Tuple[int, int, int],
                  block_size_3d: Tuple[int, int, int]):
    """Static tile partition maps for a (T, H, W) token grid.

    Returns (tile_indices, reverse_indices, sizes, valid):
      tile_indices  int32 [nt * E] — padded-tile-order -> original token id
                    (padding slots point at token 0; mask with ``valid``)
      reverse_indices int32 [S]    — original order -> padded-tile slot
      sizes         int32 [nt]     — valid tokens per tile (ragged edges)
      valid         bool  [nt, E]  — which padded slots hold real tokens

    The reference computes the same maps on torch tensors per forward
    (vsa_utils.get_tile_partition_indices et al., lru-cached); here they are
    numpy constants baked into the jitted program.
    """
    T, H, W = video_shape
    bt, bh, bw = block_size_3d
    nt_t, nt_h, nt_w = -(-T // bt), -(-H // bh), -(-W // bw)
    E = bt * bh * bw
    nt = nt_t * nt_h * nt_w

    tok = np.arange(T * H * W).reshape(T, H, W)
    # pad the grid to whole tiles with -1 sentinels, then carve into tiles
    padded = np.full((nt_t * bt, nt_h * bh, nt_w * bw), -1, dtype=np.int64)
    padded[:T, :H, :W] = tok
    tiles = (padded.reshape(nt_t, bt, nt_h, bh, nt_w, bw)
             .transpose(0, 2, 4, 1, 3, 5).reshape(nt, E))
    valid = tiles >= 0
    sizes = valid.sum(axis=1).astype(np.int32)
    tile_indices = np.where(valid, tiles, 0).astype(np.int32).reshape(-1)
    reverse = np.empty(T * H * W, dtype=np.int32)
    reverse[tiles[valid]] = np.nonzero(valid.reshape(-1))[0]
    return (jnp.asarray(tile_indices), jnp.asarray(reverse),
            jnp.asarray(sizes), jnp.asarray(valid))


def video_sparse_attention(q, k, v, *, video_shape: Tuple[int, int, int],
                           config: VSAConfig = VSAConfig(),
                           gate_compress: Optional[jax.Array] = None):
    """Two-branch VSA over [B, S, H, D] tensors (S = T*H*W tokens).

    out = compression_branch * gate + sparse_branch, where the compression
    branch is attention over tile means (broadcast back to tokens) and the
    sparse branch is exact attention restricted to each query tile's top-K
    KV tiles under the coarse attention scores. ``gate_compress`` is the
    per-token learned gate [B, S, H, D] (0.5 when absent, matching the
    reference's default). With top_k_ratio == 1 and gate 0 this reduces to
    exact dense attention (pinned by tests/unit/sparsity/test_vsa.py).
    """
    B, S, NH, D = q.shape
    T, Hh, Ww = video_shape
    if S != T * Hh * Ww:
        raise ValueError(f"seq len {S} != video_shape product {T * Hh * Ww}")
    tile_idx, reverse_idx, sizes, valid = tile_metadata(
        tuple(video_shape), tuple(config.block_size_3d))
    nt = sizes.shape[0]
    E = valid.shape[1]
    top_k = max(1, int(config.top_k_ratio * nt))
    scale = 1.0 / float(np.sqrt(D))
    f32 = jnp.float32

    def tile(x):  # [B, S, H, D] -> [B, NH, nt, E, D]
        xt = jnp.take(x, tile_idx, axis=1).reshape(B, nt, E, NH, D)
        return xt.transpose(0, 3, 1, 2, 4)

    q_t, k_t, v_t = tile(q), tile(k), tile(v)
    vmask = valid[None, None]                          # [1, 1, nt, E]
    inv_sizes = (1.0 / sizes.astype(f32))[None, None, :, None]

    # ---- compression branch: attention over tile means --------------------
    def mean_t(x):
        return (jnp.sum(x.astype(f32) * vmask[..., None], axis=3) * inv_sizes)

    q_m, k_m, v_m = mean_t(q_t), mean_t(k_t), mean_t(v_t)   # [B, NH, nt, D]
    coarse = jnp.einsum("bhqd,bhkd->bhqk", q_m, k_m) * scale
    probs_c = jax.nn.softmax(coarse, axis=-1)               # [B, NH, nt, nt]
    out_c = jnp.einsum("bhqk,bhkd->bhqd", probs_c, v_m)     # per-tile output

    # ---- sparse branch: exact attention on top-K tiles per query tile -----
    _, sel = jax.lax.top_k(probs_c, top_k)                  # [B, NH, nt, K]
    k_sel = jnp.take_along_axis(
        k_t[:, :, None], sel[..., None, None], axis=3)      # [B,NH,nt,K,E,D]
    v_sel = jnp.take_along_axis(v_t[:, :, None], sel[..., None, None], axis=3)
    m_sel = valid[sel]                                      # [B,NH,nt,K,E]

    scores = jnp.einsum("bhqed,bhqkfd->bhqekf", q_t.astype(f32),
                        k_sel.astype(f32)) * scale          # [B,NH,nt,E,K,E]
    scores = jnp.where(m_sel[:, :, :, None], scores, -jnp.inf)
    flat = scores.reshape(B, NH, nt, E, top_k * E)
    probs_s = jax.nn.softmax(flat, axis=-1).reshape(scores.shape)
    out_s = jnp.einsum("bhqekf,bhqkfd->bhqed", probs_s, v_sel.astype(f32))

    # ---- combine + untile -------------------------------------------------
    if gate_compress is None:
        gate_t = jnp.float32(config.gate_init)
    else:
        gate_t = tile(gate_compress).astype(f32)            # [B,NH,nt,E,D]
    out_t = out_c[:, :, :, None] * gate_t + out_s           # [B,NH,nt,E,D]
    out_flat = out_t.transpose(0, 2, 3, 1, 4).reshape(B, nt * E, NH, D)
    out = jnp.take(out_flat, reverse_idx, axis=1)
    return out.astype(q.dtype)


def vsa_stats(video_shape, config: VSAConfig) -> dict:
    """Sparsity accounting for logs/summaries (reference: VSA._last_stats)."""
    _, _, sizes, _ = tile_metadata(tuple(video_shape),
                                   tuple(config.block_size_3d))
    nt = int(sizes.shape[0])
    top_k = max(1, int(config.top_k_ratio * nt))
    return {
        "total_blocks": nt,
        "top_k": top_k,
        "sparse_blocks": nt - top_k,
        "sparsity": 1.0 - top_k / nt,
        "video_shape": tuple(video_shape),
    }
