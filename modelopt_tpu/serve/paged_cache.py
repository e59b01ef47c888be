"""Paged KV cache: device page pool + host page-table allocator.

The reference leans on vLLM's paged KV; this framework's engine owns its
cache, so paging is built in. Pages are a global pool per layer
``[n_pages, page_size, KH*D]`` shared by every slot; a per-slot page table
maps slot-local page index -> pool page id. KV memory scales with ACTIVE
tokens (pages in use), not ``max_batch * max_seq_len``, and the pool can be
oversubscribed relative to the worst case.

Allocation runs on host (the allocator is pure bookkeeping; page ids are
data, not shape, so the jitted decode program never recompiles as pages
move). Device-side writes go through the page table with XLA scatters;
attention reads use the Pallas paged kernel (kernels/paged_attention.py) or
a gather fallback on CPU.

Page 0 is RESERVED as the null page: unused page-table entries point at it
so kernel-side DMAs always have a valid target, and masked positions never
contribute (lengths masking).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PagedCacheConfig:
    page_size: int = 64
    n_pages: int = 256  # pool size INCLUDING the reserved null page
    max_pages_per_slot: int = 8  # PMAX: page-table width


class PagedAllocator:
    """Host-side free-list allocator over the page pool (page 0 reserved)."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free = list(range(n_pages - 1, 0, -1))  # stack; 0 reserved
        self.owned: dict[int, list[int]] = {}  # slot -> page ids

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, slot: int, n: int) -> list[int] | None:
        """Allocate n pages for slot; None (and no change) if unavailable."""
        if n > len(self._free):
            return None
        pages = [self._free.pop() for _ in range(n)]
        self.owned.setdefault(slot, []).extend(pages)
        return pages

    def free_slot(self, slot: int) -> None:
        self._free.extend(reversed(self.owned.pop(slot, [])))


def make_paged_cache(cfg, max_batch: int, pcfg: PagedCacheConfig, dtype=None):
    """Device state for a paged cache over a DecoderConfig ``cfg``.

    Same pytree contract as models.transformer.make_cache plus
    ``page_table``: the Decoder detects the key and takes the paged path."""
    dtype = dtype or cfg.dtype
    # heads merged into the lane dim — see models.transformer.make_cache
    if getattr(cfg, "attention_type", "mha") == "mla":
        dc = cfg.kv_lora_rank + cfg.qk_rope_head_dim
        width = -(-dc // 128) * 128  # padded latent row
        vshape = (pcfg.n_pages, pcfg.page_size, 0)
        shape = (pcfg.n_pages, pcfg.page_size, width)
        return {
            "k": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
            "v": tuple(jnp.zeros(vshape, dtype) for _ in range(cfg.num_layers)),
            "lengths": jnp.zeros((max_batch,), jnp.int32),
            "page_table": jnp.zeros((max_batch, pcfg.max_pages_per_slot),
                                    jnp.int32),
        }
    shape = (pcfg.n_pages, pcfg.page_size, cfg.kv_heads * cfg.dims_per_head)
    return {
        "k": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        "v": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        "lengths": jnp.zeros((max_batch,), jnp.int32),
        "page_table": jnp.zeros((max_batch, pcfg.max_pages_per_slot), jnp.int32),
    }


def pages_needed(n_tokens: int, page_size: int) -> int:
    return -(-n_tokens // page_size)


def write_page_table(cache: dict, slot: int, pages: list[int]) -> dict:
    """Replace one slot's page-table row (unused tail -> null page 0)."""
    pmax = cache["page_table"].shape[1]
    row = np.zeros((pmax,), np.int32)
    row[: len(pages)] = pages
    return {**cache, "page_table": cache["page_table"].at[slot].set(jnp.asarray(row))}
