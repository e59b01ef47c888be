"""Token-tree speculative decoding: draft a TREE of candidate tokens,
verify every root-to-leaf path in ONE base-model forward with a tree
attention mask, accept the deepest all-greedy path.

Chain drafts structurally cap acceptance length: one wrong guess at depth
d kills depths > d. A tree hedges — multiple children per node — so the
expected accepted depth is strictly higher for the same verify cost
budget (reference counterpart: the TTT/tree machinery in
modelopt/torch/speculative/plugins/hf_eagle.py:431 `_get_ttt_attention_mask`
and the medusa tree choices its deployment targets verify; re-designed
here as a static JAX tree: all topology is trace-time constant, the only
runtime data are the token ids, so the whole tick stays one compiled
program).

Topology uses the medusa "choices" format: each choice is a tuple of
child RANKS along a path from the root, e.g. ``(1, 0)`` = "second-best
continuation of the root, then its best continuation". Node 0 is the
root (the last emitted token).

TPU notes: the verify forward runs T = num_nodes tokens through the
einsum attention path with a [T, T] ancestor mask riding in the cache
dict; KV rows land contiguously at the slot's length and the accepted
path is COMPACTED back over the tree rows after verification (gather +
scatter per layer — a few MB per tick, invisible next to the weight
stream).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def tree_from_branching(branching) -> tuple:
    """Dense choices for per-depth branching factors, e.g. (3, 2) ->
    3 children of the root, 2 grandchildren under each = 9 nodes."""
    paths = [()]
    out = []
    for width in branching:
        paths = [p + (r,) for p in paths for r in range(width)]
        out.extend(paths)
    return tuple(out)


def chain_choices(k: int) -> tuple:
    """The degenerate tree equal to a K-token chain draft."""
    return tuple(tuple(0 for _ in range(d + 1)) for d in range(k))


# a good default: hedge hard at depth 1-2, then follow the best path
# (mirrors the shape of the public medusa sparse trees)
DEFAULT_CHOICES = tree_from_branching((3, 2)) + tuple(
    (0, 0) + tuple(0 for _ in range(d + 1)) for d in range(2)
)


@dataclasses.dataclass(frozen=True)
class SpecTree:
    """Static draft-tree topology. All fields are tuples (hashable —
    jit-static). Node 0 is the root; nodes are sorted by (depth, choice)."""

    choices: tuple

    def __post_init__(self):
        object.__setattr__(self, "choices",
                           tuple(tuple(c) for c in self.choices))

    # ---- derived topology (cached numpy, not part of equality) ----------
    def _build(self):
        if getattr(self, "_built", None) is not None:
            return self._built
        nodes = [()]  # node 0 = root
        for c in sorted(set(self.choices), key=lambda c: (len(c), c)):
            if c[:-1] not in nodes:
                raise ValueError(f"choice {c} has no parent in the tree")
            nodes.append(c)
        M = len(nodes)
        index = {c: i for i, c in enumerate(nodes)}
        parent = np.asarray([0 if len(c) < 2 else index[c[:-1]]
                             for c in nodes], np.int32)
        parent[0] = -1
        depth = np.asarray([len(c) for c in nodes], np.int32)
        rank = np.asarray([c[-1] if c else 0 for c in nodes], np.int32)
        anc = np.zeros((M, M), bool)
        for i, c in enumerate(nodes):
            for d in range(len(c) + 1):
                anc[i, index[c[:d]]] = True
        dmax = int(depth.max())
        path = np.zeros((M, dmax + 1), np.int32)
        for i, c in enumerate(nodes):
            for d in range(dmax + 1):
                # pad past the node's own depth with the node itself
                path[i, d] = index[c[:min(d, len(c))]]
        children = [[] for _ in range(M)]
        for i in range(1, M):
            children[parent[i]].append(i)
        built = {
            "nodes": nodes, "num_nodes": M, "parent": parent,
            "depth": depth, "rank": rank, "anc": anc, "path": path,
            "max_depth": dmax,
            "children": tuple(tuple(c) for c in children),
        }
        object.__setattr__(self, "_built", built)
        return built

    @property
    def num_nodes(self) -> int:
        return self._build()["num_nodes"]

    @property
    def max_depth(self) -> int:
        return self._build()["max_depth"]

    @property
    def depths(self) -> np.ndarray:
        return self._build()["depth"]

    @property
    def parents(self) -> np.ndarray:
        return self._build()["parent"]

    @property
    def ranks(self) -> np.ndarray:
        return self._build()["rank"]

    @property
    def paths(self) -> np.ndarray:
        return self._build()["path"]

    @property
    def children(self) -> tuple:
        return self._build()["children"]

    def ancestor_mask(self) -> jnp.ndarray:
        """[M, M] bool: row q attends col j iff j is an ancestor of q or
        q itself — the verify forward's intra-tree attention mask."""
        return jnp.asarray(self._build()["anc"])


def tree_verify_greedy(preds, node_tokens, tree: SpecTree):
    """Greedy tree acceptance. ``preds`` [B, M] = argmax of the verify
    logits at every node; ``node_tokens`` [B, M] = the token each node
    fed (node 0 = the last emitted token). A node is accepted iff its
    parent is accepted and its token equals the parent's greedy
    prediction; the deepest accepted node wins (ties -> first in node
    order, i.e. lowest ranks).

    Returns (best [B] node index, n_acc [B] accepted depth,
    emitted [B, max_depth+1] tokens — entries past n_acc are padding)."""
    b = tree._build()
    M = b["num_nodes"]
    parent = b["parent"]
    accs = [jnp.ones(preds.shape[0], bool)]
    for j in range(1, M):
        p = int(parent[j])
        accs.append(accs[p] & (preds[:, p] == node_tokens[:, j]))
    acc = jnp.stack(accs, axis=1)                       # [B, M]
    depth = jnp.asarray(b["depth"])
    score = jnp.where(acc, depth[None, :], -1)
    best = jnp.argmax(score, axis=1).astype(jnp.int32)  # deepest accepted
    n_acc = depth[best]
    prows = jnp.asarray(b["path"])[best]                # [B, dmax+1]
    # emitted[d] = greedy prediction AT path node d: the accepted token
    # for d < n_acc, the bonus token at d == n_acc
    emitted = jnp.take_along_axis(preds, prows, axis=1)
    return best, n_acc, emitted


def compact_accepted_rows(slab, lengths, prows, width: int):
    """Move the accepted path's tree rows to the front of the slot's tail.

    ``slab`` [B, S, W]: KV rows where the verify forward wrote the M tree
    rows at [lengths, lengths+M). ``prows`` [B, width]: node index at each
    accepted depth (padded with repeats past the accepted depth — the
    rows they write land past the new length and are never attended).
    Returns the slab with row ``lengths+d`` holding node ``prows[:, d]``'s
    KV."""
    B = slab.shape[0]
    src = lengths[:, None] + prows                      # [B, width]
    vals = jnp.take_along_axis(slab, src[..., None], axis=1)
    dst = lengths[:, None] + jnp.arange(width, dtype=lengths.dtype)[None]
    return slab.at[jnp.arange(B)[:, None], dst].set(vals)
