"""Annoy-style index — forest of random-projection binary trees.

TPU-native analog of the reference's Annoy (reference: index/AnnoyIndex.java —
10 trees, split hyperplane = normalized difference of two random member
vectors, median threshold, leaves <= 10 :46-70, 563-642; lazy rebuild after
1000 pending inserts :32-38; candidate-union + exact re-rank search :456-493;
native/index/AnnoyIndex.cpp — explicit build(), candidate cap k*trees*2
:117-153).

TPU-first design: trees are ARRAYS, not pointer structures —
``hyperplanes [T, nodes, d]``, ``thresholds [T, nodes]``, ``children
[T, nodes, 2]`` and fixed-width ``leaf_items [T, n_leaves, L]``.  Tree
construction is a host-orchestrated recursive split (deterministic, numpy);
descent runs on device as a while_loop of gather + dot per level for all
queries and all trees at once, then the union of reached leaves is exact
re-ranked in one batched distance computation.  Pending (un-built) vectors are
carried as an extra candidate set, so adds are visible before rebuild —
stronger than the reference, which may miss pending items in tree routing.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api.config import AnnoyConfig
from ..core.store import VectorStore
from ..ops.distance import blocked_knn
from .base import VectorIndex, pad_queries_pow2, pow2


@functools.partial(jax.jit, static_argnames=("max_depth", "beam"))
def _descend(queries, hyperplanes, thresholds, children, roots, max_depth, beam=4):
    """Margin-beam tree descent: [Q] queries x [T] trees, keeping the best
    ``beam`` branches per tree ranked by the minimum split margin along the
    path — the batched analog of Annoy's priority-queue both-sides search
    (reference: AnnoyIndex.java:651-680 explores both sides with p=0.5;
    native AnnoyIndex.cpp:117-153 walks both-sides-ordered).

    Returns leaf node indices [Q, T, beam] (-1 for unused beam slots).
    """
    q_n = queries.shape[0]
    t_n = hyperplanes.shape[0]
    b = beam
    node = jnp.full((q_n, t_n, b), -1, jnp.int32)
    node = node.at[:, :, 0].set(jnp.broadcast_to(roots[None, :], (q_n, t_n)))
    prio = jnp.full((q_n, t_n, b), -jnp.inf).at[:, :, 0].set(jnp.inf)
    t_idx = jnp.broadcast_to(jnp.arange(t_n)[None, :, None], (q_n, t_n, b))

    def body(_, state):
        node, prio = state
        safe = jnp.maximum(node, 0)
        live = node >= 0
        hp = hyperplanes[t_idx, safe]          # [Q, T, B, d]
        th = thresholds[t_idx, safe]           # [Q, T, B]
        proj = jnp.einsum("qd,qtbd->qtb", queries, hp,
                          preferred_element_type=jnp.float32)
        margin = jnp.abs(proj - th)
        go_right = proj > th
        ch = children[t_idx, safe]             # [Q, T, B, 2]
        is_leaf = ch[..., 0] < 0
        near = jnp.where(go_right, ch[..., 1], ch[..., 0])
        far = jnp.where(go_right, ch[..., 0], ch[..., 1])
        # near child inherits the path priority; far child's priority is the
        # min margin along its path (small margin -> worth exploring)
        near_n = jnp.where(is_leaf | ~live, node, near)
        near_p = jnp.where(live, prio, -jnp.inf)
        far_n = jnp.where(is_leaf | ~live, -1, far)
        far_p = jnp.where(live & ~is_leaf, jnp.minimum(prio, margin), -jnp.inf)
        cand_n = jnp.concatenate([near_n, far_n], axis=2)   # [Q, T, 2B]
        cand_p = jnp.concatenate([near_p, far_p], axis=2)
        top_p, arg = jax.lax.top_k(cand_p, b)
        new_n = jnp.take_along_axis(cand_n, arg, 2)
        new_n = jnp.where(jnp.isfinite(top_p) | (top_p == jnp.inf), new_n, -1)
        new_n = jnp.where(top_p == -jnp.inf, -1, new_n)
        return new_n, top_p

    node, _ = jax.lax.fori_loop(0, max_depth, body, (node, prio))
    return node


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _rerank(queries, base, norms, valid, cand, k, metric="l2"):
    """Exact re-rank of the candidate union with duplicate suppression.

    cand: [Q, C] slot ids (-1 pad, may contain duplicates across trees).
    """
    q_n, c = cand.shape
    # sort-based dedup (O(C log C), not O(C^2)): sort slots, drop adjacent
    # duplicates — order does not matter before a top-k re-rank
    cand = jnp.sort(cand, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((q_n, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
    )
    cand = jnp.where(dup, -1, cand)
    safe = jnp.maximum(cand, 0)
    ok = (cand >= 0) & valid[safe]
    vecs = base[safe]
    q_norms = jnp.sum(queries * queries, axis=1)
    cross = jnp.einsum("qd,qcd->qc", queries, vecs,
                       preferred_element_type=jnp.float32)
    if metric == "l2":
        d = jnp.maximum(q_norms[:, None] + norms[safe] - 2.0 * cross, 0.0)
    else:  # cosine distance, same currency as every other index
        denom = jnp.sqrt(jnp.maximum(q_norms[:, None] * norms[safe], 1e-12))
        d = 1.0 - cross / denom
    d = jnp.where(ok, d, jnp.inf)
    neg, arg = jax.lax.top_k(-d, k)
    out = jnp.take_along_axis(cand, arg, 1)
    return -neg, jnp.where(jnp.isfinite(-neg), out, -1)


class AnnoyIndex(VectorIndex):
    kind = "annoy"

    def __init__(self, dim: int, capacity: int, metric: str = "l2", config: Optional[AnnoyConfig] = None):
        super().__init__(dim, capacity, metric)
        self.config = config or AnnoyConfig()
        self.store = VectorStore(capacity, dim)
        self.seed = 42
        self.rebuild_threshold = 1000  # reference: AnnoyIndex.java:32-38
        self._pending: list[int] = []  # slots not yet in the trees
        self._built = False
        self.hyperplanes: Optional[jnp.ndarray] = None  # [T, nodes, d]
        self.thresholds: Optional[jnp.ndarray] = None   # [T, nodes]
        self.children: Optional[jnp.ndarray] = None     # [T, nodes, 2]
        self.leaf_items: Optional[jnp.ndarray] = None   # [T, n_leaves, L]
        self.node_leaf: Optional[jnp.ndarray] = None    # [T, nodes] leaf row or -1
        self._max_depth = 1
        self._backfill_rows = 0
        self._backfill_queries = 0

    # ------------------------------------------------------------- mutation
    def add_batch(self, ids: Sequence[int], vectors: np.ndarray) -> list[int]:
        accepted, slots = self.store.add_batch(ids, vectors)
        self._pending.extend(slots)
        if len(self._pending) >= self.rebuild_threshold:
            self.build()  # lazy rebuild (reference :194-331 splits leaves
            # incrementally; we rebuild the forest, which the reference also
            # does via rebuildTrees :512-555)
        return accepted

    def remove(self, vec_id: int) -> bool:
        slot = self.store.remove(vec_id)
        if slot is None:
            return False
        self._pending = [s for s in self._pending if s != slot]
        return True  # tombstone: trees keep the slot, re-rank filters it

    # --------------------------------------------------------------- build
    def build(self) -> None:
        """Rebuild the whole forest from live vectors (reference:
        AnnoyIndex.rebuildTrees :512-555, build hyperplane split :563-642)."""
        valid = np.asarray(self.store.state.valid)
        live = np.flatnonzero(valid)
        self._pending.clear()
        if live.size < 2:
            self._built = False
            return
        data = np.asarray(self.store.state.vectors)[live]  # [n, d]
        t = self.config.num_trees
        leaf = max(2, self.config.leaf_size)
        n = live.size
        max_nodes = 4 * (2 * n // leaf + 2)
        n_leaves = 2 * n // leaf + 2
        rng = np.random.default_rng(self.seed)

        hps = np.zeros((t, max_nodes, self.dim), np.float32)
        ths = np.zeros((t, max_nodes), np.float32)
        ch = np.full((t, max_nodes, 2), -1, np.int32)
        node_leaf = np.full((t, max_nodes), -1, np.int32)
        leaves = np.full((t, n_leaves, 2 * leaf), -1, np.int32)
        depth_max = 1

        for ti in range(t):
            next_node = [1]
            next_leaf = [0]

            def split(node_id, members, depth):
                nonlocal depth_max
                depth_max = max(depth_max, depth)
                if len(members) <= 2 * leaf or depth > 40:
                    row = next_leaf[0]
                    next_leaf[0] += 1
                    if row < n_leaves:
                        take = members[: 2 * leaf]
                        leaves[ti, row, : len(take)] = live[take]
                        node_leaf[ti, node_id] = row
                    return
                # hyperplane = normalized difference of two random members
                # (reference: AnnoyIndex.java:563-642)
                a, b = rng.choice(len(members), 2, replace=False)
                hp = data[members[a]] - data[members[b]]
                nrm = np.linalg.norm(hp)
                if nrm < 1e-9:
                    hp = rng.standard_normal(self.dim).astype(np.float32)
                    nrm = np.linalg.norm(hp)
                hp = (hp / nrm).astype(np.float32)
                proj = data[members] @ hp
                thr = float(np.median(proj))
                right = proj > thr
                # degenerate split -> force halves
                if right.all() or (~right).all():
                    order = np.argsort(proj)
                    right = np.zeros(len(members), bool)
                    right[order[len(members) // 2:]] = True
                l_id, r_id = next_node[0], next_node[0] + 1
                next_node[0] += 2
                if r_id >= max_nodes:
                    row = next_leaf[0]
                    next_leaf[0] += 1
                    if row < n_leaves:
                        take = members[: 2 * leaf]
                        leaves[ti, row, : len(take)] = live[take]
                        node_leaf[ti, node_id] = row
                    return
                hps[ti, node_id] = hp
                ths[ti, node_id] = thr
                ch[ti, node_id] = (l_id, r_id)
                split(l_id, members[~right], depth + 1)
                split(r_id, members[right], depth + 1)

            import sys
            old_limit = sys.getrecursionlimit()
            sys.setrecursionlimit(max(old_limit, 10000))
            try:
                split(0, np.arange(n), 1)
            finally:
                sys.setrecursionlimit(old_limit)

        self.hyperplanes = jnp.asarray(hps)
        self.thresholds = jnp.asarray(ths)
        self.children = jnp.asarray(ch)
        self.leaf_items = jnp.asarray(leaves)
        self.node_leaf = jnp.asarray(node_leaf)
        self._max_depth = depth_max + 1
        self._built = True

    # --------------------------------------------------------------- search
    def search_batch(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.dim:
            raise ValueError(f"expected [*, {self.dim}] queries, got {queries.shape}")
        st = self.store.state
        padded, q_n = pad_queries_pow2(queries)
        k_eff = min(k, st.capacity)
        k_pad = min(pow2(k_eff), st.capacity)
        n_live = self.store.size()

        if not self._built or n_live <= k:
            dists, slots = blocked_knn(
                jnp.asarray(padded), st.vectors, st.valid, k_pad,
                metric=self.metric, b_norms=st.norms,
                block_n=min(8192, st.capacity),
            )
        else:
            qj = jnp.asarray(padded)
            # wide beam: the reference's p=0.5 both-sides recursion visits
            # ~1.5^depth leaves per tree (AnnoyIndex.java:651-680) — a beam of
            # 16 gives comparable coverage, and the exact re-rank is cheap
            beam = max(4, self.config.search_k or 32)
            leaf_nodes = _descend(
                qj, self.hyperplanes, self.thresholds, self.children,
                jnp.zeros((self.config.num_trees,), jnp.int32),
                self._max_depth, beam,
            )                                   # [Q, T, B]
            t_idx = jnp.arange(self.config.num_trees)[None, :, None]
            rows = self.node_leaf[t_idx, jnp.maximum(leaf_nodes, 0)]  # [Q, T, B]
            rows = jnp.where(leaf_nodes >= 0, rows, -1)
            items = self.leaf_items[t_idx, jnp.maximum(rows, 0)]      # [Q, T, B, L]
            items = jnp.where((rows >= 0)[..., None], items, -1)
            cand = items.reshape(padded.shape[0], -1)
            # pending (not-yet-built) slots are always candidates
            if self._pending:
                pend = np.unique(np.asarray(self._pending, np.int32))
                cand = jnp.concatenate(
                    [cand, jnp.broadcast_to(jnp.asarray(pend)[None, :],
                                            (padded.shape[0], pend.size))], axis=1
                )
            dists, slots = _rerank(
                qj, st.vectors, st.norms, st.valid, cand, k_pad,
                metric=self.metric,
            )
            # backfill from exact scan if the forest came up short — counted
            # in stats and disableable (config.backfill) so tests can measure
            # honest forest-only recall
            miss = np.asarray(slots[:q_n, :k_eff] < 0)
            if miss.any():
                self._backfill_rows += int(miss.sum())
                self._backfill_queries += int(miss.any(axis=1).sum())
                if self.config.backfill:
                    fd, fs = blocked_knn(
                        qj, st.vectors, st.valid, k_pad,
                        metric=self.metric, b_norms=st.norms,
                        block_n=min(8192, st.capacity),
                    )
                    miss_all = np.asarray(slots) < 0
                    slots = jnp.where(jnp.asarray(miss_all), fs, slots)
                    dists = jnp.where(jnp.asarray(miss_all), fd, dists)
        slots_np = np.asarray(slots)[:q_n, :k_eff]
        ids_np = np.asarray(st.ids)
        ext = np.where(slots_np >= 0, ids_np[np.maximum(slots_np, 0)], -1)
        out_ids = np.full((q_n, k), -1, np.int32)
        out_d = np.full((q_n, k), np.inf, np.float32)
        out_ids[:, :k_eff] = ext
        out_d[:, :k_eff] = np.asarray(dists)[:q_n, :k_eff]
        return out_ids, out_d

    # ---------------------------------------------------------------- state
    def size(self) -> int:
        return self.store.size()

    def get(self, vec_id: int) -> Optional[np.ndarray]:
        return self.store.get(vec_id)

    def stats(self) -> dict:
        s = super().stats()
        s.update(
            num_trees=self.config.num_trees,
            leaf_size=self.config.leaf_size,
            built=self._built,
            pending=len(self._pending),
            max_depth=self._max_depth,
            backfill_rows=self._backfill_rows,
            backfill_queries=self._backfill_queries,
        )
        return s

    # ------------------------------------------------------------ persistence
    def state_arrays(self) -> dict:
        out = {
            "store": self.store.to_host(),
            "built": np.asarray([self._built]),
            "pending": np.asarray(self._pending or [-1], np.int32),
            "max_depth": np.asarray([self._max_depth]),
        }
        if self._built:
            out["trees"] = {
                "hyperplanes": np.asarray(self.hyperplanes),
                "thresholds": np.asarray(self.thresholds),
                "children": np.asarray(self.children),
                "leaf_items": np.asarray(self.leaf_items),
                "node_leaf": np.asarray(self.node_leaf),
            }
        return out

    def load_state_arrays(self, arrays: dict) -> None:
        self.store = VectorStore.from_host(arrays["store"])
        self._built = bool(np.asarray(arrays["built"])[0])
        pend = np.asarray(arrays["pending"])
        self._pending = [int(s) for s in pend if s >= 0]
        self._max_depth = int(np.asarray(arrays["max_depth"])[0])
        if self._built and "trees" in arrays:
            t = arrays["trees"]
            self.hyperplanes = jnp.asarray(t["hyperplanes"])
            self.thresholds = jnp.asarray(t["thresholds"])
            self.children = jnp.asarray(t["children"])
            self.leaf_items = jnp.asarray(t["leaf_items"])
            self.node_leaf = jnp.asarray(t["node_leaf"])
