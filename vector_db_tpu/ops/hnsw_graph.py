"""HNSW graph engine — padded adjacency arrays + batched on-device traversal.

TPU-native redesign of the reference's HNSW (reference:
index/HnswIndex.java — per-level Map adjacency :31, insert :178-236, beam
`searchLayer` :557-644, greedy `searchLayerClosest` :511-552, geometric level
assignment :678-690; native/index/HNSWIndex.cpp — searchLevel :171-308,
heuristic neighbor selection :322-469, connect+prune :471-515).

Array-program replacements (SURVEY.md §7.0):
  Map<Integer,List<Integer>> adjacency  ->  neighbors[L, cap, M] int32, -1 pad
  HashSet visited                       ->  [Q, cap] bool visited mask
  PriorityQueue beam                    ->  fixed-size sorted pool + expanded flags
  per-edge scalar distances             ->  gathered [Q, E*M, d] batched distance

Insertion runs in batched rounds against a frozen graph snapshot
(SURVEY.md §7.3.1): candidate search for B nodes is batched, then a
sequential-in-kernel connect loop applies forward + reverse edges with top-M
pruning.  Batch-internal candidates are merged in so batch members can link to
each other, recovering most of the sequential reference behaviour.

Everything here is jitted at the top level (search / insert); distance
closures are constructed *inside* the jitted functions so they never become
unstable static arguments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class HnswGraph:
    """Device-resident layered graph."""

    neighbors: Array    # [L, cap, M] int32 slot ids, -1 padded
    levels: Array       # [cap] int32 node top level, -1 for absent
    entry: Array        # () int32 entry point slot (-1 if empty)
    entry_level: Array  # () int32

    @property
    def max_level(self) -> int:
        return self.neighbors.shape[0]

    @property
    def capacity(self) -> int:
        return self.neighbors.shape[1]

    @property
    def m(self) -> int:
        return self.neighbors.shape[2]


def init_graph(capacity: int, m: int, max_level: int) -> HnswGraph:
    return HnswGraph(
        neighbors=jnp.full((max_level, capacity, m), -1, jnp.int32),
        levels=jnp.full((capacity,), -1, jnp.int32),
        entry=jnp.asarray(-1, jnp.int32),
        entry_level=jnp.asarray(-1, jnp.int32),
    )


def sample_levels(key: Array, n: int, m: int, max_level: int) -> Array:
    """Geometric level assignment, mL = 1/ln(M)
    (reference: HnswIndex.java:678-690 p=1/e; HNSWIndex.cpp:517-522 -ln(r)*mL)."""
    u = jax.random.uniform(key, (n,), minval=1e-12, maxval=1.0)
    ml = 1.0 / jnp.log(jnp.asarray(float(max(m, 2)), jnp.float32))
    lv = jnp.floor(-jnp.log(u) * ml).astype(jnp.int32)
    return jnp.clip(lv, 0, max_level - 1)


# --------------------------------------------------------------------------
# distance closures (built inside jitted callers)
# --------------------------------------------------------------------------

def _exact_dist(base: Array, norms: Array, q: Array, q_norms: Array):
    """dist(slots [Q, S]) -> [Q, S] exact squared L2; -1 slots -> +inf."""

    def dist(slots: Array) -> Array:
        safe = jnp.maximum(slots, 0)
        vecs = base[safe]                      # [Q, S, d]
        dots = jnp.einsum("qd,qsd->qs", q, vecs, preferred_element_type=jnp.float32)
        d = q_norms[:, None] + norms[safe] - 2.0 * dots
        return jnp.where(slots >= 0, jnp.maximum(d, 0.0), jnp.inf)

    return dist


def _adc_dist(codes: Array, tables: Array):
    """dist(slots [Q, S]) -> [Q, S] ADC distance from per-query tables
    (reference: HnswPqIndex.computePQDistance :371-386, batched)."""

    def dist(slots: Array) -> Array:
        safe = jnp.maximum(slots, 0)
        c = codes[safe].astype(jnp.int32)           # [Q, S, M_sub]
        c = jnp.swapaxes(c, 1, 2)                   # [Q, M_sub, S]
        g = jnp.take_along_axis(tables, c, axis=2)  # [Q, M_sub, S]
        d = jnp.sum(g, axis=1)                      # [Q, S]
        return jnp.where(slots >= 0, d, jnp.inf)

    return dist


# --------------------------------------------------------------------------
# greedy descent (one level)
# --------------------------------------------------------------------------

def _greedy_level(neighbors_l, dist, cur, cur_d, active, max_steps):
    """Greedy walk on one level until no neighbor improves
    (reference: HnswIndex.searchLayerClosest :511-552).  Batched over Q."""

    def cond(state):
        _, _, improving, step = state
        return jnp.logical_and(jnp.any(improving), step < max_steps)

    def body(state):
        cur, cur_d, improving, step = state
        nbrs = neighbors_l[jnp.maximum(cur, 0)]      # [Q, M]
        nbrs = jnp.where((cur >= 0)[:, None], nbrs, -1)
        d = dist(nbrs)                               # [Q, M]
        best = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, best[:, None], 1)[:, 0]
        best_i = jnp.take_along_axis(nbrs, best[:, None], 1)[:, 0]
        better = jnp.logical_and(improving, best_d < cur_d)
        return (
            jnp.where(better, best_i, cur),
            jnp.where(better, best_d, cur_d),
            better,
            step + 1,
        )

    cur, cur_d, _, _ = jax.lax.while_loop(cond, body, (cur, cur_d, active, 0))
    return cur, cur_d


# --------------------------------------------------------------------------
# beam search (one level)
# --------------------------------------------------------------------------

def _beam_level(neighbors_l, dist, entry, entry_d, cap, ef, max_iters, expand):
    """Best-first beam with visited masks (reference: HnswIndex.searchLayer
    :557-644).  Returns (pool_d [Q, ef], pool_i [Q, ef]) ascending, -1 pad.

    ``expand`` candidates are expanded per iteration: a few extra distance
    evaluations for far fewer sequential steps — the right trade on a wide
    machine.
    """
    q_n = entry.shape[0]
    m = neighbors_l.shape[1]
    e = expand

    pool_d = jnp.full((q_n, ef), jnp.inf).at[:, 0].set(entry_d)
    pool_i = jnp.full((q_n, ef), -1, jnp.int32).at[:, 0].set(entry)
    pool_x = jnp.zeros((q_n, ef), bool)  # expanded flags
    visited = jnp.zeros((q_n, cap), bool)
    visited = visited.at[jnp.arange(q_n), jnp.maximum(entry, 0)].set(True)
    rows = jnp.arange(q_n)[:, None]

    def cond(state):
        _, _, _, _, alive, it = state
        return jnp.logical_and(jnp.any(alive), it < max_iters)

    def body(state):
        pool_d, pool_i, pool_x, visited, alive, it = state
        sel_d = jnp.where(pool_x | (pool_i < 0), jnp.inf, pool_d)
        neg, sel = jax.lax.top_k(-sel_d, e)               # [Q, E]
        sel_nodes = jnp.take_along_axis(pool_i, sel, 1)   # [Q, E]
        sel_ok = jnp.isfinite(-neg)

        # stop rule: closest unexpanded farther than pool's worst -> done
        worst = pool_d[:, -1]
        closest_unexp = -neg[:, 0]
        q_alive = alive & jnp.isfinite(closest_unexp) & (closest_unexp <= worst)

        pool_x = pool_x.at[rows, sel].set(
            pool_x[rows, sel] | (sel_ok & q_alive[:, None])
        )

        nbrs = neighbors_l[jnp.maximum(sel_nodes, 0)]     # [Q, E, M]
        nbrs = jnp.where((sel_nodes >= 0)[:, :, None], nbrs, -1).reshape(q_n, e * m)
        safe = jnp.maximum(nbrs, 0)
        fresh = (nbrs >= 0) & ~visited[rows, safe] & q_alive[:, None]
        visited = visited.at[rows, safe].set(visited[rows, safe] | fresh)
        d = dist(jnp.where(fresh, nbrs, -1))

        cat_d = jnp.concatenate([pool_d, d], axis=1)
        cat_i = jnp.concatenate([pool_i, jnp.where(fresh, nbrs, -1)], axis=1)
        cat_x = jnp.concatenate([pool_x, jnp.zeros_like(fresh)], axis=1)
        neg2, arg = jax.lax.top_k(-cat_d, ef)
        return (
            -neg2,
            jnp.take_along_axis(cat_i, arg, 1),
            jnp.take_along_axis(cat_x, arg, 1),
            visited,
            q_alive,
            it + 1,
        )

    pool_d, pool_i, _, _, _, _ = jax.lax.while_loop(
        cond, body, (pool_d, pool_i, pool_x, visited, jnp.ones((q_n,), bool), 0)
    )
    pool_i = jnp.where(jnp.isfinite(pool_d), pool_i, -1)
    return pool_d, pool_i


# --------------------------------------------------------------------------
# full multi-level search (exact distances — plain HNSW)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "ef", "expand", "max_iters"))
def hnsw_search(
    graph: HnswGraph,
    base: Array,
    norms: Array,
    valid: Array,
    queries: Array,
    k: int,
    ef: int,
    expand: int = 4,
    max_iters: int = 0,
) -> tuple[Array, Array]:
    """Layered search: greedy on upper levels, ef-beam on level 0, top-k.

    (reference: HnswIndex.searchNearest :347-380 — ef = max(ef, 4k) is applied
    by the caller.)  Deleted slots remain traversable (tombstones) but are
    filtered from the result set.
    """
    q_n = queries.shape[0]
    q_norms = jnp.sum(queries * queries, axis=1)
    dist = _exact_dist(base, norms, queries, q_norms)
    it = max_iters if max_iters > 0 else ef

    entry = jnp.broadcast_to(graph.entry, (q_n,))
    cur_d = dist(entry[:, None])[:, 0]
    cur = entry
    # static python loop over levels, top -> 1
    for lev in range(graph.max_level - 1, 0, -1):
        active = jnp.broadcast_to(lev <= graph.entry_level, (q_n,))
        cur, cur_d = _greedy_level(
            graph.neighbors[lev], dist, cur, cur_d, active, max_steps=graph.capacity
        )
    pool_d, pool_i = _beam_level(
        graph.neighbors[0], dist, cur, cur_d, graph.capacity, ef, it, expand
    )
    # exclude tombstoned slots from results
    ok = (pool_i >= 0) & valid[jnp.maximum(pool_i, 0)]
    pool_d = jnp.where(ok, pool_d, jnp.inf)
    neg, arg = jax.lax.top_k(-pool_d, k)
    out_i = jnp.take_along_axis(pool_i, arg, 1)
    out_i = jnp.where(jnp.isfinite(-neg), out_i, -1)
    return -neg, out_i


# --------------------------------------------------------------------------
# batched insertion
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("efc", "expand"))
def insert_batch(
    graph: HnswGraph,
    base: Array,
    norms: Array,
    new_slots: Array,   # [B] slot ids to insert (already written to the store)
    new_levels: Array,  # [B] sampled levels
    efc: int,
    expand: int = 4,
) -> HnswGraph:
    """Insert B nodes against a frozen snapshot, then connect sequentially.

    Graph must be non-empty (the host seeds the first node).  Reference
    analog: index/HnswIndex.java:178-236 / HNSWPQIndex.cpp:304-460 (4-phase
    add), with exact distances for graph quality (reference "Fix #4",
    HnswPqIndex.java:491-499).
    """
    b = new_slots.shape[0]
    L, cap, m = graph.neighbors.shape
    q = base[new_slots]                      # [B, d]
    q_norms = jnp.sum(q * q, axis=1)
    dist = _exact_dist(base, norms, q, q_norms)

    # batch-mate distance matrix for batch-internal candidates
    mate_d = (
        q_norms[:, None]
        + q_norms[None, :]
        - 2.0 * jax.lax.dot_general(q, q, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    )
    mate_d = jnp.maximum(mate_d, 0.0)
    eye = jnp.eye(b, dtype=bool)

    # register new nodes' levels first (they are unreachable until linked)
    levels = graph.levels.at[new_slots].set(new_levels)

    entry = jnp.broadcast_to(graph.entry, (b,))
    cur = entry
    cur_d = dist(entry[:, None])[:, 0]

    selected = jnp.full((b, L, m), -1, jnp.int32)
    sel_dists = jnp.full((b, L, m), jnp.inf)

    for lev in range(L - 1, -1, -1):
        in_graph = lev <= graph.entry_level
        # greedy phase for nodes whose target level is below this one
        g_active = jnp.broadcast_to(in_graph, (b,)) & (new_levels < lev)
        cur, cur_d = _greedy_level(
            graph.neighbors[lev], dist, cur, cur_d, g_active, max_steps=cap
        )
        # beam phase for nodes that get edges at this level
        do_beam = jnp.broadcast_to(in_graph, (b,)) & (new_levels >= lev)
        pool_d, pool_i = _beam_level(
            graph.neighbors[lev], dist, cur, cur_d, cap, efc, efc, expand
        )
        # merge batch-mates with level >= lev as extra candidates
        mate_ok = (new_levels[None, :] >= lev) & ~eye
        md = jnp.where(mate_ok, mate_d, jnp.inf)
        cand_d = jnp.concatenate([pool_d, md], axis=1)
        cand_i = jnp.concatenate(
            [pool_i, jnp.broadcast_to(new_slots[None, :], (b, b))], axis=1
        )
        cand_d = jnp.where(cand_i >= 0, cand_d, jnp.inf)
        # simple nearest-M selection (reference: HnswIndex.selectNeighbors
        # :649-672); diversity heuristic is a planned variant
        negm, argm = jax.lax.top_k(-cand_d, m)
        sel_i = jnp.take_along_axis(cand_i, argm, 1)
        sel_i = jnp.where(jnp.isfinite(-negm), sel_i, -1)
        take = do_beam[:, None]
        selected = selected.at[:, lev, :].set(jnp.where(take, sel_i, selected[:, lev, :]))
        sel_dists = sel_dists.at[:, lev, :].set(
            jnp.where(take, -negm, sel_dists[:, lev, :])
        )
        # next level entry: best beam result where beam ran
        cur = jnp.where(do_beam, pool_i[:, 0], cur)
        cur_d = jnp.where(do_beam, pool_d[:, 0], cur_d)

    # ---------------- connect phase: sequential over the batch -------------
    def connect_one(i, nbrs_arr):
        slot_i = new_slots[i]
        for lev in range(L):  # static loop
            lev_on = new_levels[i] >= lev
            sel = jnp.where(lev_on, selected[i, lev], -1)      # [M]
            # forward edges
            nbrs_arr = nbrs_arr.at[lev, slot_i].set(
                jnp.where(lev_on, sel, nbrs_arr[lev, slot_i])
            )
            # reverse edges with top-M prune (reference: connectNeighbors +
            # pruneNeighbors, HNSWIndex.cpp:471-515)
            tgt = sel                                          # [M]
            safe_t = jnp.maximum(tgt, 0)
            cur_lists = nbrs_arr[lev, safe_t]                  # [M, M]
            cand = jnp.concatenate(
                [cur_lists, jnp.full((m, 1), slot_i, jnp.int32)], axis=1
            )                                                  # [M, M+1]
            # drop duplicate of slot_i if it is somehow present already
            dup = cand[:, :-1] == slot_i
            cand = jnp.concatenate([jnp.where(dup, -1, cand[:, :-1]), cand[:, -1:]], 1)
            t_vecs = base[safe_t]                              # [M, d]
            c_safe = jnp.maximum(cand, 0)
            c_vecs = base[c_safe]                              # [M, M+1, d]
            dd = (
                norms[safe_t][:, None]
                + norms[c_safe]
                - 2.0 * jnp.einsum("md,mcd->mc", t_vecs, c_vecs,
                                   preferred_element_type=jnp.float32)
            )
            dd = jnp.where(cand >= 0, jnp.maximum(dd, 0.0), jnp.inf)
            negk, argk = jax.lax.top_k(-dd, m)
            new_lists = jnp.take_along_axis(cand, argk, 1)
            new_lists = jnp.where(jnp.isfinite(-negk), new_lists, -1)
            write = lev_on & (tgt >= 0)
            nbrs_arr = nbrs_arr.at[lev, safe_t].set(
                jnp.where(write[:, None], new_lists, cur_lists)
            )
        return nbrs_arr

    neighbors = jax.lax.fori_loop(0, b, connect_one, graph.neighbors)

    # entry-point promotion
    batch_best = jnp.argmax(new_levels)
    promote = new_levels[batch_best] > graph.entry_level
    entry_new = jnp.where(promote, new_slots[batch_best], graph.entry)
    entry_level_new = jnp.maximum(graph.entry_level, new_levels[batch_best])

    return graph.replace(
        neighbors=neighbors,
        levels=levels,
        entry=entry_new.astype(jnp.int32),
        entry_level=entry_level_new.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=())
def seed_first(graph: HnswGraph, slot: Array, level: Array) -> HnswGraph:
    """Insert the very first node (host decides when the graph is empty)."""
    return graph.replace(
        levels=graph.levels.at[slot].set(level),
        entry=slot.astype(jnp.int32),
        entry_level=level.astype(jnp.int32),
    )


@jax.jit
def unlink_slot(graph: HnswGraph, slot: Array) -> HnswGraph:
    """Remove a node's edges and pointers to it (tombstone-friendly eager
    unlink; reference: HnswIndex.removeVector :254-318 unlinks all levels).

    Entry-point fixup happens host-side (pick any live neighbor / rebuild).
    """
    neighbors = jnp.where(graph.neighbors == slot, -1, graph.neighbors)
    neighbors = neighbors.at[:, slot, :].set(-1)
    return graph.replace(neighbors=neighbors, levels=graph.levels.at[slot].set(-1))
