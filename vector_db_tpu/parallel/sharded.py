"""Multi-chip scale-out: corpus sharding over a device mesh.

The reference is explicitly single-node (SURVEY.md §2.3, §5.8 — its only
parallelism is std::async query fanout, HNSWIndex.cpp:543-571).  The
TPU-native scale-out axes are:

  * **corpus sharding** — base vectors / PQ codes split across chips on a
    1-D mesh axis; each chip computes local top-k over its shard; the
    per-shard results ride ICI through one all_gather and a tiny merge.
  * **query sharding (DP)** — queries split across chips, corpus replicated.
  * **sharded k-means training** — data sharded, centroids replicated;
    per-shard one-hot partial sums reduce with psum (the classic
    data-parallel training step).

Everything is expressed with `shard_map` over a `jax.sharding.Mesh` and
`jax.lax` collectives — XLA inserts the ICI transfers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the corpus-shard axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_corpus(mesh: Mesh, *arrays: Array) -> tuple[Array, ...]:
    """Place arrays with their leading axis sharded across the mesh."""
    out = []
    for a in arrays:
        spec = P(AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh: Mesh, *arrays: Array) -> tuple[Array, ...]:
    out = []
    for a in arrays:
        out.append(jax.device_put(a, NamedSharding(mesh, P())))
    return tuple(out)


# --------------------------------------------------------------------------
# corpus-sharded exact kNN
# --------------------------------------------------------------------------

def sharded_knn(mesh: Mesh, k: int):
    """Build a jitted corpus-sharded exact kNN: queries replicated, base
    sharded on the mesh axis; local top-k per shard, all_gather + merge.

    Returned fn: (q [Q,d], base [N,d], valid [N], norms [N]) -> (d, global idx).
    """

    def local_knn(q, base_s, valid_s, norms_s):
        # base_s: [N/S, d] local shard
        cross = jax.lax.dot_general(
            q, base_s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        d = jnp.sum(q * q, axis=1)[:, None] + norms_s[None, :] - 2.0 * cross
        d = jnp.where(valid_s[None, :], jnp.maximum(d, 0.0), jnp.inf)
        neg, idx = jax.lax.top_k(-d, k)
        # local -> global slot ids
        shard = jax.lax.axis_index(AXIS)
        idx = idx + shard * base_s.shape[0]
        # gather per-shard top-k everywhere, merge (rides ICI)
        d_all = jax.lax.all_gather(-neg, AXIS)          # [S, Q, k]
        i_all = jax.lax.all_gather(idx, AXIS)           # [S, Q, k]
        s, qn, _ = d_all.shape
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(qn, s * k)
        i_flat = jnp.moveaxis(i_all, 0, 1).reshape(qn, s * k)
        neg2, arg = jax.lax.top_k(-d_flat, k)
        out_i = jnp.take_along_axis(i_flat, arg, 1)
        out_i = jnp.where(jnp.isfinite(-neg2), out_i, -1)
        return -neg2, out_i

    fn = jax.jit(
        jax.shard_map(
            local_knn,
            mesh=mesh,
            in_specs=(P(), P(AXIS, None), P(AXIS), P(AXIS)),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated by the all_gather+merge
        )
    )
    return fn


# --------------------------------------------------------------------------
# query-sharded (data-parallel) exact kNN
# --------------------------------------------------------------------------

def dp_knn(mesh: Mesh, k: int):
    """Queries sharded across chips, corpus replicated — the DP axis."""

    def local(q_s, base, valid, norms):
        cross = jax.lax.dot_general(
            q_s, base, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        d = jnp.sum(q_s * q_s, axis=1)[:, None] + norms[None, :] - 2.0 * cross
        d = jnp.where(valid[None, :], jnp.maximum(d, 0.0), jnp.inf)
        neg, idx = jax.lax.top_k(-d, k)
        idx = jnp.where(jnp.isfinite(-neg), idx, -1)
        return -neg, idx

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(), P(), P()),
            out_specs=(P(AXIS, None), P(AXIS, None)),
        )
    )


# --------------------------------------------------------------------------
# corpus-sharded flagship (ADC scan + exact refine)
# --------------------------------------------------------------------------

def sharded_flagship(mesh: Mesh, k: int, refine: int):
    """Corpus-sharded HNSW+PQ scan path: codes and raw vectors sharded;
    per-chip ADC top-R + local exact re-rank, then one all_gather + merge.

    Returned fn: (q, codebooks, codes [N,S], valid [N], base [N,d],
    ids [N]) -> (dists [Q,k], external ids [Q,k]).
    """

    def local(q, codebooks, codes_s, valid_s, base_s, ids_s):
        from ..ops import adc

        tables = adc.build_distance_tables(q, codebooks)
        r = min(refine, codes_s.shape[0])
        _, cand = adc.adc_scan_topk(
            tables, codes_s, valid_s, r,
            block_n=min(4096, codes_s.shape[0]), impl="gather",
        )
        safe = jnp.maximum(cand, 0)
        vecs = base_s[safe]
        d = jnp.sum((vecs - q[:, None, :]) ** 2, axis=2)
        d = jnp.where(cand >= 0, d, jnp.inf)
        negl, argl = jax.lax.top_k(-d, min(k, r))
        loc = jnp.take_along_axis(cand, argl, 1)
        ext = jnp.where(jnp.isfinite(-negl), ids_s[jnp.maximum(loc, 0)], -1)
        # merge shard-local results over ICI
        d_all = jax.lax.all_gather(-negl, AXIS)
        e_all = jax.lax.all_gather(ext, AXIS)
        s, qn, kk = d_all.shape
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(qn, s * kk)
        e_flat = jnp.moveaxis(e_all, 0, 1).reshape(qn, s * kk)
        neg2, arg = jax.lax.top_k(-d_flat, k)
        out_e = jnp.take_along_axis(e_flat, arg, 1)
        out_e = jnp.where(jnp.isfinite(-neg2), out_e, -1)
        return -neg2, out_e

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS)),
            out_specs=(P(), P()),
            check_vma=False,  # outputs are replicated by the all_gather+merge
        )
    )


# --------------------------------------------------------------------------
# sharded k-means training step (the distributed "training step")
# --------------------------------------------------------------------------

def sharded_kmeans_step(mesh: Mesh):
    """One data-parallel Lloyd iteration: data sharded, centroids replicated;
    per-shard one-hot partial sums are psum-reduced across the mesh —
    the canonical DP training step expressed in shard_map.

    Returned fn: (data_s [N,d], centroids [K,d]) -> new centroids [K,d].
    """

    def step(data_s, centroids):
        d = (
            jnp.sum(data_s * data_s, axis=1)[:, None]
            + jnp.sum(centroids * centroids, axis=1)[None, :]
            - 2.0
            * jax.lax.dot_general(
                data_s, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, centroids.shape[0], dtype=jnp.float32)
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), AXIS)        # [K]
        sums = jax.lax.psum(
            jax.lax.dot_general(
                onehot, data_s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            AXIS,
        )                                                            # [K, d]
        return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(AXIS, None), P()),
            out_specs=P(),
            check_vma=False,  # psum makes the output replicated
        )
    )


class ShardedDatabase:
    """Thin multi-chip wrapper: a read-mostly corpus-sharded search service.

    Builds from any single-chip index's store (host arrays), shards the
    corpus across the mesh, and serves exact or flagship searches.  The
    single-writer host model is unchanged; re-shard after bulk mutations.
    """

    def __init__(self, mesh: Mesh, vectors: np.ndarray, ids: np.ndarray,
                 valid: np.ndarray, codes: np.ndarray | None = None,
                 codebooks: np.ndarray | None = None):
        self.mesh = mesh
        s = mesh.devices.size
        n = vectors.shape[0]
        pad = (-n) % s
        if pad:
            vectors = np.pad(vectors, ((0, pad), (0, 0)))
            ids = np.pad(ids, (0, pad), constant_values=-1)
            valid = np.pad(valid, (0, pad))
            if codes is not None:
                codes = np.pad(codes, ((0, pad), (0, 0)))
        norms = (vectors.astype(np.float32) ** 2).sum(1)
        (self.vectors, self.ids, self.valid, self.norms) = shard_corpus(
            mesh, jnp.asarray(vectors), jnp.asarray(ids), jnp.asarray(valid),
            jnp.asarray(norms),
        )
        self.codes = None
        self.codebooks = None
        if codes is not None and codebooks is not None:
            (self.codes,) = shard_corpus(mesh, jnp.asarray(codes))
            (self.codebooks,) = replicate(mesh, jnp.asarray(codebooks))
        self._knn_cache: dict = {}

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Corpus-sharded exact search -> (external ids, dists)."""
        fn = self._knn_cache.get(("exact", k))
        if fn is None:
            fn = sharded_knn(self.mesh, k)
            self._knn_cache[("exact", k)] = fn
        d, idx = fn(jnp.asarray(queries, jnp.float32), self.vectors, self.valid, self.norms)
        idx_np = np.asarray(idx)
        ids_np = np.asarray(jax.device_get(self.ids))
        ext = np.where(idx_np >= 0, ids_np[np.maximum(idx_np, 0)], -1)
        return ext, np.asarray(d)

    def search_flagship(self, queries: np.ndarray, k: int, refine: int = 1024
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Corpus-sharded ADC scan + refine -> (external ids, dists)."""
        if self.codes is None:
            raise ValueError("no PQ codes attached")
        fn = self._knn_cache.get(("flag", k, refine))
        if fn is None:
            fn = sharded_flagship(self.mesh, k, refine)
            self._knn_cache[("flag", k, refine)] = fn
        d, ext = fn(jnp.asarray(queries, jnp.float32), self.codebooks,
                    self.codes, self.valid, self.vectors, self.ids)
        return np.asarray(ext), np.asarray(d)
