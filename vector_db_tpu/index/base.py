"""Abstract index interface — the `VectorIndex` seam every index implements.

Parity with the reference's twin interfaces (reference:
src/main/java/com/vectordb/index/VectorIndex.java:11-52 and
native/index/VectorIndex.h:9-35).  The TPU-native surface is batch-first:
``search`` takes a [Q, dim] query matrix and returns device arrays, because
batching queries across the MXU is the whole point (SURVEY.md §2.3).
Single-vector convenience wrappers sit on top.
"""

from __future__ import annotations

import abc
from typing import Optional, Sequence, Tuple

import numpy as np


def pow2(n: int) -> int:
    """Next power of two (>=1)."""
    return 1 << (max(int(n), 1) - 1).bit_length()


def pad_queries_pow2(queries: np.ndarray, min_q: int = 8) -> tuple[np.ndarray, int]:
    """Pad a [Q, d] query batch with zero rows to the next power of two.

    Bounds the number of distinct jit compilations per index to
    O(log Q_max) — the TPU analog of the reference's fixed thread-pool fanout
    (HNSWIndex.cpp:543-571 always splits into numThreads chunks).
    Returns (padded queries, original Q).
    """
    q_n = queries.shape[0]
    qp = pow2(max(q_n, min_q))
    if qp != q_n:
        queries = np.pad(queries, ((0, qp - q_n), (0, 0)))
    return queries, q_n


class VectorIndex(abc.ABC):
    """Batch-first ANN index over a device-resident corpus."""

    #: human-readable type tag, e.g. "hnsw", "pq"
    kind: str = "base"

    def __init__(self, dim: int, capacity: int, metric: str = "l2"):
        self.dim = dim
        self.capacity = capacity
        self.metric = metric

    # ------------------------------------------------------------- mutation
    @abc.abstractmethod
    def add_batch(self, ids: Sequence[int], vectors: np.ndarray) -> list[int]:
        """Insert vectors; returns the list of accepted external ids."""

    def add(self, vec_id: int, vector: np.ndarray) -> bool:
        """Insert one vector (reference: VectorIndex.addVector)."""
        return bool(self.add_batch([vec_id], np.asarray(vector, np.float32)[None, :]))

    @abc.abstractmethod
    def remove(self, vec_id: int) -> bool:
        """Remove by external id (tombstone; reference: removeVector)."""

    @abc.abstractmethod
    def build(self) -> None:
        """(Re)build internal structures from live vectors
        (reference: VectorIndex.buildIndex)."""

    # --------------------------------------------------------------- search
    @abc.abstractmethod
    def search_batch(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """k-NN for a [Q, dim] query batch.

        Returns (ids [Q, k] int32 external ids with -1 padding,
                 dists [Q, k] float32 squared-L2 / cosine distances).
        """

    def search(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        ids, dists = self.search_batch(np.asarray(query, np.float32)[None, :], k)
        return ids[0], dists[0]

    # ---------------------------------------------------------------- state
    @abc.abstractmethod
    def size(self) -> int:
        """Number of live vectors."""

    @abc.abstractmethod
    def get(self, vec_id: int) -> Optional[np.ndarray]:
        """Fetch a stored vector by external id."""

    # ------------------------------------------------------------ persistence
    def state_arrays(self) -> dict:
        """Checkpointable host arrays. Subclasses extend with their own state
        (unlike the reference, whose native save/load are TODO stubs —
        native/index/HNSWIndex.cpp:535-541)."""
        return {}

    def load_state_arrays(self, arrays: dict) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------- metadata
    def stats(self) -> dict:
        """Observability hook (reference: HnswIndex.getIndexStats :480-506)."""
        return {
            "kind": self.kind,
            "size": self.size(),
            "dim": self.dim,
            "capacity": self.capacity,
            "metric": self.metric,
        }
