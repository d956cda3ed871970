"""Device-resident vector store — SoA arrays on the TPU.

TPU-native equivalent of the reference's native VectorStore
(reference: native/core/VectorStore.{h,cpp} — SoA float store + ids +
precomputed squared norms + atomic append).  Here the SoA lives in HBM as
pre-allocated static-capacity JAX arrays; "locking" disappears because state
is an immutable pytree and the host wrapper is the single writer
(SURVEY.md §2.3: shared_mutex -> functional state).

Slot management (id -> slot map, tombstone freelist) is host-side runtime
metadata — the analog of the reference's handle bookkeeping, not compute.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class StoreState:
    """Immutable device arrays: the single source of truth for the corpus."""

    vectors: Array  # [cap, dim] float32
    ids: Array      # [cap] int32 external ids, -1 for empty slots
    norms: Array    # [cap] float32 squared L2 norms (VectorStore.cpp:98-104)
    valid: Array    # [cap] bool live-slot mask (tombstone deletes -> False)

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def init_store(capacity: int, dim: int) -> StoreState:
    """Pre-allocated max-capacity arrays (reference pre-allocates the same way,
    native/core/VectorStore.cpp:32-34). Capacity is rounded up to a multiple of
    128 so every downstream kernel sees lane-aligned shapes."""
    cap = _round_up(max(capacity, 128), 128)
    return StoreState(
        vectors=jnp.zeros((cap, dim), jnp.float32),
        ids=jnp.full((cap,), -1, jnp.int32),
        norms=jnp.zeros((cap,), jnp.float32),
        valid=jnp.zeros((cap,), bool),
    )


@jax.jit
def _write_slots(state: StoreState, slots: Array, vecs: Array, ids: Array) -> StoreState:
    norms = jnp.sum(vecs * vecs, axis=-1)
    return state.replace(
        vectors=state.vectors.at[slots].set(vecs),
        ids=state.ids.at[slots].set(ids),
        norms=state.norms.at[slots].set(norms),
        valid=state.valid.at[slots].set(ids >= 0),
    )


@jax.jit
def _clear_slots(state: StoreState, slots: Array) -> StoreState:
    return state.replace(
        ids=state.ids.at[slots].set(-1),
        valid=state.valid.at[slots].set(False),
    )


class VectorStore:
    """Host wrapper: single-writer slot allocator over a StoreState pytree.

    Add-batches are padded to the next power of two so jit recompiles are
    bounded (static shapes; SURVEY.md §7.3.3).
    """

    def __init__(self, capacity: int, dim: int):
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        self.state = init_store(capacity, dim)
        self.dim = dim
        self._id_to_slot: dict[int, int] = {}
        self._free: list[int] = list(range(self.state.capacity - 1, -1, -1))

    # ------------------------------------------------------------- properties
    @property
    def capacity(self) -> int:
        return self.state.capacity

    def __len__(self) -> int:
        return len(self._id_to_slot)

    def size(self) -> int:
        return len(self._id_to_slot)

    def contains(self, vec_id: int) -> bool:
        return vec_id in self._id_to_slot

    def slot_of(self, vec_id: int) -> Optional[int]:
        return self._id_to_slot.get(vec_id)

    def ids(self) -> list[int]:
        return list(self._id_to_slot.keys())

    # -------------------------------------------------------------- mutation
    def add_batch(self, ids: Sequence[int], vecs: np.ndarray) -> tuple[list[int], list[int]]:
        """Insert a batch. Returns (accepted external ids, assigned slots).

        Duplicate ids and capacity overflow are rejected per-row (the reference
        returns false for duplicates, index/HnswIndex.java:139-151).
        """
        vecs = np.asarray(vecs, dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"expected [*, {self.dim}] vectors, got {vecs.shape}")
        take_ids: list[int] = []
        take_rows: list[int] = []
        slots: list[int] = []
        for row, vid in enumerate(ids):
            vid = int(vid)
            if vid < 0 or vid in self._id_to_slot or not self._free:
                continue
            slot = self._free.pop()
            self._id_to_slot[vid] = slot
            take_ids.append(vid)
            take_rows.append(row)
            slots.append(slot)
        if not take_ids:
            return [], []
        n = len(take_ids)
        n_pad = 1 << (n - 1).bit_length()  # next pow2 => bounded recompiles
        pad = n_pad - n
        # pad rows are exact duplicates of the last real row: the scatter write
        # is idempotent, so padding never changes the final state
        slot_arr = np.asarray(slots + [slots[-1]] * pad, np.int32)
        id_arr = np.asarray(take_ids + [take_ids[-1]] * pad, np.int32)
        vec_arr = np.concatenate(
            [vecs[take_rows], np.repeat(vecs[take_rows][-1:], pad, 0)], 0
        )
        self.state = _write_slots(
            self.state,
            jnp.asarray(slot_arr),
            jnp.asarray(vec_arr),
            jnp.asarray(id_arr),
        )
        return take_ids, slots

    def add(self, vec_id: int, vec: np.ndarray) -> Optional[int]:
        accepted, slots = self.add_batch([vec_id], np.asarray(vec, np.float32)[None, :])
        return slots[0] if accepted else None

    def bulk_load(self, ids: Sequence[int], vectors: Array) -> list[int]:
        """Zero-copy bulk ingest of an already-device-resident [n, dim] array.

        The store must be empty; rows land in slots 0..n-1.  Avoids the
        host->device round trip of add_batch — on a tunneled TPU, transferring
        a 100k x 512 corpus costs minutes, generating or ingesting it on
        device costs milliseconds.
        """
        if self._id_to_slot:
            raise ValueError("bulk_load requires an empty store")
        n = vectors.shape[0]
        if n > self.state.capacity or vectors.shape[1] != self.dim:
            raise ValueError(f"bulk_load shape {vectors.shape} exceeds store")
        ids_np = np.asarray(list(ids), np.int32)
        if len(ids_np) != n:
            raise ValueError("ids/vectors length mismatch")
        cap = self.state.capacity
        vec_arr = jnp.zeros((cap, self.dim), jnp.float32).at[:n].set(vectors)
        id_arr = jnp.full((cap,), -1, jnp.int32).at[:n].set(jnp.asarray(ids_np))
        self.state = StoreState(
            vectors=vec_arr,
            ids=id_arr,
            norms=jnp.sum(vec_arr * vec_arr, axis=1),
            valid=id_arr >= 0,
        )
        self._id_to_slot = {int(v): i for i, v in enumerate(ids_np)}
        self._free = list(range(cap - 1, n - 1, -1))
        return ids_np.tolist()

    def remove(self, vec_id: int) -> Optional[int]:
        """Tombstone delete. Returns the freed slot, or None if absent."""
        slot = self._id_to_slot.pop(int(vec_id), None)
        if slot is None:
            return None
        self.state = _clear_slots(self.state, jnp.asarray([slot], jnp.int32))
        self._free.append(slot)
        return slot

    def get(self, vec_id: int) -> Optional[np.ndarray]:
        slot = self._id_to_slot.get(int(vec_id))
        if slot is None:
            return None
        return np.asarray(self.state.vectors[slot])

    # ---------------------------------------------------------- persistence
    def to_host(self) -> dict:
        """Snapshot for checkpointing (storage/checkpoint.py)."""
        return {
            "vectors": np.asarray(self.state.vectors),
            "ids": np.asarray(self.state.ids),
            "norms": np.asarray(self.state.norms),
            "valid": np.asarray(self.state.valid),
        }

    @classmethod
    def from_host(cls, arrays: dict) -> "VectorStore":
        vecs = np.asarray(arrays["vectors"], np.float32)
        st = cls.__new__(cls)
        st.dim = vecs.shape[1]
        st.state = StoreState(
            vectors=jnp.asarray(vecs),
            ids=jnp.asarray(arrays["ids"], jnp.int32),
            norms=jnp.asarray(arrays["norms"], jnp.float32),
            valid=jnp.asarray(arrays["valid"], bool),
        )
        ids = np.asarray(arrays["ids"])
        valid = np.asarray(arrays["valid"])
        st._id_to_slot = {int(i): s for s, i in enumerate(ids) if valid[s]}
        st._free = [s for s in range(vecs.shape[0] - 1, -1, -1) if not valid[s]]
        return st
