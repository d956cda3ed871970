"""VectorStore tests (reference analog: native VectorStore + storage tests)."""

import numpy as np
import pytest

from vector_db_tpu.core.store import VectorStore


class TestVectorStore:
    def test_add_and_get(self, rng):
        st = VectorStore(100, 8)
        v = rng.standard_normal(8).astype(np.float32)
        slot = st.add(5, v)
        assert slot is not None
        np.testing.assert_allclose(st.get(5), v, rtol=1e-6)
        assert st.size() == 1

    def test_duplicate_rejected(self, rng):
        st = VectorStore(100, 4)
        assert st.add(1, np.ones(4)) is not None
        assert st.add(1, np.zeros(4)) is None
        np.testing.assert_allclose(st.get(1), np.ones(4))

    def test_capacity_rounds_to_128(self):
        st = VectorStore(100, 4)
        assert st.capacity == 128
        st2 = VectorStore(129, 4)
        assert st2.capacity == 256

    def test_capacity_overflow(self, rng):
        st = VectorStore(1, 4)  # rounds to 128
        ids = list(range(200))
        vecs = rng.standard_normal((200, 4)).astype(np.float32)
        accepted, _ = st.add_batch(ids, vecs)
        assert len(accepted) == 128

    def test_remove_and_reuse(self, rng):
        st = VectorStore(128, 4)
        st.add(1, np.ones(4))
        assert st.remove(1) == st.add(2, np.full(4, 2.0))  # slot reused
        assert st.get(1) is None
        assert not st.contains(1)
        np.testing.assert_allclose(st.get(2), np.full(4, 2.0))

    def test_remove_missing(self):
        st = VectorStore(128, 4)
        assert st.remove(42) is None

    def test_norms_cached(self, rng):
        st = VectorStore(128, 16)
        v = rng.standard_normal(16).astype(np.float32)
        slot = st.add(0, v)
        got = float(np.asarray(st.state.norms[slot]))
        assert got == pytest.approx(float((v * v).sum()), rel=1e-5)

    def test_batch_padding_correct(self, rng):
        # batch of 3 pads to 4; the pad row must not corrupt state
        st = VectorStore(128, 4)
        vecs = rng.standard_normal((3, 4)).astype(np.float32)
        accepted, slots = st.add_batch([10, 11, 12], vecs)
        assert accepted == [10, 11, 12]
        assert st.size() == 3
        for i, vid in enumerate(accepted):
            np.testing.assert_allclose(st.get(vid), vecs[i], rtol=1e-6)

    def test_host_roundtrip(self, rng):
        st = VectorStore(128, 8)
        vecs = rng.standard_normal((5, 8)).astype(np.float32)
        st.add_batch([3, 1, 4, 1, 5], vecs)  # dup id 1 rejected
        st.remove(4)
        st2 = VectorStore.from_host(st.to_host())
        assert st2.size() == st.size()
        assert set(st2.ids()) == {3, 1, 5}
        np.testing.assert_allclose(st2.get(3), vecs[0], rtol=1e-6)
        # freelist restored: can still fill to capacity
        assert st2.add(99, np.zeros(8)) is not None

    def test_dim_mismatch_raises(self):
        st = VectorStore(128, 4)
        with pytest.raises(ValueError):
            st.add_batch([1], np.zeros((1, 5), np.float32))
