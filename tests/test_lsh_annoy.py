"""LSH + Annoy index tests (reference analog: LshIndex/AnnoyIndex behaviour
in VectorDatabaseExample + native test suites, scaled for CPU CI)."""

import numpy as np
import pytest

from vector_db_tpu.api.config import AnnoyConfig, LshConfig
from vector_db_tpu.index.annoy import AnnoyIndex
from vector_db_tpu.index.brute import BruteForceIndex
from vector_db_tpu.index.lsh import LshIndex


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(42)
    n, dim = 400, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    brute = BruteForceIndex(dim, 512)
    brute.add_batch(range(n), vecs)
    return vecs, brute


@pytest.fixture(scope="module")
def clustered():
    """Clustered corpus — the regime LSH/Annoy are designed for (the
    reference's published 75%/85% recall rows, README.md:225-232, come from
    structured data; on isotropic 16-d Gaussian noise the true 10-NN are
    barely closer than random pairs, so no hashing scheme can separate them
    without scanning everything)."""
    rng = np.random.default_rng(42)
    dim, nc, per = 16, 40, 10
    centers = rng.standard_normal((nc, dim)).astype(np.float32) * 3.0
    vecs = (
        centers[:, None, :]
        + 0.15 * rng.standard_normal((nc, per, dim))
    ).reshape(-1, dim).astype(np.float32)
    brute = BruteForceIndex(dim, 512)
    brute.add_batch(range(len(vecs)), vecs)
    q = vecs[::13][:30] + 0.05 * rng.standard_normal((30, dim)).astype(
        np.float32
    )
    gt, _ = brute.search_batch(q, 10)
    return vecs, q, gt


class TestLsh:
    def _build(self, vecs):
        idx = LshIndex(16, 512, "l2", LshConfig(num_tables=8, num_bits=8, bucket_width=4.0))
        idx.add_batch(range(len(vecs)), vecs)
        return idx

    def test_self_retrieval(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        ids, d = idx.search_batch(vecs[:20], 1)
        assert (ids[:, 0] == np.arange(20)).all()

    def test_recall_floor_honest(self, clustered):
        # reference floor: LSH ~75% (README.md:225-232).  Backfill DISABLED:
        # every returned id came out of a real bucket collision, so this
        # measures LSH quality, not the exact-scan fallback.
        vecs, q, g = clustered
        idx = LshIndex(
            16, 512, "l2",
            LshConfig(num_tables=8, num_bits=8, bucket_width=4.0,
                      backfill=False),
        )
        idx.add_batch(range(len(vecs)), vecs)
        a, _ = idx.search_batch(q, 10)
        recall = np.mean([len(set(a[i]) & set(g[i])) / 10 for i in range(30)])
        assert recall >= 0.75
        # the counter exposes exactly how many rows collisions missed
        assert idx.stats()["backfill_rows"] < 0.2 * 30 * 10

    def test_random_data_exposes_backfill(self, dataset):
        # on isotropic noise the collision sets are nearly empty; the
        # counters must expose that instead of silently masking it
        vecs, brute = dataset
        idx = LshIndex(
            16, 512, "l2",
            LshConfig(num_tables=8, num_bits=8, bucket_width=4.0,
                      hamming_radius=0, backfill=False),
        )
        idx.add_batch(range(len(vecs)), vecs)
        rng = np.random.default_rng(1)
        q = vecs[:30] + 0.05 * rng.standard_normal((30, 16)).astype(np.float32)
        a, _ = idx.search_batch(q, 10)
        assert idx.stats()["backfill_rows"] > 0
        assert (a < 0).any()  # honest: short rows stay -1 when disabled

    def test_backfill_when_no_collisions(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        faraway = np.full((1, 16), 100.0, np.float32)  # empty buckets
        ids, d = idx.search_batch(faraway, 5)
        assert (ids[0] >= 0).all()  # exact backfill filled in
        # (reference random-fills empty candidate sets, LshIndex.java:261-265)

    def test_rebuild_regenerates(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        old = np.asarray(idx.planes).copy()
        idx.build()
        assert not np.allclose(old, np.asarray(idx.planes))
        ids, _ = idx.search(vecs[3], 1)
        assert ids[0] == 3

    def test_remove(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        idx.remove(7)
        ids, _ = idx.search(vecs[7], 5)
        assert 7 not in ids

    def test_persistence(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        idx2 = LshIndex(16, 512, "l2", LshConfig(num_tables=8, num_bits=8))
        idx2.load_state_arrays(idx.state_arrays())
        a, _ = idx.search(vecs[9], 5)
        b, _ = idx2.search(vecs[9], 5)
        np.testing.assert_array_equal(a, b)


class TestAnnoy:
    def _build(self, vecs, **kw):
        cfg = AnnoyConfig(num_trees=8, leaf_size=16, **kw)
        idx = AnnoyIndex(16, 512, "l2", cfg)
        idx.rebuild_threshold = 100  # rebuild during the add stream
        idx.add_batch(range(len(vecs)), vecs)
        idx.build()
        return idx

    def test_built_and_self_retrieval(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        assert idx.stats()["built"]
        ids, _ = idx.search_batch(vecs[:20], 1)
        assert (ids[:, 0] == np.arange(20)).all()

    def test_recall_floor_honest(self, dataset):
        # reference floor: ANNOY ~85% (README.md:225-232).  Backfill DISABLED
        # so the forest itself must deliver the recall (measured 1.0 here).
        vecs, brute = dataset
        idx = self._build(vecs, backfill=False)
        rng = np.random.default_rng(2)
        q = vecs[:30] + 0.05 * rng.standard_normal((30, 16)).astype(np.float32)
        a, _ = idx.search_batch(q, 10)
        g, _ = brute.search_batch(q, 10)
        recall = np.mean([len(set(a[i]) & set(g[i])) / 10 for i in range(30)])
        assert recall >= 0.85
        assert idx.stats()["backfill_rows"] == 0

    def test_recall_floor_clustered(self, clustered):
        vecs, q, g = clustered
        cfg = AnnoyConfig(num_trees=8, leaf_size=16, backfill=False)
        idx = AnnoyIndex(16, 512, "l2", cfg)
        idx.rebuild_threshold = 100
        idx.add_batch(range(len(vecs)), vecs)
        idx.build()
        a, _ = idx.search_batch(q, 10)
        recall = np.mean([len(set(a[i]) & set(g[i])) / 10 for i in range(30)])
        assert recall >= 0.85

    def test_pending_vectors_searchable(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        nv = np.random.default_rng(3).standard_normal(16).astype(np.float32)
        idx.rebuild_threshold = 10_000  # keep it pending
        idx.add(900, nv)
        assert idx.stats()["pending"] >= 1
        ids, _ = idx.search(nv, 1)
        assert ids[0] == 900  # visible before rebuild

    def test_remove(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        idx.remove(11)
        ids, _ = idx.search(vecs[11], 5)
        assert 11 not in ids

    def test_persistence(self, dataset):
        vecs, _ = dataset
        idx = self._build(vecs)
        idx2 = AnnoyIndex(16, 512, "l2", AnnoyConfig(num_trees=8, leaf_size=16))
        idx2.load_state_arrays(idx.state_arrays())
        assert idx2.stats()["built"]
        a, _ = idx.search(vecs[9], 5)
        b, _ = idx2.search(vecs[9], 5)
        np.testing.assert_array_equal(a, b)

    def test_deterministic_build(self, dataset):
        vecs, _ = dataset
        a = self._build(vecs)
        b = self._build(vecs)
        np.testing.assert_array_equal(
            np.asarray(a.leaf_items), np.asarray(b.leaf_items)
        )
