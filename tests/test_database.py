"""VectorDatabase facade tests.

Mirrors the reference's integration suite
(VectorDatabaseIntegrationTest.java: add/retrieve :64-87, delete :93-115,
planted-target search :121-165, persistence+reload :171-202) on the
brute-force index; per-index variants live in the index test files.
"""

import numpy as np
import pytest

from vector_db_tpu import (
    CompressionConfig,
    IndexType,
    SearchResult,
    Vector,
    VectorDatabase,
)


def make_db(path=None, **kw):
    b = (
        VectorDatabase.builder()
        .with_dimension(10)
        .with_max_elements(1000)
        .with_index_type(IndexType.BRUTE)
    )
    if path:
        b = b.with_storage_path(path)
    return b.build()


class TestCrud:
    def test_add_and_retrieve(self, rng):
        db = make_db()
        v = rng.standard_normal(10).astype(np.float32)
        assert db.add_vector(7, v)
        got = db.get_vector(7)
        assert got is not None and got.id == 7
        np.testing.assert_allclose(got.values, v, rtol=1e-6)
        assert db.size() == 1

    def test_duplicate_add_rejected(self, rng):
        db = make_db()
        assert db.add_vector(1, np.ones(10))
        assert not db.add_vector(1, np.zeros(10))

    def test_dim_mismatch_rejected(self):
        db = make_db()
        assert not db.add_vector(1, np.ones(11))

    def test_delete(self, rng):
        db = make_db()
        db.add_vector(1, rng.standard_normal(10))
        assert db.delete_vector(1)
        assert db.get_vector(1) is None
        assert not db.delete_vector(1)
        assert db.size() == 0

    def test_deleted_vector_not_searchable(self, rng):
        db = make_db()
        target = np.ones(10, np.float32)
        db.add_vector(1, target)
        for i in range(2, 30):
            db.add_vector(i, rng.standard_normal(10))
        db.delete_vector(1)
        ids = [r.id for r in db.search(target, 5)]
        assert 1 not in ids


class TestSearch:
    def test_planted_target_found(self, rng):
        # reference: HnswIndexTest.java:135-164 — plant all-ones, query 0.9s
        db = make_db()
        db.add_vector(999, np.ones(10, np.float32))
        for i in range(100):
            db.add_vector(i, rng.uniform(-1, 1, 10).astype(np.float32))
        res = db.search(np.full(10, 0.9, np.float32), 5)
        assert res[0].id == 999

    def test_results_sorted_and_sized(self, rng):
        db = make_db()
        for i in range(50):
            db.add_vector(i, rng.standard_normal(10))
        res = db.search(rng.standard_normal(10).astype(np.float32), 10)
        assert len(res) == 10
        dists = [r.distance for r in res]
        assert dists == sorted(dists)

    def test_similarity_formula(self):
        # reference: SearchResult.java:33-40
        r = SearchResult(1, 2.0)
        assert r.similarity == pytest.approx(0.5)

    def test_empty_db(self, rng):
        db = make_db()
        assert db.search(np.zeros(10, np.float32), 5) == []

    def test_search_batch(self, rng):
        db = make_db()
        vecs = rng.standard_normal((64, 10)).astype(np.float32)
        db.add_batch(range(64), vecs)
        res = db.search_batch(vecs[:8], 1)
        assert [r[0].id for r in res] == list(range(8))
        # norm-identity distances carry ~1e-4 f32 cancellation error -> sqrt ~1e-2
        assert all(r[0].distance < 0.5 for r in res)


class TestPersistence:
    def test_save_and_reload(self, rng, tmp_store_path):
        vecs = rng.standard_normal((20, 10)).astype(np.float32)
        db = make_db(tmp_store_path)
        db.add_batch(range(20), vecs)
        db.close()

        db2 = make_db(tmp_store_path)
        assert db2.size() == 20
        np.testing.assert_allclose(db2.get_vector(3).values, vecs[3], rtol=1e-6)
        res = db2.search(vecs[5], 1)
        assert res[0].id == 5

    def test_load_missing_returns_false(self, tmp_store_path):
        db = make_db()
        db.storage_path = tmp_store_path
        assert not db.load_from_storage()

    def test_closed_db_raises(self, tmp_store_path):
        db = make_db()
        db.close()
        with pytest.raises(RuntimeError):
            db.size()

    def test_corrupt_checkpoint_degrades(self, rng, tmp_store_path):
        import os

        os.makedirs(tmp_store_path, exist_ok=True)
        with open(os.path.join(tmp_store_path, "meta.json"), "w") as f:
            f.write("{not json")
        with open(os.path.join(tmp_store_path, "arrays.npz"), "w") as f:
            f.write("junk")
        db = make_db(tmp_store_path)  # should not raise
        assert db.size() == 0


class TestCompressionConfig:
    def test_ratio_math(self):
        # reference: CompressionConfig.java:180-192 — 512d/64sub -> 32x
        cfg = CompressionConfig.recommended_config(512)
        assert cfg.num_subspaces == 64
        assert cfg.compression_ratio(512) == pytest.approx(32.0)
        assert cfg.memory_savings_pct(512) == pytest.approx(96.875)

    def test_presets(self):
        assert not CompressionConfig.default_config().enabled
        assert CompressionConfig.high_recall_config(512).num_subspaces == 128
        assert CompressionConfig.high_compression_config(512).num_subspaces == 32

    def test_effective_subspaces_divides(self):
        cfg = CompressionConfig.pq_config(7)
        sub = cfg.effective_subspaces(512)
        assert 512 % sub == 0


class TestVectorType:
    def test_euclidean(self):
        a = Vector(1, [0.0, 0.0, 3.0])
        b = Vector(2, [0.0, 4.0, 0.0])
        assert a.euclidean_distance(b) == pytest.approx(5.0)

    def test_cosine(self):
        a = Vector(1, [1.0, 0.0])
        b = Vector(2, [0.0, 1.0])
        assert a.cosine_similarity(b) == pytest.approx(0.0)
        assert a.cosine_similarity(a) == pytest.approx(1.0)

    def test_normalize(self):
        v = Vector(1, [3.0, 4.0]).normalize()
        assert v.norm() == pytest.approx(1.0)

    def test_dim_mismatch(self):
        with pytest.raises(ValueError):
            Vector(1, [1.0]).euclidean_distance(Vector(2, [1.0, 2.0]))


class TestSearchModeBuilder:
    def test_with_search_mode_shortcut(self, rng):
        vecs = rng.standard_normal((600, 32)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(32)
              .with_max_elements(1024).with_index_type(IndexType.HNSWPQ)
              .with_search_mode("adc_fast").build())
        db.add_batch(range(600), vecs)
        assert db.index.config.search_mode == "adc_fast"
        r = db.search(vecs[5], 3)
        assert r and r[0].id == 5
        db.close()

    def test_with_search_mode_wrong_type_raises(self):
        with pytest.raises(ValueError):
            (VectorDatabase.builder().with_dimension(8).with_max_elements(64)
             .with_index_type(IndexType.BRUTE).with_search_mode("pca").build())
