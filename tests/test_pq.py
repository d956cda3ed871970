"""k-means / ADC / PQ index tests (reference analog: PqIndex paths of
CompressionPerformanceTest + RecallDiagnosticTest, scaled for CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.api.config import PqConfig
from vector_db_tpu.index.brute import BruteForceIndex
from vector_db_tpu.index.pq import PqIndex
from vector_db_tpu.ops import adc
from vector_db_tpu.ops.kmeans import kmeans_fit, subspace_kmeans_fit


class TestKmeans:
    def test_recovers_clusters(self, rng):
        # 4 well-separated blobs
        centers = np.asarray([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
        data = np.concatenate(
            [c + 0.1 * rng.standard_normal((50, 2)).astype(np.float32) for c in centers]
        )
        cents, assign = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(data), k=4, iters=10)
        cents = np.asarray(cents)
        # every true center has a learned centroid within 0.5
        d = np.linalg.norm(centers[:, None] - cents[None], axis=2)
        assert (d.min(axis=1) < 0.5).all()
        # assignments agree within blobs
        a = np.asarray(assign).reshape(4, 50)
        assert all(len(np.unique(row)) == 1 for row in a)

    def test_deterministic(self, rng):
        data = jnp.asarray(rng.standard_normal((100, 4)).astype(np.float32))
        c1, _ = kmeans_fit(jax.random.PRNGKey(42), data, k=8, iters=5)
        c2, _ = kmeans_fit(jax.random.PRNGKey(42), data, k=8, iters=5)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_n_valid_masks_padding(self, rng):
        data = rng.standard_normal((64, 4)).astype(np.float32)
        padded = np.concatenate([data, np.full((64, 4), 1e6, np.float32)])
        c1, _ = kmeans_fit(jax.random.PRNGKey(1), jnp.asarray(padded), k=4, iters=8,
                           n_valid=jnp.asarray(64))
        # no centroid should sit near the garbage padding
        assert np.abs(np.asarray(c1)).max() < 1e3

    def test_subspace_shapes(self, rng):
        data = jnp.asarray(rng.standard_normal((128, 16)).astype(np.float32))
        cb = subspace_kmeans_fit(jax.random.PRNGKey(0), data, num_subspaces=4, k=8, iters=4)
        assert cb.shape == (4, 8, 4)


class TestAdc:
    def _setup(self, rng, n=64, dim=8, s=4, k=8):
        data = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))
        cb = subspace_kmeans_fit(jax.random.PRNGKey(0), data, s, k=k, iters=6)
        codes = adc.pq_encode(data, cb)
        return data, cb, codes

    def test_encode_shapes_and_range(self, rng):
        data, cb, codes = self._setup(rng)
        assert codes.shape == (64, 4) and codes.dtype == jnp.uint8
        assert int(jnp.max(codes)) < 8

    def test_tables_match_direct(self, rng):
        data, cb, codes = self._setup(rng)
        q = data[:3]
        tables = adc.build_distance_tables(q, cb)
        # brute-force check one entry
        q0_sub = np.asarray(q[0]).reshape(4, 2)
        want = ((q0_sub[1] - np.asarray(cb)[1, 3]) ** 2).sum()
        assert float(tables[0, 1, 3]) == pytest.approx(float(want), rel=1e-2, abs=1e-2)

    def test_adc_approximates_true_distance(self, rng):
        data, cb, codes = self._setup(rng)
        q = data[:5]
        tables = adc.build_distance_tables(q, cb)
        d_adc = np.asarray(adc.adc_distances(tables, codes))
        d_true = np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(data)[None]) ** 2).sum(-1)
        )
        # quantized distance correlates strongly with the true distance
        for i in range(5):
            assert np.corrcoef(d_adc[i], d_true[i])[0, 1] > 0.8

    def test_gather_and_onehot_agree(self, rng):
        data, cb, codes = self._setup(rng)
        q = data[:4]
        tables = adc.build_distance_tables(q, cb)
        d1, i1 = adc.adc_scan_topk(tables, codes, jnp.ones(64, bool), 5,
                                   block_n=32, impl="gather")
        d2, i2 = adc.adc_scan_topk(tables, codes, jnp.ones(64, bool), 5,
                                   block_n=32, impl="onehot")
        # bf16 matmul tolerance
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=0.05, atol=0.1)

    def test_scan_respects_valid(self, rng):
        data, cb, codes = self._setup(rng)
        valid = jnp.zeros(64, bool).at[10].set(True)
        tables = adc.build_distance_tables(data[:2], cb)
        _, idx = adc.adc_scan_topk(tables, codes, valid, 3, block_n=32)
        idx = np.asarray(idx)
        assert (idx[:, 0] == 10).all()
        assert (idx[:, 1:] == -1).all()


class TestPqIndex:
    def _build(self, rng, n=256, dim=16):
        cfg = PqConfig(num_subspaces=4, num_centroids=16, training_iterations=8)
        idx = PqIndex(dim, n, "l2", cfg)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx.add_batch(range(n), vecs)
        idx.build()
        return idx, vecs

    def test_untrained_falls_back_to_exact(self, rng):
        cfg = PqConfig(num_subspaces=4, num_centroids=16)
        idx = PqIndex(8, 128, "l2", cfg)
        vecs = rng.standard_normal((10, 8)).astype(np.float32)
        idx.add_batch(range(10), vecs)
        ids, d = idx.search(vecs[3], 1)
        assert ids[0] == 3 and not idx.trained

    def test_trained_recall_vs_brute(self, rng):
        idx, vecs = self._build(rng)
        assert idx.trained
        brute = BruteForceIndex(16, 256)
        brute.add_batch(range(256), vecs)
        q = vecs[:20] + 0.01 * rng.standard_normal((20, 16)).astype(np.float32)
        pq_ids, _ = idx.search_batch(q, 10)
        gt_ids, _ = brute.search_batch(q, 10)
        recall = np.mean([
            len(set(pq_ids[i]) & set(gt_ids[i])) / 10 for i in range(20)
        ])
        assert recall >= 0.4  # pure-ADC floor on random data, 4 subspaces

    def test_refine_lifts_recall(self, rng):
        cfg = PqConfig(num_subspaces=4, num_centroids=16, training_iterations=8,
                       refine_k=64)
        idx = PqIndex(16, 256, "l2", cfg)
        vecs = rng.standard_normal((256, 16)).astype(np.float32)
        idx.add_batch(range(256), vecs)
        idx.build()
        brute = BruteForceIndex(16, 256)
        brute.add_batch(range(256), vecs)
        q = vecs[:20]
        pq_ids, _ = idx.search_batch(q, 10)
        gt_ids, _ = brute.search_batch(q, 10)
        recall = np.mean([
            len(set(pq_ids[i]) & set(gt_ids[i])) / 10 for i in range(20)
        ])
        assert recall >= 0.9

    def test_add_after_train_encodes(self, rng):
        # refine_k makes self-retrieval exact even under heavy quantization
        cfg = PqConfig(num_subspaces=4, num_centroids=16, training_iterations=8,
                       refine_k=64)
        idx = PqIndex(16, 256, "l2", cfg)
        vecs = rng.standard_normal((200, 16)).astype(np.float32)
        idx.add_batch(range(200), vecs)
        idx.build()
        nv = rng.standard_normal(16).astype(np.float32)
        idx.add(1000, nv)
        ids, _ = idx.search(nv, 1)
        assert ids[0] == 1000

    def test_persistence_roundtrip(self, rng, tmp_store_path):
        idx, vecs = self._build(rng)
        arrays = idx.state_arrays()
        idx2 = PqIndex(16, 256, "l2", PqConfig(num_subspaces=4, num_centroids=16))
        idx2.load_state_arrays(arrays)
        assert idx2.trained and idx2.size() == 256
        ids1, _ = idx.search(vecs[7], 5)
        ids2, _ = idx2.search(vecs[7], 5)
        np.testing.assert_array_equal(ids1, ids2)

    def test_subspace_autoadjust(self):
        idx = PqIndex(10, 128, "l2", PqConfig(num_subspaces=4))
        assert idx.config.num_subspaces == 2  # 10 % 4 != 0 -> largest divisor <= 4

    def test_stats(self, rng):
        idx, _ = self._build(rng)
        s = idx.stats()
        assert s["trained"] and s["compression_ratio"] == pytest.approx(16.0)
