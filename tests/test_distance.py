"""Distance-kernel unit tests (reference analog: util/VectorUtilsTest.java,
core/VectorTest.java math assertions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.ops import distance as D
from vector_db_tpu.ops import topk as T


def _np_sq_l2(q, b):
    return ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)


class TestPairwise:
    def test_sq_l2_matches_numpy(self, rng):
        q = rng.standard_normal((7, 33)).astype(np.float32)
        b = rng.standard_normal((19, 33)).astype(np.float32)
        got = np.asarray(D.pairwise_sq_l2(jnp.asarray(q), jnp.asarray(b)))
        np.testing.assert_allclose(got, _np_sq_l2(q, b), rtol=5e-3, atol=0.1)

    def test_cosine_matches_numpy(self, rng):
        q = rng.standard_normal((5, 16)).astype(np.float32)
        b = rng.standard_normal((11, 16)).astype(np.float32)
        got = np.asarray(D.pairwise_cosine_dist(jnp.asarray(q), jnp.asarray(b)))
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        want = 1.0 - qn @ bn.T
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_self_distance_zero(self, rng):
        x = rng.standard_normal((4, 8)).astype(np.float32)
        d = np.asarray(D.pairwise_sq_l2(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(np.diag(d), 0.0, atol=0.1)

    def test_unknown_metric_raises(self, rng):
        x = jnp.zeros((2, 4))
        with pytest.raises(ValueError):
            D.pairwise_dist(x, x, metric="manhattan")


class TestBlockedKnn:
    @pytest.mark.parametrize("n,block", [(100, 32), (257, 64), (64, 128)])
    def test_matches_full_scan(self, rng, n, block):
        d, q_n, k = 24, 9, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((q_n, d)).astype(np.float32)
        valid = np.ones(n, bool)
        dists, idx = D.blocked_knn(
            jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid), k, block_n=block
        )
        full = _np_sq_l2(q, base)
        want_idx = np.argsort(full, axis=1)[:, :k]
        want_d = np.take_along_axis(full, want_idx, axis=1)
        # the norm-identity kernel carries f32 cancellation error ~1e-2
        np.testing.assert_allclose(np.asarray(dists), want_d, rtol=5e-3, atol=0.15)
        # indices can permute under distance ties; compare via distances
        got_d = np.take_along_axis(full, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got_d, want_d, rtol=5e-3, atol=0.15)

    def test_respects_valid_mask(self, rng):
        base = rng.standard_normal((50, 8)).astype(np.float32)
        q = base[:3]  # exact self-matches
        valid = np.ones(50, bool)
        valid[:3] = False  # mask out the self-matches
        dists, idx = D.blocked_knn(
            jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid), 5, block_n=32
        )
        idx = np.asarray(idx)
        assert not np.isin(idx, [0, 1, 2]).any()

    def test_k_larger_than_valid_pads(self, rng):
        base = rng.standard_normal((16, 4)).astype(np.float32)
        valid = np.zeros(16, bool)
        valid[:3] = True
        dists, idx = D.blocked_knn(
            jnp.ones((1, 4)), jnp.asarray(base), jnp.asarray(valid), 8, block_n=16
        )
        idx, dists = np.asarray(idx)[0], np.asarray(dists)[0]
        assert (idx[:3] >= 0).all()
        assert (idx[3:] == -1).all()
        assert np.isinf(dists[3:]).all()

    def test_sorted_ascending(self, rng):
        base = rng.standard_normal((40, 6)).astype(np.float32)
        q = rng.standard_normal((4, 6)).astype(np.float32)
        dists, _ = D.blocked_knn(
            jnp.asarray(q), jnp.asarray(base), jnp.ones(40, bool), 10, block_n=16
        )
        dists = np.asarray(dists)
        assert (np.diff(dists, axis=1) >= -1e-6).all()


class TestTopK:
    def test_smallest_k(self):
        d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
        vals, idx = T.smallest_k(d, 2)
        np.testing.assert_allclose(np.asarray(vals)[0], [0.5, 1.0])
        np.testing.assert_array_equal(np.asarray(idx)[0], [3, 1])

    def test_merge_topk(self):
        da = jnp.asarray([[1.0, 4.0]])
        ia = jnp.asarray([[10, 40]], dtype=jnp.int32)
        db = jnp.asarray([[2.0, 3.0]])
        ib = jnp.asarray([[20, 30]], dtype=jnp.int32)
        d, i = T.merge_topk(da, ia, db, ib, 3)
        np.testing.assert_allclose(np.asarray(d)[0], [1.0, 2.0, 3.0])
        np.testing.assert_array_equal(np.asarray(i)[0], [10, 20, 30])

    def test_unique_smallest_k(self):
        dists = jnp.asarray([5.0, 1.0, 3.0, 1.5, 2.0])
        ids = jnp.asarray([7, 3, 7, 3, 9], dtype=jnp.int32)
        d, i = T.unique_smallest_k(dists, ids, 4)
        np.testing.assert_array_equal(np.asarray(i), [3, 9, 7, -1])
        np.testing.assert_allclose(np.asarray(d)[:3], [1.0, 2.0, 3.0])


class TestInt8Refine:
    def test_matches_f32_rerank_ranking(self):
        import jax.numpy as jnp
        from vector_db_tpu.ops.distance import (
            blocked_rerank, blocked_rerank_int8, pack_int8_rows,
        )

        rng = np.random.default_rng(42)
        n, d, qn, r, k = 1024, 64, 16, 128, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        q = base[:qn] + 0.05 * rng.standard_normal((qn, d)).astype(np.float32)
        cand = rng.integers(0, n, (qn, r)).astype(np.int32)
        cand[:, 0] = np.arange(qn)  # true neighbor present
        packed, scales = pack_int8_rows(jnp.asarray(base))
        d8, s8 = blocked_rerank_int8(jnp.asarray(q), packed, scales,
                                     jnp.asarray(cand), k)
        df, sf = blocked_rerank(jnp.asarray(q), jnp.asarray(base),
                                jnp.asarray(cand), k)
        # top-1 agrees (self row), distances within quantization error
        np.testing.assert_array_equal(np.asarray(s8)[:, 0],
                                      np.asarray(sf)[:, 0])
        np.testing.assert_allclose(np.asarray(d8)[:, 0],
                                   np.asarray(df)[:, 0], atol=0.2)

    def test_exact_norms_tighten_distances(self):
        """b_norms (exact write-time ||v||^2) leaves only the cross term
        quantized: the refined distances sit strictly closer to exact f32
        than the rederived-norm variant, and a zero query recovers exact
        squared norms bit-for-bit (no cross term at all)."""
        import jax.numpy as jnp
        from vector_db_tpu.ops.distance import (
            blocked_rerank, blocked_rerank_int8, pack_int8_rows,
        )

        rng = np.random.default_rng(3)
        n, d, qn, r, k = 512, 64, 8, 128, 10
        base = rng.standard_normal((n, d)).astype(np.float32)
        norms = jnp.asarray((base * base).sum(1))
        q = base[:qn] + 0.05 * rng.standard_normal((qn, d)).astype(np.float32)
        cand = np.broadcast_to(np.arange(r, dtype=np.int32), (qn, r)).copy()
        packed, scales = pack_int8_rows(jnp.asarray(base))
        dn, sn = blocked_rerank_int8(jnp.asarray(q), packed, scales,
                                     jnp.asarray(cand), k, b_norms=norms)
        dq, _ = blocked_rerank_int8(jnp.asarray(q), packed, scales,
                                    jnp.asarray(cand), k)
        df, sf = blocked_rerank(jnp.asarray(q), jnp.asarray(base),
                                jnp.asarray(cand), k)
        err_n = np.abs(np.asarray(dn) - np.asarray(df)).mean()
        err_q = np.abs(np.asarray(dq) - np.asarray(df)).mean()
        assert err_n <= err_q + 1e-9, (err_n, err_q)
        np.testing.assert_array_equal(np.asarray(sn)[:, 0],
                                      np.asarray(sf)[:, 0])
        # zero query: distance == ||v||^2 exactly (cross term vanishes)
        z = jnp.zeros((1, d), jnp.float32)
        c0 = jnp.arange(k, dtype=jnp.int32)[None, :]
        d0, s0 = blocked_rerank_int8(z, packed, scales, c0, k, b_norms=norms)
        np.testing.assert_allclose(
            np.sort(np.asarray(d0)[0]),
            np.sort(np.asarray(norms)[:k]), rtol=1e-6)

    def test_masked_candidates(self):
        import jax.numpy as jnp
        from vector_db_tpu.ops.distance import (
            blocked_rerank_int8, pack_int8_rows,
        )

        rng = np.random.default_rng(1)
        base = rng.standard_normal((256, 16)).astype(np.float32)
        packed, scales = pack_int8_rows(jnp.asarray(base))
        cand = np.full((2, 64), -1, np.int32)
        cand[:, 0] = [3, 7]
        d8, s8 = blocked_rerank_int8(jnp.asarray(base[:2]), packed, scales,
                                     jnp.asarray(cand), 5)
        assert np.asarray(s8)[0, 0] == 3 and np.asarray(s8)[1, 0] == 7
        assert np.isinf(np.asarray(d8)[:, 1]).all()


class TestBf16PoolScan:
    """bf16 selection-buffer candidate scan (ops/distance.bf16_pool_scan) —
    containment-grade selection the exact refine orders (hnsw_pq
    bf16_scan_refine wires both together for search_mode="scan_bf16")."""

    def _gt(self, q, base, valid, k, metric="l2"):
        import jax.numpy as jnp

        from vector_db_tpu.ops.distance import blocked_knn

        _, i = blocked_knn(jnp.asarray(q), jnp.asarray(base),
                           jnp.asarray(valid), k, metric=metric,
                           block_n=512)
        return np.asarray(i)

    @pytest.mark.parametrize("block_n", [0, 700, 1024])
    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    def test_contains_true_topk(self, rng, block_n, metric):
        import jax.numpy as jnp

        from vector_db_tpu.ops.distance import bf16_pool_scan

        base = rng.standard_normal((3000, 32)).astype(np.float32)
        q = rng.standard_normal((16, 32)).astype(np.float32)
        valid = np.ones(3000, bool)
        gt = self._gt(q, base, valid, 10, metric)
        cand = np.asarray(bf16_pool_scan(
            jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid), 64,
            metric=metric, block_n=block_n))
        assert cand.shape == (16, 64)
        rec = np.mean([len(set(cand[i]) & set(gt[i])) / 10
                       for i in range(16)])
        assert rec >= 0.97, (block_n, metric, rec)

    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    @pytest.mark.parametrize("block_n", [0, 700])
    def test_mean_offset_corpus_centered(self, rng, metric, block_n):
        """Real embedding corpora have a mean component (v = mu + v_hat).
        Without f32 common-mode cancellation before the bf16 cast, scores
        sit at ~|mu|^2 magnitude where one bf16 ULP exceeds neighbor gaps
        (measured 31% pool recall at |mu| = 10 x noise); the mu-centered
        assembly must hold ranking."""
        import jax.numpy as jnp

        from vector_db_tpu.ops.distance import bf16_pool_scan

        base = rng.standard_normal((2000, 64)).astype(np.float32)
        base += 10.0  # ||v||^2 ~ 6600; bf16 ULP there = 32
        q = rng.standard_normal((8, 64)).astype(np.float32) + 10.0
        valid = np.ones(2000, bool)
        gt = self._gt(q, base, valid, 10, metric)
        cand = np.asarray(bf16_pool_scan(
            jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid), 64,
            metric=metric, block_n=block_n))
        rec = np.mean([len(set(cand[i]) & set(gt[i])) / 10 for i in range(8)])
        assert rec >= 0.9, (metric, block_n, rec)

    def test_respects_valid_mask_ragged_blocks(self, rng):
        """Deleted slots never appear, including slots re-scanned by the
        clamped ragged last block (n % block_n != 0)."""
        import jax.numpy as jnp

        from vector_db_tpu.ops.distance import bf16_pool_scan

        n = 1500  # 2 blocks of 1024 with a 548-row overlap re-scan
        base = rng.standard_normal((n, 32)).astype(np.float32)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        valid = np.ones(n, bool)
        dead = rng.choice(n, 300, replace=False)
        valid[dead] = False
        cand = np.asarray(bf16_pool_scan(
            jnp.asarray(q), jnp.asarray(base), jnp.asarray(valid), 32,
            block_n=1024))
        live = cand[cand >= 0]
        assert valid[live].all()
        # no duplicate slots from the overlap region
        for row in cand:
            r = row[row >= 0]
            assert len(set(r.tolist())) == len(r)

    def test_few_valid_pads_minus_one(self, rng):
        import jax.numpy as jnp

        from vector_db_tpu.ops.distance import bf16_pool_scan

        base = rng.standard_normal((256, 16)).astype(np.float32)
        valid = np.zeros(256, bool)
        valid[[5, 9]] = True
        cand = np.asarray(bf16_pool_scan(
            jnp.asarray(base[:2]), jnp.asarray(base), jnp.asarray(valid), 8))
        assert set(cand[cand >= 0].tolist()) <= {5, 9}
        assert (cand == -1).sum() >= 2 * 6
