"""Pallas fused-scan kernel tests (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.ops.pallas_kernels import fused_scan_topk


@pytest.fixture(scope="module")
def data(rng=None):
    r = np.random.default_rng(42)
    base = r.standard_normal((2048, 64)).astype(np.float32)
    q = r.standard_normal((16, 64)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(base)


class TestFusedScan:
    def test_top1_exact(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        d, i = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256)
        full = np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        )
        got1 = np.take_along_axis(full, np.asarray(i)[:, :1], 1)
        np.testing.assert_allclose(got1, np.sort(full, 1)[:, :1], rtol=1e-3, atol=0.1)

    def test_distances_are_true_squared(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        d, i = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256)
        full = np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        )
        gathered = np.take_along_axis(full, np.asarray(i), 1)
        np.testing.assert_allclose(np.asarray(d), gathered, rtol=1e-2, atol=0.2)

    def test_bucket_recall_floor(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        d, i = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256)
        full = np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        )
        gt = np.argsort(full, 1)[:, :5]
        rec = np.mean([
            len(set(np.asarray(i)[r].tolist()) & set(gt[r].tolist())) / 5
            for r in range(16)
        ])
        # one winner per 128-lane bucket and only 16 buckets at N=2048: the
        # tiny-N collision floor; at N=100k the kernel measures 97% R@10
        assert rec >= 0.65

    def test_masked_rows_never_returned(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        bn = bn.at[:64].set(jnp.inf)  # mask the first block's rows
        d, i = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256)
        assert not np.isin(np.asarray(i), np.arange(64)).any()

    def test_k_larger_than_buckets_pads(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        # N=2048 -> 16 buckets < k=20
        d, i = fused_scan_topk(q, base, bn, 20, q_tile=8, block_n=256)
        assert i.shape == (16, 20)
        assert (np.asarray(i)[:, 16:] == -1).all()

    def test_two_winners_per_bucket(self, data):
        q, base = data
        bn = jnp.sum(base * base, 1)
        d1, i1 = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256, winners=1)
        d2, i2 = fused_scan_topk(q, base, bn, 5, q_tile=8, block_n=256, winners=2)
        full = np.asarray(
            ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        )
        gt = np.argsort(full, 1)[:, :5]
        def rec(i):
            return np.mean([
                len(set(np.asarray(i)[r].tolist()) & set(gt[r].tolist())) / 5
                for r in range(16)
            ])
        assert rec(i2) >= rec(i1)  # second winner can only help

    def test_odd_sizes_padded(self):
        r = np.random.default_rng(3)
        base = jnp.asarray(r.standard_normal((1000, 48)).astype(np.float32))
        q = jnp.asarray(r.standard_normal((5, 48)).astype(np.float32))
        bn = jnp.sum(base * base, 1)
        d, i = fused_scan_topk(q, base, bn, 3, q_tile=8, block_n=256)
        assert i.shape == (5, 3)
        assert (np.asarray(i) < 1000).all()


class TestFusedRawPool:
    """fused_raw_pool: bf16 in-VMEM scan + strided-bucket pool (the
    scan_pallas candidate stage; pallas_scan_refine orders it exactly)."""

    def _setup(self, n=3000, d=64, q=16, offset=0.0, seed=3):
        r = np.random.default_rng(seed)
        base = (r.standard_normal((n, d)) + offset).astype(np.float32)
        qs = (r.standard_normal((q, d)) + offset).astype(np.float32)
        return jnp.asarray(qs), jnp.asarray(base)

    def _shadow(self, base, valid, metric="l2"):
        from vector_db_tpu.index.hnsw_pq import _build_scan16_shadow

        norms = jnp.sum(base * base, axis=1)
        return _build_scan16_shadow(base, norms, jnp.asarray(valid),
                                    metric, 1024)[:4]  # drop aux

    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    @pytest.mark.parametrize("offset", [0.0, 10.0])
    def test_pool_contains_topk(self, metric, offset):
        from vector_db_tpu.ops.distance import blocked_knn, normalize_rows
        from vector_db_tpu.ops.pallas_kernels import fused_raw_pool

        q, base = self._setup(offset=offset)
        valid = np.ones(base.shape[0], bool)
        base16, off, sc, cvec = self._shadow(base, valid, metric)
        qq = normalize_rows(q) if metric == "cosine" else q
        vals, idx = fused_raw_pool(qq - cvec[None, :], base16, off, sc, 512)
        _, gt_i = blocked_knn(q, base, jnp.asarray(valid), 10,
                              metric=metric, block_n=512)
        got, gt = np.asarray(idx), np.asarray(gt_i)
        rec = np.mean([len(set(got[i]) & set(gt[i])) / 10
                       for i in range(q.shape[0])])
        # one winner per strided bucket: top-10 of 3000 in 512 buckets
        # collides occasionally; containment must stay high
        assert rec >= 0.9, (metric, offset, rec)

    def test_dead_slots_never_returned(self):
        from vector_db_tpu.ops.pallas_kernels import fused_raw_pool

        q, base = self._setup()
        valid = np.ones(base.shape[0], bool)
        dead = np.random.default_rng(0).choice(base.shape[0], 500,
                                               replace=False)
        valid[dead] = False
        base16, off, sc, cvec = self._shadow(base, valid)
        _, idx = fused_raw_pool(q - cvec[None, :], base16, off, sc, 512)
        live = np.asarray(idx)
        live = live[live >= 0]
        assert valid[live].all()

    def test_ragged_n_pads_in_shadow(self):
        """n not a multiple of w: the shadow builder pre-pads, pool indices
        stay inside the real corpus."""
        from vector_db_tpu.ops.pallas_kernels import fused_raw_pool

        q, base = self._setup(n=1111)
        valid = np.ones(1111, bool)
        base16, off, sc, cvec = self._shadow(base, valid)
        assert base16.shape[0] % 1024 == 0
        vals, idx = fused_raw_pool(q - cvec[None, :], base16, off, sc, 256)
        got = np.asarray(idx)
        assert got.max() < 1111
        # padded tail is +inf off -> never selected as finite
        assert (np.asarray(vals)[got >= 0] < np.inf).all()

    def test_small_batch_single_query(self):
        from vector_db_tpu.ops.pallas_kernels import fused_raw_pool

        q, base = self._setup(q=1)
        valid = np.ones(base.shape[0], bool)
        base16, off, sc, cvec = self._shadow(base, valid)
        vals, idx = fused_raw_pool(q - cvec[None, :], base16, off, sc, 256)
        assert idx.shape == (1, 256)
        full = ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        best = int(np.argmin(full[0]))
        assert best in set(np.asarray(idx)[0].tolist())


class TestFusedInt8Pool:
    """fused_int8_pool: s8 x s8 -> s32 in-VMEM scan + strided-bucket pool
    (the scan_pallas_int8 candidate stage; pallas_scan8_refine orders it
    exactly).  Same contract as TestFusedRawPool with a quantized shadow."""

    def _setup(self, n=3000, d=64, q=16, offset=0.0, seed=3):
        r = np.random.default_rng(seed)
        base = (r.standard_normal((n, d)) + offset).astype(np.float32)
        qs = (r.standard_normal((q, d)) + offset).astype(np.float32)
        return jnp.asarray(qs), jnp.asarray(base)

    def _shadow(self, base, valid, metric="l2"):
        from vector_db_tpu.index.hnsw_pq import _build_scan8_shadow

        norms = jnp.sum(base * base, axis=1)
        return _build_scan8_shadow(base, norms, jnp.asarray(valid),
                                   metric, 1024)[:4]  # drop aux

    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    @pytest.mark.parametrize("offset", [0.0, 10.0])
    def test_pool_contains_topk(self, metric, offset):
        from vector_db_tpu.ops.distance import blocked_knn, normalize_rows
        from vector_db_tpu.ops.pallas_kernels import fused_int8_pool

        q, base = self._setup(offset=offset)
        valid = np.ones(base.shape[0], bool)
        base8, off, sc, cvec = self._shadow(base, valid, metric)
        assert base8.dtype == jnp.int8
        qq = normalize_rows(q) if metric == "cosine" else q
        vals, idx = fused_int8_pool(qq - cvec[None, :], base8, off, sc, 512)
        _, gt_i = blocked_knn(q, base, jnp.asarray(valid), 10,
                              metric=metric, block_n=512)
        got, gt = np.asarray(idx), np.asarray(gt_i)
        rec = np.mean([len(set(got[i]) & set(gt[i])) / 10
                       for i in range(q.shape[0])])
        # strided buckets + int8 quantization noise: containment must
        # survive both (the exact refine orders the pool downstream)
        assert rec >= 0.9, (metric, offset, rec)

    def test_dead_slots_never_returned(self):
        from vector_db_tpu.ops.pallas_kernels import fused_int8_pool

        q, base = self._setup()
        valid = np.ones(base.shape[0], bool)
        dead = np.random.default_rng(0).choice(base.shape[0], 500,
                                               replace=False)
        valid[dead] = False
        base8, off, sc, cvec = self._shadow(base, valid)
        _, idx = fused_int8_pool(q - cvec[None, :], base8, off, sc, 512)
        live = np.asarray(idx)
        live = live[live >= 0]
        assert valid[live].all()

    def test_ragged_n_pads_in_shadow(self):
        from vector_db_tpu.ops.pallas_kernels import fused_int8_pool

        q, base = self._setup(n=1111)
        valid = np.ones(1111, bool)
        base8, off, sc, cvec = self._shadow(base, valid)
        assert base8.shape[0] % 1024 == 0
        vals, idx = fused_int8_pool(q - cvec[None, :], base8, off, sc, 256)
        got = np.asarray(idx)
        assert got.max() < 1111
        assert (np.asarray(vals)[got >= 0] < np.inf).all()

    def test_small_batch_single_query(self):
        from vector_db_tpu.ops.pallas_kernels import fused_int8_pool

        q, base = self._setup(q=1)
        valid = np.ones(base.shape[0], bool)
        base8, off, sc, cvec = self._shadow(base, valid)
        vals, idx = fused_int8_pool(q - cvec[None, :], base8, off, sc, 256)
        assert idx.shape == (1, 256)
        full = ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        best = int(np.argmin(full[0]))
        assert best in set(np.asarray(idx)[0].tolist())


class TestFusedInt8gPool:
    """fused_int8g_pool: the integer-epilogue variant (round-4 VERDICT #2)
    — global-scale shadow, i32 subtract + min-accumulate in the kernel.
    Same pool contract as fused_int8_pool."""

    def _setup(self, n=3000, d=64, q=16, offset=0.0, seed=3):
        r = np.random.default_rng(seed)
        base = (r.standard_normal((n, d)) + offset).astype(np.float32)
        qs = (r.standard_normal((q, d)) + offset).astype(np.float32)
        return jnp.asarray(qs), jnp.asarray(base)

    def _shadow(self, base, valid, metric="l2"):
        from vector_db_tpu.index.hnsw_pq import _build_scan8g_shadow

        norms = jnp.sum(base * base, axis=1)
        return _build_scan8g_shadow(base, norms, jnp.asarray(valid),
                                    metric, 1024)[:5]  # drop aux

    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    @pytest.mark.parametrize("offset", [0.0, 10.0])
    def test_pool_contains_topk(self, metric, offset):
        from vector_db_tpu.ops.distance import blocked_knn, normalize_rows
        from vector_db_tpu.ops.pallas_kernels import fused_int8g_pool

        q, base = self._setup(offset=offset)
        valid = np.ones(base.shape[0], bool)
        base8, off, sv, sgn, cvec = self._shadow(base, valid, metric)
        assert base8.dtype == jnp.int8
        qq = normalize_rows(q) if metric == "cosine" else q
        vals, idx = fused_int8g_pool(qq - cvec[None, :], base8, off, sv,
                                     sgn, 512)
        _, gt_i = blocked_knn(q, base, jnp.asarray(valid), 10,
                              metric=metric, block_n=512)
        got, gt = np.asarray(idx), np.asarray(gt_i)
        rec = np.mean([len(set(got[i]) & set(gt[i])) / 10
                       for i in range(q.shape[0])])
        assert rec >= 0.9, (metric, offset, rec)

    def test_matches_integer_oracle_exactly(self):
        """The kernel's bucket winners must equal the per-bucket argmin of
        the numpy-recomputed i32 score (the kernel is deterministic given
        the same q8/off_i — this checks the grid/epilogue wiring, not the
        quantization)."""
        from vector_db_tpu.ops.pallas_kernels import fused_int8g_pool

        q, base = self._setup(n=2048, d=64, q=8)
        valid = np.ones(2048, bool)
        base8, off, sv, sgn, cvec = self._shadow(base, valid)
        w = 512
        qc = q - cvec[None, :]
        vals, idx = fused_int8g_pool(qc, base8, off, sv, sgn, w)
        # recompute the integer score exactly as the wrapper does
        qn = np.asarray(qc)
        sq = max(np.abs(qn).max(), 1e-12) / 127.0
        q8 = np.clip(np.round(qn / sq), -127, 127).astype(np.int64)
        c = float(sgn) * float(sv) * sq
        off_np = np.asarray(off)
        off_i = np.where(np.isfinite(off_np),
                         np.clip(np.round(off_np / c), -(1 << 26), 1 << 26),
                         float(1 << 29)).astype(np.int64)
        cross = q8 @ np.asarray(base8, np.int64).T          # [Q, N]
        dist = off_i[None, :] - cross
        n_rows = dist.shape[1]
        got_idx = np.asarray(idx)
        for qi in range(q.shape[0]):
            per_bucket = dist[qi].reshape(n_rows // w, w)   # [passes, w]
            best = per_bucket.argmin(axis=0) * w + np.arange(w)
            best_val = per_bucket.min(axis=0)
            ok = got_idx[qi] >= 0
            # winners match wherever the min is unique
            uniq = (per_bucket == best_val[None, :]).sum(axis=0) == 1
            assert (got_idx[qi][ok & uniq] == best[ok & uniq]).all()

    def test_dead_slots_never_returned(self):
        from vector_db_tpu.ops.pallas_kernels import fused_int8g_pool

        q, base = self._setup()
        valid = np.ones(base.shape[0], bool)
        dead = np.random.default_rng(0).choice(base.shape[0], 500,
                                               replace=False)
        valid[dead] = False
        base8, off, sv, sgn, cvec = self._shadow(base, valid)
        _, idx = fused_int8g_pool(q - cvec[None, :], base8, off, sv, sgn,
                                  512)
        live = np.asarray(idx)
        live = live[live >= 0]
        assert valid[live].all()

    def test_single_query(self):
        from vector_db_tpu.ops.pallas_kernels import fused_int8g_pool

        q, base = self._setup(q=1)
        valid = np.ones(base.shape[0], bool)
        base8, off, sv, sgn, cvec = self._shadow(base, valid)
        vals, idx = fused_int8g_pool(q - cvec[None, :], base8, off, sv,
                                     sgn, 256)
        assert idx.shape == (1, 256)
        full = ((np.asarray(q)[:, None] - np.asarray(base)[None]) ** 2).sum(-1)
        best = int(np.argmin(full[0]))
        assert best in set(np.asarray(idx)[0].tolist())
