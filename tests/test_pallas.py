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
