"""Round-4 advisor fixes: pool widths that survive the fused packed
kernel's block rounding (advisor r3 high/medium), the empty-dirty-record
guard, and the LSH percentile docstring alignment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vector_db_tpu.ops.pallas_kernels import LANES, preserved_pool_width


class TestPreservedPoolWidth:
    def test_invariants_sweep(self):
        """Every returned width divides n AND survives the kernel rounding
        (w <= block_n, or w % block_n == 0) — the exact contract
        fused_packed_pool enforces before refusing to pad-copy the store."""
        for mult in range(1, 200):
            n = mult * LANES
            w = preserved_pool_width(n)
            assert n % w == 0, (n, w)
            assert w <= 2048
            assert w <= 512 or w % 512 == 0, (n, w)

    def test_advisor_cases(self):
        # per_shard=1920 (capacity 15360 / 8 shards): old caller picked
        # w=1920, kernel rounded to 2048, raised. Largest safe width: 384.
        assert preserved_pool_width(1920) == 384
        # legacy 128-rounded checkpoint capacity 3200: old caller picked
        # w=640 -> kernel rounds to 1024 -> 3200 % 1024 != 0 -> raise.
        w = preserved_pool_width(3200)
        assert 3200 % w == 0 and (w <= 512 or w % 512 == 0)
        # modern 2048-rounded stores keep the full 2048 width
        assert preserved_pool_width(2048) == 2048
        assert preserved_pool_width(1 << 20) == 2048

    def test_rejects_unaligned(self):
        with pytest.raises(ValueError):
            preserved_pool_width(1000)

    @pytest.mark.parametrize("n", [1920, 3200])
    def test_legacy_capacity_scan(self, n):
        """The exact _emit path a legacy 128-rounded compressed checkpoint
        rides (index/hnsw_pq.py scan_pallas_int8): shadow build + fused
        packed pool + int8 refine must run (the old width pick raised
        ValueError inside fused_packed_pool) and find the true NN."""
        from vector_db_tpu.index.hnsw_pq import (_build_scan8p_shadow,
                                                 pallas_scan8p_refine)
        from vector_db_tpu.ops.distance import pack_int8_rows

        rng = np.random.default_rng(7)
        dim = 64
        vecs = (rng.standard_normal((n, dim)) + 1.0).astype(np.float32)
        packed, scales = pack_int8_rows(jnp.asarray(vecs))
        norms = jnp.sum(jnp.asarray(vecs) ** 2, axis=1)
        valid = jnp.ones((n,), bool)
        ids = jnp.arange(n, dtype=jnp.int32)
        off, sc, cvec = _build_scan8p_shadow(packed, scales, norms, valid,
                                             "l2")
        q = vecs[:4] + 0.01 * rng.standard_normal((4, dim)).astype(np.float32)
        w = preserved_pool_width(n)
        d, ext = pallas_scan8p_refine(jnp.asarray(q), packed, scales, norms,
                                      off, sc, cvec, ids, k=8, metric="l2",
                                      pool=64, w=w)
        ext = np.asarray(ext)
        assert (ext[np.arange(4), 0] == np.arange(4)).all(), ext[:, 0]


class TestShardedFusedWidth:
    def test_per_shard_1920_search_fused(self):
        """The advisor's exact repro: ShardedDatabase(capacity=15360,
        raw_store=False).search_fused used to raise ValueError (per_shard
        =1920, kernel width rounded 1920->2048)."""
        from vector_db_tpu.parallel import sharded as sh

        assert len(jax.devices()) >= 8
        mesh = sh.make_mesh(8)
        rng = np.random.default_rng(11)
        n, dim = 15360, 64
        db = sh.ShardedDatabase(mesh, dim=dim, capacity=n, raw_store=False)
        assert db.per_shard == 1920
        vecs = (rng.standard_normal((4096, dim)) + 1.0).astype(np.float32)
        db.add_batch(np.arange(4096), vecs)
        q = vecs[:8] + 0.01 * rng.standard_normal((8, dim)).astype(np.float32)
        ext, d = db.search_fused(q, 5)
        hits = np.mean([int(ext[i, 0] == i) for i in range(8)])
        assert hits >= 0.9, (hits, ext[:, 0])


class TestTakeDirtyGuard:
    def test_all_empty_records(self):
        """A dirty record holding only empty arrays must yield None, not
        IndexError (advisor r3 low)."""
        from vector_db_tpu.index.hnsw_pq import HnswPqConfig, HnswPqIndex

        idx = HnswPqIndex(dim=32, capacity=256, config=HnswPqConfig())
        attr = idx._DIRTY_RECORDS[0]
        setattr(idx, attr, [np.zeros(0, np.int64), np.zeros(0, np.int64)])
        assert idx._take_dirty(attr) is None


class TestLshPercentileDoc:
    def test_docstring_matches_code(self):
        """The docstring and the implementation must agree on the
        percentile (advisor r3 low: one said 65th, code used 75)."""
        import inspect

        from vector_db_tpu.index.lsh import LshIndex

        src = inspect.getsource(LshIndex._auto_radius)
        doc = LshIndex._auto_radius.__doc__
        assert "75.0" in src
        assert "75th" in doc and "65th" not in doc
