"""Multi-chip sharding tests on the 8-device CPU fake
(SURVEY.md §4.5: xla_force_host_platform_device_count is the multi-chip fake,
the way the reference CI uses QEMU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_db_tpu.parallel import sharded as sh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sh.make_mesh(8)


@pytest.fixture(scope="module")
def corpus(mesh):
    rng = np.random.default_rng(42)
    n, dim = 512, 32
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return vecs


class TestShardedKnn:
    def test_matches_single_device(self, mesh, corpus):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((16, 32)).astype(np.float32)
        valid = np.ones(512, bool)
        norms = (corpus ** 2).sum(1)
        base_s, valid_s, norms_s = sh.shard_corpus(
            mesh, jnp.asarray(corpus), jnp.asarray(valid), jnp.asarray(norms)
        )
        fn = sh.sharded_knn(mesh, 10)
        d, idx = fn(jnp.asarray(q), base_s, valid_s, norms_s)
        # single-device reference
        full = ((q[:, None, :] - corpus[None]) ** 2).sum(-1)
        want = np.sort(full, axis=1)[:, :10]
        got = np.take_along_axis(full, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.15)

    def test_respects_valid(self, mesh, corpus):
        valid = np.ones(512, bool)
        valid[:64] = False  # kill shard 0 entirely
        norms = (corpus ** 2).sum(1)
        base_s, valid_s, norms_s = sh.shard_corpus(
            mesh, jnp.asarray(corpus), jnp.asarray(valid), jnp.asarray(norms)
        )
        fn = sh.sharded_knn(mesh, 5)
        d, idx = fn(jnp.asarray(corpus[:4]), base_s, valid_s, norms_s)
        assert not np.isin(np.asarray(idx), np.arange(64)).any()


class TestDpKnn:
    def test_matches_single_device(self, mesh, corpus):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((16, 32)).astype(np.float32)  # 16 = 8 * 2
        valid = jnp.ones(512, bool)
        norms = jnp.asarray((corpus ** 2).sum(1))
        fn = sh.dp_knn(mesh, 5)
        d, idx = fn(jnp.asarray(q), jnp.asarray(corpus), valid, norms)
        full = ((q[:, None, :] - corpus[None]) ** 2).sum(-1)
        want = np.sort(full, axis=1)[:, :5]
        got = np.take_along_axis(full, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.15)


class TestShardedKmeans:
    def test_matches_single_device_step(self, mesh, corpus):
        from vector_db_tpu.ops.kmeans import lloyd_iteration

        k = 8
        cents = corpus[:k].copy()
        data = jnp.asarray(corpus)
        norms = jnp.sum(data * data, axis=1)
        want, _ = lloyd_iteration(data, jnp.asarray(cents), norms,
                                  jnp.ones(512, bool))
        (data_s,) = sh.shard_corpus(mesh, data)
        (cents_r,) = sh.replicate(mesh, jnp.asarray(cents))
        step = sh.sharded_kmeans_step(mesh)
        got = step(data_s, cents_r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestShardedDatabase:
    def test_exact_search(self, mesh, corpus):
        ids = np.arange(512, dtype=np.int32)
        valid = np.ones(512, bool)
        db = sh.ShardedDatabase(mesh, corpus, ids, valid)
        ext, d = db.search(corpus[:8], 1)
        np.testing.assert_array_equal(ext[:, 0], np.arange(8))

    def test_flagship_search(self, mesh, corpus):
        from vector_db_tpu.ops import adc
        from vector_db_tpu.ops.kmeans import subspace_kmeans_fit

        cb = subspace_kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(corpus),
                                 num_subspaces=4, k=16, iters=5)
        codes = adc.pq_encode(jnp.asarray(corpus), cb)
        ids = np.arange(512, dtype=np.int32)
        valid = np.ones(512, bool)
        db = sh.ShardedDatabase(mesh, corpus, ids, valid,
                                codes=np.asarray(codes), codebooks=np.asarray(cb))
        ext, d = db.search_flagship(corpus[:8], 5, refine=32)
        np.testing.assert_array_equal(ext[:, 0], np.arange(8))

    def test_pads_uneven_corpus(self, mesh):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((100, 16)).astype(np.float32)  # 100 % 8 != 0
        ids = np.arange(100, dtype=np.int32)
        db = sh.ShardedDatabase(mesh, vecs, ids, np.ones(100, bool))
        ext, d = db.search(vecs[:4], 3)
        np.testing.assert_array_equal(ext[:, 0], np.arange(4))
        assert (ext >= -1).all() and (ext < 100).all()
