"""Robustness coverage: cosine metric across index types, concurrent
searches (reference: test_performance.cpp:170-232 concurrent-search stress),
and a dimension sweep (reference: test_performance.cpp:129 dim sweep)."""

import concurrent.futures

import numpy as np
import pytest

from vector_db_tpu import (
    HnswPqConfig,
    IndexType,
    VectorDatabase,
)


class TestCosineMetric:
    @pytest.mark.parametrize("itype", [IndexType.BRUTE, IndexType.HNSWPQ])
    def test_scale_invariance(self, rng, itype):
        """Cosine search must rank scaled copies identically."""
        dim, n = 16, 300
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        b = (VectorDatabase.builder().with_dimension(dim).with_max_elements(512)
             .with_index_type(itype).with_metric("cosine"))
        if itype == IndexType.HNSWPQ:
            b = b.with_index_config(HnswPqConfig(
                num_subspaces=4, num_centroids=16, training_samples=128))
        db = b.build()
        db.add_batch(range(n), vecs)
        db.rebuild_index()
        q = 5.0 * vecs[17]  # scaled copy: cosine-identical to vector 17
        res = db.search(q, 3)
        assert res[0].id == 17
        db.close()


class TestConcurrentSearch:
    def test_parallel_searches_consistent(self, rng):
        """Many threads searching concurrently get identical results — the
        functional-state model has no read races by construction."""
        dim, n = 16, 256
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(512).with_index_type(IndexType.BRUTE).build())
        db.add_batch(range(n), vecs)
        q = vecs[:8]
        want = [[r.id for r in row] for row in db.search_batch(q, 5)]

        def worker(_):
            return [[r.id for r in row] for row in db.search_batch(q, 5)]

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(worker, range(16)))
        assert all(r == want for r in results)
        db.close()

    def test_search_during_mutation(self, rng):
        """Searches interleaved with adds never crash and never return ids
        that were fully deleted before the search began."""
        dim = 8
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(512).with_index_type(IndexType.BRUTE).build())
        vecs = rng.standard_normal((200, dim)).astype(np.float32)
        db.add_batch(range(100), vecs[:100])

        def searcher(_):
            out = db.search_batch(vecs[:4], 3)
            return all(r.id >= 0 for row in out for r in row)

        def mutator(i):
            db.add_vector(100 + i, vecs[100 + i])
            return True

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(searcher, i) if i % 2 else ex.submit(mutator, i)
                    for i in range(40)]
            assert all(f.result() for f in futs)
        db.close()


class TestDimensionSweep:
    @pytest.mark.parametrize("dim", [24, 96, 384])
    def test_flagship_across_dims(self, rng, dim):
        n = 300
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(512).with_index_type(IndexType.HNSWPQ)
              .with_index_config(HnswPqConfig(
                  num_subspaces=max(4, dim // 8), num_centroids=16,
                  training_samples=128))
              .build())
        db.add_batch(range(n), vecs)
        ids = [r.id for r in db.search(vecs[42], 1)]
        assert ids[0] == 42
        assert db.get_compression_ratio() >= 4.0
        db.close()


class TestConcurrentStress:
    """Analog of the reference's concurrent-search stress
    (native/test/test_performance.cpp:170-232: 1/2/4/8-thread searches) plus
    readers racing a mutating host (search while add_batch/rebuild runs) —
    the single-writer/functional-state model must keep every reader
    consistent."""

    @pytest.mark.parametrize("threads", [1, 2, 4, 8])
    def test_thread_sweep_flagship(self, rng, threads):
        dim, n = 16, 400
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(512).with_index_type(IndexType.HNSWPQ)
              .build())
        db.add_batch(range(n), vecs)
        q = vecs[:8]
        want = [[r.id for r in row] for row in db.search_batch(q, 5)]

        def worker(_):
            return [[r.id for r in row] for row in db.search_batch(q, 5)]

        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as ex:
            results = list(ex.map(worker, range(threads * 4)))
        assert all(r == want for r in results)
        db.close()

    def test_search_during_rebuild_and_batch_adds(self, rng):
        dim, n = 16, 300
        vecs = rng.standard_normal((2 * n, dim)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(1024).with_index_type(IndexType.HNSWPQ)
              .build())
        db.add_batch(range(n), vecs[:n])
        stop = []

        def searcher(_):
            ok = True
            for _ in range(10):
                rows = db.search_batch(vecs[:4], 3)
                for row in rows:
                    ok &= all(r.id >= 0 for r in row)
                    ok &= all(
                        row[j].distance <= row[j + 1].distance + 1e-5
                        for j in range(len(row) - 1)
                    )
            return ok

        def mutator(_):
            db.add_batch(range(n, n + 50), vecs[n:n + 50])
            db.rebuild_index()
            db.add_batch(range(n + 50, n + 100), vecs[n + 50:n + 100])
            db.rebuild_index()
            return True

        with concurrent.futures.ThreadPoolExecutor(max_workers=5) as ex:
            futs = [ex.submit(mutator, 0)] + [
                ex.submit(searcher, i) for i in range(4)
            ]
            assert all(f.result() for f in futs)
        # post-race state is fully consistent
        ids = [r.id for r in db.search(vecs[n + 60], 1)]
        assert ids[0] == n + 60
        assert db.size() == n + 100
        db.close()


class TestCosineVariedNorms:
    """Cosine-metric quantized indexes must rank by ANGLE: PQ/PCA spaces
    hold the unit sphere (regression: magnitude-biased candidate pools
    scored 48-78% here before sphere quantization)."""

    def _data(self):
        rng = np.random.default_rng(42)
        n, dim = 2048, 64
        scale = ((np.arange(dim) + 1.0) ** -0.5).astype(np.float32)
        vecs = (rng.standard_normal((n, dim)) * scale).astype(np.float32)
        vecs *= rng.uniform(0.1, 10.0, (n, 1)).astype(np.float32)
        return vecs

    @pytest.mark.parametrize("mode,extra", [
        ("adc_fast", dict(adc_bucket=8, adc_winners=2)),
        ("adc", {}),
        ("adc", dict(nlist=16, nprobe=6)),  # IVF-pruned probe selection
        ("graph", dict(use_graph=True)),
        ("pca", dict(proxy_dims=16, pca_r=128)),
    ])
    def test_hnswpq_modes(self, mode, extra):
        from vector_db_tpu.api.config import HnswPqConfig
        from vector_db_tpu.index.brute import BruteForceIndex
        from vector_db_tpu.index.hnsw_pq import HnswPqIndex

        vecs = self._data()
        n, dim = vecs.shape
        cfg = HnswPqConfig(num_subspaces=8, training_samples=1024,
                           search_mode=mode, **extra)
        idx = HnswPqIndex(dim, n, "cosine", cfg)
        idx.add_batch(range(n), vecs)
        brute = BruteForceIndex(dim, n, "cosine")
        brute.add_batch(range(n), vecs)
        a, _ = idx.search_batch(vecs[:32], 10)
        g, _ = brute.search_batch(vecs[:32], 10)
        rec = np.mean([len(set(a[i]) & set(g[i])) / 10 for i in range(32)])
        assert rec >= 0.9, (mode, rec)

    def test_flat_pq(self):
        from vector_db_tpu.api.config import PqConfig
        from vector_db_tpu.index.brute import BruteForceIndex
        from vector_db_tpu.index.pq import PqIndex

        vecs = self._data()
        n, dim = vecs.shape
        idx = PqIndex(dim, n, "cosine", PqConfig(num_subspaces=8))
        idx.add_batch(range(n), vecs)
        idx.build()
        brute = BruteForceIndex(dim, n, "cosine")
        brute.add_batch(range(n), vecs)
        a, _ = idx.search_batch(vecs[:32], 10)
        g, _ = brute.search_batch(vecs[:32], 10)
        rec = np.mean([len(set(a[i]) & set(g[i])) / 10 for i in range(32)])
        assert rec >= 0.9, rec


class TestConcurrentCompressedTier:
    """Concurrency on the compressed (+residual) tier: the incremental
    shadow/table caches are host-side state mutated lazily at search time —
    interleaved searches and adds must stay consistent (single-writer
    contract; readers see either the old or the new cache, never a torn
    one)."""

    def test_search_during_mutation_residual(self, rng):
        from vector_db_tpu.api.config import HnswPqConfig

        dim, n = 16, 512
        cfg = HnswPqConfig(raw_store=False, refine_residual=True,
                           num_subspaces=4, num_centroids=16,
                           training_samples=64,
                           search_mode="scan_pallas_int8")
        db = (VectorDatabase.builder().with_dimension(dim)
              .with_max_elements(1024).with_index_type(IndexType.HNSWPQ)
              .with_index_config(cfg).build())
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        db.add_batch(range(256), vecs[:256])
        db.search_batch(vecs[:4], 3)  # warm caches

        def searcher(_):
            out = db.search_batch(vecs[:4], 3)
            return all(r.id >= 0 for row in out for r in row)

        def mutator(i):
            db.add_vector(256 + i, vecs[256 + i])
            return True

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(searcher, i) if i % 2 else ex.submit(mutator, i)
                    for i in range(40)]
            assert all(f.result() for f in futs)
        # everything that was added is findable afterwards
        added = 256 + np.arange(0, 40, 2)
        out = db.search_batch(vecs[added], 1)
        assert [row[0].id for row in out] == added.tolist()
        db.close()


class TestRWLock:
    """utils/locks.RWLock semantics: concurrent readers, exclusive writer,
    writer preference (no writer starvation under a stream of readers)."""

    def test_concurrent_readers(self):
        import threading
        import time

        from vector_db_tpu.utils.locks import RWLock

        lock = RWLock()
        active = []
        peak = []

        def reader():
            with lock.read():
                active.append(1)
                peak.append(len(active))
                time.sleep(0.02)
                active.pop()

        ts = [threading.Thread(target=reader) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert max(peak) > 1, "readers never overlapped"

    def test_writer_excludes_and_is_preferred(self):
        import threading
        import time

        from vector_db_tpu.utils.locks import RWLock

        lock = RWLock()
        order = []

        def long_reader():
            with lock.read():
                order.append("r1-in")
                time.sleep(0.05)
            order.append("r1-out")

        def writer():
            with lock.write():
                order.append("w")

        def late_reader():
            with lock.read():
                order.append("r2")

        t1 = threading.Thread(target=long_reader)
        t1.start()
        time.sleep(0.01)  # writer arrives while r1 holds the lock
        tw = threading.Thread(target=writer)
        tw.start()
        time.sleep(0.01)  # a reader arriving AFTER a waiting writer queues
        t2 = threading.Thread(target=late_reader)
        t2.start()
        for t in (t1, tw, t2):
            t.join()
        # writer preference: w runs before the late reader
        assert order.index("w") < order.index("r2"), order
        assert order.index("r1-out") < order.index("w"), order
