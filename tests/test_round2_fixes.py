"""Round-2 correctness fixes (ADVICE.md findings).

1. WAL rows stay aligned when add_batch carries duplicate ids.
2. Durability: acknowledged mutations survive kill -9 ("flush"/"fsync").
3. Cosine distance currency: every index reports 1 - cos for the same pair.
4. LSH honors the configured metric and counts backfill events.
"""

import os
import signal
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from vector_db_tpu.api.database import IndexType, VectorDatabase
from vector_db_tpu.api.config import HnswConfig, LshConfig, PqConfig
from vector_db_tpu.storage import native as ns

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cos_dist(a: np.ndarray, b: np.ndarray) -> float:
    return 1.0 - float(
        np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    )


class TestWalDuplicateIds:
    def test_duplicate_id_batch_persists_correct_vectors(self, tmp_path, rng):
        """ADVICE #1: add_batch([5,5,6]) must persist id 6 with ITS vector,
        not id 5's duplicate row."""
        path = str(tmp_path / "db")
        vals = rng.standard_normal((3, 8)).astype(np.float32)
        db = (VectorDatabase.builder().with_dimension(8).with_max_elements(64)
              .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        accepted = db.add_batch([5, 5, 6], vals)
        assert accepted == [5, 6]
        # crash-recover from the WAL alone (no close/save)
        db2 = (VectorDatabase.builder().with_dimension(8).with_max_elements(64)
               .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        np.testing.assert_allclose(db2.get_vector(5).values, vals[0], rtol=1e-6)
        np.testing.assert_allclose(db2.get_vector(6).values, vals[2], rtol=1e-6)
        db.close()
        db2.close()


ENGINES = ["python"] + (["native"] if ns.native_available() else [])


class TestDurability:
    @pytest.mark.parametrize("kind", ENGINES)
    @pytest.mark.parametrize("durability", ["flush", "fsync"])
    def test_kill9_preserves_acknowledged_appends(self, tmp_path, kind, durability):
        """A SIGKILLed process loses nothing that append_* acknowledged."""
        path = str(tmp_path / f"e_{kind}_{durability}")
        script = textwrap.dedent(f"""
            import os, sys
            import numpy as np
            sys.path.insert(0, {REPO!r})
            from vector_db_tpu.storage import native as ns
            eng_cls = (ns.NativeStorageEngine if {kind!r} == "native"
                       else ns.PyStorageEngine)
            eng = eng_cls({path!r}, 4, durability={durability!r})
            for i in range(20):
                eng.append_add(i, np.full(4, float(i), np.float32))
            eng.append_delete(3)
            os.kill(os.getpid(), {int(signal.SIGKILL)})
        """)
        proc = subprocess.run([sys.executable, "-c", script], timeout=60)
        assert proc.returncode == -signal.SIGKILL
        eng = ns.PyStorageEngine(path, 4, durability="buffered")
        ids, vecs = eng.load(100)
        assert ids.tolist() == [i for i in range(20) if i != 3]
        np.testing.assert_allclose(vecs[:, 0], np.asarray(ids, np.float32))
        eng.close()

    def test_buffered_mode_defers_to_flush(self, tmp_path):
        """"buffered" keeps the reference's write-behind semantics: records
        are not guaranteed on disk until flush/snapshot/close."""
        path = str(tmp_path / "buf")
        eng = ns.PyStorageEngine(path, 4, durability="buffered")
        eng.append_add(1, np.ones(4, np.float32))
        eng.flush()
        ids, _ = ns.PyStorageEngine(path, 4).load(10)
        assert ids.tolist() == [1]
        eng.close()

    def test_rejects_unknown_level(self, tmp_path):
        with pytest.raises(ValueError):
            ns.PyStorageEngine(str(tmp_path / "x"), 4, durability="wrong")


class TestCosineCurrency:
    """ADVICE #3: all indexes must report the same cosine-distance currency."""

    def _corpus(self, rng, n=256, dim=16):
        return rng.standard_normal((n, dim)).astype(np.float32)

    @pytest.mark.parametrize("itype,cfg", [
        (IndexType.BRUTE, None),
        (IndexType.HNSW, HnswConfig(m=8, ef_construction=64, ef_search=64)),
        (IndexType.PQ, PqConfig(num_subspaces=4, refine_k=0)),
        (IndexType.LSH, LshConfig(num_tables=8, num_bits=4, bucket_width=16.0)),
        (IndexType.IVF, None),
        (IndexType.ANNOY, None),
    ])
    def test_reported_distance_is_true_cosine(self, rng, itype, cfg):
        vecs = self._corpus(rng)
        db = (VectorDatabase.builder().with_dimension(16).with_max_elements(512)
              .with_index_type(itype).with_metric("cosine")
              .with_index_config(cfg).build())
        db.add_batch(range(len(vecs)), vecs)
        db.rebuild_index()
        q = vecs[7] * 3.0 + 0.01 * rng.standard_normal(16).astype(np.float32)
        results = db.search(q, 5)
        assert results, f"{itype} returned nothing"
        for r in results:
            want = _cos_dist(q, vecs[r.id])
            assert r.distance == pytest.approx(want, abs=5e-3), (
                f"{itype}: id {r.id} reported {r.distance}, true cosine {want}"
            )


class TestLshRound2:
    def test_metric_passthrough_ranking(self, rng):
        """Cosine LSH must rank by cosine, not squared L2."""
        from vector_db_tpu.index.lsh import LshIndex

        vecs = rng.standard_normal((128, 8)).astype(np.float32)
        # make vector 3 l2-near-but-angularly-far and vector 4 the reverse
        idx = LshIndex(8, 256, "cosine",
                       LshConfig(num_tables=8, num_bits=2, bucket_width=64.0))
        idx.add_batch(range(len(vecs)), vecs)
        q = 2.5 * vecs[11]
        ids, dists = idx.search(q, 3)
        assert ids[0] == 11
        assert dists[0] == pytest.approx(0.0, abs=1e-5)

    def test_backfill_counter_and_disable(self, rng):
        from vector_db_tpu.index.lsh import LshIndex

        vecs = rng.standard_normal((256, 8)).astype(np.float32)
        # microscopic bucket width => almost no collisions => backfill
        cfg = LshConfig(num_tables=2, num_bits=16, bucket_width=1e-4,
                        hamming_radius=0, backfill=False)
        idx = LshIndex(8, 256, "l2", cfg)
        idx.add_batch(range(len(vecs)), vecs)
        ids, _ = idx.search_batch(rng.standard_normal((4, 8)).astype(np.float32), 10)
        assert (ids < 0).any()  # honest: no silent exact-scan substitution
        assert idx.stats()["backfill_rows"] > 0
        assert idx.stats()["backfill_queries"] > 0

        cfg2 = LshConfig(num_tables=2, num_bits=16, bucket_width=1e-4,
                         hamming_radius=0, backfill=True)
        idx2 = LshIndex(8, 256, "l2", cfg2)
        idx2.add_batch(range(len(vecs)), vecs)
        ids2, _ = idx2.search_batch(rng.standard_normal((4, 8)).astype(np.float32), 10)
        assert (ids2 >= 0).all()  # reference random-fill parity
        assert idx2.stats()["backfill_rows"] > 0  # but the event is counted


class TestIvfRound2:
    """VERDICT #2: IVF recall parity at nprobe=10 via multi-assignment,
    plus the random-fill fallback (no -1 rows) and adaptive ef policy."""

    def test_recall_with_multi_assign(self, rng):
        from vector_db_tpu.index.ivf import IvfIndex
        from vector_db_tpu.api.config import IvfConfig

        n, dim, nq, k = 2048, 64, 64, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        qs = rng.standard_normal((nq, dim)).astype(np.float32)
        gts = []
        for q in qs:
            d = ((vecs - q) ** 2).sum(1)
            gts.append(set(np.argsort(d)[:k].tolist()))
        idx = IvfIndex(dim, n, "l2", IvfConfig(num_clusters=100, num_probes=10))
        idx.add_batch(range(n), vecs)
        idx.build()
        ids, _ = idx.search_batch(qs, k)
        assert (ids >= 0).all()
        rec = np.mean([len(set(ids[i].tolist()) & gts[i]) / k for i in range(nq)])
        assert rec >= 0.80, f"multi-assign recall {rec:.3f} < 0.80"

    def test_random_fill_no_negative_rows(self, rng):
        """Sparse probes + k larger than any cluster: rows still fill."""
        from vector_db_tpu.index.ivf import IvfIndex
        from vector_db_tpu.api.config import IvfConfig

        n, dim = 300, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = IvfIndex(dim, 512, "l2",
                       IvfConfig(num_clusters=30, num_probes=1, multi_assign=1))
        idx.add_batch(range(n), vecs)
        idx.build()
        ids, dists = idx.search_batch(
            rng.standard_normal((4, dim)).astype(np.float32), 50
        )
        assert (ids >= 0).all()           # reference random-fill: no -1 rows
        assert np.isfinite(dists).all()   # fills carry exact distances
        for row in dists:                 # merged output stays distance-sorted
            assert (np.diff(row) >= -1e-5).all()

    def test_adaptive_ef_policy(self):
        from vector_db_tpu.api.config import HnswConfig

        cfg = HnswConfig()  # ef_search=0 -> adaptive
        assert cfg.ef_for_query(10, 100) == 42 + 0  # base only, no scaling
        assert cfg.ef_for_query(10, 1000) < cfg.ef_for_query(10, 50_000)
        assert cfg.ef_for_query(10, 10_000) <= 300
        assert cfg.ef_for_query(100, 100_000) == 400  # capped
        fixed = HnswConfig(ef_search=400)
        assert fixed.ef_for_query(10, 10**6) == 400
        assert fixed.ef_for_query(200, 100) == 800  # max(ef, 4k)
