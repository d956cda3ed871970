"""Storage engine tests: Python engine, native engine (when built), and
cross-implementation on-disk format compatibility; WAL-integrated
VectorDatabase durability (crash recovery without close)."""

import os
import subprocess

import numpy as np
import pytest

from vector_db_tpu.storage import native as ns

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _maybe_build_native() -> bool:
    if ns.native_available():
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return False
    ns._LIB_TRIED = False  # re-probe
    return ns.native_available()


ENGINES = ["python"] + (["native"] if _maybe_build_native() else [])


def make_engine(kind: str, path: str, dim: int):
    if kind == "native":
        return ns.NativeStorageEngine(path, dim)
    return ns.PyStorageEngine(path, dim)


@pytest.mark.parametrize("kind", ENGINES)
class TestEngine:
    def test_roundtrip(self, kind, tmp_path, rng):
        eng = make_engine(kind, str(tmp_path / "e"), 8)
        vecs = rng.standard_normal((5, 8)).astype(np.float32)
        eng.append_add_batch(np.arange(5, dtype=np.int32), vecs)
        eng.flush()
        ids, got = eng.load(10)
        np.testing.assert_array_equal(ids, np.arange(5))
        np.testing.assert_allclose(got, vecs, rtol=1e-6)
        eng.close()

    def test_delete_and_lastwrite(self, kind, tmp_path):
        eng = make_engine(kind, str(tmp_path / "e"), 2)
        eng.append_add(1, np.asarray([1.0, 1.0]))
        eng.append_add(2, np.asarray([2.0, 2.0]))
        eng.append_delete(1)
        eng.append_add(2, np.asarray([3.0, 3.0]))
        eng.flush()
        ids, vecs = eng.load(10)
        assert ids.tolist() == [2]
        assert vecs[0, 0] == 3.0
        eng.close()

    def test_snapshot_truncates_wal(self, kind, tmp_path):
        eng = make_engine(kind, str(tmp_path / "e"), 2)
        eng.append_add(1, np.asarray([1.0, 1.0]))
        eng.snapshot(np.asarray([7], np.int32), np.asarray([[9.0, 9.0]], np.float32))
        eng.append_add(8, np.asarray([2.0, 2.0]))
        eng.flush()
        ids, vecs = eng.load(10)
        assert sorted(ids.tolist()) == [7, 8]
        eng.close()
        wal_size = os.path.getsize(tmp_path / "e" / "wal.bin")
        assert wal_size < 200  # header + one record only

    def test_torn_write_recovery(self, kind, tmp_path):
        eng = make_engine(kind, str(tmp_path / "e"), 2)
        eng.append_add(1, np.asarray([1.0, 1.0]))
        eng.append_add(2, np.asarray([2.0, 2.0]))
        eng.flush()
        eng.close()
        wal = tmp_path / "e" / "wal.bin"
        data = wal.read_bytes()
        wal.write_bytes(data[:-5])  # tear the last record
        eng2 = make_engine(kind, str(tmp_path / "e"), 2)
        ids, _ = eng2.load(10)
        assert ids.tolist() == [1]
        eng2.close()


@pytest.mark.skipif("native" not in ENGINES, reason="native lib not built")
class TestInterop:
    def test_python_writes_native_reads(self, tmp_path, rng):
        p = str(tmp_path / "x")
        py = ns.PyStorageEngine(p, 4)
        vecs = rng.standard_normal((3, 4)).astype(np.float32)
        py.append_add_batch(np.asarray([5, 6, 7], np.int32), vecs)
        py.flush()
        py.close()
        nat = ns.NativeStorageEngine(p, 4)
        ids, got = nat.load(10)
        np.testing.assert_array_equal(ids, [5, 6, 7])
        np.testing.assert_allclose(got, vecs, rtol=1e-6)
        nat.close()

    def test_native_writes_python_reads(self, tmp_path, rng):
        p = str(tmp_path / "y")
        nat = ns.NativeStorageEngine(p, 4)
        vecs = rng.standard_normal((3, 4)).astype(np.float32)
        nat.append_add_batch(np.asarray([1, 2, 3], np.int32), vecs)
        nat.snapshot(np.asarray([1, 2, 3], np.int32), vecs)
        nat.append_delete(2)
        nat.flush()
        nat.close()
        py = ns.PyStorageEngine(p, 4)
        ids, got = py.load(10)
        assert ids.tolist() == [1, 3]
        py.close()


class TestWalDurability:
    def test_crash_recovery_without_close(self, tmp_path, rng):
        """Mutations survive a crash (no close/save) via the WAL — the
        reference loses up to 999 mutations here (VectorStorage.java:81)."""
        from vector_db_tpu import IndexType, VectorDatabase

        path = str(tmp_path / "db")
        db = (VectorDatabase.builder().with_dimension(8).with_max_elements(128)
              .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        db.add_batch(range(20), vecs)
        db.delete_vector(3)
        db._engine.flush()
        # simulate crash: no close(), new instance
        db2 = (VectorDatabase.builder().with_dimension(8).with_max_elements(128)
               .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        assert db2.size() == 19
        assert db2.get_vector(3) is None
        np.testing.assert_allclose(db2.get_vector(7).values, vecs[7], rtol=1e-6)

    def test_wal_plus_checkpoint(self, tmp_path, rng):
        from vector_db_tpu import IndexType, VectorDatabase

        path = str(tmp_path / "db")
        db = (VectorDatabase.builder().with_dimension(8).with_max_elements(128)
              .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        vecs = rng.standard_normal((10, 8)).astype(np.float32)
        db.add_batch(range(10), vecs)
        db.save()  # checkpoint + WAL snapshot
        db.add_vector(100, vecs[0])   # post-checkpoint mutation
        db.delete_vector(5)
        db._engine.flush()
        db2 = (VectorDatabase.builder().with_dimension(8).with_max_elements(128)
               .with_index_type(IndexType.BRUTE).with_storage_path(path).build())
        assert db2.size() == 10  # 10 - 1 deleted + 1 added
        assert db2.get_vector(100) is not None
        assert db2.get_vector(5) is None
