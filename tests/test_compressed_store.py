"""The >HBM compressed-store regime (HnswPqConfig.raw_store=False) —
CPU-scaled tests for what benchmarks/bench_10m_api.py proves at 10M x 512 on
the real chip: VectorStore holds int8-packed rows + exact norms instead of
the raw f32 matrix, ingest streams chunk-wise through one donated jit step,
and every quantized search mode refines from the int8 rows.

reference: the N >> memory regime the reference only roadmaps
(PERFORMANCE_BENCHMARK_AND_ROADMAP.md:475-525, IVF sharding + mmap)."""

import numpy as np
import pytest

from vector_db_tpu import CompressionConfig, IndexType, VectorDatabase
from vector_db_tpu.api.config import HnswPqConfig
from vector_db_tpu.core.store import VectorStore
from vector_db_tpu.index.hnsw_pq import HnswPqIndex

DIM = 64
N = 4096
K = 10


def _corpus(n=N, dim=DIM, seed=42):
    r = np.random.default_rng(seed)
    # decaying spectrum (realistic embedding-like structure)
    scale = (np.arange(dim) + 1.0) ** -0.5
    return (r.standard_normal((n, dim)) * scale).astype(np.float32)


def _gt(vecs, queries, k=K, metric="l2"):
    if metric == "cosine":
        v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        d = 1.0 - q @ v.T
    else:
        d = ((queries**2).sum(1)[:, None] + (vecs**2).sum(1)[None, :]
             - 2.0 * queries @ vecs.T)
    return np.argsort(d, axis=1)[:, :k]


def _recall(ids, gt):
    hits = sum(
        len(set(ids[i].tolist()) & set(gt[i].tolist())) for i in range(len(gt))
    )
    return hits / (len(gt) * gt.shape[1])


class TestInt8Store:
    def test_roundtrip_and_norms(self):
        vecs = _corpus(300)
        st = VectorStore(512, DIM, raw=False)
        acc, slots = st.add_batch(range(300), vecs)
        assert len(acc) == 300
        got = st.get(5)
        # int8 row quantization: ~0.4% per-element relative error
        assert np.allclose(got, vecs[5], atol=2e-2 * np.abs(vecs[5]).max())
        # norms are EXACT (captured from f32 at write time)
        norms = np.asarray(st.state.norms)[np.asarray(slots)]
        np.testing.assert_allclose(norms, (vecs**2).sum(1), rtol=1e-5)

    def test_rows_matches_get(self):
        vecs = _corpus(64)
        st = VectorStore(128, DIM, raw=False)
        _, slots = st.add_batch(range(64), vecs)
        rows = np.asarray(st.rows(np.asarray(slots, np.int32)))
        np.testing.assert_allclose(rows[7], st.get(7), rtol=1e-6)

    def test_host_checkpoint_roundtrip(self):
        vecs = _corpus(200)
        st = VectorStore(256, DIM, raw=False)
        st.add_batch(range(200), vecs)
        st.remove(13)
        snap = st.to_host()
        assert "vectors" not in snap and "packed8" in snap
        st2 = VectorStore.from_host(snap)
        assert not st2.raw
        assert st2.size() == 199 and st2.get(13) is None
        np.testing.assert_allclose(st2.get(42), st.get(42))

    def test_numpy_view_dequant_matches_device(self):
        # the WAL-snapshot host path dequantizes with numpy .view(int8);
        # byte order must agree with the device bitcast packing
        vecs = _corpus(32)
        st = VectorStore(128, DIM, raw=False)
        _, slots = st.add_batch(range(32), vecs)
        snap = st.to_host()
        p8 = snap["packed8"][np.asarray(slots)]
        sc = snap["scales8"][np.asarray(slots)]
        host = p8.view(np.int8).reshape(32, DIM).astype(np.float32) * sc[:, None]
        dev = np.asarray(st.rows(np.asarray(slots, np.int32)))
        np.testing.assert_allclose(host, dev, rtol=1e-6)


class TestCompressedIndexValidation:
    def test_bad_modes_raise(self):
        for mode in ("scan_exact", "scan_pallas", "graph"):
            with pytest.raises(ValueError):
                HnswPqIndex(DIM, 1024, config=HnswPqConfig(
                    raw_store=False, search_mode=mode))

    def test_graph_raises(self):
        with pytest.raises(ValueError):
            HnswPqIndex(DIM, 1024, config=HnswPqConfig(
                raw_store=False, use_graph=True))

    def test_dim_mult4(self):
        with pytest.raises(ValueError):
            HnswPqIndex(66, 1024, config=HnswPqConfig(raw_store=False))

    def test_refine_store_forced_int8(self):
        idx = HnswPqIndex(DIM, 1024, config=HnswPqConfig(raw_store=False))
        assert idx.config.refine_store == "int8"
        assert idx.stats()["raw_store"] is False


class TestCompressedSearch:
    @pytest.fixture(scope="class")
    def built(self):
        vecs = _corpus()
        cfg = HnswPqConfig(
            raw_store=False, num_subspaces=16, training_samples=2048,
            adc_select_r=256, proxy_dims=16, search_mode="pca",
        )
        idx = HnswPqIndex(DIM, N + 128, config=cfg)
        # streamed ingest in 4 chunks (first chunk trains)
        chunks = [
            (range(s, s + 1024), vecs[s:s + 1024])
            for s in range(0, N, 1024)
        ]
        n = idx.bulk_load_stream(chunks)
        assert n == N and idx.trained
        queries = _corpus(128, seed=7)
        return idx, vecs, queries, _gt(vecs, queries)

    def test_untrained_fallback_scans_int8(self):
        # 200 live rows < num_centroids=256 -> lazy training cannot trigger
        vecs = _corpus(200)
        cfg = HnswPqConfig(raw_store=False)
        idx = HnswPqIndex(DIM, 1024, config=cfg)
        idx.add_batch(range(200), vecs)
        assert not idx.trained
        q = _corpus(32, seed=9)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) >= 0.99

    @pytest.mark.parametrize("mode", ["pca", "adc_fast", "adc", "scan_int8"])
    def test_mode_recall(self, built, mode):
        idx, vecs, queries, gt = built
        idx.config.search_mode = mode
        ids, dists = idx.search_batch(queries, K)
        rec = _recall(ids, gt)
        floor = 0.97 if mode == "scan_int8" else 0.9
        assert rec >= floor, f"{mode}: {rec}"
        # distances ascend
        d0 = dists[:, :-1]
        assert np.all(d0 <= dists[:, 1:] + 1e-6)

    def test_auto_resolves_adc_fast(self, built):
        idx, vecs, queries, gt = built
        idx.config.search_mode = "auto"
        ids, _ = idx.search_batch(queries, K)
        assert _recall(ids, gt) >= 0.9

    def test_crud_after_stream(self, built):
        idx, vecs, queries, gt = built
        extra = _corpus(8, seed=100) + 3.0  # well-separated rows
        assert idx.add_batch(range(10_000, 10_008), extra) == list(
            range(10_000, 10_008))
        idx.config.search_mode = "scan_int8"
        ids, _ = idx.search_batch(extra, 1)
        assert ids[:, 0].tolist() == list(range(10_000, 10_008))
        assert idx.remove(10_000)
        ids, _ = idx.search_batch(extra[:1], 1)
        assert ids[0, 0] != 10_000
        # restore class-fixture state
        for i in range(10_001, 10_008):
            idx.remove(i)


class TestCompressedStreamRawStore:
    def test_stream_works_for_raw_store_too(self):
        vecs = _corpus(2048)
        cfg = HnswPqConfig(num_subspaces=16, training_samples=1024)
        idx = HnswPqIndex(DIM, 2048, config=cfg)
        n = idx.bulk_load_stream(
            [(range(0, 1024), vecs[:1024]), (range(1024, 2048), vecs[1024:])]
        )
        assert n == 2048
        q = _corpus(64, seed=3)
        ids, _ = idx.search_batch(q, K)  # auto -> scan_exact (raw rows exist)
        assert _recall(ids, _gt(vecs, q)) >= 0.98

    def test_duplicate_ids_raise(self):
        vecs = _corpus(1024)
        idx = HnswPqIndex(DIM, 2048, config=HnswPqConfig(
            num_subspaces=16, training_samples=512))
        with pytest.raises(ValueError, match="duplicate"):
            idx.bulk_load_stream(
                [(range(512), vecs[:512]), (range(512), vecs[512:1024])]
            )

    def test_capacity_overflow_raises(self):
        vecs = _corpus(1024)
        idx = HnswPqIndex(DIM, 512, config=HnswPqConfig(
            num_subspaces=16, training_samples=256))
        with pytest.raises(ValueError, match="capacity"):
            idx.bulk_load_stream([(range(1024), vecs)])


class TestCompressedDatabase:
    def test_facade_checkpoint_roundtrip(self, tmp_path):
        vecs = _corpus(2048)
        cfg = HnswPqConfig(
            raw_store=False, num_subspaces=16, training_samples=1024,
        )
        db = (VectorDatabase.builder()
              .with_dimension(DIM).with_max_elements(2176)
              .with_index_type(IndexType.HNSWPQ)
              .with_index_config(cfg)
              .with_storage_path(str(tmp_path / "cdb")).build())
        # compressed tier: checkpoint durability, no WAL engine
        assert db._engine is None
        n = db.bulk_load_stream(
            [(range(0, 1024), vecs[:1024]), (range(1024, 2048), vecs[1024:])]
        )  # auto-saves
        assert n == 2048
        q = _corpus(64, seed=5)
        before = [[r.id for r in row] for row in db.search_batch(q, K)]
        db.close()

        db2 = (VectorDatabase.builder()
               .with_dimension(DIM).with_max_elements(2176)
               .with_index_type(IndexType.HNSWPQ)
               .with_index_config(HnswPqConfig(
                   raw_store=False, num_subspaces=16, training_samples=1024))
               .with_storage_path(str(tmp_path / "cdb")).build())
        assert db2.size() == 2048
        assert not db2.index.store.raw
        after = [[r.id for r in row] for row in db2.search_batch(q, K)]
        assert before == after
        # CRUD still works post-reload
        assert db2.add_vector(99_999, vecs[0] + 5.0)
        assert db2.delete_vector(0)
        db2.close()

    def test_cosine_compressed(self):
        r = np.random.default_rng(11)
        vecs = (r.standard_normal((2048, DIM))
                * r.uniform(0.5, 5.0, (2048, 1))).astype(np.float32)
        cfg = HnswPqConfig(
            raw_store=False, num_subspaces=16, training_samples=1024,
        )
        idx = HnswPqIndex(DIM, 2048, metric="cosine", config=cfg)
        idx.bulk_load_stream([(range(2048), vecs)])
        q = (r.standard_normal((64, DIM))).astype(np.float32)
        gt = _gt(vecs, q, metric="cosine")
        idx.config.search_mode = "adc_fast"
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, gt) >= 0.85
        idx.config.search_mode = "scan_int8"
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, gt) >= 0.97


class TestScanBf16:
    def test_scan_bf16_matches_brute(self):
        vecs = _corpus(4096)
        cfg = HnswPqConfig(num_subspaces=16, training_samples=2048,
                           search_mode="scan_bf16")
        idx = HnswPqIndex(DIM, 4096, config=cfg)
        idx.bulk_load_stream([(range(4096), vecs)])
        q = _corpus(128, seed=7)
        ids, dists = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) >= 0.98
        assert np.all(dists[:, :-1] <= dists[:, 1:] + 1e-6)

    def test_scan_bf16_cosine(self):
        r = np.random.default_rng(13)
        vecs = (r.standard_normal((2048, DIM))
                * r.uniform(0.5, 5.0, (2048, 1))).astype(np.float32)
        idx = HnswPqIndex(DIM, 2048, metric="cosine", config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="scan_bf16"))
        idx.bulk_load_stream([(range(2048), vecs)])
        q = r.standard_normal((64, DIM)).astype(np.float32)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q, metric="cosine")) >= 0.97

    def test_rejected_on_compressed(self):
        with pytest.raises(ValueError):
            HnswPqIndex(DIM, 1024, config=HnswPqConfig(
                raw_store=False, search_mode="scan_bf16"))


class TestScanPallasInt8:
    """search_mode="scan_pallas_int8": s8 x s8 fused pool + exact refine."""

    def test_matches_brute(self):
        vecs = _corpus(4096)
        cfg = HnswPqConfig(num_subspaces=16, training_samples=2048,
                           search_mode="scan_pallas_int8")
        idx = HnswPqIndex(DIM, 4096, config=cfg)
        idx.bulk_load_stream([(range(4096), vecs)])
        q = _corpus(128, seed=7)
        ids, dists = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) >= 0.97
        assert np.all(dists[:, :-1] <= dists[:, 1:] + 1e-6)

    def test_cosine(self):
        r = np.random.default_rng(13)
        vecs = (r.standard_normal((2048, DIM))
                * r.uniform(0.5, 5.0, (2048, 1))).astype(np.float32)
        idx = HnswPqIndex(DIM, 2048, metric="cosine", config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        q = r.standard_normal((64, DIM)).astype(np.float32)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q, metric="cosine")) >= 0.95

    def test_mean_offset_corpus(self):
        """Common-mode offset is the regime int8 centering exists for."""
        r = np.random.default_rng(5)
        vecs = (r.standard_normal((2048, DIM)) + 10.0).astype(np.float32)
        idx = HnswPqIndex(DIM, 2048, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        q = (r.standard_normal((64, DIM)) + 10.0).astype(np.float32)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) >= 0.95

    def test_delete_invalidates_shadow(self):
        vecs = _corpus(1024)
        idx = HnswPqIndex(DIM, 1024, config=HnswPqConfig(
            num_subspaces=16, training_samples=512,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(1024), vecs)])
        q = vecs[:8]
        ids, _ = idx.search_batch(q, 1)
        assert list(ids[:, 0]) == list(range(8))
        for i in range(8):
            idx.remove(i)
        ids, _ = idx.search_batch(q, 1)
        assert not set(ids[:, 0].tolist()) & set(range(8))

    def test_incremental_shadow_update(self):
        """Churn after the first search refreshes the int8 shadow
        INCREMENTALLY (requantize dirty rows against the cached centering,
        O(dirty*d)) instead of the O(N*d) full rebuild — verified by aux
        identity — and the refreshed shadow finds new rows / drops deleted
        ones exactly like a rebuilt one."""
        vecs = _corpus(2048)
        idx = HnswPqIndex(DIM, 4096, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        idx.search_batch(vecs[:4], 1)            # warm: full shadow build
        assert idx._scan8_dirty == []
        aux_obj = idx._scan8_aux
        for i in range(16):
            assert idx.remove(i)
        r = np.random.default_rng(99)
        newv = (r.standard_normal((16, DIM)) * 3.0).astype(np.float32)
        assert len(idx.add_batch(range(5000, 5016), newv)) == 16
        assert idx._scan8_dirty                   # mutations recorded
        ids, _ = idx.search_batch(newv, 1)
        assert idx._scan8_aux is aux_obj          # incremental, no rebuild
        assert idx._scan8_dirty == []
        assert list(ids[:, 0]) == list(range(5000, 5016))
        ids2, _ = idx.search_batch(vecs[:16], 5)
        assert not set(ids2.ravel().tolist()) & set(range(16))
        # incremental shadow ranks like a freshly rebuilt one
        q = _corpus(64, seed=11)
        ids_inc, _ = idx.search_batch(q, K)
        idx._scan8_cache = None                   # force full rebuild
        idx._scan8_dirty = None
        ids_full, _ = idx.search_batch(q, K)
        assert idx._scan8_aux is not aux_obj      # rebuild really happened
        assert _recall(ids_inc, ids_full) >= 0.95

    def test_churn_threshold_degrades_to_rebuild(self):
        """Over-threshold churn (> max(8192, cap/8) dirty slots) drops the
        record: the next shadow call takes the full-rebuild path."""
        idx = HnswPqIndex(DIM, 1024, config=HnswPqConfig(
            search_mode="scan_pallas_int8"))
        idx._note_row_mutation(np.arange(9000))
        assert idx._scan8_dirty is None
        # untracked rewrites drop it too
        idx2 = HnswPqIndex(DIM, 1024, config=HnswPqConfig(
            num_subspaces=16, training_samples=256,
            search_mode="scan_pallas_int8"))
        idx2.bulk_load_stream([(range(512), _corpus(512))])
        assert idx2._scan8_dirty is None

    def test_incremental_scan16_shadow_update(self):
        """The bf16 scan shadow (search_mode="scan_pallas") gets the same
        incremental churn maintenance as the int8 one: dirty rows are
        reconditioned against the cached centering (aux identity) and the
        refreshed shadow behaves like a rebuilt one."""
        vecs = _corpus(2048)
        idx = HnswPqIndex(DIM, 4096, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="scan_pallas"))
        idx.bulk_load_stream([(range(2048), vecs)])
        idx.search_batch(vecs[:4], 1)            # warm: full shadow build
        assert idx._scan16_dirty == []
        aux_obj = idx._scan16_aux
        for i in range(16):
            assert idx.remove(i)
        r = np.random.default_rng(99)
        newv = (r.standard_normal((16, DIM)) * 3.0).astype(np.float32)
        assert len(idx.add_batch(range(5000, 5016), newv)) == 16
        assert idx._scan16_dirty                  # mutations recorded
        ids, _ = idx.search_batch(newv, 1)
        assert idx._scan16_aux is aux_obj         # incremental, no rebuild
        assert idx._scan16_dirty == []
        assert list(ids[:, 0]) == list(range(5000, 5016))
        ids2, _ = idx.search_batch(vecs[:16], 5)
        assert not set(ids2.ravel().tolist()) & set(range(16))
        q = _corpus(64, seed=11)
        ids_inc, _ = idx.search_batch(q, K)
        idx._scan16_cache = None                  # force full rebuild
        idx._scan16_dirty = None
        ids_full, _ = idx.search_batch(q, K)
        assert idx._scan16_aux is not aux_obj     # rebuild really happened
        assert _recall(ids_inc, ids_full) >= 0.95

    def test_incremental_packed_refine_update(self):
        """refine_store="int8"/"bf16" shadows: churn repacks ONLY the dirty
        rows; per-row stateless quantization makes the incremental result
        bit-identical to a full rebuild."""
        from vector_db_tpu.ops.distance import pack_bf16_rows, pack_int8_rows

        vecs = _corpus(1024)
        for store_kind in ("int8", "bf16"):
            idx = HnswPqIndex(DIM, 2048, config=HnswPqConfig(
                num_subspaces=16, training_samples=512,
                refine_store=store_kind))
            idx.bulk_load_stream([(range(1024), vecs)])
            st = idx.store.state
            if store_kind == "int8":
                idx._int8_refine_store(st)        # full build
            else:
                idx._packed_refine_store(st)
            assert idx._pack_dirty == []
            newv = (_corpus(8, seed=5) * 2.0).astype(np.float32)
            assert len(idx.add_batch(range(9000, 9008), newv)) == 8
            assert idx._pack_dirty                # mutations recorded
            st = idx.store.state
            if store_kind == "int8":
                p1, s1 = idx._int8_refine_store(st)   # incremental
                pf, sf = pack_int8_rows(st.vectors)   # reference rebuild
                np.testing.assert_array_equal(np.asarray(s1), np.asarray(sf))
            else:
                p1 = idx._packed_refine_store(st)
                pf = pack_bf16_rows(st.vectors)
            assert idx._pack_dirty == []
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(pf))

    def test_incremental_fast_tables_update(self):
        """adc_fast's ADC tables (codes_t + recon norms) refresh
        incrementally under churn — verified by cbt identity — and the
        incremental tables match a full rebuild (codes_t bit-exact; norms
        to f32 summation-order tolerance)."""
        vecs = _corpus(2048)
        idx = HnswPqIndex(DIM, 4096, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            search_mode="adc_fast"))
        idx.bulk_load_stream([(range(2048), vecs)])
        idx.search_batch(vecs[:4], 1)            # warm: full table build
        assert idx._fast_dirty == []
        cbt_obj = idx._fast_cache[3]
        for i in range(16):
            assert idx.remove(i)
        newv = _corpus(16, seed=7)
        assert len(idx.add_batch(range(5000, 5016), newv)) == 16
        assert idx._fast_dirty                    # mutations recorded
        ids, _ = idx.search_batch(newv, 5)
        assert idx._fast_cache[3] is cbt_obj      # incremental, no rebuild
        assert idx._fast_dirty == []
        hits = sum(5000 + i in set(ids[i].tolist()) for i in range(16))
        assert hits >= 14, hits
        ids2, _ = idx.search_batch(vecs[:16], 5)
        assert not set(ids2.ravel().tolist()) & set(range(16))
        ct_i, _, cn_i = idx._fast_tables()
        idx._fast_cache = None                    # force full rebuild
        idx._fast_dirty = None
        ct_f, _, cn_f = idx._fast_tables()
        np.testing.assert_array_equal(np.asarray(ct_i), np.asarray(ct_f))
        np.testing.assert_allclose(np.asarray(cn_i), np.asarray(cn_f),
                                   rtol=2e-6)

    def test_compressed_store_fused_scan(self):
        """raw_store=False + scan_pallas_int8: the fused kernel streams the
        store's OWN packed rows (no shadow copy) at near-exact recall."""
        vecs = _corpus(4096)
        idx = HnswPqIndex(DIM, 4096, config=HnswPqConfig(
            num_subspaces=16, training_samples=2048, raw_store=False,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(4096), vecs)])
        q = _corpus(128, seed=7)
        ids, dists = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) >= 0.97
        assert np.all(dists[:, :-1] <= dists[:, 1:] + 1e-6)

    def test_compressed_store_fused_scan_cosine_offset(self):
        r = np.random.default_rng(11)
        vecs = (r.standard_normal((2048, DIM)) + 5.0).astype(np.float32)
        idx = HnswPqIndex(DIM, 2048, metric="cosine", config=HnswPqConfig(
            num_subspaces=16, training_samples=1024, raw_store=False,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        q = (r.standard_normal((64, DIM)) + 5.0).astype(np.float32)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q, metric="cosine")) >= 0.93

    def test_compressed_fused_scan_state_roundtrip(self):
        """state_arrays -> load_state_arrays preserves fused-scan results
        (the conditioning shadow rebuilds lazily from the loaded packed
        store)."""
        vecs = _corpus(2048)
        cfg = HnswPqConfig(num_subspaces=16, training_samples=1024,
                           raw_store=False, search_mode="scan_pallas_int8")
        idx = HnswPqIndex(DIM, 2048, config=cfg)
        idx.bulk_load_stream([(range(2048), vecs)])
        q = _corpus(64, seed=3)
        ids1, d1 = idx.search_batch(q, K)
        idx2 = HnswPqIndex(DIM, 2048, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024,
            raw_store=False, search_mode="scan_pallas_int8"))
        idx2.load_state_arrays(idx.state_arrays())
        ids2, d2 = idx2.search_batch(q, K)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-5, atol=1e-5)

    def test_compressed_store_fused_scan_delete(self):
        vecs = _corpus(2048)
        idx = HnswPqIndex(DIM, 2048, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024, raw_store=False,
            search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        for i in range(8):
            idx.remove(i)
        ids, _ = idx.search_batch(vecs[:8], 1)
        assert not set(ids[:, 0].tolist()) & set(range(8))


class TestRefineResidual:
    """Second-level int8 residual refine (HnswPqConfig.refine_residual):
    ~16-bit effective row precision at half the bytes of f32 — removes the
    refine-ordering recall ceiling of the single-level int8 store
    (ops/distance.pack_int8_residual)."""

    def _build(self, mode, vecs, residual=True, metric="l2"):
        idx = HnswPqIndex(DIM, 4096, metric=metric, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024, raw_store=False,
            refine_residual=residual, search_mode=mode,
            proxy_dims=16 if mode == "pca" else 0))
        idx.bulk_load_stream([(range(len(vecs)), vecs)])
        return idx

    def test_raw_store_rejects_residual(self):
        with pytest.raises(ValueError, match="refine_residual"):
            HnswPqIndex(DIM, 512, config=HnswPqConfig(refine_residual=True))

    def test_get_roundtrip_16bit(self):
        vecs = _corpus(512)
        st = VectorStore(512, DIM, raw=False, residual=True)
        st.add_batch(range(512), vecs)
        got = np.stack([st.get(i) for i in range(16)])
        # two-level int8: per-element error ~2e-5 of max|v| (vs ~4e-3
        # single-level)
        err = np.abs(got - vecs[:16]).max()
        assert err <= 1e-4 * np.abs(vecs[:16]).max(), err

    @pytest.mark.parametrize("mode", ["scan_pallas_int8", "adc_fast", "pca"])
    def test_residual_refine_beats_single_level(self, mode):
        """Every int8-refining mode matches the exact-refine ordering on a
        pool the single-level refine mis-ranks (the A6 ceiling, CPU
        scale)."""
        vecs = _corpus(4096)
        q = vecs[:64] + 0.02 * _corpus(64, seed=9)
        gt = _gt(vecs, q)
        r1 = _recall(self._build(mode, vecs, False).search_batch(q, K)[0], gt)
        r2 = _recall(self._build(mode, vecs, True).search_batch(q, K)[0], gt)
        assert r2 >= r1 - 1e-9, (mode, r1, r2)
        # adc_fast's residual-mode remainder is POOL containment (codes-only
        # selection at 16 subspaces), not the refine this feature fixes
        assert r2 >= (0.94 if mode == "adc_fast" else 0.97), (mode, r2)

    def test_scan_int8_residual_exact(self):
        """scan_int8 + residual reads BOTH levels: exhaustive scoring at
        ~16-bit precision matches the f32 oracle's top-k exactly."""
        vecs = _corpus(2048)
        idx = self._build("scan_int8", vecs)
        q = vecs[:64] + 0.02 * _corpus(64, seed=9)
        idx.config.scan_recall_target = 1.0
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q)) == 1.0

    def test_residual_checkpoint_roundtrip(self):
        vecs = _corpus(2048)
        idx = self._build("scan_pallas_int8", vecs)
        q = _corpus(64, seed=3)
        ids1, d1 = idx.search_batch(q, K)
        idx2 = HnswPqIndex(DIM, 4096, config=HnswPqConfig(
            num_subspaces=16, training_samples=1024, raw_store=False,
            refine_residual=True, search_mode="scan_pallas_int8"))
        idx2.load_state_arrays(idx.state_arrays())
        assert idx2.store.state.resid is not None
        ids2, d2 = idx2.search_batch(q, K)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-5, atol=1e-5)

    def test_residual_churn(self):
        vecs = _corpus(2048)
        idx = self._build("scan_pallas_int8", vecs)
        for i in range(16):
            assert idx.remove(i)
        newv = _corpus(16, seed=7)
        assert len(idx.add_batch(range(9000, 9016), newv)) == 16
        ids, _ = idx.search_batch(newv, 5)
        hits = sum(9000 + i in set(ids[i].tolist()) for i in range(16))
        assert hits >= 15, hits
        ids2, _ = idx.search_batch(vecs[:16], 5)
        assert not set(ids2.ravel().tolist()) & set(range(16))
        # residual rows of the re-added slots are consistent with a fresh
        # two-level pack (get() round-trips at 16-bit precision)
        got = np.asarray(idx.get(9003))
        assert np.abs(got - newv[3]).max() <= 1e-4 * np.abs(newv[3]).max()

    def test_residual_cosine(self):
        r = np.random.default_rng(11)
        vecs = (r.standard_normal((2048, DIM)) + 5.0).astype(np.float32)
        idx = HnswPqIndex(DIM, 2048, metric="cosine", config=HnswPqConfig(
            num_subspaces=16, training_samples=1024, raw_store=False,
            refine_residual=True, search_mode="scan_pallas_int8"))
        idx.bulk_load_stream([(range(2048), vecs)])
        q = (r.standard_normal((64, DIM)) + 5.0).astype(np.float32)
        ids, _ = idx.search_batch(q, K)
        assert _recall(ids, _gt(vecs, q, metric="cosine")) >= 0.95
