"""Churn stress: interleaved add/delete/rebuild cycles across index types.

Catches slot-reuse, tombstone, and stale-structure bugs that single-shot
tests miss (reference analog: the mutation paths of the integration suite
plus test_performance.cpp's long-running add loops)."""

import numpy as np
import pytest

from vector_db_tpu import (
    AnnoyConfig,
    HnswConfig,
    HnswPqConfig,
    IndexType,
    IvfConfig,
    LshConfig,
    VectorDatabase,
)

CONFIGS = [
    (IndexType.BRUTE, None),
    (IndexType.HNSW, HnswConfig(m=8, ef_construction=32, ef_search=64, batch_insert=16)),
    (IndexType.HNSWPQ, HnswPqConfig(num_subspaces=4, num_centroids=16,
                                    training_samples=64, refine_k=64)),
    (IndexType.HNSWPQ, HnswPqConfig(num_subspaces=4, num_centroids=16,
                                    training_samples=64, search_mode="adc_fast",
                                    adc_bucket=4, adc_winners=2)),
    (IndexType.HNSWPQ, HnswPqConfig(num_subspaces=4, num_centroids=16,
                                    training_samples=64, search_mode="pca",
                                    proxy_dims=6, pca_r=64)),
    # the compressed (>HBM) regime under churn: int8 store, adc_fast and
    # scan_int8 paths
    (IndexType.HNSWPQ, HnswPqConfig(raw_store=False, num_subspaces=4,
                                    num_centroids=16, training_samples=64,
                                    search_mode="adc_fast", adc_bucket=4,
                                    adc_winners=2)),
    (IndexType.HNSWPQ, HnswPqConfig(raw_store=False, num_subspaces=4,
                                    num_centroids=16, training_samples=64,
                                    search_mode="scan_int8")),
    # fused Pallas pool kernels under churn: shadow/conditioning caches are
    # keyed on (vectors|packed, valid) identity and must track mutations
    (IndexType.HNSWPQ, HnswPqConfig(num_subspaces=4, num_centroids=16,
                                    training_samples=64,
                                    search_mode="scan_pallas_int8")),
    (IndexType.HNSWPQ, HnswPqConfig(raw_store=False, num_subspaces=4,
                                    num_centroids=16, training_samples=64,
                                    search_mode="scan_pallas_int8")),
    (IndexType.IVF, IvfConfig(num_clusters=8, num_probes=8)),
    (IndexType.LSH, LshConfig(num_tables=6, num_bits=8)),
    (IndexType.ANNOY, AnnoyConfig(num_trees=4, leaf_size=8)),
]


@pytest.mark.parametrize("itype,cfg", CONFIGS, ids=[
    f"{c[0].value}:{getattr(c[1], 'search_mode', '')}" if c[1] else c[0].value
    for c in CONFIGS
])
def test_churn_cycles(itype, cfg, rng):
    dim, cap = 12, 512
    b = (VectorDatabase.builder().with_dimension(dim).with_max_elements(cap)
         .with_index_type(itype))
    if cfg is not None:
        b = b.with_index_config(cfg)
    db = b.build()

    live: dict[int, np.ndarray] = {}
    next_id = 0
    r = np.random.default_rng(42)

    for cycle in range(4):
        # add a wave
        n_add = 60
        vecs = r.standard_normal((n_add, dim)).astype(np.float32)
        ids = list(range(next_id, next_id + n_add))
        accepted = db.add_batch(ids, vecs)
        assert len(accepted) == n_add
        for i, vid in enumerate(ids):
            live[vid] = vecs[i]
        next_id += n_add

        # delete a third of the oldest
        victims = sorted(live.keys())[: n_add // 3]
        for v in victims:
            assert db.delete_vector(v)
            del live[v]

        if cycle % 2 == 1:
            db.rebuild_index()

        # invariants after every cycle
        assert db.size() == len(live)
        some = list(live.items())[:10]
        for vid, vec in some:
            got = db.get_vector(vid)
            assert got is not None
            # int8-compressed stores round-trip values through per-row
            # quantization (|err| <= max|v|/254); raw stores are exact
            raw = getattr(getattr(db.index, "store", None), "raw", True)
            atol = 0.0 if raw else float(np.abs(vec).max()) / 120.0
            np.testing.assert_allclose(got.values, vec, rtol=1e-6, atol=atol)
            res = db.search(vec, 5)
            assert res, f"{itype}: empty result for live id {vid}"
            ids_out = [x.id for x in res]
            assert all(i in live for i in ids_out), (
                f"{itype}: returned deleted/unknown ids {set(ids_out) - set(live)}"
            )
        # deleted ids never come back
        dead = victims[:5]
        for v in dead:
            assert db.get_vector(v) is None
    db.close()
