"""Randomized CRUD-vs-oracle fuzz: interleaved add/delete/re-add/reload
sequences where search results are checked against a numpy brute-force
oracle over the live set after every phase.

Sharper than test_churn's liveness invariants: exact modes must match the
oracle's top-k SET exactly (catching slot-reuse, stale incremental-shadow,
and tombstone bugs as wrong-neighbor results, not just dead ids), and the
int8-compressed tier must stay within quantization distance of it.

Reference analog: the integration suite's mutation coverage
(src/test/java/com/vectordb/VectorDatabaseTest.java) — upgraded to an
oracle-equality property over random op sequences.
"""

import numpy as np
import pytest

from vector_db_tpu import HnswPqConfig, IndexType, VectorDatabase

DIM, CAP, K = 16, 1024, 5


def _oracle_topk(live: dict, q: np.ndarray, k: int,
                 metric: str = "l2") -> list[tuple[set, set, set]]:
    """Per query: (topk, must, ok) id sets from a float64 oracle.

    ``must`` (strictly inside the top-k by more than eps) has to appear in
    any correct exact result; ``ok`` (within eps of the k-th) is the set a
    correct exact result may draw from.  eps is scale-aware: the device
    computes sq-L2 via the f32 norm identity (q²+v²−2q·v), whose
    cancellation error at distance scale D is ~1e-6·D — an absolute 1e-5
    would be platform-fragile at DIM=16 where D ≈ 30."""
    ids = np.fromiter(live.keys(), np.int64)
    mat = np.stack([live[i] for i in ids]).astype(np.float64)
    q64 = q.astype(np.float64)
    if metric == "cosine":
        qn = q64 / np.linalg.norm(q64, axis=1, keepdims=True)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        d = 1.0 - qn @ mn.T
    else:
        d = ((q64[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    out = []
    for row in d:
        order = np.argsort(row, kind="stable")[:k]
        kth = row[order[-1]]
        eps = 1e-4 * (1.0 + abs(kth))
        must = set(ids[np.flatnonzero(row < kth - eps)].tolist())
        ok = set(ids[np.flatnonzero(row <= kth + eps)].tolist())
        out.append((set(ids[order].tolist()), must, ok))
    return out


def _check(db, live, rng, exact: bool, tag: str, metric: str = "l2"):
    qn = 12
    pick = rng.choice(np.fromiter(live.keys(), np.int64), qn)
    q = np.stack([live[i] for i in pick]) + 0.01 * rng.standard_normal(
        (qn, DIM)
    ).astype(np.float32)
    oracle = _oracle_topk(live, q, K, metric)
    hits = 0
    for i in range(qn):
        res = db.search(q[i], K)
        got = {r.id for r in res}
        assert got <= set(live.keys()) | {-1}, f"{tag}: dead ids {got}"
        topk, must, ok = oracle[i]
        if exact:
            assert got <= ok and len(got) == min(K, len(live)), (
                f"{tag}: exact mode diverged from oracle: got {sorted(got)} "
                f"allowed {sorted(ok)}"
            )
            assert must <= got, (
                f"{tag}: exact mode dropped clear top-k members "
                f"{sorted(must - got)}"
            )
            hits += K
        else:
            hits += len(got & topk)
    if not exact:
        assert hits / (qn * K) >= 0.9, f"{tag}: recall {hits / (qn * K)}"


MODES = [
    ("brute", IndexType.BRUTE, None, True, "l2"),
    ("scan_exact", IndexType.HNSWPQ,
     HnswPqConfig(num_subspaces=4, num_centroids=16, training_samples=64,
                  search_mode="scan_exact", scan_recall_target=1.0), True,
     "l2"),
    # fused int8 kernel over the raw tier: int8 SELECTION shadow under
    # churn, exact f32 refine -> still oracle-exact
    ("scan_pallas_int8_raw", IndexType.HNSWPQ,
     HnswPqConfig(num_subspaces=4, num_centroids=16, training_samples=64,
                  search_mode="scan_pallas_int8"), True, "l2"),
    # compressed tier: every row representation is quantized -> recall bound
    ("compressed_fused", IndexType.HNSWPQ,
     HnswPqConfig(raw_store=False, num_subspaces=4, num_centroids=16,
                  training_samples=64, search_mode="scan_pallas_int8"),
     False, "l2"),
    # two-level int8 residual refine: ~16-bit effective row precision puts
    # refine error far below the oracle's tie epsilon -> the compressed
    # tier passes the EXACT check
    ("compressed_residual", IndexType.HNSWPQ,
     HnswPqConfig(raw_store=False, refine_residual=True, num_subspaces=4,
                  num_centroids=16, training_samples=64,
                  search_mode="scan_pallas_int8"), True, "l2"),
    # cosine: the normalized-space contracts (shadow conditioning, refine
    # denominators) under the same churn schedule
    ("cosine_exact", IndexType.HNSWPQ,
     HnswPqConfig(num_subspaces=4, num_centroids=16, training_samples=64,
                  search_mode="scan_exact", scan_recall_target=1.0), True,
     "cosine"),
    ("cosine_compressed", IndexType.HNSWPQ,
     HnswPqConfig(raw_store=False, num_subspaces=4, num_centroids=16,
                  training_samples=64, search_mode="scan_pallas_int8"),
     False, "cosine"),
]


@pytest.mark.parametrize("tag,itype,cfg,exact,metric", MODES,
                         ids=[m[0] for m in MODES])
def test_crud_oracle_fuzz(tag, itype, cfg, exact, metric, tmp_path):
    rng = np.random.default_rng(1234)
    b = (VectorDatabase.builder().with_dimension(DIM)
         .with_max_elements(CAP).with_index_type(itype)
         .with_metric(metric)
         .with_storage_path(str(tmp_path / tag)))
    if cfg is not None:
        b = b.with_index_config(cfg)
    db = b.build()

    live: dict[int, np.ndarray] = {}
    next_id = 0
    deleted_pool: list[int] = []
    ran: set[int] = set()

    # deterministic op schedule (every op type guaranteed covered),
    # randomized operands: add -> delete -> re-add -> reload -> mixed.
    # The first wave exceeds the 128-row floor so the delete/re-add
    # phases actually run as themselves (a smaller wave would divert
    # them to add waves and silently skip the re-add coverage).
    for phase, op in enumerate((0, 1, 2, 3, 0, 1)):
        if op == 0 or len(live) < 128:  # add wave
            ran.add(0)
            n = int(rng.integers(160, 224))
            vecs = rng.standard_normal((n, DIM)).astype(np.float32)
            ids = list(range(next_id, next_id + n))
            next_id += n
            assert len(db.add_batch(ids, vecs)) == n
            live.update(zip(ids, vecs))
        elif op == 1:  # delete a random subset
            ran.add(1)
            victims = rng.choice(np.fromiter(live.keys(), np.int64),
                                 min(40, len(live) // 2), replace=False)
            for v in victims.tolist():
                assert db.delete_vector(v)
                del live[v]
                deleted_pool.append(v)
        elif op == 2 and deleted_pool:  # re-add previously deleted ids
            ran.add(2)
            n = min(16, len(deleted_pool))
            ids = [deleted_pool.pop() for _ in range(n)]
            vecs = rng.standard_normal((n, DIM)).astype(np.float32)
            assert len(db.add_batch(ids, vecs)) == n, (
                f"{tag}: re-add of deleted ids rejected"
            )
            live.update(zip(ids, vecs))
        else:  # checkpoint round-trip mid-sequence
            ran.add(3)
            db.close()
            db = b.build()
            assert db.size() == len(live), f"{tag}: reload lost rows"
        _check(db, live, rng, exact, f"{tag}/phase{phase}", metric)
    assert ran == {0, 1, 2, 3}, (
        f"{tag}: op schedule silently skipped ops {sorted({0,1,2,3} - ran)}"
    )
    db.close()
