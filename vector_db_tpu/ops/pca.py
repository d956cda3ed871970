"""PCA-proxy filtering: a truncated-PCA first stage for k-NN search.

Multi-stage re-rank design (the pattern of pHNSW / AQR-style pipelines —
PAPERS.md): scan a [p << d]-dimensional PCA projection of the corpus with
one tiny MXU matmul, keep the ranked top-R by proxy distance, then exact-
re-rank only those R rows.  The proxy is 64 B/vector at p=32 (bf16) — the
same index-memory class as 32x PQ codes — and on decaying-spectrum corpora
its top-R containment of the true top-10 is measured at 97.0% (p=32,
R=256) / 99.05% (p=64, R=128) at 512d x 100k, so the exact refine restores
near-perfect recall.

Compared to the ADC decode-kernel scan (ops/adc.adc_fast_search), the proxy
scan needs no decode pass: scoring is ONE [Q, p] x [p, N] matmul, so the
stage cost scales with p/d (~16x fewer FLOPs at p=32, d=512) and no
VPU-gather decode.  The proxy scan rides `blocked_knn_fast`, so peak memory
is [Q, block_n] — at 1M+ the [Q, N] distance matrix never materialises.
The tradeoff is distribution-dependence: truncated PCA needs a decaying
eigenspectrum (real embeddings have one; isotropic noise does not — there
PQ and PCA both lose, see BENCH_REPORT A4).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pca_fit(sample: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Fit a truncated-PCA basis on a host-side sample.

    sample [m, d] float32 -> (mean [d], basis [d, p]), eigenvectors of the
    sample covariance for the p largest eigenvalues.  d x d eigh on the host
    is microseconds at d<=4096; only the [d, p] basis ships to the device.
    """
    sample = np.asarray(sample, np.float64)
    mu = sample.mean(axis=0)
    cov = np.cov((sample - mu).T)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)[:p]
    return mu.astype(np.float32), v[:, order].astype(np.float32)


@jax.jit
def project_rows(vectors: Array, mean: Array, basis: Array) -> Array:
    """[N, d] rows -> centered projections [N, p] bf16 (the proxy store)."""
    return ((vectors - mean[None, :]) @ basis).astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("k", "select_r", "metric", "rerank_block",
                              "block_n")
)
def pca_proxy_search(
    queries: Array,
    mean: Array,
    basis: Array,
    proxy: Array,
    proxy_norms: Array,
    valid: Array,
    base: Array,
    ids: Array,
    k: int,
    select_r: int = 256,
    metric: str = "l2",
    rerank_block: int = 512,
    packed_base: Optional[Array] = None,
    block_n: int = 131072,
) -> tuple[Array, Array]:
    """Proxy scan + ranked top-R + blocked exact refine, ONE device program.

    queries [Q, d] f32; proxy [N, p] bf16 (project_rows); proxy_norms [N]
    f32 (squared norms of the projections, un-masked); valid [N];
    base [N, d] raw store; ids [N] external ids.
    Returns (exact dists [Q, k], external ids [Q, k]) ascending.

    The proxy ranking is always squared-L2 in PCA space (rank-equivalent to
    cosine after the exact refine re-orders under `metric`).
    """
    from .distance import blocked_knn_fast, blocked_rerank, blocked_rerank_packed

    qp = ((queries - mean[None, :]) @ basis).astype(proxy.dtype)   # [Q, p]
    n = proxy.shape[0]
    r = min(select_r, n)
    _, pool = blocked_knn_fast(
        qp, proxy, valid, r, metric="l2", b_norms=proxy_norms,
        block_n=block_n, recall_target=0.95,
    )

    if packed_base is not None:
        out_d, slots = blocked_rerank_packed(queries, packed_base, pool, k,
                                             metric, rb=rerank_block)
    else:
        out_d, slots = blocked_rerank(queries, base, pool, k, metric,
                                      rb=rerank_block)
    ext = jnp.where(jnp.isfinite(out_d), ids[jnp.maximum(slots, 0)], -1)
    return out_d, ext
