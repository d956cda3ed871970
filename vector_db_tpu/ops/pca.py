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
VPU-gather decode.  The tradeoff is distribution-dependence: truncated PCA
needs a decaying eigenspectrum (real embeddings have one; isotropic noise
does not — there PQ and PCA both lose, see BENCH_REPORT A4).
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
def project_t(vectors: Array, mean: Array, basis: Array) -> Array:
    """[N, d] rows -> centered projection, transposed [p, N] bf16 (the
    scan layout, mirroring the decode kernel's reconT)."""
    return ((vectors - mean[None, :]) @ basis).T.astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("k", "select_r", "metric", "rerank_block")
)
def pca_proxy_search(
    queries: Array,
    mean: Array,
    basis: Array,
    proxy_t: Array,
    proxy_norms: Array,
    valid: Array,
    base: Array,
    ids: Array,
    k: int,
    select_r: int = 256,
    metric: str = "l2",
    rerank_block: int = 512,
    packed_base: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Proxy scan + ranked top-R + blocked exact refine, ONE device program.

    queries [Q, d] f32; proxy_t [p, N] bf16 (project_t layout); proxy_norms
    [N] f32 (squared norms of the projections, un-masked); valid [N];
    base [N, d] raw store; ids [N] external ids.
    Returns (exact dists [Q, k], external ids [Q, k]) ascending.
    """
    from .distance import blocked_rerank, blocked_rerank_packed

    qp = ((queries - mean[None, :]) @ basis).astype(proxy_t.dtype)  # [Q, p]
    cross = jax.lax.dot_general(
        qp, proxy_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    masked = jnp.where(valid, proxy_norms, jnp.inf)
    dist = masked[None, :] - 2.0 * cross          # + ||q_p||^2 == const/row
    n = proxy_t.shape[1]
    r = min(select_r, n)
    neg, sel = jax.lax.approx_max_k(-dist, r, recall_target=0.95)
    pool = jnp.where(jnp.isfinite(-neg), sel.astype(jnp.int32), -1)

    if packed_base is not None:
        out_d, slots = blocked_rerank_packed(queries, packed_base, pool, k,
                                             metric, rb=rerank_block)
    else:
        out_d, slots = blocked_rerank(queries, base, pool, k, metric,
                                      rb=rerank_block)
    ext = jnp.where(jnp.isfinite(out_d), ids[jnp.maximum(slots, 0)], -1)
    return out_d, ext
