"""1M x 512 scale benchmark (10x the north-star corpus; 2 GB raw on chip).

Rows: the Pallas fused-scan kernel (what auto resolves to at this size),
the XLA blocked scan, the memory-bound adc_fast mode in its chunked
large-N form (codes = 64 MB vs 2 GB raw), and the PCA-proxy mode
(proxy = 64-128 MB).  Spectral (power-law) corpus, Q=1024, k=10.

NOTE: every timed closure takes the corpus as an ARGUMENT — closing over a
device array bakes it into the program as a 2 GB captured constant, which
the remote compiler then has to swallow (minutes per compile).

Usage: python benchmarks/bench_1m.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, reps=5):
    @jax.jit
    def loop(*a):
        def body(i, eps):
            return fn(*a, eps) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / reps


def main():
    from vector_db_tpu.ops import adc, pca
    from vector_db_tpu.ops.distance import (
        blocked_knn, blocked_knn_fast, pack_bf16_rows,
    )
    from vector_db_tpu.ops.kmeans import subspace_kmeans_fit
    from vector_db_tpu.ops.pallas_kernels import fused_scan_topk, pq_decode_recon_t

    dim, n, nq, k = 512, 1_000_064, 1024, 10  # n 128-aligned (see ops/adc)
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    t0 = time.time()
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]
    jax.block_until_ready(qj)
    log(f"data gen: {time.time()-t0:.1f}s  ({n} x {dim}, "
        f"{n*dim*4/1e9:.1f} GB raw)")

    t0 = time.time()
    gt_path = f"/tmp/gt1m_spectral_{dim}_{n}_{nq}_{k}.npy"
    try:
        gt = np.load(gt_path)
    except OSError:
        _, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), k, block_n=65536)
        gt = np.asarray(gt_i)
        np.save(gt_path, gt)
    gt_sets = [set(gt[i].tolist()) for i in range(nq)]
    log(f"ground truth: {time.time()-t0:.1f}s")

    valid = jnp.ones(n, bool)
    norms = jnp.sum(vj * vj, axis=1)

    def rec(ids):
        a = np.asarray(ids)
        return float(np.mean(
            [len(set(a[i].tolist()) & gt_sets[i]) / k for i in range(nq)]
        ))

    # ---- Pallas fused-scan kernel (what auto resolves to at this size) ----
    masked_n = jnp.where(valid, norms, jnp.inf)

    def pallas_run(q, base, mn, eps):
        d, i = fused_scan_topk(q + eps, base, mn, k)
        return d[0, 0]
    d, i = fused_scan_topk(qj, vj, masked_n, k)
    dt = timed(pallas_run, qj, vj, masked_n)
    log(f"pallas fused-scan: recall={rec(i):.4f}  {dt*1e3:.1f} ms  "
        f"{nq/dt:,.0f} QPS")

    # ---- XLA blocked scan (materialises [Q, block] tiles) -----------------
    def xla_run(q, base, v, nr, eps):
        d, i = blocked_knn_fast(q + eps, base, v, k, b_norms=nr,
                                block_n=131072, recall_target=0.95)
        return d[0, 0]
    d, i = blocked_knn_fast(qj, vj, valid, k, b_norms=norms,
                            block_n=131072, recall_target=0.95)
    dt = timed(xla_run, qj, vj, valid, norms)
    log(f"xla blocked scan: recall={rec(i):.4f}  {dt*1e3:.1f} ms  "
        f"{nq/dt:,.0f} QPS")

    packed = pack_bf16_rows(vj)
    jax.block_until_ready(packed)
    ids = jnp.arange(n, dtype=jnp.int32)
    qf = jnp.asarray(np.asarray(qj))
    sample_np = np.asarray(vj[:20000])

    # ---- PCA-proxy mode (proxy 64-128 MB vs 2 GB raw) ---------------------
    for p, r in ((32, 256), (64, 256)):
        t0 = time.time()
        mu, basis = pca.pca_fit(sample_np, p)
        mu_j, basis_j = jnp.asarray(mu), jnp.asarray(basis)
        proxy = pca.project_rows(vj, mu_j, basis_j)
        p32f = proxy.astype(jnp.float32)
        pnorms = jnp.sum(p32f * p32f, axis=1)
        del p32f
        jax.block_until_ready(pnorms)
        log(f"pca p={p}: fit+project {time.time()-t0:.1f}s")

        def pca_run(q, pt, pn, base, pk, eps):
            d, _ = pca.pca_proxy_search(q + eps, mu_j, basis_j, pt, pn,
                                        valid, base, ids, k, select_r=r,
                                        packed_base=pk)
            return d[0, 0]
        d, e = pca.pca_proxy_search(qf, mu_j, basis_j, proxy, pnorms,
                                    valid, vj, ids, k, select_r=r,
                                    packed_base=packed)
        dt = timed(pca_run, qf, proxy, pnorms, vj, packed)
        log(f"pca p={p} R={r}: recall={rec(e):.4f}  {dt*1e3:.1f} ms  "
            f"{nq/dt:,.0f} QPS")
        del proxy, pnorms

    # ---- memory-bound adc_fast, chunked (codes 64 MB vs 2 GB raw) ---------
    t0 = time.time()
    v = np.asarray(jnp.var(jnp.asarray(sample_np), axis=0))
    perm = jnp.asarray(adc.balanced_subspace_perm(v, 64))
    cb = subspace_kmeans_fit(jax.random.PRNGKey(42),
                             jnp.asarray(sample_np)[:, perm],
                             num_subspaces=64, k=256, iters=25)
    codes_t = jnp.transpose(adc.pq_encode(vj[:, perm], cb), (1, 0))
    cbt = adc.codebooks_to_cbt(cb)
    r32 = pq_decode_recon_t(codes_t, cbt).astype(jnp.float32)
    cnorms = jnp.sum(r32 * r32, axis=0)
    del r32
    jax.block_until_ready(cnorms)
    log(f"train+encode: {time.time()-t0:.1f}s  (codes {n*64/1e6:.0f} MB, 32x)")

    for bucket, sel in ((1024, 512), (1024, 0)):
        def mb_run(q, ct, base, pk, cn, eps):
            d, _ = adc.adc_fast_search(
                q + eps, ct, cbt, valid, base, ids, k, bucket=bucket,
                winners=1, pool_mode="approx", chunk_n=131072,
                code_norms=cn, perm=perm, packed_base=pk, select_r=sel)
            return d[0, 0]
        d, e = adc.adc_fast_search(
            qf, codes_t, cbt, valid, vj, ids, k, bucket=bucket, winners=1,
            pool_mode="approx", chunk_n=131072, code_norms=cnorms, perm=perm,
            packed_base=packed, select_r=sel)
        dt = timed(mb_run, qf, codes_t, vj, packed, cnorms)
        log(f"adc_fast chunked bucket={bucket} sel={sel}: "
            f"recall={rec(e):.4f}  {dt*1e3:.1f} ms  {nq/dt:,.0f} QPS")


if __name__ == "__main__":
    main()
