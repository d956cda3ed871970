"""PCA-proxy mode benchmark: 512d x 100k spectral, Q=1024, k=10.

Measures pca_proxy_search (ops/pca) recall + serialized device QPS across
(proxy_dims, pool) settings, against the cached adc_fast ground truth.

Usage: python benchmarks/bench_pca.py
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


def timed(fn, *args, reps=10):
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
    from vector_db_tpu.ops import pca
    from vector_db_tpu.ops.distance import blocked_knn, pack_bf16_rows

    dim, n, nq, k = 512, 100_000, 1024, 10
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
    vj = gen(jax.random.PRNGKey(42), (n, dim)) * scale[None, :]
    qj = gen(jax.random.PRNGKey(7), (nq, dim)) * scale[None, :]

    t0 = time.time()
    gt_path = f"/tmp/adc_gt_spectral_{dim}_{n}_{nq}_{k}.npy"
    try:
        gt = np.load(gt_path)
    except OSError:
        _, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), k, block_n=16384)
        gt = np.asarray(gt_i)
        np.save(gt_path, gt)
    gt_sets = [set(gt[i].tolist()) for i in range(nq)]
    log(f"ground truth: {time.time()-t0:.1f}s")

    valid = jnp.ones(n, bool)
    ids = jnp.arange(n, dtype=jnp.int32)
    packed = pack_bf16_rows(vj)
    qf = jnp.asarray(np.asarray(qj))
    sample = np.asarray(vj[:20000])

    for p in (32, 64):
        t0 = time.time()
        mu, basis = pca.pca_fit(sample, p)
        mu_j, basis_j = jnp.asarray(mu), jnp.asarray(basis)
        proxy = pca.project_rows(vj, mu_j, basis_j)
        p32 = proxy.astype(jnp.float32)
        pnorms = jnp.sum(p32 * p32, axis=1)
        jax.block_until_ready(pnorms)
        log(f"p={p}: fit+project {time.time()-t0:.1f}s "
            f"({p*2} B/vec = {dim*4/(p*2):.0f}x proxy compression)")
        for r in (128, 256):
            def run(q, eps):
                d, _ = pca.pca_proxy_search(
                    q + eps, mu_j, basis_j, proxy, pnorms, valid, vj, ids,
                    k, select_r=r, packed_base=packed)
                return d[0, 0]
            d, e = pca.pca_proxy_search(qf, mu_j, basis_j, proxy, pnorms,
                                        valid, vj, ids, k, select_r=r,
                                        packed_base=packed)
            e_np = np.asarray(e)
            rec = float(np.mean(
                [len(set(e_np[i].tolist()) & gt_sets[i]) / k
                 for i in range(nq)]
            ))
            dt = timed(run, qf)
            log(f"  p={p} R={r}: recall={rec:.4f}  {dt*1e3:.2f} ms  "
                f"{nq/dt:,.0f} QPS")


if __name__ == "__main__":
    main()
