"""Memory-bound mode benchmark: adc_fast_search QPS/recall frontier.

512d x 100k, 32x PQ (64 subspaces x 8 bits), Q=1024, k=10, seed 42 — the
VERDICT round-1 target config.  Sweeps the pool size (bucket/winners) and
reports recall + serialized device QPS on two corpora:

  * gaussian — i.i.d. N(0,1): the information-theoretic worst case for PQ
    (max entropy, nothing to exploit; real embeddings are never like this)
  * spectral — N(0,1) @ diag((i+1)^-0.5): a power-law eigenvalue decay like
    real embedding models produce

Usage: python benchmarks/bench_adc_fast.py [gaussian|spectral|both]
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
            out = fn(*a, eps)
            return out * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _ = float(loop(*args))
    t0 = time.time()
    _ = float(loop(*args))
    return (time.time() - t0) / reps


def make_data(kind, n, dim, nq):
    gen = jax.jit(
        lambda key, shape: jax.random.normal(key, shape, jnp.float32),
        static_argnames="shape",
    )
    vj = gen(jax.random.PRNGKey(42), (n, dim))
    qj = gen(jax.random.PRNGKey(7), (nq, dim))
    if kind == "spectral":
        scale = jnp.asarray((np.arange(dim) + 1.0) ** -0.5, jnp.float32)
        vj = vj * scale[None, :]
        qj = qj * scale[None, :]
    return jax.block_until_ready(vj), qj


def main(which="both"):
    from vector_db_tpu.ops import adc
    from vector_db_tpu.ops.distance import blocked_knn
    from vector_db_tpu.ops.kmeans import subspace_kmeans_fit

    dim, n, nq, k = 512, 100_000, 1024, 10
    kinds = ["gaussian", "spectral"] if which == "both" else [which]
    for kind in kinds:
        log(f"\n=== {kind} corpus: {dim}d x {n}, Q={nq}, k={k}, 32x PQ ===")
        vj, qj = make_data(kind, n, dim, nq)
        t0 = time.time()
        gt_path = f"/tmp/adc_gt_{kind}_{dim}_{n}_{nq}_{k}.npy"
        try:
            gt = np.load(gt_path)
        except OSError:
            gt_d, gt_i = blocked_knn(qj, vj, jnp.ones(n, bool), k,
                                     block_n=16384)
            gt = np.asarray(gt_i)
            np.save(gt_path, gt)
        gt_sets = [set(gt[i].tolist()) for i in range(nq)]
        log(f"ground truth: {time.time()-t0:.1f}s")

        t0 = time.time()
        sample = vj[:20000]
        # variance-balanced dimension permutation (the index default)
        v = np.asarray(jnp.var(sample, axis=0))
        perm = jnp.asarray(adc.balanced_subspace_perm(v, 64))
        cb = subspace_kmeans_fit(
            jax.random.PRNGKey(42), sample[:, perm], num_subspaces=64, k=256,
            iters=25,
        )
        codes = adc.pq_encode(vj[:, perm], cb)
        codes_t = jnp.transpose(codes, (1, 0))
        cbt = adc.codebooks_to_cbt(cb)
        jax.block_until_ready(cbt)
        log(f"train+encode (balanced perm): {time.time()-t0:.1f}s")

        valid = jnp.ones(n, bool)
        ids = jnp.arange(n, dtype=jnp.int32)
        from vector_db_tpu.ops.pallas_kernels import pq_decode_recon_t

        r32 = pq_decode_recon_t(codes_t, cbt).astype(jnp.float32)
        cnorms = jnp.sum(r32 * r32, axis=0)

        configs = CONFIGS or [
            ("bucket", 512, 1), ("bucket", 256, 1), ("bucket", 128, 1),
            ("bucket", 64, 1), ("bucket", 32, 1), ("bucket", 32, 2),
            ("bucket", 16, 2),
            ("approx", 32, 1), ("approx", 16, 1),
        ]
        from vector_db_tpu.ops.distance import pack_bf16_rows

        packed_store = pack_bf16_rows(vj)
        for spec in configs:
            pool_mode, bucket, winners = spec[:3]
            packed = packed_store if "packed" in spec[3:] else None
            sel = 0
            for extra in spec[3:]:
                if str(extra).startswith("sel"):
                    sel = int(str(extra)[3:])
            pool = winners * n // bucket

            def run(q, eps):
                d, ext = adc.adc_fast_search(
                    q + eps, codes_t, cbt, valid, vj, ids, k,
                    bucket=bucket, winners=winners, pool_mode=pool_mode,
                    code_norms=cnorms, perm=perm, packed_base=packed,
                    select_r=sel,
                )
                return d[0, 0]

            d, ext = adc.adc_fast_search(
                np.asarray(qj), codes_t, cbt, valid, vj, ids, k,
                bucket=bucket, winners=winners, pool_mode=pool_mode,
                code_norms=cnorms, perm=perm, packed_base=packed,
                select_r=sel,
            )
            ext_np = np.asarray(ext)
            recall = float(np.mean(
                [len(set(ext_np[i].tolist()) & gt_sets[i]) / k
                 for i in range(nq)]
            ))
            dt = timed(run, qj)
            tag = "+packed" if packed is not None else ""
            if sel:
                tag += f"+sel{sel}"
            log(f"{pool_mode}{tag} bucket={bucket} winners={winners} "
                f"pool={pool}: recall={recall:.4f}  {dt*1e3:.2f} ms  "
                f"{nq/dt:.0f} QPS")


CONFIGS: list = []

if __name__ == "__main__":
    argv = sys.argv[1:]
    which = argv[0] if argv else "both"
    # extra args: mode:bucket:winners[:packed], e.g. fused:256:1:packed
    for spec in argv[1:]:
        parts = spec.split(":")
        CONFIGS.append((parts[0], int(parts[1]), int(parts[2]), *parts[3:]))
    main(which)
