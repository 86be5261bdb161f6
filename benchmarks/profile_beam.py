"""Decompose graph-beam-search cost on the real chip.

Times the full PQ beam loop vs variants with individual stages replaced by
cheap stand-ins, isolating: adjacency gather, codes gather, LUT scoring,
and the sort/merge machinery.  Uses the chain-carry slope method (see
bench.py docstring) because naive timing lies under the axon tunnel.

Usage: timeout 1200 python benchmarks/profile_beam.py
"""
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[pbeam] {msg}', file=sys.stderr, flush=True)


def chain_time(fn, make_args, carry0, reps=(2, 10), trials=3):
    args = make_args(0)
    _ = np.asarray(fn(*args, carry0)[-1])
    tmin = {}
    for K in reps:
        best = float('inf')
        for _t in range(trials):
            carry = carry0
            t0 = time.perf_counter()
            for i in range(K):
                out = fn(*make_args(i), carry)
                carry = out[-1]
            _ = np.asarray(carry)
            best = min(best, time.perf_counter() - t0)
        tmin[K] = best
    return (tmin[reps[1]] - tmin[reps[0]]) / (reps[1] - reps[0])


def main():
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_annlite_bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp

    from annlite_tpu.ops import beam as bm

    N, R, M, K, Q, L, B = 262_144, 32, 64, 256, 64, 128, 16
    ITERS = 16
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    adj = jax.random.randint(k1, (N, R), 0, N, dtype=jnp.int32)
    codes = jax.random.randint(k2, (N, M), 0, K, dtype=jnp.uint8)
    dtables = jax.random.uniform(k3, (8, Q, M, K), dtype=jnp.float32)
    entry = jnp.zeros((Q, 1), dtype=jnp.int32)
    carry0 = jnp.float32(0.0)

    def run_beam(score_mode, gather_mode):
        """Build a jitted beam variant; returns fn(dtable, carry)->(carry,)."""

        def make_score(dtable):
            if score_mode == 'full':
                return bm.make_pq_scorer(codes, dtable)
            if score_mode == 'nogather':
                # LUT lookup on fake codes derived from ids (no HBM gather)
                def score(ids):
                    valid = (ids >= 0) & (ids < N)
                    c = (ids[:, :, None] + jnp.arange(M)[None, None, :]) % K

                    def per_query(dt, cq):
                        return jnp.sum(jnp.take_along_axis(dt, cq.T, axis=1), axis=0)

                    d = jax.vmap(per_query)(dtable, c)
                    return jnp.where(valid, d, bm.BIG)

                return score
            if score_mode == 'fake':
                def score(ids):
                    valid = (ids >= 0) & (ids < N)
                    d = (ids * 2654435 % 997).astype(jnp.float32)
                    return jnp.where(valid, d, bm.BIG)

                return score
            raise ValueError(score_mode)

        def beam(dtable, carry):
            score_fn = make_score(dtable)
            q = Q

            ids0 = jnp.full((q, L), bm.NO_ID, jnp.int32).at[:, :1].set(entry)
            d0 = jnp.full((q, L), bm.BIG, jnp.float32).at[:, :1].set(
                score_fn(entry) + carry * 0
            )
            exp0 = jnp.zeros((q, L), dtype=bool)

            def body(i, state):
                ids, d, exp = state
                d_frontier = jnp.where(exp, bm.BIG, d)
                neg, pos = jax.lax.top_k(-d_frontier, B)
                sel_ids = jnp.take_along_axis(ids, pos, axis=1)
                sel_valid = (-neg) < bm.BIG
                exp = exp.at[jnp.arange(q)[:, None], pos].set(
                    exp[jnp.arange(q)[:, None], pos] | sel_valid
                )
                safe_sel = jnp.where(sel_valid, sel_ids, 0)
                if gather_mode == 'full':
                    nbrs = adj[safe_sel].reshape(q, B * R)
                else:
                    nbrs = (safe_sel[:, :, None] * 7 + jnp.arange(R)) % N
                    nbrs = nbrs.reshape(q, B * R)
                nbrs = jnp.where(
                    sel_valid[:, :, None].repeat(R, 2).reshape(q, B * R), nbrs, -1
                )
                nd = score_fn(nbrs)
                nbrs = jnp.where(nd < bm.BIG, nbrs, bm.NO_ID)
                ids, d, exp = _merge_topl_legacy(jnp, jax, bm.NO_ID, bm.BIG, ids, d, exp, nbrs, nd, L)
                return ids, d, exp

            ids, d, exp = jax.lax.fori_loop(0, ITERS, body, (ids0, d0, exp0))
            return (jnp.sum(jnp.where(d < bm.BIG, d, 0.0)) * 1e-6 + carry,)

        return jax.jit(beam)

    variants = [
        ('full loop (gather adj + gather codes + LUT + merge)', 'full', 'full'),
        ('no codes-gather (fake codes, real LUT + adj gather)', 'nogather', 'full'),
        ('no gathers (fake codes + fake adj, real LUT + merge)', 'nogather', 'fake'),
        ('fake score (real adj gather + merge only)', 'fake', 'full'),
        ('merge only (fake everything)', 'fake', 'fake'),
    ]
    for name, sm, gm in variants:
        fn = run_beam(sm, gm)
        t = chain_time(fn, lambda i: (dtables[i % 8],), carry0)
        log(f'{name}: {t*1e3:.3f} ms/batch  ({Q/t:.0f} QPS)')




def _merge_topl_legacy(jnp, jax, NO_ID, BIG, ids_a, d_a, exp_a, ids_b, d_b, L):
    """The pre-rewrite gather-based merge (kept here for A/B comparison
    after ops/beam.py moved to multi-operand lax.sort merges)."""
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    d = jnp.concatenate([d_a, d_b], axis=1)
    exp = jnp.concatenate([exp_a, jnp.zeros_like(ids_b, dtype=bool)], axis=1)
    order = jnp.argsort(ids * 2 + (~exp).astype(ids.dtype), axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    d_s = jnp.take_along_axis(d, order, axis=1)
    exp_s = jnp.take_along_axis(exp, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[:, :1], dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]],
        axis=1,
    )
    d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
    neg, pos = jax.lax.top_k(-d_s, L)
    return (
        jnp.take_along_axis(ids_s, pos, axis=1),
        -neg,
        jnp.take_along_axis(exp_s, pos, axis=1),
    )


if __name__ == '__main__':
    main()
