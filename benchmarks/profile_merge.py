"""Merge-machinery variants for the beam loop (run on the real chip).

The beam profile (profile_beam.py) showed the per-iteration list merge
(argsort + take_along_axis x5 + top_k + scatter) costs ~1.5 ms -> a 2.6k QPS
ceiling regardless of scoring.  Hypothesis: XLA take_along_axis/scatter on
[Q, 640] dominate; multi-operand lax.sort carries the values through the
sort network with no gathers at all.

Usage: timeout 1800 python benchmarks/profile_merge.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg):
    print(f'[pmerge] {msg}', file=sys.stderr, flush=True)


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

    N, R, Q, L, B = 262_144, 32, 64, 128, 16
    ITERS = 16
    NO_ID = 2**29
    BIG = bm.BIG
    key = jax.random.PRNGKey(0)
    adj = jax.random.randint(key, (N, R), 0, N, dtype=jnp.int32)
    entry = jnp.zeros((Q, 1), dtype=jnp.int32)
    carry0 = jnp.float32(0.0)

    def fake_score(ids):
        valid = (ids >= 0) & (ids < N)
        d = (ids * 2654435 % 997).astype(jnp.float32)
        return jnp.where(valid, d, BIG)

    # ---- variant A: current implementation (top_k + take_along + scatter) --
    def beam_current(carry):
        ids0 = jnp.full((Q, L), bm.NO_ID, jnp.int32).at[:, :1].set(entry)
        d0 = jnp.full((Q, L), BIG, jnp.float32).at[:, :1].set(
            fake_score(entry) + carry * 0
        )
        exp0 = jnp.zeros((Q, L), dtype=bool)

        def body(i, state):
            ids, d, exp = state
            d_frontier = jnp.where(exp, BIG, d)
            neg, pos = jax.lax.top_k(-d_frontier, B)
            sel_ids = jnp.take_along_axis(ids, pos, axis=1)
            sel_valid = (-neg) < BIG
            exp = exp.at[jnp.arange(Q)[:, None], pos].set(
                exp[jnp.arange(Q)[:, None], pos] | sel_valid
            )
            safe_sel = jnp.where(sel_valid, sel_ids, 0)
            nbrs = adj[safe_sel].reshape(Q, B * R)
            nbrs = jnp.where(
                sel_valid[:, :, None].repeat(R, 2).reshape(Q, B * R), nbrs, -1
            )
            nd = fake_score(nbrs)
            nbrs = jnp.where(nd < BIG, nbrs, bm.NO_ID)
            ids, d, exp = _merge_topl_legacy(jnp, jax, bm.NO_ID, bm.BIG, ids, d, exp, nbrs, nd, L)
            return ids, d, exp

        ids, d, exp = jax.lax.fori_loop(0, ITERS, body, (ids0, d0, exp0))
        return (jnp.sum(jnp.where(d < BIG, d, 0.0)) * 1e-6 + carry,)

    # ---- variant B: multi-operand lax.sort everywhere, d-sorted invariant --
    def beam_sort(carry):
        ids0 = jnp.full((Q, L), NO_ID, jnp.int32).at[:, :1].set(entry)
        d0 = jnp.full((Q, L), BIG, jnp.float32).at[:, :1].set(
            fake_score(entry) + carry * 0
        )
        exp0 = jnp.zeros((Q, L), dtype=jnp.int32)

        def body(i, state):
            ids, d, exp = state  # invariant: sorted by d ascending
            # frontier = first B unexpanded alive entries (list is d-sorted)
            cand = (exp == 0) & (d < BIG)
            rank = jnp.cumsum(cand.astype(jnp.int32), axis=1)
            sel = cand & (rank <= B)
            exp = exp | sel.astype(jnp.int32)
            # compact selected ids to the front (1 sort, no gather)
            skey = jnp.where(sel, rank, B + 1 + jnp.arange(L)[None, :])
            _, sel_ids = jax.lax.sort((skey, ids), num_keys=1)
            sel_ids = sel_ids[:, :B]
            sel_valid = jnp.arange(B)[None, :] < rank[:, -1:]
            safe_sel = jnp.where(sel_valid, sel_ids, 0)
            nbrs = adj[safe_sel].reshape(Q, B * R)
            nbrs = jnp.where(
                sel_valid[:, :, None].repeat(R, 2).reshape(Q, B * R), nbrs, -1
            )
            nd = fake_score(nbrs)
            nbrs = jnp.where(nd < BIG, nbrs, NO_ID)
            # merge: dedup by id (expanded copy wins), then re-sort by d
            all_ids = jnp.concatenate([ids, nbrs], axis=1)
            all_d = jnp.concatenate([d, nd], axis=1)
            all_exp = jnp.concatenate([exp, jnp.zeros_like(nbrs)], axis=1)
            dkey = all_ids * 2 + (1 - all_exp)
            _, ids_s, d_s, exp_s = jax.lax.sort(
                (dkey, all_ids, all_d, all_exp), num_keys=1
            )
            dup = jnp.concatenate(
                [jnp.zeros_like(ids_s[:, :1], dtype=bool),
                 ids_s[:, 1:] == ids_s[:, :-1]], axis=1,
            )
            d_s = jnp.where(dup | (ids_s >= NO_ID), BIG, d_s)
            d2, ids2, exp2 = jax.lax.sort((d_s, ids_s, exp_s), num_keys=1)
            return ids2[:, :L], d2[:, :L], exp2[:, :L]

        ids, d, exp = jax.lax.fori_loop(0, ITERS, body, (ids0, d0, exp0))
        return (jnp.sum(jnp.where(d < BIG, d, 0.0)) * 1e-6 + carry,)

    # ---- variant C: B but with approx dedup dropped (dup ids tolerated in
    # the list; the expanded flag still prevents re-expansion of the FIRST
    # copy only).  Measures what dedup costs.
    def beam_sort_nodedup(carry):
        ids0 = jnp.full((Q, L), NO_ID, jnp.int32).at[:, :1].set(entry)
        d0 = jnp.full((Q, L), BIG, jnp.float32).at[:, :1].set(
            fake_score(entry) + carry * 0
        )
        exp0 = jnp.zeros((Q, L), dtype=jnp.int32)

        def body(i, state):
            ids, d, exp = state
            cand = (exp == 0) & (d < BIG)
            rank = jnp.cumsum(cand.astype(jnp.int32), axis=1)
            sel = cand & (rank <= B)
            exp = exp | sel.astype(jnp.int32)
            skey = jnp.where(sel, rank, B + 1 + jnp.arange(L)[None, :])
            _, sel_ids = jax.lax.sort((skey, ids), num_keys=1)
            sel_ids = sel_ids[:, :B]
            sel_valid = jnp.arange(B)[None, :] < rank[:, -1:]
            safe_sel = jnp.where(sel_valid, sel_ids, 0)
            nbrs = adj[safe_sel].reshape(Q, B * R)
            nbrs = jnp.where(
                sel_valid[:, :, None].repeat(R, 2).reshape(Q, B * R), nbrs, -1
            )
            nd = fake_score(nbrs)
            nbrs = jnp.where(nd < BIG, nbrs, NO_ID)
            all_ids = jnp.concatenate([ids, nbrs], axis=1)
            all_d = jnp.concatenate([d, nd], axis=1)
            all_exp = jnp.concatenate([exp, jnp.zeros_like(nbrs)], axis=1)
            all_d = jnp.where(all_ids >= NO_ID, BIG, all_d)
            d2, ids2, exp2 = jax.lax.sort((all_d, all_ids, all_exp), num_keys=1)
            return ids2[:, :L], d2[:, :L], exp2[:, :L]

        ids, d, exp = jax.lax.fori_loop(0, ITERS, body, (ids0, d0, exp0))
        return (jnp.sum(jnp.where(d < BIG, d, 0.0)) * 1e-6 + carry,)

    for name, fn in [
        ('A current (top_k + gathers + scatter)', beam_current),
        ('B sort-merge (3 multi-operand sorts)', beam_sort),
        ('C sort-merge, no dedup sort (2 sorts)', beam_sort_nodedup),
    ]:
        f = jax.jit(fn)
        t = chain_time(f, lambda i: (), carry0)
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
