"""Bisect the delta-step cost into its stages on the live device.

The measured per-step latency (~125-200 ms on a tunnelled v5e) is nearly
flat in both the capacity bucket f_max and the genome size K, so it is not
pair-grid arithmetic. This harness times the stages separately, each as a
jitted lax.scan over many iterations (so per-dispatch tunnel overhead
amortises out), to attribute the cost:

  A. extract_rows + gather_mini               (membership top_k + gathers)
  B. A + build_candidates                      (the 13 mutation op chains)
  C. full dscore                               (B + pair-grid scoring)
  D. full EM step                              (C + select + scatter_mini)

Run:  python benchmarks/bisect_delta.py [n_bins] [f_max] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, n_iter, *args):
    """Run fn as the body of a lax.scan n_iter times inside ONE jit; return
    seconds per iteration (compile excluded).

    Every call carries a fresh ``salt`` scalar folded into the carry so no
    two executions have identical inputs — the tunnelled device transport
    may serve repeated identical executions from a cache, which made
    earlier micro numbers absurdly fast (sub-dispatch "0.01 ms" grids)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(salt, args):
        def body(carry, i):
            out = fn(i, *args)
            return carry + out, None
        tot, _ = jax.lax.scan(body, salt,
                              jnp.arange(n_iter, dtype=jnp.int32))
        return tot

    out = jax.block_until_ready(run(jnp.float32(0.125), args))   # compile
    best = float("inf")
    for rep in range(3):   # min-of-3: tunnel dispatch latency varies 2-3x
        t0 = time.time()
        out = jax.block_until_ready(run(jnp.float32(0.25 + rep), args))
        best = min(best, (time.time() - t0) / n_iter)
    return best, float(out)


def main(n_bins=20_000, f_max=512, iters=64, coverage=None):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import delta as dm
    from graal_tpu.core import mcmc
    from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts,
                                                  thin_coverage)

    params = scale_params()
    if coverage is None:   # match bench_scale: thin above 200k bins
        coverage = 1.0 if n_bins <= 200_000 else 0.1
    if coverage != 1.0:
        params = thin_coverage(params, coverage)
    state, table = make_scale_genome(n_bins, max(n_bins // 5000, 4), seed=31)
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, max(n_bins // 250, 8), seed=32)
    nb = runner.nb

    band_w = runner.w
    # NOTE: band_w honoured literally here (no crossover clamp) — stage C
    # with a band wider than the grid is the *pessimised* path; stage D
    # (the real step) clamps. Ablated scorers isolate term costs.
    dscore = dm.make_delta_scorer(table, None, f_max, sobs=sobs,
                                  band_w=band_w)
    d_grid = dm.make_delta_scorer(table, None, f_max, sobs=sobs)
    d_grid_ein = dm.make_delta_scorer(table, None, f_max, sobs=sobs,
                                      obs_impl="einsum")
    d_no_obs = dm.make_delta_scorer(table, None, f_max, sobs=sobs,
                                    _ablate="obs")
    d_no_esum = dm.make_delta_scorer(table, None, f_max, sobs=sobs,
                                     _ablate="esum")
    d_no_win = dm.make_delta_scorer(table, None, f_max, sobs=sobs,
                                    _ablate="windows")
    step = dm.make_delta_em_step(table, None, nb, delta=4, f_max=f_max,
                                 sobs=sobs, band_w=band_w)
    print(f"band_w={band_w} row_cap={sobs.row_cap}", flush=True)
    mt = dm.build_mini_table(table)
    fmx = min(f_max, mt.n_frags)
    key = jax.random.key(7)
    frag_ids = jax.random.permutation(key, n_bins)[:iters].astype(jnp.int32)
    nb_ids = jax.random.permutation(jax.random.key(9), n_bins)[:5 * iters]
    nb_ids = nb_ids.reshape(iters, 5).astype(jnp.int32)

    # --- A: extract + gather, vmapped over the 5 neighbour slots ----------
    def stage_a(i, st):
        f_a = frag_ids[i]

        def one(fb):
            rows, valid, over = dm.extract_rows(st, f_a, fb, fmx)
            mini = dm.gather_mini(st, rows, valid)
            return jnp.sum(mini.pos) + jnp.sum(rows) + over

        return jnp.sum(jax.vmap(one)(nb_ids[i])).astype(jnp.float32)

    # --- B: A + build_candidates ------------------------------------------
    def stage_b(i, st):
        f_a = frag_ids[i]
        max_id = jnp.max(st.id_c)

        def one(fb):
            rows, valid, over = dm.extract_rows(st, f_a, fb, fmx)
            mini = dm.gather_mini(st, rows, valid)
            lf_a = jnp.argmax(rows == f_a).astype(jnp.int32)
            lf_b = jnp.argmax(rows == fb).astype(jnp.int32)
            cands = build_candidates(mini, lf_a, lf_b, max_id=max_id)
            return jnp.sum(cands.pos) + jnp.sum(cands.id_c)

        return jnp.sum(jax.vmap(one)(nb_ids[i])).astype(jnp.float32)

    # --- C: full dscore ----------------------------------------------------
    def stage_c(i, st):
        f_a = frag_ids[i]
        max_id = jnp.max(st.id_c)

        def one(fb):
            dll, cands, rows, valid, over = dscore.spec(
                st, f_a, fb, params, max_id, False)
            return jnp.sum(dll)

        return jnp.sum(jax.vmap(one)(nb_ids[i])).astype(jnp.float32)

    # --- D: full step ------------------------------------------------------
    def stage_d(i, st):
        k = jax.random.fold_in(jax.random.key(3), i)
        new_state, l_new, (op, fb, n_over) = step(
            st, k, params, jnp.float32(0.0), frag_ids[i], jnp.float32(1.0))
        return l_new + jnp.sum(new_state.pos).astype(jnp.float32)

    def make_score_stage(sc):
        def stage(i, st):
            f_a = frag_ids[i]
            max_id = jnp.max(st.id_c)

            def one(fb):
                dll, cands, rows, valid, over = sc.spec(
                    st, f_a, fb, params, max_id, False)
                return jnp.sum(dll)

            return jnp.sum(jax.vmap(one)(nb_ids[i])).astype(jnp.float32)
        return stage

    results = {}
    for name, fn in [("A_gather", stage_a), ("B_candidates", stage_b),
                     ("C_score", stage_c),
                     ("Cg_grid", make_score_stage(d_grid)),
                     ("Cge_grid_einsum", make_score_stage(d_grid_ein)),
                     ("Cn_no_obs", make_score_stage(d_no_obs)),
                     ("Cn_no_esum", make_score_stage(d_no_esum)),
                     ("Cn_no_windows", make_score_stage(d_no_win)),
                     ("D_step", stage_d)]:
        dt, chk = timed_scan(fn, iters, shuf)
        results[name + "_ms"] = round(dt * 1000, 2)
        print(f"{name}: {dt * 1000:.2f} ms/iter", flush=True)

    results.update({
        "metric": "delta_step_bisect",
        "n_fragments": n_bins,
        "coverage": coverage,
        "f_max": f_max,
        "iters": iters,
        "platform": jax.default_backend(),
        "candidates_only_ms": round(
            results["B_candidates_ms"] - results["A_gather_ms"], 2),
        "scoring_only_ms": round(
            results["C_score_ms"] - results["B_candidates_ms"], 2),
        "select_commit_ms": round(
            results["D_step_ms"] - results["C_score_ms"], 2),
    })
    print(json.dumps(results))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    it = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cov = float(sys.argv[4]) if len(sys.argv) > 4 else None
    main(n, f, it, cov)
