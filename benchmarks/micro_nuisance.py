"""Where does the nuisance step's ~1.1 ms/step go?

bench.py measures the shipped default (nuisance sampling on) at ~2.6 ms
per EM step vs ~1.46 ms with it off — yet the nuisance step's only heavy
op is a batch-1 scorer call worth ~37 us of pair grid (mfu_report: a
65-candidate batch is 2.41 ms). This microbench times, each as a
256-step lax.scan (min of 3):

  a) the full nuisance step,
  b) solve_d_max alone (80-iteration sequential bisection fori_loop),
  c) the batch-1 Pallas scorer call alone,
  d) a solve-free nuisance step variant (bisection iterations = 8).

Usage: python benchmarks/micro_nuisance.py [n_bins]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, carry0, n_steps=256, reps=3):
    import jax

    @jax.jit
    def run(carry):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c

    out = jax.block_until_ready(run(carry0))   # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(carry0))
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best * 1e3   # ms/step


def main(n_bins=384):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import mcmc
    from graal_tpu.ops.likelihood_pallas import make_pallas_scorer
    from __graft_entry__ import _problem

    state, table, params, obs, nb = _problem(n_bins=n_bins)
    scorer = make_pallas_scorer(table, obs)
    l0 = scorer(jax.tree.map(lambda x: x[None], state), params)[0]

    nuis = mcmc.make_nuisance_step(table, obs, scorer=scorer)

    def step_nuis(carry):
        key, p, l_t = carry
        key, k = jax.random.split(key)
        p, l_t, _ = nuis(state, k, p, l_t, jnp.float32(1.0))
        return key, p, l_t

    def step_solve(carry):
        key, p, l_t = carry
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, ())
        d_max = mcmc.solve_d_max(p._replace(fact=p.fact + 1e-6 * eps),
                                 p.v_inter)
        return key, p._replace(d_max=d_max), l_t

    def step_score(carry):
        key, p, l_t = carry
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, ())
        l = scorer(jax.tree.map(lambda x: x[None], state),
                   p._replace(fact=p.fact + 1e-6 * eps))[0]
        return key, p, l.astype(jnp.float32)

    carry0 = (jax.random.key(0), params, l0.astype(jnp.float32))
    out = {
        "metric": "nuisance_step_cost_split",
        "platform": jax.default_backend(),
        "n_bins": n_bins,
        "full_nuisance_ms": round(timed_scan(step_nuis, carry0), 4),
        "solve_d_max_ms": round(timed_scan(step_solve, carry0), 4),
        "batch1_scorer_ms": round(timed_scan(step_score, carry0), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 384)
