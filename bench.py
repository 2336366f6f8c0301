"""Benchmark: MCMC mutation-evals/sec/chip on an S1-pyramid-4-scale problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition: candidate genomes scored per second — each EM step builds
and scores 13 candidates x padded-neighbour slots (the reference scores 13
structures per (fragment, neighbour) on 13 CUDA streams,
cuda_lib_gl.py:111-112, 2398-2400).

Baseline: the reference publishes no numbers (BASELINE.md). vs_baseline is
computed against a launch-overhead model of the reference pipeline: per
neighbour it performs 13 mutation-kernel sequences + 13 stream launches +
host synchronisation (~1.3 ms/candidate measured-class overhead on
2014-era hardware), i.e. ~770 candidate-evals/s/GPU sustained. See
BASELINE.md for the derivation; this anchor is replaced by a measured
replay when reference hardware timing becomes available.
"""

import json
import time

import numpy as np

REF_EVALS_PER_S = 770.0  # launch-overhead model of the CUDA reference


def main():
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import mcmc
    from __graft_entry__ import _problem

    n_bins = 384
    delta = 4
    state, table, params, obs, nb = _problem(n_bins=n_bins)
    from graal_tpu.ops.likelihood_pallas import make_pallas_scorer
    scorer = make_pallas_scorer(table, obs)
    cycle = mcmc.make_em_cycle(table, obs, nb, delta=delta, sample_param=False,
                               scorer=scorer)

    from graal_tpu.core.likelihood import log_likelihood
    scrambled = jax.jit(mcmc.explode_genome)(state)
    l0 = jax.jit(lambda s, p: log_likelihood(s, table, obs, p))(scrambled, params)

    key = jax.random.key(0)
    order = jax.random.permutation(key, n_bins)
    f_t = jnp.float32(1.0)

    # warm-up / compile
    out = cycle(scrambled, key, params, order, l0, f_t)
    jax.block_until_ready(out)

    # timed: 3 cycles
    n_cycles = 3
    cur, l_t = scrambled, l0
    t0 = time.perf_counter()
    for i in range(n_cycles):
        key, sub = jax.random.split(key)
        order = jax.random.permutation(sub, n_bins)
        cur, _, l_t, _ = cycle(cur, key, params, order, l_t, f_t)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0

    n_steps = n_cycles * n_bins
    # candidates scored per step: 13 ops x (delta + 1) padded neighbour slots
    evals_per_step = 13 * (delta * nb.max_copies + nb.max_copies)
    evals_per_s = n_steps * evals_per_step / dt
    print(json.dumps({
        "metric": "mcmc_mutation_evals_per_sec_per_chip",
        "value": round(evals_per_s, 1),
        "unit": "candidate-genomes/s",
        "vs_baseline": round(evals_per_s / REF_EVALS_PER_S, 2),
    }))


if __name__ == "__main__":
    # The TPU tunnel occasionally drops a run with a transient device error;
    # retry twice before giving up so the driver records a number.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            import sys
            import time as _t
            print(f"bench attempt {attempt} failed ({type(e).__name__}); "
                  "retrying in 20s", file=sys.stderr)
            _t.sleep(20)
