"""Single-chip multi-chain throughput scaling: vmapped tempered chains.

scale.py's module docstring claims the chr1-scale multi-chip axis worth
spending devices on is chains ("the delta pair grids are tiny") — this
harness substantiates the claim with data on the ONE measurable scaling
curve in this environment: vmapped-chain throughput vs chain count on a
single real chip, at S1 scale (384-bin dense EM cycle) and chr1 scale
(20k-bin sparse delta cycle).

Perfect scaling here means aggregate evals/s grows ~linearly with chains
(the per-chain work is too small to fill the chip alone); saturation
marks the point where one chip is full and extra chains need devices.

Usage: python benchmarks/bench_chains.py [n_bins_scale] [f_max] [steps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_COUNTS = (1, 2, 4, 8)


def s1_curve(steps):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import likelihood, mcmc
    from graal_tpu.utils.synthetic import (bin_level_matrix, default_params,
                                           make_genome, simulate_contacts)

    n_bins = 384
    state, table = make_genome(n_bins, 16, subs_per_bin=3, seed=0)
    params = default_params()
    obs = simulate_contacts(state, table, params, seed=0)
    bins = bin_level_matrix(obs, table)
    nb = mcmc.build_neighbour_table(bins, np.arange(n_bins), n_bins)
    delta = 4
    cycle = mcmc.make_em_cycle(table, obs, nb, delta, sample_param=False)
    vcycle = jax.jit(jax.vmap(cycle, in_axes=(0, 0, None, 0, 0, None)))

    scrambled = jax.jit(mcmc.explode_genome)(state)
    l0 = likelihood.log_likelihood(scrambled, table, obs, params)
    out = {}
    for c in CHAIN_COUNTS:
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (c,) + x.shape), scrambled)
        keys = jax.random.split(jax.random.key(1), c)
        orders = jax.vmap(
            lambda k: jax.random.permutation(k, n_bins)[:steps])(keys)
        l_ts = jnp.broadcast_to(jnp.float32(l0), (c,))
        args = (states, keys, params, orders, l_ts, jnp.float32(1.0))
        r = vcycle(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        r = vcycle(*args)
        jax.block_until_ready(r)
        dt = time.time() - t0
        out[c] = round(c * steps * 13 * (delta + 1) / dt, 1)
    return out


def scale_curve(n_bins, f_max, steps):
    import jax
    import jax.numpy as jnp
    from graal_tpu.parallel.sharding import make_mesh, make_sharded_delta_cycle
    from graal_tpu.parallel.tempering import temperature_ladder
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    state, table = make_scale_genome(n_bins, max(n_bins // 5000, 4), seed=31)
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, max(n_bins // 250, 8), seed=32)
    l0 = runner.anchor_fn()(shuf, params)
    mesh = make_mesh(n_chains=1, n_rows=1)   # one chip: chains vmap on-device
    n = state.n_frags
    out = {}
    for c in CHAIN_COUNTS:
        cycle = make_sharded_delta_cycle(mesh, table, runner.nb, delta=4,
                                         f_max=f_max, sobs=sobs,
                                         band_w=runner.w)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (c,) + x.shape), shuf)
        keys = jax.random.split(jax.random.key(1), c)
        orders = jax.vmap(
            lambda k: jax.random.permutation(k, n)[:steps])(keys)
        l_ts = jnp.broadcast_to(l0, (c,))
        f_ts = jnp.asarray(temperature_ladder(c), jnp.float32)
        args = (states, keys, params, orders, l_ts, f_ts)
        r = cycle(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        r = cycle(*args)
        jax.block_until_ready(r)
        dt = time.time() - t0
        out[c] = round(c * steps * 13 * 5 / dt, 1)
    return out


def main(n_bins=20_000, f_max=512, steps=256):
    import jax

    s1 = s1_curve(steps)
    sc = scale_curve(n_bins, f_max, steps)
    print(json.dumps({
        "metric": "single_chip_multichain_scaling",
        "platform": jax.default_backend(),
        "steps_per_chain": steps,
        "s1_evals_per_s": {str(k): v for k, v in s1.items()},
        "s1_speedup_8x": round(s1[8] / s1[1], 2),
        "scale_n_fragments": n_bins,
        "scale_f_max": f_max,
        "scale_evals_per_s": {str(k): v for k, v in sc.items()},
        "scale_speedup_8x": round(sc[8] / sc[1], 2),
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a)) if a else main()
