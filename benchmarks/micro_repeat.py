"""Stage attribution for the repeat delta step: v1 vs v2 vs plain.

Times one compiled EM step (batched over neighbours) at the
bench_scale_repeats shape for: the plain scorer on the repeat-free base
problem, the v1 general scorer, and the v2 hybrid — plus v2 with the
correction terms ablated (part-1 only) to separate the plain-path core
from the repeat corrections.

Usage: python benchmarks/micro_repeat.py [n_bins] [f_max] [n_dups] [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_cycle(cycle, state, key, params, order, l_t, reps=2):
    import jax
    import jax.numpy as jnp

    out = cycle(state, key, params, order, l_t, jnp.float32(1.0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = cycle(state, key, params, order, l_t, jnp.float32(1.0))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(n=20000, f_max=1024, n_dups=200, steps=64):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import delta as dm
    from graal_tpu.core import delta_repeats as dr
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (add_scale_repeats,
                                                  make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    base, base_table = make_scale_genome(n, max(n // 5000, 4), seed=31)
    sobs = simulate_sparse_contacts(base, base_table, params, seed=31)
    dup_bins = tuple(int(b) for b in
                     np.linspace(11, n - 17, n_dups).astype(int))
    state, table, id_d = add_scale_repeats(base, base_table, dup_bins)
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    shuf = shuffle_genome(state, max(n // 250, 8), seed=32)
    l_t = runner.anchor_fn()(shuf, params)

    # plain reference: repeat-free base problem at the same f_max
    runner0 = ScaleRunner(base_table, sobs, params)
    shuf0 = shuffle_genome(base, max(n // 250, 8), seed=32)
    l_t0 = runner0.anchor_fn()(shuf0, params)

    key = jax.random.key(0)
    order = jnp.asarray(
        np.asarray(jax.random.permutation(key, n)[:steps]))
    out = {}

    cyc0 = runner0.cycle_for(f_max, 4)
    out["plain_ms"] = 1000 * time_cycle(
        cyc0, shuf0, key, params, order, l_t0) / steps

    import graal_tpu.core.delta as delta_mod

    variants = [
        ("v1", lambda: dr.make_repeat_delta_scorer(table, f_max, sobs)),
        ("v2", lambda: dr.make_repeat_delta_scorer_v2(table, f_max, sobs)),
        ("v2_nocorr", lambda: dr.make_repeat_delta_scorer_v2(
            table, f_max, sobs, _ablate="corr")),
        ("v2_nopart4", lambda: dr.make_repeat_delta_scorer_v2(
            table, f_max, sobs, _ablate="part4")),
        ("v2_nomixed", lambda: dr.make_repeat_delta_scorer_v2(
            table, f_max, sobs, _ablate="mixed")),
    ]
    if os.environ.get("MICRO_REPEAT_V2_ONLY"):
        variants = [v for v in variants if v[0] != "v1"]
    for name, make in variants:
        dscore = make()
        # time through the shipped cycle by routing the step factory to the
        # prebuilt scorer
        orig = dr.make_repeat_delta_scorer_v2
        try:
            dr.make_repeat_delta_scorer_v2 = lambda *a, **k: dscore
            cyc = delta_mod.make_delta_em_cycle(
                table, None, runner.nb, delta=4, f_max=f_max, sobs=sobs,
                anchor_fn=False)
        finally:
            dr.make_repeat_delta_scorer_v2 = orig
        out[f"{name}_ms"] = 1000 * time_cycle(
            cyc, shuf, key, params, order, l_t) / steps

    print(json.dumps({
        "metric": "repeat_step_attribution", "n_fragments": n,
        "f_max": f_max, "n_dups": n_dups, "steps": steps,
        **{k: round(v, 2) for k, v in out.items()},
        "platform": jax.default_backend()}))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a)) if a else main()
