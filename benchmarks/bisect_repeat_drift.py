"""Per-step drift attribution for the repeat delta engine.

bench_scale_repeats tripped its carried-vs-re-anchor guard at 256 steps
(drift 33 at 20k bins / 200 dup copies / f_max 1024). This harness runs
the same walk but re-anchors after EVERY committed step, logging per-step
error, the committed (op, fb), and whether fA/fB are repeat-involved —
separating a diffuse f32 accumulation floor from a localised scoring bug.

Usage: python benchmarks/bisect_repeat_drift.py [n_bins] [f_max] [steps] [n_dups]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=20000, f_max=1024, steps=64, n_dups=200):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import delta as dm
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
    anchor = runner.anchor_fn()
    step = jax.jit(dm.make_delta_em_step(
        table, None, runner.nb, delta=4, f_max=f_max, sobs=sobs))

    rep_set = set(int(x) for x in np.nonzero(np.asarray(state.rep))[0])
    key = jax.random.key(0)
    nf = state.n_frags
    order = np.asarray(jax.random.permutation(jax.random.key(7), nf)[:steps])
    cur = shuf
    l_prev = float(anchor(cur, params))
    l_t = jnp.float32(l_prev)
    errs = []
    for i, f_a in enumerate(order):
        key, sub = jax.random.split(key)
        cur, l_t, (op, fb, nov) = step(cur, sub, params, l_t,
                                       jnp.int32(f_a), jnp.float32(1.0))
        l_re = float(anchor(cur, params))
        # per-step error: carried increment vs true increment
        err = (float(l_t) - l_prev) - (l_re - l_prev)
        errs.append(err)
        if abs(err) > 0.5:
            print(f"step {i}: f_a={int(f_a)} (rep={int(f_a) in rep_set}) "
                  f"op={int(op)} fb={int(fb)} (rep={int(fb) in rep_set}) "
                  f"over={int(nov)} err={err:.4f}", flush=True)
        l_prev = l_re
        l_t = jnp.float32(l_re)    # re-anchor the carry: isolate per-step err
    errs = np.asarray(errs)
    print(json.dumps({
        "metric": "repeat_drift_bisect", "n_fragments": n, "f_max": f_max,
        "steps": steps, "n_dups": n_dups,
        "sum_err": round(float(errs.sum()), 4),
        "sum_abs_err": round(float(np.abs(errs).sum()), 4),
        "max_abs_err": round(float(np.abs(errs).max()), 4),
        "n_bad": int(np.sum(np.abs(errs) > 0.5)),
        "platform": jax.default_backend()}))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a)) if a else main()
