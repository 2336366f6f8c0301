"""On-device exactness of the REPEAT-aware delta engine at large r_max.

Round-2 open question (BASELINE.md): the repeat scorer's (R, cap, R)
t-membership one-hot is einsum-chunked over the window axis
(core/delta_repeats.py) but the memory bound had never been exercised on
a chip at r_max >= 2048. This harness builds a copy-expanded chr1-scale
genome, runs EM steps at the requested f_max on the default platform and
compares the carried incremental likelihood against the copy-summing
sparse re-anchor after every commit.

Usage: python benchmarks/check_exactness_repeats.py [n_bins] [f_max] [steps]
Prints one JSON line; exits non-zero when any step drifts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=20000, f_max=2048, steps=6):
    import jax
    import jax.numpy as jnp
    import numpy as np
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
                     np.linspace(11, n - 17, 12).astype(int))
    state, table, id_d = add_scale_repeats(base, base_table, dup_bins)
    assert table.has_repeats
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    shuf = shuffle_genome(state, max(n // 250, 8), seed=32)
    anchor = runner.anchor_fn()
    step = jax.jit(dm.make_delta_em_step(
        table, None, runner.nb, delta=4, f_max=f_max, sobs=sobs))

    key = jax.random.key(0)
    order = np.asarray(jax.random.permutation(key, state.n_frags)[:steps])
    cur = shuf
    l_t = anchor(cur, params)
    worst, bad = 0.0, 0
    for f_a in order:
        key, sub = jax.random.split(key)
        cur, l_t, (op, fb, nov) = step(cur, sub, params, l_t,
                                       jnp.int32(f_a), jnp.float32(1.0))
        l_re = anchor(cur, params)
        err = abs(float(l_t) - float(l_re))
        tol = max(0.5, 1e-6 * abs(float(l_re)))
        flag = err > tol
        bad += flag
        worst = max(worst, err)
        if flag:
            print(f"step f_a={int(f_a)}: carried {float(l_t):.3f} "
                  f"re-anchor {float(l_re):.3f} err {err:.3f}",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "repeat_delta_step_exactness",
        "n_fragments": n, "f_max": f_max, "steps": steps,
        "n_repeat_copies": int(state.n_frags) - n,
        "bad_steps": int(bad), "worst_err": round(worst, 4),
        "platform": jax.default_backend()}))
    return 1 if bad else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    sys.exit(main(n, f, s))
