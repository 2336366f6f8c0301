"""On-device per-step exactness check of the delta EM step.

CPU tests cannot catch TPU-only miscompiles (XLA fuses differently per
backend; returning an intermediate can make a wrong value turn correct).
This harness runs N single EM steps ON THE DEFAULT PLATFORM, committing
each winning mutation, and after every step compares the carried
incremental likelihood against a full sparse re-anchor. It is how the
round-2 bitcast-canonicalisation bug (core/delta.py packed-gather
comment) was isolated.

Usage: python benchmarks/check_exactness.py [n_bins] [f_max] [steps]
Prints one JSON line; exits non-zero when any step drifts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=20000, f_max=1024, steps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graal_tpu.core import delta as dm
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    state, table = make_scale_genome(n, max(n // 5000, 4), seed=31)
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, max(n // 250, 8), seed=32)
    anchor = runner.anchor_fn()
    step = jax.jit(dm.make_delta_em_step(
        table, None, runner.nb, delta=4, f_max=f_max, sobs=sobs,
        band_w=runner.w))

    key = jax.random.key(0)
    order = np.asarray(jax.random.permutation(key, n)[:steps])
    cur = shuf
    l_t = anchor(cur, params)
    worst, bad = 0.0, 0
    for i, f_a in enumerate(order):
        key, sub = jax.random.split(key)
        new, l_new, (op, fb, nov) = step(cur, sub, params, l_t,
                                         jnp.int32(f_a), jnp.float32(1.0))
        l_re = anchor(new, params)
        err = abs(float(l_new) - float(l_re))
        tol = max(0.5, 1e-6 * abs(float(l_re)))
        flag = err > tol
        bad += flag
        worst = max(worst, err)
        if flag:
            print(f"step {i}: f_a={int(f_a)} op={int(op)} fb={int(fb)} "
                  f"err={err:.3f} BAD", flush=True)
        cur, l_t = new, l_re   # re-anchor: isolate per-step error
    print(json.dumps({
        "metric": "delta_step_exactness",
        "n_fragments": n, "f_max": f_max, "steps": steps,
        "bad_steps": int(bad), "worst_err": round(worst, 4),
        "platform": jax.default_backend(),
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    raise SystemExit(main(n, f, s))
