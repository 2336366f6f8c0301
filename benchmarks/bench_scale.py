"""Chr1-scale benchmark: delta-scored EM at 100k+ fragments on one chip.

The BASELINE config class the dense path cannot touch. Prints one JSON
line with steps/s, candidate-evals/s and the sparse full-likelihood
evaluation time. Run on the TPU (default platform) or CPU.

Usage: python benchmarks/bench_scale.py [n_bins] [f_max]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_bins=100_000, f_max=1024, coverage=None):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import sparse
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts,
                                                  thin_coverage)

    params = scale_params()
    if coverage is None:
        # full model coverage above ~200k bins is ~GBs of triplets; thin
        # to a realistic sequencing depth (see thin_coverage)
        coverage = 1.0 if n_bins <= 200_000 else 0.1
    if coverage != 1.0:
        params = thin_coverage(params, coverage)
    state, table = make_scale_genome(n_bins, max(n_bins // 5000, 4), seed=31)
    t0 = time.time()
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    t_gen = time.time() - t0
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, max(n_bins // 250, 8), seed=32)

    cycle = runner.cycle_for(f_max, 4)

    anchor = runner.anchor_fn()
    t0 = time.time()
    l_t = jax.block_until_ready(anchor(shuf, params))
    t_anchor_compile = time.time() - t0
    t0 = time.time()
    l_t = jax.block_until_ready(anchor(shuf, params))
    t_anchor = time.time() - t0

    key = jax.random.key(0)
    # warm with the SAME scan length as the timed run: a different order
    # length is a different program (the 256-step recompile used to land
    # inside the timed region and inflate ms_per_step ~60x)
    n_steps = 256
    order = jax.random.permutation(key, n_bins)[:n_steps]
    t0 = time.time()
    out = cycle(shuf, key, params, order, l_t, jnp.float32(1.0))
    jax.block_until_ready(out)
    t_compile = time.time() - t0

    key, sub = jax.random.split(key)
    order = jax.random.permutation(sub, n_bins)[:n_steps]
    t0 = time.time()
    cur, l_new, _ = cycle(shuf, sub, params, order, l_t, jnp.float32(1.0))
    jax.block_until_ready(cur)
    dt = time.time() - t0

    # on-device exactness guard: the incrementally carried likelihood must
    # match a full sparse re-anchor (catches TPU-only numeric divergence —
    # e.g. an MXU path silently rounding f32 operands to bf16 — that the
    # CPU-forced test suite cannot see)
    l_re = float(anchor(cur, params))
    drift = abs(float(l_new) - l_re)
    tol = max(2.0, 1e-5 * abs(l_re))
    assert drift < tol, (
        f"incremental likelihood drifted {drift} from the re-anchor {l_re} "
        f"(tol {tol}) — on-device delta scoring is numerically wrong")

    # candidate-evals per step: 13 ops x (delta+1 neighbour slots)
    evals_per_step = 13 * 5
    print(json.dumps({
        "metric": "chr1_scale_delta_evals_per_sec_per_chip",
        "n_fragments": n_bins,
        "coverage": coverage,
        "nnz_sym": int(sobs.rows.shape[0]),
        "f_max": f_max,
        "steps_per_s": round(n_steps / dt, 2),
        "value": round(n_steps * evals_per_step / dt, 1),
        "unit": "candidate-genomes/s",
        "ms_per_step": round(dt / n_steps * 1000, 2),
        "incr_vs_anchor_drift": round(drift, 3),
        "full_eval_s": round(t_anchor, 3),
        "compile_s": round(t_compile, 1),
        "anchor_compile_s": round(t_anchor_compile, 1),
        "gen_s": round(t_gen, 1),
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cov = float(sys.argv[3]) if len(sys.argv) > 3 else None
    main(n, f, cov)
