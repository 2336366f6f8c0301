"""Repeat-path chr1-scale benchmark: copy-expanded delta EM on one chip.

The reference scores repeat copies through the SAME hot kernel as
everything else (dispatcher loop, kernels3.cu:2895-2929); this harness
puts a chip number on our repeat-aware delta engine
(core/delta_repeats.py) at chr1 scale so the repeat path has a measured
throughput story, not just exactness (BASELINE.md round-3 table).

Builds the bench_scale.py problem, copy-expands ``n_dups`` coverage-outlier
bins (modify_vect_frags semantics), and times a 256-step compiled cycle.

Usage: python benchmarks/bench_scale_repeats.py [n_bins] [f_max] [n_dups]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_bins=20_000, f_max=1024, n_dups=200):
    import jax
    import jax.numpy as jnp
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (add_scale_repeats,
                                                  make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    base, base_table = make_scale_genome(n_bins, max(n_bins // 5000, 4),
                                         seed=31)
    t0 = time.time()
    sobs = simulate_sparse_contacts(base, base_table, params, seed=31)
    t_gen = time.time() - t0
    dup_bins = tuple(int(b) for b in
                     np.linspace(11, n_bins - 17, n_dups).astype(int))
    state, table, id_d = add_scale_repeats(base, base_table, dup_bins)
    assert table.has_repeats
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    shuf = shuffle_genome(state, max(n_bins // 250, 8), seed=32)
    n = state.n_frags

    cycle = runner.cycle_for(f_max, 4)
    anchor = runner.anchor_fn()
    t0 = time.time()
    l_t = jax.block_until_ready(anchor(shuf, params))
    t_anchor_compile = time.time() - t0
    t0 = time.time()
    l_t = jax.block_until_ready(anchor(shuf, params))
    t_anchor = time.time() - t0

    key = jax.random.key(0)
    n_steps = 256
    order = jax.random.permutation(key, n)[:n_steps]
    t0 = time.time()
    out = cycle(shuf, key, params, order, l_t, jnp.float32(1.0))
    jax.block_until_ready(out)
    t_compile = time.time() - t0

    key, sub = jax.random.split(key)
    order = jax.random.permutation(sub, n)[:n_steps]
    t0 = time.time()
    cur, l_new, _ = cycle(shuf, sub, params, order, l_t, jnp.float32(1.0))
    jax.block_until_ready(cur)
    dt = time.time() - t0

    # exactness guard: carried likelihood vs copy-summing sparse re-anchor
    l_re = float(anchor(cur, params))
    drift = abs(float(l_new) - l_re)
    tol = max(2.0, 1e-5 * abs(l_re))
    assert drift < tol, (
        f"repeat incremental likelihood drifted {drift} from the re-anchor "
        f"{l_re} (tol {tol})")

    evals_per_step = 13 * 5
    print(json.dumps({
        "metric": "chr1_scale_repeat_delta_evals_per_sec_per_chip",
        "n_fragments": n_bins,
        "n_repeat_copies": int(n - n_bins),
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    main(n, f, d)
