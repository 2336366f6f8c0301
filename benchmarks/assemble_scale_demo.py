"""Chr1-scale assembly demo: a large shuffled genome reassembling on one
chip, with wall-clock, likelihood and ground-truth distance per cycle.

Unlike bench_scale.py (steady-state step latency), this runs REAL
assembly cycles and reports convergence. Defaults are sized so a full
run fits in ~20-40 min of chip time; scale up with the arguments.

Usage: python benchmarks/assemble_scale_demo.py [n_bins] [n_cycles] \
           [steps_per_cycle] [chrom_bins] [coverage]

``coverage`` < 1 thins the simulated sequencing depth (thin_coverage),
the knob that makes the 500k-fragment BASELINE config fit chip+host
budgets. Long runs checkpoint each cycle into /tmp/assemble_demo_ckpt
and resume from it automatically when re-launched with the same shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_bins=20_000, n_cycles=5, steps_per_cycle=None, chrom_bins=500,
         coverage=1.0, f_t=1.0, f_max_cap=8192):
    import jax
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts,
                                                  thin_coverage)

    params = scale_params()
    if coverage != 1.0:
        params = thin_coverage(params, coverage)
    n_contigs = max(n_bins // chrom_bins, 4)
    t0 = time.time()
    state, table = make_scale_genome(n_bins, n_contigs, seed=77)
    sobs = simulate_sparse_contacts(state, table, params, seed=77)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, max(n_bins // 200, 8), seed=78)
    t_setup = time.time() - t0

    ll_true = float(runner.anchor_fn()(state, params))
    ll_start = float(runner.anchor_fn()(shuf, params))

    ckpt = f"/tmp/assemble_demo_ckpt_{n_bins}_{n_cycles}.npz"
    # f_max_cap 8192: one (R, R) obs grid at 16384 would not fit HBM —
    # contigs beyond ~4k subs score only against small partners (the
    # mega x mega union overflows and is skip-counted). f_t < 1 damps the
    # quasi-neutral chromosome-end joins that grow such contigs under
    # thin coverage.
    final, _, m = runner.run(shuf, n_cycles=n_cycles,
                             steps_per_cycle=steps_per_cycle,
                             f_max_min=512, f_max_cap=f_max_cap,
                             f_t=f_t, seed=79, progress=True,
                             init_truth=state, checkpoint_path=ckpt,
                             resume=True, order_mode="extremity")
    gap0 = ll_true - ll_start
    gap1 = ll_true - m["likelihood"][-1]
    print(json.dumps({
        "metric": "chr1_scale_assembly_demo",
        "n_fragments": n_bins,
        "n_chromosomes": n_contigs,
        "nnz_sym": int(sobs.rows.shape[0]),
        "platform": jax.default_backend(),
        "setup_s": round(t_setup, 1),
        "cycles_s": [round(x, 1) for x in m["cycle_s"]],
        "f_max_buckets": m["f_max"],
        "ll_true": round(ll_true, 1),
        "ll_start": round(ll_start, 1),
        "ll_final": round(m["likelihood"][-1], 1),
        "gap_closed_pct": round(100 * (1 - gap1 / gap0), 1),
        "n_contigs_per_cycle": m["n_contigs"],
        "ll_per_cycle": [round(x, 1) for x in m["likelihood"]],
        "dist_per_cycle": [round(x, 4) for x in m["dist_init_genome"]],
        "n_contigs_final": m["n_contigs"][-1],
        "coverage": coverage,
        "f_t": f_t,
        "dist_final": round(m["dist_init_genome"][-1], 4)
        if m["dist_init_genome"] else None,
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    s = int(sys.argv[3]) if len(sys.argv) > 3 else None
    cb = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    cov = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
    ft = float(sys.argv[6]) if len(sys.argv) > 6 else 1.0
    main(n, c, s, cb, cov, ft)
