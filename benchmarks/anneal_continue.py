"""Annealed polish of a checkpointed large-scale assembly.

The full-sweep EM run at T=1.0 (assemble_scale_demo) reaches the truth
contig count but plateaus at dist ~ 0.07: at T=1 the sampler sits in its
stationary distribution, where near-neutral moves (end ejects/flips)
maintain an equilibrium level of local disagreement with the ground
truth. The reference carries the same machinery (its temperature
schedule is hard-coded to 1.0, the annealing formula commented out —
cuda_lib_gl.py:2590-2603); cooling is how a *converged structure* is
extracted from the equilibrium. This script resumes the checkpoint and
runs full-sweep cycles on a decreasing temperature ladder, reporting
likelihood / n_contigs / dist per cycle.

Usage: python benchmarks/anneal_continue.py [n_bins] [orig_cycles] \
           [chrom_bins] [ladder, e.g. 0.3,0.3,0.1,0.1,0.03]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_bins=100_000, orig_cycles=10, chrom_bins=500,
         ladder=(0.3, 0.3, 0.1, 0.1, 0.03, 0.03), coverage=1.0,
         steps_per_cycle=None, f_max_cap=8192):
    import jax
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.checkpoint import load_checkpoint
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  simulate_sparse_contacts,
                                                  thin_coverage)

    params = scale_params()
    if coverage != 1.0:
        params = thin_coverage(params, coverage)
    n_contigs = max(n_bins // chrom_bins, 4)
    state_true, table = make_scale_genome(n_bins, n_contigs, seed=77)
    sobs = simulate_sparse_contacts(state_true, table, params, seed=77)
    runner = ScaleRunner(table, sobs, params)

    ckpt = f"/tmp/assemble_demo_ckpt_{n_bins}_{orig_cycles}.npz"
    state, ck_params, cycle0, _key, _extra = load_checkpoint(ckpt)
    print(f"resumed {ckpt} at cycle {cycle0}", flush=True)
    ll_true = float(runner.anchor_fn()(state_true, params))

    hist = {"f_t": [], "likelihood": [], "n_contigs": [], "dist": [],
            "cycle_s": []}
    cur = state
    t0 = time.time()
    for i, f_t in enumerate(ladder):
        ck = f"/tmp/anneal_{n_bins}_{i}.npz"
        cur, _, m = runner.run(
            cur, n_cycles=1, f_t=float(f_t), f_max_min=512,
            f_max_cap=f_max_cap, steps_per_cycle=steps_per_cycle,
            order_mode="extremity",
            seed=1000 + i, init_truth=state_true, progress=True,
            checkpoint_path=ck, resume=False)
        hist["f_t"].append(float(f_t))
        hist["likelihood"].append(m["likelihood"][-1])
        hist["n_contigs"].append(m["n_contigs"][-1])
        hist["dist"].append(m["dist_init_genome"][-1])
        hist["cycle_s"].append(round(m["cycle_s"][-1], 1))
    print(json.dumps({
        "metric": "annealed_polish",
        "n_fragments": n_bins,
        "n_chromosomes": n_contigs,
        "platform": jax.default_backend(),
        "ll_true": round(ll_true, 1),
        "total_s": round(time.time() - t0, 1),
        **hist,
        "dist_final": hist["dist"][-1],
        "n_contigs_final": hist["n_contigs"][-1],
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    n = int(a[0]) if a else 100_000
    c = int(a[1]) if len(a) > 1 else 10
    cb = int(a[2]) if len(a) > 2 else 500
    lad = tuple(float(x) for x in a[3].split(",")) if len(a) > 3 else \
        (0.3, 0.3, 0.1, 0.1, 0.03, 0.03)
    cov = float(a[4]) if len(a) > 4 else 1.0
    spc = int(a[5]) if len(a) > 5 else None
    main(n, c, cb, lad, cov, spc)
