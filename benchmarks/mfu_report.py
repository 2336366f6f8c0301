"""Roofline / achieved-bandwidth report for the dense Pallas scorer.

Times the raw batched candidate scorer (no sampling, no commit) at the
two reference dataset scales — S1-pyramid-4 (K~1152 sub-fragments) and
tricho-qm6a (K~3000) — and converts the measured time into:

- achieved HBM bandwidth vs the chip peak (traffic model:
  utils.profiling.dense_scorer_traffic — obs matrix streamed once per
  candidate batch + per-candidate O(K) geometry vectors),
- achieved arithmetic throughput from a per-cell op count of the fused
  expected-contacts + Poisson log-pmf chain (~35 f32 ops/cell: powers,
  exp, log, divides, selects — VPU transcendental work, NOT MXU matmuls;
  there is no matmul in this kernel, so "MFU" in the matrix sense is 0
  by construction and the relevant roofline is VPU/HBM).

Prints one JSON line per scale. Usage: python benchmarks/mfu_report.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per pair-cell f32 op estimate for the fused scorer chain
# (rippe: pow/exp/mul/div ~ 20, circular select ~ 4, pmf: log/mul/sub ~ 8,
# masks/selects ~ 3)
OPS_PER_CELL = 35.0
PEAK_HBM_GBPS = 819.0     # v5e / v5 lite class


def run_scale(n_bins: int, label: str, batch: int = 65, iters: int = 30):
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import mcmc
    from graal_tpu.core.state import GenomeState
    from graal_tpu.ops.likelihood_pallas import make_pallas_scorer
    from graal_tpu.utils.profiling import bandwidth_report
    from graal_tpu.utils.synthetic import (default_params, make_genome,
                                           simulate_contacts)

    state, table = make_genome(n_bins, max(n_bins // 100, 4),
                               subs_per_bin=3, seed=5)
    params = default_params()
    obs = simulate_contacts(state, table, params, seed=5)
    scorer = make_pallas_scorer(table, obs)
    k = table.n_subs

    # a batch of distinct candidate genomes: alternate true/scrambled
    shuf = mcmc.explode_genome(state)
    cands = GenomeState(*[jnp.stack([np.asarray(a) if j % 2 else np.asarray(b)
                                     for j in range(batch)])
                          for a, b in zip(state, shuf)])

    fn = jax.jit(scorer)
    out = jax.block_until_ready(fn(cands, params))   # compile
    assert bool(jnp.all(jnp.isfinite(out)))

    # time `iters` back-to-back batches inside ONE dispatched scan — a
    # host loop of jit calls pays a tunnel-relay round-trip per call
    # (~10 ms here), which at batch granularity swamps the kernel
    @jax.jit
    def loop(c):
        def body(acc, _):
            return acc + 0.0 * scorer(cands, params)[0], None
        acc, _ = jax.lax.scan(body, c, None, length=iters)
        return acc
    jax.block_until_ready(loop(jnp.float32(0)))
    t_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(jnp.float32(0)))
        t_best = min(t_best, (time.perf_counter() - t0) / iters)

    # one "step" of the traffic model = one batch of `batch` candidates
    bw = bandwidth_report(k, batch, 1, t_best, peak_gbps=PEAK_HBM_GBPS)
    cells = 0.5 * k * k * batch          # triangular pair grid per candidate
    gflops = cells * OPS_PER_CELL / t_best / 1e9
    return {
        "metric": "pallas_scorer_roofline",
        "scale": label,
        "k_subs": int(k),
        "batch": batch,
        "batch_ms": round(t_best * 1e3, 3),
        "evals_per_s": round(batch / t_best, 1),
        "achieved_gb_per_s": bw["achieved_gb_per_s"],
        "hbm_fraction_of_peak": bw["fraction_of_peak"],
        "est_gflop_per_s": round(gflops, 1),
        "bound": ("VPU transcendentals (no matmul in kernel; HBM fraction "
                  "low => compute-bound at this scale)"),
    }


def main():
    import jax

    for n_bins, label in ((384, "S1-pyramid-4"), (1000, "tricho-qm6a")):
        rep = run_scale(n_bins, label)
        rep["platform"] = jax.default_backend()
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
