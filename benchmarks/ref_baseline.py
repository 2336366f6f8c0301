"""Measure the reference algorithm's per-candidate scoring cost on this CPU.

The CUDA reference cannot execute here (PyCUDA + OpenGL + Python 2.7, no
NVIDIA GPU), and it publishes no benchmark numbers (BASELINE.md). Round-1
used a launch-overhead *model* (~770 candidate-evals/s/GPU); this harness
replaces modelling with measurement: the per-candidate delta-likelihood
workload of sub_compute_likelihood is transcribed to vectorised numpy with
the reference's exact semantics and timed on this machine.

Workload shape (no-repeats segment, cuda_lib_gl.py:2477-2483): per
candidate, all pairs within the sub_index — the sub-fragments of the two
affected contigs (fill_sub_index_fA/fB, kernels3.cu:3225-3249). Per pair
(kernels3.cu:3381-3717): recompute the expected contact (Rippe cis /
v_inter trans, f32), evaluate the f64 Poisson log-pmf, subtract the cached
old per-pair likelihood, reduce. Vectorised numpy is *generous* to the
reference: it amortises what the GPU pays in 13 stream launches + host
sync per neighbour batch.

Writes BASELINE_MEASURED.json next to this file; bench.py prefers the
measured anchor over the model, taking the LARGER of the two so the
reported speedup is conservative.

Run: python benchmarks/ref_baseline.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rippe_ref(s, kuhn, lm, c1, slope, d, d_max, fact, v_inter):
    """rippe_contacts (kernels3.cu:120-133) in f32, vectorised."""
    s = s.astype(np.float32)
    with np.errstate(all="ignore"):
        n = s * np.float32(lm / kuhn)
        val = (np.float32(c1) * np.power(s, np.float32(slope))
               * np.exp(np.float32(d - 2.0) / (n * n + np.float32(d)))
               * np.float32(fact))
    val = np.where((s > 0) & (s < d_max), val, np.float32(0.0))
    return np.maximum(val, np.float32(v_inter))


def _logpmf_ref(ex, ob, logfact):
    """evaluate_likelihood_double (kernels3.cu:190-210) in f64, vectorised;
    ``logfact`` precomputed per pair (the data-dependent branch tree)."""
    ex = ex.astype(np.float64)
    out = np.where(ex > 0, ob * np.log(np.where(ex > 0, ex, 1.0)) - ex
                   - logfact, 0.0)
    return out


def _logfact_branches(ob):
    out = np.zeros_like(ob, np.float64)
    big = ob >= 15
    out[big] = (ob[big] * np.log(ob[big]) - ob[big]
                + np.log(np.sqrt(ob[big] * 2 * np.pi)))
    mid = (ob >= 10) & ~big
    nn = np.floor(ob[mid])
    out[mid] = nn * np.log(nn) - nn + 0.5 * np.log(2 * np.pi * nn)
    small = (ob > 0) & (ob < 10)
    out[small] = [math.lgamma(math.floor(x) + 1) for x in ob[small]]
    return out


def measure(n_bins=384, n_contigs=16, subs_per_bin=3, n_rounds=40, seed=0):
    """Time the reference per-candidate workload at S1-pyramid-4 scale."""
    from graal_tpu.utils.synthetic import (default_params, make_genome,
                                           simulate_contacts)

    state, table = make_genome(n_bins, n_contigs, subs_per_bin=subs_per_bin,
                               seed=seed)
    params = default_params()
    obs = np.asarray(simulate_contacts(state, table, params, seed=seed),
                     np.float64)
    kuhn, lm, c1, slope, d, d_max, fact, v_inter = [float(x) for x in params]

    owner = np.asarray(table.owner)
    mid = (np.asarray(state.start_bp)[owner] / 1000.0
           + np.asarray(table.len_kb) * 0.5)
    idc = np.asarray(state.id_c)[owner]

    # sub_index of a typical assembled-phase step: two whole contigs
    # (fill_sub_index_fA + _fB) — the dominant workload regime after the
    # first cycle coalesces contigs.
    rows = np.nonzero((idc == 0) | (idc == 1))[0]
    r = len(rows)
    ob_rows = obs[np.ix_(rows, rows)]
    logfact = _logfact_branches(ob_rows)
    # cached per-pair current likelihood (curr_likelihood, the kernel
    # subtracts it per pair, kernels3.cu:3388-3397)
    e0 = _rippe_ref(np.abs(mid[rows][:, None] - mid[rows][None, :]),
                    kuhn, lm, c1, slope, d, d_max, fact, v_inter)
    old_ll = _logpmf_ref(e0, ob_rows, logfact)

    rng = np.random.default_rng(1)

    def one_candidate():
        # candidate geometry: the popped fragment moved => new midpoints for
        # the affected contig (represent as a permuted/shifted mid vector —
        # the arithmetic cost is identical for any candidate)
        m2 = mid[rows] + rng.random()
        s = np.abs(m2[:, None] - m2[None, :])
        e = _rippe_ref(s, kuhn, lm, c1, slope, d, d_max, fact, v_inter)
        new_ll = _logpmf_ref(e, ob_rows, logfact)
        iu = np.triu_indices(r, 1)
        return float(np.sum(new_ll[iu] - old_ll[iu]))

    # warm-up
    one_candidate()
    t0 = time.perf_counter()
    n_cands = 0
    for _ in range(n_rounds):
        for _ in range(13):          # 13 candidate structures per neighbour
            one_candidate()
            n_cands += 1
    dt = time.perf_counter() - t0
    evals_per_s = n_cands / dt
    return dict(
        cpu_evals_per_s=round(evals_per_s, 1),
        pairs_per_candidate=int(r * (r - 1) / 2),
        sub_index_size=int(r),
        n_candidates_timed=n_cands,
        seconds=round(dt, 3),
        modeled_gpu_evals_per_s=770.0,
        anchor_evals_per_s=round(max(evals_per_s, 770.0), 1),
        note=("anchor = max(measured CPU re-timing of the reference "
              "per-candidate workload, 2014-GPU launch-overhead model) — "
              "conservative: the larger anchor shrinks our reported "
              "speedup"),
    )


def main():
    out = measure()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
