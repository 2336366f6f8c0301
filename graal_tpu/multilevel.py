"""Hierarchical (multilevel) assembly: coarse-to-fine refinement.

The reference's intended workflow runs GRAAL at a coarse pyramid level where
n_frags is small, then re-runs at finer levels (the GUI exposes the level
choice, main_window.py:532-534; the pyramid carries sub <-> super index maps
for the zoom, pyramid_sparse.py:1036-1145). The reference leaves the
projection of an assembled coarse genome onto the finer level to the user;
here it is automated: each coarse bin expands to its sub-bins in placement
order, orientation-aware (a reversed bin contributes its sub-bins reversed
and flipped), giving the finer level a warm start instead of a scramble.
"""

from __future__ import annotations

import numpy as np

from graal_tpu.config import RunConfig
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.pipeline import Runner


def project_state_to_sub(state: GenomeState, bin_to_subs: np.ndarray,
                         sub_len_bp: np.ndarray) -> dict:
    """Project an assembled level-L genome onto level L-1.

    ``bin_to_subs``: (n_bins, 2) inclusive [lo, hi] sub-bin ranges per bin
    (Pyramid.sub_ranges). Returns a struct-of-arrays dict for the finer
    level. Repeat copies are not projected (multilevel + repeats is
    unsupported; assert no duplicated bins).
    """
    id_c = np.asarray(state.id_c)
    pos = np.asarray(state.pos)
    ori = np.asarray(state.ori)
    circ = np.asarray(state.circ)
    id_d = np.asarray(state.id_d)
    n_bins = bin_to_subs.shape[0]
    assert len(id_c) == n_bins, "multilevel projection requires no repeats"

    n_sub = int(bin_to_subs[:, 1].max()) + 1
    sub_len_bp = np.asarray(sub_len_bp)
    out = dict(pos=np.zeros(n_sub, np.int64), id_c=np.zeros(n_sub, np.int64),
               start_bp=np.zeros(n_sub, np.int64), len_bp=sub_len_bp.copy(),
               circ=np.zeros(n_sub, np.int64), l_cont=np.zeros(n_sub, np.int64),
               l_cont_bp=np.zeros(n_sub, np.int64),
               ori=np.ones(n_sub, np.int64), rep=np.zeros(n_sub, np.int64),
               activ=np.ones(n_sub, np.int64),
               id_d=np.arange(n_sub, dtype=np.int64))

    for c in np.unique(id_c):
        members = np.nonzero(id_c == c)[0]
        ordered_bins = members[np.argsort(pos[members])]
        subs = []
        for b in ordered_bins:
            lo, hi = bin_to_subs[id_d[b]]
            if ori[b] == 1:
                subs.extend([(s, 1) for s in range(lo, hi + 1)])
            else:
                subs.extend([(s, -1) for s in range(hi, lo - 1, -1)])
        off = 0
        for p, (s, o) in enumerate(subs):
            out["pos"][s] = p
            out["id_c"][s] = c
            out["start_bp"][s] = off
            out["ori"][s] = o
            out["circ"][s] = circ[ordered_bins[0]]
            off += int(sub_len_bp[s])
        for s, _ in subs:
            out["l_cont"][s] = len(subs)
            out["l_cont_bp"][s] = off
    return out


def run_multilevel(cfg: RunConfig, from_level: int, to_level: int,
                   fasta: str = "", progress=True):
    """Assemble at ``from_level`` (scrambled start), then refine level by
    level down to ``to_level`` with projected warm starts. Returns the
    final Runner and Assembly."""
    import dataclasses

    assert from_level >= to_level >= 1, \
        "refinement needs a sub level below it (to_level >= 1)"
    runner = None
    assembly = None
    prev_state = None
    prev_runner = None
    for level in range(from_level, to_level - 1, -1):
        lcfg = dataclasses.replace(cfg)
        lcfg.sampler = dataclasses.replace(cfg.sampler)
        lcfg.sampler.level = level
        lcfg.sampler.allow_repeats = False
        pyramid = runner.pyramid if runner else None
        if level != from_level:
            lcfg.sampler.scrambled = False
        runner = Runner(lcfg, pyramid=pyramid)
        if prev_state is not None:
            soa = project_state_to_sub(
                prev_state, prev_runner.pyramid.sub_ranges(level + 1),
                np.asarray(runner.state.len_bp))
            warm = GenomeState.from_soa(soa)
            check_invariants(warm)
            runner.state = warm
        if progress:
            print(f"--- level {level}: {runner.level.n_frags} bins "
                  f"({'warm start' if prev_state is not None else 'scrambled'})",
                  flush=True)
        assembly = runner.run_em(progress=progress)
        prev_state = assembly.state
        prev_runner = runner
    if fasta:
        runner.export_fasta(assembly, fasta)
    return runner, assembly
