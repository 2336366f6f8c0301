"""End-to-end assembly pipeline: dataset -> pyramid -> sampler -> FASTA.

Headless re-design of the reference's orchestration stack
(simulation_loader.simulation + main_gl.window.start_EM): wires a pyramid
level to the sampler, detects repeats, blacklists contigs, estimates model
parameters, runs EM cycles with optional nuisance sampling, logs the same
output series as the reference (9 txt files + mutation log,
main_gl.py:321-342), and exports the assembled genome.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time

import numpy as np

from graal_tpu.config import RunConfig, temperature_schedule
from graal_tpu.core import mcmc
from graal_tpu.core.likelihood import log_likelihood
from graal_tpu.core.model import RippeParams, fit_rippe_from_matrix
from graal_tpu.core.state import (GenomeState, check_invariants,
                                  derive_prev_next, dist_inter_genome)
from graal_tpu.core.subfrags import SubFragTable, table_from_level
from graal_tpu.io import fasta as fasta_io
from graal_tpu.io import pyramid as pyramid_io


def detect_repeats_coverage(coverage: np.ndarray, allow_repeats: bool):
    """Coverage-outlier repeat detection (select_repeated_frags,
    simulation_loader.py:369-394): bins with coverage > mean + 3 sd are
    repeat candidates with estimated copy number max(1, round(cov/th) - 1)
    extra copies. Scale-invariant in ``coverage`` (thresholding and copy
    ratio both divide out a global factor), so any proportional coverage
    vector works — dense double row sums or sparse single ones."""
    if not allow_repeats:
        return []
    coverage = np.asarray(coverage, np.float64)
    thresh = coverage.mean() + 3 * coverage.std()
    out = []
    for b in np.nonzero(coverage > thresh)[0]:
        n_dup = int(max(1, round(coverage[b] / thresh) - 1))
        out.append((int(b), n_dup))
    return out


def detect_repeats(bin_matrix: np.ndarray, allow_repeats: bool):
    """Dense entry point: coverage = column + row sums."""
    if not allow_repeats:
        return []
    return detect_repeats_coverage(
        bin_matrix.sum(axis=0) + bin_matrix.sum(axis=1), allow_repeats)


def extend_with_repeats(soa: dict, duplications):
    """Append repeat copies as fresh singleton contigs
    (modify_vect_frags, simulation_loader.py:182-256). Vectorised —
    the per-copy Python append was O(n) list conversions at chr1 scale."""
    if not duplications:
        return soa
    soa = {k: np.asarray(v) for k, v in soa.items()}
    bins = np.repeat([b for b, _ in duplications],
                     [d for _, d in duplications]).astype(np.int64)
    m = len(bins)
    max_c = int(soa["id_c"].max()) + 1
    ext = {
        "pos": np.zeros(m, np.int64),
        "id_c": max_c + np.arange(m, dtype=np.int64),
        "start_bp": np.zeros(m, np.int64),
        "len_bp": soa["len_bp"][bins],
        "circ": np.zeros(m, np.int64),
        "l_cont": np.ones(m, np.int64),
        "l_cont_bp": soa["len_bp"][bins],
        "n_accu": soa["n_accu"][bins],
        "ori": np.ones(m, np.int64),
        "rep": np.ones(m, np.int64),
        "activ": np.ones(m, np.int64),
        "id_d": bins,
    }
    out = {k: np.concatenate([soa[k], np.asarray(ext[k], soa[k].dtype)])
           for k in soa}
    # mark the originals of duplicated bins as repeats too
    out["rep"][np.asarray([b for b, _ in duplications])] = 1
    return out


@contextlib.contextmanager
def _null_ctx():
    yield


@dataclasses.dataclass
class Assembly:
    state: GenomeState
    params: RippeParams
    table: SubFragTable
    obs: np.ndarray
    metrics: dict
    level: "pyramid_io.Level"


class Runner:
    """One configured assembly run."""

    def __init__(self, cfg: RunConfig, pyramid: "pyramid_io.Pyramid | None" = None):
        import jax

        self.cfg = cfg
        if cfg.platform:
            jax.config.update("jax_platforms", cfg.platform)
        self.jax = jax
        os.makedirs(cfg.output_dir, exist_ok=True)
        self.pyramid = pyramid or pyramid_io.build_and_filter(
            cfg.dataset_dir, cfg.pyramid.size, cfg.pyramid.factor,
            cfg.pyramid.min_bin_per_contig,
            ref_quirks=cfg.pyramid.ref_quirks)
        self._setup_level()
        self._setup_matrices()
        self._setup_state()
        self._estimate_parameters()

    # ---- setup ------------------------------------------------------------
    def _setup_level(self):
        cfg = self.cfg
        level = min(cfg.sampler.level, cfg.pyramid.size - 1)
        self.level = self.pyramid.get_level(level)
        self.sub_level = self.pyramid.get_level(max(level - 1, 0))
        sub_soa = self.sub_level.genome_soa()
        ranges = self.pyramid.sub_ranges(level) if level > 0 else \
            np.stack([np.arange(self.level.n_frags)] * 2, axis=1)
        self.bin_to_subs = ranges
        self.sub_soa = sub_soa

    def _setup_matrices(self):
        self.bin_matrix = self.level.dense_matrix()
        np.fill_diagonal(self.bin_matrix, 0.0)
        self.obs = self.sub_level.dense_matrix()
        np.fill_diagonal(self.obs, 0.0)
        self.mean_value_trans = self.sub_level.mean_value_trans()
        # Poisson sub-sampling robustness knob (gen_rand_mat kernels3.cu:61-77,
        # update_texture_4_sub cuda_lib_gl.py:667-693): resample every cell
        # with mean fact * obs.
        fact = getattr(self.cfg.sampler, "sub_sample_factor", 0.0)
        if 0.0 < fact <= 1.0:
            rng = np.random.default_rng(self.cfg.sampler.seed)
            sub = rng.poisson(np.maximum(np.triu(self.obs, 1) * fact, 0.0))
            self.obs = (sub + sub.T).astype(np.float32)
            binsub = rng.poisson(np.maximum(np.triu(self.bin_matrix, 1) * fact, 0.0))
            self.bin_matrix = (binsub + binsub.T).astype(np.float32)

    def _setup_state(self):
        cfg = self.cfg
        soa = self.level.genome_soa()
        n_bins = self.level.n_frags

        # contig blacklisting (blacklist_contig, simulation_loader.py:129-163)
        blacklisted = []
        for cid in cfg.sampler.blacklist_contigs:
            blacklisted.extend(np.nonzero(soa["id_c"] == cid)[0].tolist())

        self.duplications = detect_repeats(self.bin_matrix,
                                           cfg.sampler.allow_repeats)
        soa = extend_with_repeats(soa, self.duplications)
        self.state = GenomeState.from_soa(soa)
        self.n_bins = n_bins

        # blacklist rows: bin-level zeroed; data-level set to mean trans
        # (cuda_lib_gl.py:161-172)
        for f in blacklisted:
            b = int(soa["id_d"][f])
            self.bin_matrix[b, :] = 0.0
            self.bin_matrix[:, b] = 0.0
            lo, hi = self.bin_to_subs[b]
            self.obs[lo:hi + 1, :] = self.mean_value_trans
            self.obs[:, lo:hi + 1] = self.mean_value_trans

        self.blacklisted = blacklisted
        self.table = table_from_level(
            self.level.genome_soa(),
            {"len_bp": self.sub_soa["len_bp"], "n_accu": self.sub_soa["n_accu"]},
            self.bin_to_subs, id_d=soa["id_d"])
        self.nb = mcmc.build_neighbour_table(
            self.bin_matrix, soa["id_d"], self.state.n_frags,
            blacklisted=blacklisted, n_top=cfg.sampler.n_neighbours_cap)

        # initial-genome references for the distance metric
        self.init_prev, self.init_next = derive_prev_next(self.state)
        self.init_ori = np.ones(self.state.n_frags, np.int64)
        widths = self.bin_to_subs[:, 1] - self.bin_to_subs[:, 0] + 1
        self.orientable = widths[np.asarray(self.state.id_d)] > 1
        skip = np.zeros(self.state.n_frags, bool)
        skip[self.blacklisted] = True
        dup_bins = {b for b, _ in self.duplications}
        for f in range(self.state.n_frags):
            if int(np.asarray(self.state.id_d)[f]) in dup_bins:
                skip[f] = True
        self.dist_skip = skip

    def _estimate_parameters(self):
        """Rippe fit on the observed data (estimate_parameters,
        cuda_lib_gl.py:1229-1294): fit window = mean contig length (kb),
        bin width = mean bin length (kb)."""
        soa = self.sub_soa
        mean_dist_kb = float(np.mean(
            [soa["l_cont_bp"][i] for i in range(len(soa["pos"]))
             if soa["pos"][i] == 0])) / 1000.0
        size_bin_kb = float(np.mean(soa["len_bp"])) / 1000.0
        if getattr(self.cfg.model, "use_rippe", True):
            self.params, self.fit_bins, self.fit_contacts, self.fit_estim = \
                fit_rippe_from_matrix(
                    self.obs, soa, self.mean_value_trans,
                    mean_dist_kb * self.cfg.model.max_dist_bins_factor,
                    size_bin_kb)
        else:
            from graal_tpu.core.model_hic import fit_hic_from_matrix

            self.params = fit_hic_from_matrix(
                self.obs, soa, self.mean_value_trans,
                mean_dist_kb * self.cfg.model.max_dist_bins_factor,
                size_bin_kb)
            self.fit_bins = self.fit_contacts = self.fit_estim = None

    def _make_scorer(self):
        """Pick the fast batched scorer for the current model/geometry:
        the HiC scorer for the broken-power-law model, the Pallas kernel on
        TPU for repeat-free Rippe geometry, else None (jnp fallback).
        Returns (scorer, sample_param) — nuisance sampling is
        Rippe-specific, so it is forced off under the HiC model."""
        import jax
        from graal_tpu.core.model_hic import HiCParams, make_hic_scorer

        sample_param = self.cfg.sampler.sample_param
        if isinstance(self.params, HiCParams):
            return make_hic_scorer(self.table, self.obs), False
        if jax.default_backend() != "cpu":
            # Pallas fast path; repeat tables dispatch to the copy-summing
            # kernel (round-1 review item 4: --allow-repeats runs no longer
            # fall back to the slow jnp scatter path)
            from graal_tpu.ops.likelihood_pallas import make_pallas_scorer
            return make_pallas_scorer(self.table, self.obs), sample_param
        return None, sample_param

    def _initial_likelihood(self, state, params, scorer):
        import jax

        if scorer is not None:
            return jax.jit(scorer)(
                GenomeState(*[x[None] for x in state]), params)[0]
        return jax.jit(lambda s, p: log_likelihood(
            s, self.table, self.obs, p))(state, params)

    # ---- run --------------------------------------------------------------
    def run_em(self, n_cycles=None, progress=True, resume=False,
               checkpoint_every=1, profile_dir=None,
               scoring: str = "auto") -> Assembly:
        """``profile_dir``: when set, the second (post-compile) cycle runs
        under jax.profiler.trace into that directory, per-stage wall times
        are collected, and an achieved-HBM-bandwidth report is printed
        (the reference's CUDA-event timing discipline, cuda_lib_gl.py:544-593).

        ``scoring``: 'full' scores every candidate with the full-matrix
        likelihood (microseconds at S1 scale), 'delta' with the
        incremental mini-state engine (the chr1-scale path,
        sub_compute_likelihood semantics), 'auto' picks by problem size —
        the measured crossover favours full scoring below ~6000 subs.
        """
        import jax
        import jax.numpy as jnp
        from graal_tpu.utils import profiling
        from graal_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        if scoring == "auto":
            scoring = "delta" if self.table.n_subs > 6000 else "full"
        if scoring == "delta":
            # copy-expanded tables route to the repeat-aware delta scorer
            # inside make_delta_em_step (core.delta_repeats handles the
            # data-grid copy aggregation)
            return self._run_em_delta(n_cycles=n_cycles, progress=progress,
                                      resume=resume,
                                      checkpoint_every=checkpoint_every)

        cfg = self.cfg
        n_cycles = n_cycles or cfg.sampler.n_cycles
        scorer, sample_param = self._make_scorer()
        cycle = mcmc.make_em_cycle(self.table, self.obs, self.nb,
                                   delta=cfg.sampler.n_neighbours,
                                   sample_param=sample_param,
                                   scorer=scorer,
                                   thresh_overflow=cfg.sampler.thresh_overflow)
        state = self.state
        if cfg.sampler.scrambled:
            state = jax.jit(mcmc.explode_genome)(state)
        params = self.params
        key = jax.random.key(cfg.sampler.seed)
        start_cycle = 0
        ckpt_path = os.path.join(cfg.output_dir, "checkpoint.npz")
        if resume and os.path.exists(ckpt_path):
            state, params, start_cycle, key, _ = load_checkpoint(ckpt_path)
            if progress:
                print(f"resumed from {ckpt_path} at cycle {start_cycle}",
                      flush=True)
        l_t = self._initial_likelihood(state, params, scorer)

        collected = {k: [] for k in ("likelihood", "n_contigs", "mean_len",
                                     "op_sampled", "id_f_sampled", "id_f_a",
                                     "fact", "slope", "d_max", "v_inter",
                                     "success", "dist_init_genome")}
        n = state.n_frags
        timer = profiling.StageTimer()
        cycle_times = []
        t0 = time.time()
        for j in range(start_cycle, n_cycles):
            key, k_perm, k_cycle = jax.random.split(key, 3)
            order = jax.random.permutation(k_perm, n)
            f_t = temperature_schedule(cfg.sampler, j, n_cycles)
            tc = time.time()
            traced = profile_dir is not None and j == start_cycle + 1
            with (profiling.trace(profile_dir) if traced
                  else _null_ctx()):
                with timer.stage("em_cycle"):
                    state, params, l_t, m = cycle(state, k_cycle, params,
                                                  order, l_t,
                                                  jnp.float32(f_t))
                    l_t = jax.block_until_ready(l_t)
            cycle_times.append(time.time() - tc)
            with timer.stage("metrics_host"):
                for k in ("likelihood", "n_contigs", "mean_len", "op_sampled",
                          "id_f_sampled", "id_f_a", "fact", "slope", "d_max",
                          "v_inter", "success"):
                    collected[k].extend(np.asarray(getattr(m, k)).tolist())
                dist = dist_inter_genome(state, self.init_prev,
                                         self.init_next, self.init_ori,
                                         self.orientable, self.dist_skip)
                collected["dist_init_genome"].extend([dist] * n)
            if progress:
                print(f"cycle {j}: loglik={float(l_t):.1f} "
                      f"n_contigs={int(np.asarray(m.n_contigs)[-1])} "
                      f"dist={dist:.3f} T={f_t:.2f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            if checkpoint_every and (j + 1) % checkpoint_every == 0:
                with timer.stage("checkpoint"):
                    save_checkpoint(ckpt_path, state, params, j + 1, key)
            snap_every = getattr(cfg.sampler, "snapshot_every", 0)
            if snap_every and (j + 1) % snap_every == 0:
                self.save_matrix_snapshot(f"snapshot_{j + 1:04d}", state)
            if getattr(cfg.sampler, "watch", False):
                # headless live view (utils.live): layout painting +
                # metric row + likelihood sparkline in <out>/live.html
                from graal_tpu.utils import live
                from graal_tpu.utils.plots import plot_genome_layout

                chrom_idx = np.unique(np.asarray(self.level.frags.chrom),
                                      return_inverse=True)[1]
                plot_genome_layout(state, chrom_idx, cfg.output_dir,
                                   out_name="layout_latest.png")
                live.update(cfg.output_dir,
                            {"cycle": j, "loglik": float(l_t),
                             "n_contigs": int(np.asarray(m.n_contigs)[-1]),
                             "dist": dist, "T": round(f_t, 2)},
                            collected["likelihood"][::max(1, n // 4)],
                            state=state, chrom_of_bin=chrom_idx)
        if profile_dir is not None and cycle_times:
            timer.print_report("EM profiling")
            steady = cycle_times[1:] or cycle_times
            bw = profiling.bandwidth_report(
                self.table.n_subs,
                13 * (cfg.sampler.n_neighbours * self.nb.max_copies
                      + self.nb.max_copies),
                n, float(np.mean(steady)))
            print("bandwidth:", json.dumps(bw), flush=True)
        check_invariants(state)
        self.state = state
        self.params = params
        return Assembly(state=state, params=params, table=self.table,
                        obs=self.obs, metrics=collected, level=self.level)

    def _run_em_delta(self, n_cycles=None, progress=True, resume=False,
                      checkpoint_every=1) -> Assembly:
        """EM with incremental (delta) candidate scoring — the
        Runner-level wrapper over the chr1-scale engine, usable at any
        size behind ``run_em(scoring='delta')``. Nuisance sampling runs
        once per cycle on the re-anchored likelihood (per-step sampling
        would cost a full evaluation per step; see graal_tpu.scale)."""
        import jax
        import jax.numpy as jnp
        from graal_tpu.core import delta as delta_mod
        from graal_tpu.core import sparse
        from graal_tpu.scale import _next_pow2, max_contig_subs
        from graal_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        cfg = self.cfg
        n_cycles = n_cycles or cfg.sampler.n_cycles
        sobs = sparse.sparse_from_dense(self.obs)
        state = self.state
        if cfg.sampler.scrambled:
            state = jax.jit(mcmc.explode_genome)(state)
        params = self.params
        anchor = jax.jit(lambda s, p: log_likelihood(
            s, self.table, jnp.asarray(self.obs, jnp.float32), p))
        nuis = jax.jit(mcmc.make_nuisance_step(self.table, self.obs)) \
            if cfg.sampler.sample_param else None
        key = jax.random.key(cfg.sampler.seed)
        start_cycle = 0
        ckpt_path = os.path.join(cfg.output_dir, "checkpoint.npz")
        if resume and os.path.exists(ckpt_path):
            state, params, start_cycle, key, _ = load_checkpoint(ckpt_path)
            if progress:
                print(f"resumed from {ckpt_path} at cycle {start_cycle}",
                      flush=True)
        l_t = anchor(state, params)
        s_max = delta_mod.build_mini_table(self.table,
                                           allow_repeats=True).s_max
        n = state.n_frags
        cycles = {}
        collected = {k: [] for k in ("likelihood", "n_contigs", "overflow",
                                     "op_sampled", "id_f_sampled",
                                     "dist_init_genome", "fact", "slope",
                                     "d_max", "v_inter")}
        t0 = time.time()
        for j in range(start_cycle, n_cycles):
            bucket = _next_pow2(2 * max_contig_subs(state, self.table)
                                + 2 * s_max)
            bucket = min(max(bucket, 64), _next_pow2(n))
            if bucket not in cycles:
                cycles[bucket] = delta_mod.make_delta_em_cycle(
                    self.table, self.obs, self.nb,
                    delta=cfg.sampler.n_neighbours, f_max=bucket, sobs=sobs,
                    thresh_overflow=cfg.sampler.thresh_overflow)
            key, k_perm, k_cycle, k_nuis = jax.random.split(key, 4)
            order = jax.random.permutation(k_perm, n)
            f_t = temperature_schedule(cfg.sampler, j, n_cycles)
            state, l_t, (lls, ops_, fbs, overs, ncs) = cycles[bucket](
                state, k_cycle, params, order, l_t, jnp.float32(f_t))
            if nuis is not None:
                params, l_t, _ = nuis(state, k_nuis, params, l_t,
                                      jnp.float32(f_t))
            dist = dist_inter_genome(state, self.init_prev, self.init_next,
                                     self.init_ori, self.orientable,
                                     self.dist_skip)
            collected["likelihood"].extend(np.asarray(lls).tolist())
            collected["n_contigs"].extend(np.asarray(ncs).tolist())
            collected["overflow"].extend(np.asarray(overs).tolist())
            collected["op_sampled"].extend(np.asarray(ops_).tolist())
            collected["id_f_sampled"].extend(np.asarray(fbs).tolist())
            collected["dist_init_genome"].extend([dist] * n)
            for k in ("fact", "slope", "d_max", "v_inter"):
                collected[k].extend([float(getattr(params, k))] * n)
            if progress:
                print(f"cycle {j} (delta, f_max={bucket}): "
                      f"loglik={float(l_t):.1f} "
                      f"n_contigs={int(np.asarray(ncs)[-1])} dist={dist:.3f} "
                      f"overflow={int(np.sum(np.asarray(overs)))} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            if checkpoint_every and (j + 1) % checkpoint_every == 0:
                save_checkpoint(ckpt_path, state, params, j + 1, key)
        check_invariants(state)
        self.state = state
        self.params = params
        return Assembly(state=state, params=params, table=self.table,
                        obs=self.obs, metrics=collected, level=self.level)

    def run_tempered_em(self, n_chains=None, n_cycles=None, t_max=4.0,
                        exchange_every=2, progress=True) -> Assembly:
        """Parallel-tempered multi-chain EM; uses a device mesh when enough
        devices are available, else vmapped chains on one chip."""
        import jax
        from graal_tpu.parallel import make_mesh
        from graal_tpu.parallel.tempering import run_tempered

        cfg = self.cfg
        n_chains = n_chains or max(cfg.n_chains, 1)
        n_cycles = n_cycles or cfg.sampler.n_cycles
        n_dev = len(jax.devices())
        mesh = None
        if n_chains > 1 and n_dev >= n_chains and n_dev % n_chains == 0:
            mesh = make_mesh(n_chains=n_chains, n_rows=n_dev // n_chains)
        state = self.state
        if cfg.sampler.scrambled:
            state = jax.jit(mcmc.explode_genome)(state)
        scorer, _ = self._make_scorer()
        final, l_cold, pt = run_tempered(
            self.table, self.obs, self.nb, state, self.params,
            n_chains=n_chains, n_cycles=n_cycles,
            delta=cfg.sampler.n_neighbours, t_max=t_max,
            exchange_every=exchange_every, seed=cfg.sampler.seed,
            mesh=mesh, scorer=scorer, progress=progress)
        check_invariants(final)
        self.state = final
        dist = dist_inter_genome(final, self.init_prev, self.init_next,
                                 self.init_ori, self.orientable,
                                 self.dist_skip)
        metrics = {"likelihood": pt["trace"][:, 0].tolist(),
                   "likelihood_all_chains": pt["trace"].tolist(),
                   "swap_accepts": list(pt["swaps"]),
                   "n_contigs": pt["n_contigs"][:, 0].tolist(),
                   "dist_init_genome": [dist]}
        return Assembly(state=final, params=self.params, table=self.table,
                        obs=self.obs, metrics=metrics, level=self.level)

    def run_mtm(self, n_cycles=None, variant="mtm", delta=5, progress=True,
                assembly: Assembly | None = None) -> Assembly:
        """MTM / MH refinement cycles (start_MTM, main_gl.py:344-399) —
        typically run after EM on the current genome."""
        import jax
        import jax.numpy as jnp
        from graal_tpu.core import mtm as mtm_mod

        cfg = self.cfg
        n_cycles = n_cycles or cfg.sampler.n_cycles
        norm_vect = np.array([
            np.sum(self.sub_soa["n_accu"][lo:hi + 1])
            for lo, hi in self.bin_to_subs], np.float64)
        jump = mtm_mod.build_jump_table(
            self.bin_matrix, norm_vect, np.asarray(self.state.id_d),
            self.state.n_frags, delta)
        scorer, _ = self._make_scorer()
        cycle = mtm_mod.make_mtm_cycle(self.table, self.obs, jump,
                                       variant=variant, scorer=scorer)
        state = assembly.state if assembly else self.state
        params = assembly.params if assembly else self.params
        key = jax.random.key(cfg.sampler.seed + 1)
        l_t = self._initial_likelihood(state, params, scorer)
        collected = {"likelihood": [], "n_contigs": [], "accepts": [],
                     "dist_init_genome": []}
        n = state.n_frags
        t0 = time.time()
        for j in range(n_cycles):
            key, k_perm, k_cycle = jax.random.split(key, 3)
            order = jax.random.permutation(k_perm, n)
            f_t = temperature_schedule(cfg.sampler, j, n_cycles)
            state, l_t, (lls, accepts, ncs) = cycle(state, k_cycle, params,
                                                    order, l_t, jnp.float32(f_t))
            collected["likelihood"].extend(np.asarray(lls).tolist())
            collected["n_contigs"].extend(np.asarray(ncs).tolist())
            collected["accepts"].extend(np.asarray(accepts).tolist())
            dist = dist_inter_genome(state, self.init_prev, self.init_next,
                                     self.init_ori, self.orientable,
                                     self.dist_skip)
            collected["dist_init_genome"].extend([dist] * n)
            if progress:
                acc = int(np.sum(np.asarray(accepts)))
                print(f"{variant} cycle {j}: loglik={float(l_t):.1f} "
                      f"accepts={acc}/{n} "
                      f"n_contigs={int(np.asarray(ncs)[-1])} dist={dist:.3f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
        check_invariants(state)
        self.state = state
        return Assembly(state=state, params=params, table=self.table,
                        obs=self.obs, metrics=collected, level=self.level)

    # ---- outputs ----------------------------------------------------------
    def save_behaviour(self, assembly: Assembly):
        """The reference's 9 txt series + mutation log
        (save_behaviour_to_txt, main_gl.py:321-342)."""
        out = self.cfg.output_dir
        m = assembly.metrics
        series = {
            "list_likelihood.txt": m.get("likelihood", []),
            "list_n_contigs.txt": m.get("n_contigs", []),
            "list_dist_init_genome.txt": m.get("dist_init_genome", []),
            "list_fact.txt": m.get("fact", []),
            "list_slope.txt": m.get("slope", []),
            "list_d_max.txt": m.get("d_max", []),
            "list_d_nuc.txt": m.get("v_inter", []),
            "list_success.txt": m.get("success", []),
            "list_mean_len.txt": m.get("mean_len", []),
        }
        for name, vals in series.items():
            with open(os.path.join(out, "0" + name), "w") as fh:
                for v in vals:
                    if isinstance(v, (bool, np.bool_)):
                        v = int(v)   # 0/1 like the reference series
                    fh.write(f"{v}\n")
        with open(os.path.join(out, "0list_mutations.txt"), "w") as fh:
            fh.write("id_fA\tid_fB\tid_mutation\n")
            for fa, fb, op in zip(m.get("id_f_a", []),
                                  m.get("id_f_sampled", []),
                                  m.get("op_sampled", [])):
                fh.write(f"{fa}\t{fb}\t{op}\n")
        with open(os.path.join(out, "params.json"), "w") as fh:
            json.dump({k: float(v) for k, v in
                       zip(RippeParams._fields, assembly.params)}, fh, indent=2)

    def save_matrix_snapshot(self, name: str, state: GenomeState | None = None):
        """Observed bin matrix reordered by the current genome
        (display_current_matrix, cuda_lib_gl.py:1581-1624): rows/cols sorted
        by (contig, position), contigs with inactive fragments skipped.
        Saves <out>/<name>.npy and, when matplotlib is available,
        <name>.png."""
        state = state if state is not None else self.state
        id_c = np.asarray(state.id_c)
        pos = np.asarray(state.pos)
        activ = np.asarray(state.activ)
        id_d = np.asarray(state.id_d)
        order = []
        for c in np.unique(id_c):
            members = np.nonzero(id_c == c)[0]
            if not np.all(activ[members] == 1):
                continue
            order.extend(id_d[members[np.argsort(pos[members])]].tolist())
        m = self.bin_matrix[np.ix_(order, order)]
        out = os.path.join(self.cfg.output_dir, name)
        np.save(out + ".npy", m)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            vmax = np.percentile(m[m > 0], 98) if (m > 0).any() else 1.0
            plt.figure(figsize=(6, 6), dpi=120)
            plt.imshow(m, vmin=0, vmax=vmax, cmap="afmhot_r",
                       interpolation="nearest")
            plt.title(name)
            plt.colorbar(shrink=0.7)
            plt.savefig(out + ".png", bbox_inches="tight")
            plt.close()
        except Exception:
            pass
        return out

    def probe_fragment(self, f_a: int, delta: int = None):
        """Likelihood-landscape probe: score all 13 ops against every
        neighbour of ``f_a`` (the reference's test_model / new_test_model
        diagnostics, main_gl.py:414-661). Returns (neighbour ids, valid
        mask, (M, 13) scores)."""
        import jax
        import jax.numpy as jnp
        from graal_tpu.core.candidates import build_candidates

        delta = delta or self.cfg.sampler.n_neighbours
        step_in = (self.state, jax.random.key(0), self.params,
                   jnp.int32(f_a), jnp.float32(1.0))

        @jax.jit
        def probe(state, key, params, f_a, f_t):
            ids, valid = mcmc.sample_neighbours(key, f_a, state, self.nb, delta)
            cands = jax.vmap(lambda fb: build_candidates(state, f_a, fb))(ids)
            ll = jax.vmap(jax.vmap(lambda c: log_likelihood(
                c, self.table, jnp.asarray(self.obs, jnp.float32), params)))(cands)
            return ids, valid, ll

        ids, valid, ll = probe(*step_in)
        return np.asarray(ids), np.asarray(valid), np.asarray(ll)

    def polish_orientations(self, state: GenomeState | None = None) -> GenomeState:
        """Resolve unorientable fragments by neighbourhood consensus.

        A bin with a single sub-fragment gives the likelihood no orientation
        signal, so its ori is arbitrary after assembly (the reference
        exports whatever the sampler left, with the same ambiguity). This
        polish sets every unorientable fragment's orientation to that of its
        nearest orientable neighbour in the contig (ties -> upstream),
        giving locally consistent strandedness in the FASTA.
        """
        state = state if state is not None else self.state
        s = state.to_numpy()
        ori = s["ori"].copy()
        orientable = self.orientable
        for c in np.unique(s["id_c"]):
            members = np.nonzero(s["id_c"] == c)[0]
            order = members[np.argsort(s["pos"][members])]
            flags = orientable[order]
            if not flags.any():
                continue
            idx_orientable = np.nonzero(flags)[0]
            for k, f in enumerate(order):
                if not flags[k]:
                    nearest = idx_orientable[
                        np.argmin(np.abs(idx_orientable - k))]
                    ori[f] = ori[order[nearest]]
        import jax.numpy as jnp

        return state._replace(ori=jnp.asarray(ori, jnp.int32))

    def scan_parameter(self, name: str, values) -> np.ndarray:
        """Likelihood of the current genome over a grid of one model
        parameter — the reference's d_space / alpha_space scan machinery
        (modify_param_simu kernels3.cu:95-119, scan buffers
        cuda_lib_gl.py:426-438). Dependent parameters (c1) are re-derived
        for slope/kuhn/lm scans."""
        import jax
        import jax.numpy as jnp

        if name not in RippeParams._fields:
            raise ValueError(f"unknown parameter {name!r}; "
                            f"one of {RippeParams._fields}")
        values = jnp.asarray(np.asarray(values, np.float32))

        def with_value(v):
            p = self.params._replace(**{name: v})
            if name in ("slope", "kuhn", "lm"):
                c1 = (0.53 * jnp.power(p.lm / p.kuhn, p.slope)
                      * jnp.power(p.kuhn, -3.0)).astype(jnp.float32)
                p = p._replace(c1=c1)
            return log_likelihood(self.state, self.table,
                                  jnp.asarray(self.obs, jnp.float32), p)

        return np.asarray(jax.jit(jax.vmap(with_value))(values))

    def export_fasta(self, assembly: Assembly, genome_fasta: str):
        """Assembled genome FASTA + info_frags.txt
        (export_new_fasta, simulation_loader.py:781-783)."""
        seqs = fasta_io.load_fasta(genome_fasta)
        f = self.level.frags
        return fasta_io.export_assembly(
            assembly.state, f.chrom, f.start_pos, f.end_pos, seqs,
            os.path.join(self.cfg.output_dir, "genome.fasta"),
            os.path.join(self.cfg.output_dir, "info_frags.txt"))
