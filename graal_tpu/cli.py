"""Command-line interface — the headless replacement of the reference's
wx GUI (main_window.py).

Usage:
    python -m graal_tpu.cli pyramid  DATASET_DIR [--size 4 --factor 3]
    python -m graal_tpu.cli run      DATASET_DIR --fasta GENOME.FA [options]
    python -m graal_tpu.cli simulate OUT_DIR [--bins 384 --contigs 16]
    python -m graal_tpu.cli replay   DATASET_DIR MUTATION_LOG [options]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_run_opts(p):
    p.add_argument("--size", type=int, default=4, help="pyramid levels")
    p.add_argument("--factor", type=int, default=3)
    p.add_argument("--ref-quirks", action="store_true",
                   help="replicate two upstream pyramid-build defects so "
                        "COO triplets diff bit-exact against a reference-"
                        "built pyramid (parity runs only)")
    p.add_argument("--level", type=int, default=None,
                   help="sampling level (default: size-1)")
    p.add_argument("--to-level", type=int, default=None,
                   help="multilevel refinement: assemble at --level, then "
                        "refine level by level down to this level")
    p.add_argument("--cycles", type=int, default=10)
    p.add_argument("--neighbours", type=int, default=4)
    p.add_argument("--no-sample-param", action="store_true")
    p.add_argument("--no-scramble", action="store_true")
    p.add_argument("--allow-repeats", action="store_true")
    p.add_argument("--blacklist", type=int, nargs="*", default=[])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--t0", type=float, default=1.0)
    p.add_argument("--tf", type=float, default=1.0)
    p.add_argument("--resume", action="store_true",
                   help="resume the EM stage from <out>/checkpoint.npz")
    p.add_argument("--sub-sample", type=float, default=0.0,
                   help="Poisson sub-sampling factor in (0,1] for coverage-"
                        "robustness experiments")
    p.add_argument("--snapshots", action="store_true",
                   help="save reordered matrix snapshots before/after")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="also snapshot every N EM cycles (animate with "
                        "python -m graal_tpu.utils.plots OUT_DIR)")
    p.add_argument("--watch", action="store_true",
                   help="refresh <out>/live.html each cycle (headless live "
                        "view: layout painting + likelihood sparkline)")
    p.add_argument("--polish", action="store_true",
                   help="resolve unorientable-fragment orientations by "
                        "neighbourhood consensus before the FASTA export")
    p.add_argument("--model", default="rippe", choices=["rippe", "hic"],
                   help="contact model: Rippe polymer (default) or the "
                        "3-segment broken power law")
    p.add_argument("--sampler", default="em",
                   help="comma-separated stages: em, tempered, mtm, mh "
                        "(e.g. 'em,mtm' = EM then MTM refinement)")
    p.add_argument("--chains", type=int, default=4,
                   help="chain count for the 'tempered' stage")
    p.add_argument("--t-max", type=float, default=4.0,
                   help="hottest ladder temperature for 'tempered'")
    p.add_argument("--out", default="graal_out")
    p.add_argument("--platform", default="",
                   help="jax platform override (e.g. cpu)")
    p.add_argument("--config", default="", help="TOML config file")
    p.add_argument("--profile", action="store_true",
                   help="trace one EM cycle with jax.profiler into "
                        "<out>/profile and print per-stage timing + "
                        "achieved-bandwidth report")
    p.add_argument("--scoring", default="auto",
                   choices=["auto", "full", "delta"],
                   help="candidate scoring: full-matrix, incremental "
                        "(delta, the chr1-scale engine), or auto by size")


def _config_from_args(args):
    from graal_tpu.config import RunConfig

    if args.config:
        cfg = RunConfig.from_toml(args.config)
    else:
        cfg = RunConfig()
    cfg.dataset_dir = args.dataset
    cfg.output_dir = args.out
    cfg.platform = args.platform
    cfg.pyramid.size = args.size
    cfg.pyramid.factor = args.factor
    cfg.pyramid.ref_quirks = getattr(args, "ref_quirks", False)
    cfg.sampler.level = args.level if args.level is not None else args.size - 1
    cfg.sampler.n_cycles = args.cycles
    cfg.sampler.n_neighbours = args.neighbours
    cfg.sampler.sample_param = not args.no_sample_param
    cfg.sampler.scrambled = not args.no_scramble
    cfg.sampler.allow_repeats = args.allow_repeats
    cfg.sampler.blacklist_contigs = tuple(args.blacklist)
    cfg.sampler.seed = args.seed
    cfg.sampler.t0 = args.t0
    cfg.sampler.tf = args.tf
    cfg.sampler.sub_sample_factor = getattr(args, "sub_sample", 0.0)
    cfg.sampler.scoring = getattr(args, "scoring", "auto")
    cfg.sampler.snapshot_every = getattr(args, "snapshot_every", 0)
    cfg.sampler.watch = getattr(args, "watch", False)
    cfg.model.use_rippe = getattr(args, "model", "rippe") != "hic"
    return cfg


def cmd_pyramid(args):
    from graal_tpu.io.pyramid import build_and_filter

    p = build_and_filter(args.dataset, args.size, args.factor,
                         ref_quirks=args.ref_quirks)
    for lv in range(args.size):
        level = p.get_level(lv)
        print(f"level {lv}: {level.n_frags} fragments, "
              f"{level.sparse.nnz} non-zero contacts")
    print(f"pyramid at {p.folder}")
    return 0


def cmd_run(args):
    from graal_tpu.pipeline import Runner

    cfg = _config_from_args(args)
    if args.to_level is not None and args.to_level < cfg.sampler.level:
        from graal_tpu.multilevel import run_multilevel

        runner, assembly = run_multilevel(cfg, cfg.sampler.level,
                                          args.to_level, fasta=args.fasta)
        runner.save_behaviour(assembly)
        from graal_tpu.utils.plots import plot_genome_layout
        chrom_idx = np.unique(np.asarray(runner.level.frags.chrom),
                              return_inverse=True)[1]
        plot_genome_layout(assembly.state, chrom_idx, cfg.output_dir)
        print(f"outputs in {cfg.output_dir}")
        return 0
    runner = Runner(cfg)
    print(f"level {runner.level.level}: {runner.level.n_frags} bins, "
          f"{runner.state.n_frags} fragments "
          f"({len(runner.duplications)} repeated)")
    print("fitted params:", json.dumps({k: float(v) for k, v in zip(
        runner.params._fields, runner.params)}))
    if args.snapshots:
        runner.save_matrix_snapshot("pre_assembly")
    assembly = None
    merged = {}
    profile_dir = os.path.join(cfg.output_dir, "profile") \
        if getattr(args, "profile", False) else None
    for stage in args.sampler.split(","):
        if stage == "em":
            assembly = runner.run_em(resume=args.resume,
                                     profile_dir=profile_dir,
                                     scoring=cfg.sampler.scoring)
        elif stage == "tempered":
            assembly = runner.run_tempered_em(n_chains=args.chains,
                                              t_max=args.t_max)
        elif stage in ("mtm", "mh"):
            assembly = runner.run_mtm(variant=stage, assembly=assembly)
        else:
            raise SystemExit(f"unknown sampler stage: {stage!r} "
                             "(expected em, tempered, mtm or mh)")
        for k, v in assembly.metrics.items():
            merged.setdefault(k, []).extend(v)
    assembly.metrics.clear()
    assembly.metrics.update(merged)
    runner.save_behaviour(assembly)
    if args.snapshots:
        runner.save_matrix_snapshot("post_assembly", assembly.state)
        from graal_tpu.utils.plots import plot_genome_layout
        chrom_idx = np.unique(np.asarray(runner.level.frags.chrom),
                              return_inverse=True)[1]
        plot_genome_layout(assembly.state, chrom_idx, cfg.output_dir)
    if args.fasta:
        if args.polish:
            assembly.state = runner.polish_orientations(assembly.state)
        contigs = runner.export_fasta(assembly, args.fasta)
        print(f"wrote {len(contigs)} contigs to "
              f"{os.path.join(cfg.output_dir, 'genome.fasta')}")
    print(f"outputs in {cfg.output_dir}")
    return 0


def cmd_simulate(args):
    """Generate a synthetic ground-truth dataset in reference format."""
    from graal_tpu.utils.dataset import write_synthetic_dataset

    info = write_synthetic_dataset(args.out, n_bins=args.bins,
                                   n_contigs=args.contigs, seed=args.seed)
    print(json.dumps(info))
    return 0


def cmd_probe(args):
    """Likelihood-landscape probe of one fragment: all 13 ops against
    every neighbour (test_model / new_test_model, main_gl.py:414-661)."""
    from graal_tpu.core.candidates import MODIFICATION_STR
    from graal_tpu.pipeline import Runner

    cfg = _config_from_args(args)
    runner = Runner(cfg)
    ids, valid, ll = runner.probe_fragment(args.fragment)
    best = ll.reshape(-1).argmax()
    print(f"fragment {args.fragment}: {int(valid.sum())} valid neighbours")
    for k, fb in enumerate(ids):
        if not valid[k]:
            continue
        row = " ".join(f"{x:9.1f}" for x in ll[k])
        print(f"  vs {int(fb):5d}: {row}")
    print(f"best slot: neighbour {int(ids[best // 13])}, "
          f"op {int(best % 13)} ({MODIFICATION_STR[best % 13]}), "
          f"score {float(ll.reshape(-1)[best]):.1f}")
    return 0


def cmd_scale(args):
    """Chr1-scale sparse assembly: pyramid level -> ScaleRunner without
    ever densifying the observed matrix (the configuration class a dense
    S x S matrix cannot reach, ~10^12 cells at 500k sub-fragments)."""
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from graal_tpu import scale as scale_mod
    from graal_tpu.io import fasta as fasta_io

    if args.to_level is not None:
        start = args.level if args.level is not None else args.size - 1
        final, runner, lev, per_level = scale_mod.run_multilevel(
            args.dataset, args.size, start, args.to_level,
            n_cycles=args.cycles, factor=args.factor,
            delta=args.neighbours, f_max_min=args.f_max_min, f_t=args.t0,
            sample_param=not args.no_sample_param, seed=args.seed,
            max_fit_bins=args.max_fit_bins)
        os.makedirs(args.out, exist_ok=True)
        if args.fasta:
            f = lev.frags
            contigs = fasta_io.export_assembly(
                final, f.chrom, f.start_pos, f.end_pos,
                fasta_io.load_fasta(args.fasta),
                os.path.join(args.out, "genome.fasta"),
                os.path.join(args.out, "info_frags.txt"))
            print(f"wrote {len(contigs)} contigs")
        print(json.dumps({"levels": [
            {"level": m["level"], "final_loglik": m["likelihood"][-1],
             "n_contigs": m["n_contigs"][-1],
             "dist_init_genome": (m["dist_init_genome"] or [None])[-1]}
            for m in per_level]}))
        print(f"outputs in {args.out}")
        return 0
    runner, state0, lev, _ = scale_mod.from_dataset(
        args.dataset, args.size, args.factor, level=args.level,
        max_fit_bins=args.max_fit_bins, allow_repeats=args.allow_repeats,
        sub_sample=args.sub_sample, sub_sample_seed=args.seed,
        ref_quirks=args.ref_quirks)
    state = state0
    if not args.no_scramble:
        from graal_tpu.core import mcmc
        state = jax.jit(mcmc.explode_genome)(state)
    os.makedirs(args.out, exist_ok=True)
    chrom_idx = np.unique(np.asarray(lev.frags.chrom),
                          return_inverse=True)[1]
    if args.chains > 1:
        final, best_ll, metrics = runner.run_chains(
            state, n_chains=args.chains, n_cycles=args.cycles,
            delta=args.neighbours, f_max_min=args.f_max_min, f_t=args.t0,
            t_max=args.t_max, sample_param=not args.no_sample_param,
            seed=args.seed,
            checkpoint_path=os.path.join(args.out, "chains_checkpoint.npz"),
            checkpoint_every=args.checkpoint_every, resume=args.resume)
        metrics = {"likelihood": metrics["best"],
                   "n_contigs": [int(final.n_contigs())],
                   "dist_init_genome": [], "overflow": [],
                   "f_max": metrics["f_max"], "cycle_s": []}
    else:
        final, params, metrics = runner.run(
            state, n_cycles=args.cycles, delta=args.neighbours,
            steps_per_cycle=args.steps_per_cycle,
            f_max_min=args.f_max_min, f_t=args.t0,
            sample_param=not args.no_sample_param, seed=args.seed,
            init_truth=state0,
            checkpoint_path=os.path.join(args.out, "checkpoint.npz"),
            checkpoint_every=args.checkpoint_every, resume=args.resume,
            snapshot_every=args.snapshot_every, snapshot_dir=args.out,
            chrom_of_bin=chrom_idx, watch=args.watch,
            order_mode=args.order)
    if args.mtm_cycles > 0:
        final, l_mtm, m_mtm = runner.run_mtm(
            final, n_cycles=args.mtm_cycles, f_max_min=args.f_max_min,
            f_t=args.t0, seed=args.seed + 7)
        metrics["likelihood"].extend(m_mtm["likelihood"])
        metrics["n_contigs"].extend(m_mtm["n_contigs"])
        metrics["f_max"].extend(m_mtm["f_max"])
    if getattr(args, "profile", False):
        from graal_tpu.utils import profiling
        with profiling.trace(os.path.join(args.out, "profile")):
            final, params, _ = runner.run(
                final, n_cycles=1, delta=args.neighbours,
                f_max_min=args.f_max_min, f_t=args.t0,
                sample_param=not args.no_sample_param, seed=args.seed + 1)
    os.makedirs(args.out, exist_ok=True)
    for name, key in (("list_likelihood", "likelihood"),
                      ("list_n_contigs", "n_contigs"),
                      ("list_dist_init_genome", "dist_init_genome"),
                      ("list_overflow", "overflow"),
                      ("list_f_max", "f_max"),
                      ("list_fact", "fact"),
                      ("list_slope", "slope"),
                      ("list_d_max", "d_max"),
                      ("list_d_nuc", "v_inter")):
        with open(os.path.join(args.out, f"0{name}.txt"), "w") as fh:
            for v in metrics.get(key, []):
                fh.write(f"{v}\n")
    if args.fasta:
        f = lev.frags
        contigs = fasta_io.export_assembly(
            final, f.chrom, f.start_pos, f.end_pos,
            fasta_io.load_fasta(args.fasta),
            os.path.join(args.out, "genome.fasta"),
            os.path.join(args.out, "info_frags.txt"))
        print(f"wrote {len(contigs)} contigs to "
              f"{os.path.join(args.out, 'genome.fasta')}")
    from graal_tpu.utils.plots import plot_genome_layout
    chrom_idx = np.unique(np.asarray(lev.frags.chrom),
                          return_inverse=True)[1]
    plot_genome_layout(final, chrom_idx, args.out)
    print(json.dumps({
        "final_loglik": metrics["likelihood"][-1],
        "n_contigs": metrics["n_contigs"][-1],
        "dist_init_genome": (metrics["dist_init_genome"] or [None])[-1],
        "cycle_s": metrics["cycle_s"],
    }))
    print(f"outputs in {args.out}")
    return 0


def cmd_replay(args):
    """Re-apply a recorded mutation log (replay_simu, main_gl.py:140-207)."""
    import jax
    from graal_tpu.core import mcmc
    from graal_tpu.core.likelihood import log_likelihood
    from graal_tpu.pipeline import Runner

    cfg = _config_from_args(args)
    runner = Runner(cfg)
    muts = np.loadtxt(args.log, dtype=np.int64, skiprows=1, ndmin=2)
    state = jax.jit(mcmc.explode_genome)(runner.state)
    apply_jit = jax.jit(mcmc.apply_mutation)
    for fa, fb, op in muts:
        if op < 0:
            continue
        state = apply_jit(state, int(fa), int(fb), int(op))
    ll = jax.jit(lambda s: log_likelihood(s, runner.table, runner.obs,
                                          runner.params))(state)
    print(f"replayed {len(muts)} mutations, final loglik = {float(ll):.2f}")
    runner.state = state
    if args.fasta:
        from graal_tpu.pipeline import Assembly
        assembly = Assembly(state=state, params=runner.params,
                            table=runner.table, obs=runner.obs, metrics={},
                            level=runner.level)
        runner.export_fasta(assembly, args.fasta)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="graal_tpu",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pyramid", help="build the contact-map pyramid")
    p.add_argument("dataset")
    p.add_argument("--size", type=int, default=4)
    p.add_argument("--factor", type=int, default=3)
    p.add_argument("--ref-quirks", action="store_true",
                   help="replicate two upstream pyramid-build defects so "
                        "COO triplets diff bit-exact against a reference-"
                        "built pyramid (parity runs only)")
    p.set_defaults(fn=cmd_pyramid)

    p = sub.add_parser("run", help="full assembly run")
    p.add_argument("dataset")
    p.add_argument("--fasta", default="", help="reference genome FASTA")
    _add_run_opts(p)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("simulate", help="write a synthetic dataset")
    p.add_argument("out")
    p.add_argument("--bins", type=int, default=120)
    p.add_argument("--contigs", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("probe", help="likelihood landscape of one fragment")
    p.add_argument("dataset")
    p.add_argument("fragment", type=int)
    _add_run_opts(p)
    p.set_defaults(fn=cmd_probe)

    p = sub.add_parser("scale", help="chr1-scale sparse assembly "
                                     "(never densifies the contact matrix)")
    p.add_argument("dataset")
    p.add_argument("--fasta", default="", help="reference genome FASTA")
    p.add_argument("--size", type=int, default=4)
    p.add_argument("--factor", type=int, default=3)
    p.add_argument("--level", type=int, default=None)
    p.add_argument("--to-level", type=int, default=None,
                   help="multilevel: assemble at --level, refine level by "
                        "level down to this level (projected warm starts)")
    p.add_argument("--cycles", type=int, default=10)
    p.add_argument("--neighbours", type=int, default=4)
    p.add_argument("--f-max-min", type=int, default=256,
                   help="small-tier contig capacity bucket")
    p.add_argument("--max-fit-bins", type=int, default=2048,
                   help="cap on the Rippe fit window, in distance bins")
    p.add_argument("--allow-repeats", action="store_true",
                   help="duplicate coverage-outlier bins (copy-expanded "
                        "geometry; routes to the repeat-aware scorer)")
    p.add_argument("--ref-quirks", action="store_true",
                   help="replicate two upstream pyramid-build defects so "
                        "COO triplets diff bit-exact against a reference-"
                        "built pyramid (parity runs only)")
    p.add_argument("--chains", type=int, default=1,
                   help="parallel-tempered chains sharded over the device "
                        "mesh with adjacent-pair replica-exchange swaps")
    p.add_argument("--t-max", type=float, default=4.0,
                   help="hottest chain temperature of the PT ladder")
    p.add_argument("--mtm-cycles", type=int, default=0,
                   help="delta-scored MTM refinement cycles after EM "
                        "(the start_MTM role at chr1 scale)")
    p.add_argument("--no-sample-param", action="store_true")
    p.add_argument("--no-scramble", action="store_true")
    p.add_argument("--steps-per-cycle", type=int, default=None,
                   help="cap fragment steps per cycle (default: every "
                        "fragment once, the reference sweep)")
    p.add_argument("--order", default="random",
                   choices=("random", "extremity"),
                   help="subsampled-cycle schedule: random truncated "
                        "sweep, or contig extremities first (where "
                        "repairs are possible — use with "
                        "--steps-per-cycle at chr1 scale)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--t0", type=float, default=1.0)
    p.add_argument("--sub-sample", type=float, default=0.0,
                   help="Poisson-resample contacts by this factor "
                        "(coverage robustness; gen_rand_mat)")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>/checkpoint.npz if present")
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="checkpoint every N cycles (0 disables)")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="genome-layout painting every N cycles")
    p.add_argument("--watch", action="store_true",
                   help="refresh <out>/live.html each cycle (headless "
                        "live view)")
    p.add_argument("--profile", action="store_true",
                   help="run one extra post-compile cycle under "
                        "jax.profiler.trace into <out>/profile")
    p.add_argument("--out", default="graal_scale_out")
    p.add_argument("--platform", default="",
                   help="jax platform override (e.g. cpu)")
    p.set_defaults(fn=cmd_scale)

    p = sub.add_parser("replay", help="re-apply a recorded mutation log")
    p.add_argument("dataset")
    p.add_argument("log")
    p.add_argument("--fasta", default="")
    _add_run_opts(p)
    p.set_defaults(fn=cmd_replay)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
