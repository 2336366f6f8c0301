"""Configuration system: typed dataclasses + TOML loading.

The reference has no config system — parameters live in the wx GUI, in
per-hostname hard-coded paths (simulation_loader.py:396-584) and in inline
constants (SURVEY.md section 5). Every knob identified there is captured
here with its reference default and source.
"""

from __future__ import annotations

import dataclasses
import tomllib


@dataclasses.dataclass
class PyramidConfig:
    size: int = 4                  # pyramid levels (GUI combo 4/5/6, main_window.py:250)
    factor: int = 3                # collinear frags per bin (main_window.py:253)
    min_bin_per_contig: int = 1    # build_and_filter, pyramid_sparse.py:28
    ref_quirks: bool = False       # opt-in: replicate two upstream pyramid
                                   # defects (accu leak pyramid_sparse.py:744,
                                   # first-contact drop :526-530) so COO
                                   # triplets diff bit-exact vs the reference


@dataclasses.dataclass
class ModelConfig:
    use_rippe: bool = True         # False = 3-segment broken power law
                                   # (a dead path in the reference: its
                                   # kernels4.cu is missing; functional here)
    kuhn: float = 1.0              # fit init (optim_rippe_curve_update.py:76)
    lm: float = 9.6                # :80
    slope: float = -1.5            # :81
    d: float = 3.0                 # fixed exponent (:9)
    max_dist_bins_factor: float = 1.0  # fit window = mean contig length (cuda_lib_gl.py:1229)


@dataclasses.dataclass
class SamplerConfig:
    level: int = 3                 # sampling level (GUI default size-1, main_window.py:532)
    n_cycles: int = 10             # EM cycles (main_window.py:537)
    n_neighbours: int = 4          # delta, GUI range 3-5 (main_window.py:453,540)
    n_neighbours_cap: int = 10     # top-k of the proposal distri (cuda_lib_gl.py:444)
    thresh_overflow: float = 30.0  # score window (cuda_lib_gl.py:1917)
    sample_param: bool = True      # nuisance sampling each step (main_gl.py:260)
    allow_repeats: bool = False    # repeat duplication (simulation_loader.py:380)
    scrambled: bool = True         # explode genome before sampling (main_gl.py:218)
    scoring: str = "auto"          # candidate scoring: auto | full | delta
    snapshot_every: int = 0        # save a reordered-matrix snapshot every N
                                   # cycles (0 = only on request); the series
                                   # animates via utils.plots.animate_snapshots
    watch: bool = False            # refresh <out>/live.html each cycle — the
                                   # headless live view (utils.live; GL view
                                   # + wx plot in the reference)
    blacklist_contigs: tuple = ()  # contig ids to freeze (simulation_loader.py:129)
    sub_sample_factor: float = 0.0 # Poisson coverage sub-sampling (cuda_lib_gl.py:667)
    seed: int = 1                  # RNG seed (cuda_lib_gl.py:364)
    # temperature schedule; the reference hard-codes T=1.0 with a geometric
    # schedule commented out (cuda_lib_gl.py:2590-2603)
    t0: float = 1.0
    tf: float = 1.0
    limit_rejection: float = 0.5


@dataclasses.dataclass
class RunConfig:
    dataset_dir: str = ""
    output_dir: str = "graal_out"
    fasta: str = ""
    pyramid: PyramidConfig = dataclasses.field(default_factory=PyramidConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)
    n_chains: int = 1              # parallel annealing chains (mesh axis)
    n_row_shards: int = 1          # likelihood row shards (mesh axis)
    platform: str = ""             # "" = default; "cpu" forces CPU

    @staticmethod
    def from_toml(path: str) -> "RunConfig":
        with open(path, "rb") as fh:
            raw = tomllib.load(fh)
        cfg = RunConfig()
        for section, cls in (("pyramid", PyramidConfig), ("model", ModelConfig),
                             ("sampler", SamplerConfig)):
            if section in raw:
                setattr(cfg, section, cls(**raw.pop(section)))
        for k, v in raw.items():
            if not hasattr(cfg, k):
                raise ValueError(f"unknown config key: {k}")
            setattr(cfg, k, v)
        return cfg


def temperature_schedule(cfg: SamplerConfig, t: float, n_step: float) -> float:
    """Geometric annealing (the reference's commented-out schedule,
    cuda_lib_gl.py:2590-2603); degenerates to constant T when t0 == tf."""
    if cfg.t0 == cfg.tf:
        return float(cfg.t0)
    frac = min(t / (n_step * cfg.limit_rejection), 1.0)
    return float(cfg.t0 * (cfg.tf / cfg.t0) ** frac)
