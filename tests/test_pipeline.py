"""End-to-end pipeline tests: Runner on a synthetic dataset (CPU)."""

import os

import numpy as np
import pytest

from graal_tpu.config import RunConfig
from graal_tpu.pipeline import Runner, detect_repeats, extend_with_repeats
from graal_tpu.utils.dataset import write_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_ds")
    write_synthetic_dataset(str(d), n_bins=90, n_contigs=3,
                            contacts_scale=40.0, seed=3)
    return str(d)


def make_cfg(dataset, tmp_path, **kw):
    cfg = RunConfig()
    cfg.dataset_dir = dataset
    cfg.output_dir = str(tmp_path / "out")
    cfg.platform = "cpu"
    cfg.pyramid.size = 3
    cfg.sampler.level = 1
    cfg.sampler.n_cycles = 3
    cfg.sampler.n_neighbours = 3
    cfg.sampler.sample_param = False
    for k, v in kw.items():
        setattr(cfg.sampler, k, v)
    return cfg


@pytest.fixture(scope="module")
def runner(dataset, tmp_path_factory):
    cfg = make_cfg(dataset, tmp_path_factory.mktemp("run"))
    return Runner(cfg)


def test_runner_setup(runner):
    assert runner.level.n_frags > 10
    assert runner.obs.shape[0] == runner.sub_level.n_frags
    assert float(runner.params.fact) > 0
    assert float(runner.params.d_max) > 0


def test_em_converges_and_outputs(runner, dataset):
    assembly = runner.run_em(progress=False)
    assert assembly.metrics["likelihood"][-1] > assembly.metrics["likelihood"][0]
    runner.save_behaviour(assembly)
    out = runner.cfg.output_dir
    for f in ("0list_likelihood.txt", "0list_mutations.txt", "params.json"):
        assert os.path.exists(os.path.join(out, f)), f
    contigs = runner.export_fasta(assembly, os.path.join(dataset, "genome.fa"))
    assert len(contigs) >= 1
    # scaffold statistics written next to the FASTA
    import json
    with open(os.path.join(out, "assembly_stats.json")) as fh:
        stats = json.load(fh)
    assert stats["n_contigs"] == len(contigs)
    assert stats["total_bp"] == sum(len(s) for s in contigs.values())
    assert stats["N50_bp"] >= stats["N90_bp"] > 0
    assert stats["L50"] <= stats["L90"]
    # checkpoint written every cycle
    assert os.path.exists(os.path.join(out, "checkpoint.npz"))


def test_resume_from_checkpoint(runner):
    from graal_tpu.utils.checkpoint import load_checkpoint

    ckpt = os.path.join(runner.cfg.output_dir, "checkpoint.npz")
    state, params, cycle, key, _ = load_checkpoint(ckpt)
    assert cycle == runner.cfg.sampler.n_cycles
    assert state.n_frags == runner.state.n_frags
    # resume with n_cycles == saved cycle: returns immediately, state intact
    assembly = runner.run_em(progress=False, resume=True)
    assert assembly.state.n_frags == state.n_frags


def test_matrix_snapshot(runner, tmp_path):
    out = runner.save_matrix_snapshot("snap_test")
    m = np.load(out + ".npy")
    assert m.shape[0] == m.shape[1] > 0


def test_probe_fragment(runner):
    ids, valid, scores = runner.probe_fragment(2, delta=3)
    assert scores.shape[1] == 13
    assert np.isfinite(scores[np.asarray(valid)]).all()


def test_detect_repeats_flags_outlier():
    rng = np.random.default_rng(0)
    m = rng.poisson(3.0, (40, 40)).astype(np.float64)
    m[7, :] *= 14
    m[:, 7] *= 14
    np.fill_diagonal(m, 0)
    dups = detect_repeats(m, allow_repeats=True)
    assert any(b == 7 for b, _ in dups)
    assert detect_repeats(m, allow_repeats=False) == []


def test_extend_with_repeats_structure():
    n = 6
    soa = dict(pos=np.arange(n) % 3, id_c=np.arange(n) // 3,
               start_bp=(np.arange(n) % 3) * 100, len_bp=np.full(n, 100),
               circ=np.zeros(n), l_cont=np.full(n, 3),
               l_cont_bp=np.full(n, 300), n_accu=np.ones(n),
               ori=np.ones(n), rep=np.zeros(n), activ=np.ones(n),
               id_d=np.arange(n))
    out = extend_with_repeats(soa, [(2, 2)])
    assert len(out["pos"]) == n + 2
    assert out["rep"][2] == 1            # original flagged
    assert list(out["id_d"][-2:]) == [2, 2]
    assert all(out["rep"][-2:] == 1)
    from graal_tpu.core.state import GenomeState, check_invariants
    check_invariants(GenomeState.from_soa(out))


def test_repeats_pipeline_end_to_end(dataset, tmp_path):
    """allow_repeats on a dataset with an artificially amplified bin: the
    pipeline must duplicate it and still assemble (jnp scorer path)."""
    import shutil

    d2 = str(tmp_path / "ds_rep")
    shutil.copytree(dataset, d2, ignore=shutil.ignore_patterns("pyramids"))
    # amplify one fragment's contacts 10x in the raw pair list
    pairs = os.path.join(d2, "abs_fragments_contacts_weighted.txt")
    with open(pairs) as fh:
        lines = fh.readlines()
    extra = [l for l in lines[1:] if l.split("\t")[0] == "5"
             or l.split("\t")[1] == "5"] * 9
    with open(pairs, "w") as fh:
        fh.writelines(lines + extra)

    cfg = make_cfg(d2, tmp_path, allow_repeats=True)
    cfg.sampler.n_cycles = 2
    runner = Runner(cfg)
    if not runner.duplications:
        pytest.skip("amplification below the 3-sigma threshold at this level")
    assert runner.state.n_frags > runner.level.n_frags
    assert runner.table.has_repeats
    assembly = runner.run_em(progress=False)
    from graal_tpu.core.state import check_invariants
    check_invariants(assembly.state)
    # delta scoring must route copy-expanded tables to the repeat-aware
    # incremental scorer (core.delta_repeats), not reject them
    assembly_d = runner.run_em(progress=False, scoring="delta", n_cycles=1)
    check_invariants(assembly_d.state)
    assert np.isfinite(assembly_d.metrics["likelihood"][-1])


def test_sub_sampling(dataset, tmp_path):
    cfg = make_cfg(dataset, tmp_path, sub_sample_factor=0.5)
    cfg.sampler.n_cycles = 1
    runner = Runner(cfg)
    # roughly half the contacts survive
    full = Runner(make_cfg(dataset, tmp_path / "b"))
    ratio = runner.obs.sum() / full.obs.sum()
    assert 0.3 < ratio < 0.7
    assembly = runner.run_em(progress=False)
    assert np.isfinite(assembly.metrics["likelihood"][-1])


def test_polish_orientations(runner):
    """Unorientable fragments adopt their nearest orientable neighbour's
    orientation; orientable fragments are untouched."""
    import jax.numpy as jnp

    state = runner.state
    n = state.n_frags
    # force a known pattern: flip the whole of contig 0, then scramble the
    # unorientable members' oris
    s = state.to_numpy()
    ori = np.where(s["id_c"] == 0, -1, 1).astype(np.int32)
    rng = np.random.default_rng(0)
    for f in range(n):
        if not runner.orientable[f]:
            ori[f] = rng.choice([-1, 1])
    noisy = state._replace(ori=jnp.asarray(ori))
    polished = runner.polish_orientations(noisy)
    p = np.asarray(polished.ori)
    for f in range(n):
        if runner.orientable[f]:
            assert p[f] == ori[f]          # untouched
    # contigs whose orientable members all agree become uniform
    for c in np.unique(s["id_c"]):
        members = np.nonzero(s["id_c"] == c)[0]
        ors = np.asarray([ori[f] for f in members if runner.orientable[f]])
        if len(ors) and (ors == ors[0]).all():
            assert (p[members] == ors[0]).all()
