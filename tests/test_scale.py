"""Chr1-scale path: sparse obs + mini-state delta end to end.

The round-1 review's top gap: nothing above K=3000 had ever run, and every
path densified the observed matrix. These tests run the scale runner on
sparse synthetic problems, including one at 100k fragments (the BASELINE
chr1-class configuration, scaled to CPU test budget via steps_per_cycle).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import sparse
from graal_tpu.core.state import check_invariants
from graal_tpu.scale import ScaleRunner, max_contig_subs
from graal_tpu.utils.synthetic_sparse import (make_scale_genome, scale_params,
                                              shuffle_genome,
                                              simulate_sparse_contacts)


@pytest.mark.slow
def test_scale_assembly_recovers_structure():
    """A 1500-bin shuffled genome must reassemble: distance to ground truth
    drops sharply and the likelihood approaches the true-genome value."""
    params = scale_params()
    state, table = make_scale_genome(420, 4, seed=11)
    sobs = simulate_sparse_contacts(state, table, params, seed=11)
    runner = ScaleRunner(table, sobs, params)

    ll_true = float(runner.anchor_fn()(state, params))
    shuf = shuffle_genome(state, 24, seed=12)
    ll_shuf = float(runner.anchor_fn()(shuf, params))
    assert ll_true > ll_shuf

    final, _, metrics = runner.run(shuf, n_cycles=4, delta=4,
                                   f_max_min=64, seed=3, progress=False,
                                   init_truth=state)
    check_invariants(final)
    assert metrics["dist_init_genome"][-1] < 0.15, metrics["dist_init_genome"]
    gap0 = ll_true - ll_shuf
    gap1 = ll_true - metrics["likelihood"][-1]
    assert gap1 < 0.25 * gap0, (ll_shuf, metrics["likelihood"], ll_true)


@pytest.mark.slow
def test_scale_extremity_order_subsampled_progress():
    """Subsampled cycles with extremity-first scheduling must repair the
    genome: at 500k fragments a uniform 1000-step subsample measurably
    REGRESSED (likelihood fell, n_contigs grew — BASELINE.md round 3)
    because repairs only happen at contig extremities. The same budget
    spent extremity-first must reduce n_contigs and ground-truth
    distance."""
    params = scale_params()
    state, table = make_scale_genome(420, 4, seed=11)
    sobs = simulate_sparse_contacts(state, table, params, seed=11)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 24, seed=12)
    ll_shuf = float(runner.anchor_fn()(shuf, params))
    nc0 = int(shuf.n_contigs())
    final, _, m = runner.run(shuf, n_cycles=3, delta=4, steps_per_cycle=80,
                             f_max_min=64, seed=3, progress=False,
                             init_truth=state, order_mode="extremity")
    check_invariants(final)
    assert m["n_contigs"][-1] < nc0 - 4, (nc0, m["n_contigs"])
    # "repairs, not regresses": the likelihood must climb from the shuffled
    # start (the uniform-order 1000-step subsample at 500k measurably FELL).
    # The neighbour-exact distance metric is too granular to assert on at
    # this budget (1/420 per joint; an 80-step sub-sweep moves it by noise).
    assert m["likelihood"][-1] > ll_shuf, (ll_shuf, m["likelihood"])


@pytest.mark.slow
def test_scale_bucket_growth():
    """f_max buckets must grow as contigs coalesce and stay >= the largest
    contig (otherwise joins can never be scored)."""
    params = scale_params()
    state, table = make_scale_genome(240, 4, seed=21)
    sobs = simulate_sparse_contacts(state, table, params, seed=21)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 16, seed=22)
    final, _, metrics = runner.run(shuf, n_cycles=3, f_max_min=32,
                                   seed=5, progress=False)
    for f_max in metrics["f_max"]:
        assert f_max >= 32
    assert max_contig_subs(final, table) <= metrics["f_max"][-1] * 2


@pytest.mark.slow
def test_scale_100k_fragments():
    """The BASELINE chr1-class size actually runs: 100k fragments, sparse
    end to end, exact incremental likelihood. CPU budget: a slice of one
    cycle rather than full assembly."""
    params = scale_params()
    state, table = make_scale_genome(100_000, 20, seed=31)
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 400, seed=32)

    final, _, metrics = runner.run(shuf, n_cycles=1, steps_per_cycle=16,
                                   f_max_min=1024, seed=7, progress=False)
    check_invariants(final)
    # the anchored likelihood equals a fresh sparse evaluation
    fresh = float(runner.anchor_fn()(final, params))
    np.testing.assert_allclose(metrics["likelihood"][-1], fresh,
                               rtol=1e-6, atol=1.0)
    # and incremental tracking held: the cycle's carried l_t is close to
    # the anchor (f32 accumulation at |L| ~ 1e7)
    assert metrics["overflow"][0] == 0


@pytest.mark.slow
def test_scale_nuisance_sampling():
    """Per-cycle nuisance sampling under the sparse scorer keeps parameters
    finite and the likelihood consistent."""
    params = scale_params()
    state, table = make_scale_genome(200, 2, seed=41)
    sobs = simulate_sparse_contacts(state, table, params, seed=41)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 10, seed=42)
    final, out_params, metrics = runner.run(
        shuf, n_cycles=2, f_max_min=64, sample_param=True, seed=9,
        progress=False)
    assert np.isfinite(metrics["likelihood"][-1])
    assert float(out_params.fact) > 0
    assert float(out_params.v_inter) > 0


@pytest.mark.slow
def test_scale_runner_with_repeats():
    """Chr1-scale machinery end to end on a copy-expanded table: delta
    scoring routes to the repeat scorer, the sparse anchor copy-sums, and
    assembly still climbs from a shuffled start."""
    from graal_tpu.core.state import check_invariants
    from graal_tpu.utils.synthetic_sparse import add_scale_repeats

    params = scale_params()
    base, base_table = make_scale_genome(200, 4, seed=41)
    sobs = simulate_sparse_contacts(base, base_table, params, seed=41)
    state, table, id_d = add_scale_repeats(base, base_table, (11, 60, 150))
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    shuf = shuffle_genome(state, 12, seed=42)
    ll_shuf = float(runner.anchor_fn()(shuf, params))
    final, _, metrics = runner.run(shuf, n_cycles=2, f_max_min=32,
                                   seed=7, progress=False)
    check_invariants(final)
    assert metrics["likelihood"][-1] > ll_shuf


def test_from_dataset_sparse_end_to_end(tmp_path):
    """scale.from_dataset: pyramid -> sparse fit -> ScaleRunner, never
    densifying; the sparse Rippe fit must agree with the dense Runner's
    fit on the same dataset, and the assembly must climb."""
    from graal_tpu import scale as scale_mod
    from graal_tpu.config import RunConfig
    from graal_tpu.core import mcmc
    from graal_tpu.pipeline import Runner
    from graal_tpu.utils.dataset import write_synthetic_dataset

    d = str(tmp_path / "ds")
    write_synthetic_dataset(d, n_bins=90, n_contigs=3,
                            contacts_scale=40.0, seed=3)
    runner, state0, lev, extras = scale_mod.from_dataset(
        d, size=3, level=1, progress=False)

    cfg = RunConfig()
    cfg.dataset_dir = d
    cfg.output_dir = str(tmp_path / "out")
    cfg.platform = "cpu"
    cfg.pyramid.size = 3
    cfg.sampler.level = 1
    dense = Runner(cfg)
    for f in dense.params._fields:
        np.testing.assert_allclose(float(getattr(runner.params, f)),
                                   float(getattr(dense.params, f)),
                                   rtol=1e-5, err_msg=f)

    shuf = jax.jit(mcmc.explode_genome)(state0)
    ll0 = float(runner.anchor_fn()(shuf, runner.params))
    final, _, metrics = runner.run(shuf, n_cycles=2, f_max_min=64,
                                   init_truth=state0, seed=5, progress=False)
    check_invariants(final)
    assert metrics["likelihood"][-1] > ll0
    assert metrics["dist_init_genome"][-1] < 0.5


def test_from_dataset_with_repeats(tmp_path):
    """allow_repeats through the sparse dataset path: an amplified bin is
    duplicated, the table routes to the repeat-aware scorer, and the run
    still climbs."""
    import os
    from graal_tpu import scale as scale_mod
    from graal_tpu.core import mcmc
    from graal_tpu.utils.dataset import write_synthetic_dataset

    d = str(tmp_path / "ds")
    write_synthetic_dataset(d, n_bins=90, n_contigs=3,
                            contacts_scale=40.0, seed=3)
    pairs = os.path.join(d, "abs_fragments_contacts_weighted.txt")
    with open(pairs) as fh:
        lines = fh.readlines()
    extra = [l for l in lines[1:] if l.split("\t")[0] == "5"
             or l.split("\t")[1] == "5"] * 9
    with open(pairs, "w") as fh:
        fh.writelines(lines + extra)

    runner, state0, lev, extras = scale_mod.from_dataset(
        d, size=3, level=1, allow_repeats=True, progress=False)
    if not extras["duplications"]:
        pytest.skip("amplification below the 3-sigma threshold")
    assert runner.table.has_repeats
    assert state0.n_frags > lev.n_frags
    shuf = jax.jit(mcmc.explode_genome)(state0)
    ll0 = float(runner.anchor_fn()(shuf, runner.params))
    final, _, metrics = runner.run(shuf, n_cycles=2, f_max_min=64,
                                   seed=5, progress=False)
    check_invariants(final)
    assert metrics["likelihood"][-1] > ll0


@pytest.mark.slow
def test_run_chains_on_mesh():
    """Multi-chain tempered scale run over the 8-device CPU mesh: chains
    improve at their own temperatures, adjacent-pair PT swaps exchange
    states, and hot-chain diversity SURVIVES exchange (the round-1
    broadcast-best scheme collapsed it)."""
    params = scale_params()
    state, table = make_scale_genome(300, 4, seed=21)
    sobs = simulate_sparse_contacts(state, table, params, seed=21)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 10, seed=22)
    ll0 = float(runner.anchor_fn()(shuf, params))
    final, best_ll, m = runner.run_chains(shuf, n_chains=4, n_cycles=2,
                                          f_max_min=64, exchange_every=1,
                                          seed=3, progress=False)
    check_invariants(final)
    assert best_ll > ll0
    # PT keeps chains distinct: the post-exchange likelihood vector is
    # not collapsed onto a single broadcast value
    last = np.asarray(m["likelihood"][-1])
    assert not np.allclose(last, last.max())
    assert "swaps" in m and len(m["swaps"]) == 2


@pytest.mark.slow
def test_scale_multilevel_warm_start(tmp_path):
    """Coarse-to-fine sparse cascade: level-2 assembly projected onto
    level 1 must start at (or land immediately on) the exact structure."""
    from graal_tpu import scale as scale_mod
    from graal_tpu.utils.dataset import write_synthetic_dataset

    d = str(tmp_path / "ds")
    write_synthetic_dataset(d, n_bins=90, n_contigs=3,
                            contacts_scale=40.0, seed=3)
    final, runner, lev, per_level = scale_mod.run_multilevel(
        d, size=3, from_level=2, to_level=1, n_cycles=2,
        f_max_min=64, progress=False)
    check_invariants(final)
    assert len(per_level) == 2
    assert final.n_frags == lev.n_frags
    # the finer level must not regress below the coarse recovery
    assert per_level[-1]["dist_init_genome"][-1] <= 0.1


@pytest.mark.slow
def test_run_chains_sample_param():
    """Per-chain nuisance sampling inside multi-chain runs: chains carry
    their own parameter vectors and the run still improves."""
    params = scale_params()
    state, table = make_scale_genome(240, 4, seed=25)
    sobs = simulate_sparse_contacts(state, table, params, seed=25)
    runner = ScaleRunner(table, sobs, params)
    shuf = shuffle_genome(state, 8, seed=26)
    ll0 = float(runner.anchor_fn()(shuf, params))
    final, best_ll, m = runner.run_chains(
        shuf, n_chains=4, n_cycles=2, f_max_min=64, exchange_every=1,
        sample_param=True, seed=3, progress=False)
    check_invariants(final)
    assert best_ll > ll0
    assert float(m["params"].fact) > 0
    assert float(m["params"].d_max) <= runner.max_covered_d_max + 1e-3


@pytest.mark.slow
def test_scale_checkpoint_resume_bitexact(tmp_path):
    """Kill-and-resume parity: 2 cycles + resume for 2 more must equal an
    uninterrupted 4-cycle run bit-exactly (state arrays AND params)."""
    params = scale_params()
    state, table = make_scale_genome(200, 4, seed=41)
    sobs = simulate_sparse_contacts(state, table, params, seed=41)
    shuf = shuffle_genome(state, 8, seed=42)
    ckpt = str(tmp_path / "checkpoint.npz")

    r1 = ScaleRunner(table, sobs, params)
    full, p_full, m_full = r1.run(shuf, n_cycles=4, f_max_min=64, seed=7,
                                  sample_param=True, progress=False)

    r2 = ScaleRunner(table, sobs, params)
    r2.run(shuf, n_cycles=2, f_max_min=64, seed=7, sample_param=True,
           progress=False, checkpoint_path=ckpt)
    # fresh runner simulates a killed process; resume from the checkpoint
    r3 = ScaleRunner(table, sobs, params)
    res, p_res, m_res = r3.run(shuf, n_cycles=4, f_max_min=64, seed=7,
                               sample_param=True, progress=False,
                               checkpoint_path=ckpt, resume=True)
    for f in full._fields:
        np.testing.assert_array_equal(np.asarray(getattr(full, f)),
                                      np.asarray(getattr(res, f)),
                                      err_msg=f"field {f}")
    for f in p_full._fields:
        np.testing.assert_allclose(float(getattr(p_full, f)),
                                   float(getattr(p_res, f)), rtol=0,
                                   err_msg=f"param {f}")
    assert len(m_res["likelihood"]) == 4
    np.testing.assert_allclose(m_res["likelihood"], m_full["likelihood"])


def test_scale_subsample_sparse():
    """Poisson sub-sampling keeps the SparseObs well-formed, shrinks mass
    by about the factor, and the anchor still evaluates finitely."""
    from graal_tpu.core.sparse import subsample_sparse

    params = scale_params()
    state, table = make_scale_genome(150, 3, seed=51)
    sobs = simulate_sparse_contacts(state, table, params, seed=51)
    sub = subsample_sparse(sobs, 0.3, seed=5)
    assert sub.n == sobs.n
    total, sub_total = float(np.sum(sobs.vals)), float(np.sum(sub.vals))
    assert 0.15 * total < sub_total < 0.45 * total
    # still symmetric, sorted, CSR-consistent
    assert np.all(np.diff(np.asarray(sub.row_start)) >= 0)
    runner = ScaleRunner(table, sub, params)
    ll = float(runner.anchor_fn()(state, params))
    assert np.isfinite(ll)


def test_scan_chunk_cap_bounds_product():
    """Device-safety ceiling: chunk length x r_max^2 stays under the
    empirical TPU worker-crash bound, with a floor so progress is always
    possible; vmapped chain lanes divide the budget."""
    from graal_tpu.scale import _SAFE_SCAN_PRODUCT, _scan_chunk_cap

    for f_max in (256, 512, 1024, 2048, 4096, 1 << 14):
        cap = _scan_chunk_cap(f_max, 1, 500_000)
        assert cap >= 8
        if cap > 8:
            assert cap * f_max * f_max <= _SAFE_SCAN_PRODUCT
    # the empirically crashing config (f_max 2048 x 384 steps) is excluded
    assert _scan_chunk_cap(2048, 1, 500_000) < 384
    # the measured-safe configs remain reachable
    assert _scan_chunk_cap(1024, 1, 500_000) >= 512
    # lanes divide the budget
    assert _scan_chunk_cap(1024, 1, 500_000, lanes=4) <= \
        _scan_chunk_cap(1024, 1, 500_000) // 4 + 1
    # s_max multiplies the row count
    assert _scan_chunk_cap(512, 3, 500_000) < _scan_chunk_cap(512, 1, 500_000)


@pytest.mark.slow
def test_run_chains_checkpoint_resume_bitexact(tmp_path):
    """Tempered-ensemble checkpoints: 1 cycle + resume for 2 more equals
    an uninterrupted 3-cycle run bit-exactly across every chain."""
    params = scale_params()
    state, table = make_scale_genome(160, 4, seed=71)
    sobs = simulate_sparse_contacts(state, table, params, seed=71)
    shuf = shuffle_genome(state, 6, seed=72)
    ckpt = str(tmp_path / "chains.npz")

    r1 = ScaleRunner(table, sobs, params)
    full, full_ll, m_full = r1.run_chains(
        shuf, n_chains=4, n_cycles=3, f_max_min=64, exchange_every=1,
        sample_param=True, seed=9, progress=False)

    r2 = ScaleRunner(table, sobs, params)
    r2.run_chains(shuf, n_chains=4, n_cycles=1, f_max_min=64,
                  exchange_every=1, sample_param=True, seed=9,
                  progress=False, checkpoint_path=ckpt)
    r3 = ScaleRunner(table, sobs, params)
    res, res_ll, m_res = r3.run_chains(
        shuf, n_chains=4, n_cycles=3, f_max_min=64, exchange_every=1,
        sample_param=True, seed=9, progress=False,
        checkpoint_path=ckpt, resume=True)
    for f in full._fields:
        np.testing.assert_array_equal(np.asarray(getattr(full, f)),
                                      np.asarray(getattr(res, f)),
                                      err_msg=f"field {f}")
    assert res_ll == full_ll
    np.testing.assert_allclose(m_res["best"], m_full["best"])


def test_scale_sharded_nuisance_scorer_agrees():
    """On the 8-virtual-device rig ScaleRunner.scorer() routes through the
    rows-sharded psum anchor; it must agree with the local vmapped sparse
    evaluation (round-4 review item 7)."""
    params = scale_params()
    state, table = make_scale_genome(300, 3, seed=51)
    sobs = simulate_sparse_contacts(state, table, params, seed=51)
    runner = ScaleRunner(table, sobs, params)
    assert len(jax.devices()) == 8
    sharded = runner.scorer()
    local_fn = jax.jit(sparse.make_sparse_loglik(table, sobs, runner.w))
    shuf = shuffle_genome(state, 6, seed=52)
    batch = jax.tree.map(
        lambda a, b: jnp.stack([jnp.asarray(a), jnp.asarray(b)]),
        state, shuf)
    got = np.asarray(sharded(batch, params))
    want = np.asarray([float(local_fn(state, params)),
                       float(local_fn(shuf, params))])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.5)
