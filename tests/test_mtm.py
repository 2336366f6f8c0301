"""MTM / MH sampler tests on synthetic ground-truth data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import mtm, mcmc, likelihood
from graal_tpu.core.state import GenomeState, check_invariants
from tests.test_mcmc import make_problem


@pytest.fixture(scope="module")
def problem():
    return make_problem(seed=2, n=16)


def make_jump(problem, delta=4):
    state, table, params, obs = problem
    n = state.n_frags
    return mtm.build_jump_table(obs, np.ones(n), np.arange(n), n, delta)


def test_jump_table_picks_strong_partners(problem):
    state, table, params, obs = problem
    jump = make_jump(problem)
    # for a mid-chain fragment, the adjacent fragments have the most
    # contacts and must appear among its partners
    partners = set(np.asarray(jump.frags[5]).tolist())
    assert partners & {4, 6}


@pytest.mark.parametrize("variant", ["mtm", "mh"])
def test_cycle_refines_perturbed_genome(problem, variant):
    """MTM/MH are refinement samplers: from a fully scrambled start the MTM
    ratio rejects everything (the backward candidate sum from an improved
    genome dominates — the reference behaves identically); from a genome a
    few mutations away from the truth they must accept moves and climb."""
    state, table, params, obs = problem
    n = state.n_frags
    jump = make_jump(problem)
    cycle = mtm.make_mtm_cycle(table, obs, jump, variant=variant)

    rng = np.random.default_rng(5)
    cur = state
    apply_jit = jax.jit(mcmc.apply_mutation)
    for _ in range(4):
        cur = apply_jit(cur, int(rng.integers(n)), int(rng.integers(n)),
                        int(rng.integers(13)))
    ll0 = float(likelihood.log_likelihood(cur, table, obs, params))
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    assert ll0 < ll_true

    l_t = jnp.float32(ll0)
    key = jax.random.key(1)
    total_accepts = 0
    for j in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        order = jax.random.permutation(k1, n)
        cur, l_t, (lls, accepts, ncs) = cycle(cur, k2, params, order, l_t,
                                              jnp.float32(1.0))
        total_accepts += int(np.sum(np.asarray(accepts)))
    check_invariants(cur)
    final = float(l_t)
    assert total_accepts >= 5, f"{variant}: only {total_accepts} accepts"
    assert final > ll0 + 0.3 * (ll_true - ll0), \
        f"{variant}: pert={ll0:.1f} final={final:.1f} true={ll_true:.1f}"
    # the tracked likelihood must match a fresh evaluation of the state
    fresh = float(likelihood.log_likelihood(cur, table, obs, params))
    np.testing.assert_allclose(final, fresh, rtol=1e-4)


def test_impossibility_mask(problem):
    state, table, params, obs = problem
    # fragment 5 is mid-chain: paste and translocs with it must be masked
    nb = jnp.asarray([5, 0, 7], jnp.int32)  # 0 = head, 7 = tail of contig 0
    mask = mtm._impossibility_mask(state, jnp.int32(3), nb)
    m = np.asarray(mask)
    assert m[0, 8] and m[0, 9] and m[0, 10]     # mid-chain fB: all masked
    # fA=3 is mid-chain too so paste masked everywhere
    assert m[1, 8] and m[2, 8]
    assert not m[1, 10] and not m[1, 12]        # fB=0 head: up-split ok
    assert not m[2, 9] and not m[2, 11]         # fB=7 tail: down-split ok


def test_prev_next_derivation(problem):
    state, table, params, obs = problem
    prev, nxt = mtm._prev_next(state, jnp.int32(3))
    assert int(prev) == 2 and int(nxt) == 4
    prev0, _ = mtm._prev_next(state, jnp.int32(0))
    assert int(prev0) == -1


@pytest.mark.slow
def test_mtm_step_with_scorer_matches_jnp(problem):
    """Scorer-threaded MTM forward/backward passes agree with the jnp path."""
    state, table, params, obs = problem
    from graal_tpu.ops.likelihood_pallas import make_pallas_scorer

    jump = make_jump(problem)
    scorer = make_pallas_scorer(table, obs, interpret=True)
    step_jnp = jax.jit(mtm.make_mtm_step(table, obs, jump))
    step_fast = jax.jit(mtm.make_mtm_step(table, obs, jump, scorer=scorer))
    l_t = jnp.float32(likelihood.log_likelihood(state, table, obs, params))
    key = jax.random.key(3)
    for f_a in (1, 5, 9):
        key, sub = jax.random.split(key)
        s_a, l_a, acc_a, nc_a = step_jnp(state, sub, params, l_t,
                                         jnp.int32(f_a), jnp.float32(1.0))
        s_b, l_b, acc_b, nc_b = step_fast(state, sub, params, l_t,
                                          jnp.int32(f_a), jnp.float32(1.0))
        assert bool(acc_a) == bool(acc_b)
        np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-4)
        for a, b in zip(s_a, s_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("variant", ["mtm", "mh"])
def test_corrected_variants_refine(problem, variant):
    """The corrected MTM/MH variants (canonical backward set / MH ratio)
    must also accept moves and climb from a lightly perturbed genome."""
    state, table, params, obs = problem
    n = state.n_frags
    jump = make_jump(problem)
    cycle = mtm.make_mtm_cycle(table, obs, jump, variant=variant,
                               corrected=True)
    rng = np.random.default_rng(7)
    cur = state
    for _ in range(3):
        fa, fb = int(rng.integers(n)), int(rng.integers(n))
        cur = jax.jit(mcmc.apply_mutation)(cur, fa, fb, 0)
    l0 = float(likelihood.log_likelihood(cur, table, obs, params))
    l_true = float(likelihood.log_likelihood(state, table, obs, params))
    l_t = jnp.float32(l0)
    key = jax.random.key(5)
    for j in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        order = jax.random.permutation(k1, n)
        cur, l_t, (lls, accepts, ncs) = cycle(cur, k2, params, order, l_t,
                                              jnp.float32(1.0))
    check_invariants(cur)
    # MTM/MH are conservative refiners; require clear improvement
    assert float(l_t) > l0 + 0.15 * (l_true - l0), (l0, float(l_t), l_true)


@pytest.mark.slow
def test_delta_mh_catalogue_matches_full_difference():
    """The delta scorer with the MH catalogue must reproduce the full
    likelihood difference of mh_candidates for every (neighbour, op)."""
    import numpy as np
    from graal_tpu.core import delta as dm
    from graal_tpu.core import sparse
    from graal_tpu.core.candidates import mh_candidates
    from graal_tpu.core.likelihood import log_likelihood

    state, table, params, obs = make_problem(seed=3, n=24)
    sobs = sparse.sparse_from_dense(obs)
    dsc = dm.make_delta_scorer(table, None, f_max=32, sobs=sobs,
                               catalogue=mh_candidates)
    obs_j = jnp.asarray(obs, jnp.float32)
    base = float(log_likelihood(state, table, obs_j, params))
    for f_a, f_b in ((3, 4), (7, 15), (0, 23)):
        dll, _, _, _, over = jax.jit(
            lambda s, a, b: dsc(s, a, b, params, jnp.max(s.id_c)))(
            state, jnp.int32(f_a), jnp.int32(f_b))
        assert not bool(over)
        cands = mh_candidates(state, f_a, f_b)
        want = np.array([
            float(log_likelihood(jax.tree.map(lambda x: x[i], cands),
                                 table, obs_j, params)) - base
            for i in range(13)])
        np.testing.assert_allclose(np.asarray(dll), want, atol=2e-2,
                                   err_msg=f"f_a={f_a} f_b={f_b}")


@pytest.mark.slow
def test_scale_mtm_refines():
    """Delta-scored MTM at scale: refinement from a perturbed genome
    improves the likelihood, keeps invariants, and the carried anchor
    matches a full re-anchor."""
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)
    from graal_tpu.core.state import check_invariants

    params = scale_params()
    state, table = make_scale_genome(240, 4, seed=13)
    sobs = simulate_sparse_contacts(state, table, params, seed=13)
    runner = ScaleRunner(table, sobs, params)
    pert = shuffle_genome(state, 8, seed=14)
    ll0 = float(runner.anchor_fn()(pert, params))
    final, l_t, m = runner.run_mtm(pert, n_cycles=2, f_max_min=64,
                                   seed=5, progress=False)
    check_invariants(final)
    assert l_t > ll0
    assert 0.0 <= m["accept_rate"][-1] <= 1.0
    # carried likelihood is re-anchored: metric equals a fresh evaluation
    assert abs(l_t - float(runner.anchor_fn()(final, params))) < 1e-3


@pytest.mark.slow
def test_scale_mh_refines():
    """Delta-scored plain MH at scale (variant='mh')."""
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)
    from graal_tpu.core.state import check_invariants

    params = scale_params()
    state, table = make_scale_genome(240, 4, seed=17)
    sobs = simulate_sparse_contacts(state, table, params, seed=17)
    runner = ScaleRunner(table, sobs, params)
    pert = shuffle_genome(state, 8, seed=18)
    ll0 = float(runner.anchor_fn()(pert, params))
    final, l_t, m = runner.run_mtm(pert, n_cycles=2, f_max_min=64,
                                   seed=5, variant="mh", progress=False)
    check_invariants(final)
    assert l_t > ll0
    assert abs(l_t - float(runner.anchor_fn()(final, params))) < 1e-3


@pytest.mark.parametrize("variant", ["mtm", "mh"])
@pytest.mark.slow
def test_scale_mtm_with_repeats(variant):
    """Repeat-carrying genomes MTM/MH-refine at chr1 scale (round-2 gap:
    the delta samplers asserted repeat-free tables)."""
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (add_scale_repeats,
                                                  make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)
    from graal_tpu.core.state import check_invariants

    params = scale_params()
    base, base_table = make_scale_genome(200, 4, seed=61)
    sobs = simulate_sparse_contacts(base, base_table, params, seed=61)
    state, table, id_d = add_scale_repeats(base, base_table, (9, 55, 140))
    assert table.has_repeats
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    pert = shuffle_genome(state, 8, seed=62)
    ll0 = float(runner.anchor_fn()(pert, params))
    final, l_t, m = runner.run_mtm(pert, n_cycles=2, f_max_min=64,
                                   seed=5, variant=variant, progress=False)
    check_invariants(final)
    assert l_t > ll0
    assert abs(l_t - float(runner.anchor_fn()(final, params))) < 1e-2
