"""Delta scoring vs full scoring — the reference's own oracle pattern
(debug_step_max_likelihood recomputes every candidate with the full kernel,
cuda_lib_gl.py:2109-2292)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import delta, likelihood, mcmc
from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.state import GenomeState
from graal_tpu.utils.synthetic import default_params, make_genome, simulate_contacts


@pytest.fixture(scope="module")
def problem():
    state, table = make_genome(n_bins=36, n_contigs=6, subs_per_bin=3, seed=4)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=4)
    return state, table, params, obs


def full_scores(cands_flat, table, obs, params):
    return jax.vmap(
        lambda c: likelihood.log_likelihood(c, table, obs, params))(cands_flat)


def test_delta_matches_full_difference(problem):
    state, table, params, obs = problem
    dscore = delta.make_delta_scorer(table, obs, r_max=64)
    l0 = float(likelihood.log_likelihood(state, table, obs, params))

    rng = np.random.default_rng(0)
    n = state.n_frags
    for trial in range(4):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        cands = build_candidates(state, f_a, f_b)
        dll, overflow = dscore(state, cands, params)
        want = np.asarray(full_scores(cands, table, obs, params)) - l0
        got = np.asarray(dll)
        ov = np.asarray(overflow)
        # sentinel scores are finite — exclusion happens via the mask only
        assert np.all(np.isfinite(got))
        for i in range(N_CANDIDATES):
            if not ov[i]:
                np.testing.assert_allclose(got[i], want[i], rtol=1e-3,
                                           atol=0.3,
                                           err_msg=f"trial {trial} cand {i}")


def test_overflow_marks_oversized_changes(problem):
    state, table, params, obs = problem
    # r_max too small for any contig-touching mutation
    dscore = delta.make_delta_scorer(table, obs, r_max=4)
    cands = build_candidates(state, 3, 20)
    dll, overflow = dscore(state, cands, params)
    ov = np.asarray(overflow)
    assert ov.any()
    assert np.all(np.isfinite(np.asarray(dll)))


def test_overflow_cannot_poison_selection():
    """An overflowing slot must not drag score_min to -inf / NaN the filter
    (round-1 advisor finding): with slot_valid masking, selection must pick
    only non-overflow slots, and with *every* slot overflowing the step must
    be a no-op."""
    m, n_ops = 3, N_CANDIDATES
    key = jax.random.key(0)
    score = jnp.zeros((m, n_ops))
    score = score.at[1, 5].set(10.0)          # the only good real slot
    valid = jnp.ones((m,), bool)
    slot_ok = jnp.zeros((m, n_ops), bool).at[1, 5].set(True)
    for trial in range(5):
        key, sub = jax.random.split(key)
        sel = int(mcmc.select_score_slot(sub, score, valid, jnp.float32(1.0),
                                         slot_valid=slot_ok))
        assert sel == 1 * N_CANDIDATES + 5

    # every-slot-overflow -> delta step no-op fallback
    state, table = make_genome(n_bins=12, n_contigs=3, subs_per_bin=3, seed=7)
    params = default_params(fact=2000.0)
    obs = simulate_contacts(state, table, params, seed=7)
    import graal_tpu.core.mcmc as mcmc_mod
    from graal_tpu.utils.synthetic import bin_level_matrix
    bins = bin_level_matrix(np.asarray(obs), table)
    nb = mcmc_mod.build_neighbour_table(bins, np.arange(12), 12)
    step = delta.make_delta_em_step(table, obs, nb, delta=2, r_max=2)
    l_t = jnp.float32(-100.0)
    new_state, l_new, (op, fb, n_over) = jax.jit(step)(
        state, jax.random.key(1), params, l_t, jnp.int32(0), jnp.float32(1.0))
    assert int(n_over) > 0
    if int(op) == -1:   # all slots overflowed -> untouched state, same l_t
        np.testing.assert_array_equal(np.asarray(new_state.id_c),
                                      np.asarray(state.id_c))
        assert float(l_new) == float(l_t)


def test_delta_cycle_assembles(problem):
    """Delta-scored EM assembles a scrambled genome like the full-scored
    cycle (exploded start: tiny contigs, small change sets)."""
    state, table, params, obs = problem
    n = state.n_frags
    from graal_tpu.utils.synthetic import bin_level_matrix
    bins = bin_level_matrix(obs, table)
    nb = mcmc.build_neighbour_table(bins, np.arange(n), n)
    cycle = delta.make_delta_em_cycle(table, obs, nb, delta=4, r_max=64)

    scrambled = mcmc.explode_genome(state)
    ll0 = float(likelihood.log_likelihood(scrambled, table, obs, params))
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    cur, l_t = scrambled, jnp.float32(ll0)
    key = jax.random.key(2)
    total_overflow = 0
    for j in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        order = jax.random.permutation(k1, n)
        cur, l_t, (lls, ops_, fbs, overs, ncs) = cycle(
            cur, k2, params, order, l_t, jnp.float32(1.0))
        total_overflow += int(np.sum(np.asarray(overs)))
    final = float(l_t)
    assert final > ll0 + 0.7 * (ll_true - ll0), \
        f"scr={ll0:.1f} final={final:.1f} true={ll_true:.1f}"
    # anchored likelihood must equal a fresh full evaluation
    fresh = float(likelihood.log_likelihood(cur, table, obs, params))
    np.testing.assert_allclose(final, fresh, rtol=1e-4)
