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
        for i in range(N_CANDIDATES):
            if ov[i]:
                assert got[i] == -np.inf
            else:
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
    assert np.all(np.asarray(dll)[ov] == -np.inf)


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
