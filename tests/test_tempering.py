"""Parallel-tempered multi-chain assembly tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import mcmc, likelihood
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.parallel import make_mesh
from graal_tpu.parallel.tempering import (exchange_best, run_tempered,
                                          temperature_ladder)
from tests.test_mcmc import make_problem


@pytest.fixture(scope="module")
def problem():
    return make_problem(seed=4, n=16)


def test_ladder_shape():
    l = temperature_ladder(4, 1.0, 8.0)
    assert l[0] == 1.0 and abs(l[-1] - 8.0) < 1e-5
    assert np.all(np.diff(l) > 0)
    assert temperature_ladder(1).tolist() == [1.0]


def test_exchange_best_broadcasts(problem):
    state, table, params, obs = problem
    scrambled = mcmc.explode_genome(state)
    states = GenomeState(*[
        jnp.stack([np.asarray(t) if c == 2 else np.asarray(s) for c in range(4)])
        for t, s in zip(state, scrambled)])
    l_ts = jnp.asarray([-100.0, -90.0, -10.0, -50.0])
    out, out_l = exchange_best(states, l_ts)
    assert np.allclose(np.asarray(out_l), -10.0)
    for f, x in zip(state._fields, out):
        for c in range(4):
            np.testing.assert_array_equal(np.asarray(x[c]),
                                          np.asarray(getattr(state, f)))


def test_tempered_run_single_device(problem):
    state, table, params, obs = problem
    n = state.n_frags
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    scrambled = mcmc.explode_genome(state)
    final, l_cold, trace = run_tempered(
        table, obs, nb, scrambled, params, n_chains=3, n_cycles=5,
        delta=4, exchange_every=2, progress=False)
    check_invariants(final)
    ll0 = float(likelihood.log_likelihood(scrambled, table, obs, params))
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    assert l_cold > ll0 + 0.7 * (ll_true - ll0)
    assert trace.shape == (5, 3)


def test_tempered_run_on_mesh(problem):
    state, table, params, obs = problem
    n = state.n_frags
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    mesh = make_mesh(n_chains=8, n_rows=1)
    scrambled = mcmc.explode_genome(state)
    final, l_cold, trace = run_tempered(
        table, obs, nb, scrambled, params, n_chains=8, n_cycles=3,
        delta=3, exchange_every=1, mesh=mesh, progress=False)
    check_invariants(final)
    assert np.isfinite(l_cold)
    assert trace.shape == (3, 8)
    # exchange makes all chains share the best likelihood at exchange points
    assert np.allclose(trace[-1], trace[-1][0])
