"""Pallas likelihood kernel vs the jnp reference implementation.

Runs in interpreter mode on CPU (the compiled path is exercised on the TPU
by bench.py and __graft_entry__).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import likelihood, mcmc, ops
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.utils.synthetic import default_params, make_genome, simulate_contacts


@pytest.fixture(scope="module")
def problem():
    state, table = make_genome(n_bins=40, n_contigs=4, subs_per_bin=3, seed=3)
    params = default_params(fact=5000.0)
    obs = simulate_contacts(state, table, params, seed=3)
    return state, table, params, obs


def make_scorer(table, obs):
    from graal_tpu.ops import likelihood_pallas as lp

    return lp.make_pallas_scorer(table, obs, interpret=True)


def test_matches_jnp_reference(problem):
    state, table, params, obs = problem
    scorer = make_scorer(table, obs)
    batch = GenomeState(*[jnp.stack([x]) for x in state])
    got = float(scorer(batch, params)[0])
    want = float(likelihood.log_likelihood(state, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_matches_on_mutated_and_flipped(problem):
    state, table, params, obs = problem
    scorer = make_scorer(table, obs)
    variants = [
        mcmc.explode_genome(state),
        ops.flip(state, 7),
        ops.pop_out(state, 11, int(np.max(np.asarray(state.id_c)))),
        ops.paste(ops.split(state, 20, 1, 50), 3, 30, 99),
    ]
    batch = GenomeState(*[jnp.stack([getattr(v, f) for v in variants])
                          for f in state._fields])
    got = np.asarray(scorer(batch, params))
    for i, v in enumerate(variants):
        want = float(likelihood.log_likelihood(v, table, obs, params))
        np.testing.assert_allclose(got[i], want, rtol=5e-4,
                                   err_msg=f"variant {i}")


def test_matches_with_circular_contig(problem):
    state, table, params, obs = problem
    # circularise contig 0 (paste its two ends)
    s = state.to_numpy()
    members = np.nonzero(s["id_c"] == 0)[0]
    head = members[np.argsort(s["pos"][members])][0]
    tail = members[np.argsort(s["pos"][members])][-1]
    circ = ops.paste(state, int(head), int(tail),
                     int(np.max(np.asarray(state.id_c))))
    assert int(np.asarray(circ.circ)[head]) == 1
    scorer = make_scorer(table, obs)
    batch = GenomeState(*[jnp.stack([x]) for x in circ])
    got = float(scorer(batch, params)[0])
    want = float(likelihood.log_likelihood(circ, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_obs_constant_matches_reference_branches():
    from graal_tpu.ops.likelihood_pallas import obs_constant
    from graal_tpu.core.model import poisson_loglik

    rng = np.random.default_rng(0)
    obs = rng.poisson(8.0, (30, 30)).astype(np.float64)
    obs[0, 1] = 20.0   # exercise the Stirling expansion branch
    obs[0, 2] = 12.0   # exercise the Stirling factorial branch
    obs = np.triu(obs, 1) + np.triu(obs, 1).T
    const = obs_constant(obs)
    # logpmf(ex=1, ob) = ob*0 - 1 - log(ob!) -> log(ob!) = -(pmf + 1)
    iu, ju = np.triu_indices(30, k=1)
    want = 0.0
    for s, t in zip(iu, ju):
        want += float(poisson_loglik(jnp.float32(1.0),
                                     jnp.float32(obs[s, t]))) + 1.0
    np.testing.assert_allclose(const, want, rtol=1e-4)
