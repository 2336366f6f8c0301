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


def _repeat_problem(seed=9, n_bins=30, dup_bins=(3, 11), n_dup=1):
    """Genome with duplicated repeat copies (modify_vect_frags semantics,
    simulation_loader.py:182-256)."""
    from graal_tpu.pipeline import extend_with_repeats
    from graal_tpu.core.subfrags import build_sub_frag_table
    from graal_tpu.utils.synthetic import default_params

    state, table = make_genome(n_bins=n_bins, n_contigs=3, subs_per_bin=2,
                               seed=seed)
    soa = {f: np.asarray(getattr(state, f)) for f in state._fields}
    soa["n_accu"] = np.ones(n_bins, np.int64)
    soa = extend_with_repeats(soa, [(b, n_dup) for b in dup_bins])
    state = GenomeState.from_soa(soa)

    # rebuild the table with the copy-expanded id_d
    sub_ids = np.zeros((n_bins, 4), np.int64)
    sub_len = np.zeros((n_bins, 3))
    sub_acc = np.zeros((n_bins, 3))
    k = 0
    lens = np.asarray(table.len_kb)
    for b in range(n_bins):
        sub_ids[b, 3] = 2
        for s in range(2):
            sub_ids[b, s] = k
            sub_len[b, s] = lens[k]
            sub_acc[b, s] = 1.0
            k += 1
    table = build_sub_frag_table(sub_ids, sub_len, sub_acc, soa["id_d"])
    assert table.has_repeats
    params = default_params(fact=5000.0)
    obs = simulate_contacts(state, table, params, seed=seed)
    return state, table, params, obs


def test_repeat_kernel_matches_jnp():
    """Copy-summing kernel == the jnp scatter path on a repeat problem,
    including deactivated copies and a moved copy."""
    from graal_tpu.ops.likelihood_pallas import make_repeat_pallas_scorer

    state, table, params, obs = _repeat_problem()
    scorer = make_repeat_pallas_scorer(table, obs, interpret=True)

    # variants: as-is; one copy deactivated; copies relocated (exploded)
    n = state.n_frags
    deact = state._replace(
        activ=jnp.asarray(np.where(np.arange(n) == n - 1, 0,
                                   np.asarray(state.activ)), jnp.int32))
    moved = mcmc.explode_genome(state)
    batch = GenomeState(*[jnp.stack([a, b, c]) for a, b, c in
                          zip(state, deact, moved)])
    got = np.asarray(scorer(batch, params))
    want = np.asarray([
        float(likelihood.log_likelihood(s, table, obs, params))
        for s in (state, deact, moved)])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=0.5)


def test_repeat_kernel_dispatch():
    """make_pallas_scorer transparently dispatches repeat tables."""
    from graal_tpu.ops import likelihood_pallas as lp

    state, table, params, obs = _repeat_problem(seed=10)
    scorer = lp.make_pallas_scorer(table, obs, interpret=True)
    batch = GenomeState(*[jnp.stack([x]) for x in state])
    got = float(scorer(batch, params)[0])
    want = float(likelihood.log_likelihood(state, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=0.5)
