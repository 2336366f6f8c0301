"""Repeat-aware delta scoring vs the full dense likelihood.

Same oracle pattern as test_delta.py (debug_step_max_likelihood,
cuda_lib_gl.py:2109-2292): every candidate's dll must equal the full
log-likelihood difference, here on copy-expanded tables where observed
expectations sum over repeat copies (kernels3.cu:2895-2929).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import delta, delta_repeats, likelihood, sparse
from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.core.subfrags import build_sub_frag_table
from graal_tpu.utils.synthetic import (default_params, make_genome,
                                       simulate_contacts)


def _repeat_problem(seed=9, n_bins=30, dup_bins=(3, 11), n_dup=1,
                    deactivate=()):
    """Genome with duplicated repeat copies (modify_vect_frags semantics,
    simulation_loader.py:182-256)."""
    from graal_tpu.pipeline import extend_with_repeats

    state, table = make_genome(n_bins=n_bins, n_contigs=3, subs_per_bin=2,
                               seed=seed)
    soa = {f: np.asarray(getattr(state, f)) for f in state._fields}
    soa["n_accu"] = np.ones(n_bins, np.int64)
    soa = extend_with_repeats(soa, [(b, n_dup) for b in dup_bins])
    for f in deactivate:
        soa["activ"][f] = 0
    state = GenomeState.from_soa(soa)

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


@pytest.fixture(scope="module")
def problem():
    return _repeat_problem()


def full_scores(cands_flat, table, obs, params):
    return jax.vmap(
        lambda c: likelihood.log_likelihood(c, table, obs, params))(cands_flat)


def _check_trials(state, table, params, obs, pairs, f_max=24, atol=0.35,
                  impl="v1"):
    sobs = sparse.sparse_from_dense(obs)
    make = delta_repeats.make_repeat_delta_scorer if impl == "v1" \
        else delta_repeats.make_repeat_delta_scorer_v2
    dscore = jax.jit(make(table, f_max, sobs))
    l0 = float(likelihood.log_likelihood(state, table, obs, params))
    max_id = jnp.max(state.id_c)
    for f_a, f_b in pairs:
        dll, minis, rows, valid, overflow = dscore(
            state, jnp.int32(f_a), jnp.int32(f_b), params, max_id)
        assert not bool(overflow), (f_a, f_b)
        cands = build_candidates(state, f_a, f_b)
        want = np.asarray(full_scores(cands, table, obs, params)) - l0
        np.testing.assert_allclose(np.asarray(dll), want, rtol=1e-3,
                                   atol=atol, err_msg=f"fa={f_a} fb={f_b}")


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_repeat_delta_matches_full_difference(problem, impl):
    state, table, params, obs = problem
    n = state.n_frags
    rng = np.random.default_rng(0)
    pairs = [(int(rng.integers(n)), int(rng.integers(n))) for _ in range(3)]
    _check_trials(state, table, params, obs, pairs, impl=impl)


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_repeat_delta_on_repeat_copy(problem, impl):
    """f_a = a repeat copy: swap_activity (op 8) is non-trivial, and the
    copy-summed expectations must include the copy's original bin."""
    state, table, params, obs = problem
    rep = np.nonzero(np.asarray(state.rep) == 1)[0]
    n = state.n_frags
    pairs = [(int(rep[-1]), 5), (int(rep[0]), int(rep[-1])), (3, 8)]
    _check_trials(state, table, params, obs, pairs, impl=impl)


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_repeat_delta_with_inactive_copy(impl):
    """A deactivated copy in the BASE state: reactivation via swap_activity
    and all geometry moves must still match the full difference."""
    state, table, params, obs = _repeat_problem(seed=12, deactivate=(30,))
    rep = np.nonzero(np.asarray(state.rep) == 1)[0]
    pairs = [(30, 4), (int(rep[0]), 30), (7, 19)]
    _check_trials(state, table, params, obs, pairs, impl=impl)


@pytest.mark.parametrize("impl", ["v1", "v2"])
def test_repeat_delta_on_circular_contig(problem, impl):
    state, table, params, obs = problem
    in0 = np.asarray(state.id_c) == 0
    circ = np.asarray(state.circ).copy()
    circ[in0] = 1
    state_c = state._replace(circ=jnp.asarray(circ, jnp.int32))
    f_a = int(np.nonzero(in0)[0][1])
    f_b = int(np.nonzero(~in0)[0][0])
    _check_trials(state_c, table, params, obs, [(f_a, f_b)], impl=impl)


def test_repeat_delta_step_routing(problem):
    """make_delta_em_step transparently routes repeat tables; the carried
    likelihood after a scan of steps matches a fresh full evaluation."""
    from graal_tpu.core import mcmc

    state, table, params, obs = problem
    n = state.n_frags
    n_bins = table.n_data_sub // 2
    bin_mat = np.zeros((n_bins, n_bins), np.float64)
    obs_np = np.asarray(obs)
    for b1 in range(n_bins):
        for b2 in range(n_bins):
            bin_mat[b1, b2] = obs_np[2 * b1:2 * b1 + 2,
                                     2 * b2:2 * b2 + 2].sum()
    id_d = np.asarray(state.id_d)
    full_bin = bin_mat[np.ix_(id_d, id_d)]
    nb = mcmc.build_neighbour_table(full_bin, id_d, n)

    cycle = delta.make_delta_em_cycle(table, obs, nb, delta=4, f_max=24)
    l0 = likelihood.log_likelihood(state, table, obs, params)
    key = jax.random.key(1)
    order = jax.random.permutation(key, n)[:12]
    st, l_anchor, (lls, ops_, fbs, overs, ncs) = cycle(
        state, key, params, order, l0, jnp.float32(1.0))
    check_invariants(st)
    # carried l_t (last scan slot) vs the full anchor on the final state
    np.testing.assert_allclose(float(lls[-1]), float(l_anchor),
                               rtol=1e-4, atol=0.5)


def test_repeat_delta_mh_catalogue_matches_full_difference(problem):
    """The MH candidate catalogue through the repeat-aware delta engine:
    dll must equal the full copy-summed likelihood difference (lifts the
    round-2 repeat-free restriction of the delta MTM/MH samplers)."""
    from graal_tpu.core.candidates import mh_candidates

    state, table, params, obs = problem
    sobs = sparse.sparse_from_dense(obs)
    dscore = jax.jit(delta_repeats.make_repeat_delta_scorer(
        table, 24, sobs, catalogue=mh_candidates))
    l0 = float(likelihood.log_likelihood(state, table, obs, params))
    max_id = jnp.max(state.id_c)
    rep = int(np.nonzero(np.asarray(state.rep) == 1)[0][0])
    n = state.n_frags
    for f_a, f_b in ((3, 11), (rep, 5), (0, n - 1)):
        dll, minis, rows, valid, overflow = dscore(
            state, jnp.int32(f_a), jnp.int32(f_b), params, max_id)
        assert not bool(overflow), (f_a, f_b)
        cands = mh_candidates(state, f_a, f_b)
        want = np.asarray(full_scores(cands, table, obs, params)) - l0
        np.testing.assert_allclose(np.asarray(dll), want, rtol=1e-3,
                                   atol=0.35, err_msg=f"fa={f_a} fb={f_b}")
