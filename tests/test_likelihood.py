"""Dense likelihood vs the literal reference-iteration oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from graal_tpu.core import likelihood, ops
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable, build_sub_frag_table, trivial_table
from tests.conftest import make_random_state


def make_params():
    return RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0, fact=50.0,
                              d_max=600.0, v_inter=0.1)


def make_subdivided_table(rng, n_bins, len_bp):
    """Random 1-3 sub-fragments per bin whose lengths sum to len_bp."""
    sub_ids = np.zeros((n_bins, 4), np.int64)
    sub_len = np.zeros((n_bins, 3))
    sub_acc = np.zeros((n_bins, 3))
    nxt = 0
    for b in range(n_bins):
        w = int(rng.integers(1, 4))
        sub_ids[b, 3] = w
        cuts = np.sort(rng.random(w - 1))
        parts = np.diff(np.concatenate([[0.0], cuts, [1.0]])) * len_bp[b] / 1000.0
        for slot in range(w):
            sub_ids[b, slot] = nxt
            sub_len[b, slot] = parts[slot]
            sub_acc[b, slot] = float(rng.integers(1, 4))
            nxt += 1
    return build_sub_frag_table(sub_ids, sub_len, sub_acc, np.arange(n_bins))


def random_obs(rng, s_dim):
    obs = rng.poisson(3.0, (s_dim, s_dim)).astype(np.float64)
    obs = obs + obs.T
    np.fill_diagonal(obs, 0.0)
    return obs


@pytest.mark.parametrize("with_circ", [False, True])
def test_dense_matches_reference_oracle(rng, with_circ):
    state = make_random_state(rng, n_frags=10, n_contigs=3, with_circ=with_circ)
    # flip a few fragments so orientation paths are exercised
    for f in [1, 4, 7]:
        state = ops.flip(state, f)
    table = make_subdivided_table(rng, 10, np.asarray(state.len_bp))
    obs = random_obs(rng, table.n_data_sub)
    params = make_params()

    got = float(likelihood.log_likelihood(state, table, jnp.asarray(obs, jnp.float32), params))
    want = likelihood.log_likelihood_ref(state, table, obs, params)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_trivial_table_matches_oracle(rng):
    state = make_random_state(rng, n_frags=12, n_contigs=4)
    table = trivial_table(np.asarray(state.len_bp))
    obs = random_obs(rng, 12)
    params = make_params()
    got = float(likelihood.log_likelihood(state, table, jnp.asarray(obs, jnp.float32), params))
    want = likelihood.log_likelihood_ref(state, table, obs, params)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_inactive_fragment_goes_trans(rng):
    """Deactivated copies must contribute nothing."""
    state = make_random_state(rng, n_frags=8, n_contigs=2)
    table = trivial_table(np.asarray(state.len_bp))
    obs = random_obs(rng, 8)
    params = make_params()
    deact = state._replace(activ=state.activ.at[3].set(0),
                           rep=state.rep.at[3].set(1))
    got = float(likelihood.log_likelihood(deact, table, jnp.asarray(obs, jnp.float32), params))
    want = likelihood.log_likelihood_ref(deact, table, obs, params)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_repeat_copies_accumulate(rng):
    """Two active copies of a bin double that bin's expected contribution."""
    n_bins = 5
    len_bp = np.full(n_bins, 4000)
    # copy-frags: 5 bins + 1 extra copy of bin 2
    id_d = np.array([0, 1, 2, 3, 4, 2])
    sub_ids = np.zeros((n_bins, 4), np.int64)
    sub_ids[:, 0] = np.arange(n_bins)
    sub_ids[:, 3] = 1
    sub_len = np.zeros((n_bins, 3)); sub_len[:, 0] = 4.0
    sub_acc = np.zeros((n_bins, 3)); sub_acc[:, 0] = 1.0
    table = build_sub_frag_table(sub_ids, sub_len, sub_acc, id_d)
    assert table.has_repeats and table.n_subs == 6

    # all six copy-frags as singleton contigs -> all-trans expectation
    n = 6
    state = GenomeState.from_soa(dict(
        pos=np.zeros(n), id_c=np.arange(n), start_bp=np.zeros(n),
        len_bp=np.full(n, 4000), circ=np.zeros(n), l_cont=np.ones(n),
        l_cont_bp=np.full(n, 4000), ori=np.ones(n),
        rep=np.array([0, 0, 1, 0, 0, 1]), activ=np.ones(n), id_d=id_d))
    params = make_params()
    e = np.asarray(likelihood.expected_data_matrix(state, table, params))
    v = float(params.v_inter)
    # bin2 row vs other bins: two copies -> 2*v_inter
    np.testing.assert_allclose(e[2, 0], 2 * v, rtol=1e-5)
    np.testing.assert_allclose(e[0, 1], v, rtol=1e-5)
    # bin2 vs itself: all 4 ordered copy pairs accumulate (same-copy pairs
    # clamp rippe(0) to v_inter); the diagonal cell is excluded from the
    # likelihood by the s < t mask anyway.
    np.testing.assert_allclose(e[2, 2], 4 * v, rtol=1e-5)

    obs = random_obs(rng, n_bins)
    got = float(likelihood.log_likelihood(state, table, jnp.asarray(obs, jnp.float32), params))
    want = likelihood.log_likelihood_ref(state, table, obs, params)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_likelihood_prefers_true_adjacency(rng):
    """The model must score the coherent genome above a scrambled one when
    the observed matrix is generated from the coherent genome."""
    n = 16
    len_bp = np.full(n, 5000)
    state = GenomeState.from_soa(dict(
        pos=np.arange(n), id_c=np.zeros(n), start_bp=np.arange(n) * 5000,
        len_bp=len_bp, circ=np.zeros(n), l_cont=np.full(n, n),
        l_cont_bp=np.full(n, n * 5000), ori=np.ones(n), rep=np.zeros(n),
        activ=np.ones(n), id_d=np.arange(n)))
    table = trivial_table(len_bp)
    # strong cis signal: expected contacts well above the v_inter floor
    params = RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0,
                                fact=600.0, d_max=900.0, v_inter=0.01)
    e = np.asarray(likelihood.expected_data_matrix(state, table, params))
    obs = rng.poisson(np.maximum(e, 1e-9)).astype(np.float64)
    obs = np.triu(obs, 1) + np.triu(obs, 1).T
    obs_j = jnp.asarray(obs, jnp.float32)

    ll_true = float(likelihood.log_likelihood(state, table, obs_j, params))
    # scrambled: every fragment its own contig
    scr = state._replace(pos=jnp.zeros(n, jnp.int32),
                         id_c=jnp.arange(n, dtype=jnp.int32),
                         start_bp=jnp.zeros(n, jnp.int32),
                         l_cont=jnp.ones(n, jnp.int32),
                         l_cont_bp=state.len_bp)
    ll_scr = float(likelihood.log_likelihood(scr, table, obs_j, params))
    assert ll_true > ll_scr


def test_f32_drift_at_tricho_scale():
    """Quantify (not just argue) the f32 accumulation error at K=3000,
    |L| ~ 1e7 — round-1 review item: the f32 row-sum scheme's drift vs an
    exact f64 evaluation must stay well inside the ~1-unit score
    resolution that candidate selection operates on (THRESH_OVERFLOW=30)."""
    import math

    from graal_tpu.utils.synthetic import (_expected_matrix_host,
                                           default_params, make_genome,
                                           simulate_contacts)

    state, table = make_genome(n_bins=1000, n_contigs=7, subs_per_bin=3,
                               seed=13)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=13)

    # vectorised f64 oracle (reference pmf branch structure)
    e = _expected_matrix_host(state, table, params)
    k = e.shape[0]
    iu, ju = np.triu_indices(k, 1)
    ex = e[iu, ju].astype(np.float64)
    ob = np.asarray(obs, np.float64)[iu, ju]
    log_ex = np.log(np.where(ex > 0, ex, 1.0))
    big = ob >= 15
    logfact = np.zeros_like(ob)
    logfact[big] = (ob[big] * np.log(ob[big]) - ob[big]
                    + np.log(np.sqrt(ob[big] * 2 * np.pi)))
    mid = (ob >= 10) & ~big
    nn = np.floor(ob[mid])
    logfact[mid] = nn * np.log(nn) - nn + 0.5 * np.log(2 * np.pi * nn)
    small = (ob > 0) & (ob < 10)
    logfact[small] = [math.lgamma(math.floor(x) + 1) for x in ob[small]]
    terms = np.where(ob > 0, ob * log_ex - ex - logfact, -ex)
    want = float(np.sum(np.where(ex > 0, terms, 0.0)))

    got = float(likelihood.log_likelihood(state, table, obs, params))
    drift = abs(got - want)
    # measured in round 2: ~0.5 at |L| ~ 6e6 (3.4e3 subs); bound with margin
    assert drift < 5.0, f"f32 drift {drift:.3f} vs f64 {want:.1f}"
    assert abs(want) > 1e6   # the regime the bound is about
