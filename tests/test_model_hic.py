"""Broken-power-law alternative contact model tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from graal_tpu.core import model_hic
from graal_tpu.core.model_hic import HiCParams


def make_params(**kw):
    d = dict(d0=20.0, d1=300.0, alpha_0=-1.0, alpha_1=-1.5, alpha_2=-2.5,
             fact=100.0, d_max=800.0, v_inter=0.01)
    d.update(kw)
    return HiCParams.create(**d)


def test_continuity_at_breakpoints():
    p = make_params()
    eps = 1e-3
    for bp in (20.0, 300.0):
        lo = float(model_hic.hic_contacts(jnp.float32(bp - eps), p))
        hi = float(model_hic.hic_contacts(jnp.float32(bp + eps), p))
        assert abs(lo - hi) / lo < 1e-3, f"discontinuity at {bp}"


def test_segments_match_host_peval():
    p = make_params()
    fit = [20.0, 300.0, -1.0, -1.5, -2.5, 100.0]
    s = np.array([5.0, 100.0, 500.0], np.float32)
    want = model_hic.peval(s, fit)
    got = np.asarray(model_hic.hic_contacts(s, p))
    np.testing.assert_allclose(got, np.maximum(want, 0.01), rtol=1e-4)


def test_out_of_range_clamps():
    p = make_params()
    s = np.array([0.0, -1.0, 900.0], np.float32)
    np.testing.assert_allclose(np.asarray(model_hic.hic_contacts(s, p)),
                               0.01, rtol=1e-6)


def test_fit_recovers_curve():
    true = [25.0, 250.0, -0.8, -1.4, -2.2, 150.0]
    bins = np.arange(3.0, 600.0, 3.0)
    y = model_hic.peval(bins, true)
    fit, y_est = model_hic.estimate_param_hic(y, bins)
    got = model_hic.peval(bins, fit)
    np.testing.assert_allclose(got, y, rtol=0.08)


def test_max_dist_crossover():
    p = [20.0, 300.0, -1.0, -1.5, -2.5, 100.0]
    v = 0.05
    d_max = model_hic.estimate_max_dist_intra(p, v)
    np.testing.assert_allclose(model_hic.peval(d_max, p), v, rtol=1e-3)


def test_em_assembles_under_hic_model():
    """EM with the broken-power-law scorer recovers a genome whose contacts
    were generated from that model."""
    import jax
    from graal_tpu.core import mcmc
    from graal_tpu.core.state import GenomeState, check_invariants
    from graal_tpu.core.subfrags import trivial_table
    from tests.test_mcmc import true_genome

    n = 16
    state = true_genome(n, len_bp=3000)
    table = trivial_table(np.asarray(state.len_bp))
    params = make_params(fact=3000.0, d_max=900.0, v_inter=0.1)
    rng = np.random.default_rng(0)
    mid = np.asarray(state.start_bp) / 1000.0 + np.asarray(state.len_bp) / 2000.0
    s = np.abs(mid[:, None] - mid[None, :])
    same = np.asarray(state.id_c)[:, None] == np.asarray(state.id_c)[None, :]
    e = np.where(same, np.asarray(model_hic.hic_contacts(s.astype(np.float32),
                                                         params)), 0.1)
    obs = rng.poisson(np.maximum(np.triu(e, 1), 0)).astype(np.float32)
    obs = obs + obs.T

    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    scorer = model_hic.make_hic_scorer(table, obs)
    cycle = mcmc.make_em_cycle(table, obs, nb, delta=4, sample_param=False,
                               scorer=scorer)
    cur = mcmc.explode_genome(state)
    ll0 = float(model_hic.log_likelihood_hic(cur, table, obs, params))
    ll_true = float(model_hic.log_likelihood_hic(state, table, obs, params))
    l_t = jnp.float32(ll0)
    key = jax.random.key(0)
    for j in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        order = jax.random.permutation(k1, n)
        cur, _, l_t, m = cycle(cur, k2, params, order, l_t, jnp.float32(1.0))
    check_invariants(cur)
    assert float(l_t) > ll0 + 0.8 * (ll_true - ll0)
