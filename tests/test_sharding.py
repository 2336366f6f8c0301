"""Multi-device tests on 8 simulated CPU devices (conftest sets the flag)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import mcmc, likelihood
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.core.subfrags import trivial_table
from graal_tpu.parallel import (make_mesh, sharded_log_likelihood,
                                make_sharded_em_step)
from tests.test_mcmc import make_problem, true_genome


@pytest.fixture(scope="module")
def problem():
    return make_problem(seed=1, n=16)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_ll_matches_single_device(problem):
    state, table, params, obs = problem
    mesh = make_mesh(n_chains=1, n_rows=8)
    ll_fn = sharded_log_likelihood(mesh, table, obs)
    got = float(ll_fn(state, params))
    want = float(likelihood.log_likelihood(state, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_ll_uneven_rows(problem):
    # 16 rows over 8 devices is even; test padding with a 5-frag genome
    state = true_genome(n=10, n_contigs=2, len_bp=3000)
    table = trivial_table(np.asarray(state.len_bp))
    params = RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0,
                                fact=5000.0, d_max=900.0, v_inter=0.1)
    rng = np.random.default_rng(0)
    obs = rng.poisson(2.0, (10, 10)).astype(np.float32)
    obs = np.triu(obs, 1) + np.triu(obs, 1).T
    mesh = make_mesh(n_chains=1, n_rows=8)
    got = float(sharded_log_likelihood(mesh, table, obs)(state, params))
    want = float(likelihood.log_likelihood(state, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_em_step_runs_and_improves(problem):
    state, table, params, obs = problem
    n = state.n_frags
    mesh = make_mesh(n_chains=2, n_rows=4)
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    step = make_sharded_em_step(mesh, table, obs, nb, delta=3)

    scrambled = mcmc.explode_genome(state)
    states = jax.tree.map(lambda x: jnp.stack([x, x]), (scrambled,))[0]
    states = GenomeState(*[jnp.stack([a, a]) for a in scrambled])
    keys = jax.random.split(jax.random.key(0), 2)
    f_as = jnp.asarray([3, 7], jnp.int32)
    new_states, scores = step(states, keys, params, f_as, jnp.float32(1.0))
    assert scores.shape == (2,)
    for c in range(2):
        chain = GenomeState(*[x[c] for x in new_states])
        check_invariants(chain)
    # chains with different keys/fragments should generally diverge
    ll0 = float(likelihood.log_likelihood(
        GenomeState(*[x[0] for x in new_states]), table, obs, params))
    np.testing.assert_allclose(ll0, float(scores[0]), rtol=1e-4)


def test_sharded_likelihood_with_repeats():
    """Row-sharded likelihood == single-chip jnp path on a repeat problem
    (round-1 review item 4: repeats on every fast path)."""
    from tests.test_pallas import _repeat_problem
    from graal_tpu.parallel import make_mesh
    from graal_tpu.parallel.sharding import sharded_log_likelihood
    from graal_tpu.core import likelihood

    state, table, params, obs = _repeat_problem(seed=12)
    mesh = make_mesh(n_chains=1, n_rows=8)
    fn = sharded_log_likelihood(mesh, table, obs)
    got = float(fn(state, params))
    want = float(likelihood.log_likelihood(state, table, obs, params))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=0.5)


def test_sharded_sparse_anchor_matches_local():
    """Rows-sharded chr1-scale sparse anchor == local sparse evaluation,
    for several chain states and per-chain params (8 virtual devices)."""
    from graal_tpu.core import sparse
    from graal_tpu.parallel.sharding import make_sharded_sparse_anchor
    from graal_tpu.utils.synthetic_sparse import (make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    state, table = make_scale_genome(200, 4, seed=31)
    sobs = simulate_sparse_contacts(state, table, params, seed=31)
    w = sparse.band_width(np.asarray(table.len_kb), float(params.d_max))
    local = jax.jit(sparse.make_sparse_loglik(table, sobs, w))

    chains = [state, shuffle_genome(state, 5, seed=32),
              shuffle_genome(state, 9, seed=33),
              mcmc.explode_genome(state)]
    states = GenomeState(*[jnp.stack([np.asarray(getattr(c, f))
                                      for c in chains])
                           for f in state._fields])
    params_c = RippeParams(*[
        jnp.asarray([float(x) * (1.0 + 0.01 * c) for c in range(4)])
        for x in params])

    mesh = make_mesh(n_chains=2, n_rows=4)
    anchor = make_sharded_sparse_anchor(mesh, table, sobs, w)
    got = np.asarray(anchor(states, params_c))
    want = np.asarray([
        float(local(GenomeState(*[x[c] for x in states]),
                    RippeParams(*[x[c] for x in params_c])))
        for c in range(4)])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1.0)
    # states must differ enough that this is a real 4-way check
    assert len(np.unique(want.round(2))) >= 3


def test_sharded_sparse_anchor_with_repeats():
    """The copy-summing sharded anchor (round-5: repeat exclusion lifted)
    must match the local copy-summing sparse likelihood on the
    8-virtual-device mesh, including with a deactivated copy."""
    from graal_tpu.core import sparse as sparse_mod
    from graal_tpu.parallel.sharding import (make_mesh,
                                             make_sharded_sparse_anchor)
    from graal_tpu.scale import ScaleRunner
    from graal_tpu.utils.synthetic_sparse import (add_scale_repeats,
                                                  make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    base, base_table = make_scale_genome(250, 3, seed=61)
    sobs = simulate_sparse_contacts(base, base_table, params, seed=61)
    state, table, id_d = add_scale_repeats(base, base_table, (17, 80, 140))
    assert table.has_repeats
    runner = ScaleRunner(table, sobs, params, id_d=id_d)
    mesh = make_mesh(n_chains=1, n_rows=8)
    sharded = make_sharded_sparse_anchor(mesh, table, sobs, runner.w)
    local = jax.jit(sparse_mod.make_sparse_loglik(table, sobs, runner.w))

    shuf = shuffle_genome(state, 8, seed=62)
    deact = shuf._replace(activ=shuf.activ.at[state.n_frags - 1].set(0))
    for st in (state, shuf, deact):
        sb = jax.tree.map(lambda x: jnp.asarray(x)[None], st)
        pb = jax.tree.map(lambda x: jnp.asarray(x)[None], params)
        got = float(sharded(GenomeState(*sb), type(params)(*pb))[0])
        want = float(local(st, params))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.5)
