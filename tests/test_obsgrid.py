"""The fused window-obs-grid Pallas kernel vs the einsum oracle.

ops/obsgrid_pallas.py replaces the (R, cap, R) one-hot einsum of the
chr1-scale delta scorer's observation densification (core/delta.py
obs_grid; reference window reads: sub_compute_likelihood,
kernels3.cu:3381-3397). These tests run the kernel in the Pallas
interpreter (CPU) against the einsum formulation, alone and threaded
through the full delta scorer.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import delta, sparse
from graal_tpu.ops import obsgrid_pallas
from graal_tpu.ops.obsgrid_pallas import (make_window_obs_grid,
                                          window_obs_grid_reference)
from graal_tpu.utils.synthetic import (default_params, make_genome,
                                       simulate_contacts)


def _random_windows(rng, r, cap, n_keys):
    cols = rng.integers(0, n_keys, (r, cap)).astype(np.int32)
    vals = (rng.random((r, cap)) * 20).astype(np.float32)
    vals[rng.random((r, cap)) < 0.3] = 0.0      # masked window slots
    keys = np.full(r, -1, np.int32)
    k = max(r // 2, 1)
    keys[:k] = rng.choice(n_keys, k, replace=False).astype(np.int32)
    return jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(keys)


@pytest.mark.parametrize("r,cap", [(300, 37), (256, 32), (64, 5)])
def test_kernel_matches_einsum(r, cap):
    rng = np.random.default_rng(r + cap)
    cols, vals, keys = _random_windows(rng, r, cap, 4 * r)
    fn = make_window_obs_grid(r, cap, interpret=True)
    got = np.asarray(fn(cols, vals, keys))
    want = np.asarray(window_obs_grid_reference(cols, vals, keys))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kernel_vmaps_over_neighbours():
    rng = np.random.default_rng(0)
    batch = [_random_windows(rng, 130, 9, 600) for _ in range(3)]
    cols, vals, keys = (jnp.stack(x) for x in zip(*batch))
    fn = make_window_obs_grid(130, 9, interpret=True)
    got = np.asarray(jax.vmap(fn)(cols, vals, keys))
    want = np.asarray(jax.vmap(window_obs_grid_reference)(cols, vals, keys))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_duplicate_window_columns_sum():
    """Two window slots carrying the same column id must both accumulate
    (symmetric CSR rows never contain duplicates, but the kernel must not
    rely on that)."""
    cols = jnp.asarray([[5, 5, 7]], jnp.int32)
    vals = jnp.asarray([[2.0, 3.0, 1.0]], jnp.float32)
    keys = jnp.asarray([5], jnp.int32)
    fn = make_window_obs_grid(1, 3, interpret=True)
    out = np.asarray(fn(cols, vals, keys))
    assert out[0, 0] == 5.0


@pytest.mark.slow
def test_delta_scorer_pallas_grid_matches_jnp(monkeypatch):
    """The fused mini-grid kernel path (grid_impl='pallas', interpreted)
    must produce the same candidate deltas as the jnp grid_terms path."""
    from graal_tpu.ops import likelihood_pallas

    monkeypatch.setattr(
        likelihood_pallas, "make_mini_grid_scorer",
        functools.partial(likelihood_pallas.make_mini_grid_scorer,
                          interpret=True))
    state, table = make_genome(n_bins=48, n_contigs=4, subs_per_bin=3,
                               seed=13)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=13)
    sobs = sparse.sparse_from_dense(obs)
    f_max = 16
    d_jnp = jax.jit(delta.make_delta_scorer(table, None, f_max, sobs=sobs,
                                            grid_impl="jnp"))
    d_pal = jax.jit(delta.make_delta_scorer(table, None, f_max, sobs=sobs,
                                            grid_impl="pallas"))
    max_id = jnp.max(state.id_c)
    for f_a, f_b in [(0, 20), (3, 40)]:
        want, *_ = d_jnp(state, f_a, f_b, params, max_id)
        got, *_ = d_pal(state, f_a, f_b, params, max_id)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-2,
                                   err_msg=f"pair ({f_a}, {f_b})")


def test_delta_scorer_pallas_obs_matches_einsum(monkeypatch):
    """Full integration: the delta scorer with obs_impl='pallas'
    (interpreted) must produce the same candidate deltas as the einsum
    path on a real sparse problem."""
    monkeypatch.setattr(
        obsgrid_pallas, "make_window_obs_grid",
        functools.partial(make_window_obs_grid, interpret=True))
    state, table = make_genome(n_bins=48, n_contigs=4, subs_per_bin=3,
                               seed=11)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=11)
    sobs = sparse.sparse_from_dense(obs)
    f_max = 16
    d_ein = jax.jit(delta.make_delta_scorer(table, None, f_max, sobs=sobs,
                                            obs_impl="einsum"))
    d_pal = jax.jit(delta.make_delta_scorer(table, None, f_max, sobs=sobs,
                                            obs_impl="pallas"))
    max_id = jnp.max(state.id_c)
    for f_a, f_b in [(0, 20), (3, 40), (17, 2)]:
        want, *_ = d_ein(state, f_a, f_b, params, max_id)
        got, *_ = d_pal(state, f_a, f_b, params, max_id)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-3,
                                   err_msg=f"pair ({f_a}, {f_b})")
