"""Sparse/banded likelihood vs the dense implementation.

The chr1-scale path never forms a dense pair grid; these tests pin its
three pieces — sparse full likelihood, banded cis correction, and the
CSR-window obs gather used by delta scoring — to the dense oracles at
sizes where both are computable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import delta, likelihood, mcmc, sparse
from graal_tpu.core.state import GenomeState
from graal_tpu.utils.synthetic import (bin_level_matrix, default_params,
                                       make_genome, simulate_contacts)


@pytest.fixture(scope="module")
def problem():
    state, table = make_genome(n_bins=48, n_contigs=4, subs_per_bin=3, seed=6)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=6)
    return state, table, params, obs


def test_sparse_loglik_matches_dense(problem):
    state, table, params, obs = problem
    sobs = sparse.sparse_from_dense(obs)
    w = sparse.band_width(np.asarray(table.len_kb), float(params.d_max))
    fn = jax.jit(sparse.make_sparse_loglik(table, sobs, w))

    for trial, st in enumerate([state, mcmc.explode_genome(state)]):
        want = float(likelihood.log_likelihood(st, table, obs, params))
        got = float(fn(st, params))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.5,
                                   err_msg=f"trial {trial}")


def test_sparse_loglik_tracks_mutations(problem):
    """Agreement must hold through arbitrary genome rearrangements."""
    state, table, params, obs = problem
    sobs = sparse.sparse_from_dense(obs)
    w = sparse.band_width(np.asarray(table.len_kb), float(params.d_max))
    fn = jax.jit(sparse.make_sparse_loglik(table, sobs, w))
    apply_jit = jax.jit(mcmc.apply_mutation)

    rng = np.random.default_rng(2)
    cur = state
    n = state.n_frags
    for step in range(10):
        fa, fb, op = (int(rng.integers(n)), int(rng.integers(n)),
                      int(rng.integers(13)))
        cur = apply_jit(cur, fa, fb, op)
        want = float(likelihood.log_likelihood(cur, table, obs, params))
        got = float(fn(cur, params))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.5,
                                   err_msg=f"step {step} op {op}")


def test_band_width_covers_dmax(problem):
    """Every same-contig pair within d_max must sit inside the band."""
    state, table, params, obs = problem
    w = sparse.band_width(np.asarray(table.len_kb), float(params.d_max),
                          margin=1.0)
    order, mid = sparse.genome_sort_order(state, table)
    order, mid = np.asarray(order), np.asarray(mid)
    idc = np.asarray(state.id_c)[np.asarray(table.owner)]
    k = len(order)
    for i in range(k):
        for j in range(i + 1, k):
            u, v = order[i], order[j]
            if idc[u] != idc[v]:
                continue
            if abs(mid[u] - mid[v]) < float(params.d_max):
                assert j - i <= w, (i, j, w)


def test_sparse_obs_fn_matches_dense_gather(problem):
    state, table, params, obs = problem
    sobs = sparse.sparse_from_dense(obs)
    r = 24
    obs_fn = jax.jit(sparse.make_sparse_obs_fn(sobs, r))
    rng = np.random.default_rng(3)
    k = table.n_subs
    for trial in range(3):
        rows = np.sort(rng.choice(k, r - 4, replace=False))
        rows = np.concatenate([rows, np.full(4, k)])   # padding entries
        got = np.asarray(obs_fn(jnp.asarray(rows, jnp.int32)))
        rc = np.clip(rows, 0, k - 1)
        want = np.asarray(obs)[rc[:, None], rc[None, :]]
        want[rows >= k, :] = 0.0
        want[:, rows >= k] = 0.0
        real = rows < k
        np.testing.assert_array_equal(got[np.ix_(real, real)],
                                      want[np.ix_(real, real)],
                                      err_msg=f"trial {trial}")


def test_delta_with_sparse_obs_matches_dense(problem):
    """The delta scorer fed by the sparse CSR windows must equal the dense
    delta scorer (and hence the full-likelihood difference)."""
    state, table, params, obs = problem
    sobs = sparse.sparse_from_dense(obs)
    f_max = 16
    d_dense = jax.jit(delta.make_delta_scorer(table, obs, f_max))
    d_sparse = jax.jit(delta.make_delta_scorer(table, None, f_max,
                                               sobs=sobs))
    max_id = jnp.max(state.id_c)
    rng = np.random.default_rng(4)
    n = state.n_frags
    for trial in range(4):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        dll_a, *_ = d_dense(state, jnp.int32(f_a), jnp.int32(f_b), params,
                            max_id)
        dll_b, *_ = d_sparse(state, jnp.int32(f_a), jnp.int32(f_b), params,
                             max_id)
        np.testing.assert_allclose(np.asarray(dll_a), np.asarray(dll_b),
                                   rtol=1e-5, atol=1e-3,
                                   err_msg=f"trial {trial}")


def test_sparse_from_coo_symmetrises():
    rows = np.asarray([0, 2, 1])
    cols = np.asarray([2, 3, 0])
    vals = np.asarray([5.0, 2.0, 7.0])
    sobs = sparse.sparse_from_coo(rows, cols, vals, 4)
    dense = np.zeros((4, 4), np.float32)
    r, c, v = (np.asarray(sobs.rows), np.asarray(sobs.cols),
               np.asarray(sobs.vals))
    dense[r, c] = v
    want = np.zeros((4, 4), np.float32)
    for rr, cc, vv in [(0, 2, 5), (2, 3, 2), (1, 0, 7)]:
        want[rr, cc] += vv
        want[cc, rr] += vv
    np.testing.assert_array_equal(dense, want)


def test_sparse_loglik_repeats_matches_dense():
    """Copy-expanded sparse likelihood == the dense scatter-add path, on
    as-is / deactivated-copy / relocated / circularised repeat genomes."""
    from graal_tpu.utils.synthetic_sparse import (add_scale_repeats,
                                                  make_scale_genome,
                                                  scale_params,
                                                  shuffle_genome,
                                                  simulate_sparse_contacts)

    params = scale_params()
    base, base_table = make_scale_genome(160, 4, seed=5)
    sobs = simulate_sparse_contacts(base, base_table, params, seed=5)
    state, table, id_d = add_scale_repeats(base, base_table, (7, 40, 90))
    w = sparse.band_width(np.asarray(table.len_kb), float(params.d_max))
    fn = jax.jit(sparse.make_sparse_loglik(table, sobs, w, obs_chunk=1024))

    obs_dense = np.zeros((160, 160), np.float32)
    obs_dense[np.asarray(sobs.rows), np.asarray(sobs.cols)] = \
        np.asarray(sobs.vals)

    n = state.n_frags
    deact = state._replace(activ=jnp.asarray(
        np.where(np.arange(n) == n - 1, 0, np.asarray(state.activ)),
        jnp.int32))
    moved = shuffle_genome(state, 12, seed=6)
    circ_v = np.asarray(state.circ).copy()
    circ_v[np.asarray(state.id_c) == 0] = 1
    circd = state._replace(circ=jnp.asarray(circ_v, jnp.int32))
    for name, st in [("asis", state), ("deact", deact), ("moved", moved),
                     ("circ", circd)]:
        got = float(fn(st, params))
        want = float(likelihood.log_likelihood(st, table,
                                               jnp.asarray(obs_dense),
                                               params))
        assert abs(got - want) < max(2.0, 1e-4 * abs(want)), \
            (name, got, want)
