"""Vectorised host-side setup vs the loop oracles.

Round-1 review item: build_neighbour_table / build_jump_table /
dist_inter_genome were O(n^2) Python loops — prohibitive at chr1 scale.
The vectorised replacements must agree with per-element transcriptions.
"""

import numpy as np
import pytest

from graal_tpu.core import mcmc, mtm
from graal_tpu.core.state import (GenomeState, _dist_inter_genome_loop,
                                  derive_prev_next, dist_inter_genome)
from tests.conftest import make_random_state


def _loop_prev_next(state):
    id_c = np.asarray(state.id_c)
    pos = np.asarray(state.pos)
    circ = np.asarray(state.circ)
    l_cont = np.asarray(state.l_cont)
    n = len(id_c)
    order = np.lexsort((pos, id_c))
    prev = np.full(n, -1, np.int32)
    nxt = np.full(n, -1, np.int32)
    for k in range(n):
        f = order[k]
        if pos[f] > 0:
            prev[f] = order[k - 1]
        elif circ[f] == 1 and l_cont[f] > 1:
            prev[f] = order[k + l_cont[f] - 1]
        if pos[f] < l_cont[f] - 1:
            nxt[f] = order[k + 1]
        elif circ[f] == 1 and l_cont[f] > 1:
            nxt[f] = order[k - l_cont[f] + 1]
    return prev, nxt


@pytest.mark.parametrize("with_circ", [False, True])
def test_derive_prev_next_matches_loop(rng, with_circ):
    for trial in range(5):
        state = make_random_state(rng, n_frags=30, n_contigs=6,
                                  with_circ=with_circ)
        want = _loop_prev_next(state)
        got = derive_prev_next(state)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_dist_inter_genome_matches_loop(rng):
    for trial in range(6):
        init = make_random_state(rng, n_frags=28, n_contigs=5)
        cur = make_random_state(rng, n_frags=28, n_contigs=7)
        # current genome must share len_bp/id_d geometry with the initial
        cur = cur._replace(id_d=init.id_d, len_bp=init.len_bp)
        init_prev, init_next = derive_prev_next(init)
        init_prev = np.where(init_prev != -1,
                             np.asarray(init.id_d)[np.clip(init_prev, 0, None)],
                             -1)
        init_next = np.where(init_next != -1,
                             np.asarray(init.id_d)[np.clip(init_next, 0, None)],
                             -1)
        init_ori = np.asarray(init.ori)
        n = init.n_frags
        orientable = rng.random(n) < 0.7
        skip = rng.random(n) < 0.15
        want = _dist_inter_genome_loop(cur, init_prev, init_next, init_ori,
                                       orientable, skip)
        got = dist_inter_genome(cur, init_prev, init_next, init_ori,
                                orientable, skip)
        np.testing.assert_allclose(got, want, atol=1e-9,
                                   err_msg=f"trial {trial}")


def test_dist_identity_is_zero(rng):
    state = make_random_state(rng, n_frags=24, n_contigs=4)
    prev, nxt = derive_prev_next(state)
    id_d = np.asarray(state.id_d)
    prev = np.where(prev != -1, id_d[np.clip(prev, 0, None)], -1)
    nxt = np.where(nxt != -1, id_d[np.clip(nxt, 0, None)], -1)
    orientable = np.ones(state.n_frags, bool)
    skip = np.zeros(state.n_frags, bool)
    d = dist_inter_genome(state, prev, nxt, np.asarray(state.ori),
                          orientable, skip)
    assert d == 0.0


def test_neighbour_table_dense_vs_sparse(rng):
    import scipy.sparse as sp

    n = 40
    m = rng.poisson(1.2, (n, n)).astype(np.float64)
    m = np.triu(m, 1)
    m = m + m.T
    dense_nb = mcmc.build_neighbour_table(m, np.arange(n), n, n_top=6)
    sparse_nb = mcmc.build_neighbour_table(sp.csr_matrix(m), np.arange(n), n,
                                           n_top=6)
    np.testing.assert_array_equal(np.asarray(dense_nb.xk),
                                  np.asarray(sparse_nb.xk))
    np.testing.assert_allclose(np.asarray(dense_nb.pk),
                               np.asarray(sparse_nb.pk), rtol=1e-6)


def test_neighbour_table_topk_correct(rng):
    n = 30
    m = rng.random((n, n)) * (rng.random((n, n)) < 0.4)
    np.fill_diagonal(m, 0.0)
    m = np.triu(m, 1) + np.triu(m, 1).T
    nb = mcmc.build_neighbour_table(m, np.arange(n), n, n_top=5)
    xk, pk = np.asarray(nb.xk), np.asarray(nb.pk)
    for i in range(n):
        row = m[i].copy()
        want = set(np.argsort(row)[::-1][:5][row[np.argsort(row)[::-1][:5]] > 0])
        got = set(xk[i][pk[i] > 0])
        assert got == want, f"row {i}: {got} != {want}"
        # probabilities proportional to contacts^3
        if want:
            ws = row[xk[i][pk[i] > 0]] ** 3.0
            np.testing.assert_allclose(pk[i][pk[i] > 0], ws / ws.sum(),
                                       rtol=1e-5)


def test_jump_table_top_partners(rng):
    n = 25
    m = rng.poisson(2.0, (n, n)).astype(np.float64)
    m = np.triu(m, 1)
    m = m + m.T
    jump = mtm.build_jump_table(m, np.ones(n), np.arange(n), n, delta=4)
    frags = np.asarray(jump.frags)
    for f in range(n):
        row = m[f].copy()
        row[f] = -np.inf
        best = np.argmax(row)
        if row[best] > 0:
            assert best in frags[f], f"row {f}"


def test_dispatcher_matches_loops():
    id_d = np.asarray([0, 1, 2, 1, 0, 0, 3])
    disp, mc = mcmc.build_dispatcher(id_d, 4)
    assert mc == 3
    want = {0: [0, 4, 5], 1: [1, 3], 2: [2], 3: [6]}
    for b, copies in want.items():
        got = [x for x in disp[b] if x >= 0]
        assert got == copies
