"""Delta scoring vs full scoring — the reference's own oracle pattern
(debug_step_max_likelihood recomputes every candidate with the full kernel,
cuda_lib_gl.py:2109-2292). The delta engine scores on the affected-contig
mini-state (O(|D|^2) per candidate), so every test cross-checks against the
full dense likelihood of the complete genome.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import delta, likelihood, mcmc
from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.utils.synthetic import (bin_level_matrix, default_params,
                                       make_genome, simulate_contacts)


@pytest.fixture(scope="module")
def problem():
    state, table = make_genome(n_bins=36, n_contigs=6, subs_per_bin=3, seed=4)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=4)
    return state, table, params, obs


def full_scores(cands_flat, table, obs, params):
    return jax.vmap(
        lambda c: likelihood.log_likelihood(c, table, obs, params))(cands_flat)


def _dscore(problem, f_max, **kw):
    state, table, params, obs = problem
    return jax.jit(delta.make_delta_scorer(table, obs, f_max, **kw))


@pytest.mark.parametrize("candidate_batch", ["vmap", "map"])
def test_delta_matches_full_difference(problem, candidate_batch):
    state, table, params, obs = problem
    dscore = _dscore(problem, f_max=16, candidate_batch=candidate_batch)
    l0 = float(likelihood.log_likelihood(state, table, obs, params))
    max_id = jnp.max(state.id_c)

    rng = np.random.default_rng(0)
    n = state.n_frags
    for trial in range(4):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        cands = build_candidates(state, f_a, f_b)
        dll, minis, rows, valid, overflow = dscore(
            state, jnp.int32(f_a), jnp.int32(f_b), params, max_id)
        assert not bool(overflow)
        want = np.asarray(full_scores(cands, table, obs, params)) - l0
        np.testing.assert_allclose(np.asarray(dll), want, rtol=1e-3, atol=0.3,
                                   err_msg=f"trial {trial} fa={f_a} fb={f_b}")


def test_delta_matches_on_circular_contig(problem):
    """Pairs on circularised contigs use the circular Rippe variant — the
    mini-state path must agree with the full path there too."""
    state, table, params, obs = problem
    # circularise contig 0 by setting its circ flag
    in0 = np.asarray(state.id_c) == 0
    circ = np.asarray(state.circ).copy()
    circ[in0] = 1
    state = state._replace(circ=jnp.asarray(circ, jnp.int32))
    dscore = _dscore(problem, f_max=16)
    l0 = float(likelihood.log_likelihood(state, table, obs, params))
    f_a = int(np.nonzero(in0)[0][1])
    f_b = int(np.nonzero(~in0)[0][0])
    cands = build_candidates(state, f_a, f_b)
    dll, *_ , overflow = dscore(state, jnp.int32(f_a), jnp.int32(f_b),
                                params, jnp.max(state.id_c))
    assert not bool(overflow)
    want = np.asarray(full_scores(cands, table, obs, params)) - l0
    np.testing.assert_allclose(np.asarray(dll), want, rtol=1e-3, atol=0.3)


def test_banded_esum_matches_grid(problem):
    """The banded expected-mass decomposition (analytic trans mass + sorted
    cis band) must agree with the dense pair-grid oracle — including on
    circularised contigs — and with the full-likelihood difference."""
    from graal_tpu.core import sparse as sparse_mod

    state, table, params, obs = problem
    w = sparse_mod.band_width(np.asarray(table.len_kb), float(params.d_max))
    d_grid = _dscore(problem, f_max=16)
    d_band = _dscore(problem, f_max=16, band_w=w)
    l0 = float(likelihood.log_likelihood(state, table, obs, params))
    max_id = jnp.max(state.id_c)
    rng = np.random.default_rng(3)
    n = state.n_frags
    for trial in range(4):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        dll_g = np.asarray(d_grid(state, jnp.int32(f_a), jnp.int32(f_b),
                                  params, max_id)[0])
        dll_b = np.asarray(d_band(state, jnp.int32(f_a), jnp.int32(f_b),
                                  params, max_id)[0])
        np.testing.assert_allclose(dll_b, dll_g, rtol=1e-3, atol=0.05,
                                   err_msg=f"trial {trial}")
        cands = build_candidates(state, f_a, f_b)
        want = np.asarray(full_scores(cands, table, obs, params)) - l0
        np.testing.assert_allclose(dll_b, want, rtol=1e-3, atol=0.3)

    # circularised contig: the banded path must keep the circular variant
    in0 = np.asarray(state.id_c) == 0
    circ = np.asarray(state.circ).copy()
    circ[in0] = 1
    state_c = state._replace(circ=jnp.asarray(circ, jnp.int32))
    f_a = int(np.nonzero(in0)[0][1])
    f_b = int(np.nonzero(~in0)[0][0])
    dll_g = np.asarray(d_grid(state_c, jnp.int32(f_a), jnp.int32(f_b),
                              params, max_id)[0])
    dll_b = np.asarray(d_band(state_c, jnp.int32(f_a), jnp.int32(f_b),
                              params, max_id)[0])
    np.testing.assert_allclose(dll_b, dll_g, rtol=1e-3, atol=0.05)


def test_effective_band_w_crossover(problem):
    """Production entries must drop the band when it is not much narrower
    than the mini grid (a wide band costs more than the dense grid)."""
    state, table, params, obs = problem
    # r_max = f_max * s_max = 16 * 3 = 48: band kept only when 8x narrower
    # (measured crossover — TPU per-candidate lexsorts make a band at half
    # the grid edge 16x SLOWER than the grid, see effective_band_w)
    assert delta.effective_band_w(6, table, 16) == 6
    assert delta.effective_band_w(16, table, 16) is None
    assert delta.effective_band_w(600, table, 16) is None
    assert delta.effective_band_w(None, table, 16) is None


def test_mini_commit_equals_full_candidates(problem):
    """Scattering the selected mini-candidate back into the full state must
    reproduce build_candidates applied to the full state, for every op."""
    state, table, params, obs = problem
    dscore = _dscore(problem, f_max=16)
    max_id = jnp.max(state.id_c)
    rng = np.random.default_rng(5)
    n = state.n_frags
    for trial in range(3):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        if f_a == f_b:
            continue
        _, minis, rows, valid, _ = dscore(state, jnp.int32(f_a),
                                          jnp.int32(f_b), params, max_id)
        full_cands = build_candidates(state, f_a, f_b)
        for op in range(N_CANDIDATES):
            mini_op = jax.tree.map(lambda x: x[op], minis)
            committed = delta.scatter_mini(state, mini_op, rows, valid)
            want = jax.tree.map(lambda x: x[op], full_cands)
            for fname in GenomeState._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(committed, fname)),
                    np.asarray(getattr(want, fname)),
                    err_msg=f"trial {trial} op {op} field {fname}")
            check_invariants(committed)


def test_overflow_marks_oversized_changes(problem):
    state, table, params, obs = problem
    # f_max smaller than any 6-fragment contig pair
    dscore = _dscore(problem, f_max=4)
    dll, minis, rows, valid, overflow = dscore(
        state, jnp.int32(3), jnp.int32(20), params, jnp.max(state.id_c))
    assert bool(overflow)
    assert np.all(np.isfinite(np.asarray(dll)))


def test_overflow_cannot_poison_selection():
    """An overflowing slot must not drag score_min to -inf / NaN the filter
    (round-1 advisor finding): with slot_valid masking, selection must pick
    only non-overflow slots, and with *every* slot overflowing the step must
    be a no-op."""
    m, n_ops = 3, N_CANDIDATES
    key = jax.random.key(0)
    score = jnp.zeros((m, n_ops))
    score = score.at[1, 5].set(10.0)          # the only good real slot
    valid = jnp.ones((m,), bool)
    slot_ok = jnp.zeros((m, n_ops), bool).at[1, 5].set(True)
    for trial in range(5):
        key, sub = jax.random.split(key)
        sel = int(mcmc.select_score_slot(sub, score, valid, jnp.float32(1.0),
                                         slot_valid=slot_ok))
        assert sel == 1 * N_CANDIDATES + 5

    # every-slot-overflow -> delta step no-op fallback
    state, table = make_genome(n_bins=12, n_contigs=3, subs_per_bin=3, seed=7)
    params = default_params(fact=2000.0)
    obs = simulate_contacts(state, table, params, seed=7)
    bins = bin_level_matrix(np.asarray(obs), table)
    nb = mcmc.build_neighbour_table(bins, np.arange(12), 12)
    step = delta.make_delta_em_step(table, obs, nb, delta=2, f_max=2)
    l_t = jnp.float32(-100.0)
    new_state, l_new, (op, fb, n_over) = jax.jit(step)(
        state, jax.random.key(1), params, l_t, jnp.int32(0), jnp.float32(1.0))
    assert int(n_over) > 0
    assert int(op) == -1   # every contig has 4 frags > f_max=2 -> all overflow
    np.testing.assert_array_equal(np.asarray(new_state.id_c),
                                  np.asarray(state.id_c))
    assert float(l_new) == float(l_t)


def test_delta_cycle_assembles(problem):
    """Delta-scored EM assembles a scrambled genome like the full-scored
    cycle (exploded start: tiny contigs, small change sets)."""
    state, table, params, obs = problem
    n = state.n_frags
    bins = bin_level_matrix(obs, table)
    nb = mcmc.build_neighbour_table(bins, np.arange(n), n)
    cycle = delta.make_delta_em_cycle(table, obs, nb, delta=4, f_max=24)

    scrambled = mcmc.explode_genome(state)
    ll0 = float(likelihood.log_likelihood(scrambled, table, obs, params))
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    cur, l_t = scrambled, jnp.float32(ll0)
    key = jax.random.key(2)
    for j in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        order = jax.random.permutation(k1, n)
        cur, l_t, (lls, ops_, fbs, overs, ncs) = cycle(
            cur, k2, params, order, l_t, jnp.float32(1.0))
    final = float(l_t)
    check_invariants(cur)
    assert final > ll0 + 0.7 * (ll_true - ll0), \
        f"scr={ll0:.1f} final={final:.1f} true={ll_true:.1f}"
    # anchored likelihood must equal a fresh full evaluation
    fresh = float(likelihood.log_likelihood(cur, table, obs, params))
    np.testing.assert_allclose(final, fresh, rtol=1e-4)


def test_incremental_l_t_tracks_full(problem):
    """The incrementally carried l_t (sum of committed dLs) must track the
    true likelihood within f32 tolerance across a cycle."""
    state, table, params, obs = problem
    n = state.n_frags
    bins = bin_level_matrix(obs, table)
    nb = mcmc.build_neighbour_table(bins, np.arange(n), n)
    step = jax.jit(delta.make_delta_em_step(table, obs, nb, delta=3, f_max=24))
    cur = mcmc.explode_genome(state)
    l_t = jnp.float32(likelihood.log_likelihood(cur, table, obs, params))
    key = jax.random.key(9)
    for f_a in range(0, n, 3):
        key, sub = jax.random.split(key)
        cur, l_t, _ = step(cur, sub, params, l_t, jnp.int32(f_a),
                           jnp.float32(1.0))
    fresh = float(likelihood.log_likelihood(cur, table, obs, params))
    np.testing.assert_allclose(float(l_t), fresh, rtol=5e-4, atol=1.0)


def test_banded_esum_offset_chunking(problem):
    """The band-offset fori_loop (added after a 15.6 GB padded-slab OOM
    at 500k fragments) must agree with the dense grid when the band
    genuinely splits into multiple chunks, including a chunk width that
    does not divide band_w."""
    state, table, params, obs = problem
    from graal_tpu.core import delta as dm

    from graal_tpu.core import sparse as sparse_mod

    w = sparse_mod.band_width(np.asarray(table.len_kb), float(params.d_max))
    assert w >= 10   # so _off_chunk=4 genuinely splits, non-divisibly
    d_grid = _dscore(problem, f_max=16)
    d_band = jax.jit(dm.make_delta_scorer(table, obs, 16, band_w=w,
                                          _off_chunk=4))
    max_id = jnp.max(state.id_c)
    rng = np.random.default_rng(9)
    n = state.n_frags
    for trial in range(3):
        f_a, f_b = int(rng.integers(n)), int(rng.integers(n))
        dll_g = np.asarray(d_grid(state, jnp.int32(f_a), jnp.int32(f_b),
                                  params, max_id)[0])
        dll_b = np.asarray(d_band(state, jnp.int32(f_a), jnp.int32(f_b),
                                  params, max_id)[0])
        np.testing.assert_allclose(dll_b, dll_g, rtol=1e-3, atol=0.05,
                                   err_msg=f"trial {trial}")


def test_extract_rows_union_matches_per_neighbour(problem):
    """extract_rows_union must produce the same member sets (and exact
    overflow flags) as per-neighbour extract_rows."""
    state, table, params, obs = problem
    key = jax.random.key(3)
    st = state
    for trial in range(3):
        key, k1, k2 = jax.random.split(key, 3)
        # random mutation walk to diversify contig structure
        f = int(jax.random.randint(k1, (), 0, st.n_frags))
        g = int(jax.random.randint(k2, (), 0, st.n_frags))
        st = mcmc.apply_mutation(st, f, g, 4)
        check_invariants(st)
        f_a = int(jax.random.randint(k1, (), 0, st.n_frags))
        ids = jax.random.randint(k2, (5,), 0, st.n_frags).astype(jnp.int32)
        for f_max in (4, 8, 16, 36):
            rows_b, valid_b, over_b = jax.jit(
                delta.extract_rows_union, static_argnums=3)(
                st, f_a, ids, f_max)
            for i in range(5):
                rows, valid, over = jax.jit(
                    delta.extract_rows, static_argnums=3)(
                    st, f_a, ids[i], f_max)
                got = set(np.asarray(rows_b[i])[np.asarray(valid_b[i])])
                want = set(np.asarray(rows)[np.asarray(valid)])
                if not bool(over):
                    assert got == want, (trial, f_max, i)
                    # ascending member prefix, like extract_rows
                    gr = np.asarray(rows_b[i])[np.asarray(valid_b[i])]
                    assert np.all(np.diff(gr) > 0)
                assert bool(over_b[i]) == bool(over), (trial, f_max, i)
