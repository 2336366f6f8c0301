"""End-to-end sampler tests on synthetic ground-truth data.

The reference validates itself by generating an observed matrix from a known
genome + known Rippe parameters with Poisson noise and checking the sampler
recovers the structure (is_simu mode, simulation_loader.py:119-120,
simulate_data_2d kernels3.cu:2331). Same oracle here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graal_tpu.core import mcmc, likelihood
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState, check_invariants, derive_prev_next
from graal_tpu.core.subfrags import trivial_table


def true_genome(n=16, n_contigs=2, len_bp=6000):
    per = n // n_contigs
    pos, id_c, start = [], [], []
    for c in range(n_contigs):
        for p in range(per):
            pos.append(p)
            id_c.append(c)
            start.append(p * len_bp)
    return GenomeState.from_soa(dict(
        pos=pos, id_c=id_c, start_bp=start, len_bp=np.full(n, len_bp),
        circ=np.zeros(n), l_cont=np.full(n, per),
        l_cont_bp=np.full(n, per * len_bp), ori=np.ones(n),
        rep=np.zeros(n), activ=np.ones(n), id_d=np.arange(n)))


def make_problem(seed=0, n=16):
    rng = np.random.default_rng(seed)
    state = true_genome(n, len_bp=3000)
    table = trivial_table(np.asarray(state.len_bp))
    # strong cis signal: ~17 expected contacts for adjacent bins vs 0.1 trans
    params = RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0,
                                fact=5000.0, d_max=900.0, v_inter=0.1)
    e = np.asarray(likelihood.expected_data_matrix(state, table, params))
    obs = rng.poisson(np.maximum(np.triu(e, 1), 0)).astype(np.float32)
    obs = obs + obs.T
    return state, table, params, obs


def test_em_recovers_structure():
    state, table, params, obs = make_problem()
    n = state.n_frags
    nb = mcmc.build_neighbour_table(obs, np.arange(n), n)
    cycle = mcmc.make_em_cycle(table, obs, nb, delta=4, sample_param=False)

    key = jax.random.key(0)
    scrambled = mcmc.explode_genome(state)
    ll_true = float(likelihood.log_likelihood(state, table, obs, params))
    ll_scr = float(likelihood.log_likelihood(scrambled, table, obs, params))
    assert ll_true > ll_scr

    cur = scrambled
    l_t = jnp.float32(ll_scr)
    first_ll = None
    for j in range(8):
        key, sub = jax.random.split(key)
        order = jax.random.permutation(sub, n)
        cur, params_out, l_t, metrics = cycle(cur, key, params, order, l_t,
                                              jnp.float32(1.0))
        if first_ll is None:
            first_ll = float(metrics.likelihood[0])
    check_invariants(cur)
    final_ll = float(l_t)
    # must climb most of the gap between scrambled and true likelihood
    assert final_ll > ll_scr + 0.8 * (ll_true - ll_scr), \
        f"scr={ll_scr:.1f} final={final_ll:.1f} true={ll_true:.1f}"

    # structural recovery: most true adjacencies present (up to orientation)
    prev, nxt = derive_prev_next(cur)
    true_prev, true_next = derive_prev_next(state)
    hits = 0
    for f in range(n):
        neigh = {p for p in (prev[f], nxt[f]) if p != -1}
        want = {p for p in (true_prev[f], true_next[f]) if p != -1}
        hits += len(neigh & want)
    total = sum(len({p for p in (true_prev[f], true_next[f]) if p != -1})
                for f in range(n))
    assert hits / total > 0.6, f"adjacency recovery {hits}/{total}"


def test_nuisance_step_accepts_improvements():
    state, table, params, obs = make_problem()
    nuis = jax.jit(mcmc.make_nuisance_step(table, obs))
    l_t = likelihood.log_likelihood(state, table, obs, params)
    key = jax.random.key(5)
    params_cur = params
    l_cur = jnp.float32(l_t)
    n_accept = 0
    for i in range(20):
        key, sub = jax.random.split(key)
        params_cur, l_cur, acc = nuis(state, sub, params_cur, l_cur,
                                      jnp.float32(1.0))
        n_accept += int(acc)
    assert np.isfinite(float(l_cur))
    assert n_accept >= 1  # some proposals must be accepted
    # parameters stayed in a sane region
    assert float(params_cur.fact) > 0
    assert -3.0 < float(params_cur.slope) < 0.0


def test_solve_d_max_matches_peval():
    params = RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0,
                                fact=600.0, d_max=900.0, v_inter=0.3)
    d_max = float(mcmc.solve_d_max(params, jnp.float32(0.3)))
    from graal_tpu.core.model import peval
    val = peval(d_max, [1.0, 9.6, -1.5, 3.0, 600.0])
    np.testing.assert_allclose(val, 0.3, rtol=1e-3)


def test_replay_determinism():
    """Applying a recorded mutation list reproduces the same genome
    (the reference's replay harness, main_gl.py:140-207)."""
    state, table, params, obs = make_problem()
    n = state.n_frags
    rng = np.random.default_rng(3)
    muts = [(int(rng.integers(n)), int(rng.integers(n)), int(rng.integers(13)))
            for _ in range(25)]
    apply_jit = jax.jit(mcmc.apply_mutation)

    def run():
        cur = mcmc.explode_genome(state)
        for fa, fb, op in muts:
            cur = apply_jit(cur, fa, fb, op)
        return cur

    a, b = run(), run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    check_invariants(a)


def test_nuisance_step_with_scorer_matches_jnp():
    """The scorer-threaded nuisance path (VERDICT r1 item 5) must make the
    same decision and produce the same parameters as the jnp path."""
    state, table, params, obs = make_problem()
    from graal_tpu.ops.likelihood_pallas import make_pallas_scorer

    scorer = make_pallas_scorer(table, obs, interpret=True)
    nuis_jnp = jax.jit(mcmc.make_nuisance_step(table, obs))
    nuis_fast = jax.jit(mcmc.make_nuisance_step(table, obs, scorer=scorer))
    l_t = jnp.float32(likelihood.log_likelihood(state, table, obs, params))
    key = jax.random.key(11)
    for _ in range(8):
        key, sub = jax.random.split(key)
        p_a, l_a, acc_a = nuis_jnp(state, sub, params, l_t, jnp.float32(1.0))
        p_b, l_b, acc_b = nuis_fast(state, sub, params, l_t, jnp.float32(1.0))
        assert bool(acc_a) == bool(acc_b)
        np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-4)
        for a, b in zip(p_a, p_b):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
        params, l_t = p_a, l_a


def test_nuisance_d_max_cap_rejects():
    """With a d_max cap (banded sparse scorers), any proposal whose
    re-derived d_max exceeds the cap must be rejected regardless of
    likelihood improvement."""
    import jax
    import jax.numpy as jnp
    from graal_tpu.core import mcmc as mcmc_mod

    state, table, params, obs = make_problem()
    # cap just below the current d_max: every d_max-moving proposal that
    # lands above must be rejected; run many keys and assert the invariant
    cap = float(params.d_max) * 1.05
    step = jax.jit(mcmc_mod.make_nuisance_step(table, obs, d_max_cap=cap))
    from graal_tpu.core.likelihood import log_likelihood
    l_t = jax.jit(lambda s, p: log_likelihood(s, table, obs, p))(state, params)
    p = params
    for i in range(40):
        p, l_t, accept = step(state, jax.random.key(i), p, l_t,
                              jnp.float32(1.0))
        assert float(p.d_max) <= cap + 1e-3


def test_nuisance_split_matches_monolithic():
    """make_nuisance_proposer + nuisance_accept composed around the same
    scorer must reproduce make_nuisance_step bit-exactly (same key
    schedule) — the split is what lets run_chains route the heavy
    evaluation through the chain-batched sharded anchor."""
    state, table, params, obs = make_problem()
    mono = jax.jit(mcmc.make_nuisance_step(table, obs))
    propose = mcmc.make_nuisance_proposer()

    def split_step(state, key, p, l_t, f_t):
        tp, ok, k_u = propose(key, p)
        l_star = likelihood.log_likelihood(state, table, obs, tp)
        return mcmc.nuisance_accept(k_u, tp, p, l_star, l_t, f_t, ok)

    split = jax.jit(split_step)
    l_t = jnp.float32(likelihood.log_likelihood(state, table, obs, params))
    key = jax.random.key(11)
    p_m = p_s = params
    l_m = l_s = l_t
    for _ in range(12):
        key, sub = jax.random.split(key)
        p_m, l_m, a_m = mono(state, sub, p_m, l_m, jnp.float32(1.0))
        p_s, l_s, a_s = split(state, sub, p_s, l_s, jnp.float32(1.0))
        assert bool(a_m) == bool(a_s)
        np.testing.assert_array_equal(np.float32(l_m), np.float32(l_s))
        for f in params._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(p_m, f)), np.asarray(getattr(p_s, f)),
                err_msg=f)
