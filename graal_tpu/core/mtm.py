"""Multiple-try Metropolis and plain Metropolis-Hastings samplers.

Device-side re-design of the reference's MCMC variants:

- jumping distributions: per fragment, the delta strongest partners of the
  accu-normalised contact matrix (set_jumping_distributions_parameters,
  cuda_lib_gl.py:2563-2588),
- step_mtm (cuda_lib_gl.py:2936-3069): forward pass scores 13 MH-mutation
  candidates for every neighbour of fA, samples a proposal from the
  tempered softmax, applies it to get G*; a backward pass scores the same
  candidate set from G* pivoted at the chosen partner f*; the MTM ratio
  exp(max_f - max_b) * sum(w_fwd) / sum(w_bwd) decides acceptance,
- step_metropolis_hastings (cuda_lib_gl.py:2836-2934): the plain-MH sibling
  with proposal probabilities in the ratio,
- impossible-operation masking (detect_impossibility, :3072-3100): paste
  requires both fragments at linear-contig extremities; translocations
  require fB at the matching extremity.

The whole step (both passes, 2 x 13 x n_neighbours candidate likelihoods)
is one jitted function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.candidates import N_CANDIDATES, mh_candidates
from graal_tpu.core.likelihood import log_likelihood
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable

MTM_THRESH_OVERFLOW = 600.0   # step_mtm (cuda_lib_gl.py:2974)
MH_THRESH_OVERFLOW = 10.0     # step_metropolis_hastings_s_a (:2871)


class JumpTable(NamedTuple):
    """Top-delta jumping-distribution tables (static)."""

    frags: jnp.ndarray   # (n_frags, delta) int32 partner ids
    delta: int


def build_jump_table(bin_matrix, norm_vect_accu, id_d, n_frags, delta) -> JumpTable:
    """Accu-normalised contact matrix -> per-fragment top-delta partners
    (set_jumping_distributions_parameters, cuda_lib_gl.py:2563-2581).

    Vectorised O(nnz log nnz) construction; ``bin_matrix`` may be dense or
    scipy.sparse.
    """
    from graal_tpu.core.mcmc import _matrix_to_coo, topk_rows

    rows, cols, vals, n_bins = _matrix_to_coo(bin_matrix)
    norm = np.asarray(norm_vect_accu, np.float64)
    vals = vals / np.maximum(norm[rows] * norm[cols], 1e-12)
    top_bins, topv = topk_rows(rows, cols, vals, n_bins, delta)
    # rows with fewer than delta positive partners: pad with arbitrary
    # distinct bins (the reference's argsort over zero entries)
    pad = (n_bins - 1 - np.arange(delta))[None, :].astype(np.int32)
    top_bins = np.where(topv > 0, top_bins, pad % n_bins)

    id_d = np.asarray(id_d)
    # first copy fragment of each bin (reversed-scatter: lowest index wins)
    first_copy = np.zeros(n_bins, np.int64)
    n = len(id_d)
    first_copy[id_d[::-1]] = np.arange(n - 1, -1, -1)
    frags = first_copy[top_bins[id_d]].astype(np.int32)
    return JumpTable(frags=jnp.asarray(frags), delta=delta)


def _prev_next(state: GenomeState, f):
    """Device-side (prev, next) of fragment ``f``; -1 at linear extremities
    (the reference's linked-list pointers, derived from (id_c, pos))."""
    n = state.n_frags
    idx = jnp.arange(n)
    c = state.id_c[f]
    p = state.pos[f]
    in_c = state.id_c == c
    is_prev = in_c & (state.pos == p - 1)
    is_next = in_c & (state.pos == p + 1)
    # circular wrap
    l_val = state.l_cont[f]
    wrap_prev = in_c & (state.pos == l_val - 1) & (p == 0) & (state.circ[f] == 1)
    wrap_next = in_c & (state.pos == 0) & (p == l_val - 1) & (state.circ[f] == 1)
    prev_mask = is_prev | wrap_prev
    next_mask = is_next | wrap_next
    prev = jnp.where(jnp.any(prev_mask), jnp.argmax(prev_mask), -1)
    nxt = jnp.where(jnp.any(next_mask), jnp.argmax(next_mask), -1)
    return prev, nxt


def _impossibility_mask(state: GenomeState, f_a, nb_ids):
    """(n_nb, 13) True where the op slot must be discarded
    (detect_impossibility, cuda_lib_gl.py:3072-3100)."""
    def extremity(f):
        lin = state.circ[f] == 0
        return lin & ((state.pos[f] == 0) | (state.pos[f] == state.l_cont[f] - 1))

    def down_splitable(f):   # next == -1
        return (state.circ[f] == 0) & (state.pos[f] == state.l_cont[f] - 1)

    def up_splitable(f):     # prev == -1
        return (state.circ[f] == 0) & (state.pos[f] == 0)

    fa_ok = extremity(f_a)
    fb_ok = jax.vmap(extremity)(nb_ids)
    fb_down = jax.vmap(down_splitable)(nb_ids)
    fb_up = jax.vmap(up_splitable)(nb_ids)

    n_nb = nb_ids.shape[0]
    mask = jnp.zeros((n_nb, N_CANDIDATES), bool)
    mask = mask.at[:, 8].set(~(fa_ok & fb_ok))
    mask = mask.at[:, 9].set(~fb_down)
    mask = mask.at[:, 11].set(~fb_down)
    mask = mask.at[:, 10].set(~fb_up)
    mask = mask.at[:, 12].set(~fb_up)
    return mask


def _neighbour_set(state, f_a, jump: JumpTable):
    """V = top-delta partners of fA plus its current prev/next
    (cuda_lib_gl.py:2850-2860). Fixed length delta + 2 with validity mask."""
    base = jump.frags[f_a]
    prev, nxt = _prev_next(state, f_a)
    ids = jnp.concatenate([base, jnp.stack([prev, nxt])])
    valid = jnp.concatenate([
        jnp.ones(jump.delta, bool), jnp.stack([prev != -1, nxt != -1])])
    # de-duplicate (keep first occurrence) and drop self
    first_ix = jnp.arange(ids.shape[0])
    dup = (ids[:, None] == ids[None, :]) & (first_ix[None, :] < first_ix[:, None])
    valid = valid & ~jnp.any(dup & valid[None, :], axis=1) & (ids != f_a)
    return jnp.clip(ids, 0), valid


def _make_scores_for(table, obs, ll_dtype, scorer):
    """Candidate scoring shared by the MTM/MH passes: the fast ``scorer``
    (Pallas/HiC) when given, the vmapped jnp likelihood otherwise."""

    def scores_for(state, f_a, nb_ids, params):
        cands = jax.vmap(lambda fb: mh_candidates(state, f_a, fb))(nb_ids)
        if scorer is not None:
            m = nb_ids.shape[0]
            flat = jax.tree.map(
                lambda x: x.reshape((m * N_CANDIDATES,) + x.shape[2:]), cands)
            ll = scorer(flat, params).reshape(m, N_CANDIDATES)
        else:
            ll = jax.vmap(jax.vmap(
                lambda c: log_likelihood(c, table, obs, params,
                                         dtype=ll_dtype)))(cands)
        return cands, ll.astype(jnp.float32)

    return scores_for


def make_mtm_step(table: SubFragTable, obs, jump: JumpTable,
                  ll_dtype=jnp.float32, scorer=None,
                  corrected: bool = False):
    """Jitted step_mtm(state, key, params, l_t, f_a, f_t) ->
    (state, l_t, accepted, n_contigs).

    ``corrected=True`` fixes a replicated reference quirk: the backward
    pass then pivots at f* with f*'s OWN neighbour set (canonical MTM),
    instead of reusing fA's set (cuda_lib_gl.py:3010). Default replicates
    the reference for parity.
    """
    obs = jnp.asarray(obs, jnp.float32)
    scores_for = _make_scores_for(table, obs, ll_dtype, scorer)

    def weights(ll_flat, discard_flat, f_t, thresh):
        s = ll_flat / f_t
        mx = jnp.max(jnp.where(discard_flat, -jnp.inf, s))
        s = jnp.where(s <= mx - thresh, -jnp.inf, s)
        w = jnp.exp(s - mx)
        w = jnp.where(discard_flat, 0.0, w)
        return w, mx

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_fwd, k_acc = jax.random.split(key)
        nb_ids, nb_valid = _neighbour_set(state, f_a, jump)

        # ---- forward pass ----
        cands_f, ll_f = scores_for(state, f_a, nb_ids, params)
        discard_f = _impossibility_mask(state, f_a, nb_ids) | ~nb_valid[:, None]
        w_f, max_f = weights(ll_f.reshape(-1), discard_f.reshape(-1), f_t,
                             MTM_THRESH_OVERFLOW)
        p_f = w_f / jnp.sum(w_f)
        omega = jax.random.categorical(k_fwd, jnp.log(jnp.where(p_f > 0, p_f, 1e-30)))
        sel_nb = omega // N_CANDIDATES
        sel_op = omega % N_CANDIDATES
        g_star = jax.tree.map(lambda x: x[sel_nb, sel_op], cands_f)
        ll_star = ll_f.reshape(-1)[omega]
        f_star = nb_ids[sel_nb]

        # ---- backward pass: pivot at f* ----
        if corrected:
            # canonical MTM: the return proposal draws from f*'s own
            # jumping distribution
            bk_ids, bk_valid = _neighbour_set(g_star, f_star, jump)
        else:
            # reference quirk: V_set of fA reused (cuda_lib_gl.py:3010)
            bk_ids, bk_valid = nb_ids, nb_valid
        _, ll_b = scores_for(g_star, f_star, bk_ids, params)
        discard_b = _impossibility_mask(g_star, f_a, bk_ids) | ~bk_valid[:, None]
        w_b, max_b = weights(ll_b.reshape(-1), discard_b.reshape(-1), f_t,
                             MTM_THRESH_OVERFLOW)

        ratio = jnp.exp(max_f - max_b) * jnp.sum(w_f) / jnp.sum(w_b)
        accept = jnp.minimum(ratio, 1.0) >= jax.random.uniform(k_acc, ())
        new_state = GenomeState(*[jnp.where(accept, a, b)
                                  for a, b in zip(g_star, state)])
        new_l = jnp.where(accept, ll_star, l_t)
        return new_state, new_l, accept, new_state.n_contigs()

    return step


def make_mh_step(table: SubFragTable, obs, jump: JumpTable,
                 ll_dtype=jnp.float32, scorer=None,
                 corrected: bool = False):
    """Jitted plain Metropolis-Hastings step
    (step_metropolis_hastings_s_a, cuda_lib_gl.py:2836-2934).

    ``corrected=True`` uses the canonical MH ratio
    exp((L* - L_t)/F_t) * p_bwd / p_fwd; the default replicates the
    reference, which ADDS the proposal probabilities to the
    log-likelihoods inside the exponent (cuda_lib_gl.py:2913).
    """
    obs = jnp.asarray(obs, jnp.float32)
    scores_for = _make_scores_for(table, obs, ll_dtype, scorer)

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_fwd, k_acc = jax.random.split(key)
        nb_ids, nb_valid = _neighbour_set(state, f_a, jump)

        cands_f, ll_f = scores_for(state, f_a, nb_ids, params)
        discard_f = _impossibility_mask(state, f_a, nb_ids) | ~nb_valid[:, None]
        s = ll_f.reshape(-1) / f_t
        mx = jnp.max(jnp.where(discard_f.reshape(-1), -jnp.inf, s))
        s = jnp.maximum(s, mx - MH_THRESH_OVERFLOW)
        s = s - jnp.min(s)
        w = jnp.where(discard_f.reshape(-1), 0.0, jnp.exp(s))
        p = w / jnp.sum(w)
        omega = jax.random.categorical(k_fwd, jnp.log(jnp.where(p > 0, p, 1e-30)))
        sel_nb, sel_op = omega // N_CANDIDATES, omega % N_CANDIDATES
        g_star = jax.tree.map(lambda x: x[sel_nb, sel_op], cands_f)
        ll_star = ll_f.reshape(-1)[omega]
        p_fwd = p[omega]

        # backward proposal probability of returning to the current genome
        _, ll_b = scores_for(g_star, f_a, nb_ids, params)
        discard_b = _impossibility_mask(g_star, f_a, nb_ids) | ~nb_valid[:, None]
        sb = ll_b.reshape(-1) / f_t
        mxb = jnp.max(jnp.where(discard_b.reshape(-1), -jnp.inf, sb))
        target = jnp.maximum(l_t / f_t, mxb - MH_THRESH_OVERFLOW)
        sb = jnp.maximum(sb, mxb - MH_THRESH_OVERFLOW)
        target = target - jnp.min(sb)
        sb = sb - jnp.min(sb)
        wb = jnp.where(discard_b.reshape(-1), 0.0, jnp.exp(sb))
        p_bwd = jnp.exp(target) / jnp.sum(wb)

        if corrected:
            ratio = jnp.exp((ll_star - l_t) / f_t) \
                * p_bwd / jnp.maximum(p_fwd, 1e-30)
        else:
            # reference form: probabilities added to log-likelihoods
            ratio = jnp.exp((ll_star + p_bwd - l_t - p_fwd) / f_t)
        accept = jnp.minimum(ratio, 1.0) >= jax.random.uniform(k_acc, ())
        new_state = GenomeState(*[jnp.where(accept, a, b)
                                  for a, b in zip(g_star, state)])
        new_l = jnp.where(accept, ll_star, l_t)
        return new_state, new_l, accept, new_state.n_contigs()

    return step


def make_mtm_cycle(table: SubFragTable, obs, jump: JumpTable, variant="mtm",
                   ll_dtype=jnp.float32, scorer=None,
                   corrected: bool = False):
    """One full MTM/MH cycle over a fragment order as a lax.scan
    (the start_MTM inner loop, main_gl.py:361-379)."""
    step = (make_mtm_step if variant == "mtm" else make_mh_step)(
        table, obs, jump, ll_dtype, scorer=scorer, corrected=corrected)

    @jax.jit
    def cycle(state: GenomeState, key, params: RippeParams, frag_order, l_t, f_t):
        def body(carry, f_a):
            state, key, l_t = carry
            key, sub = jax.random.split(key)
            state, l_t, accepted, n_contigs = step(state, sub, params, l_t,
                                                   f_a, f_t)
            return (state, key, l_t), (l_t, accepted, n_contigs)

        (state, key, l_t), (lls, accepts, n_contigs) = jax.lax.scan(
            body, (state, key, l_t), frag_order)
        return state, l_t, (lls, accepts, n_contigs)

    return cycle


def _delta_mh_scorer(table: SubFragTable, f_max: int, sobs,
                     band_w: int | None, catalogue):
    """Incremental scorer for the MH/MTM samplers: banded pair-grid engine
    for repeat-free tables, copy-summing data-grid engine for
    copy-expanded ones (the reference drives both samplers through the
    same dispatcher machinery, cuda_lib_gl.py:2936-3069 +
    kernels3.cu:2895-2929)."""
    from graal_tpu.core import delta as delta_mod

    if table.has_repeats:
        from graal_tpu.core import delta_repeats

        return delta_repeats.make_repeat_delta_scorer_v2(
            table, f_max, sobs, catalogue=catalogue)
    return delta_mod.make_delta_scorer(
        table, None, f_max, sobs=sobs,
        band_w=delta_mod.effective_band_w(band_w, table, f_max),
        catalogue=catalogue)


def make_delta_mtm_step(table: SubFragTable, jump: JumpTable, f_max: int,
                        sobs, band_w: int | None = None,
                        corrected: bool = False):
    """MTM step with incremental (delta) candidate scoring — the chr1-scale
    refinement sampler. Copy-expanded (repeat) tables route to the
    repeat-aware delta engine (core.delta_repeats) with the MH catalogue.

    Candidate log-likelihoods are reconstructed from carried anchors:
    forward ll = l_t + dL (both passes of the MTM ratio only ever compare
    lls through differences and softmax weights, so the anchors make the
    delta formulation EXACTLY the absolute one). The chosen candidate is
    committed into the full state via scatter_mini before the backward
    pass; a step whose forward or backward mini-state overflows ``f_max``
    is rejected outright (rare with adequately sized buckets — callers
    grow f_max like the EM path).

    Returns step(state, key, params, l_t, f_a, f_t) ->
    (state, l_t, accepted, n_contigs).
    """
    from graal_tpu.core import delta as delta_mod
    from graal_tpu.core.candidates import mh_candidates

    dscore = _delta_mh_scorer(table, f_max, sobs, band_w, mh_candidates)

    def weights(ll_flat, discard_flat, f_t, thresh):
        s = ll_flat / f_t
        mx = jnp.max(jnp.where(discard_flat, -jnp.inf, s))
        s = jnp.where(s <= mx - thresh, -jnp.inf, s)
        w = jnp.exp(s - mx)
        w = jnp.where(discard_flat, 0.0, w)
        return w, mx

    def score_set(state, pivot, nb_ids, params, max_id, with_circ):
        def one(fb):
            return dscore.spec(state, pivot, fb, params, max_id, with_circ)

        return jax.vmap(one)(nb_ids)

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_fwd, k_acc = jax.random.split(key)
        nb_ids, nb_valid = _neighbour_set(state, f_a, jump)
        max_id = jnp.max(state.id_c)
        any_circ = jnp.any(state.circ == 1) | \
            jnp.any(state.id_c[nb_ids] == state.id_c[f_a])

        # ---- forward pass ----
        def fwd(with_circ):
            return lambda _: score_set(state, f_a, nb_ids, params, max_id,
                                       with_circ)

        dll_f, minis_f, rows_f, rvalid_f, over_f = jax.lax.cond(
            any_circ, fwd(True), fwd(False), operand=None)
        ll_f = l_t + dll_f
        discard_f = _impossibility_mask(state, f_a, nb_ids) \
            | ~nb_valid[:, None] | over_f[:, None]
        w_f, max_f = weights(ll_f.reshape(-1), discard_f.reshape(-1), f_t,
                             MTM_THRESH_OVERFLOW)
        any_f = jnp.sum(w_f) > 0
        p_f = w_f / jnp.maximum(jnp.sum(w_f), 1e-30)
        omega = jax.random.categorical(
            k_fwd, jnp.log(jnp.where(p_f > 0, p_f, 1e-30)))
        sel_nb = omega // N_CANDIDATES
        sel_op = omega % N_CANDIDATES
        sel_mini = jax.tree.map(lambda x: x[sel_nb, sel_op], minis_f)
        g_star = delta_mod.scatter_mini(state, sel_mini, rows_f[sel_nb],
                                        rvalid_f[sel_nb])
        ll_star = ll_f.reshape(-1)[omega]
        f_star = nb_ids[sel_nb]

        # ---- backward pass: pivot at f* from the committed genome ----
        if corrected:
            bk_ids, bk_valid = _neighbour_set(g_star, f_star, jump)
        else:
            bk_ids, bk_valid = nb_ids, nb_valid
        max_id_b = jnp.max(g_star.id_c)
        any_circ_b = jnp.any(g_star.circ == 1) | \
            jnp.any(g_star.id_c[bk_ids] == g_star.id_c[f_star])

        def bwd(with_circ):
            return lambda _: score_set(g_star, f_star, bk_ids, params,
                                       max_id_b, with_circ)

        dll_b, _, _, _, over_b = jax.lax.cond(
            any_circ_b, bwd(True), bwd(False), operand=None)
        ll_b = ll_star + dll_b
        discard_b = _impossibility_mask(g_star, f_a, bk_ids) \
            | ~bk_valid[:, None] | over_b[:, None]
        w_b, max_b = weights(ll_b.reshape(-1), discard_b.reshape(-1), f_t,
                             MTM_THRESH_OVERFLOW)

        ratio = jnp.exp(max_f - max_b) * jnp.sum(w_f) \
            / jnp.maximum(jnp.sum(w_b), 1e-30)
        ok = any_f & ~jnp.any(over_f[sel_nb]) & (jnp.sum(w_b) > 0)
        accept = ok & (jnp.minimum(ratio, 1.0) >= jax.random.uniform(k_acc, ()))
        new_state = GenomeState(*[jnp.where(accept, a, b)
                                  for a, b in zip(g_star, state)])
        new_l = jnp.where(accept, ll_star, l_t)
        return new_state, new_l, accept, new_state.n_contigs()

    return step


def make_delta_mh_step(table: SubFragTable, jump: JumpTable, f_max: int,
                       sobs, band_w: int | None = None,
                       corrected: bool = False):
    """Plain Metropolis-Hastings with incremental scoring — the delta twin
    of :func:`make_mh_step` (see :func:`make_delta_mtm_step` for the
    carried-anchor argument; the MH ratio additionally consumes the
    absolute ``l_t`` for the backward return probability, which the
    carried anchor provides directly). Repeat tables route to the
    copy-summing delta engine like the MTM variant."""
    from graal_tpu.core import delta as delta_mod
    from graal_tpu.core.candidates import mh_candidates

    dscore = _delta_mh_scorer(table, f_max, sobs, band_w, mh_candidates)

    def score_set(state, pivot, nb_ids, params, max_id, with_circ):
        def one(fb):
            return dscore.spec(state, pivot, fb, params, max_id, with_circ)

        return jax.vmap(one)(nb_ids)

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_fwd, k_acc = jax.random.split(key)
        nb_ids, nb_valid = _neighbour_set(state, f_a, jump)
        max_id = jnp.max(state.id_c)
        any_circ = jnp.any(state.circ == 1) | \
            jnp.any(state.id_c[nb_ids] == state.id_c[f_a])

        def fwd(with_circ):
            return lambda _: score_set(state, f_a, nb_ids, params, max_id,
                                       with_circ)

        dll_f, minis_f, rows_f, rvalid_f, over_f = jax.lax.cond(
            any_circ, fwd(True), fwd(False), operand=None)
        ll_f = l_t + dll_f
        discard_f = _impossibility_mask(state, f_a, nb_ids) \
            | ~nb_valid[:, None] | over_f[:, None]
        s = ll_f.reshape(-1) / f_t
        mx = jnp.max(jnp.where(discard_f.reshape(-1), -jnp.inf, s))
        s = jnp.maximum(s, mx - MH_THRESH_OVERFLOW)
        s = s - jnp.min(s)
        w = jnp.where(discard_f.reshape(-1), 0.0, jnp.exp(s))
        any_f = jnp.sum(w) > 0
        p = w / jnp.maximum(jnp.sum(w), 1e-30)
        omega = jax.random.categorical(
            k_fwd, jnp.log(jnp.where(p > 0, p, 1e-30)))
        sel_nb, sel_op = omega // N_CANDIDATES, omega % N_CANDIDATES
        sel_mini = jax.tree.map(lambda x: x[sel_nb, sel_op], minis_f)
        g_star = delta_mod.scatter_mini(state, sel_mini, rows_f[sel_nb],
                                        rvalid_f[sel_nb])
        ll_star = ll_f.reshape(-1)[omega]
        p_fwd = p[omega]

        # backward return probability (pivot fA, the reference's choice)
        max_id_b = jnp.max(g_star.id_c)
        any_circ_b = jnp.any(g_star.circ == 1) | \
            jnp.any(g_star.id_c[nb_ids] == g_star.id_c[f_a])

        def bwd(with_circ):
            return lambda _: score_set(g_star, f_a, nb_ids, params,
                                       max_id_b, with_circ)

        dll_b, _, _, _, over_b = jax.lax.cond(
            any_circ_b, bwd(True), bwd(False), operand=None)
        ll_b = ll_star + dll_b
        discard_b = _impossibility_mask(g_star, f_a, nb_ids) \
            | ~nb_valid[:, None] | over_b[:, None]
        sb = ll_b.reshape(-1) / f_t
        mxb = jnp.max(jnp.where(discard_b.reshape(-1), -jnp.inf, sb))
        target = jnp.maximum(l_t / f_t, mxb - MH_THRESH_OVERFLOW)
        sb = jnp.maximum(sb, mxb - MH_THRESH_OVERFLOW)
        target = target - jnp.min(sb)
        sb = sb - jnp.min(sb)
        wb = jnp.where(discard_b.reshape(-1), 0.0, jnp.exp(sb))
        p_bwd = jnp.exp(target) / jnp.maximum(jnp.sum(wb), 1e-30)

        if corrected:
            ratio = jnp.exp((ll_star - l_t) / f_t) \
                * p_bwd / jnp.maximum(p_fwd, 1e-30)
        else:
            ratio = jnp.exp((ll_star + p_bwd - l_t - p_fwd) / f_t)
        ok = any_f & ~jnp.any(over_f[sel_nb]) & (jnp.sum(wb) > 0)
        accept = ok & (jnp.minimum(ratio, 1.0) >= jax.random.uniform(k_acc, ()))
        new_state = GenomeState(*[jnp.where(accept, a, b)
                                  for a, b in zip(g_star, state)])
        new_l = jnp.where(accept, ll_star, l_t)
        return new_state, new_l, accept, new_state.n_contigs()

    return step
