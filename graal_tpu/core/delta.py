"""Incremental (delta) candidate scoring over affected rows only.

The reference's hot kernel scores each candidate by recomputing only the
pixel pairs touched by the mutation (sub_compute_likelihood,
kernels3.cu:3259-3718; workload sizing cuda_lib_gl.py:2477-2483) and adds
the cached baseline: score = dL + L_t. This module is the TPU-native
equivalent with static shapes:

- the *changed set* D of a candidate = sub-fragments whose owner's
  likelihood-relevant fields (id_c, start_bp, ori, circ, l_cont_bp, activ)
  differ from the base genome — derived by comparison, not by tracking
  contig membership (over-inclusive relabelling is harmless),
- dL = [H(cand) - P(cand)] - [H(base) - P(base)] where
  H = sum over u in D, v != u of the pairwise log-pmf g(u,v) (counts D-D
  pairs twice) and P = sum over unordered D-D pairs, so H - P is exactly
  the sum over pairs touching D,
- D is padded to a static ``r_max`` rows; candidates whose changed set
  exceeds r_max return a finite sentinel dL plus an overflow flag that is
  folded into the selection validity mask (so an overflowing candidate can
  never poison the score window) — callers pick r_max from the current
  contig-size regime (cheap early in assembly, growing as contigs
  coalesce, exactly like the reference's l_cont-proportional workload).
  When every slot overflows the step is a no-op.

Work per candidate: O(r_max * K) instead of O(K^2). Repeat-free geometry
only (the repeat path keeps full scoring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graal_tpu.core.model import RippeParams, poisson_loglik, rippe_contacts, rippe_contacts_circ
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable

# fields whose change affects a fragment's likelihood contribution
_LL_FIELDS = ("id_c", "start_bp", "ori", "circ", "l_cont_bp", "activ")


def _sub_geometry(state: GenomeState, table: SubFragTable):
    start_kb = state.start_bp[table.owner].astype(jnp.float32) / 1000.0
    ori = state.ori[table.owner]
    mid = start_kb + jnp.where(ori == 1, table.prefix_kb, table.suffix_kb) \
        + table.len_kb * 0.5
    return dict(
        mid=mid,
        idc=state.id_c[table.owner],
        circ=state.circ[table.owner],
        stot=state.l_cont_bp[table.owner].astype(jnp.float32) / 1000.0,
        activ=state.activ[table.owner],
    )


def _pair_ll(rows_geo, all_geo, obs_rows, accu_rows, accu_all, nfpb,
             params: RippeParams):
    """(R, K) pairwise log-pmf between the row subset and all subs."""
    s = jnp.abs(rows_geo["mid"][:, None] - all_geo["mid"][None, :])
    same = rows_geo["idc"][:, None] == all_geo["idc"][None, :]
    act = (rows_geo["activ"][:, None] == 1) & (all_geo["activ"][None, :] == 1)
    norm_accu = accu_rows[:, None] * accu_all[None, :] / nfpb
    cis_lin = rippe_contacts(s, params)
    cis_circ = rippe_contacts_circ(s, rows_geo["stot"][:, None], params)
    cis = jnp.where(rows_geo["circ"][:, None] == 1, cis_circ, cis_lin)
    e = jnp.where(same, cis, params.v_inter) * norm_accu
    e = jnp.where(act, e, 0.0)
    return poisson_loglik(e, obs_rows)


def changed_subs(base: GenomeState, cand: GenomeState, table: SubFragTable):
    """(K,) bool: sub-fragments whose owner changed in a likelihood-relevant
    field."""
    diff = jnp.zeros(base.n_frags, bool)
    for f in _LL_FIELDS:
        diff = diff | (getattr(base, f) != getattr(cand, f))
    return diff[table.owner]


def make_delta_scorer(table: SubFragTable, obs, r_max: int):
    """Build dscore(base, cands_batch, params) -> (dL (B,), overflow (B,))."""
    assert not table.has_repeats, "delta scoring requires repeat-free tables"
    obs = jnp.asarray(obs, jnp.float32)
    k = table.n_subs
    nfpb = jnp.float32(table.n_frags_per_bins)
    accu = table.accu

    def one(base_geo, base: GenomeState, cand: GenomeState, params):
        ch = changed_subs(base, cand, table)
        m = jnp.sum(ch)
        overflow = m > r_max
        _, rows = jax.lax.top_k(ch.astype(jnp.int32), r_max)
        row_valid = ch[rows]
        rows_c = jnp.clip(rows, 0, k - 1)

        cand_geo = _sub_geometry(cand, table)
        obs_rows = obs[rows_c]
        accu_rows = accu[rows_c]

        def masked_sum_H(geo):
            rows_geo = {kk: v[rows_c] for kk, v in geo.items()}
            g = _pair_ll(rows_geo, geo, obs_rows, accu_rows, accu, nfpb, params)
            # exclude self pairs and invalid rows
            not_self = rows_c[:, None] != jnp.arange(k)[None, :]
            g = jnp.where(not_self & row_valid[:, None], g, 0.0)
            return jnp.sum(g, axis=1)

        def masked_sum_P(geo):
            rows_geo = {kk: v[rows_c] for kk, v in geo.items()}
            s_obs = obs[rows_c[:, None], rows_c[None, :]]
            g = _pair_ll(rows_geo, rows_geo, s_obs, accu_rows, accu_rows,
                         nfpb, params)
            upper = rows_c[:, None] < rows_c[None, :]
            valid = row_valid[:, None] & row_valid[None, :]
            return jnp.sum(jnp.where(upper & valid, g, 0.0))

        h_c = jnp.sum(masked_sum_H(cand_geo))
        h_0 = jnp.sum(masked_sum_H(base_geo))
        p_c = masked_sum_P(cand_geo)
        p_0 = masked_sum_P(base_geo)
        d = (h_c - p_c) - (h_0 - p_0)
        # finite sentinel: overflow exclusion happens via the validity mask
        # in the selection step, never via the score value itself
        return jnp.where(overflow, 0.0, d), overflow

    def dscore(base: GenomeState, cands_batch: GenomeState, params: RippeParams):
        base_geo = _sub_geometry(base, table)
        return jax.vmap(lambda c: one(base_geo, base, c, params))(cands_batch)

    return dscore


def make_delta_em_step(table: SubFragTable, obs, nb, delta: int, r_max: int):
    """EM step variant scoring candidates by dL (shift-equivalent to the
    absolute scores; the selection filter is shift-invariant). Returns
    step(state, key, params, l_t, f_a, f_t) ->
    (state, l_t_new, (op, fb, n_overflow)).

    ``l_t`` is carried incrementally (l_t += dL of the committed move) —
    callers should re-anchor with a full evaluation once per cycle to stop
    f32 drift (the reference recomputes the full likelihood every step,
    cuda_lib_gl.py:1828-1848).
    """
    from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
    from graal_tpu.core.mcmc import sample_neighbours, select_score_slot

    dscore = make_delta_scorer(table, obs, r_max)

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_nb, k_sel = jax.random.split(key)
        ids, valid = sample_neighbours(k_nb, f_a, state, nb, delta)
        cands = jax.vmap(lambda fb: build_candidates(state, f_a, fb))(ids)
        m = ids.shape[0]
        flat = jax.tree.map(
            lambda x: x.reshape((m * N_CANDIDATES,) + x.shape[2:]), cands)
        dll, overflow = dscore(state, flat, params)
        dll = dll.reshape(m, N_CANDIDATES)
        slot_ok = ~overflow.reshape(m, N_CANDIDATES)

        sel = select_score_slot(k_sel, dll, valid, f_t, slot_valid=slot_ok)
        new_state = jax.tree.map(
            lambda x: x[sel // N_CANDIDATES, sel % N_CANDIDATES], cands)
        # no-op fallback when every selectable slot overflows
        op_idx = jnp.arange(N_CANDIDATES)[None, :]
        nb_idx = jnp.arange(m)[:, None]
        base_ok = (valid[:, None] | ((nb_idx == 0) & (op_idx < 2))) \
            & ~((op_idx < 2) & (nb_idx > 0))
        any_ok = jnp.any(base_ok & slot_ok)
        skip = nb.blacklist[f_a] | ~any_ok
        new_state = GenomeState(*[jnp.where(skip, a, b)
                                  for a, b in zip(state, new_state)])
        d_sel = jnp.where(skip, 0.0, dll.reshape(-1)[sel])
        return new_state, l_t + d_sel, (
            jnp.where(skip, -1, sel % N_CANDIDATES),
            jnp.where(skip, f_a, ids[sel // N_CANDIDATES]),
            jnp.sum(overflow))

    return step


def make_delta_em_cycle(table: SubFragTable, obs, nb, delta: int, r_max: int):
    """Full delta-scored EM cycle as a lax.scan, with a final full
    re-anchoring of the likelihood."""
    from graal_tpu.core.likelihood import log_likelihood

    step = make_delta_em_step(table, obs, nb, delta, r_max)
    obs_j = jnp.asarray(obs, jnp.float32)

    @jax.jit
    def cycle(state: GenomeState, key, params: RippeParams, frag_order, l_t, f_t):
        def body(carry, f_a):
            state, key, l_t = carry
            key, sub = jax.random.split(key)
            state, l_t, (op, fb, n_over) = step(state, sub, params, l_t, f_a, f_t)
            return (state, key, l_t), (l_t, op, fb, n_over,
                                       state.n_contigs())

        (state, key, l_t), (lls, ops_, fbs, overs, ncs) = jax.lax.scan(
            body, (state, key, l_t), frag_order)
        l_anchor = log_likelihood(state, table, obs_j, params)
        return state, l_anchor, (lls, ops_, fbs, overs, ncs)

    return cycle
