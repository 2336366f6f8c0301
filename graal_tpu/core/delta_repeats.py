"""Incremental (delta) candidate scoring for repeat (copy-expanded) tables.

The plain delta engine (core.delta) scores on copy pairs directly: without
repeats, copy rows ARE data rows, so the Poisson term of a pair is a closed
form of the two rows' geometry and everything outside the affected contigs
cancels. With repeated bins that breaks down: the observed count lives on
the *data* grid, and its expectation is a SUM over active copy pairs
(dispatcher loop, kernels3.cu:2895-2929) —

    E_data(s, t) = sum_{u in copies(s), v in copies(t)} E(u, v)

so the log term needs the full sum, including copies that live in contigs
the mutation never touches.  This module keeps the O(|D|^2)-style locality
anyway, by splitting each affected observed pair into:

- copies owned by the affected contigs D  -> candidate mini-state geometry
  (changes per candidate),
- copies owned by any other contig        -> base-state geometry (frozen
  across all candidates — a mutation only relabels fragments inside D,
  core/delta.py module docstring).

Every copy of every data bin touched by D is enumerated through a static
bin -> copy-rows CSR (the dispatcher table, simulation_loader.py:258-277),
so each observed window entry costs a c_max x c_max block of copy pairs
(c_max = max copies per bin; 1 without repeats, small with them).

The expected-mass term stays pairwise-decomposable even with repeats
(sum over data pairs == sum over copy pairs, minus the data-grid diagonal,
which the likelihood excludes): it is the mini pair grid with same-data-bin
pairs masked out, plus an analytic trans cross-term against the rest of the
genome that is non-zero only when a candidate toggles copy *activity*
(swap_activity) — the one mutation whose effect is not confined to D x D.

Gather-only throughout (no device scatters), same contract as
core.delta.make_delta_scorer: dll is exactly
log_likelihood(candidate) - log_likelihood(base) whenever overflow is
False.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.candidates import build_candidates
from graal_tpu.core.delta import (_log_cis, build_mini_table, extract_rows,
                                  gather_mini)
from graal_tpu.core.model import (_STIRLING_LIM, RippeParams,
                                  _log_factorial_ref)
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


class CopyTable(NamedTuple):
    """Static data-bin -> copy-sub-rows CSR (the dispatcher direction —
    the reference keeps collector/dispatcher int2 arrays,
    simulation_loader.py:258-277)."""

    copy_start: jnp.ndarray   # (S + 1,) int32 indptr over data bins
    copy_rows: jnp.ndarray    # (K,) int32 sub rows sorted by data_id
    c_max: int                # max copies of any data bin


def build_copy_table(table: SubFragTable) -> CopyTable:
    data_id = np.asarray(table.data_id)
    s_dim = table.n_data_sub
    order = np.argsort(data_id, kind="stable")
    counts = np.bincount(data_id, minlength=s_dim)
    start = np.concatenate([[0], np.cumsum(counts)])
    return CopyTable(
        copy_start=jnp.asarray(start, jnp.int32),
        copy_rows=jnp.asarray(order, jnp.int32),
        c_max=int(counts.max()) if len(counts) else 1)


def make_repeat_delta_scorer(table: SubFragTable, f_max: int, sobs,
                             candidate_batch: str = "vmap",
                             catalogue=None):
    """Repeat-aware delta scorer over CSR windows of the data grid.

    ``sobs``: core.sparse.SparseObs on the data grid (dense callers convert
    via sparse.sparse_from_dense — the repeat path is window-only).

    ``catalogue``: the 13-candidate builder applied to the mini-state —
    defaults to the EM catalogue (core.candidates.build_candidates); pass
    core.candidates.mh_candidates for the MH/MTM samplers (the dispatcher
    machinery is shared across samplers in the reference too,
    cuda_lib_gl.py:2936-3069 with kernels3.cu:2895-2929).

    Returns the same ``(dscore, dscore.spec)`` contract as
    core.delta.make_delta_scorer.
    """
    if catalogue is None:
        catalogue = build_candidates
    mt = build_mini_table(table, allow_repeats=True)
    ct = build_copy_table(table)
    f_max = min(f_max, mt.n_frags)
    s_max = mt.s_max
    r_max = f_max * s_max
    c_max = ct.c_max
    k_subs = table.n_subs
    s_dim = table.n_data_sub
    nnz = sobs.cols.shape[0]
    nfpb = jnp.float32(table.n_frags_per_bins)
    # WIDE (col, val) window storage, built once on the SparseObs (see
    # core.delta window_cols_vals for the layout and gather rationale);
    # windows here are (R, cap) with cap the 8-aligned padded width
    n_ch = (sobs.row_cap + 14) // 8
    cap = n_ch * 8
    packed = sobs.packed

    sub_len = table.len_kb
    sub_pre = table.prefix_kb
    sub_suf = table.suffix_kb
    sub_accu = table.accu
    owner = table.owner
    data_id = table.data_id

    # global active accu mass (per-step O(K) reduce; the swap_activity
    # trans cross-term needs the genome total)
    def total_active_accu(state: GenomeState):
        return jnp.sum(sub_accu * (state.activ[owner] == 1))

    def sub_rows_of(rows, valid):
        start = mt.sub_start[rows]
        count = mt.sub_count[rows]
        slot = jnp.arange(s_max, dtype=jnp.int32)[None, :]
        subs = start[:, None] + slot
        sub_valid = valid[:, None] & (slot < count[:, None])
        owner_slot = jnp.broadcast_to(
            jnp.arange(rows.shape[0], dtype=jnp.int32)[:, None], subs.shape)
        return (subs.reshape(-1), sub_valid.reshape(-1),
                owner_slot.reshape(-1))

    row_i = jax.lax.broadcasted_iota(jnp.int32, (r_max, r_max), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (r_max, r_max), 1)
    strict_upper = col_i > row_i

    def copy_slots(krows, inv_f):
        """Candidate-independent routing of arbitrary copy rows ``krows``:
        owner fragment, membership in D, and the mini slot when inside —
        one gather round through the inverse slot map (a sorted search
        costs log2(f_max) serial gather rounds; see core.delta)."""
        g = owner[krows]
        slot = inv_f[g]
        return g, slot >= 0, jnp.maximum(slot, 0)

    _FIELDS = ("start_bp", "ori", "id_c", "circ", "l_cont_bp", "activ")

    def base_fields(state, g):
        """All 6 routed fields in ONE gather from the full state (the
        gather cost is per row fetched, not per element; see core.delta)."""
        mat = jnp.stack([getattr(state, f) for f in _FIELDS], axis=1)
        got = mat[g]                                  # g.shape + (6,)
        return {f: got[..., k] for k, f in enumerate(_FIELDS)}

    def pair_e(gu, gv, ok, params, with_circ):
        """Linear expected contacts of copy pairs (broadcast shapes)."""
        s = jnp.abs(gu["mid"] - gv["mid"])
        same = gu["idc"] == gv["idc"]
        log_cis = _log_cis(s, gu["circ"], gu["stot"], params, with_circ)
        e = jnp.where(same, jnp.exp(log_cis), params.v_inter) \
            * gu["a"] * gv["a"] / nfpb
        return jnp.where(ok, e, 0.0)

    def dscore_spec(state: GenomeState, f_a, f_b, params: RippeParams,
                    max_id, with_circ: bool):
        n = state.n_frags
        rows, valid, overflow = extract_rows(state, f_a, f_b, f_max)
        mini = gather_mini(state, rows, valid)
        lf_a = jnp.argmax(rows == f_a).astype(jnp.int32)
        lf_b = jnp.argmax(rows == f_b).astype(jnp.int32)
        cands = catalogue(mini, lf_a, lf_b, max_id=max_id)

        subs, sub_valid, owner_slot = sub_rows_of(rows, valid)
        subs_c = jnp.clip(subs, 0, k_subs - 1)
        db = data_id[subs_c]                                   # (R,)
        vrows = jnp.where(valid, rows, n)
        # fragment-level inverse slot map (f_max-element scatter; padding
        # rows target index n -> dropped)
        inv_f = jnp.full((n,), -1, jnp.int32).at[vrows].set(
            jnp.arange(f_max, dtype=jnp.int32), mode="drop")

        # ---- observed windows over the DISTINCT data bins of D ----------
        # data-bin inverse map: nondeterministic winner among copies of the
        # same bin is fine — any single visitor slot works for both the
        # first-occurrence dedup and the t-membership test
        inv_db = jnp.full((s_dim,), -1, jnp.int32).at[
            jnp.where(sub_valid, db, s_dim)].set(
            jnp.arange(r_max, dtype=jnp.int32), mode="drop")
        first = inv_db[jnp.clip(db, 0, s_dim - 1)] \
            == jnp.arange(r_max, dtype=jnp.int32)

        db_c = jnp.clip(db, 0, s_dim - 1)
        w_start = jnp.minimum(sobs.row_start[db_c], nnz)
        w_end = sobs.row_start[db_c + 1]
        # wide window fetch: one fast-path gather row per 8 entries (see
        # core/delta.py window_cols_vals; entries are lane-shifted by
        # w_start % 8, which every consumer below ignores)
        base = w_start >> 3
        rows_w = base[:, None] + jnp.arange(n_ch, dtype=jnp.int32)
        pk = packed[rows_w.reshape(-1)].reshape((r_max, n_ch, 8, 2))
        g = rows_w[:, :, None] * 8 \
            + jnp.arange(8, dtype=jnp.int32)[None, None, :]
        win_valid = ((g >= w_start[:, None, None])
                     & (g < w_end[:, None, None])
                     & (sub_valid & first)[:, None, None]
                     ).reshape((r_max, cap))
        pk = pk.reshape((r_max, cap, 2))
        t_bin = pk[..., 0]
        ob = jax.lax.bitcast_convert_type(pk[..., 1], jnp.float32)
        t_in_d = inv_db[jnp.clip(t_bin, 0, s_dim - 1)] >= 0
        # log(ob!) (reference branch split, kernels3.cu:80-93 / :169-210):
        # cancels in the delta while E stays > 0 on both sides, but when a
        # candidate drives E_data to 0 (all copies deactivated) the
        # reference drops the WHOLE pmf term including the factorial — so
        # the factorial must ride inside the E > 0 indicator.
        safe_ob = jnp.where(ob > 0.0, ob, 1.0)
        lf_big = safe_ob * jnp.log(safe_ob) - safe_ob \
            + 0.5 * jnp.log(safe_ob * 2.0 * np.pi)
        lf = jnp.where(ob >= _STIRLING_LIM, lf_big,
                       jnp.where(ob > 0.0, _log_factorial_ref(safe_ob), 0.0))
        # each in-D..in-D pair appears from both rows -> weight 0.5; a pair
        # with t outside data(D) appears once -> weight 1
        weight = jnp.where(t_in_d, 0.5, 1.0)
        win_valid = win_valid & (t_bin != db[:, None])

        # ---- copy enumeration (static CSR; candidate-independent) -------
        ci = jnp.arange(c_max, dtype=jnp.int32)
        u0 = ct.copy_start[db_c]
        u_rows = ct.copy_rows[jnp.clip(u0[:, None] + ci[None, :],
                                       0, k_subs - 1)]          # (R, c)
        u_ok = ci[None, :] < (ct.copy_start[db_c + 1] - u0)[:, None]
        t_c = jnp.clip(t_bin, 0, s_dim - 1)
        v0 = ct.copy_start[t_c]
        v_rows = ct.copy_rows[jnp.clip(v0[:, :, None] + ci[None, None, :],
                                       0, k_subs - 1)]          # (R, cap, c)
        v_ok = ci[None, None, :] < (ct.copy_start[t_c + 1] - v0)[:, :, None]

        u_g, u_in, u_slot = copy_slots(u_rows, inv_f)
        v_g, v_in, v_slot = copy_slots(v_rows, inv_f)
        u_base = base_fields(state, u_g)
        v_base = base_fields(state, v_g)

        # mini-row geometry slots
        mini_rows = subs_c

        def mini_geometry(cand):
            start_kb = cand.start_bp[owner_slot].astype(jnp.float32) / 1000.0
            ori = cand.ori[owner_slot]
            mid = start_kb + jnp.where(ori == 1, sub_pre[mini_rows],
                                       sub_suf[mini_rows]) \
                + sub_len[mini_rows] * 0.5
            return dict(
                mid=mid, idc=cand.id_c[owner_slot],
                circ=cand.circ[owner_slot],
                stot=cand.l_cont_bp[owner_slot].astype(jnp.float32) / 1000.0,
                a=jnp.where((cand.activ[owner_slot] == 1) & sub_valid,
                            sub_accu[mini_rows], 0.0))

        # =================================================================
        # The observed term, decomposed so NOTHING per-candidate gathers
        # copy blocks (per-candidate (R, cap, c, c) routed-geometry gathers
        # were the repeat path's analogue of the plain scorer's window
        # gathers). For an observed pair (s, t) with s in data(D):
        #
        #   E_data(s, t) = F(s, t)                 frozen x frozen
        #                + v_inter/nfpb * [ a_D(s) A_out(t)
        #                                 + A_out(s) a_D(t) ]   mixed
        #                + B(s, t)                 in-D x in-D
        #
        # - frozen copies live in non-D contigs, so mixed pairs are ALWAYS
        #   trans (a candidate contig id is a D id or a fresh id > max_id,
        #   never a non-D id) -> only activity sums, no geometry;
        # - F is candidate-independent: computed ONCE per neighbour with
        #   the frozen-only masks;
        # - B reads the candidate's (R, R) mini pair grid (shared with the
        #   expected-mass term) through c row-gathers + one einsum against
        #   a candidate-independent one-hot over the t membership.
        # =================================================================

        # mini row index of each in-D copy row (global sub g of fragment
        # with mini slot q sits at mini row q * s_max + (g - sub_start))
        u_mini = jnp.clip(u_slot * s_max
                          + (u_rows - mt.sub_start[jnp.clip(u_g, 0, None)]),
                          0, r_max - 1)
        u_in_ok = u_in & u_ok

        # t-membership one-hot over mini rows, consumed in window-axis
        # chunks: a monolithic (R, cap, R) f32 operand is ~1 GB at
        # r_max=1536/cap=80. Chunking splits the einsum OUTPUT axis, not
        # the reduction, so results are bitwise identical; each chunk is
        # candidate-independent (XLA hoists it out of the candidate vmap).
        cap_chunk = max(1, min(cap, (64 << 20) // max(4 * r_max * r_max, 1)))

        def oh_t_chunk(lo):
            return ((db[None, None, :] == t_bin[:, lo:lo + cap_chunk, None])
                    & sub_valid[None, None, :]).astype(jnp.float32)

        # frozen-only activities and pair mass
        a_out_u = jnp.where((u_base["activ"] == 1) & u_ok & ~u_in,
                            sub_accu[u_rows], 0.0)             # (R, c)
        a_out_v = jnp.where((v_base["activ"] == 1) & v_ok & ~v_in,
                            sub_accu[v_rows], 0.0)             # (R, cap, c)
        o_same = jnp.sum(a_out_u, axis=1)                      # (R,) = A_out(s)
        a_out_t = jnp.sum(a_out_v, axis=2)                     # (R, cap)

        def frozen_geometry(base, krows, a_mask):
            start_kb = base["start_bp"].astype(jnp.float32) / 1000.0
            mid = start_kb + jnp.where(base["ori"] == 1, sub_pre[krows],
                                       sub_suf[krows]) + sub_len[krows] * 0.5
            return dict(mid=mid, idc=base["id_c"], circ=base["circ"],
                        stot=base["l_cont_bp"].astype(jnp.float32) / 1000.0,
                        a=a_mask)

        gu_out = frozen_geometry(u_base, u_rows, a_out_u)
        gv_out = frozen_geometry(v_base, v_rows, a_out_v)
        gu4 = {k: x[:, None, :, None] for k, x in gu_out.items()}
        gv4 = {k: x[:, :, None, :] for k, x in gv_out.items()}
        ok4 = (u_ok & ~u_in)[:, None, :, None] \
            & (v_ok & ~v_in)[:, :, None, :]
        f_frozen = jnp.sum(pair_e(gu4, gv4, ok4, params, with_circ),
                           axis=(2, 3))                        # (R, cap)

        mass_ok = strict_upper & sub_valid[:, None] & sub_valid[None, :] \
            & (db[:, None] != db[None, :])

        def cand_terms(cand):
            """(obs_term, mass) from ONE shared (R, R) mini pair grid."""
            g = mini_geometry(cand)
            gu = {k: x[:, None] for k, x in g.items()}
            gv = {k: x[None, :] for k, x in g.items()}
            e_full = pair_e(gu, gv, jnp.bool_(True), params, with_circ)
            mass = jnp.sum(jnp.where(mass_ok, e_full, 0.0))
            # in-D x in-D block sums of the observed pairs
            p_rows = jnp.where(u_in_ok[:, :, None],
                               e_full[u_mini], 0.0)            # (R, c, R)
            p = jnp.sum(p_rows, axis=1)                        # (R, R)
            a_vec = g["a"]
            b_parts, at_parts = [], []
            for lo in range(0, cap, cap_chunk):
                oh = oh_t_chunk(lo)
                b_parts.append(jnp.einsum("rj,rwj->rw", p, oh))
                at_parts.append(jnp.einsum("j,rwj->rw", a_vec, oh))
            b = jnp.concatenate(b_parts, axis=1)               # (R, cap)
            a_bin_s = jnp.sum(jnp.where(u_in_ok, a_vec[u_mini], 0.0),
                              axis=1)                          # (R,)
            a_bin_t = jnp.concatenate(at_parts, axis=1)        # (R, cap)
            e_data = f_frozen + b + params.v_inter / nfpb * (
                a_bin_s[:, None] * a_out_t + o_same[:, None] * a_bin_t)
            term = ob * jnp.log(jnp.where(e_data > 0.0, e_data, 1.0)) - lf
            term = jnp.where(e_data > 0.0, term, 0.0)
            obs = jnp.sum(jnp.where(win_valid, weight * term, 0.0))
            return obs, mass, a_vec

        w_all = total_active_accu(state)
        obs_base, mass_base, a_base = cand_terms(mini)
        w_d = jnp.sum(a_base)
        w_out = w_all - w_d

        def one(cand):
            obs_c, mass_c, a_c = cand_terms(cand)
            cross = params.v_inter / nfpb * jnp.sum(
                (a_c - a_base) * (w_out - o_same))
            return (obs_c - obs_base) - (mass_c - mass_base) - cross

        if candidate_batch == "vmap":
            dll = jax.vmap(one)(cands)
        else:
            dll = jax.lax.map(one, cands)
        return dll, cands, rows, valid, overflow

    def dscore(state: GenomeState, f_a, f_b, params: RippeParams, max_id):
        any_circ = jnp.any(state.id_c[f_b] == state.id_c[f_a]) | \
            jnp.any(state.circ == 1)

        def run(with_circ):
            return lambda _: dscore_spec(state, f_a, f_b, params, max_id,
                                         with_circ)

        return jax.lax.cond(any_circ, run(True), run(False), operand=None)

    dscore.spec = dscore_spec
    return dscore


# ============================================================================
# v2: the hybrid decomposition — plain-path kernels for the repeat-free
# majority, copy enumeration only where copies actually exist.
# ============================================================================
#
# The v1 scorer above treats EVERY observed window entry through the
# general copy-summing machinery: (R, cap, R) one-hot einsums for the
# in-D block sums and (R, cap, c, c) frozen pair grids — none of which
# can use the round-4 Pallas kernels, leaving the repeat path an order of
# magnitude behind the plain path on chip (round-4 review item 2). v2
# splits the observed pairs by whether an endpoint bin is MULTI-COPY:
#
# - (single, single) — the overwhelming majority at realistic repeat
#   densities (a few % of bins are repeats): both bins have exactly one
#   copy, so E_data(s, t) = E(u, v) with u, v the copies. If both copies
#   are in D this is literally the plain scorer's semantics (copy rows
#   keyed by their data bin); if one copy is frozen the pair is trans in
#   base AND candidate with unchanged activity (single-copy rows are
#   never rep-flagged, so swap_activity cannot touch them) — it cancels
#   in the delta exactly as the plain scorer's dropped non-member
#   columns. These entries route through core.delta.make_delta_scorer
#   (data_keys=...) — obs-grid Pallas kernel, mini-grid Pallas scorer,
#   trans-affine tile shortcut, all of it.
# - (single, multi) — enumerated ONCE from the single endpoint's row over
#   a small directed side table (sparse.sparse_directed): E_data sums the
#   multi side's copies — in-D copies via candidate geometry, frozen
#   copies via the analytic trans term (a D-contig id is never a non-D
#   contig id, so mixed pairs are always trans).
# - (multi, multi) — a tiny static global list (density ~ dup_frac^2 of
#   nnz): full c x c copy-pair enumeration; frozen x frozen blocks use
#   base geometry (they contribute to E_data's value even though they
#   are candidate-independent).
#
# The expected-mass term rides the plain kernel's mass (all active D x D
# copy pairs) minus a same-data-bin pair correction (the data-grid
# diagonal the likelihood excludes), plus v1's activity cross-term for
# swap_activity's trans mass against the frozen genome.
#
# Exactness contract: every rep-flagged fragment's bin must be
# multi-copy in the table (true for all production constructions —
# pipeline.extend_with_repeats and synthetic add_scale_repeats always
# append at least one extra copy) so single-copy rows never change
# activity. Verified against v1 (the oracle) in test_delta_repeats.


def _pair_e(gu, gv, ok, params, with_circ, nfpb):
    """Linear expected contacts of copy pairs (broadcast shapes) —
    module-level twin of the v1 closure."""
    s = jnp.abs(gu["mid"] - gv["mid"])
    same = gu["idc"] == gv["idc"]
    log_cis = _log_cis(s, gu["circ"], gu["stot"], params, with_circ)
    e = jnp.where(same, jnp.exp(log_cis), params.v_inter) \
        * gu["a"] * gv["a"] / nfpb
    return jnp.where(ok, e, 0.0)


def split_observed_for_repeats(table: SubFragTable, sobs):
    """Host-side split of the symmetric data-grid contacts by repeat
    involvement. Returns (dup_mask (S,), sobs_single, mixed_directed,
    (dd_s, dd_t, dd_ob, dd_lf) multi-multi upper entries)."""
    from graal_tpu.core.sparse import (logfact_entries, sparse_directed,
                                       sparse_from_coo)

    data_id = np.asarray(table.data_id)
    s_dim = table.n_data_sub
    dup = np.bincount(data_id, minlength=s_dim) >= 2
    r = np.asarray(sobs.rows)
    c = np.asarray(sobs.cols)
    v = np.asarray(sobs.vals)
    up = r < c
    r, c, v = r[up], c[up], v[up]
    m_r, m_c = dup[r], dup[c]
    none = ~(m_r | m_c)
    both = m_r & m_c
    one = (m_r | m_c) & ~both
    sobs_single = sparse_from_coo(r[none], c[none], v[none], s_dim)
    # mixed: directed, rows = the single-copy endpoint
    sr = np.where(m_r[one], c[one], r[one])
    sc = np.where(m_r[one], r[one], c[one])
    mixed = sparse_directed(sr, sc, v[one], s_dim)
    dd = (jnp.asarray(r[both], jnp.int32), jnp.asarray(c[both], jnp.int32),
          jnp.asarray(v[both], jnp.float32),
          jnp.asarray(logfact_entries(v[both]), jnp.float32))
    return dup, sobs_single, mixed, dd


def make_repeat_delta_scorer_v2(table: SubFragTable, f_max: int, sobs,
                                candidate_batch: str = "vmap",
                                catalogue=None,
                                _ablate: str | None = None):
    """Hybrid repeat-aware delta scorer (see the section comment above).
    Same contract as :func:`make_repeat_delta_scorer` (the v1 oracle).

    ``_ablate``: benchmark-only kill switches (benchmarks/micro_repeat.py)
    — 'corr' drops every correction term (part 1 only), 'part4' / 'mixed'
    / 'dd' drop one term. NEVER set in product paths."""
    from graal_tpu.core.delta import extract_rows, make_delta_scorer

    if catalogue is None:
        catalogue = build_candidates
    mt = build_mini_table(table, allow_repeats=True)
    ct = build_copy_table(table)
    f_max = min(f_max, mt.n_frags)
    s_max = mt.s_max
    r_max = f_max * s_max
    c_max = ct.c_max
    k_subs = table.n_subs
    s_dim = table.n_data_sub
    nfpb = jnp.float32(table.n_frags_per_bins)
    sub_len = table.len_kb
    sub_pre = table.prefix_kb
    sub_suf = table.suffix_kb
    sub_accu = table.accu
    owner = table.owner
    data_id = table.data_id

    dup_np, sobs_single, mixed, (dd_s, dd_t, dd_ob, dd_lf) = \
        split_observed_for_repeats(table, sobs)
    dup = jnp.asarray(dup_np)
    n_dd = int(dd_s.shape[0])

    # part 1: the plain engine over the single-single contacts, keyed by
    # data bins (obs-grid + mini-grid Pallas kernels on TPU)
    plain = make_delta_scorer(table, None, f_max, sobs=sobs_single,
                              candidate_batch=candidate_batch,
                              catalogue=catalogue, data_keys=data_id)

    # mixed directed windows (single endpoint rows)
    mnnz = int(mixed.cols.shape[0])
    n_chm = (mixed.row_cap + 14) // 8
    capm = n_chm * 8
    mpacked = mixed.packed

    def total_active_accu(state: GenomeState):
        return jnp.sum(sub_accu * (state.activ[owner] == 1))

    def pair_e(gu, gv, ok, params, with_circ):
        return _pair_e(gu, gv, ok, params, with_circ, nfpb)

    def sub_rows_of(rows, valid):
        start = mt.sub_start[rows]
        count = mt.sub_count[rows]
        slot = jnp.arange(s_max, dtype=jnp.int32)[None, :]
        subs = start[:, None] + slot
        sub_valid = valid[:, None] & (slot < count[:, None])
        owner_slot = jnp.broadcast_to(
            jnp.arange(rows.shape[0], dtype=jnp.int32)[:, None], subs.shape)
        return (subs.reshape(-1), sub_valid.reshape(-1),
                owner_slot.reshape(-1))

    def copy_rows_of(bins, cap_c):
        """(..., cap_c) copy sub rows + validity of data bins (CSR)."""
        b = jnp.clip(bins, 0, s_dim - 1)
        ci = jnp.arange(cap_c, dtype=jnp.int32)
        v0 = ct.copy_start[b]
        shape = bins.shape + (cap_c,)
        rows_ = ct.copy_rows[jnp.clip(v0[..., None] + ci, 0, k_subs - 1)]
        ok = ci < (ct.copy_start[b + 1] - v0)[..., None]
        return rows_.reshape(shape), ok.reshape(shape)

    def mini_geometry(cand, subs_c, sub_valid, owner_slot):
        start_kb = cand.start_bp[owner_slot].astype(jnp.float32) / 1000.0
        ori = cand.ori[owner_slot]
        mid = start_kb + jnp.where(ori == 1, sub_pre[subs_c],
                                   sub_suf[subs_c]) + sub_len[subs_c] * 0.5
        return dict(
            mid=mid, idc=cand.id_c[owner_slot],
            circ=cand.circ[owner_slot],
            stot=cand.l_cont_bp[owner_slot].astype(jnp.float32) / 1000.0,
            a=jnp.where((cand.activ[owner_slot] == 1) & sub_valid,
                        sub_accu[subs_c], 0.0))

    _BFIELDS = ("start_bp", "ori", "id_c", "circ", "l_cont_bp", "activ")

    def frozen_geometry(state, krows):
        """Base-state geometry of arbitrary copy rows (one stacked
        gather)."""
        mat = jnp.stack([getattr(state, f) for f in _BFIELDS], axis=1)
        got = mat[owner[krows]]
        start_kb = got[..., 0].astype(jnp.float32) / 1000.0
        mid = start_kb + jnp.where(got[..., 1] == 1, sub_pre[krows],
                                   sub_suf[krows]) + sub_len[krows] * 0.5
        return dict(mid=mid, idc=got[..., 2], circ=got[..., 3],
                    stot=got[..., 4].astype(jnp.float32) / 1000.0,
                    a=jnp.where(got[..., 5] == 1, sub_accu[krows], 0.0))

    def g_matrix(g):
        """(R, 5) stacked geometry so routed picks are ONE gather (the
        cost is per row fetched, not per element — five per-field gathers
        per candidate were a measured drag). Contig ids ride as f32:
        equality is exact below 2^24, and max_id grows by at most ~13 per
        committed step — far below 16.7M at every target scale."""
        return jnp.stack([g["mid"], g["idc"].astype(jnp.float32),
                          g["circ"].astype(jnp.float32), g["stot"],
                          g["a"]], axis=1)

    def pick_mat(gm, idx):
        got = gm[idx]                          # idx.shape + (5,)
        return dict(mid=got[..., 0], idc=got[..., 1], circ=got[..., 2],
                    stot=got[..., 3], a=got[..., 4])

    def dscore_spec(state: GenomeState, f_a, f_b, params: RippeParams,
                    max_id, with_circ: bool, rows=None, valid=None,
                    overflow=None):
        n = state.n_frags
        if rows is None:
            rows, valid, overflow = extract_rows(state, f_a, f_b, f_max)

        dll1, cands, rows, valid, overflow = plain.spec(
            state, f_a, f_b, params, max_id, with_circ,
            rows=rows, valid=valid, overflow=overflow)
        if _ablate == "corr":
            return dll1, cands, rows, valid, overflow

        subs, sub_valid, owner_slot = sub_rows_of(rows, valid)
        subs_c = jnp.clip(subs, 0, k_subs - 1)
        db = data_id[subs_c]                                  # (R,)
        db_dup = dup[db] & sub_valid

        vrows = jnp.where(valid, rows, n)
        inv_f = jnp.full((n,), -1, jnp.int32).at[vrows].set(
            jnp.arange(f_max, dtype=jnp.int32), mode="drop")

        def in_d_route(krows):
            """(in_d, mini_row) of arbitrary copy sub rows."""
            g = owner[krows]
            slot = inv_f[g]
            mrow = jnp.clip(
                jnp.maximum(slot, 0) * s_max
                + (krows - mt.sub_start[jnp.clip(g, 0, None)]),
                0, r_max - 1)
            return slot >= 0, mrow

        # ---- candidate-independent routing --------------------------------
        # mixed windows: rows r whose bin is SINGLE-copy (dup rows and
        # duplicate-bin visitors have either empty or excluded windows)
        rcm = jnp.clip(db, 0, s_dim - 1)
        w_start = jnp.minimum(mixed.row_start[rcm], mnnz)
        w_end = mixed.row_start[rcm + 1]
        basem = w_start >> 3
        rows_w = basem[:, None] + jnp.arange(n_chm, dtype=jnp.int32)
        pk = mpacked[rows_w.reshape(-1)].reshape((r_max, n_chm, 8, 2))
        gidx = rows_w[:, :, None] * 8 \
            + jnp.arange(8, dtype=jnp.int32)[None, None, :]
        mwin_valid = ((gidx >= w_start[:, None, None])
                      & (gidx < w_end[:, None, None])
                      & (sub_valid & ~db_dup)[:, None, None]
                      ).reshape((r_max, capm))
        pk = pk.reshape((r_max, capm, 2))
        t_bin = pk[..., 0]                                     # (R, capm)
        ob_m = jax.lax.bitcast_convert_type(pk[..., 1], jnp.float32)
        ob_m = jnp.where(mwin_valid, ob_m, 0.0)
        # multi side's copies: (R, capm, c)
        v_rows, v_ok = copy_rows_of(t_bin, c_max)
        v_in, v_mini = in_d_route(v_rows)
        v_in_ok = v_in & v_ok & mwin_valid[..., None]
        v_out_ok = ~v_in & v_ok & mwin_valid[..., None]
        gv_frozen = frozen_geometry(state, v_rows)
        a_out_t = jnp.sum(jnp.where(v_out_ok, gv_frozen["a"], 0.0),
                          axis=2)                              # (R, capm)
        safe_obm = jnp.where(ob_m > 0.0, ob_m, 1.0)
        lf_big = safe_obm * jnp.log(safe_obm) - safe_obm \
            + 0.5 * jnp.log(safe_obm * 2.0 * np.pi)
        lf_m = jnp.where(ob_m >= _STIRLING_LIM, lf_big,
                         jnp.where(ob_m > 0.0,
                                   _log_factorial_ref(safe_obm), 0.0))

        # multi-multi entries: both sides' copies + frozen-frozen base term
        ddu_rows, ddu_ok = copy_rows_of(dd_s, c_max)           # (ndd, c)
        ddv_rows, ddv_ok = copy_rows_of(dd_t, c_max)
        ddu_in, ddu_mini = in_d_route(ddu_rows)
        ddv_in, ddv_mini = in_d_route(ddv_rows)
        gu_f = frozen_geometry(state, ddu_rows)
        gv_f = frozen_geometry(state, ddv_rows)
        ff_ok = (ddu_ok & ~ddu_in)[:, :, None] \
            & (ddv_ok & ~ddv_in)[:, None, :]
        e_ff = jnp.sum(pair_e({k: x[:, :, None] for k, x in gu_f.items()},
                              {k: x[:, None, :] for k, x in gv_f.items()},
                              ff_ok, params, with_circ), axis=(1, 2))
        a_u_out = jnp.where(ddu_ok & ~ddu_in, gu_f["a"], 0.0)  # (ndd, c)
        a_v_out = jnp.where(ddv_ok & ~ddv_in, gv_f["a"], 0.0)

        # same-bin in-D pairs (mass correction): co-copies of each row
        sb_rows, sb_ok = copy_rows_of(db, c_max)               # (R, c)
        sb_in, sb_mini = in_d_route(sb_rows)
        # count each unordered pair once: partner mini row strictly above
        sb_use = sb_in & sb_ok & db_dup[:, None] \
            & (sb_mini > jnp.arange(r_max, dtype=jnp.int32)[:, None])

        # ---- part 4: dup-bin windows over FROZEN single-copy partners ----
        # An observed pair (s multi-copy with a copy in D, t single-copy
        # with its copy frozen) is enumerated from NEITHER the mixed table
        # (t not in D) nor the multi-multi list (t single) — yet its
        # E_data moves when an in-D copy of s toggles activity
        # (swap_activity): E_data = C_frozen + v_inter/nfpb * a_t *
        # a_inD(s, cand), GEOMETRY-FREE (in-D x frozen pairs are always
        # trans). Activity only ever changes at fA (EM catalogue op 8 is
        # the only activity-touching mutation, and it toggles fA alone;
        # the MH catalogue has none), so the candidate DIFFERENCE of this
        # term is non-zero only for the bins of fA's OWN subs — the grids
        # here are (s_max, capd), not (R, capd): the unrestricted version
        # was the single largest stage of the repeat step (device
        # attribution: 82 of 119 ms/step at 20k bins).
        dnnz = int(sobs.cols.shape[0])
        n_chd = (sobs.row_cap + 14) // 8
        capd = n_chd * 8
        slot_a = jnp.arange(s_max, dtype=jnp.int32)
        fa_c = jnp.clip(f_a, 0, None)
        subs_a = jnp.clip(mt.sub_start[fa_c] + slot_a, 0, k_subs - 1)
        suba_ok = slot_a < mt.sub_count[fa_c]
        dba_c = jnp.clip(data_id[subs_a], 0, s_dim - 1)        # (s_max,)
        a_dup = dup[dba_c] & suba_ok
        d_start = jnp.minimum(sobs.row_start[dba_c], dnnz)
        d_end = sobs.row_start[dba_c + 1]
        based = d_start >> 3
        rows_d = based[:, None] + jnp.arange(n_chd, dtype=jnp.int32)
        pkd = sobs.packed[rows_d.reshape(-1)].reshape((s_max, n_chd, 8, 2))
        gidxd = rows_d[:, :, None] * 8 \
            + jnp.arange(8, dtype=jnp.int32)[None, None, :]
        dwin = ((gidxd >= d_start[:, None, None])
                & (gidxd < d_end[:, None, None])
                & a_dup[:, None, None]).reshape((s_max, capd))
        pkd = pkd.reshape((s_max, capd, 2))
        t4 = pkd[..., 0]                                       # (s_max, capd)
        ob4 = jnp.where(
            dwin, jax.lax.bitcast_convert_type(pkd[..., 1], jnp.float32),
            0.0)
        t4c = jnp.clip(t4, 0, s_dim - 1)
        t4_single = ~dup[t4c]
        t4_row = ct.copy_rows[jnp.clip(ct.copy_start[t4c], 0, k_subs - 1)]
        t4_in_d, _ = in_d_route(t4_row)
        g_t4 = frozen_geometry(state, t4_row)                  # (s_max, capd)
        valid4 = dwin & t4_single & ~t4_in_d
        # C_frozen: frozen copies of fA's bins x t4's frozen copy
        ca_rows, ca_ok = copy_rows_of(dba_c, c_max)            # (s_max, c)
        ca_in, ca_mini = in_d_route(ca_rows)
        g_u4 = frozen_geometry(state, ca_rows)
        u4_ok = (ca_ok & ~ca_in)[:, None, :] & valid4[:, :, None]
        c_frozen4 = jnp.sum(
            pair_e({k: x[:, None, :] for k, x in g_u4.items()},
                   {k: x[:, :, None] for k, x in g_t4.items()},
                   u4_ok, params, with_circ), axis=2)          # (s_max, capd)
        coef4 = jnp.where(valid4, params.v_inter / nfpb * g_t4["a"], 0.0)
        safe_ob4 = jnp.where(ob4 > 0.0, ob4, 1.0)
        lf4_big = safe_ob4 * jnp.log(safe_ob4) - safe_ob4 \
            + 0.5 * jnp.log(safe_ob4 * 2.0 * np.pi)
        lf4 = jnp.where(ob4 >= _STIRLING_LIM, lf4_big,
                        jnp.where(ob4 > 0.0,
                                  _log_factorial_ref(safe_ob4), 0.0))

        # frozen same-bin accu per row (activity cross-term)
        o_same = jnp.sum(jnp.where(sb_ok & ~sb_in,
                                   frozen_geometry(state, sb_rows)["a"],
                                   0.0), axis=1)               # (R,)
        w_all = total_active_accu(state)

        log_v = jnp.log(params.v_inter)

        def corr_terms(cand):
            g = mini_geometry(cand, subs_c, sub_valid, owner_slot)
            a_vec = g["a"]
            gm = g_matrix(g)
            # --- mixed obs: E_data = in-D copy pairs + frozen trans ----
            if _ablate != "mixed":
                gv_in = pick_mat(gm, v_mini)         # (R, capm, c) routed
                gu = {k: x[:, None, None] for k, x in g.items()}
                e_in = jnp.sum(pair_e(gu, gv_in, v_in_ok, params,
                                      with_circ), axis=2)      # (R, capm)
                e_mix = e_in + params.v_inter / nfpb \
                    * a_vec[:, None] * a_out_t
                term = ob_m * jnp.log(jnp.where(e_mix > 0.0, e_mix, 1.0)) \
                    - lf_m
                obs_mixed = jnp.sum(
                    jnp.where(mwin_valid & (e_mix > 0.0), term, 0.0))
            else:
                obs_mixed = jnp.float32(0.0)
            # --- multi-multi obs ---------------------------------------
            if n_dd and _ablate != "dd":
                gu_in = pick_mat(gm, ddu_mini)                 # (ndd, c)
                gv_in2 = pick_mat(gm, ddv_mini)
                ii_ok = (ddu_ok & ddu_in)[:, :, None] \
                    & (ddv_ok & ddv_in)[:, None, :]
                e_ii = jnp.sum(
                    pair_e({k: x[:, :, None] for k, x in gu_in.items()},
                           {k: x[:, None, :] for k, x in gv_in2.items()},
                           ii_ok, params, with_circ), axis=(1, 2))
                a_u_in = jnp.where(ddu_ok & ddu_in, gu_in["a"], 0.0)
                a_v_in = jnp.where(ddv_ok & ddv_in, gv_in2["a"], 0.0)
                e_mixed_dd = params.v_inter / nfpb * (
                    jnp.sum(a_u_in, 1) * jnp.sum(a_v_out, 1)
                    + jnp.sum(a_u_out, 1) * jnp.sum(a_v_in, 1))
                e_dd = e_ff + e_ii + e_mixed_dd                # (ndd,)
                term_dd = dd_ob * jnp.log(jnp.where(e_dd > 0.0, e_dd, 1.0)) \
                    - dd_lf
                obs_dd = jnp.sum(jnp.where(e_dd > 0.0, term_dd, 0.0))
            else:
                obs_dd = jnp.float32(0.0)
            # --- part 4: frozen single-copy partners of fA's bins ------
            if _ablate != "part4":
                a_in_d = jnp.sum(jnp.where(ca_in & ca_ok,
                                           a_vec[ca_mini], 0.0),
                                 axis=1)                       # (s_max,)
                e4 = c_frozen4 + coef4 * a_in_d[:, None]
                term4 = ob4 * jnp.log(jnp.where(e4 > 0.0, e4, 1.0)) - lf4
                obs4 = jnp.sum(jnp.where(valid4 & (e4 > 0.0), term4, 0.0))
            else:
                obs4 = jnp.float32(0.0)
            # --- same-bin mass correction (subtract from part-1 mass) --
            g_sb = pick_mat(gm, sb_mini)                       # (R, c)
            e_sb = jnp.sum(pair_e({k: x[:, None] for k, x in g.items()},
                                  g_sb, sb_use, params, with_circ))
            return obs_mixed + obs_dd + obs4 + e_sb, a_vec

        base_mini = gather_mini(state, rows, valid)
        full = jax.tree.map(
            lambda m, c: jnp.concatenate([m[None], c], axis=0),
            base_mini, cands)
        if candidate_batch == "vmap":
            corr, a_all = jax.vmap(corr_terms)(full)
        else:
            corr, a_all = jax.lax.map(corr_terms, full)
        a_base = a_all[0]
        w_d = jnp.sum(a_base)
        w_out = w_all - w_d
        cross = params.v_inter / nfpb * jnp.sum(
            (a_all[1:] - a_base[None, :]) * (w_out - o_same)[None, :],
            axis=1)
        dll = dll1 + (corr[1:] - corr[0]) - cross
        return dll, cands, rows, valid, overflow

    def dscore(state: GenomeState, f_a, f_b, params: RippeParams, max_id):
        any_circ = jnp.any(state.id_c[f_b] == state.id_c[f_a]) | \
            jnp.any(state.circ == 1)

        def run(with_circ):
            return lambda _: dscore_spec(state, f_a, f_b, params, max_id,
                                         with_circ)

        return jax.lax.cond(any_circ, run(True), run(False), operand=None)

    dscore.spec = dscore_spec
    return dscore
