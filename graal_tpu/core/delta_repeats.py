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
