"""Sparse observed-contact representation and the chr1-scale likelihood.

The reference stays sparse until densification (pyramid_sparse.py:1216-1219
loads each level as CSR/CSC; simulation_loader.py:81-82 densifies at modest
n). A dense S x S observed matrix is impossible at chr1 scale (~500k
sub-fragments => 10^12 cells), so this module keeps the observed matrix as
symmetric CSR-style triplets and evaluates the full Poisson log-likelihood
without ever forming a dense pair grid:

    L = sum_{s<t} [ob * log e - e - log ob!]
      = 0.5 * sum_{sym nnz} ob * log e          (only observed pairs)
        - sum_{s<t} e                           (expected mass)
        + logfact_const                         (data constant)

and the expected mass splits into an *analytic* trans term plus a *banded*
cis correction:

    sum e = v_inter/nfpb * ((sum a)^2 - sum a^2)/2     a_u = accu_u
          + sum_{same contig, 0 < s < d_max} (e_cis - e_trans)

because the Rippe curve is clamped to exactly v_inter outside (0, d_max)
(kernels3.cu:120-133): a cis pair beyond d_max has the same expectation as
a trans pair and drops out of the correction. The correction runs over a
band of the genome-sorted sub order (offsets 1..w), with ``w`` chosen from
the sub-fragment lengths so that any d_max window is covered.

Cost per full evaluation: O(nnz + K log K + K * w) — linear-ish in the
genome, no K^2 anywhere. Copy-expanded (repeat) tables evaluate the same
decomposition with c_max x c_max copy blocks per observed entry
(:func:`_make_sparse_loglik_repeats`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.model import RippeParams, expected_contacts
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


class SparseObs(NamedTuple):
    """Symmetric sparse observed matrix (both (u,v) and (v,u) stored),
    sorted by (row, col), CSR-indexable via ``row_start``."""

    rows: jnp.ndarray       # (nnz_sym,) int32
    cols: jnp.ndarray       # (nnz_sym,) int32
    vals: jnp.ndarray       # (nnz_sym,) float32
    row_start: jnp.ndarray  # (K+1,) int32 indptr
    row_cap: int            # max entries of any row (static gather window)
    n: int                  # K data subs
    logfact_const: float    # -sum_{s<t} log(ob!)  (reference branch structure)
    # WIDE window storage: (col, bitcast(val)) int32 pairs, 8 CSR entries
    # per storage row, so ONE fast-path gather row fetches 8 window
    # entries. Entry e lives at packed[e // 8, 2*(e % 8) : 2*(e % 8) + 2].
    # Built ONCE here and shared by every compiled delta bucket. INT32
    # pack with the float lane bitcast INTO it, never int indices into
    # f32: TPU fused gathers canonicalise denormal/NaN float patterns
    # (core/delta.py). Why wide: XLA's fast (fusion) gather path only
    # exists for single-operand-row slices — any slice_sizes[0] > 1
    # lowers to a SERIAL while-loop of dynamic slices (measured 4.2x
    # slower than even the flat per-entry gather), and the flat per-entry
    # (1, 2) gather was itself the largest op of the chr1-scale step
    # (device trace: 1.1 of 3.2 ms at 20k fragments). The window
    # contractions never care about an entry's position inside the
    # window, so the 8-entry alignment slack costs nothing. Trailing
    # sentinel padding (col -3, val 0; >= row_cap + 16 entries) keeps
    # every window read in bounds without clamping.
    packed: jnp.ndarray     # (ceil((nnz_sym+row_cap+16)/8), 16) int32


def logfact_entries(vals: np.ndarray) -> np.ndarray:
    """Per-entry log(ob!) with the reference's factorial branches
    (kernels3.cu:80-93, :169-210): Stirling expansion for ob >= 15, floor +
    exact factorial < 10, floor + Stirling 10..14. Zero counts map to 0."""
    import math

    ob = np.asarray(vals, np.float64)
    out = np.zeros_like(ob)
    pos = ob > 0
    big = pos & (ob >= 15)
    out[big] = (ob[big] * np.log(ob[big]) - ob[big]
                + np.log(np.sqrt(ob[big] * 2 * np.pi)))
    mid = pos & (ob >= 10) & ~big
    nn = np.floor(ob[mid])
    out[mid] = nn * np.log(nn) - nn + 0.5 * np.log(2 * np.pi * nn)
    small = pos & (ob < 10)
    out[small] = np.array(
        [math.lgamma(math.floor(x) + 1) for x in ob[small]])
    return out


def _logfact_const(vals_upper: np.ndarray) -> float:
    """-sum log(ob!) over the upper-triangular observed counts."""
    return float(-logfact_entries(vals_upper).sum())


def sparse_from_coo(rows, cols, vals, n: int) -> SparseObs:
    """Build from upper-triangular (or unordered) COO triplets; duplicates
    are summed, the diagonal is dropped, and the matrix is symmetrised."""
    import scipy.sparse as sp

    m = sp.coo_matrix((np.asarray(vals, np.float64),
                       (np.asarray(rows), np.asarray(cols))), shape=(n, n))
    m = m.tocsr()
    m.sum_duplicates()
    m.setdiag(0)
    m.eliminate_zeros()
    upper = sp.triu(m, k=1) + sp.triu(m.T, k=1)
    sym = (upper + upper.T).tocsr()
    sym.sort_indices()
    counts = np.diff(sym.indptr)
    coo = sym.tocoo()
    cols_j = jnp.asarray(coo.col, jnp.int32)
    vals_j = jnp.asarray(coo.data, jnp.float32)
    row_cap = int(counts.max()) if len(counts) else 1
    nnz = int(coo.row.shape[0])
    e_pad = (nnz + row_cap + 16 + 7) // 8 * 8
    flat = np.empty((e_pad, 2), np.int32)
    flat[:nnz, 0] = coo.col
    flat[:nnz, 1] = np.asarray(coo.data, np.float32).view(np.int32)
    flat[nnz:, 0] = -3
    flat[nnz:, 1] = 0
    return SparseObs(
        rows=jnp.asarray(coo.row, jnp.int32),
        cols=cols_j,
        vals=vals_j,
        row_start=jnp.asarray(sym.indptr, jnp.int32),
        row_cap=row_cap,
        n=n,
        logfact_const=_logfact_const(sp.triu(sym, k=1).tocoo().data),
        packed=jnp.asarray(flat.reshape(-1, 16)))


def sparse_directed(rows, cols, vals, n: int) -> SparseObs:
    """Directed (one-orientation) CSR windows in the SparseObs layout: the
    entries are stored exactly as given (sorted by (row, col), duplicates
    summed, NO symmetrisation, diagonal kept out by the caller). Used by
    the repeat delta engine's mixed-pair side table, where each
    (non-repeat, repeat) observed pair is enumerated once from its
    non-repeat endpoint. ``logfact_const`` is not meaningful here (0)."""
    import scipy.sparse as sp

    m = sp.coo_matrix((np.asarray(vals, np.float64),
                       (np.asarray(rows), np.asarray(cols))),
                      shape=(n, n)).tocsr()
    m.sum_duplicates()
    m.sort_indices()
    counts = np.diff(m.indptr)
    coo = m.tocoo()
    row_cap = int(counts.max()) if len(counts) and counts.size else 1
    row_cap = max(row_cap, 1)
    nnz = int(coo.row.shape[0])
    e_pad = (nnz + row_cap + 16 + 7) // 8 * 8
    flat = np.empty((e_pad, 2), np.int32)
    flat[:nnz, 0] = coo.col
    flat[:nnz, 1] = np.asarray(coo.data, np.float32).view(np.int32)
    flat[nnz:, 0] = -3
    flat[nnz:, 1] = 0
    return SparseObs(
        rows=jnp.asarray(coo.row, jnp.int32),
        cols=jnp.asarray(coo.col, jnp.int32),
        vals=jnp.asarray(coo.data, jnp.float32),
        row_start=jnp.asarray(m.indptr, jnp.int32),
        row_cap=row_cap,
        n=n,
        logfact_const=0.0,
        packed=jnp.asarray(flat.reshape(-1, 16)))


def subsample_sparse(sobs: SparseObs, fact: float, seed: int = 0) -> SparseObs:
    """Poisson sub-sampling robustness knob at chr1 scale (gen_rand_mat,
    kernels3.cu:61-77; the dense pipeline twin is
    pipeline.Runner._setup_matrices): every upper-triangular observed count
    is resampled as Poisson(fact * ob), then re-symmetrised. Zero draws
    drop out of the triplets."""
    rng = np.random.default_rng(seed)
    r = np.asarray(sobs.rows)
    c = np.asarray(sobs.cols)
    v = np.asarray(sobs.vals, np.float64)
    up = r < c
    drawn = rng.poisson(np.maximum(v[up] * fact, 0.0)).astype(np.float64)
    return sparse_from_coo(r[up], c[up], drawn, sobs.n)


def sparse_from_dense(obs) -> SparseObs:
    obs = np.asarray(obs)
    iu, ju = np.nonzero(np.triu(obs, 1))
    return sparse_from_coo(iu, ju, obs[iu, ju], obs.shape[0])


def band_width(len_kb, d_max: float, margin: float = 2.0,
               w_min: int = 8) -> int:
    """Band width covering every same-contig pair within ``d_max`` kb.

    Sub-fragments tile their contig, so p+1 consecutive subs span at least
    the total length of the p-1 interior subs >= the sum of the p-1
    smallest lengths genome-wide. The returned w satisfies: any window of
    ``margin * d_max`` kb holds at most w+1 subs.
    """
    lens = np.sort(np.asarray(len_kb, np.float64))
    cum = np.cumsum(lens)
    p = int(np.searchsorted(cum, margin * d_max)) + 1
    return max(w_min, min(p + 2, len(lens) - 1))


def genome_sort_order(state: GenomeState, table: SubFragTable):
    """Sub rows sorted by (contig, genomic position) under the current
    genome — the band enumeration order. O(K log K) on device."""
    start_kb = state.start_bp[table.owner].astype(jnp.float32) / 1000.0
    ori = state.ori[table.owner]
    mid = start_kb + jnp.where(ori == 1, table.prefix_kb, table.suffix_kb) \
        + table.len_kb * 0.5
    return jnp.lexsort((mid, state.id_c[table.owner])), mid


def make_sparse_loglik(table: SubFragTable, sobs: SparseObs, w: int,
                       obs_chunk: int = 1 << 18):
    """Build ``fn(state, params) -> scalar`` — the full Poisson
    log-likelihood, sparse/banded, exactly matching the dense
    core.likelihood.log_likelihood. Copy-expanded (repeat) tables route to
    the copy-summing variant."""
    if table.has_repeats:
        return _make_sparse_loglik_repeats(table, sobs, w, obs_chunk)
    k = table.n_subs
    assert sobs.n == k
    owner = table.owner
    accu = table.accu
    nfpb = jnp.float32(table.n_frags_per_bins)

    def fn(state: GenomeState, params: RippeParams):
        order, mid = genome_sort_order(state, table)
        idc = state.id_c[owner]
        circ = state.circ[owner]
        stot = state.l_cont_bp[owner].astype(jnp.float32) / 1000.0

        # ---- term1: observed pairs ----
        u, v = sobs.rows, sobs.cols
        s = jnp.abs(mid[u] - mid[v])
        same = idc[u] == idc[v]
        na = accu[u] * accu[v] / nfpb
        e_obs = expected_contacts(s, same, circ[u] == 1, stot[u], na, params)
        term1 = 0.5 * jnp.sum(sobs.vals * jnp.log(e_obs))

        # ---- term2a: analytic trans mass ----
        a_sum = jnp.sum(accu)
        a_sq = jnp.sum(accu * accu)
        trans_mass = params.v_inter * (a_sum * a_sum - a_sq) * 0.5 / nfpb

        # ---- term2b: banded cis correction ----
        mid_s = mid[order]
        idc_s = idc[order]
        circ_s = circ[order]
        stot_s = stot[order]
        accu_s = accu[order]

        def body(off, acc):
            # offset pairing: roll then mask the wrapped tail
            mid_v = jnp.roll(mid_s, -off)
            idc_v = jnp.roll(idc_s, -off)
            accu_v = jnp.roll(accu_s, -off)
            valid = jnp.arange(k) < (k - off)
            s = jnp.abs(mid_s - mid_v)
            same = (idc_s == idc_v) & valid
            na = accu_s * accu_v / nfpb
            e_cis = expected_contacts(s, same, circ_s == 1, stot_s, na,
                                      params)
            corr = jnp.where(same, e_cis - params.v_inter * na, 0.0)
            return acc + jnp.sum(corr)

        cis_corr = jax.lax.fori_loop(1, w + 1, body, jnp.float32(0.0))
        return term1 - (trans_mass + cis_corr) + jnp.float32(sobs.logfact_const)

    return fn


def _make_sparse_loglik_repeats(table: SubFragTable, sobs: SparseObs,
                                w: int, obs_chunk: int):
    """Copy-expanded sparse likelihood: the expectation of an observed data
    pair sums over active copy pairs (dispatcher loop,
    kernels3.cu:2895-2929), evaluated as c_max x c_max blocks per nnz entry
    in bounded chunks; the expected mass stays pairwise over copy rows
    (analytic trans + banded cis) with same-data-bin pairs excluded — they
    feed the data-grid diagonal, which the likelihood masks out.

    The global logfact constant is replaced by a per-entry factorial inside
    the E > 0 indicator: with repeats a candidate state can legitimately
    drive a pair's expectation to zero (every copy inactive), where the
    reference drops the whole pmf term (kernels3.cu:169-210).
    """
    from graal_tpu.core.delta_repeats import build_copy_table
    from graal_tpu.core.model import _STIRLING_LIM, _log_factorial_ref

    ct = build_copy_table(table)
    k = table.n_subs
    s_dim = table.n_data_sub
    assert sobs.n == s_dim
    owner = table.owner
    accu = table.accu
    data_id = table.data_id
    nfpb = jnp.float32(table.n_frags_per_bins)
    c_max = ct.c_max
    ci = jnp.arange(c_max, dtype=jnp.int32)

    def copies_of(bins):
        b0 = ct.copy_start[bins]
        rows = ct.copy_rows[jnp.clip(b0[:, None] + ci[None, :], 0, k - 1)]
        ok = ci[None, :] < (ct.copy_start[bins + 1] - b0)[:, None]
        return rows, ok

    # static per-entry copy blocks + log-factorials, padded to whole chunks
    nnz = int(sobs.cols.shape[0])
    n_chunks = max(1, -(-nnz // obs_chunk))
    pad = n_chunks * obs_chunk - nnz

    def padc(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
            .reshape((n_chunks, obs_chunk) + x.shape[1:])

    u_rows_c, u_ok_c = copies_of(sobs.rows)
    v_rows_c, v_ok_c = copies_of(sobs.cols)
    u_rows_c, v_rows_c = padc(u_rows_c, 0), padc(v_rows_c, 0)
    u_ok_c, v_ok_c = padc(u_ok_c, False), padc(v_ok_c, False)
    vals_c = padc(sobs.vals, 0.0)

    ob = sobs.vals
    safe_ob = jnp.where(ob > 0.0, ob, 1.0)
    lf_big = safe_ob * jnp.log(safe_ob) - safe_ob \
        + 0.5 * jnp.log(safe_ob * 2.0 * np.pi)
    lf = jnp.where(ob >= _STIRLING_LIM, lf_big,
                   jnp.where(ob > 0.0, _log_factorial_ref(safe_ob), 0.0))
    lf_c = padc(lf, 0.0)

    def fn(state: GenomeState, params: RippeParams):
        order, mid = genome_sort_order(state, table)
        idc = state.id_c[owner]
        circ = state.circ[owner]
        stot = state.l_cont_bp[owner].astype(jnp.float32) / 1000.0
        a = jnp.where(state.activ[owner] == 1, accu, 0.0)

        # ---- term1: observed pairs, copy-summed, chunked ----
        def chunk_term(args):
            u_r, u_k, v_r, v_k, vals, lfs = args
            s = jnp.abs(mid[u_r][:, :, None] - mid[v_r][:, None, :])
            same = idc[u_r][:, :, None] == idc[v_r][:, None, :]
            na = a[u_r][:, :, None] * a[v_r][:, None, :] / nfpb
            e = expected_contacts(s, same, (circ[u_r] == 1)[:, :, None],
                                  stot[u_r][:, :, None], na, params)
            ok = u_k[:, :, None] & v_k[:, None, :]
            e_data = jnp.sum(jnp.where(ok, e, 0.0), axis=(1, 2))
            term = vals * jnp.log(jnp.where(e_data > 0.0, e_data, 1.0)) - lfs
            return jnp.sum(jnp.where(e_data > 0.0, term, 0.0))

        term1 = 0.5 * jnp.sum(jax.lax.map(
            chunk_term, (u_rows_c, u_ok_c, v_rows_c, v_ok_c, vals_c, lf_c)))

        # ---- term2a: analytic trans mass, same-bin pairs excluded ----
        a_sum = jnp.sum(a)
        a_sq = jnp.sum(a * a)
        bins_all = jnp.arange(s_dim, dtype=jnp.int32)
        b_rows, b_ok = copies_of(bins_all)
        b_sums = jnp.sum(jnp.where(b_ok, a[b_rows], 0.0), axis=1)
        same_bin = (jnp.sum(b_sums * b_sums) - a_sq) * 0.5
        trans_mass = params.v_inter / nfpb * \
            ((a_sum * a_sum - a_sq) * 0.5 - same_bin)

        # ---- term2b: banded cis correction, same-bin pairs excluded ----
        mid_s = mid[order]
        idc_s = idc[order]
        circ_s = circ[order]
        stot_s = stot[order]
        a_s = a[order]
        db_s = data_id[order]

        def body(off, acc):
            mid_v = jnp.roll(mid_s, -off)
            idc_v = jnp.roll(idc_s, -off)
            a_v = jnp.roll(a_s, -off)
            db_v = jnp.roll(db_s, -off)
            valid = jnp.arange(k) < (k - off)
            s = jnp.abs(mid_s - mid_v)
            same = (idc_s == idc_v) & valid & (db_s != db_v)
            na = a_s * a_v / nfpb
            e_cis = expected_contacts(s, same, circ_s == 1, stot_s, na,
                                      params)
            corr = jnp.where(same, e_cis - params.v_inter * na, 0.0)
            return acc + jnp.sum(corr)

        cis_corr = jax.lax.fori_loop(1, w + 1, body, jnp.float32(0.0))
        return term1 - (trans_mass + cis_corr)

    return fn


def make_sparse_obs_fn(sobs: SparseObs, r_max: int):
    """Dense (R, R) observed-count gather for a set of sub rows, built from
    the symmetric CSR windows. The delta scorer now consumes CSR windows
    directly (scatter-free); this materialised form remains as the test
    oracle for the window machinery."""
    cap = sobs.row_cap
    nnz = sobs.cols.shape[0]

    def obs_fn(sub_rows):
        r = sub_rows.shape[0]
        rc = jnp.clip(sub_rows, 0, sobs.n - 1)
        start = sobs.row_start[rc]
        end = sobs.row_start[rc + 1]
        win = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        win_valid = win < end[:, None]
        win = jnp.clip(win, 0, nnz - 1)
        cols = jnp.where(win_valid, sobs.cols[win], sobs.n)
        vals = jnp.where(win_valid, sobs.vals[win], 0.0)
        # membership: global sub id -> local slot (0 = absent)
        slotmap = jnp.zeros(sobs.n + 1, jnp.int32).at[
            jnp.clip(sub_rows, 0, sobs.n)].set(
            jnp.arange(r, dtype=jnp.int32) + 1, mode="drop")
        slot = slotmap[cols]
        tgt = jnp.where(slot > 0, slot - 1, r)
        ob = jnp.zeros((r, r), jnp.float32).at[
            jnp.arange(r, dtype=jnp.int32)[:, None], tgt].add(
            vals, mode="drop")
        return ob

    return obs_fn
