"""Incremental (delta) candidate scoring on the affected-contig mini-state.

The reference's hot kernel scores a candidate by recomputing only the pixel
pairs touched by the mutation (sub_compute_likelihood, kernels3.cu:3259-3718)
over the row set fill_sub_index builds from the contigs of fA and fB
(kernels3.cu:3225-3249, workload sizing cuda_lib_gl.py:2477-2483) — a
workload of O(touched rows x n). This module is the TPU-native redesign,
built on a sharper observation about the same row set:

    Let D = fragments of contig(fA) and contig(fB) in the *base* genome.
    Every candidate mutation only relabels fragments inside D, so for a
    pair (u, v) with v outside D, v's geometry is unchanged and u,v are in
    different contigs both before and after (contig members of u stay
    inside D) — the pair is trans in both genomes and its expected count
    is identical. Only pairs *within D x D* change.

    dL = sum over pairs u < v in D of [g_cand(u, v) - g_base(u, v)]

with g the Poisson log-pmf of the observed count given the expected count.
That is O(|D|^2) per candidate — independent of the genome size K — where
the reference (and the round-1 implementation) paid O(|D| * K). At chr1
scale (K ~ 500k) this is the difference between milliseconds and seconds
per step.

Mechanically, the whole step runs on a **mini-state**: the <= f_max member
fragments of the two contigs are gathered into a small GenomeState, all 13
mutations are applied to it (they are closed under D by construction —
every op only relabels the contigs of fA/fB), pairs are scored on the
gathered sub-fragment grid, and the winning candidate is written back into
the full state. Candidates whose member count exceeds the static ``f_max``
are excluded from selection via the validity mask (never via sentinel
scores); callers grow f_max between cycles as contigs coalesce, exactly
like the reference's l_cont-proportional workload sizing.

TPU notes: the log-pmf observation term is evaluated ONLY on observed
pairs — dense (R, R) gathers when a dense matrix exists, CSR windows at
chr1 scale. Membership/write-back maps use *small inverse-map scatters*
(r_max elements) + one gather round: TPU scatters serialise, but an
r_max-element scatter is microseconds, while the sorted-search
alternative costs log2(r_max) serial gather rounds over every query —
measured as the single largest stage of the chr1-scale step (device
trace: 17 of 45 ms in searchsorted's while-loop). The factorial term of
the pmf cancels in the difference, so no log-factorials are evaluated
at all.

This module scores repeat-free geometry (copy rows == data rows); the
copy-expanded case, where an observed count's expectation sums over repeat
copies, lives in :mod:`graal_tpu.core.delta_repeats` and is routed to
automatically by :func:`make_delta_em_step`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


class MiniTable(NamedTuple):
    """Static fragment -> sub-fragment row ranges of a repeat-free table."""

    sub_start: jnp.ndarray   # (n_frags,) int32: first sub row of fragment f
    sub_count: jnp.ndarray   # (n_frags,) int32: number of subs (<= 3)
    s_max: int               # max subs per fragment
    n_frags: int


def build_mini_table(table: SubFragTable,
                     allow_repeats: bool = False) -> MiniTable:
    """Host-side: per-fragment sub ranges (owner rows are built in fragment
    order by build_sub_frag_table, so ranges are contiguous).

    ``allow_repeats``: repeat tables are valid here too (owner rows stay
    contiguous per copy-fragment); the flag is an explicit opt-in because
    only the repeat-aware scorer (core.delta_repeats) handles the data-grid
    copy aggregation — the plain scorer would silently mis-score."""
    assert allow_repeats or not table.has_repeats, \
        "plain delta scoring requires repeat-free tables " \
        "(use core.delta_repeats for copy-expanded tables)"
    owner = np.asarray(table.owner)
    assert np.all(np.diff(owner) >= 0), "owner rows must be sorted"
    n_frags = int(owner.max()) + 1 if len(owner) else 0
    counts = np.bincount(owner, minlength=n_frags)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return MiniTable(
        sub_start=jnp.asarray(starts, jnp.int32),
        sub_count=jnp.asarray(counts, jnp.int32),
        s_max=int(counts.max()) if len(counts) else 1,
        n_frags=n_frags)


def extract_rows(state: GenomeState, f_a, f_b, f_max: int):
    """Member fragments of contig(fA) u contig(fB), padded to ``f_max``.

    Returns (rows (f_max,) int32, valid (f_max,), overflow ()) with the
    valid member rows forming an ascending prefix. The device-side
    equivalent of fill_sub_index_fA/_fB (kernels3.cu:3225-3249).
    """
    n = state.n_frags
    c_a = state.id_c[f_a]
    c_b = state.id_c[f_b]
    member = (state.id_c == c_a) | (state.id_c == c_b)
    n_members = jnp.sum(member)
    overflow = n_members > f_max
    idx = jnp.arange(n, dtype=jnp.int32)
    # members first, in ascending fragment order
    key = jnp.where(member, 2 * n - idx, -idx - 1)
    _, rows = jax.lax.top_k(key, f_max)
    valid = member[rows]
    return rows.astype(jnp.int32), valid, overflow


def extract_rows_union(state: GenomeState, f_a, ids, f_max: int):
    """Batched neighbour extraction through ONE genome-length top_k.

    The per-neighbour :func:`extract_rows` pays a top_k over all n
    fragments per neighbour — lowered to a full sort on TPU, measured as
    the dominant cost of the extraction stage (2.3 of 4.5 ms per step at
    500k fragments). All m neighbours share contig(fA), so this gathers
    the UNION of the m+1 contigs' members with one n-length top_k of
    capacity (m+1)*f_max, then selects each neighbour's rows with a tiny
    top_k over the union. Contigs larger than f_max are excluded from
    the union (every pair touching them overflows anyway), which keeps
    the union within capacity.

    Returns (rows (m, f_max), valid (m, f_max), overflow (m,)) with
    identical member sets/order as extract_rows; padding entries differ
    (inert either way). Overflow is derived from *counted* membership, not
    from l_cont — if l_cont ever drifted from the true member count, the
    truncated union would be flagged as overflow (excluded from selection)
    instead of silently scoring a partial member set.
    """
    n = state.n_frags
    m = ids.shape[0]
    u_cap = min(n, (m + 1) * f_max)
    c_a = state.id_c[f_a]
    c_bs = state.id_c[ids]                                  # (m,)
    memb_a = state.id_c == c_a                              # (n,)
    raw_memb_b = state.id_c[:, None] == c_bs[None, :]       # (n, m)
    cnt_a = jnp.sum(memb_a)
    cnt_b = jnp.sum(raw_memb_b, axis=0)                     # (m,)
    inc_a = cnt_a <= f_max
    inc_b = cnt_b <= f_max
    memb_b = raw_memb_b & inc_b[None, :]
    member_u = (memb_a & inc_a) | jnp.any(memb_b, axis=1)
    idx = jnp.arange(n, dtype=jnp.int32)
    key_u = jnp.where(member_u, 2 * n - idx, -idx - 1)
    _, rows_u = jax.lax.top_k(key_u, u_cap)                 # ascending members
    rows_u = rows_u.astype(jnp.int32)
    valid_u = member_u[rows_u]
    idc_u = jnp.where(valid_u, state.id_c[rows_u], -1)
    uidx = jnp.arange(u_cap, dtype=jnp.int32)

    overflow = jnp.where(c_bs == c_a, cnt_a,
                         cnt_a + cnt_b) > f_max             # (m,)

    def one(c_b):
        memb = (idc_u == c_a) | (idc_u == c_b)
        key = jnp.where(memb, 2 * u_cap - uidx, -uidx - 1)
        _, sel = jax.lax.top_k(key, min(f_max, u_cap))
        return rows_u[sel], memb[sel]

    rows, valid = jax.vmap(one)(c_bs)
    return rows, valid, overflow


_PAD_FIELDS = dict(pos=0, start_bp=0, l_cont=1, l_cont_bp=1, circ=0, ori=1,
                   activ=0, rep=0)


def gather_mini(state: GenomeState, rows, valid) -> GenomeState:
    """Gather a mini-state at ``rows``; padding rows become inert inactive
    singletons with unique negative contig ids (no op can touch them).

    All 11 fields ride ONE gather from a stacked (n, 11) matrix — gather
    cost is per row fetched, not per element, and the stack itself is
    unbatched (one O(n) pass per step, hoisted above the neighbour vmap),
    where 11 separate per-field gathers paid 11x the rows (the same
    observation as scatter_mini's write-back)."""
    f_max = rows.shape[0]
    mat = jnp.stack(state, axis=1)                         # (n, 11) int32
    got = mat[rows]
    mini = GenomeState(*(got[:, i] for i in range(len(state))))
    pad_idc = -(jnp.arange(f_max, dtype=jnp.int32) + 2)
    repl = {"id_c": jnp.where(valid, mini.id_c, pad_idc)}
    for f, fill in _PAD_FIELDS.items():
        repl[f] = jnp.where(valid, getattr(mini, f), fill)
    return mini._replace(**repl)


def scatter_mini(state: GenomeState, mini: GenomeState, rows, valid) -> GenomeState:
    """Write the mini-state's *mutable* fields back into the full state.

    Gather-formulated (sorted-search over the ascending valid prefix of
    ``rows``) — no device scatter."""
    from graal_tpu.core.state import MUTABLE_FIELDS

    n = state.n_frags
    f_max = rows.shape[0]
    # inverse slot map via an f_max-element scatter (padding rows target
    # index n -> dropped). A sorted search here costs log2(f_max) serial
    # gather rounds over all n fragments (the searchsorted while-loop
    # dominated the step in device traces); the scatter is tiny.
    vrows = jnp.where(valid, rows, n)
    inv = jnp.full((n,), -1, jnp.int32).at[vrows].set(
        jnp.arange(f_max, dtype=jnp.int32), mode="drop")
    in_d = inv >= 0
    pos_c = jnp.maximum(inv, 0)
    # all 8 mutable fields ride ONE gather (the cost is per row fetched,
    # not per element — eight separate per-field gathers were ~1.2 ms of
    # the 5 ms chr1-scale step in device traces)
    mini_mat = jnp.stack([getattr(mini, f) for f in MUTABLE_FIELDS], axis=1)
    got = mini_mat[pos_c]                                    # (n, 8)
    repl = {f: jnp.where(in_d, got[:, k], getattr(state, f))
            for k, f in enumerate(MUTABLE_FIELDS)}
    return state._replace(**repl)


def _log_cis(s, circ_u, stot_u, params, with_circ: bool):
    """log of the clamped cis expectation (the Pallas kernel's
    log-space formulation: ~2 transcendentals instead of ~6); the
    circular variant is compiled out when ``with_circ`` is False —
    dscore switches on a runtime any-circular-in-D flag."""
    log_v = jnp.log(params.v_inter)
    safe_s = jnp.maximum(s, 1e-9)
    log_s = jnp.log(safe_s)
    n_lin = safe_s * (params.lm / params.kuhn)
    log_lin = jnp.log(params.c1 * params.fact) + params.slope * log_s \
        + (params.d - 2.0) / (n_lin * n_lin + params.d)
    in_range = (s > 0.0) & (s < params.d_max)
    if not with_circ:
        return jnp.maximum(jnp.where(in_range, log_lin, log_v), log_v)
    lk = params.lm / params.kuhn
    log_k3fact = jnp.log(jnp.power(params.kuhn, -3.0) * params.fact)
    log_norm_circ = log_k3fact + params.slope * jnp.log(lk) \
        + (params.d - 2.0) / (lk * lk + params.d)
    n_circ = lk * safe_s * jnp.maximum(stot_u - s, 1e-9) \
        / jnp.maximum(stot_u, 1e-9)
    log_val_circ = log_k3fact + params.slope * jnp.log(n_circ) \
        + (params.d - 2.0) / (n_circ * n_circ + params.d)
    log_norm_lin = jnp.maximum(jnp.where(in_range, log_lin, log_v),
                               log_v)
    log_circ = log_val_circ + log_norm_lin - log_norm_circ
    log_cis = jnp.where(circ_u == 1, log_circ, log_lin)
    return jnp.maximum(jnp.where(in_range, log_cis, log_v), log_v)


def effective_band_w(band_w: int | None, table: SubFragTable,
                     f_max: int) -> int | None:
    """Crossover: keep the banded expected-mass decomposition only when the
    band is at most 1/8 of the mini-grid edge; otherwise the dense (R, R)
    grid is cheaper, so fall back to ``None``.

    The ratio is measured, not estimated: at r_max 2048 with band_w 972
    (ratio ~2) the banded path ran 198 ms/step vs the grid's 12.6 ms on a
    v5 lite — the 65 per-candidate lexsorts dominate, and TPU sorts cost
    far more than the extra transcendental grid cells they save. The
    round-2 heuristic (ratio 2) kept the band exactly where it was 16x
    slower."""
    if band_w is None:
        return None
    mt = build_mini_table(table, allow_repeats=True)
    r_max = min(f_max, mt.n_frags) * mt.s_max
    return band_w if 8 * band_w <= r_max else None


def make_delta_scorer(table: SubFragTable, obs, f_max: int, sobs=None,
                      candidate_batch: str = "auto", band_w: int | None = None,
                      catalogue=None, obs_impl: str = "auto",
                      grid_impl: str = "auto",
                      data_keys=None,
                      _ablate: str | None = None,
                      _off_chunk: int | None = None):
    """Build the per-neighbour delta scorer.

    ``data_keys``: optional (n_subs,) int32 map — when set, the observed
    CSR windows are fetched and membership-matched by ``data_keys[sub]``
    instead of the sub row itself (``sobs`` is then indexed on the DATA
    grid). This is how the repeat engine (core.delta_repeats) routes its
    plain-semantics majority through this scorer: copy rows keyed by
    their data bin. The caller owns the exactness contract — every
    window entry's expectation must be a single in-D copy pair (i.e. the
    sobs passed here must exclude entries touching any multi-copy bin);
    build_mini_table is then entered with allow_repeats=True.

    Returns ``dscore(state, f_a, f_b, params, max_id) ->
    (dll (13,), mini_cands (13, f_max) GenomeState, rows, valid, overflow)``
    with dll exactly log_likelihood(cand) - log_likelihood(base) whenever
    ``overflow`` is False.

    ``obs``: dense observed matrix (small problems) — the observation term
    gathers an (R, R) block. ``sobs``: a core.sparse.SparseObs (chr1
    scale) — the observation term is evaluated on CSR windows only.

    ``candidate_batch``: 'vmap' scores all 13 candidates at once (small
    pair grids), 'map' sequentially (bounded memory at large f_max);
    'auto' switches on the pair-grid size.

    ``catalogue``: the 13-candidate builder applied to the mini-state —
    defaults to the EM catalogue (core.candidates.build_candidates); pass
    core.candidates.mh_candidates for the MTM/MH mutation indexing. Must
    accept (state, f_a, f_b, max_id=...) and be closed under D.

    ``band_w``: when set, the expected-mass term is evaluated as the
    analytic trans mass plus a *banded* cis correction over the
    (contig, midpoint)-sorted mini rows — O(R * band_w) transcendentals
    instead of the O(R^2) pair grid, the same decomposition
    core.sparse.make_sparse_loglik uses (valid because the Rippe curve is
    exactly v_inter outside (0, d_max), kernels3.cu:120-133). The caller
    must pick ``band_w`` covering d_max (sparse.band_width) and keep
    nuisance d_max proposals inside the covered span. None keeps the
    dense pair grid (small problems, and the oracle for tests).

    ``obs_impl``: contraction used to densify the CSR windows into the
    (R, R) observed grid — 'pallas' (fused VMEM kernel,
    ops/obsgrid_pallas.py), 'einsum' (XLA one-hot matmul), or 'auto'
    (pallas on a TPU backend when r_max >= 256, einsum otherwise).

    ``grid_impl``: per-candidate pair-grid evaluation — 'pallas' (fused
    tile kernel, ops.likelihood_pallas.make_mini_grid_scorer: no (R, R)
    HBM intermediates, upper-triangle tiles only), 'jnp' (the grid_terms
    formulation; the CPU/test oracle), or 'auto' (pallas on a TPU
    backend when r_max >= 256, unless a banded mass path or an ablation
    is requested).

    NOTE: this function honours ``band_w`` literally (the banded-vs-grid
    equality test relies on that). The band is only a *win* when it is
    much narrower than the mini grid — a (R, band_w) slab plus a lexsort
    per candidate costs more than the (R, R) grid whenever
    band_w >~ R/2 (measured: a 64-row bucket with band_w=600 ran ~9x
    slower than the grid). Production entries (make_delta_em_step /
    make_delta_em_cycle / sharded cycles) apply that crossover via
    :func:`effective_band_w`.
    """
    if catalogue is None:
        catalogue = build_candidates
    mt = build_mini_table(table, allow_repeats=data_keys is not None)
    f_max = min(f_max, mt.n_frags)   # top_k cannot exceed the genome
    s_max = mt.s_max
    r_max = f_max * s_max
    k_subs = table.n_subs
    key_of = None if data_keys is None else jnp.asarray(data_keys, jnp.int32)
    use_window = sobs is not None
    if not use_window:
        obs_j = jnp.asarray(obs, jnp.float32)

    # 'auto': vmap on TPU — the sequential lax.map variant reproducibly
    # crashes the TPU worker at r_max >= 2048 (observed on v5e — also the
    # likely cause of the round-1 K=6000 delta fault), while the vmapped
    # grids run fine. On CPU the opposite holds: 13 vmapped (R, R)
    # candidate grids x the neighbour batch MATERIALISE (no TPU-style
    # fusion) — measured >100 GB peak RSS when the 100k-fragment test hit
    # a 4096 bucket — so large grids map sequentially there.
    if candidate_batch == "auto":
        if jax.default_backend() != "tpu" and r_max >= 2048:
            candidate_batch = "map"
        else:
            candidate_batch = "vmap"

    sub_len = table.len_kb
    sub_pre = table.prefix_kb
    sub_suf = table.suffix_kb
    sub_accu = table.accu
    nfpb = jnp.float32(table.n_frags_per_bins)

    def sub_rows_of(rows, valid):
        """Global sub rows of the mini fragments: (R,) plus owner slots."""
        start = mt.sub_start[rows]                      # (f_max,)
        count = mt.sub_count[rows]
        slot = jnp.arange(s_max, dtype=jnp.int32)[None, :]
        subs = start[:, None] + slot                    # (f_max, s_max)
        sub_valid = valid[:, None] & (slot < count[:, None])
        owner_slot = jnp.broadcast_to(
            jnp.arange(rows.shape[0], dtype=jnp.int32)[:, None], subs.shape)
        return (subs.reshape(-1), sub_valid.reshape(-1),
                owner_slot.reshape(-1))

    def geometry(mini: GenomeState, subs_c, sub_valid, owner_slot):
        start_kb = mini.start_bp[owner_slot].astype(jnp.float32) / 1000.0
        ori = mini.ori[owner_slot]
        mid = start_kb + jnp.where(ori == 1, sub_pre[subs_c],
                                   sub_suf[subs_c]) + sub_len[subs_c] * 0.5
        return dict(
            mid=mid,
            idc=mini.id_c[owner_slot],
            act=(mini.activ[owner_slot] == 1) & sub_valid,
            circ=mini.circ[owner_slot],
            stot=mini.l_cont_bp[owner_slot].astype(jnp.float32) / 1000.0)

    strict_upper = jax.lax.broadcasted_iota(jnp.int32, (r_max, r_max), 1) \
        > jax.lax.broadcasted_iota(jnp.int32, (r_max, r_max), 0)

    def e_sum_banded(geo, accu_sub, params, with_circ: bool):
        """sum_{u<v} E(u, v) as analytic trans mass + banded cis correction.

        Rippe is exactly v_inter outside (0, d_max), so only same-contig
        pairs within d_max differ from the trans floor; sorted by
        (contig, midpoint) those live in a band of width ``band_w``
        (core.sparse applies the same decomposition to the full
        likelihood). O(R * band_w) transcendentals instead of O(R^2), and
        the (large) trans mass is bitwise identical between base and
        candidate whenever the activity vector is unchanged — it cancels
        exactly in the delta."""
        a = jnp.where(geo["act"], accu_sub, 0.0)
        sa = jnp.sum(a)
        mass = params.v_inter * (sa * sa - jnp.sum(a * a)) * 0.5 / nfpb
        order = jnp.lexsort((geo["mid"], geo["idc"]))
        mid_s = geo["mid"][order]
        idc_s = geo["idc"][order]
        circ_s = geo["circ"][order]
        stot_s = geo["stot"][order]
        a_s = a[order]
        # Band offsets are consumed in bounded chunks: the vmapped
        # neighbour x candidate batch multiplies every live slab by ~65,
        # and a single-shot (r_max, band_w) slab at chr1 buckets blew HBM
        # (observed: f_max 4096, band_w ~1000, 500k frags -> a
        # [r_max*band_w, 5, 13] gather padded 15.8x to 15.6 GB). A
        # fori_loop of (r_max, off_chunk) slabs keeps peak memory flat at
        # identical flop count (core.sparse banding uses the same shape).
        off_base = jnp.arange(off_chunk, dtype=jnp.int32)
        rows_i = jnp.arange(r_max, dtype=jnp.int32)[:, None]

        def chunk_body(c, acc):
            offs = 1 + c * off_chunk + off_base                 # (off_chunk,)
            j = rows_i + offs[None, :]
            in_b = (j < r_max) & (offs <= band_w)[None, :]
            jc = jnp.clip(j, 0, r_max - 1)
            s = jnp.abs(mid_s[:, None] - mid_s[jc])
            same = (idc_s[:, None] == idc_s[jc]) & in_b
            na = a_s[:, None] * a_s[jc] / nfpb
            log_cis = _log_cis(s, circ_s[:, None], stot_s[:, None],
                               params, with_circ)
            corr = jnp.where(
                same,
                jnp.maximum(jnp.exp(log_cis) - params.v_inter, 0.0),
                0.0) * na
            return acc + jnp.sum(corr)

        corr_sum = jax.lax.fori_loop(0, n_off_chunks, chunk_body,
                                     jnp.float32(0.0))
        return mass + corr_sum

    use_banded = band_w is not None
    if grid_impl == "auto":
        use_grid_kernel = (jax.default_backend() == "tpu" and r_max >= 256
                           and not use_banded and _ablate is None)
    else:
        use_grid_kernel = grid_impl == "pallas"
    if use_grid_kernel:
        from graal_tpu.ops.likelihood_pallas import make_mini_grid_scorer
        log_nfpb = float(np.log(float(table.n_frags_per_bins)))
        mini_scorers = {
            wc: make_mini_grid_scorer(r_max, log_nfpb, with_circ=wc)
            for wc in (True, False)}
    if use_banded:
        # live-slab budget per batched lane (see e_sum_banded note);
        # _off_chunk overrides for tests
        off_chunk = _off_chunk if _off_chunk is not None else \
            max(8, min(band_w, (1 << 20) // max(r_max, 1)))
        n_off_chunks = -(-band_w // off_chunk)

    if use_window:
        cap = sobs.row_cap
        nnz = sobs.cols.shape[0]
        # (col, val) packed per nnz entry so ONE gather fetches both (the
        # gather cost is per row fetched, not per element). NOTE: vmapped
        # dynamic_slice looks tempting for the contiguous CSR runs but
        # lowers to a SERIAL while-loop of per-row slices on TPU — 3x
        # slower than the flat gather (measured via device trace).
        # Built once on the SparseObs (shared by every bucket); int32 pack
        # with the float lane bitcast INTO it — never int indices into
        # f32: TPU fused gathers canonicalise denormal/NaN float patterns
        # (observed: window columns silently became the row's own key,
        # zeroing the whole obs term; f32 counts round-trip through int32
        # losslessly).
        packed = sobs.packed   # WIDE storage (ceil((nnz+row_cap+16)/8), 16):
        # 8 (col, bitcast val) int32 pairs per storage row (core/sparse.py)

        n_ch = (cap + 14) // 8   # 8-entry storage rows covering any window

        def window_cols_vals(subs, sub_valid):
            """CSR windows of the D sub rows: (R, capw) column ids and
            masked counts, read once per neighbour (capw = padded window
            width, a multiple of 8).

            Fetched through the WIDE packed layout (8 entries per storage
            row, core/sparse.py): one fast-path gather row per 8 window
            entries instead of one per entry — the per-entry flat gather
            was the single largest op of the chr1-scale step (device
            trace: 1.1 of 3.2 ms at 20k fragments; ~17.8 of 28 ms
            scoring at 500k). A window's entries land lane-shifted by
            (start % 8), which no consumer cares about: the obs-grid
            contraction is position-agnostic.
            """
            rc = jnp.clip(subs, 0, k_subs - 1)
            if key_of is not None:
                rc = key_of[rc]                    # window rows: data grid
            start = jnp.minimum(sobs.row_start[rc], nnz)
            end = sobs.row_start[rc + 1]
            base = start >> 3                                  # (R,)
            rows_w = base[:, None] + jnp.arange(n_ch, dtype=jnp.int32)
            pk = packed[rows_w.reshape(-1)].reshape(
                (-1, n_ch, 8, 2))                              # (R,n_ch,8,2)
            g = rows_w[:, :, None] * 8 \
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]
            win_valid = (g >= start[:, None, None]) \
                & (g < end[:, None, None]) \
                & sub_valid[:, None, None]
            cols = pk[..., 0].reshape((-1, n_ch * 8))
            vals = jnp.where(
                win_valid,
                jax.lax.bitcast_convert_type(pk[..., 1], jnp.float32),
                0.0).reshape((-1, n_ch * 8))
            return cols, vals

        # membership IS the one-hot: compare window columns directly
        # against the D sub rows — no inverse slot map at all (the
        # r_max-scatter + inv[cols] gather was ~1.7 ms of the 5 ms step
        # in device traces; a sorted search costs log2(r_max) SERIAL
        # gather rounds, 17 ms). Padding slots get key -1 (no column can
        # match); symmetric storage puts each in-D pair in both
        # orientations, so the strict upper triangle keeps exactly one.
        # Two implementations of the contraction:
        #   - 'pallas': fused VMEM compare-accumulate kernel
        #     (ops/obsgrid_pallas.py) — the default on TPU. The XLA
        #     einsum materialises an (R, cap, R) float one-hot in HBM
        #     (~750 MB at R 1024/cap 180) and was the largest stage of
        #     the 100k-fragment step (~5.1 of 10.1 ms,
        #     benchmarks/bisect_delta.py); the kernel keeps the whole
        #     accumulation in VMEM.
        #   - 'einsum': the one-hot MATMUL (vals operand at HIGHEST
        #     precision: the TPU MXU rounds DEFAULT f32 operands to
        #     bf16, which would corrupt observed counts > 256; the
        #     one-hot operand is 0/1 — exact in bf16). CPU tests and
        #     the oracle path use this.
        if obs_impl == "auto":
            use_kernel = jax.default_backend() == "tpu" and r_max >= 256
        else:
            use_kernel = obs_impl == "pallas"
        if use_kernel:
            from graal_tpu.ops.obsgrid_pallas import make_window_obs_grid
            capw = n_ch * 8
            window_grid = make_window_obs_grid(r_max, capw)

            def obs_grid(subs, sub_valid):
                cols, vals = window_cols_vals(subs, sub_valid)
                subs_k = subs if key_of is None \
                    else key_of[jnp.clip(subs, 0, k_subs - 1)]
                key_j = jnp.where(sub_valid, subs_k, -1)
                ob = window_grid(cols, vals, key_j)
                return jnp.where(strict_upper, ob, 0.0)
        else:
            def obs_grid(subs, sub_valid):
                cols, vals = window_cols_vals(subs, sub_valid)
                subs_k = subs if key_of is None \
                    else key_of[jnp.clip(subs, 0, k_subs - 1)]
                key_j = jnp.where(sub_valid, subs_k, -1)
                # key axis consumed in bounded chunks: a monolithic
                # (R, capw, R) float one-hot is ~750 MB at R 1024 /
                # capw 184 (and blew CPU test memory at 100k fragments);
                # splitting the einsum OUTPUT axis is bitwise identical
                capw = cols.shape[1]
                jc = max(8, min(r_max, (64 << 20) // max(4 * capw * r_max, 1)))
                parts = []
                for lo in range(0, r_max, jc):
                    oh = cols[:, :, None] == key_j[None, None, lo:lo + jc]
                    parts.append(jnp.einsum(
                        "rw,rwj->rj", vals, oh.astype(jnp.float32),
                        precision=(jax.lax.Precision.HIGHEST,
                                   jax.lax.Precision.DEFAULT)))
                ob = jnp.concatenate(parts, axis=1)
                return jnp.where(strict_upper, ob, 0.0)
    else:
        def obs_grid(subs, sub_valid):
            """Dense path: gather the (R, R) block, strict upper only."""
            sub_c = jnp.clip(subs, 0, k_subs - 1)
            ob = obs_j[sub_c[:, None], sub_c[None, :]]
            pair_ok = strict_upper & sub_valid[:, None] & sub_valid[None, :]
            return jnp.where(pair_ok, ob, 0.0)

    # benchmark-only kill switches (benchmarks/bisect_delta.py): attribute
    # step cost by zeroing one term; NEVER set in product paths
    if _ablate == "windows":
        def obs_grid(subs, sub_valid):                 # noqa: F811
            return jnp.zeros((r_max, r_max), jnp.float32)

    def grid_terms(geo, accu_sub, log_na_grid, ob, params, with_circ: bool):
        """ONE (R, R) elementwise pass: the observed log term and (unless
        the banded mass path is active) the expected mass, sharing the
        log_cis grid."""
        s = jnp.abs(geo["mid"][:, None] - geo["mid"][None, :])
        same = geo["idc"][:, None] == geo["idc"][None, :]
        log_cis = _log_cis(s, geo["circ"][:, None], geo["stot"][:, None],
                           params, with_circ)
        act = geo["act"][:, None] & geo["act"][None, :]
        if _ablate == "obs":
            w = jnp.float32(0.0)
        else:
            log_e = jnp.where(same, log_cis, jnp.log(params.v_inter)) \
                + log_na_grid
            w = jnp.sum(jnp.where(act, ob * log_e, 0.0))
        if use_banded or _ablate == "esum":
            es = jnp.float32(0.0) if _ablate == "esum" else \
                e_sum_banded(geo, accu_sub, params, with_circ)
        else:
            na = accu_sub[:, None] * accu_sub[None, :] / nfpb
            e = jnp.where(same, jnp.exp(log_cis), params.v_inter) * na
            es = jnp.sum(jnp.where(strict_upper & act, e, 0.0))
        return w - es

    def dscore_spec(state: GenomeState, f_a, f_b, params: RippeParams,
                    max_id, with_circ: bool, rows=None, valid=None,
                    overflow=None):
        """Circ-specialised scorer: ``with_circ`` is a PYTHON bool, so only
        one branch is traced. Callers that batch dscore (vmap over
        neighbours) must hoist the circular/linear decision above the batch
        axis themselves — under vmap a lax.cond lowers to a select that
        computes BOTH branches, doubling the whole scoring cost (measured:
        benchmarks/bisect_delta.py).

        ``rows``/``valid``/``overflow``: optional precomputed member set
        (extract_rows semantics) — make_delta_em_step batches the
        extraction for all neighbours through ONE genome-length top_k
        (:func:`extract_rows_union`) and passes the per-neighbour slices
        here."""
        if rows is None:
            rows, valid, overflow = extract_rows(state, f_a, f_b, f_max)
        mini = gather_mini(state, rows, valid)
        lf_a = jnp.argmax(rows == f_a).astype(jnp.int32)
        lf_b = jnp.argmax(rows == f_b).astype(jnp.int32)
        # f_b outside D only when f_b == f_a is masked upstream; if f_b is
        # not a member (can't happen: its contig is in D) argmax gives 0 —
        # the overflow/validity machinery keeps this safe regardless.
        cands = catalogue(mini, lf_a, lf_b, max_id=max_id)

        subs, sub_valid, owner_slot = sub_rows_of(rows, valid)
        subs_c = jnp.clip(subs, 0, k_subs - 1)
        ob = obs_grid(subs, sub_valid)

        # accu is static per sub row — hoist it (and its log outer grid)
        # out of the per-candidate scoring
        accu_sub = sub_accu[subs_c]
        log_accu = jnp.log(accu_sub)

        if use_grid_kernel:
            # fused Pallas tile loop over base + 13 candidates in one
            # call: no per-candidate (R, R) HBM intermediates, and only
            # upper-triangle tiles are enumerated (see
            # ops.likelihood_pallas.make_mini_grid_scorer)
            full = jax.tree.map(
                lambda m, c: jnp.concatenate([m[None], c], axis=0),
                mini, cands)
            geo = jax.vmap(
                lambda st: geometry(st, subs_c, sub_valid, owner_slot))(full)
            # zero ob at inactive rows/cols: the kernel masks the EXPECTED
            # side via la=-1e9, but an unmasked ob at a valid-but-inactive
            # row would add ob*(-1e9) to every score and the base-candidate
            # difference would lose all precision to f32 cancellation.
            # Base activity (geo["act"][0]) is the right mask: this scorer
            # is repeat-free (swap_activity is a no-op at rep==0), so act
            # is identical across base + 13 candidates.
            act0 = geo["act"][0]
            ob = jnp.where(act0[:, None] & act0[None, :], ob, 0.0)
            la = jnp.where(geo["act"], log_accu[None, :], -1e9)
            scores = mini_scorers[with_circ](
                geo["mid"], geo["idc"], geo["circ"].astype(jnp.float32),
                geo["stot"], la, ob, params)
            return scores[1:] - scores[0], cands, rows, valid, overflow

        log_na_grid = log_accu[:, None] + log_accu[None, :] - jnp.log(nfpb)

        geo_base = geometry(mini, subs_c, sub_valid, owner_slot)
        base_score = grid_terms(geo_base, accu_sub, log_na_grid, ob, params,
                                with_circ)

        def one(cand):
            geo = geometry(cand, subs_c, sub_valid, owner_slot)
            return grid_terms(geo, accu_sub, log_na_grid, ob, params,
                              with_circ) - base_score

        if candidate_batch == "vmap":
            dll = jax.vmap(one)(cands)
        else:
            dll = jax.lax.map(one, cands)
        return dll, cands, rows, valid, overflow

    def dscore(state: GenomeState, f_a, f_b, params: RippeParams, max_id):
        # circular contigs are rare (paste can circularise); pay the
        # circular-variant transcendentals only when D actually has one
        any_circ = jnp.any(state.id_c[f_b] == state.id_c[f_a]) | \
            jnp.any(state.circ == 1)

        def run(with_circ):
            return lambda _: dscore_spec(state, f_a, f_b, params, max_id,
                                         with_circ)

        return jax.lax.cond(any_circ, run(True), run(False), operand=None)

    dscore.spec = dscore_spec
    return dscore


def make_delta_em_step(table: SubFragTable, obs, nb, delta: int, f_max: int,
                      sobs=None, candidate_batch: str = "auto",
                      neighbour_batch: str = "auto",
                      band_w: int | None = None,
                      thresh_overflow: float | None = None):
    """EM step with delta scoring (shift-equivalent to absolute scores: the
    selection filter is shift-invariant). Returns
    step(state, key, params, l_t, f_a, f_t) ->
    (state, l_t_new, (op, fb, n_overflow)).

    ``l_t`` is carried incrementally (l_t += dL of the committed move);
    callers re-anchor with a full evaluation once per cycle to stop f32
    drift (the reference recomputes the full likelihood every step,
    cuda_lib_gl.py:1828-1848).

    ``neighbour_batch``: 'vmap' scores all neighbour slots in one wide
    computation (amortises the per-op overhead of the mutation chains —
    the measured step cost is op-count-bound, not arithmetic-bound);
    'map' runs them sequentially (lower peak memory, CPU hosts only —
    sequential lax.map over the scorer reproducibly CRASHES the TPU
    worker at r_max >= 2048, same fault as the candidate-batch note in
    make_delta_scorer; round 3 reproduced it through ScaleRunner.run when
    a random shuffle produced a >1023-bin piece and 'auto' still picked
    'map'). 'auto' therefore always vmaps.
    """
    from graal_tpu.core.mcmc import (THRESH_OVERFLOW, sample_neighbours,
                                     select_score_slot)

    if thresh_overflow is None:
        thresh_overflow = THRESH_OVERFLOW
    if table.has_repeats:
        # copy-expanded tables route to the repeat-aware scorer (data-grid
        # copy aggregation); band decomposition does not apply there
        from graal_tpu.core import delta_repeats
        from graal_tpu.core import sparse as sparse_mod

        sobs_eff = sobs if sobs is not None \
            else sparse_mod.sparse_from_dense(obs)
        dscore = delta_repeats.make_repeat_delta_scorer_v2(
            table, f_max, sobs_eff,
            candidate_batch="map" if candidate_batch == "map" else "vmap")
    else:
        dscore = make_delta_scorer(
            table, obs, f_max, sobs=sobs, candidate_batch=candidate_batch,
            band_w=effective_band_w(band_w, table, f_max))
    mt = build_mini_table(table, allow_repeats=True)
    if neighbour_batch == "auto":
        # same CPU-memory guard as the candidate axis (make_delta_scorer):
        # on CPU at large buckets the vmapped neighbour lanes multiply the
        # materialised grids 5x
        r_max_eff = min(f_max, mt.n_frags) * mt.s_max
        if jax.default_backend() != "tpu" and r_max_eff >= 2048:
            neighbour_batch = "map"
        else:
            neighbour_batch = "vmap"

    def step(state: GenomeState, key, params: RippeParams, l_t, f_a, f_t):
        k_nb, k_sel = jax.random.split(key)
        ids, valid = sample_neighbours(k_nb, f_a, state, nb, delta)
        max_id = jnp.max(state.id_c)

        # The circular/linear specialisation is hoisted ABOVE the neighbour
        # batch: one cond around the whole vmapped scoring (inside the vmap
        # it would lower to a select computing both branches). Sound
        # predicate: candidates only circularise via paste when fA and a
        # neighbour share a contig (ops.paste same-contig branch), or when
        # a circular contig already exists (pop_out/pop_in preserve or
        # linearise but never create circ otherwise).
        any_circ = jnp.any(state.circ == 1) | \
            jnp.any(state.id_c[ids] == state.id_c[f_a])

        if not table.has_repeats:
            # one genome-length top_k for ALL neighbours (the
            # per-neighbour extraction lowers to a full n-element sort on
            # TPU and dominated the stage at 500k fragments: 2.3 of
            # 4.5 ms); the repeat scorer keeps its own extraction
            fmx = min(f_max, mt.n_frags)
            rows_b, valid_b, over_b = extract_rows_union(state, f_a, ids,
                                                         fmx)

            def score_nb(fb, rows, rvalid, over, with_circ):
                return dscore.spec(state, f_a, fb, params, max_id,
                                   with_circ, rows=rows, valid=rvalid,
                                   overflow=over)

            nb_args = (ids, rows_b, valid_b, over_b)
        else:
            def score_nb(fb, with_circ):
                return dscore.spec(state, f_a, fb, params, max_id,
                                   with_circ)

            nb_args = (ids,)

        def score_branch(with_circ):
            def run(_):
                fn = functools.partial(score_nb, with_circ=with_circ)
                if neighbour_batch == "vmap":
                    return jax.vmap(fn)(*nb_args)
                return jax.lax.map(lambda a: fn(*a), nb_args)
            return run

        dll, minis, rows, rows_valid, overflow = jax.lax.cond(
            any_circ, score_branch(True), score_branch(False), operand=None)
        m = ids.shape[0]
        slot_ok = jnp.broadcast_to(~overflow[:, None], (m, N_CANDIDATES))

        sel = select_score_slot(k_sel, dll, valid, f_t, slot_valid=slot_ok,
                                thresh_overflow=thresh_overflow)
        sel_nb = sel // N_CANDIDATES
        sel_op = sel % N_CANDIDATES
        sel_mini = jax.tree.map(lambda x: x[sel_nb, sel_op], minis)
        new_state = scatter_mini(state, sel_mini, rows[sel_nb],
                                 rows_valid[sel_nb])

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
            jnp.where(skip, -1, sel_op),
            jnp.where(skip, f_a, ids[sel_nb]),
            jnp.sum(overflow))

    return step


def make_delta_em_cycle(table: SubFragTable, obs, nb, delta: int, f_max: int,
                        sobs=None, anchor_fn=None,
                        candidate_batch: str = "auto",
                        band_w: int | None = None,
                        thresh_overflow: float | None = None):
    """Full delta-scored EM cycle as a lax.scan, with a final full
    re-anchoring of the likelihood.

    ``anchor_fn(state, params) -> scalar``: the full-likelihood evaluation
    used to re-anchor l_t (defaults to the dense jnp likelihood; pass the
    sparse evaluation at chr1 scale, or ``anchor_fn=False`` to skip the
    re-anchor entirely — chunked callers anchor once per cycle outside).
    """
    from graal_tpu.core.likelihood import log_likelihood

    step = make_delta_em_step(table, obs, nb, delta, f_max, sobs=sobs,
                              candidate_batch=candidate_batch, band_w=band_w,
                              thresh_overflow=thresh_overflow)
    if anchor_fn is False:
        def anchor_fn(state, params, l_t=None):
            return l_t
        skip_anchor = True
    else:
        skip_anchor = False
    if anchor_fn is None:
        obs_j = jnp.asarray(obs, jnp.float32)

        def anchor_fn(state, params):
            return log_likelihood(state, table, obs_j, params)

    @jax.jit
    def cycle(state: GenomeState, key, params: RippeParams, frag_order, l_t, f_t):
        # Compensated (Kahan) carry: l_t is only ever ADDED to inside the
        # step (the selection filter is shift-invariant), so the step runs
        # with l_t=0 and returns the raw increment d_sel, accumulated here
        # in a two-f32 compensated sum. A plain f32 carry quantises every
        # add to the ulp of |L| (0.25 at the 20k-bin chr1 config, |L|~3e6)
        # — measured as a random-walk drift of ~33 over a 256-step chunk
        # vs the re-anchor (benchmarks/bisect_repeat_drift.py: per-step
        # errors were exact ulp multiples, signed sum ~0).
        def body(carry, f_a):
            state, key, l_hi, l_c = carry
            key, sub = jax.random.split(key)
            state, d_sel, (op, fb, n_over) = step(state, sub, params,
                                                  jnp.float32(0.0), f_a, f_t)
            y = d_sel - l_c
            t = l_hi + y
            l_c = (t - l_hi) - y
            l_hi = t
            return (state, key, l_hi, l_c), (l_hi, op, fb, n_over,
                                             state.n_contigs())

        (state, key, l_t, _), (lls, ops_, fbs, overs, ncs) = jax.lax.scan(
            body, (state, key, l_t, jnp.float32(0.0)), frag_order)
        l_anchor = l_t if skip_anchor else anchor_fn(state, params)
        return state, l_anchor, (lls, ops_, fbs, overs, ncs)

    return cycle
