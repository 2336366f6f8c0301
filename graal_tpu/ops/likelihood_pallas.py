"""Pallas TPU kernel: batched Poisson log-likelihood over the pair grid.

The hot op of the whole framework: score a *batch of candidate genomes*
against the observed contact matrix. Equivalent math to
graal_tpu.core.likelihood.log_likelihood (the jnp reference/oracle), with
two kernel-level optimisations:

1. **log-space Rippe evaluation** — the reference computes
   ``c1 * s^slope * exp((d-2)/(n^2+d)) * fact`` then takes ``log`` again in
   the Poisson pmf (kernels3.cu:126, :177); here
   ``log e = log(c1*fact) + slope*log(s) + (d-2)/(n^2+d)`` costs one log +
   one exp per pair instead of ~5 transcendentals (pow, exp, log, and the
   always-computed circular variant),
2. **observation-constant elimination** — the ``-log(ob!)`` term of the pmf
   does not depend on the genome; it is folded into a setup-time constant,
   so the kernel computes only ``ob*log(e) - e``.

Supports the repeat-free geometry (copy grid == data grid); the repeat path
stays on the jnp implementation. Tiles are (TB x TB) blocks of the pair
grid; the grid iterates (candidate, row-block, col-block) with the output
scalar accumulated across a candidate's tiles (TPU grids run sequentially).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable

TB = 256  # tile edge (multiple of 128 lanes / 8 sublanes)


def _round_up(x, m):
    return (x + m - 1) // m * m


def obs_constant(obs: np.ndarray) -> float:
    """Setup-time constant: -sum_{s<t} log(ob!) with the reference's branch
    structure (exact factorial < 10, Stirling >= 10, Stirling expansion
    >= 15; kernels3.cu:80-93, :169-210)."""
    obs = np.asarray(obs, np.float64)
    iu, ju = np.triu_indices(obs.shape[0], k=1)
    ob = obs[iu, ju]
    out = np.zeros_like(ob)
    big = ob >= 15
    out[big] = -(ob[big] * np.log(ob[big]) - ob[big]
                 + np.log(np.sqrt(ob[big] * 2 * np.pi)))
    mid = (ob >= 10) & ~big
    n = np.floor(ob[mid])
    out[mid] = -(n * np.log(n) - n + 0.5 * np.log(2 * np.pi * n))
    small = (ob > 0) & (ob < 10)
    out[small] = -np.array([math.lgamma(math.floor(x) + 1) for x in ob[small]])
    return float(out.sum())


def _ll_kernel(ti_ref, tj_ref, mid_r, mid_c, idc_r, idc_c, circ_r, stot_r,
               la_r, la_c, obs_tile, tc_ref, p_ref, out_ref, *, k_real, cb):
    """One (TB x TB) tile of ``cb`` candidates' pair grids.

    The grid enumerates only the upper-triangle tiles (t, g); the
    scalar-prefetched ti/tj arrays map t -> (row block, col block), so no
    grid step is spent on fully-masked lower tiles. Grid order (t, g):
    the obs tile stays resident across the whole candidate batch.

    ``cb`` candidates are processed per grid step (unrolled): the
    per-grid-step sequencing overhead (~0.6 us) dominates a (n_tri, B)
    grid at S1 scale, so chunking the candidate axis 13x is a ~2x
    end-to-end win (measured; /tmp toy kernel: 0.62 ms pure overhead at
    975 steps vs 48 us at 75).

    tc_ref (SMEM, (n_tri, 3)): static per-tile masked sums [sum ob,
    sum ob*la_pair, sum accu_u*accu_v/nfpb] -- observed counts and
    accumulation weights do not depend on the candidate genome, so a
    pure-trans tile's whole contribution
    ``sum ob*(log_v + la) - v_inter*exp(la)`` collapses to the affine
    form ``log_v*tc[0] + tc[1] - v_inter*tc[2]``: two multiply-adds
    instead of TB*TB VPU cells.

    p_ref (SMEM): [log_c1fact, slope, d, d_max, lm/kuhn, log_v_inter,
                   v_inter, log_norm_circ_const, log_k3fact, log_nfpb]
    """
    t = pl.program_id(0)
    g = pl.program_id(1)
    i = ti_ref[t]
    j = tj_ref[t]

    for k in range(cb):
        c = g * cb + k

        @pl.when(t == 0)
        def _init(c=c):
            out_ref[0, c] = 0.0

        # Tiles with no same-contig pair are pure trans: the expectation
        # is v_inter * accu_u * accu_v / nfpb — no Rippe evaluation at
        # all, and the whole tile collapses to the precomputed affine
        # form (tc_ref). Early in assembly (small contigs) most
        # off-diagonal tiles qualify.
        any_same = jnp.any(idc_r[c, :][:, None] == idc_c[c, :][None, :])
        # circular contigs only exist after explicit circularisation
        # events — skip the always-on circular-variant transcendentals
        # (a second log and divide per cell) when no row belongs to one
        any_circ = jnp.any(circ_r[c, :] > 0.0)

        @pl.when(any_same & any_circ)
        def _full_circ(c=c):
            _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r, la_r,
                       la_c, obs_tile, p_ref, out_ref, c, i, j, k_real,
                       with_circ=True)

        @pl.when(any_same & jnp.logical_not(any_circ))
        def _full_lin(c=c):
            _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r, la_r,
                       la_c, obs_tile, p_ref, out_ref, c, i, j, k_real,
                       with_circ=False)

        @pl.when(jnp.logical_not(any_same))
        def _trans(c=c):
            out_ref[0, c] += (p_ref[0, 5] * tc_ref[t, 0] + tc_ref[t, 1]
                              - p_ref[0, 6] * tc_ref[t, 2])


def _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r, la_r, la_c,
               obs_tile, p_ref, out_ref, c, i, j, k_real, *,
               with_circ=True):
    log_c1fact = p_ref[0, 0]
    slope = p_ref[0, 1]
    d = p_ref[0, 2]
    d_max = p_ref[0, 3]
    lm_over_kuhn = p_ref[0, 4]
    log_v = p_ref[0, 5]
    v_inter = p_ref[0, 6]
    log_norm_circ = p_ref[0, 7]
    log_k3fact = p_ref[0, 8]
    log_nfpb = p_ref[0, 9]

    mr = mid_r[c, :]                      # (TB,)
    mc = mid_c[c, :]
    s = jnp.abs(mr[:, None] - mc[None, :])          # (TB, TB)
    same = idc_r[c, :][:, None] == idc_c[c, :][None, :]

    safe_s = jnp.maximum(s, 1e-9)
    log_s = jnp.log(safe_s)
    n_lin = safe_s * lm_over_kuhn
    log_lin = log_c1fact + slope * log_s + (d - 2.0) / (n_lin * n_lin + d)
    in_range = (s > 0.0) & (s < d_max)

    if with_circ:
        # circular-contig variant (log space), selected per row
        circ_row = circ_r[c, :][:, None] == 1
        stot = stot_r[c, :][:, None]
        n_circ = lm_over_kuhn * safe_s * jnp.maximum(stot - s, 1e-9) / jnp.maximum(stot, 1e-9)
        log_val_circ = log_k3fact + slope * jnp.log(n_circ) + (d - 2.0) / (n_circ * n_circ + d)
        # norm_lin of the reference is the *clamped* linear value
        log_norm_lin = jnp.where(in_range, jnp.maximum(log_lin, log_v),
                                 log_v)
        log_circ = log_val_circ + log_norm_lin - log_norm_circ
        log_cis = jnp.where(circ_row, log_circ, log_lin)
    else:
        log_cis = log_lin
    log_cis = jnp.where(in_range, log_cis, -jnp.inf)
    log_cis = jnp.maximum(log_cis, log_v)
    log_e0 = jnp.where(same, log_cis, log_v)
    log_accu = la_r[c, :][:, None] + la_c[c, :][None, :] - log_nfpb
    log_e = log_e0 + log_accu
    e = jnp.exp(log_e)

    ob = obs_tile[:, :]
    contrib = ob * log_e - e

    # strict upper triangle in global coordinates + real-size mask
    row_g = i * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
    col_g = j * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
    mask = (col_g > row_g) & (row_g < k_real) & (col_g < k_real)
    out_ref[0, c] += jnp.sum(jnp.where(mask, contrib, 0.0))


def make_pallas_scorer(table: SubFragTable, obs, interpret: bool = False):
    """Build ``score(states_batch, params) -> (B,) log-likelihoods``.

    ``states_batch`` is a GenomeState pytree with a leading batch axis.
    The returned values match core.likelihood.log_likelihood (including the
    observation constant). ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU testing).

    Repeat-carrying tables dispatch to the copy-summing kernel
    (:func:`make_repeat_pallas_scorer`).
    """
    if table.has_repeats:
        return make_repeat_pallas_scorer(table, obs, interpret=interpret)
    k_real = table.n_subs
    k_pad = _round_up(k_real, TB)
    obs_np = np.zeros((k_pad, k_pad), np.float32)
    obs_np[:k_real, :k_real] = np.asarray(obs, np.float32)
    obs_dev = jnp.asarray(obs_np)
    const = obs_constant(obs)

    owner = table.owner
    prefix = table.prefix_kb
    suffix = table.suffix_kb
    len_half = table.len_kb * 0.5
    log_accu = jnp.log(table.accu)

    n_rb = k_pad // TB

    def params_vector(p: RippeParams):
        log_c1fact = jnp.log(p.c1 * p.fact)
        log_k3fact = jnp.log(jnp.power(p.kuhn, -3.0) * p.fact)
        nmax = p.lm / p.kuhn
        log_norm_circ = (log_k3fact + p.slope * jnp.log(nmax)
                         + (p.d - 2.0) / (nmax * nmax + p.d))
        return jnp.stack([
            log_c1fact, p.slope, p.d, p.d_max, p.lm / p.kuhn,
            jnp.log(p.v_inter), p.v_inter, log_norm_circ, log_k3fact,
            jnp.float32(np.log(table.n_frags_per_bins))]).astype(jnp.float32)

    # upper-triangle tile enumeration (row-major), scalar-prefetched
    tri = [(i, j) for i in range(n_rb) for j in range(i, n_rb)]
    ti_np = np.asarray([i for i, _ in tri], np.int32)
    tj_np = np.asarray([j for _, j in tri], np.int32)
    n_tri = len(tri)

    # static per-tile sums for the pure-trans affine shortcut (f64 host
    # accumulation; neither obs nor accu depends on the candidate genome)
    nfpb = float(table.n_frags_per_bins)
    accu_pad = np.zeros(k_pad, np.float64)
    accu_pad[:k_real] = np.asarray(table.accu, np.float64)
    la_pad = np.zeros(k_pad, np.float64)
    la_pad[:k_real] = np.log(accu_pad[:k_real])
    obs64 = obs_np.astype(np.float64)
    tc_np = np.zeros((n_tri, 3), np.float32)
    for t, (bi, bj) in enumerate(tri):
        rs = slice(bi * TB, (bi + 1) * TB)
        cs = slice(bj * TB, (bj + 1) * TB)
        rg = np.arange(bi * TB, (bi + 1) * TB)[:, None]
        cg = np.arange(bj * TB, (bj + 1) * TB)[None, :]
        m = (cg > rg) & (rg < k_real) & (cg < k_real)
        ob = obs64[rs, cs]
        lap = (la_pad[rs][:, None] + la_pad[cs][None, :]
               - np.log(nfpb))
        acc = accu_pad[rs][:, None] * accu_pad[cs][None, :] / nfpb
        tc_np[t, 0] = (ob * m).sum()
        tc_np[t, 1] = (ob * np.where(m, lap, 0.0)).sum()
        tc_np[t, 2] = (acc * m).sum()
    tc_dev = jnp.asarray(tc_np)

    def _pad_vec(x, fill=0.0):
        return jnp.pad(x, (0, k_pad - k_real), constant_values=fill)

    def sub_vectors(state: GenomeState):
        """Per-sub-fragment vectors of one genome (cheap O(K) gathers)."""
        start_kb = state.start_bp[owner].astype(jnp.float32) / 1000.0
        ori = state.ori[owner]
        mid = start_kb + jnp.where(ori == 1, prefix, suffix) + len_half
        idc = state.id_c[owner]
        circ = state.circ[owner]
        stot = state.l_cont_bp[owner].astype(jnp.float32) / 1000.0
        # padded tail: unique fake contig ids -> always trans, log_accu -inf
        # would poison; use la = -1e9 so exp(log_e)=0 and ob=0 in padding.
        pad_idc = -jnp.arange(1, k_pad - k_real + 1, dtype=jnp.int32)
        return (
            _pad_vec(mid),
            jnp.concatenate([idc, pad_idc]),
            _pad_vec(circ.astype(jnp.float32)),
            _pad_vec(stot, fill=1.0),
            _pad_vec(log_accu, fill=-1e9),
        )

    # Per-sub-fragment vectors are loaded with the full candidate axis per
    # tile (block (B, TB), ~B*1KB) -- TPU block shapes require the
    # second-to-last dim to be 8-divisible or full; the kernel picks its
    # candidate row with a program id. Index maps read the prefetched
    # triangle coordinates.
    def row_map(t, c, ti, tj):
        return (0, ti[t])

    def col_map(t, c, ti, tj):
        return (0, tj[t])

    def obs_map(t, c, ti, tj):
        return (ti[t], tj[t])

    grid_sp = lambda b, cb: pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tri, b // cb),
        in_specs=[
            pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),  # mid rows
            pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),  # mid cols
            pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),  # idc rows
            pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),  # idc cols
            pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),  # circ rows
            pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),  # stot rows
            pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),  # log_accu rows
            pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),  # log_accu cols
            pl.BlockSpec((TB, TB), obs_map, memory_space=pltpu.VMEM), # obs tile
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # tile consts
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    def score(states_batch: GenomeState, params: RippeParams):
        vecs = jax.vmap(sub_vectors)(states_batch)
        mid, idc, circ, stot, la = vecs
        b = mid.shape[0]
        # candidates per grid step: largest divisor of b <= 16 (b is a
        # multiple of 13 on the EM path, so usually 13)
        cb = max(d for d in range(1, min(b, 16) + 1) if b % d == 0)
        pvec = params_vector(params)
        # out shape (1, b): the trailing two dims equal the array dims, so
        # jax.vmap of the whole scorer (e.g. tempered chains on one chip)
        # batches the SMEM output legally (a 1-D (b,) output lowers to a
        # (Squeezed, b) block under vmap, which Mosaic rejects)
        out = pl.pallas_call(
            functools.partial(_ll_kernel, k_real=k_real, cb=cb),
            grid_spec=grid_sp(b, cb),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(ti_np), jnp.asarray(tj_np),
          mid, mid, idc.astype(jnp.int32), idc.astype(jnp.int32), circ, stot,
          la, la, obs_dev, tc_dev, pvec.reshape(1, -1))
        return out[0] + jnp.float32(const)

    return score


# ---------------------------------------------------------------------------
# Mini-grid candidate scorer: the delta path's per-candidate pair grids
# ---------------------------------------------------------------------------

def _mini_kernel(ti_ref, tj_ref, mid_r, mid_c, idc_r, idc_c, circ_r, stot_r,
                 la_r, la_c, obs_tile, p_ref, out_ref, *, k_real, cb,
                 with_circ):
    """One (TB x TB) tile of ``cb`` candidates' MINI pair grids (shares
    _tile_body with the dense scorer). Differences from _ll_kernel: the
    observed tile is a traced per-neighbour operand (no static affine
    trans shortcut — mini grids hold exactly the two affected contigs, so
    nearly every tile has same-contig pairs anyway), and the circular
    specialisation is a Python flag (core.delta hoists the circ/linear
    decision above the neighbour batch)."""
    t = pl.program_id(0)
    g = pl.program_id(1)
    i = ti_ref[t]
    j = tj_ref[t]
    for k in range(cb):
        c = g * cb + k

        @pl.when(t == 0)
        def _init(c=c):
            out_ref[0, c] = 0.0

        if with_circ:
            any_circ = jnp.any(circ_r[c, :] > 0.0)

            @pl.when(any_circ)
            def _fc(c=c):
                _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r,
                           la_r, la_c, obs_tile, p_ref, out_ref, c, i, j,
                           k_real, with_circ=True)

            @pl.when(jnp.logical_not(any_circ))
            def _fl(c=c):
                _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r,
                           la_r, la_c, obs_tile, p_ref, out_ref, c, i, j,
                           k_real, with_circ=False)
        else:
            _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r,
                       la_r, la_c, obs_tile, p_ref, out_ref, c, i, j,
                       k_real, with_circ=False)


def make_mini_grid_scorer(r_max: int, log_nfpb: float,
                          with_circ: bool = True, interpret: bool = False):
    """Build the fused mini-pair-grid candidate scorer for the delta path:

        score(mid, idc, circ, stot, la, ob, params) -> (B,)
        score[c] = sum_{u < v} [ ob[u,v] * log_e - e ]            with
        log_e = where(same contig, log_cis, log v_inter) + la_u + la_v
                - log_nfpb,   e = exp(log_e)

    mid/idc/circ/stot/la are (B, R) per-candidate sub-row vectors
    (la = log(accu) with -1e9 on invalid/inactive rows), ob the
    (R, R) strict-upper observed grid of this neighbour's D rows.

    Why a kernel: the jnp formulation of core.delta.grid_terms shares a
    log_cis grid between the observed term and the expected mass, which
    XLA materialises to HBM per candidate (an (R, R) f32 round-trip, 14
    candidates x 5 neighbours per step); the fused tile loop keeps every
    intermediate in VMEM and halves the cell work by enumerating only
    upper-triangle tiles. Exact same per-cell math as _tile_body (the
    dense scorer), so the delta inherits the dense kernel's verified
    f32 semantics. vmap-compatible over the neighbour axis.
    """
    r_pad = _round_up(max(r_max, TB), TB)
    n_rb = r_pad // TB
    tri = [(i, j) for i in range(n_rb) for j in range(i, n_rb)]
    ti_np = np.asarray([i for i, _ in tri], np.int32)
    tj_np = np.asarray([j for _, j in tri], np.int32)
    n_tri = len(tri)

    def params_vec(p: RippeParams):
        log_c1fact = jnp.log(p.c1 * p.fact)
        log_k3fact = jnp.log(jnp.power(p.kuhn, -3.0) * p.fact)
        nmax = p.lm / p.kuhn
        log_norm_circ = (log_k3fact + p.slope * jnp.log(nmax)
                         + (p.d - 2.0) / (nmax * nmax + p.d))
        return jnp.stack([
            log_c1fact, p.slope, p.d, p.d_max, p.lm / p.kuhn,
            jnp.log(p.v_inter), p.v_inter, log_norm_circ, log_k3fact,
            jnp.float32(log_nfpb)]).astype(jnp.float32)

    def row_map(t, c, ti, tj):
        return (0, ti[t])

    def col_map(t, c, ti, tj):
        return (0, tj[t])

    def obs_map(t, c, ti, tj):
        return (ti[t], tj[t])

    def grid_sp(b, cb):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tri, b // cb),
            in_specs=[
                pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((b, TB), col_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, TB), obs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )

    def score(mid, idc, circ, stot, la, ob, params: RippeParams):
        b = mid.shape[0]
        cb = max(d for d in range(1, min(b, 16) + 1) if b % d == 0)
        padw = r_pad - r_max

        def pad2(x, fill=0.0):
            return jnp.pad(x, ((0, 0), (0, padw)), constant_values=fill)

        midp = pad2(mid.astype(jnp.float32))
        idcp = pad2(idc.astype(jnp.int32), 0)
        circp = pad2(circ.astype(jnp.float32))
        stotp = pad2(stot.astype(jnp.float32), 1.0)
        lap = pad2(la.astype(jnp.float32), -1e9)
        obp = jnp.pad(ob.astype(jnp.float32), ((0, padw), (0, padw)))
        out = pl.pallas_call(
            functools.partial(_mini_kernel, k_real=r_max, cb=cb,
                              with_circ=with_circ),
            grid_spec=grid_sp(b, cb),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(ti_np), jnp.asarray(tj_np),
          midp, midp, idcp, idcp, circp, stotp, lap, lap, obp,
          params_vec(params).reshape(1, -1))
        return out[0]

    return score


# ---------------------------------------------------------------------------
# Repeat-carrying geometry: copy-summing kernel on the data grid
# ---------------------------------------------------------------------------

def _log_factorial_vec(ob):
    """log(ob!) with the reference's branch structure, vector-op only
    (no lgamma inside Pallas): exact log-sum for floor(ob) < 10 via
    log(n!) = sum_{k<=n} log k; Stirling above (kernels3.cu:80-93,
    :169-210 with the ob >= 15 expansion)."""
    n = jnp.floor(ob)
    exact = jnp.zeros_like(ob)
    for k in range(2, 10):
        exact = exact + jnp.where(n >= k, np.float32(np.log(k)), 0.0)
    stirling = n * jnp.log(jnp.maximum(n, 1.0)) - n \
        + 0.5 * jnp.log(2.0 * np.pi * jnp.maximum(n, 1.0))
    big = ob * jnp.log(jnp.maximum(ob, 1.0)) - ob \
        + jnp.log(jnp.sqrt(jnp.maximum(ob, 1.0) * 2.0 * np.pi))
    out = jnp.where(ob >= 15.0, big, jnp.where(n >= 10, stirling, exact))
    return jnp.where(ob > 0.0, out, 0.0)


def _log_factorial_np(ob):
    """Host twin of :func:`_log_factorial_vec` (same f32 op order)."""
    ob = np.asarray(ob, np.float32)
    n = np.floor(ob)
    exact = np.zeros_like(ob)
    for k in range(2, 10):
        exact = exact + np.where(n >= k, np.float32(np.log(k)),
                                 np.float32(0.0))
    stirling = n * np.log(np.maximum(n, 1.0)) - n \
        + 0.5 * np.log(2.0 * np.pi * np.maximum(n, 1.0))
    big = ob * np.log(np.maximum(ob, 1.0)) - ob \
        + np.log(np.sqrt(np.maximum(ob, 1.0) * 2.0 * np.pi))
    out = np.where(ob >= 15.0, big, np.where(n >= 10, stirling, exact))
    return np.where(ob > 0.0, out, 0.0).astype(np.float32)


def _repeat_kernel(ti_ref, tj_ref, mid_r, mid_c, idc_r, idc_c, circ_r,
                   stot_r, acc_r, acc_c, act_r, act_c, obs_tile, lf_tile,
                   p_ref, out_ref, *, k_real, mc, cb):
    """One (TB x TB) tile of ``cb`` candidates' DATA grids: expected
    counts are summed over active copy pairs before the Poisson log-pmf
    (dispatcher/collector loop, kernels3.cu:2895-2929). Copy-slot arrays
    carry a leading ``mc`` axis. The pmf (including log ob!) is computed
    in full — no observation-constant folding, since E == 0 cells must
    contribute exactly zero (kernels3.cu:196). ``lf_tile`` carries the
    precomputed log(ob!) (static; was ~15 VPU ops/cell/candidate).
    The circular-contig variant is skipped when no copy row of the tile
    belongs to a circular contig."""
    t = pl.program_id(0)
    g = pl.program_id(1)
    i = ti_ref[t]
    j = tj_ref[t]

    slope = p_ref[0, 1]
    d = p_ref[0, 2]
    d_max = p_ref[0, 3]
    lm_over_kuhn = p_ref[0, 4]
    v_inter = p_ref[0, 6]
    log_norm_circ = p_ref[0, 7]
    log_k3fact = p_ref[0, 8]
    log_c1fact = p_ref[0, 0]
    nfpb = p_ref[0, 9]

    for k in range(cb):
        c = g * cb + k

        @pl.when(t == 0)
        def _init(c=c):
            out_ref[0, c] = 0.0

        any_circ = jnp.zeros((), jnp.bool_)
        for a in range(mc):
            any_circ = any_circ | jnp.any(circ_r[a, c, :] > 0.0)

        def _body(c, with_circ):
            e_total = jnp.zeros((TB, TB), jnp.float32)
            for a in range(mc):
                mr = mid_r[a, c, :]
                idcr = idc_r[a, c, :]
                circr = circ_r[a, c, :][:, None] == 1.0
                stotr = stot_r[a, c, :][:, None]
                accr = acc_r[a, c, :]
                actr = act_r[a, c, :]
                for b2 in range(mc):
                    mcol = mid_c[b2, c, :]
                    s = jnp.abs(mr[:, None] - mcol[None, :])
                    same = idcr[:, None] == idc_c[b2, c, :][None, :]
                    safe_s = jnp.maximum(s, 1e-9)
                    n_lin = safe_s * lm_over_kuhn
                    log_lin = log_c1fact + slope * jnp.log(safe_s) \
                        + (d - 2.0) / (n_lin * n_lin + d)
                    in_range = (s > 0.0) & (s < d_max)
                    if with_circ:
                        n_circ = lm_over_kuhn * safe_s \
                            * jnp.maximum(stotr - s, 1e-9) \
                            / jnp.maximum(stotr, 1e-9)
                        log_val_circ = log_k3fact + slope * jnp.log(n_circ) \
                            + (d - 2.0) / (n_circ * n_circ + d)
                        log_norm_lin = jnp.where(
                            in_range, jnp.maximum(log_lin, p_ref[0, 5]),
                            p_ref[0, 5])
                        log_circ = log_val_circ + log_norm_lin \
                            - log_norm_circ
                        log_cis = jnp.where(circr, log_circ, log_lin)
                    else:
                        log_cis = log_lin
                    cis = jnp.where(in_range, jnp.exp(log_cis), 0.0)
                    cis = jnp.maximum(cis, v_inter)
                    e0 = jnp.where(same, cis, v_inter)
                    na = accr[:, None] * acc_c[b2, c, :][None, :] / nfpb
                    act = (actr[:, None] > 0.0) \
                        & (act_c[b2, c, :][None, :] > 0.0)
                    e_total = e_total + jnp.where(act, e0 * na, 0.0)

            ob = obs_tile[:, :]
            log_e = jnp.log(jnp.where(e_total > 0.0, e_total, 1.0))
            pmf = jnp.where(ob > 0.0, ob * log_e - e_total - lf_tile[:, :],
                            -e_total)
            pmf = jnp.where(e_total > 0.0, pmf, 0.0)

            row_g = i * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
            col_g = j * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
            mask = (col_g > row_g) & (row_g < k_real) & (col_g < k_real)
            out_ref[0, c] += jnp.sum(jnp.where(mask, pmf, 0.0))

        @pl.when(any_circ)
        def _circ(c=c):
            _body(c, True)

        @pl.when(jnp.logical_not(any_circ))
        def _lin(c=c):
            _body(c, False)


def make_repeat_pallas_scorer(table: SubFragTable, obs,
                              interpret: bool = False):
    """Copy-summing scorer for repeat-carrying tables: score(states_batch,
    params) -> (B,) matching core.likelihood.log_likelihood on the data
    grid (kernels3.cu:2895-2929 dispatcher semantics)."""
    s_real = table.n_data_sub
    s_pad = _round_up(s_real, TB)
    obs_np = np.zeros((s_pad, s_pad), np.float32)
    obs_np[:s_real, :s_real] = np.asarray(obs, np.float32)
    obs_dev = jnp.asarray(obs_np)
    # static log(ob!) plane, mirroring _log_factorial_vec's f32 branch
    # structure (was recomputed per candidate per tile in the kernel)
    lf_dev = jnp.asarray(_log_factorial_np(obs_np))

    # host: copy slots per data sub (dispatcher/collector_id flattening)
    data_id = np.asarray(table.data_id)
    order = np.argsort(data_id, kind="stable")
    counts = np.bincount(data_id, minlength=s_real)
    mc = int(counts.max()) if len(counts) else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    copy_slots = np.full((s_real, mc), -1, np.int64)
    pos_in = np.arange(len(order)) - starts[data_id[order]]
    copy_slots[data_id[order], pos_in] = order

    owner = table.owner
    prefix = table.prefix_kb
    suffix = table.suffix_kb
    len_half = table.len_kb * 0.5
    accu = table.accu
    slots_dev = jnp.asarray(np.where(copy_slots < 0, 0, copy_slots),
                            jnp.int32)
    slots_valid = jnp.asarray(copy_slots >= 0)

    n_rb = s_pad // TB
    tri = [(i, j) for i in range(n_rb) for j in range(i, n_rb)]
    ti_np = np.asarray([i for i, _ in tri], np.int32)
    tj_np = np.asarray([j for _, j in tri], np.int32)
    n_tri = len(tri)

    def params_vector(p: RippeParams):
        log_c1fact = jnp.log(p.c1 * p.fact)
        log_k3fact = jnp.log(jnp.power(p.kuhn, -3.0) * p.fact)
        nmax = p.lm / p.kuhn
        log_norm_circ = (log_k3fact + p.slope * jnp.log(nmax)
                         + (p.d - 2.0) / (nmax * nmax + p.d))
        return jnp.stack([
            log_c1fact, p.slope, p.d, p.d_max, p.lm / p.kuhn,
            jnp.log(p.v_inter), p.v_inter, log_norm_circ, log_k3fact,
            jnp.float32(table.n_frags_per_bins)]).astype(jnp.float32)

    def _pad(x, fill=0.0):
        return jnp.pad(x, ((0, 0), (0, s_pad - s_real)),
                       constant_values=fill)

    def copy_vectors(state: GenomeState):
        """(mc, S_pad) per-copy-slot geometry of one genome."""
        rows = slots_dev                             # (S, mc) copy rows
        own = owner[rows]                            # (S, mc)
        start_kb = state.start_bp[own].astype(jnp.float32) / 1000.0
        ori = state.ori[own]
        mid = start_kb + jnp.where(ori == 1, prefix[rows], suffix[rows]) \
            + len_half[rows]
        idc = state.id_c[own]
        act = slots_valid & (state.activ[own] == 1)
        circ = state.circ[own].astype(jnp.float32)
        stot = state.l_cont_bp[own].astype(jnp.float32) / 1000.0
        acc = accu[rows]
        # fake distinct contigs for invalid slots (never same-contig)
        pad_idc = -(jnp.arange(s_real, dtype=jnp.int32)[:, None]
                    + jnp.arange(mc, dtype=jnp.int32)[None, :] * s_real + 2)
        idc = jnp.where(slots_valid, idc, pad_idc)
        to_pad = lambda v, fill=0.0: _pad(v.T.astype(jnp.float32), fill)
        return (to_pad(mid), _pad(idc.T.astype(jnp.int32), -1).astype(jnp.int32),
                to_pad(circ), to_pad(stot, 1.0), to_pad(acc),
                to_pad(act.astype(jnp.float32)))

    def row_map(t, g, ti, tj):
        return (0, 0, ti[t])

    def col_map(t, g, ti, tj):
        return (0, 0, tj[t])

    def obs_map(t, g, ti, tj):
        return (ti[t], tj[t])

    def grid_sp(b, cb):
        vec = lambda m: pl.BlockSpec((mc, b, TB), m,
                                     memory_space=pltpu.VMEM)
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tri, b // cb),
            in_specs=[
                vec(row_map), vec(col_map),      # mid
                vec(row_map), vec(col_map),      # idc
                vec(row_map),                    # circ rows
                vec(row_map),                    # stot rows
                vec(row_map), vec(col_map),      # accu
                vec(row_map), vec(col_map),      # act
                pl.BlockSpec((TB, TB), obs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, TB), obs_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )

    def score(states_batch: GenomeState, params: RippeParams):
        mid, idc, circ, stot, acc, act = jax.vmap(copy_vectors)(states_batch)
        # (B, mc, S_pad) -> (mc, B, S_pad)
        tr = lambda x: jnp.swapaxes(x, 0, 1)
        mid, idc, circ, stot, acc, act = map(
            tr, (mid, idc, circ, stot, acc, act))
        b = mid.shape[1]
        cb = max(d for d in range(1, min(b, 16) + 1) if b % d == 0)
        pvec = params_vector(params)
        out = pl.pallas_call(
            functools.partial(_repeat_kernel, k_real=s_real, mc=mc, cb=cb),
            grid_spec=grid_sp(b, cb),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(ti_np), jnp.asarray(tj_np),
          mid, mid, idc, idc, circ, stot, acc, acc, act, act, obs_dev,
          lf_dev, pvec.reshape(1, -1))
        return out[0]

    return score
