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
               la_r, la_c, obs_tile, p_ref, out_ref, *, k_real):
    """One (TB x TB) tile of one candidate's pair grid.

    The grid enumerates only the upper-triangle tiles (t, c); the
    scalar-prefetched ti/tj arrays map t -> (row block, col block), so no
    grid step is spent on fully-masked lower tiles. Grid order (t, c):
    the obs tile stays resident across the whole candidate batch.

    p_ref (SMEM): [log_c1fact, slope, d, d_max, lm/kuhn, log_v_inter,
                   v_inter, log_norm_circ_const, log_k3fact, log_nfpb]
    """
    t = pl.program_id(0)
    c = pl.program_id(1)
    i = ti_ref[t]
    j = tj_ref[t]

    @pl.when(t == 0)
    def _():
        out_ref[c] = 0.0

    # Tiles with no same-contig pair are pure trans: the expectation is
    # v_inter * accu_u * accu_v / nfpb — no Rippe evaluation at all.
    # Early in assembly (small contigs) most off-diagonal tiles qualify.
    any_same = jnp.any(idc_r[c, :][:, None] == idc_c[c, :][None, :])

    @pl.when(any_same)
    def _full():
        _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r, la_r,
                   la_c, obs_tile, p_ref, out_ref, c, i, j, k_real)

    @pl.when(jnp.logical_not(any_same))
    def _trans():
        _trans_tile_body(la_r, la_c, obs_tile, p_ref, out_ref, c, i, j,
                         k_real)


def _trans_tile_body(la_r, la_c, obs_tile, p_ref, out_ref, c, i, j, k_real):
    """Pure-trans tile: contrib = ob * (log_v + la) - v_inter * exp(la)."""
    log_v = p_ref[5]
    v_inter = p_ref[6]
    log_nfpb = p_ref[9]
    la = la_r[c, :][:, None] + la_c[c, :][None, :] - log_nfpb
    contrib = obs_tile[:, :] * (log_v + la) - v_inter * jnp.exp(la)
    row_g = i * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
    col_g = j * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
    mask = (col_g > row_g) & (row_g < k_real) & (col_g < k_real)
    out_ref[c] += jnp.sum(jnp.where(mask, contrib, 0.0))


def _tile_body(mid_r, mid_c, idc_r, idc_c, circ_r, stot_r, la_r, la_c,
               obs_tile, p_ref, out_ref, c, i, j, k_real):
    log_c1fact = p_ref[0]
    slope = p_ref[1]
    d = p_ref[2]
    d_max = p_ref[3]
    lm_over_kuhn = p_ref[4]
    log_v = p_ref[5]
    v_inter = p_ref[6]
    log_norm_circ = p_ref[7]
    log_k3fact = p_ref[8]
    log_nfpb = p_ref[9]

    mr = mid_r[c, :]                      # (TB,)
    mc = mid_c[c, :]
    s = jnp.abs(mr[:, None] - mc[None, :])          # (TB, TB)
    same = idc_r[c, :][:, None] == idc_c[c, :][None, :]

    safe_s = jnp.maximum(s, 1e-9)
    log_s = jnp.log(safe_s)
    n_lin = safe_s * lm_over_kuhn
    log_lin = log_c1fact + slope * log_s + (d - 2.0) / (n_lin * n_lin + d)

    # circular-contig variant (log space), selected per row
    circ_row = circ_r[c, :][:, None] == 1
    stot = stot_r[c, :][:, None]
    n_circ = lm_over_kuhn * safe_s * jnp.maximum(stot - s, 1e-9) / jnp.maximum(stot, 1e-9)
    log_val_circ = log_k3fact + slope * jnp.log(n_circ) + (d - 2.0) / (n_circ * n_circ + d)
    # norm_lin of the reference is the *clamped* linear value
    log_norm_lin = jnp.maximum(log_lin, log_v)
    in_range = (s > 0.0) & (s < d_max)
    log_norm_lin = jnp.where(in_range, log_norm_lin, log_v)
    log_circ = log_val_circ + log_norm_lin - log_norm_circ

    log_cis = jnp.where(circ_row, log_circ, log_lin)
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
    out_ref[c] += jnp.sum(jnp.where(mask, contrib, 0.0))


def make_pallas_scorer(table: SubFragTable, obs, interpret: bool = False):
    """Build ``score(states_batch, params) -> (B,) log-likelihoods``.

    ``states_batch`` is a GenomeState pytree with a leading batch axis.
    The returned values match core.likelihood.log_likelihood (including the
    observation constant). ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU testing).
    """
    assert not table.has_repeats, "pallas scorer requires repeat-free tables"
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

    kernel = functools.partial(_ll_kernel, k_real=k_real)
    # upper-triangle tile enumeration (row-major), scalar-prefetched
    tri = [(i, j) for i in range(n_rb) for j in range(i, n_rb)]
    ti_np = np.asarray([i for i, _ in tri], np.int32)
    tj_np = np.asarray([j for _, j in tri], np.int32)
    n_tri = len(tri)

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

    grid_sp = lambda b: pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tri, b),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )

    def score(states_batch: GenomeState, params: RippeParams):
        vecs = jax.vmap(sub_vectors)(states_batch)
        mid, idc, circ, stot, la = vecs
        b = mid.shape[0]
        pvec = params_vector(params)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_sp(b),
            out_shape=jax.ShapeDtypeStruct((b,), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(ti_np), jnp.asarray(tj_np),
          mid, mid, idc.astype(jnp.int32), idc.astype(jnp.int32), circ, stot,
          la, la, obs_dev, pvec)
        return out + jnp.float32(const)

    return score
