"""Pallas TPU kernel: windowed observed-count mini-matrix accumulation.

The chr1-scale delta scorer reads each mini-row's CSR window once per
neighbour and densifies it into an (R, R) observed-count grid over the D
sub rows (core/delta.py obs_grid; the reference gathers the same windows
per pair inside sub_compute_likelihood, kernels3.cu:3381-3397). The jnp
formulation is a one-hot contraction

    ob[r, j] = sum_w vals[r, w] * (cols[r, w] == keys[j])

which XLA materialises as an (R, cap, R) float one-hot in HBM before a
thin batched matvec — at R 1024 / cap 180 that is ~750 MB of HBM traffic
and was measured as the single largest stage of the 100k-fragment delta
step (~5.1 of 10.1 ms, benchmarks/bisect_delta.py). The arithmetic is
trivial (R*cap*R compare+accumulate); only the materialisation is
expensive — exactly the shape of problem a fused VMEM kernel removes.

Kernel layout: the output is computed TRANSPOSED, T[j, r], so the
per-window-slot broadcast needs no in-kernel transposes: keys ride the
sublane axis as a (TJ, 1) block, each window slot's column ids / values
are a (1, TR) sublane row of the (cap, R) transposed inputs, and the
compare-select-add broadcasts to (TJ, TR) directly. The grid is
(j-tiles, r-tiles, cap chunks) with the cap axis innermost: Mosaic keeps
the revisited (TJ, TR) output block resident in VMEM across the chunk
steps, so the accumulator never round-trips HBM. The wrapper transposes
T back (one (R, R) XLA transpose, microseconds).

Zero-semantics match the einsum path exactly: invalid window slots carry
``vals == 0`` (masked by the caller), padding key slots are -1 and padding
column ids -2, so no spurious pair can contribute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TJ = 256   # key-tile edge (output sublanes)
TR = 256   # row-tile edge (output lanes)
W_CH = 32  # window slots consumed per grid step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _obsgrid_kernel(colsT_ref, valsT_ref, keys_ref, out_ref, *, w_ch):
    wc = pl.program_id(2)

    @pl.when(wc == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    keys = keys_ref[...]                      # (TJ, 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(w_ch):                     # static unroll over the chunk
        cw = colsT_ref[k, :][None, :]         # (1, TR)
        vw = valsT_ref[k, :][None, :]
        acc = acc + jnp.where(keys == cw, vw, 0.0)
    out_ref[...] += acc


def make_window_obs_grid(r_max: int, cap: int, interpret: bool = False):
    """Build ``fn(cols (R, cap) int32, vals (R, cap) f32, keys (R,) int32)
    -> (R, R) f32`` with ``out[r, j] = sum_w vals[r, w]*(cols[r, w]==keys[j])``.

    ``vals`` must already be masked (0 on invalid window slots); ``keys``
    must be -1 on invalid sub slots. Any ``r_max``/``cap`` are accepted
    (padded internally). vmap-compatible (the delta scorer batches it over
    the neighbour axis).
    """
    r_pad = _round_up(max(r_max, TR), TR)
    cap_pad = _round_up(max(cap, W_CH), W_CH)
    n_wc = cap_pad // W_CH
    grid = (r_pad // TJ, r_pad // TR, n_wc)

    call = pl.pallas_call(
        functools.partial(_obsgrid_kernel, w_ch=W_CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((W_CH, TR), lambda ji, ri, wc: (wc, ri),
                         memory_space=pltpu.VMEM),   # colsT chunk
            pl.BlockSpec((W_CH, TR), lambda ji, ri, wc: (wc, ri),
                         memory_space=pltpu.VMEM),   # valsT chunk
            pl.BlockSpec((TJ, 1), lambda ji, ri, wc: (ji, 0),
                         memory_space=pltpu.VMEM),   # keys column
        ],
        out_specs=pl.BlockSpec((TJ, TR), lambda ji, ri, wc: (ji, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, r_pad), jnp.float32),
        interpret=interpret,
    )

    def fn(cols, vals, keys):
        colsT = jnp.full((cap_pad, r_pad), -2, jnp.int32)
        colsT = colsT.at[:cap, :r_max].set(cols.astype(jnp.int32).T)
        valsT = jnp.zeros((cap_pad, r_pad), jnp.float32)
        valsT = valsT.at[:cap, :r_max].set(vals.astype(jnp.float32).T)
        keys2d = jnp.full((r_pad, 1), -1, jnp.int32)
        keys2d = keys2d.at[:r_max, 0].set(keys.astype(jnp.int32))
        t = call(colsT, valsT, keys2d)
        return t.T[:r_max, :r_max]

    return fn


def window_obs_grid_reference(cols, vals, keys):
    """jnp oracle (the einsum formulation of core/delta.py, kept here for
    the kernel's own unit tests)."""
    oh = cols[:, :, None] == jnp.where(keys >= 0, keys, -1)[None, None, :]
    return jnp.einsum("rw,rwj->rj", vals, oh.astype(jnp.float32),
                      precision=(jax.lax.Precision.HIGHEST,
                                 jax.lax.Precision.DEFAULT))
