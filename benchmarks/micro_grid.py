"""Microbenchmark: intrinsic cost of the delta scorer's pair-grid shapes.

Times successively richer versions of the (n_cand*nb, R, R) scoring grid on
the live device to find where the ms go:

  1. raw      — elementwise log/exp chain + reduction on the full batch
  2. gathered — same, but inputs gathered per-candidate like geometry()
  3. windows  — the (R, cap) obs-window term
  4. sort     — batched lexsort of (B, R) keys (banded path ingredient)

Usage: python benchmarks/micro_grid.py [R] [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench(fn, *args, iters=20):
    """Scan fn inside ONE jit so the tunnel's per-dispatch latency
    (30-50 ms on the relay) amortises out."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(salt, args):
        def body(carry, i):
            # fold the loop index in so XLA cannot hoist the body
            # (x + i, not x + i*0 — the latter simplifies away and lets
            # XLA hoist the whole body out of the scan)
            out = fn(*jax.tree.map(lambda x: x + i.astype(x.dtype), args))
            return carry + out, None
        tot, _ = jax.lax.scan(body, salt,
                              jnp.arange(iters, dtype=jnp.int32))
        return tot

    # fresh salt per call: the tunnelled transport can serve a repeated
    # identical execution from a cache; min-of-3 rides out relay variance
    out = jax.block_until_ready(run(jnp.float32(0.125), args))
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        out = jax.block_until_ready(run(jnp.float32(0.25 + rep), args))
        best = min(best, (time.time() - t0) / iters)
    return best, out


def main(r=512, batch=65, cap=83):
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    mid = jax.random.uniform(key, (batch, r)) * 1e4
    idc = jax.random.randint(jax.random.key(1), (batch, r), 0, 9)
    accu = jax.random.uniform(jax.random.key(2), (r,)) + 1.0
    slot = jax.random.randint(jax.random.key(3), (batch, r), 0, r)

    @jax.jit
    def raw(mid, idc, accu):
        def one(m, ic):
            s = jnp.abs(m[:, None] - m[None, :])
            same = ic[:, None] == ic[None, :]
            na = accu[:, None] * accu[None, :]
            lg = jnp.log(jnp.maximum(s, 1e-9)) * -1.5 + 0.3
            e = jnp.where(same, jnp.exp(lg), 0.01) * na
            mask = (s > 0) & (s < 1e3)
            return jnp.sum(jnp.where(mask, e, 0.0))
        return jnp.sum(jax.vmap(one)(mid, idc))

    @jax.jit
    def gathered(mid, idc, accu, slot):
        def one(m, ic, sl):
            mg = m[sl]
            ig = ic[sl]
            s = jnp.abs(mg[:, None] - mg[None, :])
            same = ig[:, None] == ig[None, :]
            na = accu[:, None] * accu[None, :]
            lg = jnp.log(jnp.maximum(s, 1e-9)) * -1.5 + 0.3
            e = jnp.where(same, jnp.exp(lg), 0.01) * na
            mask = (s > 0) & (s < 1e3)
            return jnp.sum(jnp.where(mask, e, 0.0))
        return jnp.sum(jax.vmap(one)(mid, idc, slot))

    vcols = jax.random.randint(jax.random.key(4), (r, cap), 0, r)
    vvals = jax.random.uniform(jax.random.key(5), (r, cap))

    @jax.jit
    def windows(mid, idc):
        def one(m, ic):
            mu = m[:, None] * jnp.ones((1, cap))
            mv = m[vcols]
            s = jnp.abs(mu - mv)
            same = ic[:, None] == ic[vcols]
            lg = jnp.log(jnp.maximum(s, 1e-9)) * -1.5 + 0.3
            le = jnp.where(same, lg, -4.6)
            return jnp.sum(vvals * le)
        return jnp.sum(jax.vmap(one)(mid, idc))

    @jax.jit
    def batsort(mid, idc):
        def one(m, ic):
            order = jnp.lexsort((m, ic))
            return jnp.sum(order * 1.0)
        return jnp.sum(jax.vmap(one)(mid, idc))

    res = {"R": r, "batch": batch, "cap": cap,
           "platform": jax.default_backend()}
    for name, fn, args in [
            ("raw_grid", raw, (mid, idc, accu)),
            ("gathered_grid", gathered, (mid, idc, accu, slot)),
            ("obs_windows", windows, (mid, idc)),
            ("batched_lexsort", batsort, (mid, idc))]:
        dt, _ = bench(fn, *args)
        res[name + "_ms"] = round(dt * 1000, 3)
        print(f"{name}: {dt * 1000:.3f} ms", flush=True)
    cells = batch * r * r
    res["raw_cells_per_s"] = round(cells / (res["raw_grid_ms"] / 1000), 0)
    print(json.dumps(res))


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 65
    main(r, b)
