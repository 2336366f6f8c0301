"""Microbenchmark: OB-grid construction strategies for the delta scorer.

The delta step's remaining hot spot is building the (R, R) observed-count
grid from CSR windows once per neighbour (bisect_delta: ~4.7 of the
5.9 ms scorer). Three candidate constructions, timed on the live device:

  1. scatter  — .at[row, col].add (what core.delta ships): TPU scatters
                serialise per element
  2. onehot   — batched matmul against a fused one-hot of the column
                slots: rides the MXU, no serial dependence
  3. gatherC  — skip the grid entirely; per candidate, gather log_e at
                the window slots (13 gathers of R*cap from an (R, R)
                grid) — the per-candidate-gather alternative

Usage: python benchmarks/micro_obgrid.py [R] [cap] [n_neighbours]
"""

from __future__ import annotations

import json
import sys
import time

N_CAND = 13


def bench(fn, *args, iters=32):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(salt, args):
        def body(carry, i):
            out = fn(*jax.tree.map(lambda x: x + i.astype(x.dtype), args))
            return carry + out, None
        tot, _ = jax.lax.scan(body, salt,
                              jnp.arange(iters, dtype=jnp.int32))
        return tot

    out = jax.block_until_ready(run(jnp.float32(0.125), args))
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        out = jax.block_until_ready(run(jnp.float32(0.25 + rep), args))
        best = min(best, (time.time() - t0) / iters)
    return best, out


def main(r=512, cap=83, nb=5):
    import jax
    import jax.numpy as jnp

    v_slot = jax.random.randint(jax.random.key(0), (nb, r, cap), 0, r)
    vals = jax.random.uniform(jax.random.key(1), (nb, r, cap))
    found = jax.random.bernoulli(jax.random.key(2), 0.5, (nb, r, cap))
    # a stand-in per-candidate log_e grid (free to produce; the contraction
    # with OB is what we charge to each strategy)
    log_e = jax.random.uniform(jax.random.key(3), (N_CAND, r, r))

    @jax.jit
    def scatter(vals, v_slot):
        def one(va, vs):
            vs = jnp.clip(vs, 0, r - 1)   # salt-folding shifts the slots
            row = jnp.broadcast_to(
                jnp.arange(r, dtype=jnp.int32)[:, None], vs.shape)
            ob = jnp.zeros((r, r), jnp.float32).at[row, vs].add(
                jnp.where(found[0], va, 0.0))
            return jnp.sum(ob[None] * log_e)
        return jnp.sum(jax.vmap(one)(vals, v_slot))

    @jax.jit
    def onehot(vals, v_slot):
        def one(va, vs):
            vs = jnp.clip(vs, 0, r - 1)
            oh = (vs[:, :, None]
                  == jnp.arange(r, dtype=jnp.int32)[None, None, :])
            ob = jnp.einsum("rw,rwj->rj",
                            jnp.where(found[0], va, 0.0),
                            oh.astype(jnp.float32))
            return jnp.sum(ob[None] * log_e)
        return jnp.sum(jax.vmap(one)(vals, v_slot))

    @jax.jit
    def gatherC(vals, v_slot):
        def one(va, vs):
            vs = jnp.clip(vs, 0, r - 1)
            row = jnp.broadcast_to(
                jnp.arange(r, dtype=jnp.int32)[:, None], vs.shape)

            def per_cand(le):
                g = le[row, vs]                        # (r, cap) gather
                return jnp.sum(jnp.where(found[0], va * g, 0.0))
            return jnp.sum(jax.vmap(per_cand)(log_e))
        return jnp.sum(jax.vmap(one)(vals, v_slot))

    res = {"R": r, "cap": cap, "n_neighbours": nb,
           "platform": jax.default_backend()}
    for name, fn in [("scatter", scatter), ("onehot", onehot),
                     ("gatherC", gatherC)]:
        dt, _ = bench(fn, vals, v_slot)
        res[name + "_ms"] = round(dt * 1000, 3)
        print(f"{name}: {dt * 1000:.3f} ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 83
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    main(r, c, n)
