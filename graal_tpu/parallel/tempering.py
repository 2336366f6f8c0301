"""Parallel-tempered multi-chain assembly.

Runs N independent annealing chains — each a full EM cycle at its own
temperature — batched over devices ('chains' mesh axis via shard_map) or
vmapped on a single chip, with a periodic best-genome exchange: the
highest-likelihood genome replaces every chain (the cold-restart flavour of
parallel tempering; the reference is strictly single-chain).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graal_tpu.core import mcmc
from graal_tpu.core.likelihood import log_likelihood
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


def temperature_ladder(n_chains: int, t_min: float = 1.0,
                       t_max: float = 4.0) -> np.ndarray:
    """Geometric ladder; chain 0 is the cold chain."""
    if n_chains == 1:
        return np.asarray([t_min], np.float32)
    return np.asarray(
        t_min * (t_max / t_min) ** (np.arange(n_chains) / (n_chains - 1)),
        np.float32)


def make_tempered_cycle(table: SubFragTable, obs, nb, delta: int,
                        mesh: Mesh | None = None, scorer=None):
    """Build cycle(states, keys, params, frag_orders, l_ts, f_ts) ->
    (states, l_ts, n_contigs) with leading axis n_chains on every arg.

    With a mesh the chains are shard_mapped over the 'chains' axis;
    otherwise vmapped on the local device.
    """
    obs_j = jnp.asarray(obs, jnp.float32)
    em_step = mcmc.make_em_step(table, obs_j, nb, delta, scorer=scorer)

    def one_chain(state: GenomeState, key, params, frag_order, l_t, f_t):
        def body(carry, f_a):
            state, key, l_t = carry
            key, sub = jax.random.split(key)
            state, (score, op, fb) = em_step(state, sub, params, f_a, f_t)
            l_t = jnp.where(jnp.isfinite(score), score, l_t)
            return (state, key, l_t), None

        (state, key, l_t), _ = jax.lax.scan(body, (state, key, l_t), frag_order)
        return state, l_t, state.n_contigs()

    batched = jax.vmap(one_chain, in_axes=(0, 0, None, 0, 0, 0))

    if mesh is None:
        return jax.jit(batched)

    sharded = shard_map(
        batched, mesh=mesh,
        in_specs=(P("chains"), P("chains"), P(), P("chains"), P("chains"),
                  P("chains")),
        out_specs=(P("chains"), P("chains"), P("chains")), check_vma=False)
    return jax.jit(sharded)


def exchange_best(states: GenomeState, l_ts):
    """Broadcast the best chain's genome to all chains (single-host path;
    the mesh path is parallel.sharding.make_chain_exchange)."""
    best = jnp.argmax(l_ts)
    n = l_ts.shape[0]
    best_state = jax.tree.map(lambda x: x[best], states)
    out = jax.tree.map(
        lambda b: jnp.broadcast_to(b, (n,) + b.shape), best_state)
    return GenomeState(*out), jnp.broadcast_to(l_ts[best], (n,))


def run_tempered(table: SubFragTable, obs, nb, state0: GenomeState,
                 params: RippeParams, n_chains: int, n_cycles: int,
                 delta: int = 4, t_max: float = 4.0, exchange_every: int = 2,
                 seed: int = 1, mesh: Mesh | None = None, scorer=None,
                 progress=True):
    """Full tempered run from a single start genome. Returns the cold
    chain's final (state, likelihood) and the per-cycle likelihood trace."""
    import time

    cycle = make_tempered_cycle(table, obs, nb, delta, mesh=mesh, scorer=scorer)
    exchange = jax.jit(exchange_best)

    n = state0.n_frags
    states = GenomeState(*[jnp.stack([x] * n_chains) for x in state0])
    if scorer is not None:
        l0 = jax.jit(scorer)(
            GenomeState(*[x[None] for x in state0]), params)[0]
    else:
        l0 = log_likelihood(state0, table, jnp.asarray(obs, jnp.float32),
                            params)
    l_ts = jnp.broadcast_to(l0, (n_chains,))
    ladder = jnp.asarray(temperature_ladder(n_chains, t_max=t_max))
    key = jax.random.key(seed)

    trace = []
    t0 = time.time()
    for j in range(n_cycles):
        key, k_perm, k_cycle = jax.random.split(key, 3)
        orders = jax.vmap(lambda k: jax.random.permutation(k, n))(
            jax.random.split(k_perm, n_chains))
        keys = jax.random.split(k_cycle, n_chains)
        states, l_ts, ncs = cycle(states, keys, params, orders, l_ts, ladder)
        if exchange_every and (j + 1) % exchange_every == 0:
            states, l_ts = exchange(states, l_ts)
        trace.append(np.asarray(l_ts).copy())
        if progress:
            print(f"tempered cycle {j}: best={float(jnp.max(l_ts)):.1f} "
                  f"cold={float(l_ts[0]):.1f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    cold = jax.tree.map(lambda x: x[0], states)
    return GenomeState(*cold), float(l_ts[0]), np.asarray(trace)
