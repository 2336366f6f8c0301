"""Parallel-tempered multi-chain assembly.

Runs N chains — each a full EM cycle at its own temperature — batched over
devices ('chains' mesh axis via shard_map) or vmapped on a single chip.
Chains exchange via **canonical parallel tempering**: adjacent-temperature
pairs swap states with the Metropolis probability

    min(1, exp((1/T_i - 1/T_j) * (L_j - L_i)))

alternating even/odd pairings each round, so hot chains keep exploring
while improvements percolate down the ladder (the round-1 broadcast-best
scheme destroyed the hot chains' exploration state). A final best-genome
consolidation remains available as an explicit post-processing step.
The reference is strictly single-chain; its author marked the fan-out
point at cuda_lib_gl.py:1886.
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
    """Broadcast the best chain's genome to all chains — the final
    consolidation step only (never the mid-run exchange: that is
    :func:`pt_swap`, which preserves the tempered ensemble)."""
    best = jnp.argmax(l_ts)
    n = l_ts.shape[0]
    best_state = jax.tree.map(lambda x: x[best], states)
    out = jax.tree.map(
        lambda b: jnp.broadcast_to(b, (n,) + b.shape), best_state)
    return GenomeState(*out), jnp.broadcast_to(l_ts[best], (n,))


def pt_swap(states: GenomeState, l_ts, ladder, key, parity):
    """One round of adjacent-pair replica-exchange swaps.

    Pairs (i, i+1) with i % 2 == parity propose to exchange states;
    acceptance is the canonical exp((beta_i - beta_{i+1}) (L_{i+1} - L_i)).
    Temperatures stay attached to chain slots; states (and their cached
    likelihoods) migrate. Works identically on vmapped or chains-sharded
    state batches (the permutation gather lowers to a collective when
    sharded).

    ``states`` may be ANY pytree of chain-leading arrays — e.g.
    ``(genome_states, per_chain_params)`` when each chain carries its own
    nuisance parameters (the joint chain state migrates as a unit, which
    is canonical PT on the joint target exp(L(genome; params)/T_i)).

    Returns (states, l_ts, accept_mask (n_chains-1,)).
    """
    n = l_ts.shape[0]
    idx = jnp.arange(n)
    beta = 1.0 / ladder
    log_ratio = (beta[:-1] - beta[1:]) * (l_ts[1:] - l_ts[:-1])
    u = jax.random.uniform(key, (n - 1,))
    accept = (jnp.log(u) < log_ratio) & (idx[:-1] % 2 == parity)
    acc_lo = jnp.zeros(n, bool).at[:-1].set(accept)   # swap (k, k+1)
    acc_hi = jnp.zeros(n, bool).at[1:].set(accept)
    src = jnp.where(acc_lo, idx + 1, jnp.where(acc_hi, idx - 1, idx))
    out = jax.tree.map(lambda x: x[src], states)
    return out, l_ts[src], accept


def run_tempered(table: SubFragTable, obs, nb, state0: GenomeState,
                 params: RippeParams, n_chains: int, n_cycles: int,
                 delta: int = 4, t_max: float = 4.0, exchange_every: int = 1,
                 seed: int = 1, mesh: Mesh | None = None, scorer=None,
                 consolidate: bool = True, progress=True):
    """Full tempered run from a single start genome: per-cycle
    replica-exchange swaps, optional final best-genome consolidation.
    Returns (cold state, cold likelihood, metrics dict) with per-cycle
    likelihoods of every chain, swap acceptance counts and contig counts."""
    import time

    cycle = make_tempered_cycle(table, obs, nb, delta, mesh=mesh, scorer=scorer)
    swap = jax.jit(pt_swap, static_argnames=("parity",))

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

    trace, swap_counts, contig_trace = [], [], []
    t0 = time.time()
    for j in range(n_cycles):
        key, k_perm, k_cycle, k_swap = jax.random.split(key, 4)
        orders = jax.vmap(lambda k: jax.random.permutation(k, n))(
            jax.random.split(k_perm, n_chains))
        keys = jax.random.split(k_cycle, n_chains)
        states, l_ts, ncs = cycle(states, keys, params, orders, l_ts, ladder)
        n_swaps = 0
        if exchange_every and (j + 1) % exchange_every == 0 and n_chains > 1:
            states, l_ts, acc = swap(states, l_ts, ladder, k_swap,
                                     parity=j % 2)
            n_swaps = int(np.sum(np.asarray(acc)))
        trace.append(np.asarray(l_ts).copy())
        swap_counts.append(n_swaps)
        contig_trace.append(np.asarray(ncs).copy())
        if progress:
            print(f"tempered cycle {j}: best={float(jnp.max(l_ts)):.1f} "
                  f"cold={float(l_ts[0]):.1f} swaps={n_swaps} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    if consolidate and n_chains > 1:
        states, l_ts = jax.jit(exchange_best)(states, l_ts)
    cold = jax.tree.map(lambda x: x[0], states)
    metrics = {"trace": np.asarray(trace), "swaps": swap_counts,
               "n_contigs": np.asarray(contig_trace)}
    return GenomeState(*cold), float(l_ts[0]), metrics
