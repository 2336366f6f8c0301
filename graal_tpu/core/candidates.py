"""Build the 13 candidate genomes of one (fragment, neighbour) proposal.

Candidate catalogue (EM path), mirroring the reference's mutation wiring
(pop_out_pop_in, cuda_lib_gl.py:841-914; transloc :916-954;
modification_str :403-411):

====  =======================================  =============================
mode  operation                                built from
====  =======================================  =============================
0     eject fragment                           pop_out
1     flip fragment                            flip
2/3   pop out, split-insert left of B (+/-)    pop_out then pop_in_1
4/5   pop out, split-insert right of B (+/-)   pop_out then pop_in_2
6/7   pop out, insert right of B (+/-)         pop_out then pop_in_3
8     swap activity (repeats only)             pop_out then swap_activity
9-12  translocation (4 cut-direction combos)   split(A) o split(B) o paste
====  =======================================  =============================

All candidates are produced as one stacked GenomeState batch (leading axis
13) by pure functions, so scoring is a single vmapped likelihood call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graal_tpu.core import ops
from graal_tpu.core.state import GenomeState

N_CANDIDATES = 13

MODIFICATION_STR = [
    "eject frag",
    "flip frag",
    "pop out split insert @ left or 1", "pop out split insert @ left or -1",
    "pop out split insert @ right or 1", "pop out split insert @ right or -1",
    "pop out insert @ right or 1", "pop out insert @ right or -1",
    "swap activity",
    "transloc_1", "transloc_2", "transloc_3", "transloc_4",
]


def _stack(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def build_candidates(state: GenomeState, f_a, f_b, max_id=None) -> GenomeState:
    """Return a stacked batch (leading axis 13) of candidate genomes for
    moving fragment ``f_a`` relative to neighbour ``f_b``.

    ``max_id``: the maximum contig id in use. Defaults to the state's own
    maximum; pass the *global* maximum when ``state`` is a gathered
    mini-state (delta scoring) so freshly assigned contig ids can never
    collide with contigs outside the view.
    """
    if max_id is None:
        max_id = jnp.max(state.id_c)
    popped = ops.pop_out(state, f_a, max_id)
    m2 = jnp.maximum(jnp.max(popped.id_c), max_id)

    cands = [
        popped,                                           # 0: eject
        ops.flip(state, f_a),                             # 1: flip
        ops.pop_in_1(popped, f_a, f_b, 1, m2),            # 2
        ops.pop_in_1(popped, f_a, f_b, -1, m2),           # 3
        ops.pop_in_2(popped, f_a, f_b, 1, m2),            # 4
        ops.pop_in_2(popped, f_a, f_b, -1, m2),           # 5
        ops.pop_in_3(popped, f_a, f_b, 1, m2),            # 6
        ops.pop_in_3(popped, f_a, f_b, -1, m2),           # 7
        ops.swap_activity(popped, f_a, m2),               # 8
    ]
    # Translocations: split at A (down/up-stream), split at B, paste A-B
    # (cuda_lib_gl.py:926-954; loop order upstreamfA outer, upstreamfB inner
    # with upstream=0 meaning "cut after").
    for up_a in (0, 1):
        t1 = ops.split(state, f_a, up_a, max_id)
        m1 = jnp.maximum(jnp.max(t1.id_c), max_id)
        for up_b in (0, 1):
            t2 = ops.split(t1, f_b, up_b, m1)
            mt = jnp.maximum(jnp.max(t2.id_c), m1)
            cands.append(ops.paste(t2, f_a, f_b, mt))
    return _stack(cands)


def mh_candidates(state: GenomeState, f_a, f_b, max_id=None) -> GenomeState:
    """13-candidate batch for the Metropolis-Hastings / MTM samplers.

    Mode map (all_modifications_metropolis, cuda_lib_gl.py:2651-2657 and
    pop_out_pop_in_4_mh :735-789): 0 eject, 1 flip, 2/3 insert right of B
    (pop_in_3 +/-), 4/5 insert left of B (pop_in_4 +/-), 6/7 split at A
    (up/downstream), 8 paste A-B (guarded on extremities), 9-12 transloc.

    ``max_id``: pass the GLOBAL maximum contig id when ``state`` is a
    gathered mini-state (delta scoring), as in :func:`build_candidates`.
    """
    if max_id is None:
        max_id = jnp.max(state.id_c)
    popped = ops.pop_out(state, f_a, max_id)
    m2 = jnp.maximum(jnp.max(popped.id_c), max_id)

    cands = [
        popped,
        ops.flip(state, f_a),
        ops.pop_in_3(popped, f_a, f_b, 1, m2),
        ops.pop_in_3(popped, f_a, f_b, -1, m2),
        ops.pop_in_4(popped, f_a, f_b, 1, m2),
        ops.pop_in_4(popped, f_a, f_b, -1, m2),
        ops.split(state, f_a, 0, max_id),
        ops.split(state, f_a, 1, max_id),
    ]
    # paste, valid only when both fragments are linear-contig extremities
    # (cuda_lib_gl.py:828-837: prev==-1 or next==-1 host guard).
    def is_extremity(f):
        return ((state.pos[f] == 0) | (state.pos[f] == state.l_cont[f] - 1)) \
            & (state.circ[f] == 0)
    ok = is_extremity(f_a) & is_extremity(f_b)
    pasted = ops.paste(state, f_a, f_b, max_id)
    cands.append(ops._select(ok, pasted, state))

    for up_a in (0, 1):
        t1 = ops.split(state, f_a, up_a, max_id)
        m1 = jnp.max(t1.id_c)
        for up_b in (0, 1):
            # MH guard: fB must be the matching extremity *before* the split
            # (transloc_4_mh, cuda_lib_gl.py:979-1009: next==-1 / prev==-1,
            # which is never true on a circular contig).
            lin_b = state.circ[f_b] == 0
            valid = lin_b & jnp.where(up_b == 0,
                                      state.pos[f_b] == state.l_cont[f_b] - 1,
                                      state.pos[f_b] == 0)
            t2 = ops.split(t1, f_b, up_b, m1)
            mt = jnp.max(t2.id_c)
            cand = ops.paste(t2, f_a, f_b, mt)
            cands.append(ops._select(valid, cand, state))
    return _stack(cands)
