"""Genome state: a pytree of int32 arrays, one entry per (copy-)fragment.

The reference keeps the genome as a struct-of-14-int-arrays on the GPU with
contigs encoded as doubly-linked lists (frag struct, kernels3.cu:9-24;
T_frag dtype pyramid_sparse.py:1180-1183). The TPU-native design drops the
``prev``/``next`` pointers and the redundant ``id`` field: the contig
partition and intra-contig order are fully determined by ``(id_c, pos)``,
and neighbour ids are derived on demand (host: argsort; device: masked
argmax) instead of being maintained through every mutation.

Stored fields (all int32, shape (n_frags,)):

- ``pos``        position of the fragment inside its contig (0-based)
- ``id_c``       contig label (equality-compared only; values unbounded)
- ``start_bp``   cumulated bp offset of the fragment inside its contig
- ``len_bp``     fragment length in bp (immutable)
- ``circ``       1 if the fragment's contig is circular
- ``l_cont``     number of fragments in the contig
- ``l_cont_bp``  total bp length of the contig
- ``ori``        orientation (+1 / -1)
- ``rep``        1 if the fragment is a repeat copy (immutable)
- ``activ``      1 if the fragment is active (repeats can be switched off)
- ``id_d``       index of the underlying data bin (immutable; repeat copies
                 of a bin share id_d, simulation_loader.py:182-256)

``start_bp``, ``l_cont`` and ``l_cont_bp`` are derivable from
``(id_c, pos, len_bp)``; they are carried in the state and updated in closed
form by every mutation (mirroring the reference kernels), with
:func:`renormalize` recomputing them from scratch as a consistency oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

MUTABLE_FIELDS = ("pos", "id_c", "start_bp", "circ", "l_cont", "l_cont_bp",
                  "ori", "activ")
STATIC_FIELDS = ("len_bp", "rep", "id_d")


class GenomeState(NamedTuple):
    pos: jnp.ndarray
    id_c: jnp.ndarray
    start_bp: jnp.ndarray
    len_bp: jnp.ndarray
    circ: jnp.ndarray
    l_cont: jnp.ndarray
    l_cont_bp: jnp.ndarray
    ori: jnp.ndarray
    rep: jnp.ndarray
    activ: jnp.ndarray
    id_d: jnp.ndarray

    @property
    def n_frags(self) -> int:
        return self.pos.shape[0]

    def max_id_contig(self) -> jnp.ndarray:
        return jnp.max(self.id_c)

    def n_contigs(self) -> jnp.ndarray:
        """Number of contigs == number of fragments at position 0."""
        return jnp.sum(self.pos == 0)

    @staticmethod
    def from_soa(soa: dict) -> "GenomeState":
        """Build from the reference-format struct-of-arrays dict
        (pyramid_sparse.py:1185-1348, simulation_loader.py:182-299)."""
        n = len(soa["pos"])
        as_i32 = lambda k, default=None: jnp.asarray(
            soa.get(k, default), jnp.int32)
        return GenomeState(
            pos=as_i32("pos"),
            id_c=as_i32("id_c"),
            start_bp=as_i32("start_bp"),
            len_bp=as_i32("len_bp"),
            circ=as_i32("circ"),
            l_cont=as_i32("l_cont"),
            l_cont_bp=as_i32("l_cont_bp"),
            ori=as_i32("ori", np.ones(n, np.int32)),
            rep=as_i32("rep", np.zeros(n, np.int32)),
            activ=as_i32("activ", np.ones(n, np.int32)),
            id_d=as_i32("id_d", np.arange(n, dtype=np.int32)),
        )

    def to_numpy(self) -> dict:
        return {f: np.asarray(getattr(self, f)) for f in self._fields}


def renormalize(state: GenomeState) -> GenomeState:
    """Recompute start_bp / l_cont / l_cont_bp from (id_c, pos, len_bp).

    start_bp[i] = sum of len_bp over same-contig fragments with smaller pos;
    expressed as an n x n boolean-mask contraction (MXU-friendly).
    Used as the consistency oracle for the closed-form per-op updates.
    """
    same = state.id_c[:, None] == state.id_c[None, :]
    before = state.pos[None, :] < state.pos[:, None]
    len_f = state.len_bp.astype(jnp.float32)
    start_bp = ((same & before).astype(jnp.float32) @ len_f).astype(jnp.int32)
    l_cont = jnp.sum(same, axis=1).astype(jnp.int32)
    l_cont_bp = (same.astype(jnp.float32) @ len_f).astype(jnp.int32)
    return state._replace(start_bp=start_bp, l_cont=l_cont, l_cont_bp=l_cont_bp)


def derive_prev_next(state: GenomeState):
    """Host-side: (prev, next) neighbour ids per fragment, -1 at contig ends.

    Matches the reference's linked-list encoding (kernels3.cu:9-24) with the
    circular-contig convention that the list wraps (prev of pos 0 is the
    last fragment, cuda_lib_gl.py:1016-1042). Fully vectorised (one lexsort
    + shifted compares) so 500k-fragment states derive in milliseconds.
    """
    id_c = np.asarray(state.id_c)
    pos = np.asarray(state.pos)
    circ = np.asarray(state.circ)
    l_cont = np.asarray(state.l_cont)
    n = len(id_c)
    order = np.lexsort((pos, id_c))
    prev = np.full(n, -1, np.int32)
    nxt = np.full(n, -1, np.int32)
    if n == 0:
        return prev, nxt
    oc = id_c[order]
    same = oc[1:] == oc[:-1]            # consecutive entries share a contig
    nxt[order[:-1][same]] = order[1:][same]
    prev[order[1:][same]] = order[:-1][same]
    # circular wrap: head (pos 0) links back to the tail
    head_k = np.nonzero(pos[order] == 0)[0]
    heads = order[head_k]
    wrap = (circ[heads] == 1) & (l_cont[heads] > 1)
    tails = order[head_k[wrap] + l_cont[heads[wrap]] - 1]
    prev[heads[wrap]] = tails
    nxt[tails] = heads[wrap]
    return prev, nxt


def check_invariants(state: GenomeState, raise_on_error: bool = True):
    """Host-side structural invariant battery.

    Mirrors the reference's halt-on-corruption checks
    (cuda_lib_gl.py:1528-1537, :1546-1555): no negative pos / l_cont /
    l_cont_bp / start_bp, start_bp==0 <=> pos==0, no zero-length contigs;
    plus full consistency of the derived fields and the per-contig
    permutation property of ``pos``.
    """
    s = state.to_numpy()
    errors = []
    for f in ("pos", "l_cont", "l_cont_bp", "start_bp"):
        if np.any(s[f] < 0):
            errors.append(f"negative {f}")
    if np.any((s["start_bp"] != 0) & (s["pos"] == 0)):
        errors.append("pos==0 but start_bp!=0")
    if np.any((s["start_bp"] == 0) & (s["pos"] != 0)):
        errors.append("start_bp==0 but pos!=0")
    if np.any(s["l_cont"] == 0) or np.any(s["l_cont_bp"] == 0):
        errors.append("zero-length contig")
    if np.any(s["l_cont_bp"] - s["start_bp"] <= 0):
        errors.append("start_bp beyond contig end")
    if np.any(np.abs(s["ori"]) != 1):
        errors.append("ori not in {-1, +1}")

    # pos must be a permutation of 0..l_cont-1 within each contig, and the
    # derived fields must match the stored ones. Sort-based derivation:
    # O(n log n), usable at chr1 scale (the device-side renormalize builds
    # an n x n mask — its n^2 memory is fine as a small-state oracle only).
    n = len(s["pos"])
    order = np.lexsort((s["pos"], s["id_c"]))
    oc = s["id_c"][order]
    new_seg = np.empty(n, bool)
    if n:
        new_seg[0] = True
        new_seg[1:] = oc[1:] != oc[:-1]
        seg_id = np.cumsum(new_seg) - 1
        starts = np.nonzero(new_seg)[0]
        pos_in_seg = np.arange(n) - starts[seg_id]
        if not np.array_equal(s["pos"][order], pos_in_seg):
            errors.append("pos not a permutation within some contig")
        lens = s["len_bp"][order].astype(np.int64)
        cum = np.cumsum(lens) - lens
        start_ref = cum - cum[starts[seg_id]]
        if not np.array_equal(s["start_bp"][order], start_ref):
            errors.append("stored start_bp inconsistent with (id_c,pos,len_bp)")
        seg_count = np.bincount(seg_id)
        if not np.array_equal(s["l_cont"][order], seg_count[seg_id]):
            errors.append("stored l_cont inconsistent with (id_c,pos)")
        seg_bp = np.add.reduceat(lens, starts)
        if not np.array_equal(s["l_cont_bp"][order], seg_bp[seg_id]):
            errors.append("stored l_cont_bp inconsistent with (id_c,len_bp)")
        circ_o = s["circ"][order]
        if not np.array_equal(circ_o, circ_o[starts[seg_id]]):
            errors.append("inconsistent circ flag within some contig")
    if errors and raise_on_error:
        raise AssertionError("genome state corrupted: " + "; ".join(errors))
    return errors


def dist_inter_genome(state: GenomeState, init_prev, init_next, init_ori,
                      orientable, skip_mask) -> float:
    """Neighbourhood-agreement distance to the initial genome, in [0, 1].

    Host-side port of the reference metric (cuda_lib_gl.py:475-541): for
    every fragment not blacklisted / repeated, compare its (prev, next, ori)
    neighbourhood (mapped through id_d) with the initial genome; orientable
    fragments score orientation agreement of their neighbours too.
    ``skip_mask`` marks fragments excluded from the metric (blacklisted or
    repeat-involved, cuda_lib_gl.py:452-473).

    Fully vectorised; :func:`_dist_inter_genome_loop` is the per-fragment
    transcription kept as the test oracle.
    """
    prev_arr, next_arr = derive_prev_next(state)
    id_d = np.asarray(state.id_d)
    ori_arr = np.asarray(state.ori)
    init_prev = np.asarray(init_prev)
    init_next = np.asarray(init_next)
    init_ori = np.asarray(init_ori)
    orientable = np.asarray(orientable)
    counted = ~np.asarray(skip_mask)
    n = state.n_frags
    n_counted = int(np.sum(counted))
    if n_counted == 0:
        return 1.0
    norm = 3.0 * n_counted
    d = norm

    prev_t1 = np.where(prev_arr != -1, id_d[np.clip(prev_arr, 0, None)], -1)
    next_t1 = np.where(next_arr != -1, id_d[np.clip(next_arr, 0, None)], -1)
    prev_t0, next_t0 = init_prev, init_next

    pair_match = ((prev_t1 == prev_t0) & (next_t1 == next_t0)) | \
        ((prev_t1 == next_t0) & (next_t1 == prev_t0))
    d -= np.sum(pair_match & counted)

    # first active copy of each data bin (repeat-aware neighbour-ori lookup)
    n_bins = int(id_d.max()) + 1 if n else 0
    first_copy = np.zeros(max(n_bins, 1), np.int64)
    # reversed minimum: later assignments win, so iterate descending ids
    first_copy[id_d[::-1]] = np.arange(n - 1, -1, -1)

    ori_f = counted & orientable
    swap = np.where(init_ori != ori_arr, -1, 1)
    p1 = np.where(swap == -1, next_t1, prev_t1)
    n1 = np.where(swap == -1, prev_t1, next_t1)

    def orientable_side(t0, t1):
        nonlocal d
        match = ori_f & (t0 == t1)
        t1c = np.clip(t1, 0, len(orientable) - 1)
        # the orientable flag of the matched neighbour is indexed by its
        # *bin* id, exactly like the loop oracle (identical to the fragment
        # id when repeats are absent: id_d is the identity)
        simple = (t0 == -1) | ~orientable[t1c]
        d -= np.sum(match & simple)
        half = match & ~simple
        d -= 0.5 * np.sum(half)
        cand_ori = ori_arr[first_copy[np.clip(t1, 0, None)]]
        ori_ok = init_ori[np.clip(t0, 0, None)] == swap * cand_ori
        d -= 0.5 * np.sum(half & ori_ok)

    orientable_side(prev_t0, p1)
    orientable_side(next_t0, n1)

    non_f = counted & ~orientable
    d -= np.sum(non_f & ((prev_t1 == prev_t0) | (prev_t1 == next_t0)))
    d -= np.sum(non_f & ((next_t1 == next_t0) | (next_t1 == prev_t0)))
    return float(d / norm)


def _dist_inter_genome_loop(state: GenomeState, init_prev, init_next,
                            init_ori, orientable, skip_mask) -> float:
    """Per-fragment transcription of the reference metric — the oracle for
    the vectorised :func:`dist_inter_genome`."""
    prev_arr, next_arr = derive_prev_next(state)
    id_d = np.asarray(state.id_d)
    ori_arr = np.asarray(state.ori)
    n = state.n_frags
    n_counted = int(n - np.sum(skip_mask))
    d = 3.0 * n_counted
    norm = 3.0 * n_counted
    for f in range(n):
        if skip_mask[f]:
            continue
        prev_t0, next_t0 = init_prev[f], init_next[f]
        prev_t1 = id_d[prev_arr[f]] if prev_arr[f] != -1 else -1
        next_t1 = id_d[next_arr[f]] if next_arr[f] != -1 else -1
        if ((prev_t1 == prev_t0 and next_t1 == next_t0)
                or (prev_t1 == next_t0 and next_t1 == prev_t0)):
            d -= 1
        if orientable[f]:
            swap = 1
            if init_ori[f] != ori_arr[f]:
                prev_t1, next_t1 = next_t1, prev_t1
                swap = -1
            if prev_t0 == prev_t1:
                if prev_t0 == -1 or not orientable[prev_t1]:
                    d -= 1
                else:
                    d -= 0.5
                    # ori of the matched neighbour in the *current* genome is
                    # found at any copy with that id_d; use the first.
                    cand = np.nonzero(id_d == prev_t1)[0][0]
                    if init_ori[prev_t0] == swap * ori_arr[cand]:
                        d -= 0.5
            if next_t0 == next_t1:
                if next_t0 == -1 or not orientable[next_t1]:
                    d -= 1
                else:
                    d -= 0.5
                    cand = np.nonzero(id_d == next_t1)[0][0]
                    if init_ori[next_t0] == swap * ori_arr[cand]:
                        d -= 0.5
        else:
            if prev_t1 == prev_t0 or prev_t1 == next_t0:
                d -= 1
            if next_t1 == next_t0 or next_t1 == prev_t0:
                d -= 1
    return float(d / norm)
