"""The MCMC / simulated-annealing sampler: one fully on-device step.

Reference control flow (step_max_likelihood, cuda_lib_gl.py:1793-1980):
per fragment fA, sample <=delta neighbours from a contacts^3-weighted
distribution, build 13 candidate genomes per neighbour, score each with the
Poisson likelihood, filter/temper/sample a score slot, commit the winner.
The reference round-trips to the host for every decision and launches
13 x neighbours kernels per step; here the complete step — neighbour
sampling, candidate construction, scoring, categorical selection, commit —
is a single jitted function, and a whole EM cycle over all fragments is one
``lax.scan``. Candidate scores are *absolute* log-likelihoods (the
reference's score = DeltaL + L_t, cuda_lib_gl.py:2544-2545 — identical by
construction), so no incremental bookkeeping is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.likelihood import log_likelihood
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable

# Score window below the best candidate kept for sampling
# (thresh_overflow, cuda_lib_gl.py:1917).
THRESH_OVERFLOW = 30.0


class NeighbourTable(NamedTuple):
    """Static proposal-distribution tables.

    Built from the bin-level contact matrix: per bin, the ``n_neighbors``
    strongest contact partners with probability proportional to contacts^3
    (setup_distri_frags, cuda_lib_gl.py:2363-2390), plus the bin -> copy
    dispatcher for repeat expansion (return_neighbours :2295-2331).
    """

    xk: jnp.ndarray          # (n_bins, n_top) int32 candidate partner bins
    pk: jnp.ndarray          # (n_bins, n_top) float32 probabilities
    dispatcher: jnp.ndarray  # (n_bins, max_copies) int32 copy ids, -1 padded
    blacklist: jnp.ndarray   # (n_frags,) bool
    n_bins: int
    max_copies: int


def _matrix_to_coo(matrix):
    """(rows, cols, vals, n) triplets of a dense array or scipy.sparse
    matrix, off-diagonal positive entries only."""
    try:
        import scipy.sparse as sp
        sparse = sp.issparse(matrix)
    except ImportError:       # pragma: no cover
        sparse = False
    if sparse:
        coo = matrix.tocoo()
        rows, cols, vals = coo.row, coo.col, coo.data.astype(np.float64)
        n = coo.shape[0]
    else:
        m = np.asarray(matrix, np.float64)
        n = m.shape[0]
        rows, cols = np.nonzero(m)
        vals = m[rows, cols]
    keep = (rows != cols) & (vals > 0)
    return rows[keep], cols[keep], vals[keep], n


def topk_rows(rows, cols, vals, n_rows, k):
    """Per-row top-``k`` entries of COO triplets, vectorised (one lexsort).

    Returns (idx (n_rows, k) int32, val (n_rows, k) f64), zero-padded for
    rows with fewer than k entries. Replaces the reference-era per-row
    argsort (O(n^2) host time) — this is O(nnz log nnz).
    """
    idx = np.zeros((n_rows, k), np.int32)
    val = np.zeros((n_rows, k), np.float64)
    if len(rows) == 0:
        return idx, val
    order = np.lexsort((-vals, rows))
    r, c, v = rows[order], cols[order], vals[order]
    new_seg = np.empty(len(r), bool)
    new_seg[0] = True
    new_seg[1:] = r[1:] != r[:-1]
    seg_id = np.cumsum(new_seg) - 1
    starts = np.nonzero(new_seg)[0]
    pos_in_seg = np.arange(len(r)) - starts[seg_id]
    sel = pos_in_seg < k
    idx[r[sel], pos_in_seg[sel]] = c[sel]
    val[r[sel], pos_in_seg[sel]] = v[sel]
    return idx, val


def build_dispatcher(id_d, n_bins):
    """(n_bins, max_copies) bin -> copy-fragment ids, -1 padded
    (frag_dispatcher spans, simulation_loader.py:258-277), vectorised."""
    id_d = np.asarray(id_d)
    order = np.argsort(id_d, kind="stable")
    sorted_bins = id_d[order]
    counts = np.bincount(id_d, minlength=n_bins)
    max_copies = int(counts.max()) if len(counts) else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_bin = np.arange(len(order)) - starts[sorted_bins]
    dispatcher = np.full((n_bins, max_copies), -1, np.int32)
    dispatcher[sorted_bins, pos_in_bin] = order
    return dispatcher, max_copies


def build_neighbour_table(bin_matrix, id_d, n_frags, blacklisted=(),
                          n_top=10, fact=3.0) -> NeighbourTable:
    """Host-side construction of the proposal tables.

    ``bin_matrix`` may be dense or scipy.sparse — construction cost is
    O(nnz log nnz), so chr1-scale (500k-bin) tables build in seconds.
    """
    rows, cols, vals, n_bins = _matrix_to_coo(bin_matrix)
    n_top = max(1, min(n_top, n_bins - 1))   # tiny coarse levels
    xk, topv = topk_rows(rows, cols, vals, n_bins, n_top)
    w = np.where(topv > 0, topv, 0.0) ** fact
    tot = w.sum(axis=1, keepdims=True)
    pk = np.divide(w, tot, out=np.zeros_like(w), where=tot > 0)
    # contact-free rows: uniform over arbitrary partners (the reference's
    # descending argsort of an all-zero row lands on the highest bin ids)
    empty = tot[:, 0] <= 0
    if empty.any():
        xk[empty] = (n_bins - 1 - np.arange(n_top))[None, :]
        pk[empty] = 1.0 / n_top
    pk = pk.astype(np.float32)

    dispatcher, max_copies = build_dispatcher(id_d, n_bins)

    bl = np.zeros(n_frags, bool)
    bl[list(blacklisted)] = True
    return NeighbourTable(
        xk=jnp.asarray(xk), pk=jnp.asarray(pk),
        dispatcher=jnp.asarray(dispatcher), blacklist=jnp.asarray(bl),
        n_bins=n_bins, max_copies=max_copies)


def sample_neighbours(key, f_a, state: GenomeState, nb: NeighbourTable, delta: int):
    """Sample <= delta partner bins (without replacement, p prop contacts^3),
    expand to repeat copies, add the other copies of fA's own bin, mask
    blacklisted / self entries. Returns (ids, valid) of static length
    delta * max_copies + max_copies.
    """
    bin_a = state.id_d[f_a]
    pk_row = nb.pk[bin_a]
    xk_row = nb.xk[bin_a]
    # Gumbel top-k == weighted sampling without replacement.
    g = jnp.where(pk_row > 0, jnp.log(pk_row), -jnp.inf)
    g = g - jnp.log(-jnp.log(jax.random.uniform(key, pk_row.shape) + 1e-20) + 1e-20)
    _, top = jax.lax.top_k(g, delta)
    bins = xk_row[top]
    bin_valid = pk_row[top] > 0

    # repeat expansion: (delta, max_copies) copy ids
    exp = nb.dispatcher[bins]                        # (delta, mc)
    exp_valid = (exp >= 0) & bin_valid[:, None]
    # other copies of fA's own bin (return_neighbours, cuda_lib_gl.py:2316-2319)
    own = nb.dispatcher[bin_a]                       # (mc,)
    own_valid = (own >= 0) & (own != f_a) & (state.rep[f_a] == 1)

    ids = jnp.concatenate([own, exp.reshape(-1)])
    valid = jnp.concatenate([own_valid, exp_valid.reshape(-1)])
    valid = valid & ~nb.blacklist[jnp.clip(ids, 0)] & (ids != f_a)
    ids = jnp.clip(ids, 0)
    # Deterministic order (the reference sorts ids, cuda_lib_gl.py:1879);
    # push invalid entries to the end.
    sort_key = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(sort_key)
    return ids[order], valid[order]


def select_score_slot(key, score, valid_nb, f_t, slot_valid=None,
                      thresh_overflow=THRESH_OVERFLOW):
    """Filter / temper / sample one (neighbour, op) slot.

    Exactly the reference's host logic (cuda_lib_gl.py:1899-1947): drop
    duplicate eject/flip slots beyond the first neighbour, shift by the
    minimum, clamp to a 30-window below the max, normalise, raise to 1/F_t,
    renormalise, categorical draw; argmax fallback when <= 1 candidate
    survives.

    ``slot_valid``: optional (m, n_ops) bool mask of additionally valid
    slots (e.g. delta-scoring overflow exclusion) folded into the validity
    mask *before* min/max so an excluded slot can never poison the window.
    """
    m, n_ops = score.shape
    op_idx = jnp.arange(n_ops)[None, :]
    nb_idx = jnp.arange(m)[:, None]
    # eject/flip do not depend on the neighbour: keep them on slot 0 only
    dup = (op_idx < 2) & (nb_idx > 0)
    valid_op = valid_nb[:, None] | ((nb_idx == 0) & (op_idx < 2))
    if slot_valid is not None:
        valid_op = valid_op & slot_valid
    flat = score.reshape(-1)
    valid_flat = (valid_op & ~dup).reshape(-1)

    score_min = jnp.min(jnp.where(valid_flat, flat, jnp.inf))
    filtered = jnp.where(valid_flat, flat - score_min, 0.0)
    max_score = jnp.max(filtered)
    filtered = jnp.maximum(filtered - (max_score - thresh_overflow), 0.0)
    filtered = jnp.where(valid_flat, filtered, 0.0)

    n_pos = jnp.sum(filtered > 0)
    p = filtered / jnp.sum(filtered)
    logw = jnp.where(p > 0, jnp.log(p) / f_t, -jnp.inf)
    cat = jax.random.categorical(key, logw)
    best = jnp.argmax(jnp.where(valid_flat, flat, -jnp.inf))
    return jnp.where(n_pos <= 1, best, cat)


def make_em_step(table: SubFragTable, obs, nb: NeighbourTable, delta: int,
                 ll_dtype=jnp.float32, scorer=None,
                 thresh_overflow=THRESH_OVERFLOW):
    """Build the jitted single-fragment EM step.

    Returns step(state, key, params, f_a, f_t) ->
    (new_state, (score_sel, op_sel, fb_sel)).

    ``scorer``: optional batched likelihood fn
    ``(GenomeState batch, params) -> (B,)`` (e.g. the Pallas kernel,
    graal_tpu.ops.likelihood_pallas.make_pallas_scorer); defaults to the
    vmapped jnp implementation.
    """
    obs = jnp.asarray(obs, jnp.float32)

    def step(state: GenomeState, key, params: RippeParams, f_a, f_t):
        k_nb, k_sel = jax.random.split(key)
        ids, valid = sample_neighbours(k_nb, f_a, state, nb, delta)

        cands = jax.vmap(lambda fb: build_candidates(state, f_a, fb))(ids)
        if scorer is not None:
            m = ids.shape[0]
            flat = jax.tree.map(
                lambda x: x.reshape((m * N_CANDIDATES,) + x.shape[2:]), cands)
            ll = scorer(flat, params).reshape(m, N_CANDIDATES)
        else:
            ll = jax.vmap(jax.vmap(
                lambda c: log_likelihood(c, table, obs, params, dtype=ll_dtype)))(cands)

        sel = select_score_slot(k_sel, ll.astype(jnp.float32), valid, f_t,
                                thresh_overflow=thresh_overflow)
        sel_nb = sel // N_CANDIDATES
        sel_op = sel % N_CANDIDATES
        new_state = jax.tree.map(lambda x: x[sel_nb, sel_op], cands)

        # blacklisted fragments are skipped entirely (cuda_lib_gl.py:1796,1962)
        skip = nb.blacklist[f_a]
        new_state = GenomeState(*[jnp.where(skip, a, b)
                                  for a, b in zip(state, new_state)])
        score_sel = jnp.where(skip, -jnp.inf, ll.reshape(-1)[sel])
        return new_state, (score_sel, jnp.where(skip, -1, sel_op),
                           jnp.where(skip, f_a, ids[sel_nb]))

    return step


def _device_peval(s, params: RippeParams):
    """Rippe curve without the v_inter clamp / range gate — the raw model
    value used for nuisance re-derivations (optim_rippe_curve_update.py:22)."""
    n = s * params.lm / params.kuhn
    return (params.fact * 0.53 * jnp.power(params.kuhn, -3.0)
            * jnp.power(n, params.slope)
            * jnp.exp((params.d - 2.0) / (n * n + params.d)))


def solve_d_max(params: RippeParams, v_inter, lo=1e-2, hi=1e6, passes=5,
                width=64):
    """Log-space multisection solve of rippe(s) == v_inter on the
    (strictly decreasing) branch — the device-side equivalent of
    estimate_max_dist_intra (fsolve, optim_rippe_curve_update.py:125-135).

    Each pass evaluates the curve at ``width`` geometrically spaced
    points in one VPU op and shrinks the bracket by (width-1)x; 5 passes
    cut the 8-decade range by 63^5 ~ 1e9, past f32 resolution. Replaces
    an 80-iteration *sequential scalar* bisection that cost ~0.18 ms per
    nuisance step on chip (the iterations serialise; the vector passes
    don't)."""
    llo = jnp.float32(np.log(lo))
    lhi = jnp.float32(np.log(hi))
    frac = jnp.arange(width, dtype=jnp.float32) / np.float32(width - 1)
    for _ in range(passes):
        xs = jnp.exp(llo + (lhi - llo) * frac)
        above = _device_peval(xs, params) > v_inter
        idx = jnp.clip(jnp.sum(above.astype(jnp.int32)) - 1, 0, width - 2)
        step = (lhi - llo) / np.float32(width - 1)
        llo = llo + idx.astype(jnp.float32) * step
        lhi = llo + step
    return jnp.exp((llo + lhi) * 0.5)


def make_nuisance_proposer(d_max_cap: float | None = None):
    """Parameter-proposal half of the nuisance Metropolis step, split out
    so multi-chain callers can evaluate the ONE heavy piece — the
    test-parameter likelihood — through a chain-batched (sharded) anchor:
    vmap this proposer and :func:`nuisance_accept` (both trivial), call
    the batched scorer once in between (ScaleRunner.run_chains).

    Returns ``propose(key, params) -> (test_params, in_support, k_u)``.
    The key schedule is identical to :func:`make_nuisance_step` (one
    3-way split; ``k_u`` is the acceptance key), so composing the halves
    reproduces the monolithic step bit-exactly.
    """
    sigma_slope = 0.05
    sigma_d_max = 100.0
    sigma_d_nuc = 0.5
    # Prior support: the reference declares per-parameter ranges but never
    # applies them (cuda_lib_gl.py:2031-2045); without enforcement a negative
    # v_inter makes -ex contributions positive and the likelihood diverges.
    # A proposal is rejected when the *perturbed* parameter leaves its range
    # (checking all parameters would freeze sampling whenever the initial
    # fit lands outside a declared range).
    slope_range = (-2.0, -0.5)
    d_max_range = (0.0, 10000.0)
    d_nuc_range = (0.0, 100.0)

    def rederive_c1(p: RippeParams):
        c1 = (0.53 * jnp.power(p.lm / p.kuhn, p.slope)
              * jnp.power(p.kuhn, -3.0))
        return p._replace(c1=c1.astype(jnp.float32))

    def propose(key, params: RippeParams):
        k_mod, k_eps, k_u = jax.random.split(key, 3)
        id_modif = jax.random.randint(k_mod, (), 0, 4)
        eps = jax.random.normal(k_eps, ())

        def mod_fact(p):
            sigma = jnp.power(10.0, jnp.log10(p.fact) - 2.0)
            new_fact = p.fact + eps * sigma
            p = p._replace(fact=new_fact)
            return p._replace(d_max=solve_d_max(p, p.v_inter)), new_fact > 0.0

        def mod_slope(p):
            new_slope = p.slope + eps * sigma_slope
            p = rederive_c1(p._replace(slope=new_slope))
            valid = (new_slope >= slope_range[0]) & (new_slope <= slope_range[1])
            return p._replace(d_max=solve_d_max(p, p.v_inter)), valid

        def mod_d_max(p):
            new_d_max = p.d_max + eps * sigma_d_max
            new_v = _device_peval(new_d_max, p)
            valid = (new_d_max > d_max_range[0]) & (new_d_max <= d_max_range[1])
            return p._replace(d_max=new_d_max, v_inter=new_v), valid

        def mod_d_nuc(p):
            new_v = p.v_inter + eps * sigma_d_nuc
            p = p._replace(v_inter=new_v)
            valid = (new_v > d_nuc_range[0]) & (new_v <= d_nuc_range[1])
            return p._replace(d_max=solve_d_max(p, new_v)), valid

        test_params, in_support = jax.lax.switch(
            id_modif, [mod_fact, mod_slope, mod_d_max, mod_d_nuc], params)
        test_params = RippeParams(*[x.astype(jnp.float32)
                                    for x in test_params])
        if d_max_cap is not None:
            # every modifier can move d_max (directly or via solve_d_max)
            in_support = in_support & (test_params.d_max <= d_max_cap)
        return test_params, in_support, k_u

    return propose


def nuisance_accept(k_u, test_params: RippeParams, params: RippeParams,
                    l_star, l_t, f_t, in_support):
    """Metropolis accept/reject half of the nuisance step (vmappable)."""
    ratio = jnp.exp((l_star.astype(jnp.float32) - l_t) / f_t)
    accept = in_support & (ratio >= jax.random.uniform(k_u, ()))
    out = RippeParams(*[jnp.where(accept, a, b)
                        for a, b in zip(test_params, params)])
    l_out = jnp.where(accept, l_star.astype(jnp.float32), l_t)
    return out, l_out, accept


def make_nuisance_step(table: SubFragTable, obs, ll_dtype=jnp.float32,
                       scorer=None, d_max_cap: float | None = None):
    """Jitted nuisance-parameter Metropolis step
    (step_nuisance_parameters, cuda_lib_gl.py:2022-2107).

    One of {fact, slope, d_max, v_inter} is perturbed with a Gaussian of the
    reference's per-parameter sigma; dependent parameters (c1, d_max or
    v_inter) are re-derived; accepted with probability
    exp((L* - L_t) / F_t).

    ``scorer``: optional batched likelihood fn (e.g. the Pallas kernel or a
    sparse evaluation) used for the test-parameter evaluation, so the
    nuisance path shares the EM step's fast scorer instead of falling back
    to the jnp likelihood. With a scorer, ``obs`` may be None (chr1 scale:
    no dense matrix exists).

    ``d_max_cap``: reject any proposal whose (possibly re-derived) d_max
    exceeds this value. REQUIRED with banded sparse scorers: their cis
    correction only covers pairs within the band width chosen at build
    time (ScaleRunner.max_covered_d_max) — beyond it the evaluation
    silently undercounts cis mass, so such proposals must never enter
    the Metropolis test at all.
    """
    if obs is not None:
        obs = jnp.asarray(obs, jnp.float32)
    propose = make_nuisance_proposer(d_max_cap=d_max_cap)

    def step(state: GenomeState, key, params: RippeParams, l_t, f_t):
        test_params, in_support, k_u = propose(key, params)
        if scorer is not None:
            l_star = scorer(jax.tree.map(lambda x: x[None], state),
                            test_params)[0]
        else:
            l_star = log_likelihood(state, table, obs, test_params,
                                    dtype=ll_dtype)
        return nuisance_accept(k_u, test_params, params, l_star, l_t, f_t,
                               in_support)

    return step


class CycleMetrics(NamedTuple):
    likelihood: jnp.ndarray
    n_contigs: jnp.ndarray
    mean_len: jnp.ndarray      # mean contig length in bp (main_gl.py:1813)
    op_sampled: jnp.ndarray
    id_f_sampled: jnp.ndarray
    id_f_a: jnp.ndarray
    fact: jnp.ndarray
    slope: jnp.ndarray
    d_max: jnp.ndarray
    v_inter: jnp.ndarray
    success: jnp.ndarray


def make_em_cycle(table: SubFragTable, obs, nb: NeighbourTable, delta: int,
                  sample_param: bool = True, ll_dtype=jnp.float32,
                  scorer=None, thresh_overflow=THRESH_OVERFLOW):
    """One EM cycle (all fragments in the given order) as a single scan —
    the device-side equivalent of the start_EM inner loop
    (main_gl.py:225-278)."""
    em_step = make_em_step(table, obs, nb, delta, ll_dtype, scorer=scorer,
                           thresh_overflow=thresh_overflow)
    nuis_step = make_nuisance_step(table, obs, ll_dtype, scorer=scorer)

    @jax.jit
    def cycle(state: GenomeState, key, params: RippeParams, frag_order, l_t, f_t):
        def body(carry, f_a):
            state, key, params, l_t = carry
            key, k_step, k_nuis = jax.random.split(key, 3)
            state, (score, op, fb) = em_step(state, k_step, params, f_a, f_t)
            l_t = jnp.where(jnp.isfinite(score), score, l_t)
            if sample_param:
                params, l_t, success = nuis_step(state, k_nuis, params, l_t, f_t)
            else:
                success = jnp.bool_(True)
            n_contigs = state.n_contigs()
            # mean contig length over *active* fragments only — inactive
            # repeat copies carry no sequence (main_gl.py:251 semantics)
            active_bp = jnp.sum(
                jnp.where(state.activ == 1, state.len_bp, 0))
            metrics = CycleMetrics(
                likelihood=l_t, n_contigs=n_contigs,
                mean_len=active_bp.astype(jnp.float32) / n_contigs,
                op_sampled=op, id_f_sampled=fb, id_f_a=f_a,
                fact=params.fact, slope=params.slope, d_max=params.d_max,
                v_inter=params.v_inter, success=success)
            return (state, key, params, l_t), metrics

        (state, key, params, l_t), metrics = jax.lax.scan(
            body, (state, key, params, l_t), frag_order)
        return state, params, l_t, metrics

    return cycle


def explode_genome(state: GenomeState) -> GenomeState:
    """Scramble to the worst-case start: every fragment a singleton contig
    (explode_genome, cuda_lib_gl.py:1539-1557 — sequential pop_outs in the
    reference; directly constructed here, an identical partition)."""
    n = state.n_frags
    return state._replace(
        pos=jnp.zeros(n, jnp.int32),
        id_c=jnp.arange(n, dtype=jnp.int32),
        start_bp=jnp.zeros(n, jnp.int32),
        circ=jnp.zeros(n, jnp.int32),
        l_cont=jnp.ones(n, jnp.int32),
        l_cont_bp=state.len_bp,
        ori=jnp.ones(n, jnp.int32),
    )


def apply_mutation(state: GenomeState, f_a, f_b, mode) -> GenomeState:
    """Apply one recorded mutation — the replay primitive
    (apply_replay_simu, cuda_lib_gl.py:1559-1578)."""
    cands = build_candidates(state, f_a, f_b)
    return jax.tree.map(lambda x: x[mode], cands)
