"""Multi-chip scale-out: device meshes, row-sharded likelihood, chain
parallelism, best-genome exchange.

The reference is single-GPU; its author marked the intended fan-out point in
the per-neighbour loop ("place where we want to spread the workload accross
the network!", cuda_lib_gl.py:1886). The TPU-native design scales along two
mesh axes instead:

- ``rows``: the quadratic sub-fragment pair grid of the likelihood is
  sharded by data rows; every device scores every candidate on its row
  block and partial log-likelihoods are ``psum``-reduced over ICI. All
  sampling decisions are computed redundantly (replicated) within a row
  group — decisions are O(candidates), the pair grid is O(K^2).
- ``chains``: independent annealing chains run data-parallel (one genome
  per chain), with a periodic best-genome exchange implemented as an
  all-gather + argmax broadcast.

This is the dp/sp decomposition that fits an MCMC engine; there is no
weight matrix to tensor-parallelise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graal_tpu.core.candidates import N_CANDIDATES, build_candidates
from graal_tpu.core.mcmc import NeighbourTable, sample_neighbours, select_score_slot
from graal_tpu.core.model import (RippeParams, expected_contacts,
                                  poisson_loglik, rippe_contacts,
                                  rippe_contacts_circ)
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


def make_mesh(n_chains: int = 1, n_rows: int | None = None, devices=None) -> Mesh:
    """Create a (chains, rows) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_rows is None:
        n_rows = len(devices) // n_chains
    assert n_chains * n_rows == len(devices), \
        f"{n_chains} x {n_rows} != {len(devices)} devices"
    return Mesh(devices.reshape(n_chains, n_rows), ("chains", "rows"))


def _pad_rows(obs: np.ndarray, n_rows: int):
    """Pad the observed matrix's rows to a multiple of the rows axis."""
    s = obs.shape[0]
    pad = (-s) % n_rows
    if pad:
        obs = np.pad(obs, ((0, pad), (0, 0)))
    return obs, s + pad


def _copy_tables(table: SubFragTable):
    """Host-side (S, mc) copy-slot index/valid tables (dispatcher spans)."""
    data_id = np.asarray(table.data_id)
    s = table.n_data_sub
    order = np.argsort(data_id, kind="stable")
    counts = np.bincount(data_id, minlength=s)
    mc = int(counts.max()) if len(counts) else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slots = np.full((s, mc), -1, np.int64)
    pos = np.arange(len(order)) - starts[data_id[order]]
    slots[data_id[order], pos] = order
    return (jnp.asarray(np.where(slots < 0, 0, slots), jnp.int32),
            jnp.asarray(slots >= 0), mc)


def _block_log_likelihood_repeats(state: GenomeState, table: SubFragTable,
                                  obs_block, params: RippeParams, row_start,
                                  copy_tabs):
    """Repeat-aware row block on the DATA grid: expected counts summed over
    active copy pairs before the pmf (kernels3.cu:2895-2929)."""
    slots, valid, mc = copy_tabs
    b = obs_block.shape[0]
    s_dim = table.n_data_sub
    own = table.owner

    start_kb = state.start_bp[own].astype(jnp.float32) / 1000.0
    ori = state.ori[own]
    offset = jnp.where(ori == 1, table.prefix_kb, table.suffix_kb)
    mid = start_kb + offset + table.len_kb * 0.5
    idc = state.id_c[own]
    act = state.activ[own] == 1
    circ = state.circ[own]
    stot = state.l_cont_bp[own].astype(jnp.float32) / 1000.0
    accu = table.accu

    rows = jnp.clip(row_start + jnp.arange(b), 0, s_dim - 1)
    e_total = jnp.zeros((b, s_dim), jnp.float32)
    for a in range(mc):
        u = slots[rows, a]
        uv = valid[rows, a]
        for b2 in range(mc):
            v = slots[:, b2]
            vv = valid[:, b2]
            s = jnp.abs(mid[u][:, None] - mid[v][None, :])
            same = idc[u][:, None] == idc[v][None, :]
            na = accu[u][:, None] * accu[v][None, :] / table.n_frags_per_bins
            e = expected_contacts(s, same, circ[u][:, None] == 1,
                                  stot[u][:, None], na, params)
            ok = (uv & act[u])[:, None] & (vv & act[v])[None, :]
            e_total = e_total + jnp.where(ok, e, 0.0)

    ll = poisson_loglik(e_total, obs_block)
    col = jnp.arange(s_dim)[None, :]
    grow = (row_start + jnp.arange(b))[:, None]
    mask = (col > grow) & (grow < s_dim)
    return jnp.sum(jnp.where(mask, ll, 0.0))


def _block_log_likelihood(state: GenomeState, table: SubFragTable,
                          obs_block, params: RippeParams, row_start,
                          copy_tabs=None):
    """Log-likelihood restricted to data rows [row_start, row_start+B),
    triangular mask applied in global coordinates. Repeat-carrying tables
    use the copy-summing data-grid formulation."""
    if table.has_repeats:
        return _block_log_likelihood_repeats(state, table, obs_block,
                                             params, row_start, copy_tabs)
    b = obs_block.shape[0]
    k = table.n_subs

    start_kb = state.start_bp[table.owner].astype(jnp.float32) / 1000.0
    ori = state.ori[table.owner]
    offset = jnp.where(ori == 1, table.prefix_kb, table.suffix_kb)
    mid = start_kb + offset + table.len_kb * 0.5

    rows = jnp.clip(row_start + jnp.arange(b), 0, k - 1)
    own_r = table.owner[rows]
    own = table.owner

    s = jnp.abs(mid[rows][:, None] - mid[None, :])
    same = state.id_c[own_r][:, None] == state.id_c[own][None, :]
    act = (state.activ[own_r][:, None] == 1) & (state.activ[own][None, :] == 1)
    norm_accu = (table.accu[rows][:, None] * table.accu[None, :]) / table.n_frags_per_bins
    s_tot = state.l_cont_bp[own_r].astype(jnp.float32)[:, None] / 1000.0

    cis_lin = rippe_contacts(s, params)
    cis_circ = rippe_contacts_circ(s, s_tot, params)
    cis = jnp.where(state.circ[own_r][:, None] == 1, cis_circ, cis_lin)
    e = jnp.where(same, cis, params.v_inter) * norm_accu
    e = jnp.where(act, e, 0.0)

    ll = poisson_loglik(e, obs_block)
    # strict upper triangle in global coordinates + row-padding mask
    col = jnp.arange(k)[None, :]
    grow = (row_start + jnp.arange(b))[:, None]
    mask = (col > grow) & (grow < k)
    return jnp.sum(jnp.where(mask, ll, 0.0))


def sharded_log_likelihood(mesh: Mesh, table: SubFragTable, obs):
    """Build a jitted fn(state, params) -> replicated scalar with the pair
    grid row-sharded over the ``rows`` mesh axis."""
    n_rows = mesh.shape["rows"]
    obs_p, total = _pad_rows(np.asarray(obs, np.float32), n_rows)
    block = total // n_rows
    obs_sharded = jax.device_put(obs_p, NamedSharding(mesh, P("rows", None)))
    copy_tabs = _copy_tables(table) if table.has_repeats else None

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("rows", None), P()),
        out_specs=P(), check_vma=False)
    def ll(state, obs_block, params):
        row_start = jax.lax.axis_index("rows") * block
        partial = _block_log_likelihood(state, table, obs_block, params,
                                        row_start, copy_tabs)
        return jax.lax.psum(partial, "rows")

    @jax.jit
    def fn(state, params):
        return ll(state, obs_sharded, params)

    return fn


def make_sharded_em_step(mesh: Mesh, table: SubFragTable, obs,
                         nb: NeighbourTable, delta: int):
    """Fully sharded EM training step.

    Genomes are batched over the ``chains`` axis (one independent annealing
    chain per mesh row); candidate likelihoods are computed on row blocks of
    the pair grid and psum-reduced over ``rows``. Sampling decisions are
    replicated within each chain's row group (deterministic given the
    per-chain key).

    Returns step(states, keys, params, f_a, f_t) -> (states, scores) with
    ``states`` a GenomeState batch of leading dim n_chains.
    """
    n_rows = mesh.shape["rows"]
    obs_np = np.asarray(obs, np.float32)
    obs_p, total = _pad_rows(obs_np, n_rows)
    block = total // n_rows
    obs_sharded = jax.device_put(obs_p, NamedSharding(mesh, P("rows", None)))
    copy_tabs = _copy_tables(table) if table.has_repeats else None

    def chain_step(state: GenomeState, key, params, obs_block, f_a, f_t):
        k_nb, k_sel = jax.random.split(key)
        ids, valid = sample_neighbours(k_nb, f_a, state, nb, delta)
        cands = jax.vmap(lambda fb: build_candidates(state, f_a, fb))(ids)
        row_start = jax.lax.axis_index("rows") * block

        def score(c):
            partial = _block_log_likelihood(c, table, obs_block, params,
                                            row_start, copy_tabs)
            return jax.lax.psum(partial, "rows")
        ll = jax.vmap(jax.vmap(score))(cands)

        sel = select_score_slot(k_sel, ll, valid, f_t)
        new_state = jax.tree.map(
            lambda x: x[sel // N_CANDIDATES, sel % N_CANDIDATES], cands)
        skip = nb.blacklist[f_a]
        new_state = GenomeState(*[jnp.where(skip, a, b)
                                  for a, b in zip(state, new_state)])
        return new_state, jnp.where(skip, -jnp.inf, ll.reshape(-1)[sel])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("chains"), P("chains"), P(), P("rows", None), P("chains"), P()),
        out_specs=(P("chains"), P("chains")), check_vma=False)
    def sharded(states, keys, params, obs_block, f_as, f_t):
        return jax.vmap(
            lambda s, k, fa: chain_step(s, k, params, obs_block, fa, f_t),
            in_axes=(0, 0, 0))(states, keys, f_as)

    @jax.jit
    def step(states, keys, params, f_as, f_t):
        return sharded(states, keys, params, obs_sharded, f_as, f_t)

    return step


def make_sharded_delta_cycle(mesh: Mesh, table: SubFragTable, nb,
                             delta: int, f_max: int, obs=None, sobs=None,
                             band_w: int | None = None,
                             per_chain_params: bool = False):
    """Chains-sharded chr1-scale cycle: every chain runs the mini-state
    delta EM scan on its own device(s); observed contacts are read through
    ``sobs`` (sparse CSR windows, replicated — the sparse triplets are
    O(nnz), small next to a dense grid).

    This is the scale-out shape for the chr1-class configs: the delta
    scorer's pair grids are tiny (f_max^2), so the parallel axis worth
    spending devices on is chains (tempered or independent restarts), not
    rows. Returns cycle(states, keys, params, orders, l_ts, f_ts) ->
    (states, l_ts) with leading dim n_chains on every arg
    (``per_chain_params``: params too — chains then carry their own
    nuisance parameters).
    """
    from graal_tpu.core import delta as delta_mod

    step = delta_mod.make_delta_em_step(table, obs, nb, delta, f_max,
                                        sobs=sobs, band_w=band_w)

    def one_chain(state, key, params, order, l_t, f_t):
        # compensated carry — same rationale as delta.make_delta_em_cycle
        def body(carry, f_a):
            state, key, l_hi, l_c = carry
            key, sub = jax.random.split(key)
            state, d_sel, _ = step(state, sub, params, jnp.float32(0.0),
                                   f_a, f_t)
            y = d_sel - l_c
            t = l_hi + y
            l_c = (t - l_hi) - y
            l_hi = t
            return (state, key, l_hi, l_c), None

        (state, key, l_t, _), _ = jax.lax.scan(
            body, (state, key, l_t, jnp.float32(0.0)), order)
        return state, l_t

    p_ax = 0 if per_chain_params else None
    p_spec = P("chains") if per_chain_params else P()
    batched = jax.vmap(one_chain, in_axes=(0, 0, p_ax, 0, 0, 0))
    sharded = shard_map(
        batched, mesh=mesh,
        in_specs=(P("chains"), P("chains"), p_spec, P("chains"),
                  P("chains"), P("chains")),
        out_specs=(P("chains"), P("chains")), check_vma=False)
    return jax.jit(sharded)


def make_sharded_sparse_anchor(mesh: Mesh, table: SubFragTable, sobs,
                               w: int):
    """Rows-sharded chr1-scale sparse full-likelihood re-anchor.

    The sparse evaluation (core.sparse.make_sparse_loglik) is
    O(nnz + K log K + K*w); at 500k fragments with ~267M symmetric nnz a
    replicated single-device pass costs multiple seconds once per cycle
    per chain. Here the two big terms are sharded over the ``rows`` mesh
    axis and psum-reduced over ICI:

    - the observed-pair sum: nnz triplets split into contiguous shards
      (each device holds nnz/D triplets — also a D-fold memory saving),
    - the banded cis correction: each device takes a contiguous chunk of
      the genome-sorted sub order as band left-ends (the O(K log K) sort
      itself is replicated — it is tiny next to the K*w band).

    The analytic trans mass and the logfact constant are replicated
    scalars added outside the psum.

    Returns fn(states, params) -> l_ts with leading dim n_chains, chains
    sharded over the ``chains`` mesh axis (size 1 collapses to pure row
    sharding). Repeat-free tables only — copy-expanded tables re-anchor
    with the local variant.
    """
    from graal_tpu.core.sparse import genome_sort_order

    if table.has_repeats:
        return _make_sharded_sparse_anchor_repeats(mesh, table, sobs, w)
    n_rows_ax = mesh.shape["rows"]
    k = table.n_subs
    owner = table.owner
    accu = table.accu
    nfpb = jnp.float32(table.n_frags_per_bins)

    # nnz triplets, padded to a rows-axis multiple; padded vals are 0 and
    # masked out of term1
    u_np = np.asarray(sobs.rows)
    v_np = np.asarray(sobs.cols)
    x_np = np.asarray(sobs.vals, np.float32)
    pad = (-len(u_np)) % n_rows_ax
    u_np = np.pad(u_np, (0, pad))
    v_np = np.pad(v_np, (0, pad))
    x_np = np.pad(x_np, (0, pad))
    shard = NamedSharding(mesh, P("rows"))
    u_s = jax.device_put(jnp.asarray(u_np, jnp.int32), shard)
    v_s = jax.device_put(jnp.asarray(v_np, jnp.int32), shard)
    x_s = jax.device_put(jnp.asarray(x_np, jnp.float32), shard)

    # band chunking: device d owns sorted left-ends [d*chunk, (d+1)*chunk)
    chunk = -(-k // n_rows_ax)
    k_pad = chunk * n_rows_ax + w   # partner slices never run off the end

    def pad_tail(x, fill):
        return jnp.concatenate(
            [x, jnp.full((k_pad - k,), fill, x.dtype)])

    def local_ll(state: GenomeState, params: RippeParams, u, v, x, lo):
        order, mid = genome_sort_order(state, table)
        idc = state.id_c[owner]
        circ = state.circ[owner]
        stot = state.l_cont_bp[owner].astype(jnp.float32) / 1000.0

        # term1: this device's observed-pair shard
        s = jnp.abs(mid[u] - mid[v])
        same = idc[u] == idc[v]
        na = accu[u] * accu[v] / nfpb
        e_obs = expected_contacts(s, same, circ[u] == 1,
                                  stot[u].astype(jnp.float32), na, params)
        term1 = 0.5 * jnp.sum(
            jnp.where(x != 0.0, x * jnp.log(e_obs), 0.0))

        # term2b: banded cis correction over this device's sorted chunk
        mid_s = pad_tail(mid[order], jnp.float32(0.0))
        idc_s = pad_tail(idc[order], jnp.int32(-1))   # -1 != any contig
        circ_s = pad_tail(circ[order], jnp.int32(0))
        stot_s = pad_tail(stot[order], jnp.float32(1.0))
        accu_s = pad_tail(accu[order], jnp.float32(0.0))
        seg = lambda a, off: jax.lax.dynamic_slice(a, (lo + off,), (chunk,))
        mid_l, idc_l = seg(mid_s, 0), seg(idc_s, 0)
        circ_l, stot_l, accu_l = seg(circ_s, 0), seg(stot_s, 0), seg(accu_s, 0)
        gidx = lo + jnp.arange(chunk)

        def body(off, acc):
            mid_r = seg(mid_s, off)
            idc_r = seg(idc_s, off)
            accu_r = seg(accu_s, off)
            valid = (gidx + off < k) & (gidx < k)
            s = jnp.abs(mid_l - mid_r)
            same = (idc_l == idc_r) & valid
            na = accu_l * accu_r / nfpb
            e_cis = expected_contacts(s, same, circ_l == 1, stot_l, na,
                                      params)
            corr = jnp.where(same, e_cis - params.v_inter * na, 0.0)
            return acc + jnp.sum(corr)

        cis_corr = jax.lax.fori_loop(1, w + 1, body, jnp.float32(0.0))
        return term1 - cis_corr

    a_np = np.asarray(accu, np.float64)
    trans_mass = float((a_np.sum() ** 2 - (a_np * a_np).sum()) * 0.5
                       / float(table.n_frags_per_bins))
    const = jnp.float32(sobs.logfact_const)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("chains"), P("chains"), P("rows"), P("rows"), P("rows")),
        out_specs=P("chains"), check_vma=False)
    def sharded(states, params_b, u, v, x):
        lo = jax.lax.axis_index("rows") * chunk
        part = jax.vmap(
            lambda s, p: local_ll(s, p, u, v, x, lo))(states, params_b)
        part = jax.lax.psum(part, "rows")
        return jax.vmap(
            lambda pt, p: pt - p.v_inter * trans_mass + const)(
            part, params_b)

    @jax.jit
    def fn(states, params_b):
        return sharded(states, params_b, u_s, v_s, x_s)

    return fn


def _make_sharded_sparse_anchor_repeats(mesh: Mesh, table: SubFragTable,
                                        sobs, w: int):
    """Copy-expanded twin of :func:`make_sharded_sparse_anchor` — the
    round-4 review's repeat exclusion, lifted. Same decomposition as
    core.sparse._make_sparse_loglik_repeats, sharded over ``rows``:

    - term1 (observed pairs): nnz entries sharded with their static
      c x c copy blocks and per-entry log-factorials (the factorial rides
      the E > 0 indicator — a candidate can deactivate every copy);
    - banded cis correction: sorted left-end chunks per device, with
      same-data-bin pairs excluded;
    - analytic trans mass and same-bin subtraction: state-DEPENDENT with
      repeats (activity), O(K + S) — evaluated on the axis-0 device and
      psum-folded with everything else.
    """
    from graal_tpu.core.delta_repeats import build_copy_table
    from graal_tpu.core.sparse import genome_sort_order, logfact_entries

    n_rows_ax = mesh.shape["rows"]
    ct = build_copy_table(table)
    k = table.n_subs
    s_dim = table.n_data_sub
    owner = table.owner
    accu = table.accu
    data_id = table.data_id
    nfpb = jnp.float32(table.n_frags_per_bins)
    c_max = ct.c_max

    # host: per-entry copy blocks + log-factorials, padded + sharded
    u_np = np.asarray(sobs.rows)
    v_np = np.asarray(sobs.cols)
    x_np = np.asarray(sobs.vals, np.float32)
    lf_np = np.asarray(logfact_entries(x_np), np.float32)
    cs = np.asarray(ct.copy_start)
    cr = np.asarray(ct.copy_rows)
    counts = cs[1:] - cs[:-1]

    def blocks(bins):
        base = cs[bins][:, None] + np.arange(c_max)[None, :]
        rows = cr[np.clip(base, 0, len(cr) - 1)]
        ok = np.arange(c_max)[None, :] < counts[bins][:, None]
        return rows.astype(np.int32), ok

    ur_np, uo_np = blocks(u_np)
    vr_np, vo_np = blocks(v_np)
    pad = (-len(u_np)) % n_rows_ax

    def padshard(x, fill):
        x = np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                   constant_values=fill)
        return jax.device_put(jnp.asarray(x),
                              NamedSharding(mesh, P("rows")))

    ur_s, uo_s = padshard(ur_np, 0), padshard(uo_np, False)
    vr_s, vo_s = padshard(vr_np, 0), padshard(vo_np, False)
    x_s = padshard(x_np, 0.0)
    lf_s = padshard(lf_np, 0.0)

    chunk = -(-k // n_rows_ax)
    k_pad = chunk * n_rows_ax + w

    def pad_tail(x, fill):
        return jnp.concatenate(
            [x, jnp.full((k_pad - k,), fill, x.dtype)])

    bins_all = jnp.arange(s_dim, dtype=jnp.int32)
    b0_all = ct.copy_start[bins_all]
    b_rows_all = ct.copy_rows[jnp.clip(
        b0_all[:, None] + jnp.arange(c_max)[None, :], 0, k - 1)]
    b_ok_all = jnp.arange(c_max)[None, :] \
        < (ct.copy_start[bins_all + 1] - b0_all)[:, None]

    def local_ll(state, params, u_r, u_k, v_r, v_k, x, lf, lo, on_axis0):
        order, mid = genome_sort_order(state, table)
        idc = state.id_c[owner]
        circ = state.circ[owner]
        stot = state.l_cont_bp[owner].astype(jnp.float32) / 1000.0
        a = jnp.where(state.activ[owner] == 1, accu, 0.0)

        # term1: copy-summed observed shard
        s = jnp.abs(mid[u_r][:, :, None] - mid[v_r][:, None, :])
        same = idc[u_r][:, :, None] == idc[v_r][:, None, :]
        na = a[u_r][:, :, None] * a[v_r][:, None, :] / nfpb
        e = expected_contacts(s, same, (circ[u_r] == 1)[:, :, None],
                              stot[u_r][:, :, None], na, params)
        ok = u_k[:, :, None] & v_k[:, None, :]
        e_data = jnp.sum(jnp.where(ok, e, 0.0), axis=(1, 2))
        term = x * jnp.log(jnp.where(e_data > 0.0, e_data, 1.0)) - lf
        term1 = 0.5 * jnp.sum(
            jnp.where((x != 0.0) & (e_data > 0.0), term, 0.0))

        # banded cis correction over this device's sorted chunk,
        # same-data-bin pairs excluded
        mid_s = pad_tail(mid[order], jnp.float32(0.0))
        idc_s = pad_tail(idc[order], jnp.int32(-1))
        circ_s = pad_tail(circ[order], jnp.int32(0))
        stot_s = pad_tail(stot[order], jnp.float32(1.0))
        a_s = pad_tail(a[order], jnp.float32(0.0))
        db_s = pad_tail(data_id[order], jnp.int32(-2))
        seg = lambda arr, off: jax.lax.dynamic_slice(arr, (lo + off,),
                                                     (chunk,))
        mid_l, idc_l = seg(mid_s, 0), seg(idc_s, 0)
        circ_l, stot_l = seg(circ_s, 0), seg(stot_s, 0)
        a_l, db_l = seg(a_s, 0), seg(db_s, 0)
        gidx = lo + jnp.arange(chunk)

        def body(off, acc):
            mid_r = seg(mid_s, off)
            idc_r = seg(idc_s, off)
            a_r = seg(a_s, off)
            db_r = seg(db_s, off)
            valid = (gidx + off < k) & (gidx < k)
            sdist = jnp.abs(mid_l - mid_r)
            same2 = (idc_l == idc_r) & valid & (db_l != db_r)
            na2 = a_l * a_r / nfpb
            e_cis = expected_contacts(sdist, same2, circ_l == 1, stot_l,
                                      na2, params)
            corr = jnp.where(same2, e_cis - params.v_inter * na2, 0.0)
            return acc + jnp.sum(corr)

        cis_corr = jax.lax.fori_loop(1, w + 1, body, jnp.float32(0.0))

        # analytic trans mass minus same-bin pairs (state-dependent with
        # repeats: activity) — folded in on the axis-0 device only
        a_sum = jnp.sum(a)
        a_sq = jnp.sum(a * a)
        b_sums = jnp.sum(jnp.where(b_ok_all, a[b_rows_all], 0.0), axis=1)
        same_bin = (jnp.sum(b_sums * b_sums) - a_sq) * 0.5
        trans_mass = params.v_inter / nfpb * \
            ((a_sum * a_sum - a_sq) * 0.5 - same_bin)
        return term1 - cis_corr - jnp.where(on_axis0, trans_mass, 0.0)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("chains"), P("chains"), P("rows"), P("rows"), P("rows"),
                  P("rows"), P("rows"), P("rows")),
        out_specs=P("chains"), check_vma=False)
    def sharded(states, params_b, u_r, u_k, v_r, v_k, x, lf):
        lo = jax.lax.axis_index("rows") * chunk
        on0 = jax.lax.axis_index("rows") == 0
        part = jax.vmap(
            lambda s, p: local_ll(s, p, u_r, u_k, v_r, v_k, x, lf, lo,
                                  on0))(states, params_b)
        return jax.lax.psum(part, "rows")

    @jax.jit
    def fn(states, params_b):
        return sharded(states, params_b, ur_s, uo_s, vr_s, vo_s, x_s, lf_s)

    return fn


# NOTE: the former make_chain_exchange (broadcast-best across chains) was
# retired in round 5 — parallel.tempering.pt_swap is the one production
# exchange; parallel.tempering.exchange_best covers final consolidation.
