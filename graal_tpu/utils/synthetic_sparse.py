"""Sparse synthetic problems at chr1 scale (100k-1M bins).

The dense generator (utils.synthetic) materialises the K x K expected
matrix — impossible at chr1 scale. Here contacts are sampled without any
dense grid, exploiting the same structure as the sparse likelihood
(core.sparse):

- cis pairs: every same-contig pair within the genome-order band is drawn
  ``Poisson(e_rippe)`` (offset loop, O(K * w) draws),
- trans + beyond-band mass: one Poisson draw of the *total* remaining
  expectation, scattered over uniformly random pairs (the superposition
  property of Poisson processes; per-pair expectations are uniform
  v_inter * na at accu == 1).

A band pair can additionally receive a uniform-scatter count (probability
~ band_pairs/total_pairs ~ 1e-3 per count) — a negligible data-model
mismatch accepted for benchmark/demo datasets.

Geometry is one sub-fragment per bin (the realistic chr1 configuration:
the sampling level IS the data level at this scale), built fully
vectorised.
"""

from __future__ import annotations

import numpy as np

from graal_tpu.core.model import RippeParams
from graal_tpu.core.sparse import SparseObs, band_width, sparse_from_coo
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


def scale_params(bin_kb: float = 3.0, n_bins: int = 100_000) -> RippeParams:
    """Rippe parameters giving deep-coverage sparse maps: near-diagonal
    expectations ~20 counts (recovery needs this signal depth — at ~5
    counts/pair the T=1 sampler stalls in local optima), trans expectation
    1e-3 per pair."""
    return RippeParams.create(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0,
                              fact=6000.0, d_max=900.0, v_inter=1e-3)


def make_scale_genome(n_bins: int, n_contigs: int, mean_len_bp: int = 3000,
                      seed: int = 0):
    """Ground-truth genome, one sub per bin, vectorised construction."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    sizes = np.full(n_contigs, n_bins // n_contigs)
    sizes[: n_bins - sizes.sum()] += 1
    len_bp = rng.integers(int(mean_len_bp * 0.6), int(mean_len_bp * 1.4),
                          n_bins).astype(np.int64)
    id_c = np.repeat(np.arange(n_contigs), sizes)
    starts_of = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = np.arange(n_bins) - starts_of[id_c]
    cum = np.cumsum(len_bp) - len_bp
    start_bp = cum - cum[starts_of][id_c]
    tot_bp = np.add.reduceat(len_bp, starts_of)
    state = GenomeState.from_soa(dict(
        pos=pos, id_c=id_c, start_bp=start_bp, len_bp=len_bp,
        circ=np.zeros(n_bins), l_cont=sizes[id_c], l_cont_bp=tot_bp[id_c],
        ori=np.ones(n_bins), rep=np.zeros(n_bins), activ=np.ones(n_bins),
        id_d=np.arange(n_bins)))
    table = SubFragTable(
        owner=jnp.arange(n_bins, dtype=jnp.int32),
        data_id=jnp.arange(n_bins, dtype=jnp.int32),
        len_kb=jnp.asarray(len_bp / 1000.0, jnp.float32),
        accu=jnp.ones(n_bins, jnp.float32),
        prefix_kb=jnp.zeros(n_bins, jnp.float32),
        suffix_kb=jnp.zeros(n_bins, jnp.float32),
        n_data_sub=n_bins, n_frags_per_bins=1.0, has_repeats=False)
    return state, table


def _rippe_np(s, p: RippeParams):
    kuhn, lm, c1, slope, d, d_max, fact, v_inter = [float(x) for x in p]
    with np.errstate(all="ignore"):
        n = s * lm / kuhn
        val = c1 * np.power(s, slope) * np.exp((d - 2.0) / (n * n + d)) * fact
    val = np.where((s > 0) & (s < d_max), val, 0.0)
    return np.maximum(val, v_inter)


def thin_coverage(params: RippeParams, coverage: float) -> RippeParams:
    """Scale the model to a lower sequencing coverage: contact
    expectations are linear in (fact, v_inter), so thinning multiplies
    both. Use BEFORE simulate_sparse_contacts and score with the SAME
    thinned params. At chr1 scale full model coverage is unrealistic and
    unwieldy (500k bins at 1.0 -> ~270M symmetric nnz, ~30 GB host;
    0.1 -> ~30M)."""
    import jax.numpy as jnp

    return params._replace(
        fact=jnp.float32(float(params.fact) * coverage),
        v_inter=jnp.float32(float(params.v_inter) * coverage))


def simulate_sparse_contacts(state: GenomeState, table: SubFragTable,
                             params: RippeParams, seed: int = 0) -> SparseObs:
    """Poisson contact map as sparse triplets; O(K * w) work and memory."""
    rng = np.random.default_rng(seed)
    s_np = state.to_numpy()
    owner = np.asarray(table.owner)
    mid = (s_np["start_bp"][owner] / 1000.0
           + np.asarray(table.len_kb, np.float64) * 0.5)
    idc = s_np["id_c"][owner]
    k = len(owner)
    d_max = float(params.d_max)
    v_inter = float(params.v_inter)
    w = band_width(np.asarray(table.len_kb), d_max, margin=1.0)

    rows_acc, cols_acc, vals_acc = [], [], []
    # genome order is construction order (id_c, pos ascending)
    for off in range(1, w + 1):
        u = np.arange(k - off)
        v = u + off
        same = idc[u] == idc[v]
        u, v = u[same], v[same]
        s = np.abs(mid[u] - mid[v])
        e = _rippe_np(s, params)
        cnt = rng.poisson(e)
        nz = cnt > 0
        rows_acc.append(u[nz])
        cols_acc.append(v[nz])
        vals_acc.append(cnt[nz])

    # remaining mass: total pairs minus band same-contig pairs, each v_inter
    total_pairs = k * (k - 1) // 2
    band_pairs = 0
    for off in range(1, w + 1):
        band_pairs += int(np.sum(idc[: k - off] == idc[off:]))
    lam_rest = v_inter * (total_pairs - band_pairs)
    n_rest = rng.poisson(lam_rest)
    if n_rest > 0:
        ru = rng.integers(0, k, n_rest)
        rv = rng.integers(0, k, n_rest)
        keep = ru != rv
        rows_acc.append(np.minimum(ru[keep], rv[keep]))
        cols_acc.append(np.maximum(ru[keep], rv[keep]))
        vals_acc.append(np.ones(int(keep.sum()), np.int64))

    rows = np.concatenate(rows_acc)
    cols = np.concatenate(cols_acc)
    vals = np.concatenate(vals_acc).astype(np.float64)
    return sparse_from_coo(rows, cols, vals, k)


def add_scale_repeats(state: GenomeState, table: SubFragTable, dup_bins):
    """Append repeat copies of ``dup_bins`` as fresh singleton contigs
    (modify_vect_frags semantics, simulation_loader.py:182-256) and rebuild
    the one-sub-per-bin table copy-expanded. Returns (state, table, id_d)."""
    import jax.numpy as jnp

    s = state.to_numpy()
    n = len(s["pos"])
    soa = {k: list(v) for k, v in s.items()}
    max_c = int(s["id_c"].max()) + 1
    for i, b in enumerate(dup_bins):
        soa["pos"].append(0)
        soa["id_c"].append(max_c + i)
        soa["start_bp"].append(0)
        soa["len_bp"].append(int(s["len_bp"][b]))
        soa["circ"].append(0)
        soa["l_cont"].append(1)
        soa["l_cont_bp"].append(int(s["len_bp"][b]))
        soa["ori"].append(1)
        soa["rep"].append(1)
        soa["activ"].append(1)
        soa["id_d"].append(int(b))
    for b in dup_bins:
        soa["rep"][b] = 1
    soa = {k: np.asarray(v) for k, v in soa.items()}
    id_d = soa["id_d"]
    n_frags = len(id_d)
    table2 = SubFragTable(
        owner=jnp.arange(n_frags, dtype=jnp.int32),
        data_id=jnp.asarray(id_d, jnp.int32),
        len_kb=jnp.asarray(np.asarray(table.len_kb)[id_d], jnp.float32),
        accu=jnp.ones(n_frags, jnp.float32),
        prefix_kb=jnp.zeros(n_frags, jnp.float32),
        suffix_kb=jnp.zeros(n_frags, jnp.float32),
        n_data_sub=n, n_frags_per_bins=1.0, has_repeats=True)
    return GenomeState.from_soa(soa), table2, id_d


def shuffle_genome(state: GenomeState, n_pieces: int, seed: int = 0):
    """Scramble the ground truth into ``n_pieces`` random contigs of
    shuffled, randomly oriented chunks — a realistic draft-assembly start
    (harder than explode_genome: chunks keep local order)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = state.n_frags
    len_bp = np.asarray(state.len_bp)
    cuts = np.sort(rng.choice(np.arange(1, n), n_pieces - 1, replace=False))
    bounds = np.concatenate([[0], cuts, [n]])
    chunks = [np.arange(bounds[i], bounds[i + 1])
              for i in range(len(bounds) - 1)]
    order = rng.permutation(len(chunks))
    id_c = np.zeros(n, np.int64)
    pos = np.zeros(n, np.int64)
    start_bp = np.zeros(n, np.int64)
    l_cont = np.zeros(n, np.int64)
    l_cont_bp = np.zeros(n, np.int64)
    ori = np.ones(n, np.int64)
    for new_c, ci in enumerate(order):
        frags = chunks[ci]
        if rng.random() < 0.5:
            frags = frags[::-1]
            ori[frags] = -1
        id_c[frags] = new_c
        pos[frags] = np.arange(len(frags))
        lens = len_bp[frags]
        start_bp[frags] = np.cumsum(lens) - lens
        l_cont[frags] = len(frags)
        l_cont_bp[frags] = lens.sum()
    return state._replace(
        pos=jnp.asarray(pos, jnp.int32), id_c=jnp.asarray(id_c, jnp.int32),
        start_bp=jnp.asarray(start_bp, jnp.int32),
        l_cont=jnp.asarray(l_cont, jnp.int32),
        l_cont_bp=jnp.asarray(l_cont_bp, jnp.int32),
        ori=jnp.asarray(ori, jnp.int32),
        circ=jnp.zeros(n, jnp.int32))
