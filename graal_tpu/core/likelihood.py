"""Dense Poisson log-likelihood of a genome against the observed contacts.

Key structural insight vs the reference: GRAAL's full-likelihood kernel
(evaluate_likelihood, kernels3.cu:2802-3222) iterates over *bin pairs* and
accumulates a <=3x3 block of expected contacts per pair on the sub-fragment
grid. Summing the Poisson log-pmf of the off-diagonal blocks plus the strict
upper triangle of the diagonal blocks is exactly a sum over *all sub-fragment
pairs (s < t)* of the data grid. The expected count of a pair is a closed
form of each sub-fragment's genomic midpoint, which itself is a closed form
of the owning fragment's (start_bp, ori, circ, l_cont_bp) and the static
sub-fragment geometry. The whole likelihood is therefore one dense,
elementwise-fusable K x K computation with a masked reduction — ideal for
the TPU's VPU and trivially shardable by rows.

Repeat copies: the expected matrix on the data grid is the sum over active
copy pairs (dispatcher loop, kernels3.cu:2895-2929); here that is a
scatter-add from the copy-expanded K x K grid onto the S x S data grid,
skipped when no bin is repeated.
"""

from __future__ import annotations

import jax.numpy as jnp

from graal_tpu.core.model import RippeParams, poisson_loglik, rippe_contacts, rippe_contacts_circ
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


def sub_frag_midpoints(state: GenomeState, table: SubFragTable) -> jnp.ndarray:
    """Genomic midpoint (kb, within-contig) of every copy-expanded sub-frag.

    mid = start_bp(owner)/1000 + (prefix if ori=+1 else suffix) + len/2,
    matching the orientation-aware accumulation of kernels3.cu:2997-3060.
    """
    start_kb = state.start_bp[table.owner].astype(jnp.float32) / 1000.0
    ori = state.ori[table.owner]
    offset = jnp.where(ori == 1, table.prefix_kb, table.suffix_kb)
    return start_kb + offset + table.len_kb * 0.5


def expected_copy_matrix(state: GenomeState, table: SubFragTable,
                         params: RippeParams) -> jnp.ndarray:
    """(K, K) expected contacts between copy-expanded sub-fragment pairs.

    cis via Rippe (circular variant on circular contigs), trans via v_inter,
    both weighted by accu_u * accu_v / n_frags_per_bins
    (kernels3.cu:3062-3078, :3184-3195). Inactive copies contribute zero.
    """
    mid = sub_frag_midpoints(state, table)
    own = table.owner
    id_c = state.id_c[own]
    activ = state.activ[own]
    circ = state.circ[own]
    s_tot = state.l_cont_bp[own].astype(jnp.float32) / 1000.0

    s = jnp.abs(mid[None, :] - mid[:, None])
    same = id_c[:, None] == id_c[None, :]
    act = (activ[:, None] == 1) & (activ[None, :] == 1)
    norm_accu = (table.accu[:, None] * table.accu[None, :]) / table.n_frags_per_bins

    cis_lin = rippe_contacts(s, params)
    cis_circ = rippe_contacts_circ(s, s_tot[:, None], params)
    cis = jnp.where(circ[:, None] == 1, cis_circ, cis_lin)
    e = jnp.where(same, cis, params.v_inter) * norm_accu
    return jnp.where(act, e, 0.0)


def expected_data_matrix(state: GenomeState, table: SubFragTable,
                         params: RippeParams) -> jnp.ndarray:
    """(S, S) expected contacts on the data grid (sum over repeat copies)."""
    e_copy = expected_copy_matrix(state, table, params)
    if not table.has_repeats:
        return e_copy
    s_dim = table.n_data_sub
    return jnp.zeros((s_dim, s_dim), e_copy.dtype).at[
        table.data_id[:, None], table.data_id[None, :]].add(e_copy)


def log_likelihood(state: GenomeState, table: SubFragTable, obs: jnp.ndarray,
                   params: RippeParams, dtype=jnp.float32) -> jnp.ndarray:
    """Total log-likelihood: sum over data pairs s < t of
    log P(obs[s, t] | E[s, t]).

    ``obs`` is the (S, S) symmetric observed matrix with zeroed diagonal
    (cuda_lib_gl.py:156-158). Row partial sums are accumulated in f32 and
    combined in ``dtype`` (pass jnp.float64 with x64 enabled for the exact
    oracle; the reference reduces in f64, kernels3.cu:3212-3220).
    """
    e = expected_data_matrix(state, table, params)
    s_dim = e.shape[0]
    ll = poisson_loglik(e, obs)
    mask = jnp.triu(jnp.ones((s_dim, s_dim), jnp.bool_), k=1)
    row_sums = jnp.sum(jnp.where(mask, ll, 0.0), axis=1)
    return jnp.sum(row_sums.astype(dtype))


def log_likelihood_ref(state: GenomeState, table: SubFragTable, obs,
                       params: RippeParams) -> float:
    """Slow f64 numpy oracle with the reference's exact iteration structure.

    Follows evaluate_likelihood (kernels3.cu:2802-3222) literally: loop over
    bin pairs + diagonal bins, accumulate the 3x3 expected block over active
    copy pairs in f32, then f64 Poisson log-pmf over block cells. Used to
    validate :func:`log_likelihood` in tests.
    """
    import numpy as np
    from graal_tpu.core import model

    s_np = {f: np.asarray(getattr(state, f)) for f in state._fields}
    owner = np.asarray(table.owner)
    data_id = np.asarray(table.data_id)
    len_kb = np.asarray(table.len_kb, np.float64)
    accu = np.asarray(table.accu, np.float64)
    prefix = np.asarray(table.prefix_kb, np.float64)
    suffix = np.asarray(table.suffix_kb, np.float64)
    obs = np.asarray(obs, np.float64)
    p = [float(x) for x in params]
    kuhn, lm, c1, slope, d, d_max, fact, v_inter = p

    def rippe(sv):
        if sv <= 0 or sv >= d_max:
            return max(0.0, v_inter)
        n = sv * lm / kuhn
        val = c1 * sv ** slope * np.exp((d - 2) / (n * n + d)) * fact
        return max(val, v_inter)

    def rippe_circ(sv, s_tot):
        if sv <= 0 or sv >= d_max:
            return max(0.0, v_inter)
        K = lm / kuhn
        n = K * sv * (s_tot - sv) / s_tot
        nmax = K
        norm_lin = rippe(sv)
        norm_circ = kuhn ** -3 * nmax ** slope * np.exp((d - 2) / (nmax ** 2 + d)) * fact
        val = kuhn ** -3 * n ** slope * np.exp((d - 2) / (n * n + d)) * fact
        return max(val * norm_lin / norm_circ, v_inter)

    def logpmf(ex, ob):
        if ex == 0:
            return 0.0
        if ob >= 15:
            return ob * np.log(ex) - ex - (ob * np.log(ob) - ob + np.log(np.sqrt(ob * 2 * np.pi)))
        if ob > 0:
            nn = np.floor(ob)
            if nn < 10:
                f = 1.0
                for c in range(1, int(nn) + 1):
                    f *= c
            else:
                f = nn ** nn * np.exp(-nn) * np.sqrt(2 * np.pi * nn)
            return ob * np.log(ex) - ex - np.log(f)
        return -ex

    mids = np.zeros(len(owner))
    for k in range(len(owner)):
        f = owner[k]
        off = prefix[k] if s_np["ori"][f] == 1 else suffix[k]
        mids[k] = s_np["start_bp"][f] / 1000.0 + off + len_kb[k] / 2.0

    e_data = np.zeros((table.n_data_sub, table.n_data_sub))
    for u in range(len(owner)):
        fu = owner[u]
        if s_np["activ"][fu] != 1:
            continue
        for v in range(len(owner)):
            fv = owner[v]
            if s_np["activ"][fv] != 1:
                continue
            na = accu[u] * accu[v] / table.n_frags_per_bins
            if s_np["id_c"][fu] == s_np["id_c"][fv]:
                sv = abs(mids[u] - mids[v])
                if s_np["circ"][fu] == 1:
                    e = rippe_circ(sv, s_np["l_cont_bp"][fu] / 1000.0) * na
                else:
                    e = rippe(sv) * na
            else:
                e = v_inter * na
            e_data[data_id[u], data_id[v]] += e

    total = 0.0
    for si in range(table.n_data_sub):
        for ti in range(si + 1, table.n_data_sub):
            total += logpmf(e_data[si, ti], obs[si, ti])
    return total
