"""Alternative contact model: 3-segment broken power law.

The reference defines this model (optim_hic_curve.py: segments
A s^alpha0 / s^alpha1 / s^alpha2 with continuity at d0 and d1, plus the
host-side fit) and selects it with ``use_rippe=False`` — but its device
kernel file ``kernels4.cu`` does not exist in the repo
(cuda_lib_gl.py:376), so the path never ran. Here the model is complete:
device-side curve, fit, crossover solve, and a likelihood scorer pluggable
into the EM sampler (no circular-contig variant — the reference defines
none; circular contigs fall back to the linear curve).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graal_tpu.core.model import poisson_loglik
from graal_tpu.core.state import GenomeState
from graal_tpu.core.subfrags import SubFragTable


class HiCParams(NamedTuple):
    """param_simu_exp layout (cuda_lib_gl.py:139-142)."""

    d0: jnp.ndarray
    d1: jnp.ndarray
    d_max: jnp.ndarray
    alpha_0: jnp.ndarray
    alpha_1: jnp.ndarray
    alpha_2: jnp.ndarray
    fact: jnp.ndarray       # A
    v_inter: jnp.ndarray

    @staticmethod
    def create(d0, d1, alpha_0, alpha_1, alpha_2, fact, d_max, v_inter):
        return HiCParams(*[jnp.float32(x) for x in
                           (d0, d1, d_max, alpha_0, alpha_1, alpha_2, fact,
                            v_inter)])

    @property
    def slope(self):
        # metric-series adapter: the mid-range exponent plays the role of
        # the Rippe slope in the logged series
        return self.alpha_1


def hic_contacts(s, p: HiCParams):
    """Expected cis contacts: piecewise power law continuous at d0 and d1
    (optim_hic_curve.py:64-88), gated to (0, d_max), clamped by v_inter."""
    s = jnp.asarray(s, jnp.float32)
    safe = jnp.maximum(s, 1e-9)
    lim0 = p.fact * jnp.power(p.d0, p.alpha_0 - p.alpha_1)
    lim1 = lim0 * jnp.power(p.d1, p.alpha_1 - p.alpha_2)
    seg0 = p.fact * jnp.power(safe, p.alpha_0)
    seg1 = lim0 * jnp.power(safe, p.alpha_1)
    seg2 = lim1 * jnp.power(safe, p.alpha_2)
    val = jnp.where(s <= p.d0, seg0, jnp.where(s <= p.d1, seg1, seg2))
    in_range = (s > 0.0) & (s < p.d_max)
    return jnp.maximum(jnp.where(in_range, val, 0.0), p.v_inter)


def peval(x, param):
    """Host curve for fit params [d0, d1, a0, a1, a2, A]
    (optim_hic_curve.py:64-88)."""
    d0, d1, a0, a1, a2, A = param
    x = np.asarray(x, np.float64)
    lim0 = A * np.power(d0, a0 - a1)
    lim1 = lim0 * np.power(d1, a1 - a2)
    out = np.where(x <= d0, A * np.power(np.maximum(x, 1e-12), a0),
                   np.where(x <= d1, lim0 * np.power(x, a1),
                            lim1 * np.power(x, a2)))
    return np.where(x <= 0, 0.0, out)


def estimate_param_hic(y_meas, x_bins):
    """leastsq fit of the log curve (optim_hic_curve.py:91-108): init
    d0=20, d1=300, slopes -1.5, A = max(y) x0^1.5."""
    import warnings

    from scipy.optimize import leastsq

    y_meas = np.asarray(y_meas, np.float64)
    x_bins = np.asarray(x_bins, np.float64)
    x0 = x_bins.min()
    a0 = -1.5
    p0 = [20.0, 300.0, a0, -1.5, -1.5, float(np.max(y_meas) * x0 ** (-a0))]

    def log_residuals(p, y, x):
        d0, d1, al0, al1, al2, A = p
        with np.errstate(all="ignore"):
            lv = np.log(peval(x, p))
        lv = np.where(np.isfinite(lv), lv, -1e15)
        return y - lv

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        plsq = leastsq(log_residuals, p0, args=(np.log(y_meas), x_bins))
    fit = list(plsq[0])
    if np.any(np.isnan(fit)):
        fit = p0
    y_estim = peval(x_bins, fit)
    return fit, y_estim


def estimate_max_dist_intra(p, val_inter):
    """Crossover solve from s0 = d1 (optim_hic_curve.py:137-147), hardened
    with bisection like the Rippe version."""
    import math
    import warnings

    from scipy.optimize import fsolve

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        x = float(fsolve(lambda s: val_inter - peval(s, p), p[1])[0])
    if np.isfinite(x) and x > 0 and abs(peval(x, p) - val_inter) <= 1e-3 * abs(val_inter):
        return x
    lo, hi = 1e-2, 1e7
    if peval(lo, p) < val_inter or peval(hi, p) > val_inter:
        return x
    for _ in range(200):
        mid = math.sqrt(lo * hi)
        if peval(mid, p) > val_inter:
            lo = mid
        else:
            hi = mid
    return math.sqrt(lo * hi)


def fit_hic_from_matrix(hic_matrix, sub_frags, mean_value_trans,
                        max_dist_kb, size_bin_kb) -> HiCParams:
    """Full estimation pipeline for the broken-power-law model
    (estimate_parameters_rv, cuda_lib_gl.py:1296-1352)."""
    from graal_tpu.core.model import bin_cis_contacts

    bins, mean_contacts = bin_cis_contacts(
        hic_matrix, sub_frags["id_c"], sub_frags["start_bp"],
        sub_frags["len_bp"], sub_frags["pos"], max_dist_kb, size_bin_kb)
    fit, _ = estimate_param_hic(mean_contacts, bins)
    d_max = estimate_max_dist_intra(fit, mean_value_trans)
    d0, d1, a0, a1, a2, A = fit
    return HiCParams.create(d0=d0, d1=d1, alpha_0=a0, alpha_1=a1, alpha_2=a2,
                            fact=A, d_max=d_max, v_inter=mean_value_trans)


def log_likelihood_hic(state: GenomeState, table: SubFragTable, obs,
                       params: HiCParams):
    """Dense pair-grid likelihood under the broken-power-law model (same
    structure as core.likelihood.log_likelihood; no repeats support)."""
    assert not table.has_repeats
    start_kb = state.start_bp[table.owner].astype(jnp.float32) / 1000.0
    ori = state.ori[table.owner]
    mid = start_kb + jnp.where(ori == 1, table.prefix_kb, table.suffix_kb) \
        + table.len_kb * 0.5
    idc = state.id_c[table.owner]
    act = state.activ[table.owner]

    s = jnp.abs(mid[:, None] - mid[None, :])
    same = idc[:, None] == idc[None, :]
    active = (act[:, None] == 1) & (act[None, :] == 1)
    norm_accu = (table.accu[:, None] * table.accu[None, :]) / table.n_frags_per_bins
    e = jnp.where(same, hic_contacts(s, params), params.v_inter) * norm_accu
    e = jnp.where(active, e, 0.0)
    ll = poisson_loglik(e, jnp.asarray(obs, jnp.float32))
    k = e.shape[0]
    mask = jnp.triu(jnp.ones((k, k), jnp.bool_), k=1)
    return jnp.sum(jnp.where(mask, ll, 0.0))


def make_hic_scorer(table: SubFragTable, obs):
    """Batched scorer pluggable into mcmc.make_em_step / make_em_cycle."""
    obs_j = jnp.asarray(obs, jnp.float32)

    def score(states_batch: GenomeState, params: HiCParams):
        return jax.vmap(
            lambda st: log_likelihood_hic(st, table, obs_j, params))(states_batch)

    return score
