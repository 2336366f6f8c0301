"""Tests for the Rippe contact model and Poisson log-pmf."""

import math

import numpy as np
import jax.numpy as jnp

from graal_tpu.core import model
from graal_tpu.core.model import RippeParams


def make_params(**kw):
    defaults = dict(kuhn=1.0, lm=9.6, slope=-1.5, d=3.0, fact=100.0,
                    d_max=800.0, v_inter=0.05)
    defaults.update(kw)
    return RippeParams.create(**defaults)


class TestRippe:
    def test_matches_closed_form(self):
        p = make_params()
        s = np.array([1.0, 10.0, 100.0, 500.0], np.float32)
        got = np.asarray(model.rippe_contacts(s, p))
        n = s * 9.6 / 1.0
        want = (0.53 * (9.6 / 1.0) ** -1.5 * 1.0 ** -3 * s ** -1.5
                * np.exp((3 - 2) / (n ** 2 + 3)) * 100.0)
        want = np.maximum(want, 0.05)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_out_of_range_clamps_to_v_inter(self):
        p = make_params()
        s = np.array([0.0, -5.0, 800.0, 1e6], np.float32)
        got = np.asarray(model.rippe_contacts(s, p))
        np.testing.assert_allclose(got, 0.05, rtol=1e-6)

    def test_circular_matches_closed_form(self):
        # Literal transcription of kernels3.cu:135-166.
        p = make_params()
        s, s_tot = 30.0, 500.0
        K = 9.6 / 1.0
        n = K * s * (s_tot - s) / s_tot
        nmax = K
        d = 3.0
        norm_lin = float(model.rippe_contacts(np.float32(s), p))
        norm_circ = 1.0 ** -3 * nmax ** -1.5 * np.exp((d - 2) / (nmax ** 2 + d)) * 100.0
        val = 1.0 ** -3 * n ** -1.5 * np.exp((d - 2) / (n * n + d)) * 100.0
        want = max(val * norm_lin / norm_circ, 0.05)
        got = float(model.rippe_contacts_circ(jnp.float32(s), jnp.float32(s_tot), p))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_circular_symmetry(self):
        # distance s and s_tot - s are equivalent on a circle
        p = make_params(d_max=1e6)
        s_tot = 200.0
        a = float(model.rippe_contacts_circ(jnp.float32(30.0), jnp.float32(s_tot), p))
        b = float(model.rippe_contacts_circ(jnp.float32(s_tot - 30.0), jnp.float32(s_tot), p))
        assert abs(a - b) / a < 1e-5


class TestPoissonLoglik:
    def test_zero_expected_is_zero(self):
        assert float(model.poisson_loglik(0.0, 5.0)) == 0.0

    def test_zero_observed(self):
        assert np.isclose(float(model.poisson_loglik(2.5, 0.0)), -2.5)

    def test_small_ob_exact_factorial(self):
        # ob in (0, 10): exact log Poisson pmf
        for ob in [1.0, 3.0, 9.0]:
            ex = 4.2
            want = ob * math.log(ex) - ex - math.lgamma(ob + 1)
            got = float(model.poisson_loglik(ex, ob))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_mid_ob_stirling_factorial(self):
        # ob in [10, 15): Stirling approx of the factorial (kernels3.cu:89-91)
        ob, ex = 12.0, 10.0
        stirling_fact = ob ** ob * math.exp(-ob) * math.sqrt(2 * math.pi * ob)
        want = ob * math.log(ex) - ex - math.log(stirling_fact)
        got = float(model.poisson_loglik(ex, ob))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_large_ob_stirling_expansion(self):
        ob, ex = 40.0, 35.0
        want = ob * math.log(ex) - ex - (ob * math.log(ob) - ob
                                         + math.log(math.sqrt(ob * 2 * math.pi)))
        got = float(model.poisson_loglik(ex, ob))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_vectorised_no_nan(self):
        ex = jnp.asarray([[0.0, 1.0], [5.0, 0.01]], jnp.float32)
        ob = jnp.asarray([[3.0, 0.0], [20.0, 14.9]], jnp.float32)
        out = np.asarray(model.poisson_loglik(ex, ob))
        assert np.all(np.isfinite(out))


class TestFit:
    def test_estimate_recovers_curve(self):
        # Generate a clean curve from known params and re-fit.
        true = [1.0, 9.6, -1.3, 3.0, 250.0]
        bins = np.arange(3.0, 200.0, 3.0)
        y = model.peval(bins, true)
        fit, y_est = model.estimate_param_rippe(y, bins)
        got = model.peval(bins, fit)
        np.testing.assert_allclose(got, y, rtol=0.05)

    def test_max_dist_intra_is_crossover(self):
        p = [1.0, 9.6, -1.5, 3.0, 250.0]
        v_inter = 0.05
        d_max = model.estimate_max_dist_intra(p, v_inter)
        np.testing.assert_allclose(model.peval(d_max, p), v_inter, rtol=1e-4)

    def test_bin_cis_contacts(self):
        # two contigs of 3 frags, constant matrix
        id_c = np.array([0, 0, 0, 1, 1, 1])
        len_bp = np.full(6, 3000)
        start = np.array([0, 3000, 6000, 0, 3000, 6000])
        pos = np.array([0, 1, 2, 0, 1, 2])
        mat = np.full((6, 6), 7.0)
        bins, mean = model.bin_cis_contacts(mat, id_c, start, len_bp, pos,
                                            max_dist_kb=12.0, size_bin_kb=3.0)
        # adjacent pairs: d = 3 kb -> bin 1 (floor(3/3)=1); skip pairs d=6 kb
        assert mean[1] == 7.0
        assert mean[2] == 7.0
        assert mean[0] == 1e-10  # empty bin


class TestSparseFit:
    """COO-based fit path (chr1 scale): must agree with the dense fit."""

    def _problem(self, seed=5, n=120):
        rng = np.random.default_rng(seed)
        id_c = np.repeat(np.arange(4), n // 4)
        len_bp = rng.integers(2000, 5000, n)
        start = np.zeros(n, np.int64)
        pos = np.zeros(n, np.int64)
        for c in range(4):
            sel = id_c == c
            ls = len_bp[sel]
            start[sel] = np.cumsum(ls) - ls
            pos[sel] = np.arange(sel.sum())
        mat = rng.poisson(1.2, (n, n)).astype(np.float64)
        mat = np.triu(mat, 1)
        mat = mat + mat.T
        soa = dict(id_c=id_c, start_bp=start, len_bp=len_bp, pos=pos)
        return soa, mat

    def test_bin_cis_contacts_coo_matches_dense(self):
        soa, mat = self._problem()
        iu, ju = np.nonzero(np.triu(mat, 1))
        bins_d, mean_d = model.bin_cis_contacts(
            mat, soa["id_c"], soa["start_bp"], soa["len_bp"], soa["pos"],
            max_dist_kb=50.0, size_bin_kb=3.5)
        bins_s, mean_s = model.bin_cis_contacts_coo(
            iu, ju, mat[iu, ju], soa["id_c"], soa["start_bp"],
            soa["len_bp"], soa["pos"], max_dist_kb=50.0, size_bin_kb=3.5)
        np.testing.assert_allclose(bins_s, bins_d)
        np.testing.assert_allclose(mean_s, mean_d, rtol=1e-9)

    def test_bin_cis_contacts_coo_symmetric_input(self):
        soa, mat = self._problem(seed=7)
        iu, ju = np.nonzero(mat)   # both orientations
        _, mean_d = model.bin_cis_contacts(
            mat, soa["id_c"], soa["start_bp"], soa["len_bp"], soa["pos"],
            max_dist_kb=40.0, size_bin_kb=4.0)
        _, mean_s = model.bin_cis_contacts_coo(
            iu, ju, mat[iu, ju], soa["id_c"], soa["start_bp"],
            soa["len_bp"], soa["pos"], max_dist_kb=40.0, size_bin_kb=4.0)
        np.testing.assert_allclose(mean_s, mean_d, rtol=1e-9)

    def test_fit_rippe_from_coo_matches_dense(self):
        soa, mat = self._problem(seed=11)
        iu, ju = np.nonzero(np.triu(mat, 1))
        chrom = soa["id_c"]
        v_d = float(mat[chrom[:, None] != chrom[None, :]].mean())
        v_s = model.mean_value_trans_from_coo(iu, ju, mat[iu, ju], chrom)
        np.testing.assert_allclose(v_s, v_d, rtol=1e-9)
        p_d, _, md, _ = model.fit_rippe_from_matrix(mat, soa, v_d, 60.0, 3.0)
        p_s, _, ms, _ = model.fit_rippe_from_coo(iu, ju, mat[iu, ju], soa,
                                                 v_s, 60.0, 3.0)
        np.testing.assert_allclose(ms, md, rtol=1e-9)
        for f in p_d._fields:
            np.testing.assert_allclose(float(getattr(p_s, f)),
                                       float(getattr(p_d, f)), rtol=1e-5)
