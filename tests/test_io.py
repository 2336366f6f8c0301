"""IO layer tests: formats, native parser, pyramid build, FASTA export."""

import os

import numpy as np
import pytest

from graal_tpu.io import fasta, formats, native_io
from graal_tpu.io import pyramid as pyr
from graal_tpu.utils.dataset import write_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    info = write_synthetic_dataset(str(d), n_bins=60, n_contigs=3,
                                   contacts_scale=30.0, seed=1)
    return str(d), info


class TestFormats:
    def test_pairs_to_coo_roundtrip(self, dataset, tmp_path):
        d, info = dataset
        pairs = os.path.join(d, "abs_fragments_contacts_weighted.txt")
        rows, cols, counts = formats.raw_pairs_to_coo(pairs)
        assert counts.sum() == info["n_contact_pairs"]
        assert np.all(rows <= cols)
        coo = str(tmp_path / "coo.txt")
        formats.write_coo(coo, rows, cols, counts)
        r2, c2, v2 = formats.read_coo(coo)
        np.testing.assert_array_equal(r2, rows)
        np.testing.assert_array_equal(v2, counts)

    def test_fragments_list_roundtrip(self, dataset, tmp_path):
        d, _ = dataset
        t = formats.read_fragments_list(os.path.join(d, "fragments_list.txt"))
        out = str(tmp_path / "frags.txt")
        formats.write_fragments_list(out, t, with_sub=True)
        t2 = formats.read_fragments_list(out)
        np.testing.assert_array_equal(t2.start_pos, t.start_pos)
        np.testing.assert_array_equal(t2.accu_frag, t.accu_frag)
        assert t2.chrom == t.chrom

    def test_remap_coo_aggregates(self):
        rows = np.array([0, 1, 2, 3])
        cols = np.array([1, 2, 3, 4])
        counts = np.array([5, 7, 11, 13])
        old_to_new = np.array([0, 0, 1, 1, -1])  # frag 4 destroyed
        r, c, v = formats.remap_coo(rows, cols, counts, old_to_new, 2)
        # (0,1)->（0,0), (1,2)->(0,1), (2,3)->(1,1), (3,4) destroyed
        got = {(int(a), int(b)): int(x) for a, b, x in zip(r, c, v)}
        assert got == {(0, 0): 5, (0, 1): 7, (1, 1): 11}


class TestNative:
    def test_native_matches_numpy(self, dataset):
        d, _ = dataset
        pairs = os.path.join(d, "abs_fragments_contacts_weighted.txt")
        want = formats.raw_pairs_to_coo(pairs)
        lib = native_io.get_lib()
        if lib is None:
            pytest.skip("native toolchain unavailable")
        got = native_io._run_native(pairs, one_based=True, weighted=False)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_native_weighted_coo(self, dataset, tmp_path):
        d, _ = dataset
        pairs = os.path.join(d, "abs_fragments_contacts_weighted.txt")
        rows, cols, counts = formats.raw_pairs_to_coo(pairs)
        coo = str(tmp_path / "coo.txt")
        formats.write_coo(coo, rows, cols, counts)
        if native_io.get_lib() is None:
            pytest.skip("native toolchain unavailable")
        r, c, v = native_io.read_coo(coo)
        np.testing.assert_array_equal(r, rows)
        np.testing.assert_array_equal(c, cols)
        np.testing.assert_array_equal(v, counts)

    def test_native_malformed_raises(self, tmp_path):
        if native_io.get_lib() is None:
            pytest.skip("native toolchain unavailable")
        bad = str(tmp_path / "bad.txt")
        with open(bad, "w") as fh:
            fh.write("header\n1\t2\n3\tnope\n")
        with pytest.raises(ValueError):
            native_io.raw_pairs_to_coo(bad)


class TestPyramid:
    def test_build_and_reload(self, dataset):
        d, _ = dataset
        p = pyr.build_and_filter(d, size_pyramid=3, factor=3)
        n0 = p.get_level(0).n_frags
        n1 = p.get_level(1).n_frags
        assert n0 > n1 >= n0 // 3
        # symmetric contacts preserved through binning
        assert p.get_level(1).dense_matrix().sum() <= \
            p.get_level(0).dense_matrix().sum()
        # reload is idempotent
        p2 = pyr.build_and_filter(d, size_pyramid=3, factor=3)
        assert p2.get_level(1).n_frags == n1

    def test_genome_soa_consistency(self, dataset):
        from graal_tpu.core.state import GenomeState, check_invariants

        d, _ = dataset
        p = pyr.build_and_filter(d, size_pyramid=3, factor=3)
        for lv in (0, 1, 2):
            state = GenomeState.from_soa(p.get_level(lv).genome_soa())
            check_invariants(state)

    def test_sub_ranges_cover_sub_level(self, dataset):
        d, _ = dataset
        p = pyr.build_and_filter(d, size_pyramid=3, factor=3)
        ranges = p.sub_ranges(1)
        n_sub = p.get_level(0).n_frags
        covered = np.zeros(n_sub, bool)
        for lo, hi in ranges:
            assert 0 <= lo <= hi < n_sub
            covered[lo:hi + 1] = True
        assert covered.all()


class TestFasta:
    def test_reverse_complement(self):
        assert fasta.reverse_complement("ACGT") == "ACGT"
        assert fasta.reverse_complement("AAGC") == "GCTT"
        assert fasta.reverse_complement("acgta") == "tacgt"

    def test_load_write_roundtrip(self, tmp_path):
        seqs = {"a": "ACGT" * 50, "b": "GGCC" * 33}
        path = str(tmp_path / "x.fa")
        fasta.write_fasta(path, seqs)
        got = fasta.load_fasta(path)
        assert got == seqs


def test_assembly_stats_n50():
    """Standard scaffold statistics (N50/L50/N90/L90 with the >= cumulative
    convention)."""
    from graal_tpu.io.fasta import assembly_stats

    s = assembly_stats([100, 200, 300, 400])
    assert s == {"n_contigs": 4, "total_bp": 1000, "largest_bp": 400,
                 "mean_bp": 250.0, "N50_bp": 300, "L50": 2,
                 "N90_bp": 200, "L90": 3}
    assert assembly_stats([])["n_contigs"] == 0
    one = assembly_stats([5000])
    assert one["N50_bp"] == 5000 and one["L50"] == 1
