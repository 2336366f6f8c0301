"""Multilevel projection and coarse-to-fine assembly tests."""

import numpy as np
import pytest

from graal_tpu.config import RunConfig
from graal_tpu.core.state import GenomeState, check_invariants
from graal_tpu.multilevel import project_state_to_sub, run_multilevel
from graal_tpu.utils.dataset import write_synthetic_dataset
from tests.test_ops import linear_state, contig_order
from graal_tpu.core import ops


def test_projection_identity_order():
    """Two bins of 2 subs each in one contig project to 4 subs in order."""
    state = linear_state([2], len_bp=[600, 900])
    bin_to_subs = np.array([[0, 1], [2, 3]])
    sub_len = np.array([300, 300, 400, 500])
    soa = project_state_to_sub(state, bin_to_subs, sub_len)
    sub = GenomeState.from_soa(soa)
    check_invariants(sub)
    assert contig_order(sub, 0) == [0, 1, 2, 3]
    assert list(np.asarray(sub.ori)) == [1, 1, 1, 1]
    assert list(np.asarray(sub.start_bp)) == [0, 300, 600, 1000]


def test_projection_reversed_bin():
    """A bin with ori=-1 contributes its subs reversed and flipped."""
    state = ops.flip(linear_state([2], len_bp=[600, 900]), 1)
    bin_to_subs = np.array([[0, 1], [2, 3]])
    sub_len = np.array([300, 300, 400, 500])
    soa = project_state_to_sub(state, bin_to_subs, sub_len)
    sub = GenomeState.from_soa(soa)
    check_invariants(sub)
    assert contig_order(sub, 0) == [0, 1, 3, 2]
    assert list(np.asarray(sub.ori)) == [1, 1, -1, -1]


def test_projection_reordered_contigs():
    """Bin order/partition of the coarse genome carries to the sub level."""
    state = linear_state([2, 1], len_bp=[500, 500, 700])
    # move bin 2 between bins 0 and 1: pop_in_3(popped 2, right of 0)
    s2 = ops.pop_in_3(state, 2, 0, 1, 1)
    bin_to_subs = np.array([[0, 0], [1, 2], [3, 4]])
    sub_len = np.array([500, 250, 250, 350, 350])
    soa = project_state_to_sub(s2, bin_to_subs, sub_len)
    sub = GenomeState.from_soa(soa)
    check_invariants(sub)
    assert contig_order(sub, 0) == [0, 3, 4, 1, 2]


def test_run_multilevel(tmp_path):
    d = str(tmp_path / "ds")
    write_synthetic_dataset(d, n_bins=90, n_contigs=3, contacts_scale=40.0,
                            seed=6)
    cfg = RunConfig()
    cfg.dataset_dir = d
    cfg.output_dir = str(tmp_path / "out")
    cfg.platform = "cpu"
    cfg.pyramid.size = 3
    cfg.sampler.n_cycles = 3
    cfg.sampler.sample_param = False
    runner, assembly = run_multilevel(cfg, from_level=2, to_level=1,
                                      progress=False)
    check_invariants(assembly.state)
    # final state is at level 1
    assert assembly.state.n_frags == runner.pyramid.get_level(1).n_frags
    # the warm start + refinement must end near the true structure
    lls = assembly.metrics["likelihood"]
    assert lls[-1] > lls[0] - 1e-6
