"""End-to-end CLI surface tests (in-process via cli.main).

The commands are the product's front door (the reference's GUI
replacement); every subcommand gets at least one smoke-level run on a
tiny simulated dataset.
"""

import json
import os

import numpy as np
import pytest

from graal_tpu import cli


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "ds")
    assert cli.main(["simulate", d, "--bins", "96", "--contigs", "3",
                     "--seed", "5"]) == 0
    return d


def test_pyramid_and_run_and_replay(ds, tmp_path):
    out = str(tmp_path / "out")
    assert cli.main(["pyramid", ds, "--size", "3"]) == 0
    assert cli.main(["run", ds, "--size", "3", "--level", "1",
                     "--cycles", "3", "--out", out, "--platform", "cpu",
                     "--fasta", os.path.join(ds, "genome.fa"),
                     "--snapshots"]) == 0
    assert os.path.exists(os.path.join(out, "genome.fasta"))
    assert os.path.exists(os.path.join(out, "0list_likelihood.txt"))
    assert os.path.exists(os.path.join(out, "genome_layout.png"))
    log = os.path.join(out, "0list_mutations.txt")
    assert os.path.exists(log)
    assert cli.main(["replay", ds, log, "--size", "3", "--level", "1",
                     "--platform", "cpu"]) == 0


def test_scale_command(ds, tmp_path, capsys):
    out = str(tmp_path / "oscale")
    assert cli.main(["scale", ds, "--size", "3", "--level", "1",
                     "--cycles", "2", "--out", out, "--platform", "cpu",
                     "--f-max-min", "64",
                     "--fasta", os.path.join(ds, "genome.fa")]) == 0
    assert os.path.exists(os.path.join(out, "genome.fasta"))
    assert os.path.exists(os.path.join(out, "0list_likelihood.txt"))
    tail = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    rep = json.loads(tail[-1])
    assert np.isfinite(rep["final_loglik"])


def test_scale_multilevel_command(ds, tmp_path):
    out = str(tmp_path / "oml")
    assert cli.main(["scale", ds, "--size", "3", "--level", "2",
                     "--to-level", "1", "--cycles", "2", "--out", out,
                     "--platform", "cpu", "--f-max-min", "64"]) == 0


def test_probe_command(ds, tmp_path):
    assert cli.main(["probe", ds, "3", "--size", "3", "--level", "1",
                     "--cycles", "1", "--platform", "cpu",
                     "--out", str(tmp_path / "op")]) == 0
