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


def test_watch_live_view(tmp_path):
    """--watch writes the headless live view: live.html + live_status.json
    + the layout painting, refreshed per cycle (the GL/wx live surface of
    the reference, redesigned for batch jobs)."""
    import json
    from graal_tpu.cli import main as cli_main
    from graal_tpu.utils.dataset import write_synthetic_dataset

    d = str(tmp_path / "ds")
    write_synthetic_dataset(d, n_bins=60, n_contigs=2, seed=4)
    out = str(tmp_path / "out")
    rc = cli_main(["run", d, "--size", "3", "--level", "1", "--cycles", "2",
                   "--out", out, "--platform", "cpu", "--watch"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "live.html"))
    with open(os.path.join(out, "live_status.json")) as fh:
        status = json.load(fh)
    assert status["stats"]["cycle"] == 1
    assert len(status["likelihood"]) > 1
    assert os.path.exists(os.path.join(out, "layout_latest.png"))
    # 3D particle view payload (the gl_update_pos redesign): one particle
    # per fragment with contig/position targets + chromosome colour
    with open(os.path.join(out, "live_particles.json")) as fh:
        parts = json.load(fh)
    n = len(parts["id_c"])
    assert n > 0 and len(parts["pos"]) == n and len(parts["chrom"]) == n
    page = open(os.path.join(out, "live.html")).read()
    assert "live_particles.json" in page and "canvas" in page


def test_particle_payload_repeat_expansion_and_stride():
    """particle_payload maps chromosome colours through id_d for
    repeat-expanded genomes and strides chr1-scale states down to a
    browser-sized payload."""
    import numpy as np
    from graal_tpu.core.state import GenomeState
    from graal_tpu.utils.live import particle_payload

    n = 50_000
    state = GenomeState.from_soa(dict(
        pos=np.zeros(n), id_c=np.arange(n), start_bp=np.zeros(n),
        len_bp=np.full(n, 4000), circ=np.zeros(n), l_cont=np.ones(n),
        l_cont_bp=np.full(n, 4000), ori=np.ones(n), rep=np.zeros(n),
        activ=np.ones(n), id_d=np.arange(n) % 1000))
    chrom_of_bin = np.arange(1000) % 7        # data-bin indexed (shorter)
    p = particle_payload(state, chrom_of_bin, max_particles=20_000)
    assert len(p["id_c"]) <= 20_000
    assert p["chrom"][0] == int(chrom_of_bin[0])
    assert "active" not in p                  # all active -> omitted
