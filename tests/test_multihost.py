"""Multi-host (multi-process) execution of the sharded likelihood.

docs/MULTIHOST.md records the N-host launch recipe; this test executes it
for real with TWO controller processes on CPU (4 virtual devices each,
jax.distributed + Gloo collectives): an 8-device (2 chains x 4 rows)
global mesh whose ``chains`` axis spans the two processes, exactly the
BASELINE multi-host layout scaled down. Each process evaluates the
row-sharded likelihood (psum over ``rows``) and checks it against its own
local dense evaluation — crossing process boundaries must not change the
number.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from graal_tpu.core import likelihood
    from graal_tpu.parallel import make_mesh, sharded_log_likelihood
    from graal_tpu.utils.synthetic import (default_params, make_genome,
                                           simulate_contacts)

    state, table = make_genome(n_bins=36, n_contigs=4, subs_per_bin=3,
                               seed=11)
    params = default_params(fact=4000.0)
    obs = simulate_contacts(state, table, params, seed=11)

    mesh = make_mesh(n_chains=2, n_rows=4)   # chains axis spans processes
    got = float(sharded_log_likelihood(mesh, table, obs)(state, params))
    want = float(likelihood.log_likelihood(state, table, obs, params))
    assert abs(got - want) < max(1.0, 1e-4 * abs(want)), (got, want)
    print(f"MULTIHOST_OK {pid} {got:.3f}", flush=True)
""")


def test_two_process_sharded_likelihood(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    with socket.socket() as s:          # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(port),
                               str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-3000:]
    # both controllers must agree on the psum-reduced scalar
    v0 = [l for l in outs[0].splitlines() if "MULTIHOST_OK" in l][0].split()[-1]
    v1 = [l for l in outs[1].splitlines() if "MULTIHOST_OK" in l][0].split()[-1]
    assert v0 == v1, (v0, v1)
