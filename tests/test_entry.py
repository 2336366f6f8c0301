"""Driver entry-point safety net: entry() and dryrun_multichip must keep
working (the round driver compile-checks them)."""

import sys

import jax
import pytest


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, (score, op, fb) = out
    assert state.pos.shape == args[0].pos.shape
    assert bool(jax.numpy.isfinite(score))


@pytest.mark.slow
def test_dryrun_multichip_eight_devices():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) == 8
    dryrun_multichip(8)
