"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding tests run on simulated CPU devices (the reference
offers no distributed pattern to test against; see SURVEY.md section 4).
Environment must be set before jax is imported anywhere.
"""

import os

# Force CPU: the container pre-imports jax via sitecustomize and pins the
# axon (TPU tunnel) platform, so the env var alone is ignored — the config
# must be updated on the already-imported module before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_random_state(rng, n_frags=24, n_contigs=5, with_circ=False,
                      with_repeats=False):
    """Random valid genome state for property tests."""
    from graal_tpu.core.state import GenomeState

    # random partition of n_frags into n_contigs non-empty contigs
    cuts = np.sort(rng.choice(np.arange(1, n_frags), n_contigs - 1, replace=False))
    sizes = np.diff(np.concatenate([[0], cuts, [n_frags]]))
    perm = rng.permutation(n_frags)
    pos = np.zeros(n_frags, np.int32)
    id_c = np.zeros(n_frags, np.int32)
    start_bp = np.zeros(n_frags, np.int32)
    l_cont = np.zeros(n_frags, np.int32)
    l_cont_bp = np.zeros(n_frags, np.int32)
    circ = np.zeros(n_frags, np.int32)
    len_bp = rng.integers(1000, 20000, n_frags).astype(np.int32)
    k = 0
    for c, size in enumerate(sizes):
        members = perm[k:k + size]
        k += size
        is_circ = 1 if (with_circ and size > 2 and rng.random() < 0.4) else 0
        off = 0
        for p, f in enumerate(members):
            pos[f] = p
            id_c[f] = c + 1
            start_bp[f] = off
            off += len_bp[f]
            circ[f] = is_circ
        l_cont[members] = size
        l_cont_bp[members] = off
    ori = rng.choice([-1, 1], n_frags).astype(np.int32)
    rep = np.zeros(n_frags, np.int32)
    activ = np.ones(n_frags, np.int32)
    id_d = np.arange(n_frags, dtype=np.int32)
    return GenomeState.from_soa(dict(
        pos=pos, id_c=id_c, start_bp=start_bp, len_bp=len_bp, circ=circ,
        l_cont=l_cont, l_cont_bp=l_cont_bp, ori=ori, rep=rep, activ=activ,
        id_d=id_d))
