"""Genome-state checkpointing.

The reference has no mid-run checkpointing — only the idempotent pyramid
build and the mutation-log replay (SURVEY.md section 5). The genome state
is 11 int32 arrays + 8 model floats, so real checkpoints are trivial: one
npz per save, atomic rename, resume picks up cycle index, RNG key and
parameters.
"""

from __future__ import annotations

import os

import numpy as np

from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState


def save_checkpoint(path: str, state: GenomeState, params: RippeParams,
                    cycle: int, key, extra: dict | None = None):
    import jax.random

    arrays = {f"state_{f}": np.asarray(getattr(state, f))
              for f in state._fields}
    arrays["params"] = np.asarray([float(x) for x in params], np.float64)
    arrays["cycle"] = np.asarray(cycle, np.int64)
    arrays["key"] = np.asarray(jax.random.key_data(key))
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"   # np.savez appends .npz unless already present
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """-> (state, params, cycle, key, extra)."""
    import jax.numpy as jnp

    with np.load(path) as data:
        state = GenomeState(**{
            f: jnp.asarray(data[f"state_{f}"]) for f in GenomeState._fields})
        p = data["params"]
        params = RippeParams(*[jnp.float32(x) for x in p])
        cycle = int(data["cycle"])
        import jax.random
        key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        extra = {k[len("extra_"):]: data[k] for k in data.files
                 if k.startswith("extra_")}
    return state, params, cycle, key, extra
