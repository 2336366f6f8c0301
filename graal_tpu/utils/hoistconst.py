"""Hoist closed-over jax.Array constants as executable arguments.

The engine closes compiled functions over large static device buffers —
sparse observed-contact triplets (up to ~267M entries at 500k-fragment
full coverage), CSR window packs, neighbour tables. By default jax 0.9
lowers closed-over arrays as *embedded HLO constants*: every executable
carries its own copy of the bytes, and on relay-attached TPU backends the
compile RPC payload includes them (observed: HTTP 413 "length limit
exceeded" from the remote compiler at chr1 scale — the compile request
for the 500k sparse anchor exceeded the relay's body limit).

Upstream jax is transitioning to lowering such constants as runtime
arguments (jax_use_simplified_jaxpr_constants,
https://github.com/jax-ml/jax/pull/29679; docs/internals/constants.html);
with it enabled the 500k anchor lowers to a few KB of HLO plus buffers
passed by reference. The flag's default is baked at jax import time in
three places, and the container pre-imports jax before any user code can
set the environment variable, so :func:`enable` re-applies all three
effects in-process:

1. the config value itself (drives mlir.py's per-jaxpr branches),
2. ``core.literalable_types`` gains ``ArrayImpl`` (trace-time: closed-over
   arrays become jaxpr Literals instead of constvars),
3. ``mlir.LoweringParameters.hoist_constants_as_args``'s dataclass default
   (lowering-time: Literal constants become main-function arguments).

Everything is wrapped in try/except: if a future jax renames internals,
the engine still runs — constants just embed again (a payload-size
problem, not a correctness one).
"""

from __future__ import annotations

_applied = False


def enable() -> bool:
    """Idempotently enable constant-as-argument lowering. Returns True when
    active (already-on or successfully patched)."""
    global _applied
    if _applied:
        return True
    try:
        import jax

        if jax.config.jax_use_simplified_jaxpr_constants:
            _applied = True
            return True   # env var was set before jax import
        jax.config.update("jax_use_simplified_jaxpr_constants", True)

        from jax._src import core as _core
        from jax._src.array import ArrayImpl
        _core.literalable_types.add(ArrayImpl)

        from jax._src.interpreters import mlir as _mlir
        init = _mlir.LoweringParameters.__init__
        names = init.__code__.co_varnames[1:init.__code__.co_argcount]
        defaults = list(init.__defaults__)
        ix = list(names)[-len(defaults):].index("hoist_constants_as_args")
        defaults[ix] = True
        init.__defaults__ = tuple(defaults)

        _patch_const_args(_core)
        _applied = True
    except Exception:   # pragma: no cover - jax internals moved
        _applied = False
    return _applied


def _patch_const_args(core_mod):
    """Convert numpy-backed hoisted constants to device arrays.

    Under the transitional flag, jax 0.9 hoists EVERY non-scalar Literal —
    including TypedNdArray wrappers around plain numpy data (produced by
    eager constant folding and by jnp.asarray(<python literal>) inside a
    trace). Those reach pjit dispatch as call arguments and crash on
    ``arg.sharding`` (AttributeError: TypedNdArray has no 'sharding').
    ``core.jaxpr_const_args`` is the single chokepoint every consumer
    (pjit, pxla, shard_map, mlir) fetches hoisted consts through, so the
    conversion happens once here, cached per jaxpr.
    """
    import jax
    import numpy as np

    orig = core_mod.jaxpr_const_args
    # id-stable memo: the SAME original object must always convert to the
    # SAME device array, because every consumer (including the dedup
    # inside core.jaxpr_const_args itself, which recurses through this
    # patched function for sub-jaxprs) relies on object identity to match
    # lowering-time const args with execution-time ones. Keeps a strong
    # ref to the original so its id cannot be recycled — constants are
    # alive through their jaxprs anyway.
    memo: dict[int, tuple] = {}

    def to_array(v):
        if isinstance(v, jax.Array):
            return v
        hit = memo.get(id(v))
        if hit is not None and hit[0] is v:
            return hit[1]
        conv = jax.device_put(np.asarray(getattr(v, "val", v)))
        memo[id(v)] = (v, conv)
        return conv

    def jaxpr_const_args(jaxpr):
        return [(to_array(v), aval) for v, aval in orig(jaxpr)]

    core_mod.jaxpr_const_args = jaxpr_const_args

    # The C++ pjit fastpath mis-replays executables that take hoisted
    # const args (observed: "Execution supplied 34 buffers but compiled
    # program expected 35" on the SECOND call of a compiled cycle). Force
    # those executables through the python dispatch path — correct on
    # every call, and the ~100us python-dispatch overhead is noise next
    # to the multi-ms step calls this engine makes. Executables without
    # const args keep the fast C++ path.
    from jax._src import pjit as pjit_mod

    orig_gfd = pjit_mod._get_fastpath_data

    def _get_fastpath_data(executable, out_tree, args_flat, out_flat,
                           effects, consts_for_constvars, pgle_profiler,
                           const_args):
        if const_args:
            return None
        return orig_gfd(executable, out_tree, args_flat, out_flat,
                        effects, consts_for_constvars, pgle_profiler,
                        const_args)

    pjit_mod._get_fastpath_data = _get_fastpath_data
