"""Execute the reference's pure-Python preprocessing under Python 3.

The upstream code is Python 2.7; for parity testing we load selected
modules from /root/reference through a minimal, mechanical source
transform (print statements, xrange, has_key, dict-view sorting, h5py
open modes). Nothing is copied into the product tree — the reference is
read at test time and the tests skip when it is absent.
"""

from __future__ import annotations

import os
import re
import sys
import types

REF_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REF_DIR)


def _split_comment(code: str):
    """Split a source line into (code, comment) respecting string quotes."""
    quote = None
    for i, ch in enumerate(code):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "#":
            return code[:i].rstrip(), code[i:]
    return code.rstrip(), ""


def _py2_to_py3(src: str) -> str:
    out = []
    for line in src.split("\n"):
        m = re.match(r"^(\s*)print(?:\s+|(?=[\"']))(.+)$", line)
        if m and not m.group(2).startswith("("):
            body, comment = _split_comment(m.group(2))
            line = f"{m.group(1)}print({body})  {comment}".rstrip()
        m = re.match(r"^(\s*)print\s*$", line)
        if m:
            line = f"{m.group(1)}print()"
        out.append(line)
    src = "\n".join(out)
    src = src.replace("xrange", "range")
    src = src.replace(".iteritems()", ".items()")
    src = re.sub(r"(\w+)\.has_key\(([^)]*)\)", r"(\2 in \1)", src)
    # "keys = d.keys(); keys.sort()" -> sortable list
    src = re.sub(r"^(\s*)(\w+)\.sort\(\)\s*$", r"\1\2 = sorted(\2)", src,
                 flags=re.M)
    src = re.sub(r"= (\w+(?:\[\w+\])?)\.keys\(\)\s*$", r"= list(\1.keys())",
                 src, flags=re.M)
    # h5py >= 3 defaults File() to read-only; the reference relied on 'a'
    src = re.sub(r"h5py\.File\(([^(),]+)\)", r'h5py.File(\1, "a")', src)
    src = src.replace("string.maketrans", "str.maketrans")
    src = re.sub(r"except\s+([\w.]+)\s*,\s*(\w+)\s*:", r"except \1 as \2:",
                 src)
    # modern-library compat (not py2 syntax): h5py returns length-1 arrays
    # where 2012-era scipy accepted them as shapes
    src = src.replace("nfrags = level['nfrags'][0]",
                      "nfrags = int(np.ravel(level['nfrags'][:])[0])")
    return src


_cache: dict[str, types.ModuleType] = {}


def load_reference_module(name: str) -> types.ModuleType:
    """Load /root/reference/<name>.py under the py3 transform, with the
    reference directory first on sys.path for its intra-repo imports."""
    if name in _cache:
        return _cache[name]
    path = os.path.join(REF_DIR, name + ".py")
    with open(path) as fh:
        src = _py2_to_py3(fh.read())
    mod = types.ModuleType(f"refpy_{name}")
    mod.__file__ = path
    sys.path.insert(0, REF_DIR)
    # pre-load intra-repo dependencies through the same transform
    try:
        # pure-UI progress bar: stub (its py2 int-division arithmetic is
        # cosmetic and breaks under py3)
        if "progressbar" not in sys.modules:
            pb = types.ModuleType("progressbar")

            class _NullBar:
                def __init__(self, *a, **k):
                    pass

                def render(self, *a, **k):
                    pass

            pb.ProgressBar = _NullBar
            sys.modules["progressbar"] = pb
        for dep in ("fragment", "leastsqbound"):
            dep_path = os.path.join(REF_DIR, dep + ".py")
            if dep != name and os.path.exists(dep_path) \
                    and dep not in sys.modules:
                with open(dep_path) as fh:
                    dep_src = _py2_to_py3(fh.read())
                dep_mod = types.ModuleType(dep)
                dep_mod.__file__ = dep_path
                sys.modules[dep] = dep_mod   # before exec: self-lookups
                exec(compile(dep_src, dep_path, "exec"), dep_mod.__dict__)
        code = compile(src, path, "exec")
        exec(code, mod.__dict__)
    finally:
        sys.path.remove(REF_DIR)
    _cache[name] = mod
    return mod
