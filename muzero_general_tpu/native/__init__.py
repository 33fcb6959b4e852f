"""Native (C++) runtime components, built on demand with the system g++.

`get_replay_native()` returns the compiled extension module or None (the
pure-numpy path in replay.py is the behavioral reference; the native
assembler must match it bit-for-bit — tests/test_native.py enforces this).
"""

import importlib.util
import pathlib
import subprocess
import sys
import sysconfig

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "_replay_native.so"
_SRC = _DIR / "replay_sampler.cpp"

_cached = None
_attempted = False


def build(force=False) -> bool:
    """Compile the extension with g++; True on success."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    import numpy as np

    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        sys.stderr.write(f"[muzero_general_tpu] native build failed: {e}\n")
        return False


def get_replay_native():
    global _cached, _attempted
    if _cached is not None or _attempted:
        return _cached
    _attempted = True
    if not build():
        return None
    spec = importlib.util.spec_from_file_location("_replay_native", _SO)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[muzero_general_tpu] native load failed: {e}\n")
    return _cached
