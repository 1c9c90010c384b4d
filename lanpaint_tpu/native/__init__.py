"""Native runtime components (C++ data plane, ctypes-bound).

Built on demand with g++ (-O3 -shared -fPIC -pthread) into a cached .so
next to the sources; every entry point has a pure-numpy fallback so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    # compile to a per-process temp path, then atomically publish: the
    # in-process _LOCK cannot stop a concurrent process (xdist test
    # workers) from observing a half-written .so
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           src, "-o", tmp]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(tmp, out)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "convert.cpp")
        so = os.path.join(_HERE, "_lpnative.so")
        if not os.path.exists(so) or (
                os.path.getmtime(so) < os.path.getmtime(src)):
            ok = _build(src, so)
            if not ok:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.lp_convert_f32.restype = ctypes.c_int
        lib.lp_convert_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.c_int]
        lib.lp_copy.restype = None
        lib.lp_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int64, ctypes.c_int]
        _LIB = lib
        return _LIB


DTYPE_CODES = {"F16": 0, "BF16": 1, "F8_E4M3": 2, "F8_E5M2": 3}
