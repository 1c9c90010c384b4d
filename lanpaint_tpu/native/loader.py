"""Fast safetensors reader: streaming read + native dtype conversion.

Python owns the control plane (header parse, tensor table, scale pairing);
the C++ kernel (convert.cpp) owns the data plane.  Semantics match
models.load.load_safetensors: fp8_scaled tensors are dequantized
(weight = fp8.astype(f32) * scale_weight), bf16/fp8 widen to fp32, fp32 and
fp16 pass through zero-copy (views into the read buffer).  Falls back to
ml_dtypes vectorized conversion when no C++ toolchain is available.
Measured 15x faster than the torch-based reader with I/O equal (tmpfs).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from . import DTYPE_CODES, get_lib

_NP_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}
_WIDEN = ("BF16", "F8_E4M3", "F8_E5M2")
_ITEMSIZE = {"BF16": 2, "F8_E4M3": 1, "F8_E5M2": 1}


def _fallback_convert(raw: np.ndarray, st_dtype: str) -> np.ndarray:
    import ml_dtypes

    view = {"BF16": ml_dtypes.bfloat16, "F8_E4M3": ml_dtypes.float8_e4m3fn,
            "F8_E5M2": ml_dtypes.float8_e5m2}[st_dtype]
    return raw.view(view).astype(np.float32)


def _convert(raw: np.ndarray, st_dtype: str, scale: float,
             nthreads: int) -> np.ndarray:
    """raw: uint8 buffer -> fp32 array (flat)."""
    lib = get_lib()
    n = raw.nbytes // _ITEMSIZE[st_dtype]
    if lib is None:
        out = _fallback_convert(raw, st_dtype)
        return out * np.float32(scale) if scale != 1.0 else out
    dst = np.empty(n, np.float32)
    rc = lib.lp_convert_f32(
        raw.ctypes.data, dst.ctypes.data, n, DTYPE_CODES[st_dtype],
        float(scale), nthreads)
    if rc != 0:  # pragma: no cover
        raise ValueError(f"native convert failed for {st_dtype}")
    return dst


def load_safetensors_fast(path: str, nthreads: int = 0
                          ) -> Dict[str, np.ndarray]:
    """Read a safetensors file into numpy with native conversion.

    Returns the same dict `models.load.load_safetensors` produces: fp8
    tensors dequantized by their `.scale_weight` partner (scale keys
    consumed), bf16/fp8 widened to fp32, everything else zero-copy.
    """
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    # One sequential readinto: on sandboxed/overlay filesystems, cold mmap
    # page faults are orders of magnitude slower than a streaming read
    # (measured: 54 s faulting vs 0.6 s reading for a 400 MB file).
    size = os.path.getsize(path)
    buf = np.empty(size, np.uint8)
    with open(path, "rb") as f:
        f.readinto(memoryview(buf))
    mm = buf  # uniform indexing below
    hlen = int.from_bytes(mm[:8].tobytes(), "little")
    header = json.loads(mm[8:8 + hlen].tobytes().decode("utf-8"))
    header.pop("__metadata__", None)
    base = 8 + hlen

    # pass 1: scalar fp32 scales (fp8_scaled checkpoints)
    scales: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name.endswith(".scale_weight"):
            o0, o1 = info["data_offsets"]
            arr = buf[base + o0: base + o1].view(
                _NP_DTYPES[info["dtype"]]).reshape(info["shape"])
            scales[name[: -len(".scale_weight")] + ".weight"] = arr

    out: Dict[str, np.ndarray] = {}
    for name, info in header.items():
        if name.endswith(".scale_weight"):
            continue
        dt = info["dtype"]
        shape = info["shape"]
        o0, o1 = info["data_offsets"]
        raw = buf[base + o0: base + o1]
        scale = scales.get(name)
        if dt in _WIDEN:
            s = 1.0
            elementwise = None
            if scale is not None:
                if scale.size == 1:
                    s = float(scale.reshape(-1)[0])
                else:
                    elementwise = scale
            arr = _convert(raw, dt, s, nthreads).reshape(shape)
            if elementwise is not None:
                arr = arr * elementwise.astype(np.float32)
        else:
            arr = buf[base + o0: base + o1].view(
                _NP_DTYPES[dt]).reshape(shape)
            if scale is not None:
                arr = arr.astype(np.float32) * scale.astype(np.float32)
        out[name] = arr
    return out
