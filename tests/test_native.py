"""Native data-plane tests: the C++ mmap safetensors reader must agree
bit-for-bit with the torch-based reference reader on every dtype the model
zoo consumes, including fp8_scaled dequantization."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st_torch = pytest.importorskip("safetensors.torch")

from lanpaint_tpu.models.load import load_safetensors  # noqa: E402
from lanpaint_tpu.native import get_lib  # noqa: E402
from lanpaint_tpu.native.loader import load_safetensors_fast  # noqa: E402


def _write_checkpoint(tmp_path, with_fp8=True):
    g = torch.Generator().manual_seed(0)
    tensors = {
        "a.weight": torch.randn(64, 48, generator=g, dtype=torch.float32),
        "b.weight": torch.randn(32, 16, generator=g).to(torch.float16),
        "c.weight": torch.randn(128, 8, generator=g).to(torch.bfloat16),
        "d.bias": torch.randn(7, generator=g, dtype=torch.float32),
        "e.idx": torch.arange(10, dtype=torch.int64),
    }
    if with_fp8:
        tensors["f.weight"] = (torch.randn(256, 64, generator=g) * 0.1).to(
            torch.float8_e4m3fn)
        tensors["f.scale_weight"] = torch.tensor(2.5, dtype=torch.float32)
        tensors["g.weight"] = (torch.randn(31, 5, generator=g) * 0.2).to(
            torch.float8_e5m2)
        tensors["g.scale_weight"] = torch.tensor(0.75, dtype=torch.float32)
    path = str(tmp_path / "ckpt.safetensors")
    st_torch.save_file(tensors, path)
    return path


def _assert_same(fast, ref):
    assert set(fast) == set(ref)
    for k in ref:
        assert fast[k].shape == ref[k].shape, k
        assert fast[k].dtype == ref[k].dtype, (k, fast[k].dtype, ref[k].dtype)
        np.testing.assert_array_equal(np.asarray(fast[k]), ref[k], err_msg=k)


def test_native_loader_matches_torch_loader(tmp_path):
    path = _write_checkpoint(tmp_path)
    ref = load_safetensors(path, native=False)
    fast = load_safetensors_fast(path)
    _assert_same(fast, ref)
    # scale keys consumed, fp8 dequantized to f32
    assert "f.scale_weight" not in fast
    assert fast["f.weight"].dtype == np.float32
    # default loader routes through the native path and agrees too
    _assert_same(load_safetensors(path), ref)


def test_native_convert_kernels_vs_ml_dtypes():
    lib = get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    import ml_dtypes

    from lanpaint_tpu.native import DTYPE_CODES

    rng = np.random.default_rng(0)
    cases = [
        ("F16", np.float16, rng.standard_normal(5000).astype(np.float16)),
        ("BF16", ml_dtypes.bfloat16,
         rng.standard_normal(5000).astype(ml_dtypes.bfloat16)),
        ("F8_E4M3", ml_dtypes.float8_e4m3fn,
         (rng.standard_normal(5000) * 0.2).astype(ml_dtypes.float8_e4m3fn)),
        ("F8_E5M2", ml_dtypes.float8_e5m2,
         (rng.standard_normal(5000) * 0.2).astype(ml_dtypes.float8_e5m2)),
    ]
    for name, dt, vals in cases:
        raw = vals.view(np.uint8)
        dst = np.empty(vals.size, np.float32)
        rc = lib.lp_convert_f32(raw.ctypes.data, dst.ctypes.data, vals.size,
                                DTYPE_CODES[name], 1.0, 4)
        assert rc == 0
        np.testing.assert_array_equal(dst, vals.astype(np.float32),
                                      err_msg=name)
        # scaled variant
        rc = lib.lp_convert_f32(raw.ctypes.data, dst.ctypes.data, vals.size,
                                DTYPE_CODES[name], 3.0, 4)
        assert rc == 0
        np.testing.assert_array_equal(
            dst, vals.astype(np.float32) * np.float32(3.0), err_msg=name)


def test_native_convert_special_values():
    lib = get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    import ml_dtypes

    from lanpaint_tpu.native import DTYPE_CODES

    # every possible fp8 byte, both formats: exact table equality with
    # ml_dtypes (incl. nan patterns, subnormals, negative zero)
    all_bytes = np.arange(256, dtype=np.uint8)
    for name, dt in (("F8_E4M3", ml_dtypes.float8_e4m3fn),
                     ("F8_E5M2", ml_dtypes.float8_e5m2)):
        ref = all_bytes.view(dt).astype(np.float32)
        dst = np.empty(256, np.float32)
        lib.lp_convert_f32(all_bytes.ctypes.data, dst.ctypes.data, 256,
                           DTYPE_CODES[name], 1.0, 1)
        np.testing.assert_array_equal(
            np.isnan(dst), np.isnan(ref), err_msg=name)
        m = ~np.isnan(ref)
        np.testing.assert_array_equal(dst[m], ref[m], err_msg=name)
    # every possible fp16 bit pattern
    all16 = np.arange(65536, dtype=np.uint16)
    ref = all16.view(np.float16).astype(np.float32)
    dst = np.empty(65536, np.float32)
    lib.lp_convert_f32(all16.view(np.uint8).ctypes.data, dst.ctypes.data,
                       65536, DTYPE_CODES["F16"], 1.0, 2)
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(dst[m], ref[m])
    np.testing.assert_array_equal(np.isnan(dst), np.isnan(ref))


def test_loader_fallback_path(tmp_path, monkeypatch):
    """Without the native lib the loader must produce identical results via
    ml_dtypes."""
    import lanpaint_tpu.native.loader as L

    path = _write_checkpoint(tmp_path)
    ref = load_safetensors(path, native=False)
    monkeypatch.setattr(L, "get_lib", lambda: None)
    fast = L.load_safetensors_fast(path)
    _assert_same(fast, ref)
