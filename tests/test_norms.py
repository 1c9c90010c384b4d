"""Fused row-norm (ops/norms.py) equivalence tests.

CPU runs exercise the jnp fallback (bit-equal to nn.LayerNorm); the Pallas
path itself is TPU-gated and also runs in bench.py's on-chip selftest.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu.models.layers import LayerNormF32, RMSNorm
from lanpaint_tpu.ops.norms import (
    fused_layernorm,
    fused_rmsnorm,
    layernorm_ref,
    rmsnorm_ref,
)


@pytest.mark.parametrize("shape", [(4, 16, 128), (2, 7, 33), (1, 1024, 1280)])
def test_layernorm_ref_matches_flax(key, shape):
    x = jax.random.normal(key, shape, jnp.float32) * 3.0 + 1.5
    want = nn.LayerNorm(dtype=jnp.float32, use_scale=False,
                        use_bias=False).apply({"params": {}}, x)
    got = layernorm_ref(x)
    # fusion order differs between the two jit programs -> 1-ulp noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_layernorm_module_matches_flax_with_affine(key):
    x = jax.random.normal(key, (2, 64, 256), jnp.float32)
    m = LayerNormF32()
    p = m.init(jax.random.PRNGKey(1), x)
    # non-trivial affine
    p = jax.tree.map(lambda a: a + 0.25, p)
    ref = nn.LayerNorm(dtype=jnp.float32)
    want = ref.apply(p, x)
    np.testing.assert_allclose(np.asarray(m.apply(p, x)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_layernorm_bf16_roundtrip(key):
    """bf16 activations: fp32 statistics, bf16 output == downcast fp32 LN."""
    x = jax.random.normal(key, (8, 128), jnp.bfloat16)
    got = fused_layernorm(x)
    want = layernorm_ref(x.astype(jnp.float32)).astype(jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_rmsnorm_module_matches_manual(key):
    x = jax.random.normal(key, (2, 16, 64), jnp.float32)
    m = RMSNorm(64)
    p = m.init(jax.random.PRNGKey(2), x)
    p = jax.tree.map(lambda a: a * 1.3, p)
    xf = x.astype(jnp.float32)
    scale = p["params"]["scale"]
    want = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6) * scale
    np.testing.assert_allclose(np.asarray(m.apply(p, x)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_rmsnorm_no_affine(key):
    x = jax.random.normal(key, (4, 32), jnp.float32)
    got = fused_rmsnorm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(rmsnorm_ref(x)),
                               rtol=0, atol=0)


def test_can_fuse_gate():
    """Shapes that must NOT take the Pallas kernel (fallback correctness is
    covered above; this pins the routing so a 'passing' TPU test can't be
    secretly comparing the fallback to itself — ADVICE r3)."""
    from lanpaint_tpu.ops.norms import _can_fuse

    assert not _can_fuse(77, 2048)   # rows % 8 != 0
    assert not _can_fuse(104, 33)    # cols % 128 != 0
    assert not _can_fuse(104, 16384)  # cols > _MAX_FEATURES
    if jax.default_backend() == "tpu":
        assert _can_fuse(104, 2048)
        assert _can_fuse(1024, 1280)


def test_layernorm_na_returns_fp32(key):
    """The paramless adaLN pre-norm must emit fp32 so the modulation that
    follows runs at full precision (VERDICT r3: downcast-first cost 2.6e-3
    rel error on the Wan TP equality tests)."""
    from lanpaint_tpu.models.layers import layernorm_na

    x = jax.random.normal(key, (8, 128), jnp.bfloat16)
    out = layernorm_na(x)
    assert out.dtype == jnp.float32
    want = layernorm_ref(x, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# (1024, 1280): full 256-row tile; (4096, 640): multi-tile grid;
# (104, 2048): rows % 8 == 0 but % 16 != 0 — exercises _row_tile halving
# all the way to the minimum 8-row tile (ADVICE r3: the old (77, 2048) case
# silently took the fallback and compared the reference to itself).
@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas row-norm kernel is TPU-only")
@pytest.mark.parametrize("rows,cols", [(1024, 1280), (4096, 640), (104, 2048)])
def test_pallas_norm_matches_ref_on_tpu(key, rows, cols):
    from lanpaint_tpu.ops.norms import _can_fuse

    assert _can_fuse(rows, cols)  # the kernel, not the fallback
    x = jax.random.normal(key, (rows, cols), jnp.bfloat16)
    g = jax.random.normal(jax.random.fold_in(key, 1), (cols,), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 2), (cols,), jnp.float32)
    got = fused_layernorm(x, g, b)
    want = layernorm_ref(x, g, b)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)
    got_r = fused_rmsnorm(x, g)
    want_r = rmsnorm_ref(x, g)
    np.testing.assert_allclose(np.asarray(got_r, np.float32),
                               np.asarray(want_r, np.float32), atol=2e-2)
    # fp32-out path (layernorm_na): exact against the fp32 reference
    got32 = fused_layernorm(x, eps=1e-6, out_dtype=jnp.float32)
    want32 = layernorm_ref(x, eps=1e-6, out_dtype=jnp.float32)
    assert got32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want32),
                               rtol=1e-5, atol=1e-5)
