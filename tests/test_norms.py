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


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas row-norm kernel is TPU-only")
@pytest.mark.parametrize("rows,cols", [(1024, 1280), (4096, 640), (77, 2048)])
def test_pallas_norm_matches_ref_on_tpu(key, rows, cols):
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
