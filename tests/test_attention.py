"""Attention dispatch tests (flash kernel paths are TPU-gated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu.models.layers import attention_bshd, apply_rope, rope_freqs


def test_xla_attention_matches_reference_softmax(key):
    q = jax.random.normal(key, (2, 16, 4, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    out = attention_bshd(q, k, v, impl="xla")
    # reference einsum softmax
    logits = jnp.einsum("bshd,bthd->bhst", q, k) / np.sqrt(32)
    w = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("bhst,bthd->bshd", w, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas flash-attention kernel is TPU-only; "
                           "verified on-chip (16.5ms vs 228.6ms XLA @ seq 8192)")
def test_flash_matches_xla_on_tpu(key):
    q = jax.random.normal(key, (1, 4096, 4, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.bfloat16)
    o1 = attention_bshd(q, k, v, impl="xla")
    o2 = attention_bshd(q, k, v, impl="flash")
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32), atol=2e-3)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="splash kernel is TPU-only")
def test_splash_matches_flash_on_tpu(key):
    """The SDXL-1024 level-1 shape (S=4096, H=10, D=64) routed to splash
    must agree with the legacy flash kernel."""
    q = jax.random.normal(key, (1, 4096, 10, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.bfloat16)
    o1 = attention_bshd(q, k, v, impl="flash")    # legacy kernel, always
    o2 = attention_bshd(q, k, v, impl="splash")
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32), atol=2e-3)
    # batched path goes through vmap
    qb = jnp.concatenate([q, q * 0.5], axis=0)
    kb = jnp.concatenate([k, k], axis=0)
    vb = jnp.concatenate([v, v], axis=0)
    ob = attention_bshd(qb, kb, vb, impl="splash")
    np.testing.assert_allclose(np.asarray(ob[0], np.float32),
                               np.asarray(o2[0], np.float32), atol=2e-3)


def test_rope_preserves_norm(key):
    """RoPE rotations are orthogonal: per-head vector norms unchanged."""
    ids = jnp.tile(jnp.arange(8)[None, :, None], (1, 1, 3))
    pe = rope_freqs(ids, (4, 6, 6))
    x = jax.random.normal(key, (1, 8, 2, 16), jnp.float32)
    xr = apply_rope(x, pe)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(xr), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_rope_relative_phase(key):
    """Same relative offset -> same attention score (RoPE's defining
    property), regardless of absolute position."""
    ids = jnp.tile(jnp.arange(16)[None, :, None], (1, 1, 3))
    pe = rope_freqs(ids, (4, 6, 6))
    q = jax.random.normal(key, (1, 1, 1, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 1, 16), jnp.float32)
    qb = jnp.tile(q, (1, 16, 1, 1))
    kb = jnp.tile(k, (1, 16, 1, 1))
    qr = apply_rope(qb, pe)
    kr = apply_rope(kb, pe)
    # score between positions (i, i+3) must be constant in i
    scores = [float(jnp.sum(qr[0, i, 0] * kr[0, i + 3, 0])) for i in range(12)]
    np.testing.assert_allclose(scores, scores[0], rtol=1e-4, atol=1e-5)
