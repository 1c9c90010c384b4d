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


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="splash kernel is TPU-only")
def test_splash_padded_unaligned_s_on_tpu(key):
    """Unaligned S routes to splash via zero-padding + SegmentIds (padding
    isolated in its own segment) — the path the Wan video shape S=5400
    takes (padded to 6144).  S=2100 pads to 4096 here; the answer must be
    the exact (unpadded) XLA softmax."""
    q = jax.random.normal(key, (1, 2100, 2, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.bfloat16)
    o1 = attention_bshd(q, k, v, impl="xla")
    o2 = attention_bshd(q, k, v, impl="splash")
    assert np.isfinite(np.asarray(o2, np.float32)).all()
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32), atol=2e-3)
    # batched (vmap over the pallas call with closed-over segment ids)
    qb = jnp.concatenate([q, q * 0.5], axis=0)
    kb = jnp.concatenate([k, k], axis=0)
    vb = jnp.concatenate([v, v], axis=0)
    ob = attention_bshd(qb, kb, vb, impl="splash")
    np.testing.assert_allclose(np.asarray(ob[0], np.float32),
                               np.asarray(o2[0], np.float32), atol=2e-3)


def test_explicit_kernel_impl_rejects_cross_attention(key):
    """impl='flash'/'splash' are square-layout self-attention kernels; a
    cross-attention call must fail loudly, not attend to garbage
    (ADVICE r3)."""
    q = jax.random.normal(key, (1, 128, 4, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 77, 4, 64),
                          jnp.float32)
    for impl in ("flash", "splash"):
        with pytest.raises(ValueError, match="self-attention"):
            attention_bshd(q, k, k, impl=impl)


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="checks the clear non-TPU error message")
def test_explicit_kernel_impl_rejects_cpu_backend(key):
    q = jax.random.normal(key, (1, 128, 4, 64), jnp.float32)
    for impl in ("flash", "splash"):
        with pytest.raises(ValueError, match="TPU"):
            attention_bshd(q, q, q, impl=impl)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas kernels are TPU-only")
@pytest.mark.parametrize("impl", ["splash", "flash"])
def test_attention_inside_while_loop_two_traces(key, impl):
    """The engine calls attention inside a `lax.while_loop` body, and the
    same cached kernel is then reused under a DIFFERENT trace (chunked
    launches re-jit).  Round 3's headline bench died exactly here: the
    lru-cached splash kernel closed over mask-info arrays created under the
    first trace -> UnexpectedTracerError on reuse (BENCH_r03.json rc=1).
    Two separate jit programs, each wrapping attention in a while_loop,
    reproduce that shape."""
    s = 2048  # >= SPLASH_MIN_S so the splash route is actually taken
    q = jax.random.normal(key, (1, s, 2, 64), jnp.bfloat16)

    def make(n_iters):
        @jax.jit
        def run(q):
            def body(carry):
                i, x = carry
                o = attention_bshd(x, x, x, impl=impl)
                return i + 1, (x + o.astype(x.dtype)) / 2.0

            def cond(carry):
                return carry[0] < n_iters

            _, out = jax.lax.while_loop(cond, body, (0, q))
            return out

        return run

    o1 = make(1)(q)          # first trace builds (and caches) the kernel
    o2 = make(2)(q)          # distinct jaxpr -> kernel reused across traces
    assert np.isfinite(np.asarray(o1, np.float32)).all()
    assert np.isfinite(np.asarray(o2, np.float32)).all()
    # one iteration of the same body outside the loop agrees with n_iters=1
    direct = (q + attention_bshd(q, q, q, impl=impl).astype(q.dtype)) / 2.0
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(direct, np.float32), atol=2e-2)


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
