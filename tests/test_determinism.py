"""Determinism and reproducibility guarantees (docs/rng.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu import Denoiser, LanPaintConfig, LanPaintSampler, ModelKind
from lanpaint_tpu.sigmas import EpsSigmaTable, karras


def _toy():
    def apply(x, t, cond):
        n = x[0].size
        w = n / (n + t.reshape((-1,) + (1,) * (x.ndim - 1)) ** 2)
        c_hat = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True) * w
        return jnp.broadcast_to(c_hat, x.shape)

    return Denoiser(apply=apply, kind=ModelKind.EPS, sigma_table=EpsSigmaTable())


@pytest.mark.slow
def test_same_seed_bitwise_identical():
    toy = _toy()
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = jnp.zeros((1, 4, 8, 8), jnp.float32).at[..., 4:].set(1.0)
    sigmas = jnp.asarray(karras(8, 0.03, 14.6), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=3),
                          sampler_name="euler_ancestral", cfg=1.0)
    a, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=42)
    b, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=42)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seeds_differ():
    toy = _toy()
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = jnp.zeros((1, 4, 8, 8), jnp.float32).at[..., 4:].set(1.0)
    sigmas = jnp.asarray(karras(8, 0.03, 14.6), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=3),
                          sampler_name="euler", cfg=1.0)
    a, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=0)
    b, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=1)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_decoupled_noise_changes_think_stream_only():
    """decoupled_noise=True (reference nodes.py:208-212 'random' inpaint
    option) must alter the result (different replace-step noise) while
    staying deterministic."""
    toy = _toy()
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = jnp.zeros((1, 4, 8, 8), jnp.float32).at[..., 4:].set(1.0)
    sigmas = jnp.asarray(karras(8, 0.03, 14.6), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=3),
                          sampler_name="euler", cfg=1.0)
    a, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=5)
    b, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=5,
               decoupled_noise=True)
    c, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=5,
               decoupled_noise=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(c))
