"""Mask pipeline tests (reference tests/test_reshape_mask.py analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lanpaint_tpu.masks import (
    checkerboard_noise_mask,
    gaussian_kernel,
    mask_blend,
    prepare_mask,
    reshape_mask,
    resize_nearest_exact,
)


@pytest.mark.parametrize(
    "mask_shape,out_shape",
    [
        ((64, 64), (2, 4, 16, 16)),
        ((1, 64, 64), (2, 4, 16, 16)),
        ((2, 1, 64, 64), (2, 4, 16, 16)),
        ((64, 48), (1, 16, 8, 8)),
    ],
)
def test_reshape_mask_image_shapes(mask_shape, out_shape):
    m = jnp.ones(mask_shape, jnp.float32)
    out = reshape_mask(m, out_shape)
    assert out.shape == out_shape


def test_reshape_mask_video_5d():
    # frame-stack mask (F, C, H, W) -> (B, C, F, H, W) latent grid
    m = jnp.ones((8, 1, 64, 64), jnp.float32)
    out = reshape_mask(m, (1, 16, 4, 16, 16), video=True)
    assert out.shape == (1, 16, 4, 16, 16)


def test_reshape_mask_image_to_5d_latent():
    # image mask broadcast into a video latent when video=False
    m = jnp.ones((1, 1, 64, 64), jnp.float32)
    out = reshape_mask(m, (1, 16, 4, 16, 16), video=False)
    assert out.shape == (1, 16, 4, 16, 16)


def test_nearest_exact_matches_torch():
    """Index-exact parity with torch's 'nearest-exact' interpolate
    (the mode the reference uses, nodes.py:23)."""
    rng = np.random.default_rng(0)
    x = rng.random((1, 1, 37, 53)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(16, 16), mode="nearest-exact"
    ).numpy()
    got = np.asarray(resize_nearest_exact(jnp.asarray(x), (16, 16)))
    np.testing.assert_array_equal(got, want)


def test_nearest_exact_matches_torch_3d():
    rng = np.random.default_rng(1)
    x = rng.random((1, 1, 9, 33, 41)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(4, 12, 12), mode="nearest-exact"
    ).numpy()
    got = np.asarray(resize_nearest_exact(jnp.asarray(x), (4, 12, 12)))
    np.testing.assert_array_equal(got, want)


def test_prepare_mask_binarizable():
    m = jnp.asarray(np.random.default_rng(2).random((64, 64)), jnp.float32)
    out = prepare_mask(m, (1, 4, 16, 16))
    assert out.dtype == jnp.float32
    assert out.shape == (1, 4, 16, 16)


def test_gaussian_kernel_normalized():
    k = gaussian_kernel(7)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    assert k.shape == (7, 7)


def test_mask_blend_regions():
    img1 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    img2 = jnp.ones((1, 16, 16, 3), jnp.float32)
    mask = jnp.zeros((1, 16, 16), jnp.float32).at[:, 4:12, 4:12].set(1.0)
    out = mask_blend(img1, img2, mask, blend_overlap=3)
    o = np.asarray(out)
    assert o[0, 8, 8, 0] > 0.9       # inside mask: image2
    assert o[0, 0, 0, 0] < 0.1       # far outside: image1
    assert np.isfinite(o).all()


def test_mask_blend_size_mismatch_raises():
    with pytest.raises(ValueError, match="size mismatch"):
        mask_blend(jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1, 8, 8)))


def test_checkerboard_noise_mask():
    m = np.asarray(checkerboard_noise_mask((1, 4, 8, 8), scale=2))
    assert m[0, 0, 0, 0] == 0.0 and m[0, 0, 0, 1] == 1.0
