"""AutoencoderKL tests: shapes, checkpoint roundtrip, scaling conventions,
and the pixel-level inpaint_image pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu.models import load as L
from lanpaint_tpu.models.vae import (
    FLUX_VAE_CONFIG,
    SD_VAE_CONFIG,
    TINY_VAE_CONFIG,
    VAE,
)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = TINY_VAE_CONFIG
    module = VAE(cfg)
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    return cfg, module, params


def test_vae_shapes(tiny_vae, key):
    cfg, module, params = tiny_vae
    x = jax.random.normal(key, (2, 3, 32, 32), jnp.float32)
    z = module.apply(params, x, method="encode")
    # 2 levels -> one downsample -> /2 spatial
    assert z.shape == (2, cfg.z_channels, 16, 16)
    y = module.apply(params, z, method="decode")
    assert y.shape == (2, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_vae_encode_stochastic_vs_mean(tiny_vae, key):
    cfg, module, params = tiny_vae
    x = jax.random.normal(key, (1, 3, 32, 32), jnp.float32)
    z_mean = module.apply(params, x, method="encode")
    z_mean2 = module.apply(params, x, method="encode")
    np.testing.assert_array_equal(np.asarray(z_mean), np.asarray(z_mean2))
    z_s = module.apply(params, x, jax.random.PRNGKey(1), method="encode")
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_s))


def test_vae_scaling_convention(tiny_vae, key):
    """encode applies (mean - shift) * scale; decode inverts it."""
    import dataclasses

    cfg, module, params = tiny_vae
    cfg2 = dataclasses.replace(cfg, scale_factor=2.0, shift_factor=0.25)
    module2 = VAE(cfg2)
    x = jax.random.normal(key, (1, 3, 32, 32), jnp.float32)
    z1 = module.apply(params, x, method="encode")   # scale .18215, shift 0
    z2 = module2.apply(params, x, method="encode")
    np.testing.assert_allclose(
        np.asarray(z2), (np.asarray(z1) / cfg.scale_factor - 0.25) * 2.0,
        rtol=1e-5, atol=1e-6)


def test_vae_roundtrip_exact(tiny_vae):
    cfg, module, params = tiny_vae
    state = L.export_vae(params, cfg)
    for want in [
        "encoder.conv_in.weight",
        "encoder.down.0.block.0.norm1.weight",
        "encoder.down.0.downsample.conv.weight",
        "encoder.mid.attn_1.q.weight",
        "encoder.norm_out.bias",
        "quant_conv.weight",
        "post_quant_conv.weight",
        "decoder.up.1.block.1.conv2.weight",
        "decoder.up.1.upsample.conv.weight",
        "decoder.conv_out.bias",
    ]:
        assert want in state, want
    # conv weights keep torch OIHW layout on export
    assert state["encoder.conv_in.weight"].shape[1] == 3
    back = L.import_vae(state, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_vae_import_prefix_autodetect(tiny_vae):
    cfg, module, params = tiny_vae
    state = L.export_vae(params, cfg, prefix="first_stage_model.")
    back = L.import_vae(state, cfg)  # prefix auto-detected
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(back)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flux_vae_no_quant_conv():
    cfg = FLUX_VAE_CONFIG
    assert not cfg.quant_conv and cfg.z_channels == 16
    ent = {c for c, *_ in L._vae_entries(cfg)}
    assert "quant_conv" not in ent and "post_quant_conv" not in ent
    ent_sd = {c for c, *_ in L._vae_entries(SD_VAE_CONFIG)}
    assert "quant_conv" in ent_sd


def test_inpaint_image_pixel_pipeline(tiny_vae, key):
    """Full pixel-level path: encode -> LanPaint -> decode -> MaskBlend."""
    from lanpaint_tpu import inpaint_image
    from lanpaint_tpu.models.zoo import build_tiny_unet

    cfg, module, params = tiny_vae
    den, _ = build_tiny_unet()
    image = jnp.tanh(jax.random.normal(key, (1, 3, 128, 128), jnp.float32))
    mask = np.zeros((128, 128), np.float32)
    mask[32:96, 32:96] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    out = inpaint_image(
        den, module, params, image=image, mask=jnp.asarray(mask),
        positive=cond, seed=0, steps=3, cfg=1.0, scheduler="normal",
        num_steps=2, blend_overlap=9)
    assert out.shape == image.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # far outside the (dilated+feathered) mask the original pixels survive
    np.testing.assert_allclose(np.asarray(out)[..., :8, :8],
                               np.asarray(image)[..., :8, :8], atol=1e-4)


def test_edit_image_reference_latent_pipeline(tiny_vae, key):
    """Qwen-Image-Edit path: the source image rides the cond dict as packed
    reference latents (ReferenceLatent analogue); outside the mask the
    source survives; ref conditioning actually changes the inpainted
    region vs the plain pipeline."""
    from lanpaint_tpu import edit_image, inpaint_image
    from lanpaint_tpu.models.zoo import build_tiny_dit

    cfg, module, params = tiny_vae
    den, _ = build_tiny_dit()
    image = jnp.tanh(jax.random.normal(key, (1, 3, 32, 32), jnp.float32))
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32),
            "vec": jnp.zeros((1, 16), jnp.float32)}
    kw = dict(image=image, mask=jnp.asarray(mask), positive=cond, seed=0,
              steps=3, cfg=1.0, scheduler="normal", num_steps=2,
              blend_overlap=5)
    out = edit_image(den, module, params, **kw)
    assert out.shape == image.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out)[..., :4, :4],
                               np.asarray(image)[..., :4, :4], atol=1e-4)
    plain = inpaint_image(den, module, params, **kw)
    assert not np.allclose(np.asarray(out)[..., 8:24, 8:24],
                           np.asarray(plain)[..., 8:24, 8:24])


# -- Wan2.1 causal video VAE --------------------------------------------------


def test_wan_vae_frame_law_and_shapes(key):
    """1+4k pixel frames -> 1+k latent frames -> back; 8x spatial."""
    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE

    cfg = TINY_WAN_VAE_CONFIG  # one temporal stage: 2x time, 2x spatial
    module = WanVAE(cfg)
    x = jax.random.normal(key, (1, 3, 5, 16, 16), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    z = module.apply(params, x, method="encode")
    assert z.shape == (1, cfg.z_channels, 3, 8, 8)  # (5-1)/2+1 frames
    out = module.apply(params, z, method="decode")
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wan22_vae_frame_law_and_shapes(key):
    """Wan2.2 structure: patch-2 input, AvgDown3D/DupUp3D stage shortcuts,
    width-keeping upsamples.  Tiny config: patch 2 + two spatial stages ->
    8x spatial; one temporal stage -> 2x time."""
    from lanpaint_tpu.models.video_vae import TINY_WAN22_VAE_CONFIG, WanVAE

    cfg = TINY_WAN22_VAE_CONFIG
    module = WanVAE(cfg)
    x = jax.random.normal(key, (1, 3, 5, 32, 32), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    z = module.apply(params, x, method="encode")
    assert z.shape == (1, cfg.z_channels, 3, 4, 4)
    out = module.apply(params, z, method="decode")
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wan22_vae_image_case(key):
    """T=1 degenerates cleanly through the 2.2 shortcut paths too."""
    from lanpaint_tpu.models.video_vae import TINY_WAN22_VAE_CONFIG, WanVAE

    cfg = TINY_WAN22_VAE_CONFIG
    module = WanVAE(cfg)
    x = jax.random.normal(key, (1, 3, 1, 32, 32), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    z = module.apply(params, x, method="encode")
    assert z.shape == (1, cfg.z_channels, 1, 4, 4)
    out = module.apply(params, z, method="decode")
    assert out.shape == x.shape


def test_wan_vae_image_case(key):
    """T=1 (image) path: the causal graph degenerates to a 2D autoencoder —
    the Qwen-Image / Krea2 / Anima / Wan-T2I usage."""
    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE

    cfg = TINY_WAN_VAE_CONFIG
    module = WanVAE(cfg)
    x = jax.random.normal(key, (1, 3, 1, 16, 16), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    z = module.apply(params, x, method="encode")
    assert z.shape == (1, cfg.z_channels, 1, 8, 8)
    out = module.apply(params, z, method="decode")
    assert out.shape == x.shape


def test_wan_vae_normalization_applied(key):
    """latents_mean/std shift the encode output and invert on decode."""
    import dataclasses

    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE

    base = TINY_WAN_VAE_CONFIG
    z = base.z_channels
    cfg_n = dataclasses.replace(base, latents_mean=(0.5,) * z,
                                latents_std=(2.0,) * z)
    x = jax.random.normal(key, (1, 3, 1, 16, 16), jnp.float32)
    m0 = WanVAE(base)
    mn = WanVAE(cfg_n)
    params = m0.init(jax.random.PRNGKey(0), x)
    z_raw = m0.apply(params, x, method="encode")
    z_norm = mn.apply(params, x, method="encode")
    np.testing.assert_allclose(np.asarray(z_norm),
                               (np.asarray(z_raw) - 0.5) / 2.0, atol=1e-5)
    # decode inverts the normalization: same pixels from either latent
    np.testing.assert_allclose(np.asarray(m0.apply(params, z_raw, method="decode")),
                               np.asarray(mn.apply(params, z_norm, method="decode")),
                               atol=1e-4)


def test_inpaint_video_pixel_pipeline(key):
    """Full pixel-level VIDEO path: Wan VAE encode -> LanPaint (video mask)
    -> decode -> per-frame MaskBlend."""
    from lanpaint_tpu import inpaint_video
    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE
    from lanpaint_tpu.models.zoo import build_wan
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG
    import dataclasses

    vae_cfg = TINY_WAN_VAE_CONFIG
    vae = WanVAE(vae_cfg)
    video = jnp.tanh(jax.random.normal(key, (1, 3, 5, 32, 32), jnp.float32))
    vae_params = vae.init(jax.random.PRNGKey(0), video)
    wan_cfg = dataclasses.replace(TINY_WAN_CONFIG,
                                  in_channels=vae_cfg.z_channels,
                                  out_channels=vae_cfg.z_channels)
    den, _ = build_wan(wan_cfg, name="tiny-wan-vae")
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    cond = {"context": jnp.zeros((1, 8, wan_cfg.context_dim), jnp.float32)}
    out = inpaint_video(
        den, vae, vae_params, video=video, mask=jnp.asarray(mask),
        positive=cond, seed=0, steps=3, cfg=1.0, num_steps=1,
        blend_overlap=5)
    assert out.shape == video.shape


def test_inpaint_video_pixel_pipeline_wan22_vae(key):
    """Same pixel-level path with the Wan2.2 (TI2V-5B) VAE — different
    latent geometry (patch-2 stages), same inpaint_video contract."""
    import dataclasses

    from lanpaint_tpu import inpaint_video
    from lanpaint_tpu.models.video_vae import TINY_WAN22_VAE_CONFIG, WanVAE
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG
    from lanpaint_tpu.models.zoo import build_wan

    vae_cfg = TINY_WAN22_VAE_CONFIG
    vae = WanVAE(vae_cfg)
    video = jnp.tanh(jax.random.normal(key, (1, 3, 5, 32, 32), jnp.float32))
    vae_params = vae.init(jax.random.PRNGKey(0), video)
    wan_cfg = dataclasses.replace(TINY_WAN_CONFIG,
                                  in_channels=vae_cfg.z_channels,
                                  out_channels=vae_cfg.z_channels)
    den, _ = build_wan(wan_cfg, name="tiny-wan22-vae")
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    cond = {"context": jnp.zeros((1, 8, wan_cfg.context_dim), jnp.float32)}
    out = inpaint_video(
        den, vae, vae_params, video=video, mask=jnp.asarray(mask),
        positive=cond, seed=0, steps=3, cfg=1.0, num_steps=1,
        blend_overlap=5)
    assert out.shape == video.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(jnp.isfinite(out)))
    # far outside the (dilated+feathered) mask the original pixels survive
    np.testing.assert_allclose(np.asarray(out)[..., :2, :2],
                               np.asarray(video)[..., :2, :2], atol=1e-4)


def test_outpaint_image_grows_canvas(tiny_vae, key):
    """Outpainting: border = repaint region; the interior survives the
    blend; output canvas carries the padded size."""
    from lanpaint_tpu import outpaint_image
    from lanpaint_tpu.models.zoo import build_tiny_unet

    cfg, module, params = tiny_vae
    den, _ = build_tiny_unet()
    image = jnp.tanh(jax.random.normal(key, (1, 3, 32, 32), jnp.float32))
    out = outpaint_image(
        den, module, params, image=image, padding=(0, 0, 16, 16),
        positive={"context": jnp.zeros((1, 8, 32), jnp.float32)},
        seed=0, steps=3, cfg=1.0, scheduler="normal", num_steps=1,
        blend_overlap=5)
    assert out.shape == (1, 3, 32, 64)
    assert bool(jnp.all(jnp.isfinite(out)))
    # the original interior (away from the feathered seam) is preserved
    np.testing.assert_allclose(np.asarray(out)[..., 8:24, 24:40],
                               np.asarray(image)[..., 8:24, 8:24], atol=1e-4)
