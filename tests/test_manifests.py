"""Checkpoint key-manifest fidelity tests.

The round-1 importers were only roundtrip-tested against their own
exporters — self-consistent, but a wrong key name or transpose versus the
REAL public checkpoint layout would pass.  tests/manifests.py vendors
independently-authored manifests of those layouts; here we assert:

* full-scale KEY parity: the manifest key set equals exactly what the
  importer consumes (`load.manifest_coverage` / `load.qwen_expected_keys`)
  at the real config's depths — any dropped or hallucinated key fails;
* tiny-scale SHAPE parity: exporting an initialized module produces, for
  every manifest key, exactly the manifest's tensor shape (all axis sizes
  distinct, so transposes/fusions cannot hide).
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


import manifests as M
from lanpaint_tpu.models import load as L


def _key_parity(manifest, entries, prefix):
    consumed, leftover, missing = L.manifest_coverage(
        manifest.keys(), entries, prefix)
    assert not leftover, f"importer drops real keys: {sorted(leftover)[:8]}"
    assert not missing, f"importer expects phantom keys: {sorted(missing)[:8]}"


def _shape_parity(manifest, state):
    assert set(state) == set(manifest), (
        f"missing={sorted(set(manifest) - set(state))[:8]} "
        f"extra={sorted(set(state) - set(manifest))[:8]}")
    for k, shape in manifest.items():
        assert tuple(state[k].shape) == tuple(shape), (
            k, tuple(state[k].shape), shape)


# -- SDXL UNet (sgm/ldm single-file layout) ---------------------------------


def test_sdxl_unet_key_parity_full_scale():
    from lanpaint_tpu.models.unet import SDXL_CONFIG

    man = M.unet_manifest(SDXL_CONFIG)
    _key_parity(man, L._unet_entries(SDXL_CONFIG), "model.diffusion_model.")


def test_unet_shape_parity_tiny():
    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG, UNetModel

    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 8, cfg.context_dim)), None)
    man = M.unet_manifest(cfg)
    _shape_parity(man, L.export_unet(params, cfg))


# -- Flux (BFL layout) -------------------------------------------------------


def test_flux_dev_key_parity_full_scale():
    from lanpaint_tpu.models.dit import FLUX_DEV_CONFIG

    man = M.flux_manifest(FLUX_DEV_CONFIG)
    _key_parity(man, L._dit_entries(FLUX_DEV_CONFIG), "")


def test_flux_shape_parity_tiny():
    from lanpaint_tpu.models.dit import TINY_DIT_CONFIG, MMDiT

    cfg = TINY_DIT_CONFIG
    module = MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)))
    man = M.flux_manifest(cfg)
    _shape_parity(man, L.export_dit(params, cfg))


# -- SD3.5 (Stability mmdit layout) ------------------------------------------


def test_sd35_large_key_parity_full_scale():
    from lanpaint_tpu.models.sd3 import SD35_LARGE_CONFIG

    man = M.sd3_manifest(SD35_LARGE_CONFIG)
    # export renames ln_q/ln_k .scale -> .weight; import inverts — compare
    # against the import-side key space
    keys = {k.replace(".ln_q.weight", ".ln_q.scale")
             .replace(".ln_k.weight", ".ln_k.scale") for k in man}
    _key_parity(dict.fromkeys(keys), L._sd3_entries(SD35_LARGE_CONFIG),
                "model.diffusion_model.")


def test_sd35_medium_key_parity_full_scale():
    from lanpaint_tpu.models.sd3 import SD35_MEDIUM_CONFIG

    man = M.sd3_manifest(SD35_MEDIUM_CONFIG)
    keys = {k.replace(".ln_q.weight", ".ln_q.scale")
             .replace(".ln_k.weight", ".ln_k.scale") for k in man}
    _key_parity(dict.fromkeys(keys), L._sd3_entries(SD35_MEDIUM_CONFIG),
                "model.diffusion_model.")


def test_sd3_shape_parity_tiny():
    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG, SD3MMDiT

    cfg = TINY_SD3_CONFIG
    module = SD3MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)))
    man = M.sd3_manifest(cfg)
    _shape_parity(man, L.export_sd3(params, cfg))


# -- Wan2.x (Wan-Video layout) ------------------------------------------------


@pytest.mark.parametrize("which", ["14b", "5b"])
def test_wan_key_parity_full_scale(which):
    from lanpaint_tpu.models.wan import WAN22_T2V_14B_CONFIG, WAN22_TI2V_5B_CONFIG

    cfg = {"14b": WAN22_T2V_14B_CONFIG, "5b": WAN22_TI2V_5B_CONFIG}[which]
    man = M.wan_manifest(cfg)
    keys = {k.replace(".norm_q.weight", ".norm_q.scale")
             .replace(".norm_k.weight", ".norm_k.scale") for k in man}
    _key_parity(dict.fromkeys(keys), L._wan_entries(cfg), "")
    # headline facts of the public configs
    if which == "5b":
        assert man["patch_embedding.weight"] == (3072, 48, 1, 2, 2)
    else:
        assert man["patch_embedding.weight"] == (5120, 16, 1, 2, 2)


def test_wan_shape_parity_tiny():
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WanModel

    cfg = TINY_WAN_CONFIG
    module = WanModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 4, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)))
    man = M.wan_manifest(cfg)
    _shape_parity(man, L.export_wan(params, cfg))


# -- HunyuanVideo (ComfyUI-native layout) -------------------------------------


def test_hyvideo_key_parity_full_scale():
    from lanpaint_tpu.models.hyvideo import HUNYUAN_VIDEO_720P_CONFIG

    man = M.hyvideo_manifest(HUNYUAN_VIDEO_720P_CONFIG)
    _key_parity(man, L._hyvideo_entries(HUNYUAN_VIDEO_720P_CONFIG), "")
    # headline facts of the public release
    assert man["img_in.proj.weight"] == (3072, 16, 1, 2, 2)
    assert man["double_blocks.19.img_attn.qkv.weight"] == (3 * 3072, 3072)
    assert "double_blocks.20.img_attn.qkv.weight" not in man
    assert man["single_blocks.39.linear1.weight"] == (3 * 3072 + 12288, 3072)
    assert man["txt_in.c_embedder.linear_1.weight"] == (3072, 4096)
    assert man["vector_in.in_layer.weight"] == (3072, 768)


def test_hyvideo_shape_parity_tiny():
    from lanpaint_tpu.models.hyvideo import TINY_HYVIDEO_CONFIG, HYVideoDiT

    cfg = TINY_HYVIDEO_CONFIG
    module = HYVideoDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 1, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)),
                         jnp.full((1,), 6.0))
    man = M.hyvideo_manifest(cfg)
    _shape_parity(man, L.export_hyvideo(params, cfg))


def test_hyvideo_import_export_roundtrip_tiny():
    import numpy as np

    from lanpaint_tpu.models.hyvideo import TINY_HYVIDEO_CONFIG, HYVideoDiT

    cfg = TINY_HYVIDEO_CONFIG
    module = HYVideoDiT(cfg)
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, cfg.in_channels, 1, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)),
                         jnp.full((1,), 6.0))
    state = L.export_hyvideo(params, cfg)
    back = L.import_hyvideo(state, cfg)
    flat_a = L._tree_to_flat(params["params"])
    flat_b = L._tree_to_flat(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


# -- Wan2.1 video VAE (Wan-Video layout; also qwen_image_vae) -----------------


def test_wan_vae_key_parity_full_scale():
    from lanpaint_tpu.models.video_vae import WAN21_VAE_CONFIG

    man = M.wan_vae_manifest(WAN21_VAE_CONFIG)
    _key_parity(man, L._wan_vae_entries(WAN21_VAE_CONFIG), "")
    # headline facts of the public release
    assert man["encoder.conv1.weight"] == (96, 3, 3, 3, 3)
    assert man["encoder.head.2.weight"] == (32, 384, 3, 3, 3)
    assert man["decoder.conv1.weight"] == (384, 16, 3, 3, 3)
    assert man["decoder.upsamples.3.time_conv.weight"] == (768, 384, 3, 1, 1)
    assert man["decoder.head.2.weight"] == (3, 96, 3, 3, 3)


def test_wan_vae_shape_parity_tiny():
    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE

    cfg = TINY_WAN_VAE_CONFIG
    module = WanVAE(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, 5, 16, 16)))
    man = M.wan_vae_manifest(cfg)
    _shape_parity(man, L.export_wan_vae(params, cfg))


def test_wan_vae_import_export_roundtrip_tiny():
    import numpy as np

    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE

    cfg = TINY_WAN_VAE_CONFIG
    module = WanVAE(cfg)
    params = module.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 5, 16, 16)))
    state = L.export_wan_vae(params, cfg)
    back = L.import_wan_vae(state, cfg)
    flat_a = L._tree_to_flat(params["params"])
    flat_b = L._tree_to_flat(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


# -- Wan2.2 video VAE (vae2_2.py nested layout; recalled, see family_facts) --


def test_wan22_vae_key_parity_full_scale():
    from lanpaint_tpu.models.video_vae import WAN22_VAE_CONFIG

    man = M.wan_vae_manifest(WAN22_VAE_CONFIG)
    _key_parity(man, L._wan_vae_entries(WAN22_VAE_CONFIG), "")
    # headline facts: patch-2 input (12ch), 48-ch latents, width-keeping
    # upsample convs, nested Down_/Up_ResidualBlock indices
    assert man["encoder.conv1.weight"] == (160, 12, 3, 3, 3)
    assert man["encoder.head.2.weight"] == (96, 640, 3, 3, 3)
    assert man["decoder.conv1.weight"] == (640, 48, 3, 3, 3)
    assert man["decoder.upsamples.0.upsamples.3.resample.1.weight"] == \
        (640, 640, 3, 3)
    assert man["decoder.head.2.weight"] == (12, 160, 3, 3, 3)
    assert "encoder.downsamples.0.downsamples.0.residual.0.gamma" in man


def test_wan22_vae_shape_and_roundtrip_tiny():
    import numpy as np

    from lanpaint_tpu.models.video_vae import TINY_WAN22_VAE_CONFIG, WanVAE

    cfg = TINY_WAN22_VAE_CONFIG
    module = WanVAE(cfg)
    params = module.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 5, 32, 32)))
    _shape_parity(M.wan_vae_manifest(cfg), L.export_wan_vae(params, cfg))
    state = L.export_wan_vae(params, cfg)
    back = L.import_wan_vae(state, cfg)
    flat_a = L._tree_to_flat(params["params"])
    flat_b = L._tree_to_flat(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


# -- Qwen-Image (diffusers layout) --------------------------------------------


def test_qwen_key_parity_full_scale():
    from lanpaint_tpu.models.dit import QWEN_IMAGE_CONFIG

    man = M.qwen_manifest(QWEN_IMAGE_CONFIG)
    want = L.qwen_expected_keys(QWEN_IMAGE_CONFIG)
    assert set(man) == want, (
        f"leftover={sorted(set(man) - want)[:8]} "
        f"missing={sorted(want - set(man))[:8]}")


def test_qwen_shape_parity_tiny():
    from lanpaint_tpu.models.dit import TINY_DIT_CONFIG, MMDiT

    cfg = dataclasses.replace(TINY_DIT_CONFIG, depth_double=3, depth_single=0,
                              vec_dim=0, txt_norm=True)
    module = MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)))
    man = M.qwen_manifest(cfg)
    _shape_parity(man, L.export_qwen(params, cfg))


# -- HiDream-I1 (HiDream-ai layout) --------------------------------------------


def test_hidream_key_parity_full_scale():
    from lanpaint_tpu.models.hidream import HIDREAM_I1_CONFIG

    man = M.hidream_manifest(HIDREAM_I1_CONFIG)
    want = L.hidream_expected_keys(HIDREAM_I1_CONFIG)
    assert set(man) == want, (
        f"leftover={sorted(set(man) - want)[:8]} "
        f"missing={sorted(want - set(man))[:8]}")
    # headline facts of the public release: 2560 hidden, 16 double + 32
    # single blocks, one caption projection per block + T5, 4 experts,
    # 6912 SwiGLU width, fused 12-chunk double adaLN
    assert man["x_embedder.proj.weight"] == (2560, 64)
    assert man["caption_projection.47.linear.weight"] == (2560, 4096)
    assert man["caption_projection.48.linear.weight"] == (2560, 4096)
    assert "caption_projection.49.linear.weight" not in man
    assert man["double_stream_blocks.15.block.adaLN_modulation.1.weight"] == \
        (12 * 2560, 2560)
    assert man["single_stream_blocks.31.block.ff_i.experts.3.w1.weight"] == \
        (6912, 2560)
    assert man["double_stream_blocks.0.block.ff_i.gate.weight"] == (4, 2560)
    assert man["double_stream_blocks.0.block.attn1.q_rms_norm_t.weight"] == \
        (2560,)


def test_hidream_shape_parity_tiny():
    from lanpaint_tpu.models.hidream import TINY_HIDREAM_CONFIG, HiDreamModel

    cfg = TINY_HIDREAM_CONFIG
    module = HiDreamModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)),
                         jnp.zeros((2, 1, 4, cfg.llama_dim)))
    man = M.hidream_manifest(cfg)
    _shape_parity(man, L.export_hidream(params, cfg))


# -- Z-Image (Lumina2/NextDiT layout) -------------------------------------------


def test_zimage_key_parity_full_scale():
    from lanpaint_tpu.models.zimage import Z_IMAGE_S3_CONFIG

    man = M.zimage_manifest(Z_IMAGE_S3_CONFIG)
    _key_parity(man, L._zimage_entries(Z_IMAGE_S3_CONFIG), "")
    # workflow-pinned facts: Qwen3-4B (2560) text features via cap_embedder,
    # 16ch Flux-ae latents, scale-only final modulation from min(dim,1024)
    assert man["cap_embedder.0.weight"] == (2560,)
    assert man["cap_embedder.1.weight"][1] == 2560
    assert man["x_embedder.weight"][1] == 16 * 4
    assert man["final_layer.adaLN_modulation.1.weight"][1] == 1024
    assert "context_refiner.0.adaLN_modulation.1.weight" not in man
    assert "noise_refiner.0.adaLN_modulation.1.weight" in man


def test_zimage_shape_parity_tiny():
    from lanpaint_tpu.models.zimage import TINY_ZIMAGE_CONFIG, ZImageModel

    cfg = TINY_ZIMAGE_CONFIG
    module = ZImageModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.cap_dim)))
    man = M.zimage_manifest(cfg)
    _shape_parity(man, L.export_zimage(params, cfg))


def test_zimage_import_export_roundtrip_tiny():
    import numpy as np

    from lanpaint_tpu.models.zimage import TINY_ZIMAGE_CONFIG, ZImageModel

    cfg = TINY_ZIMAGE_CONFIG
    module = ZImageModel(cfg)
    params = module.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, cfg.in_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.cap_dim)))
    state = L.export_zimage(params, cfg)
    back = L.import_zimage(state, cfg)
    flat_a = L._tree_to_flat(params["params"])
    flat_b = L._tree_to_flat(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))
