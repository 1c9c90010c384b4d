"""LanPaintPipeline: single-file checkpoint -> prompt -> inpainted pixels.

Builds a real single-file checkpoint on disk from tiny exported components
(UNet + CLIP + VAE with the SD1.x prefixes), then runs the whole pipeline
through from_single_file: split, import, tokenize, encode, sample, decode,
blend."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu import tokenizers as tk
from lanpaint_tpu.models import textenc as TE
from lanpaint_tpu.models.load import export_clip, export_unet, export_vae
from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
from lanpaint_tpu.models.vae import TINY_VAE_CONFIG, VAE
from lanpaint_tpu.models.zoo import build_tiny_unet, init_params_host
from lanpaint_tpu.pipeline import LanPaintPipeline


def _clip_vocab_files(tmp_path):
    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    for ch in sorted(byte_enc.values()):
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab), encoding="utf-8")
    mp.write_text("#version: 0.2\n", encoding="utf-8")
    return str(vp), str(mp), vocab


@pytest.fixture(scope="module")
def tiny_clip_cfg():
    return TE.CLIPTextConfig(vocab_size=2 * 256 + 2, width=32, layers=2,
                             heads=2, intermediate=64, projection_dim=0,
                             eos_token_id=2 * 256 + 1)


def _single_file_state(tiny_clip_cfg):
    _, unet_params = build_tiny_unet()
    vae_params = init_params_host(VAE(TINY_VAE_CONFIG),
                                  jnp.zeros((1, 3, 32, 32), jnp.float32))
    clip_params = TE.CLIPTextEncoder(tiny_clip_cfg).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32))
    state = {}
    for k, v in export_unet(unet_params, TINY_UNET_CONFIG, prefix="").items():
        state["model.diffusion_model." + k] = v
    for k, v in export_vae(vae_params, TINY_VAE_CONFIG, prefix="").items():
        state["first_stage_model." + k] = v
    for k, v in export_clip(clip_params, tiny_clip_cfg).items():
        state["cond_stage_model.transformer." + k] = v
    return state


def test_pipeline_from_single_file_end_to_end(tmp_path, tiny_clip_cfg):
    vp, mp, _vocab = _clip_vocab_files(tmp_path)
    state = _single_file_state(tiny_clip_cfg)
    pipe = LanPaintPipeline.from_single_file(
        "<in-memory>", state=state, vocab=vp, merges=mp,
        unet_config=TINY_UNET_CONFIG, clip_l_config=tiny_clip_cfg,
        vae_config=TINY_VAE_CONFIG, height=32, width=32)
    assert pipe.family == "sd15"
    assert set(pipe.encoders) == {"clip_l"}

    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 3, 32, 32)), jnp.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a cat on a mat", image=img, mask=mask, steps=3, num_steps=2,
               blend_overlap=3)
    assert out.shape == (1, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # pixels far outside the (dilated+feathered) mask are blend-preserved
    np.testing.assert_allclose(np.asarray(out[..., :2, :]),
                               np.asarray(img[..., :2, :]), atol=1e-5)


def test_pipeline_encode_and_latent_sampling(tmp_path, tiny_clip_cfg):
    vp, mp, _ = _clip_vocab_files(tmp_path)
    state = _single_file_state(tiny_clip_cfg)
    pipe = LanPaintPipeline.from_single_file(
        "<in-memory>", state=state, vocab=vp, merges=mp,
        unet_config=TINY_UNET_CONFIG, clip_l_config=tiny_clip_cfg,
        vae_config=TINY_VAE_CONFIG)
    cond = pipe.encode("hello world")
    assert cond["context"].shape == (1, 77, 32)
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    mask = np.ones((64, 64), np.float32)
    out = pipe.sample(positive=cond, latent=latent, mask=mask, seed=1,
                      steps=3, cfg=2.0, sampler_name="euler",
                      scheduler="karras", num_steps=1)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


# --------------------------------------------------------------------------
# from_components: the multi-file DiT-family layout (UNETLoader +
# DualCLIPLoader + VAELoader node trio)


def _tiny_clip_state(width=12, proj=16, seed=3):
    cfg = TE.CLIPTextConfig(vocab_size=2 * 256 + 2, width=width, layers=2,
                            heads=2, intermediate=24, projection_dim=proj,
                            eos_token_id=2 * 256 + 1)
    params = TE.CLIPTextEncoder(cfg).init(jax.random.PRNGKey(seed),
                                          jnp.zeros((1, 77), jnp.int32))
    from lanpaint_tpu.models.load import export_clip

    return export_clip(params, cfg), cfg


def _tiny_t5_state(d_model=32):
    from lanpaint_tpu.models.load import export_t5

    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -10.0), ("▁", -3.0)]
    pieces += [(f"▁{c}", -1.0) for c in "abcdefghijklmnopqrstuvwxyz"]
    tok = tk.UnigramTokenizer(pieces, unk_id=2, eos_token_id=1)
    cfg = TE.T5Config(vocab_size=len(pieces), d_model=d_model, head_dim=4,
                      d_ff=48, layers=2, heads=2, rel_buckets=8,
                      rel_max_distance=16)
    params = TE.T5Encoder(cfg).init(jax.random.PRNGKey(4),
                                    jnp.zeros((1, 8), jnp.int32))
    return export_t5(params, cfg), cfg, tok


def _tiny_vae_state():
    from lanpaint_tpu.models.load import export_vae

    params = init_params_host(VAE(TINY_VAE_CONFIG),
                              jnp.zeros((1, 3, 32, 32), jnp.float32))
    return export_vae(params, TINY_VAE_CONFIG, prefix="")


def test_from_components_flux(tmp_path):
    from lanpaint_tpu.models.dit import TINY_DIT_CONFIG
    from lanpaint_tpu.models.load import export_dit
    from lanpaint_tpu.models.zoo import build_tiny_dit

    vp, mp, _ = _clip_vocab_files(tmp_path)
    _, dit_params = build_tiny_dit()
    clip_state, clip_cfg = _tiny_clip_state(proj=TINY_DIT_CONFIG.vec_dim)
    t5_state, t5_cfg, t5_tok = _tiny_t5_state(TINY_DIT_CONFIG.context_dim)

    pipe = LanPaintPipeline.from_components(
        family="flux", model=export_dit(dit_params, TINY_DIT_CONFIG),
        vae=_tiny_vae_state(), clip_l=clip_state, t5=t5_state,
        clip_vocab=vp, clip_merges=mp, t5_tokenizer=t5_tok,
        model_config=TINY_DIT_CONFIG, vae_config=TINY_VAE_CONFIG,
        clip_l_config=clip_cfg, t5_config=t5_cfg, height=32, width=32)
    assert set(pipe.encoders) == {"clip_l", "t5"}

    img = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 3, 32, 32)), jnp.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a corgi", image=img, mask=mask, steps=3, num_steps=2,
               blend_overlap=3, cfg=1.0, encode_kw={"t5_length": 16})
    assert out.shape == (1, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[..., :2, :]),
                               np.asarray(img[..., :2, :]), atol=1e-5)


def test_from_components_sd35(tmp_path):
    from lanpaint_tpu.models.load import export_sd3
    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG
    from lanpaint_tpu.models.zoo import build_sd3

    vp, mp, _ = _clip_vocab_files(tmp_path)
    _, sd3_params = build_sd3(TINY_SD3_CONFIG, name="tiny-sd3")
    clip_l_state, cl_cfg = _tiny_clip_state(width=12, proj=8)
    clip_g_state, cg_cfg = _tiny_clip_state(width=12, proj=8, seed=5)
    t5_state, t5_cfg, t5_tok = _tiny_t5_state(TINY_SD3_CONFIG.context_dim)

    pipe = LanPaintPipeline.from_components(
        family="sd35",
        model=export_sd3(sd3_params, TINY_SD3_CONFIG),  # prefixed layout
        vae=_tiny_vae_state(), clip_l=clip_l_state, clip_g=clip_g_state,
        t5=t5_state, clip_vocab=vp, clip_merges=mp, t5_tokenizer=t5_tok,
        model_config=TINY_SD3_CONFIG, vae_config=TINY_VAE_CONFIG,
        clip_l_config=cl_cfg, clip_g_config=cg_cfg, t5_config=t5_cfg,
        height=32, width=32)
    assert pipe.family == "sd3"

    cond = pipe.encode("hello", sd3_t5_length=8)
    assert cond["context"].shape == (1, 77 + 8, TINY_SD3_CONFIG.context_dim)
    assert cond["vec"].shape == (1, TINY_SD3_CONFIG.vec_dim)

    img = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (1, 3, 32, 32)), jnp.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a corgi", image=img, mask=mask, steps=3, num_steps=1,
               blend_overlap=3, cfg=1.0, encode_kw={"sd3_t5_length": 8})
    assert out.shape == (1, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_from_components_qwen_with_vision(tmp_path):
    import dataclasses

    from lanpaint_tpu.models.dit import TINY_DIT_CONFIG
    from lanpaint_tpu.models.load import (
        export_dit, export_llama, export_qwen_vl_vision, export_wan_vae,
    )
    from lanpaint_tpu.models.video_vae import TINY_WAN_VAE_CONFIG, WanVAE
    from lanpaint_tpu.models.vision import QwenVLVision, TINY_VL_VISION_CONFIG
    from lanpaint_tpu.models.zoo import build_dit

    dit_cfg = dataclasses.replace(TINY_DIT_CONFIG, vec_dim=0)
    _, dit_params = build_dit(dit_cfg, name="tiny-qwen")

    llama_cfg = TE.LlamaConfig(
        vocab_size=601, dim=TINY_DIT_CONFIG.context_dim, layers=2, heads=2,
        kv_heads=1, intermediate=48, qkv_bias=True,
        mrope_section=(4, 2, 2))  # head_dim 16
    llama_params = TE.LlamaEncoder(llama_cfg).init(
        jax.random.PRNGKey(6), jnp.zeros((1, 8), jnp.int32))
    vis_cfg = dataclasses.replace(TINY_VL_VISION_CONFIG,
                                  out_hidden=TINY_DIT_CONFIG.context_dim)
    vis_params = QwenVLVision(vis_cfg, (1, 8, 8)).init(
        jax.random.PRNGKey(7), jnp.zeros((64, 24), jnp.float32))
    llama_state = dict(export_llama(llama_params, llama_cfg))
    llama_state.update(export_qwen_vl_vision(vis_params, vis_cfg))

    vae = WanVAE(TINY_WAN_VAE_CONFIG)
    vae_params = vae.init(jax.random.PRNGKey(8),
                          jnp.zeros((1, 3, 1, 32, 32), jnp.float32))

    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    tok = tk.BpeTokenizer(vocab, [], added_tokens={"<|image_pad|>": 600})

    pipe = LanPaintPipeline.from_components(
        family="qwen", model=export_dit(dit_params, dit_cfg),
        vae=export_wan_vae(vae_params, TINY_WAN_VAE_CONFIG),
        llama=llama_state, llama_tokenizer=tok, with_vision=True,
        model_config=dit_cfg, vae_config=TINY_WAN_VAE_CONFIG,
        llama_config=llama_cfg, vision_config=vis_cfg,
        height=32, width=32)
    assert set(pipe.encoders) == {"llama", "vision"}

    # text-only conditioning must NOT see the vision encoder
    cond = pipe.encode("hello")
    assert cond["context"].shape[2] == TINY_DIT_CONFIG.context_dim

    # image conditioning: vision tokens spliced into the prompt sequence
    src = np.random.default_rng(3).random((16, 16, 3)).astype(np.float32)
    cond_img = pipe.encode("make it red", image=src, image_pad_id=600)
    assert cond_img["context"].shape[2] == TINY_DIT_CONFIG.context_dim
    assert cond_img["context"].shape[1] > cond["context"].shape[1]

    # full pixel edit through the single-frame Wan VAE adapter
    img = jnp.asarray(
        np.random.default_rng(4).uniform(-1, 1, (1, 3, 32, 32)), jnp.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a corgi", image=img, mask=mask, steps=3, num_steps=1,
               blend_overlap=3, cfg=1.0)
    assert out.shape == (1, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
