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
