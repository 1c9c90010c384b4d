"""Text-conditioning assembly tests: shape/layout conventions per family,
plus the optional HF-transformers encoder path on tiny random models."""

import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu import text as T


def test_sdxl_cond_assembly():
    h_l = np.ones((2, 77, 768), np.float32)
    h_g = np.full((2, 77, 1280), 2.0, np.float32)
    pooled = np.zeros((2, 1280), np.float32)
    cond = T.sdxl_cond(h_l, h_g, pooled, height=1024, width=1024)
    assert cond["context"].shape == (2, 77, 2048)
    np.testing.assert_array_equal(np.asarray(cond["context"][..., :768]), 1.0)
    np.testing.assert_array_equal(np.asarray(cond["context"][..., 768:]), 2.0)
    assert cond["y"].shape == (2, 2816)


def test_sd3_cond_zero_padded_clip_concat():
    t5 = np.ones((1, 10, 4096), np.float32)
    h_l = np.full((1, 7, 768), 3.0, np.float32)
    h_g = np.full((1, 7, 1280), 4.0, np.float32)
    cond = T.sd3_cond(t5, h_l, h_g, np.zeros((1, 768)), np.zeros((1, 1280)))
    ctx = np.asarray(cond["context"])
    assert ctx.shape == (1, 17, 4096)
    # clip tokens first: 768 of L, 1280 of G, zero pad to 4096
    np.testing.assert_array_equal(ctx[:, :7, :768], 3.0)
    np.testing.assert_array_equal(ctx[:, :7, 768:2048], 4.0)
    np.testing.assert_array_equal(ctx[:, :7, 2048:], 0.0)
    np.testing.assert_array_equal(ctx[:, 7:], 1.0)
    assert cond["vec"].shape == (1, 2048)


def test_flux_cond_guidance():
    cond = T.flux_cond(np.zeros((3, 8, 64)), np.zeros((3, 16)), guidance=3.5)
    assert cond["guidance"].shape == (3,)
    np.testing.assert_allclose(np.asarray(cond["guidance"]), 3.5)
    assert "guidance" not in T.flux_cond(np.zeros((1, 8, 64)), np.zeros((1, 16)))


def test_hidream_cond_llama_stack():
    cond = T.hidream_cond(np.zeros((1, 8, 64)), np.zeros((1, 16)),
                          np.zeros((4, 1, 8, 32)))
    assert cond["llama"].shape == (4, 1, 8, 32)


def test_encode_prompt_hf_tiny_clip():
    """End-to-end HF path with a tiny randomly-initialized CLIP (no
    downloads): tokenizer-free check is impossible, so build a tiny
    tokenizer from the model's vocab."""
    transformers = pytest.importorskip("transformers")
    import torch

    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=16)
    model = CLIPTextModel(cfg)

    class FakeTok:
        def __call__(self, prompts, **kw):
            n = kw.get("max_length", 8)
            ids = torch.zeros((len(prompts), n), dtype=torch.long)
            return {"input_ids": ids}

    cond = T.encode_prompt_hf("a cat", clip_l=model, tokenizer_l=FakeTok(),
                              family="sd15", max_length=8)
    assert cond["context"].shape == (1, 8, 16)
    assert bool(jnp.all(jnp.isfinite(cond["context"])))
