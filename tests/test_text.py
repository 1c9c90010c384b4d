"""Text-conditioning assembly tests: shape/layout conventions per family,
plus the optional HF-transformers encoder path on tiny random models."""

import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


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


# --------------------------------------------------------------------------
# fully native pipeline: standalone tokenizer -> flax encoder -> cond dict


def _tiny_clip_native(width=16, proj=0):
    import jax

    from lanpaint_tpu import tokenizers as tk
    from lanpaint_tpu.models import textenc as TE

    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    for ch in sorted(byte_enc.values()):
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    tok = tk.ClipBpeTokenizer(vocab, [], bos_token_id=vocab["<|startoftext|>"],
                              eos_token_id=vocab["<|endoftext|>"])
    cfg = TE.CLIPTextConfig(vocab_size=len(vocab), width=width, layers=2,
                            heads=2, intermediate=32, projection_dim=proj,
                            eos_token_id=vocab["<|endoftext|>"])
    params = TE.CLIPTextEncoder(cfg).init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 77), jnp.int32))
    return T.NativeEncoder("clip", params, cfg, tok)


def _tiny_t5_native():
    import jax

    from lanpaint_tpu import tokenizers as tk
    from lanpaint_tpu.models import textenc as TE

    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -10.0), ("▁", -3.0)]
    pieces += [(f"▁{c}", -1.0) for c in "abcdefghijklmnopqrstuvwxyz"]
    pieces += [(c, -2.0) for c in "abcdefghijklmnopqrstuvwxyz"]
    tok = tk.UnigramTokenizer(pieces, unk_id=2, eos_token_id=1)
    cfg = TE.T5Config(vocab_size=len(pieces), d_model=16, head_dim=4, d_ff=32,
                      layers=2, heads=2, rel_buckets=8, rel_max_distance=16)
    params = TE.T5Encoder(cfg).init(jax.random.PRNGKey(1),
                                    jnp.zeros((1, 8), jnp.int32))
    return T.NativeEncoder("t5", params, cfg, tok)


def _tiny_llama_native():
    import jax

    from lanpaint_tpu import tokenizers as tk
    from lanpaint_tpu.models import textenc as TE

    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    tok = tk.BpeTokenizer(vocab, [])
    cfg = TE.LlamaConfig(vocab_size=len(vocab), dim=16, layers=2, heads=2,
                         kv_heads=1, intermediate=32)
    params = TE.LlamaEncoder(cfg).init(jax.random.PRNGKey(2),
                                       jnp.zeros((1, 8), jnp.int32))
    return T.NativeEncoder("llama", params, cfg, tok)


def test_native_encode_prompt_families():
    clip_l = _tiny_clip_native(width=8)
    clip_g = _tiny_clip_native(width=8, proj=24)
    t5 = _tiny_t5_native()
    llama = _tiny_llama_native()

    cond = T.encode_prompt("a cat", family="sd15", clip_l=clip_l)
    assert cond["context"].shape == (1, 77, 8)

    cond = T.encode_prompt("a cat", family="sdxl", clip_l=clip_l,
                           clip_g=clip_g, height=64, width=64)
    assert cond["context"].shape == (1, 77, 16)
    assert cond["y"].shape[0] == 1

    cond = T.encode_prompt("a cat", family="flux", clip_l=clip_g, t5=t5,
                           t5_length=32, guidance=3.5)
    assert cond["context"].shape == (1, 32, 16)
    assert cond["vec"].shape == (1, 24)
    assert cond["guidance"].shape == (1,)

    cond = T.encode_prompt("a cat", family="wan", t5=t5, t5_length=16)
    assert cond["context"].shape == (1, 16, 16)

    cond = T.encode_prompt("a cat", family="qwen", llama=llama)
    assert cond["context"].shape[0] == 1 and cond["context"].shape[2] == 16

    cond = T.encode_prompt("a cat", family="qwen3", llama=llama)
    assert cond["context"].shape[0] == 1 and cond["context"].shape[2] == 16

    cond = T.encode_prompt("a cat", family="hidream", clip_l=clip_g, t5=t5,
                           llama=llama, t5_length=16)
    assert cond["llama"].shape[0] == 2  # per-layer stack (layers, B, S, D)
    assert cond["vec"].shape == (1, 24)

    # hyvideo: template-cropped llama states + CLIP pooled; the video
    # template crops a longer system prefix than the image one
    ci = T.encode_prompt("a cat", family="hyvideo", clip_l=clip_g,
                         llama=llama)
    cv = T.encode_prompt("a cat", family="hyvideo", clip_l=clip_g,
                         llama=llama, video=True)
    assert ci["context"].shape[2] == 16 and ci["vec"].shape == (1, 24)
    n_img = len(llama.tokenizer.encode(
        T.HYVIDEO_IMAGE_TEMPLATE.format("a cat")))
    assert ci["context"].shape[1] == n_img - T.HYVIDEO_IMAGE_CROP
    n_vid = len(llama.tokenizer.encode(
        T.HYVIDEO_VIDEO_TEMPLATE.format("a cat")))
    assert cv["context"].shape[1] == n_vid - T.HYVIDEO_VIDEO_CROP

    for text in ("a cat", "a very different prompt!"):
        c = T.encode_prompt(text, family="sd3", clip_l=clip_l, clip_g=clip_g,
                            t5=t5)
        assert c["context"].shape == (1, 77 + 154, 16)
        assert np.all(np.isfinite(np.asarray(c["context"], np.float32)))


def test_qwen_template_prefix_drop():
    llama = _tiny_llama_native()
    # default template: prefix hidden states dropped
    c_tpl = T.encode_prompt("a cat", family="qwen", llama=llama)
    c_raw = T.encode_prompt("a cat", family="qwen", llama=llama,
                            template=None)
    assert c_tpl["context"].shape[1] < c_raw["context"].shape[1] + 300
    # explicit template + custom drop
    c = T.encode_prompt("a cat", family="qwen", llama=llama,
                        template="XX{}", drop_prefix_tokens=2)
    assert c["context"].shape[1] == c_raw["context"].shape[1]
