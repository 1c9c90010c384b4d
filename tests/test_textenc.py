"""Golden tests: flax text encoders vs HuggingFace transformers (torch CPU).

Tiny random-init HF models are the ground truth; state dicts go through the
real import_* mappers, so these validate both the layer math and the
checkpoint mapping end to end (the same path a real CLIP-L/T5-XXL/Llama-3.1
safetensors file takes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(autouse=True)
def _full_precision_matmul():
    """XLA-CPU's default matmul precision is reduced (oneDNN bf16-ish);
    golden comparisons vs torch fp32 need real fp32 contractions."""
    with jax.default_matmul_precision("highest"):
        yield

from lanpaint_tpu.models import load as L  # noqa: E402
from lanpaint_tpu.models import textenc as TE  # noqa: E402


def _np_state(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _ids(rng, vocab, b=2, s=10, eos=None):
    ids = rng.integers(4, vocab, size=(b, s))
    if eos is not None:
        ids[0, 5] = eos
        ids[1, 7] = eos
    return ids


# --------------------------------------------------------------------------
# CLIP


def _tiny_clip_cfgs(act="quick_gelu", proj=24):
    hf = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=77, hidden_act=act, projection_dim=proj,
        eos_token_id=3, bos_token_id=2, pad_token_id=1)
    ours = TE.CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=4,
                             intermediate=64, act=act, projection_dim=proj,
                             eos_token_id=3)
    return hf, ours


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_golden(act):
    torch.manual_seed(0)
    hf_cfg, cfg = _tiny_clip_cfgs(act=act)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    ids = _ids(np.random.default_rng(0), 100, eos=3)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)

    params = L.import_clip(_np_state(hf), cfg)
    hs, last_ln, pooled = TE.CLIPTextEncoder(cfg).apply(params, jnp.asarray(ids))

    # every hidden state incl. embeddings (HF indexing), penultimate is [-2]
    for i in range(cfg.layers + 1):
        np.testing.assert_allclose(np.asarray(hs[i], np.float32),
                                   out.hidden_states[i].numpy(),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last_ln, np.float32),
                               out.last_hidden_state.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               out.text_embeds.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_encode_clip_skip():
    _, cfg = _tiny_clip_cfgs()
    import jax

    params = TE.CLIPTextEncoder(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5), jnp.int32))
    ids = jnp.asarray(_ids(np.random.default_rng(1), 100, eos=3))
    hs, _, _ = TE.CLIPTextEncoder(cfg).apply(params, ids)
    hidden, _ = TE.clip_encode(params, ids, cfg, clip_skip=2)
    np.testing.assert_array_equal(np.asarray(hidden), np.asarray(hs[-2]))


def test_clip_roundtrip():
    import jax

    _, cfg = _tiny_clip_cfgs()
    params = TE.CLIPTextEncoder(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5), jnp.int32))
    state = L.export_clip(params, cfg)
    again = L.import_clip(state, cfg)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, again))


# --------------------------------------------------------------------------
# T5 / UMT5


def _tiny_t5_hf(cls, vocab=100):
    return cls(transformers.T5Config(
        vocab_size=vocab, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        is_gated_act=True, tie_word_embeddings=False)).eval()


def test_t5_golden_with_mask():
    torch.manual_seed(0)
    hf = _tiny_t5_hf(transformers.T5EncoderModel)
    cfg = TE.T5Config(vocab_size=100, d_model=32, head_dim=8, d_ff=64,
                      layers=2, heads=4, rel_buckets=8, rel_max_distance=16)
    ids = _ids(np.random.default_rng(2), 100)
    mask = np.ones_like(ids)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
    params = L.import_t5(_np_state(hf), cfg)
    out = TE.t5_encode(params, jnp.asarray(ids), cfg, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_umt5_golden():
    torch.manual_seed(0)
    hf = transformers.UMT5EncoderModel(transformers.UMT5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        is_gated_act=True, tie_word_embeddings=False)).eval()
    cfg = TE.T5Config(vocab_size=100, d_model=32, head_dim=8, d_ff=64,
                      layers=2, heads=4, rel_buckets=8, rel_max_distance=16,
                      per_layer_rel_bias=True)
    ids = _ids(np.random.default_rng(3), 100)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state
    params = L.import_t5(_np_state(hf), cfg)
    out = TE.t5_encode(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_t5_roundtrip():
    import jax

    cfg = TE.T5Config(vocab_size=50, d_model=16, head_dim=4, d_ff=32,
                      layers=2, heads=4, rel_buckets=8, rel_max_distance=16)
    params = TE.T5Encoder(cfg).init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 5), jnp.int32))
    again = L.import_t5(L.export_t5(params, cfg), cfg)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, again))


# --------------------------------------------------------------------------
# Llama / Qwen2


def test_llama_golden_gqa_rope_scaling():
    torch.manual_seed(0)
    hf = transformers.LlamaModel(transformers.LlamaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 16},
        attention_bias=False, rms_norm_eps=1e-5)).eval()
    cfg = TE.LlamaConfig(vocab_size=100, dim=32, layers=2, heads=4,
                         kv_heads=2, intermediate=64, rope_theta=10000.0,
                         rope_scaling=(8.0, 1.0, 4.0, 16))
    ids = _ids(np.random.default_rng(4), 100)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids), output_hidden_states=True)
    params = L.import_llama(_np_state(hf), cfg, prefix="")
    hs, final = TE.llama_encode(params, jnp.asarray(ids), cfg)
    # HF hidden_states: [emb, after layer 1, ..., norm(after last layer)]
    for i in range(cfg.layers):
        np.testing.assert_allclose(np.asarray(hs[i], np.float32),
                                   ref.hidden_states[i].numpy(),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final, np.float32),
                               ref.last_hidden_state.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_qwen2_golden_qkv_bias():
    torch.manual_seed(0)
    hf = transformers.Qwen2Model(transformers.Qwen2Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, rope_theta=10000.0,
        rms_norm_eps=1e-6)).eval()
    cfg = TE.LlamaConfig(vocab_size=100, dim=32, layers=2, heads=4,
                         kv_heads=2, intermediate=64, rope_theta=10000.0,
                         qkv_bias=True, rms_eps=1e-6)
    ids = _ids(np.random.default_rng(5), 100)
    mask = np.ones_like(ids)
    mask[0, 8:] = 0
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
    params = L.import_llama(_np_state(hf), cfg, prefix="")
    _, final = TE.llama_encode(params, jnp.asarray(ids), cfg,
                               jnp.asarray(mask))
    # padded key columns are masked in both; compare valid rows only
    np.testing.assert_allclose(np.asarray(final[0, :8], np.float32),
                               ref.numpy()[0, :8], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final[1], np.float32),
                               ref.numpy()[1], rtol=1e-4, atol=1e-5)


def test_llama_roundtrip():
    import jax

    cfg = TE.LlamaConfig(vocab_size=50, dim=16, layers=2, heads=4,
                         kv_heads=2, intermediate=32, qkv_bias=True)
    params = TE.LlamaEncoder(cfg).init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 5), jnp.int32))
    again = L.import_llama(L.export_llama(params, cfg), cfg)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), params, again))


# --------------------------------------------------------------------------
# OpenCLIP layout (single-file SD2.x/SDXL checkpoints) + checkpoint split


def _hf_to_openclip(sd, layers, width):
    """Convert an HF CLIPTextModelWithProjection state dict into the
    OpenCLIP text-tower layout embedded in single-file checkpoints."""
    out = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        # OpenCLIP stores text_projection as (width, proj) used as x @ proj
        "text_projection": sd["text_projection.weight"].T,
    }
    for i in range(layers):
        hf = f"text_model.encoder.layers.{i}."
        oc = f"transformer.resblocks.{i}."
        out[oc + "attn.in_proj_weight"] = np.concatenate(
            [sd[hf + f"self_attn.{n}_proj.weight"] for n in "qkv"], axis=0)
        out[oc + "attn.in_proj_bias"] = np.concatenate(
            [sd[hf + f"self_attn.{n}_proj.bias"] for n in "qkv"], axis=0)
        out[oc + "attn.out_proj.weight"] = sd[hf + "self_attn.out_proj.weight"]
        out[oc + "attn.out_proj.bias"] = sd[hf + "self_attn.out_proj.bias"]
        out[oc + "ln_1.weight"] = sd[hf + "layer_norm1.weight"]
        out[oc + "ln_1.bias"] = sd[hf + "layer_norm1.bias"]
        out[oc + "ln_2.weight"] = sd[hf + "layer_norm2.weight"]
        out[oc + "ln_2.bias"] = sd[hf + "layer_norm2.bias"]
        out[oc + "mlp.c_fc.weight"] = sd[hf + "mlp.fc1.weight"]
        out[oc + "mlp.c_fc.bias"] = sd[hf + "mlp.fc1.bias"]
        out[oc + "mlp.c_proj.weight"] = sd[hf + "mlp.fc2.weight"]
        out[oc + "mlp.c_proj.bias"] = sd[hf + "mlp.fc2.bias"]
    return out


def test_openclip_layout_import_matches_hf_import():
    torch.manual_seed(0)
    hf_cfg, cfg = _tiny_clip_cfgs(act="gelu")
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    sd = _np_state(hf)
    p_hf = L.import_clip(sd, cfg)
    p_oc = L.import_clip_openclip(_hf_to_openclip(sd, cfg.layers, cfg.width), cfg)
    import jax

    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), p_hf, p_oc))
    ids = jnp.asarray(_ids(np.random.default_rng(7), 100, eos=3))
    hs_a, ln_a, po_a = TE.CLIPTextEncoder(cfg).apply(p_hf, ids)
    hs_b, ln_b, po_b = TE.CLIPTextEncoder(cfg).apply(p_oc, ids)
    np.testing.assert_array_equal(np.asarray(po_a), np.asarray(po_b))


def test_split_checkpoint_sdxl_single_file():
    state = {
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros(1),
        "first_stage_model.encoder.conv_in.weight": np.zeros(2),
        "conditioner.embedders.0.transformer.text_model.final_layer_norm.weight": np.zeros(3),
        "conditioner.embedders.1.model.ln_final.weight": np.zeros(4),
        "unrelated.key": np.zeros(5),
    }
    comps = L.split_checkpoint(state)
    assert set(comps) == {"unet", "vae", "clip_l", "clip_g"}
    assert "input_blocks.0.0.weight" in comps["unet"]
    assert "text_model.final_layer_norm.weight" in comps["clip_l"]
    assert "ln_final.weight" in comps["clip_g"]


def test_split_checkpoint_sd3_style():
    state = {
        "model.diffusion_model.x_embedder.proj.weight": np.zeros(1),
        "text_encoders.clip_l.transformer.text_model.final_layer_norm.weight": np.zeros(2),
        "text_encoders.clip_g.transformer.text_model.final_layer_norm.weight": np.zeros(3),
        "text_encoders.t5xxl.transformer.shared.weight": np.zeros(4),
        "vae.decoder.conv_in.weight": np.zeros(5),
    }
    comps = L.split_checkpoint(state)
    assert set(comps) == {"unet", "vae", "clip_l", "clip_g", "t5"}
    assert "shared.weight" in comps["t5"]


def test_qwen3_golden_qk_norm_head_dim():
    """Qwen3 (the Anima/Klein/Krea2/Ideogram4 prompt-encoder family):
    per-head RMS qk-norm before RoPE and head_dim decoupled from
    hidden//heads, vs transformers Qwen3Model."""
    torch.manual_seed(0)
    hf = transformers.Qwen3Model(transformers.Qwen3Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=64, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_bias=False)).eval()
    cfg = TE.LlamaConfig(vocab_size=100, dim=32, layers=2, heads=4,
                         kv_heads=2, intermediate=64, rope_theta=10000.0,
                         rms_eps=1e-6, head_dim=16, qk_norm=True)
    ids = _ids(np.random.default_rng(7), 100)
    mask = np.ones_like(ids)
    mask[0, 8:] = 0
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
    params = L.import_llama(_np_state(hf), cfg, prefix="")
    _, final = TE.llama_encode(params, jnp.asarray(ids), cfg,
                               attn_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(final, np.float32)[:, :8],
                               ref.numpy()[:, :8], rtol=1e-4, atol=1e-5)


def test_qwen3_full_scale_config_facts():
    """The vendored Qwen3 configs match the public releases' headline dims."""
    for cfg, dim, layers, inter in [
        (TE.QWEN3_06B_CONFIG, 1024, 28, 3072),
        (TE.QWEN3_4B_CONFIG, 2560, 36, 9728),
        (TE.QWEN3_8B_CONFIG, 4096, 36, 12288),
    ]:
        assert (cfg.dim, cfg.layers, cfg.intermediate) == (dim, layers, inter)
        assert cfg.head_width == 128 and cfg.qk_norm and cfg.kv_heads == 8
