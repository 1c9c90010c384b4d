"""Qwen2.5-VL vision tower golden tests vs the torch reference
(transformers modeling_qwen2_5_vl.py) — windowed attention ordering,
padded edge windows, RoPE, merger, and the weight importer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu.models.load import (
    expected_keys, _qwen_vl_vision_entries, import_qwen_vl_vision,
)
from lanpaint_tpu.models.vision import (
    QwenVLVision, TINY_VL_VISION_CONFIG, preprocess_image, smart_resize,
)

torch = pytest.importorskip("torch")


def _torch_tiny(cfg):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    hf_cfg = Qwen2_5_VLVisionConfig(
        depth=cfg.depth, hidden_size=cfg.hidden, num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate, in_channels=cfg.in_channels,
        patch_size=cfg.patch_size,
        temporal_patch_size=cfg.temporal_patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        window_size=cfg.window_size,
        fullatt_block_indexes=list(cfg.fullatt_block_indexes),
        out_hidden_size=cfg.out_hidden, hidden_act="silu",
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg)
    return model.eval()


@pytest.mark.parametrize("grid", [(1, 8, 12), (1, 6, 10)])
def test_vision_tower_matches_torch(grid):
    """(1, 8, 12): every window full; (1, 6, 10): padded edge windows —
    both must match the HF forward (which filters pads via cu_seqlens
    where we pad + mask) to fp32 tolerance."""
    cfg = TINY_VL_VISION_CONFIG
    model = _torch_tiny(cfg)

    t, h, w = grid
    s = t * h * w
    rng = np.random.default_rng(3)
    patches = rng.standard_normal(
        (s, cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2)
    ).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(patches),
                     grid_thw=torch.tensor([list(grid)])).numpy()

    sd = {f"visual.{k}": v.numpy() for k, v in model.state_dict().items()}
    params = import_qwen_vl_vision(sd, cfg)
    got = QwenVLVision(cfg, grid).apply(params, jnp.asarray(patches))

    assert got.shape == want.shape == (s // cfg.merge_unit, cfg.out_hidden)
    with jax.default_matmul_precision("highest"):
        got = QwenVLVision(cfg, grid).apply(params, jnp.asarray(patches))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_importer_consumes_every_vision_key():
    """Manifest check: the importer covers the HF vision state dict exactly
    (a renamed key in either direction fails here)."""
    cfg = TINY_VL_VISION_CONFIG
    model = _torch_tiny(cfg)
    have = {f"visual.{k}" for k in model.state_dict().keys()}
    want = expected_keys(_qwen_vl_vision_entries(cfg), "visual.")
    # conv3d patch embed has no bias in the checkpoint
    want -= {"visual.patch_embed.proj.bias"}
    assert want == have


def test_preprocess_matches_hf_patch_order():
    """preprocess_image must flatten patches exactly like the HF
    Qwen2VLImageProcessor (resize off; same normalize + patch transpose)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    cfg = dataclasses.replace(TINY_VL_VISION_CONFIG, patch_size=14,
                              window_size=112)
    rng = np.random.default_rng(5)
    img = rng.random((56, 84, 3)).astype(np.float32)  # multiples of 28

    proc = Qwen2VLImageProcessor(do_resize=False, do_rescale=False,
                                 patch_size=14, temporal_patch_size=2,
                                 merge_size=2)
    out = proc(images=[(img * 255).astype(np.uint8)], do_rescale=True)
    want = out["pixel_values"]
    grid_hf = tuple(int(v) for v in out["image_grid_thw"][0])

    got, grid = preprocess_image((img * 255).astype(np.uint8) / 255.0, cfg,
                                 resize=False)
    assert grid == grid_hf
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multimodal_splice_matches_torch_vl_model():
    """The COMPLETE Qwen-Image-Edit conditioning path — vision tower ->
    token splice at <|image_pad|> -> multimodal-rope text stack — must
    match the full HF Qwen2_5_VLModel forward (which routes pixel_values
    through get_image_features + get_rope_index internally)."""
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLModel,
    )

    from lanpaint_tpu.models.load import import_llama
    from lanpaint_tpu.models.textenc import LlamaConfig, LlamaEncoder
    from lanpaint_tpu.text import qwen_vl_pos_ids

    vcfg = TINY_VL_VISION_CONFIG
    grid = (1, 6, 10)                      # padded edge windows
    n_vis = 6 * 10 // vcfg.merge_unit      # 15 merged tokens
    IMG, VSTART, VEND = 190, 191, 192

    hf = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=200, hidden_size=vcfg.out_hidden,
            intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 1]},
            max_position_embeddings=512),
        vision_config=dict(
            depth=vcfg.depth, hidden_size=vcfg.hidden,
            num_heads=vcfg.num_heads, intermediate_size=vcfg.intermediate,
            in_channels=3, patch_size=vcfg.patch_size,
            temporal_patch_size=vcfg.temporal_patch_size,
            spatial_merge_size=vcfg.spatial_merge_size,
            window_size=vcfg.window_size,
            fullatt_block_indexes=list(vcfg.fullatt_block_indexes),
            out_hidden_size=vcfg.out_hidden, hidden_act="silu"),
        image_token_id=IMG, video_token_id=189,
        vision_start_token_id=VSTART, vision_end_token_id=VEND,
    )
    hf._attn_implementation = "eager"
    hf.text_config._attn_implementation = "eager"
    hf.vision_config._attn_implementation = "eager"
    torch.manual_seed(1)
    model = Qwen2_5_VLModel(hf).eval()

    rng = np.random.default_rng(7)
    s_raw = grid[1] * grid[2]
    patches = rng.standard_normal(
        (s_raw, 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2)
    ).astype(np.float32)
    ids = [3, 17, 42, 5, VSTART] + [IMG] * n_vis + [VEND, 9, 11, 2]
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([list(grid)]),
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tcfg = LlamaConfig(vocab_size=200, dim=vcfg.out_hidden, layers=2,
                       heads=4, kv_heads=2, intermediate=48,
                       rope_theta=10000.0, qkv_bias=True, rms_eps=1e-6,
                       mrope_section=(1, 1, 1))
    tparams = import_llama(sd, tcfg, prefix="language_model.")
    vparams = import_qwen_vl_vision(sd, vcfg, prefix="visual.")

    with jax.default_matmul_precision("highest"):
        vis = QwenVLVision(vcfg, grid).apply(vparams, jnp.asarray(patches))
        pos = ids.index(IMG)
        emb = tparams["params"]["embed_tokens"][np.asarray(ids)][None]
        emb = emb.at[0, pos:pos + n_vis].set(vis)
        pos_ids = qwen_vl_pos_ids(pos, grid, len(ids) - pos - n_vis)
        _hs, got = LlamaEncoder(tcfg).apply(
            tparams, jnp.asarray(np.asarray(ids, np.int32))[None],
            embeds=emb, pos_ids=jnp.asarray(pos_ids))

    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_smart_resize_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    for hw in [(30, 58), (1024, 768), (4000, 3000), (57, 57)]:
        assert smart_resize(*hw) == hf_smart_resize(*hw)
