"""Checkpoint-mapping tests: export -> import roundtrips must reproduce the
flax tree exactly (proves the key tables cover every parameter bijectively),
plus functional equivalence of the reloaded model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu.models import load as L
from lanpaint_tpu.models.dit import TINY_DIT_CONFIG, MMDiT
from lanpaint_tpu.models.unet import TINY_UNET_CONFIG, UNetModel
from lanpaint_tpu.models.wan import TINY_WAN_CONFIG, WanModel


def _tree_eq(a, b, path=()):
    assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_eq(a[k], b[k], path + (k,))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=str(path + (k,)))


def test_unet_roundtrip_exact():
    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                         jnp.zeros((1, 8, cfg.context_dim)), None)
    state = L.export_unet(params, cfg)
    assert all(k.startswith("model.diffusion_model.") for k in state)
    back = L.import_unet(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_unet_roundtrip_functional():
    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.context_dim))
    params = module.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None)
    back = L.import_unet(L.export_unet(params, cfg), cfg)
    y0 = module.apply(params, x, jnp.full((1,), 10.0), ctx, None)
    y1 = module.apply(back, x, jnp.full((1,), 10.0), ctx, None)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_unet_key_names_match_public_layout():
    """Spot-check the emitted key names against the known LDM layout."""
    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                         jnp.zeros((1, 8, cfg.context_dim)), None)
    keys = set(L.export_unet(params, cfg))
    for want in [
        "model.diffusion_model.time_embed.0.weight",
        "model.diffusion_model.input_blocks.0.0.weight",
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight",
        "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
        "model.diffusion_model.middle_block.0.emb_layers.1.bias",
        "model.diffusion_model.output_blocks.0.0.skip_connection.weight",
        "model.diffusion_model.out.2.bias",
    ]:
        assert want in keys, want


def test_dit_roundtrip_exact():
    cfg = TINY_DIT_CONFIG
    module = MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)))
    state = L.export_dit(params, cfg)
    assert "double_blocks.0.img_attn.qkv.weight" in state
    assert "single_blocks.0.linear1.weight" in state
    assert "final_layer.linear.bias" in state
    back = L.import_dit(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_qwen_roundtrip_exact():
    """Diffusers-layout Qwen-Image mapping: split to_q/to_k/to_v fuse into
    qkv, norm_out halves swap (scale,shift)->(shift,scale), txt_norm maps."""
    import dataclasses

    cfg = dataclasses.replace(TINY_DIT_CONFIG, depth_double=3, depth_single=0,
                              vec_dim=0, txt_norm=True)
    module = MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)))
    state = L.export_qwen(params, cfg)
    assert "transformer_blocks.0.attn.add_q_proj.weight" in state
    assert "transformer_blocks.2.attn.norm_added_k.weight" in state
    assert "txt_norm.weight" in state
    assert "norm_out.linear.weight" in state
    # every exported key is in the expected-key manifest hook and vice versa
    assert set(state) == L.qwen_expected_keys(cfg)
    back = L.import_qwen(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_sd3_roundtrip_exact():
    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG, SD3MMDiT

    cfg = TINY_SD3_CONFIG
    module = SD3MMDiT(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)))
    state = L.export_sd3(params, cfg)
    # public SD3.5 key layout spot checks
    for want in [
        "model.diffusion_model.x_embedder.proj.weight",
        "model.diffusion_model.pos_embed",
        "model.diffusion_model.t_embedder.mlp.0.weight",
        "model.diffusion_model.y_embedder.mlp.2.bias",
        "model.diffusion_model.context_embedder.weight",
        "model.diffusion_model.joint_blocks.0.x_block.attn.qkv.weight",
        "model.diffusion_model.joint_blocks.0.x_block.attn.ln_q.weight",
        "model.diffusion_model.joint_blocks.0.x_block.attn2.proj.bias",
        "model.diffusion_model.joint_blocks.1.context_block.mlp.fc1.weight",
        "model.diffusion_model.joint_blocks.3.context_block.adaLN_modulation.1.weight",
        "model.diffusion_model.final_layer.linear.weight",
    ]:
        assert want in state, want
    # the pre-only last context block must NOT emit proj/mlp tensors
    assert ("model.diffusion_model.joint_blocks.3.context_block.attn.proj.weight"
            not in state)
    # conv patch embed keeps torch OIHW layout on export
    assert state["model.diffusion_model.x_embedder.proj.weight"].shape == (
        cfg.hidden, cfg.in_channels, cfg.patch, cfg.patch)
    back = L.import_sd3(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_sd3_roundtrip_functional():
    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG, SD3MMDiT

    cfg = TINY_SD3_CONFIG
    module = SD3MMDiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_channels, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.context_dim))
    vec = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.vec_dim))
    t = jnp.full((1,), 0.5)
    params = module.init(jax.random.PRNGKey(0), x, t, ctx, vec)
    back = L.import_sd3(L.export_sd3(params, cfg), cfg)
    y0 = module.apply(params, x, t, ctx, vec)
    y1 = module.apply(back, x, t, ctx, vec)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_hidream_roundtrip_exact():
    from lanpaint_tpu.models.hidream import TINY_HIDREAM_CONFIG, HiDreamModel

    cfg = TINY_HIDREAM_CONFIG
    module = HiDreamModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.latent_channels, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)),
                         jnp.zeros((1, cfg.vec_dim)),
                         jnp.zeros((2, 1, 4, cfg.llama_dim)))
    state = L.export_hidream(params, cfg)
    # public HiDream-I1 layout (spot checks; full key-set parity is
    # tests/test_manifests.py::test_hidream_key_parity_full_scale)
    for want in [
        "x_embedder.proj.weight",
        "t_embedder.timestep_embedder.linear_1.weight",
        "p_embedder.pooled_embedder.linear_2.bias",
        "caption_projection.0.linear.weight",
        f"caption_projection.{cfg.depth_double + cfg.depth_single}.linear.weight",
        "double_stream_blocks.0.block.attn1.to_q.weight",
        "double_stream_blocks.0.block.attn1.to_q_t.bias",
        "double_stream_blocks.0.block.attn1.q_rms_norm.weight",
        "double_stream_blocks.0.block.attn1.k_rms_norm_t.weight",
        "double_stream_blocks.0.block.ff_i.shared_experts.w1.weight",
        "double_stream_blocks.0.block.ff_i.experts.3.w2.weight",
        "double_stream_blocks.0.block.ff_i.gate.weight",
        "double_stream_blocks.0.block.ff_t.w3.weight",
        "double_stream_blocks.1.block.adaLN_modulation.1.weight",
        "single_stream_blocks.0.block.ff_i.experts.0.w1.weight",
        "single_stream_blocks.1.block.adaLN_modulation.1.weight",
        "final_layer.linear.weight",
    ]:
        assert want in state, want
    # per-expert torch layout: (inner, hidden) Linear weights
    assert state["single_stream_blocks.0.block.ff_i.experts.0.w1.weight"
                 ].shape == (cfg.ffn_dim, cfg.hidden)
    # fused 12-chunk double adaLN vs 6-chunk single
    assert state["double_stream_blocks.0.block.adaLN_modulation.1.weight"
                 ].shape == (12 * cfg.hidden, cfg.hidden)
    assert state["single_stream_blocks.0.block.adaLN_modulation.1.weight"
                 ].shape == (6 * cfg.hidden, cfg.hidden)
    back = L.import_hidream(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_wan_roundtrip_exact():
    cfg = TINY_WAN_CONFIG
    module = WanModel(cfg)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.in_channels, 4, 16, 16)),
                         jnp.full((1,), 0.5),
                         jnp.zeros((1, 8, cfg.context_dim)))
    state = L.export_wan(params, cfg)
    assert "blocks.0.self_attn.q.weight" in state
    assert "patch_embedding.weight" in state
    assert state["patch_embedding.weight"].shape == (
        cfg.hidden, cfg.in_channels, *cfg.patch)
    back = L.import_wan(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_fp8_scaled_dequant(tmp_path):
    """fp8_scaled safetensors load path (Wan2.2 deployment format)."""
    import torch
    from safetensors.torch import save_file

    w = torch.randn(4, 4)
    scale = torch.tensor(2.0)
    f8 = (w / scale).to(torch.float8_e4m3fn)
    path = str(tmp_path / "m.safetensors")
    save_file({"blocks.0.ffn.0.weight": f8,
               "blocks.0.ffn.0.scale_weight": scale}, path)
    out = L.load_safetensors(path)
    got = out["blocks.0.ffn.0.weight"]
    want = f8.to(torch.float32).numpy() * 2.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lora_merge_kohya_and_diffusers():
    """LoRA pairs in both public layouts merge with W += s*(a/r)*up@down;
    unmatched pairs raise."""
    from lanpaint_tpu.models.lora import apply_lora

    rng = np.random.default_rng(0)
    w_lin = rng.standard_normal((8, 6), np.float32)
    w_conv = rng.standard_normal((8, 4, 3, 3), np.float32)
    state = {
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight": w_conv,
        "model.diffusion_model.middle_block.1.proj_in.weight": w_lin,
    }
    r = 2
    down_l = rng.standard_normal((r, 6), np.float32)
    up_l = rng.standard_normal((8, r), np.float32)
    down_c = rng.standard_normal((r, 4, 3, 3), np.float32)
    up_c = rng.standard_normal((8, r, 1, 1), np.float32)
    lora = {
        # kohya names the conv weight
        "lora_unet_input_blocks_1_0_in_layers_2.lora_down.weight": down_c,
        "lora_unet_input_blocks_1_0_in_layers_2.lora_up.weight": up_c,
        "lora_unet_input_blocks_1_0_in_layers_2.alpha": np.float32(4.0),
        # diffusers/PEFT names the linear weight
        "model.diffusion_model.middle_block.1.proj_in.lora_A.weight": down_l,
        "model.diffusion_model.middle_block.1.proj_in.lora_B.weight": up_l,
    }
    out = apply_lora(state, lora, strength=0.5)
    want_lin = w_lin + 0.5 * (r / r) * (up_l @ down_l)
    np.testing.assert_allclose(
        out["model.diffusion_model.middle_block.1.proj_in.weight"],
        want_lin, rtol=1e-6)
    delta_c = (up_c.reshape(8, r) @ down_c.reshape(r, -1)).reshape(8, 4, 3, 3)
    want_conv = w_conv + 0.5 * (4.0 / r) * delta_c
    np.testing.assert_allclose(
        out["model.diffusion_model.input_blocks.1.0.in_layers.2.weight"],
        want_conv, rtol=1e-6)
    # originals untouched
    np.testing.assert_array_equal(
        state["model.diffusion_model.middle_block.1.proj_in.weight"], w_lin)

    with pytest.raises(KeyError, match="no matching"):
        apply_lora(state, {"lora_unet_nope.lora_down.weight": down_l,
                           "lora_unet_nope.lora_up.weight": up_l})


def test_lora_end_to_end_changes_forward():
    """Merging a LoRA through export->apply->import changes the model
    forward (full pipeline wiring check)."""
    from lanpaint_tpu.models.lora import apply_lora

    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.context_dim))
    params = module.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None)
    state = L.export_unet(params, cfg)
    key = "model.diffusion_model.middle_block.1.proj_in.weight"
    o, i = state[key].shape[:2]
    rng = np.random.default_rng(3)
    lora = {
        "lora_unet_middle_block_1_proj_in.lora_down.weight":
            rng.standard_normal((2, i), np.float32),
        "lora_unet_middle_block_1_proj_in.lora_up.weight":
            rng.standard_normal((o, 2), np.float32),
    }
    merged = L.import_unet(apply_lora(state, lora, strength=1.0), cfg)
    y0 = module.apply(params, x, jnp.full((1,), 10.0), ctx, None)
    y1 = module.apply(merged, x, jnp.full((1,), 10.0), ctx, None)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


@pytest.mark.parametrize("family", ["flux2", "klein", "krea2", "anima", "qwen"])
def test_dit_roundtrip_structural_variants(family):
    """Tiny-ified clones of the config-level families (Flux.2 / Qwen):
    the entry tables must cover every structural variation (guidance_embed
    on/off, vec_dim zero/nonzero, asymmetric depths).  Z-Image left this
    list in r3: it now has a real S3-DiT module + manifest suite
    (models/zimage.py, test_manifests.py::test_zimage_*)."""
    import dataclasses

    from lanpaint_tpu.models.dit import (
        ANIMA_CONFIG, FLUX2_DEV_CONFIG, FLUX2_KLEIN_CONFIG, KREA2_CONFIG,
        QWEN_IMAGE_CONFIG,
    )

    base = {"flux2": FLUX2_DEV_CONFIG, "klein": FLUX2_KLEIN_CONFIG,
            "krea2": KREA2_CONFIG, "anima": ANIMA_CONFIG,
            "qwen": QWEN_IMAGE_CONFIG}[family]
    cfg = dataclasses.replace(
        base, hidden=64, num_heads=4, depth_double=2,
        depth_single=(0 if base.depth_single == 0 else 3),
        context_dim=32, vec_dim=(16 if base.vec_dim else 0),
        axes_dim=(4, 6, 6))  # sum == head_dim (64/4)
    module = MMDiT(cfg)
    args = [jnp.zeros((1, cfg.latent_channels, 16, 16)), jnp.full((1,), 0.5),
            jnp.zeros((1, 8, cfg.context_dim))]
    args.append(jnp.zeros((1, cfg.vec_dim)) if cfg.vec_dim else None)
    kw = {"guidance": jnp.full((1,), 3.0)} if cfg.guidance_embed else {}
    params = module.init(jax.random.PRNGKey(0), *args, **kw)
    if cfg.txt_norm:
        # Qwen uses its own diffusers-layout mapper (covered by
        # test_qwen_roundtrip_exact); the flux-layout table has no txt_norm
        state = L.export_qwen(params, cfg)
        back = L.import_qwen(state, cfg)
        _tree_eq(params["params"], back["params"])
        return
    state = L.export_dit(params, cfg)
    if cfg.guidance_embed:
        assert "guidance_in.in_layer.weight" in state
    else:
        assert "guidance_in.in_layer.weight" not in state
    if cfg.vec_dim:
        assert "vector_in.in_layer.weight" in state
    back = L.import_dit(state, cfg)
    _tree_eq(params["params"], back["params"])


def test_unet_fused_qkv_matches_unfused():
    """Import-time QKV fusion (UNetConfig.fused_qkv, the r3 perf lever) must
    be a pure layout change: same public checkpoint keys, identical forward.
    """
    import dataclasses

    cfg_f = dataclasses.replace(TINY_UNET_CONFIG, fused_qkv=True,
                                dtype=jnp.float32)
    cfg_u = dataclasses.replace(TINY_UNET_CONFIG, fused_qkv=False,
                                dtype=jnp.float32)
    mu, mf = UNetModel(cfg_u), UNetModel(cfg_f)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg_u.context_dim))
    pu = mu.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx, None)
    state = L.export_unet(pu, cfg_u)
    # same public key set either way
    assert set(state) == set(L.export_unet(L.import_unet(state, cfg_f), cfg_f))
    pf = L.import_unet(state, cfg_f)
    # fused runtime layout present
    blk = pf["params"]["down_0_0_attn"]["blocks"]["block"]
    assert "to_qkv" in blk["attn1"] and "to_k" not in blk["attn1"]
    assert "kv_cross" in pf["params"]["down_0_0_attn"]
    y_u = mu.apply(pu, x, jnp.full((1,), 10.0), ctx, None)
    y_f = mf.apply(pf, x, jnp.full((1,), 10.0), ctx, None)
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_f),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("family", ["flux2-dev", "flux2-klein", "krea2",
                                    "anima", "ideogram4"])
def test_standin_import_guard_reports_census_diff(family):
    """The stand-in families' guarded importer must fail LOUDLY with an
    actionable key-census diff when a real checkpoint deviates from the
    vendored topology — never a deep shape error (VERDICT r2 item 9)."""
    import dataclasses

    from lanpaint_tpu.models.dit import (
        ANIMA_CONFIG, FLUX2_DEV_CONFIG, FLUX2_KLEIN_CONFIG, IDEOGRAM4_CONFIG,
        KREA2_CONFIG, MMDiT,
    )

    base = {"flux2-dev": FLUX2_DEV_CONFIG, "flux2-klein": FLUX2_KLEIN_CONFIG,
            "krea2": KREA2_CONFIG, "anima": ANIMA_CONFIG,
            "ideogram4": IDEOGRAM4_CONFIG}[family]
    cfg = dataclasses.replace(
        base, hidden=64, num_heads=4, depth_double=2,
        depth_single=(0 if base.depth_single == 0 else 3),
        context_dim=32, vec_dim=(16 if base.vec_dim else 0),
        axes_dim=(4, 6, 6))
    module = MMDiT(cfg)
    args = [jnp.zeros((1, cfg.latent_channels, 16, 16)), jnp.full((1,), 0.5),
            jnp.zeros((1, 8, cfg.context_dim))]
    args.append(jnp.zeros((1, cfg.vec_dim)) if cfg.vec_dim else None)
    kw = {"guidance": jnp.full((1,), 3.0)} if cfg.guidance_embed else {}
    params = module.init(jax.random.PRNGKey(0), *args, **kw)
    state = L.export_dit(params, cfg)

    # matching census imports cleanly
    back = L.import_dit_guarded(state, cfg, family=family)
    _tree_eq(params["params"], back["params"])

    # a checkpoint with a different block count / alien keys fails with the
    # census diff, not a shape error
    bad = dict(state)
    dropped = "double_blocks.0.img_attn.qkv.weight"
    del bad[dropped]
    bad["transformer_blocks.0.attn.to_q.weight"] = state[
        "double_blocks.0.img_attn.qkv.weight"]
    with pytest.raises(ValueError) as ei:
        L.import_dit_guarded(bad, cfg, family=family)
    msg = str(ei.value)
    assert family in msg
    assert "1 expected keys absent" in msg
    assert dropped in msg
    assert "1 checkpoint keys the stand-in would drop" in msg
    assert "family_facts" in msg
