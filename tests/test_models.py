"""Model-zoo tests on tiny configs: shape correctness, jit-ability,
finite outputs, and end-to-end inpainting through the full pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu import ksampler
from lanpaint_tpu.models.dit import image_ids, pack_latent, unpack_latent
from lanpaint_tpu.models.unet import sdxl_pooled_y
from lanpaint_tpu.models.zoo import (
    build_tiny_dit,
    build_tiny_unet,
    build_tiny_wan,
    switching_denoiser,
)


@pytest.fixture(scope="module")
def tiny_unet():
    return build_tiny_unet()


@pytest.fixture(scope="module")
def tiny_dit():
    return build_tiny_dit()


@pytest.fixture(scope="module")
def tiny_wan():
    return build_tiny_wan()


def test_unet_forward_shapes(tiny_unet, key):
    den, _ = tiny_unet
    x = jax.random.normal(key, (2, 4, 16, 16), jnp.float32)
    cond = {"context": jnp.zeros((2, 8, 32), jnp.float32)}
    x0 = jax.jit(den.apply)(x, jnp.full((2,), 5.0), cond)
    assert x0.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x0)))


def test_unet_sigma_zero_identity(tiny_unet, key):
    """At sigma=0 the eps wrapper returns x0 = x exactly."""
    den, _ = tiny_unet
    x = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    x0 = den.apply(x, jnp.zeros((1,)), cond)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=1e-5)


def test_dit_forward_shapes(tiny_dit, key):
    den, _ = tiny_dit
    x = jax.random.normal(key, (2, 4, 16, 16), jnp.float32)
    cond = {"context": jnp.zeros((2, 8, 32), jnp.float32),
            "vec": jnp.zeros((2, 16), jnp.float32)}
    x0 = jax.jit(den.apply)(x, jnp.full((2,), 0.7), cond)
    assert x0.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x0)))


def test_dit_ref_tokens_conditioning(tiny_dit, key):
    """Qwen-Edit-style reference-latent tokens change the prediction but not
    the output shape."""
    den, _ = tiny_dit
    x = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    base_cond = {"context": jnp.zeros((1, 8, 32), jnp.float32),
                 "vec": jnp.zeros((1, 16), jnp.float32)}
    ref = jax.random.normal(jax.random.fold_in(key, 1), (1, 10, 16), jnp.float32)
    with_ref = dict(base_cond, ref_tokens=ref)
    y0 = den.apply(x, jnp.full((1,), 0.7), base_cond)
    y1 = den.apply(x, jnp.full((1,), 0.7), with_ref)
    assert y1.shape == x.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_wan_forward_shapes(tiny_wan, key):
    den, _ = tiny_wan
    x = jax.random.normal(key, (1, 4, 4, 16, 16), jnp.float32)  # B,C,F,H,W
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    x0 = jax.jit(den.apply)(x, jnp.full((1,), 0.6), cond)
    assert x0.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x0)))


def test_pack_unpack_roundtrip(key):
    x = jax.random.normal(key, (2, 16, 8, 12), jnp.float32)
    t = pack_latent(x, 2)
    assert t.shape == (2, 4 * 6, 64)
    np.testing.assert_array_equal(np.asarray(unpack_latent(t, 8, 12, 2)),
                                  np.asarray(x))


def test_image_ids_layout():
    ids = np.asarray(image_ids(1, 8, 8, 2))
    assert ids.shape == (1, 16, 3)
    assert (ids[0, :, 0] == 0).all()
    assert ids[0, 5, 1] == 1 and ids[0, 5, 2] == 1  # row-major (y, x)


def test_sdxl_pooled_y_dim():
    y = sdxl_pooled_y(jnp.zeros((2, 1280), jnp.float32), 1024, 1024)
    assert y.shape == (2, 2816)


def test_switching_denoiser_routes_by_timestep(tiny_wan, key):
    den_high, _ = tiny_wan
    den_low, _ = build_tiny_wan(seed=1)
    moe = switching_denoiser(den_high, den_low, boundary=0.5)
    x = jax.random.normal(key, (1, 4, 4, 8, 8), jnp.float32)
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    hi = moe.apply(x, jnp.full((1,), 0.9), cond)
    lo = moe.apply(x, jnp.full((1,), 0.1), cond)
    want_hi = den_high.apply(x, jnp.full((1,), 0.9), cond)
    want_lo = den_low.apply(x, jnp.full((1,), 0.1), cond)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(want_hi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(want_lo), atol=1e-6)


def test_dual_model_denoiser_routes_by_cfg_branch(key):
    """Ideogram4 DualModelGuider pattern: positive CFG branch runs model A,
    negative branch runs model B; the mix equals the hand-computed CFG."""
    from lanpaint_tpu.models.zoo import dual_model_denoiser

    a, _ = build_tiny_dit(seed=0)
    b_, _ = build_tiny_dit(seed=1)
    dual = dual_model_denoiser(a, b_, name="dual")
    x = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    t = jnp.full((1,), 0.6)
    cond = {"context": jnp.ones((1, 8, 32), jnp.float32),
            "vec": jnp.zeros((1, 16), jnp.float32)}
    neg = dict(cond, model_select=jnp.ones(()))
    # routing: select=0 -> model A on cond; select=1 -> model B on same cond
    # (atol, not exactness: lax.cond traces the branch as one compiled unit,
    # whose bf16 fusion differs slightly from the eager per-op dispatch)
    np.testing.assert_allclose(np.asarray(dual.apply(x, t, cond)),
                               np.asarray(a.apply(x, t, cond)),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dual.apply(x, t, neg)),
                               np.asarray(b_.apply(x, t, cond)),
                               rtol=0, atol=2e-3)
    # full CFG mix through the guidance double pass (sequential)
    from lanpaint_tpu.guidance import make_cfg_double_denoiser

    den = make_cfg_double_denoiser(dual.apply, cond, neg, cfg=4.0,
                                   cfg_big=4.0, sequential=True)
    x0, x0_big = den(x, t)
    xa = np.asarray(a.apply(x, t, cond))
    xb = np.asarray(b_.apply(x, t, cond))
    np.testing.assert_allclose(np.asarray(x0), xb + 4.0 * (xa - xb),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_big), rtol=1e-6)


def test_unet_end_to_end_inpaint(tiny_unet, key):
    """Full pipeline over a real (tiny) UNet: runs, finite, known region kept."""
    den, _ = tiny_unet
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    uncond = {"context": jnp.ones((1, 8, 32), jnp.float32)}
    out = ksampler(den, seed=0, steps=4, cfg=3.0, sampler_name="euler",
                   scheduler="normal", positive=cond, negative=uncond,
                   latent=latent, mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dit_end_to_end_inpaint(tiny_dit, key):
    den, _ = tiny_dit
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[8:, :] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32),
            "vec": jnp.zeros((1, 16), jnp.float32)}
    out = ksampler(den, seed=0, steps=4, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hyvideo_end_to_end_inpaint(key):
    """HunyuanVideo DiT (reference Hunyuan_Inpaint.json family) sampled as
    single-frame T2I through the full pipeline, distilled-guidance cond."""
    from lanpaint_tpu.models.hyvideo import TINY_HYVIDEO_CONFIG
    from lanpaint_tpu.models.zoo import build_tiny_hyvideo

    cfg = TINY_HYVIDEO_CONFIG
    den, _ = build_tiny_hyvideo()
    latent = jax.random.normal(key, (1, cfg.in_channels, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[8:, :] = 1.0
    cond = {"context": jnp.zeros((1, 8, cfg.context_dim), jnp.float32),
            "vec": jnp.zeros((1, cfg.vec_dim), jnp.float32),
            "guidance": jnp.full((1,), 6.0)}
    out = ksampler(den, seed=0, steps=4, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hyvideo_multiframe_forward(key):
    """5D video path: 4 frames through pack/RoPE/unpack keep shape+finite."""
    from lanpaint_tpu.models.hyvideo import TINY_HYVIDEO_CONFIG
    from lanpaint_tpu.models.zoo import build_tiny_hyvideo

    cfg = TINY_HYVIDEO_CONFIG
    den, _ = build_tiny_hyvideo()
    x = jax.random.normal(key, (1, cfg.in_channels, 4, 8, 8), jnp.float32)
    cond = {"context": jnp.zeros((1, 8, cfg.context_dim), jnp.float32),
            "vec": jnp.zeros((1, cfg.vec_dim), jnp.float32)}
    x0 = den.apply(x, jnp.full((1,), 0.7), cond)
    assert x0.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(x0)))


def test_sd3_end_to_end_inpaint(key):
    """SD3.5-family MMDiT (dual-attn prefix + pre-only last context block)
    through the full inpaint pipeline."""
    from lanpaint_tpu.models.zoo import build_tiny_sd3

    den, _ = build_tiny_sd3()
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[8:, :] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32),
            "vec": jnp.zeros((1, 16), jnp.float32)}
    out = ksampler(den, seed=0, steps=4, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sd3_pos_embed_centered_crop(key):
    """The learned pos-embed is center-cropped per resolution (public MMDiT
    cropped_pos_embed): two resolutions must read overlapping center rows."""
    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG, SD3MMDiT

    cfg = TINY_SD3_CONFIG
    module = SD3MMDiT(cfg)
    ctx = jnp.zeros((1, 8, cfg.context_dim))
    vec = jnp.zeros((1, cfg.vec_dim))
    t = jnp.full((1,), 0.5)
    x16 = jnp.zeros((1, cfg.in_channels, 16, 16))
    params = module.init(jax.random.PRNGKey(0), x16, t, ctx, vec)
    # both resolutions must run off the same (max-size) pos_embed table
    for hw in (16, 24, 32):
        out = module.apply(params, jnp.zeros((1, cfg.in_channels, hw, hw)),
                           t, ctx, vec)
        assert out.shape == (1, cfg.in_channels, hw, hw)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_moe_feedforward_routing(key):
    """The MoE FF must equal shared(x) + sum of the renormalized top-k
    routed experts computed by hand (dense-einsum formulation check)."""
    import dataclasses

    import numpy as onp

    from lanpaint_tpu.models.hidream import TINY_HIDREAM_CONFIG, MoEFeedForward

    cfg = dataclasses.replace(TINY_HIDREAM_CONFIG, dtype=jnp.float32)
    m = MoEFeedForward(cfg)
    x = jax.random.normal(key, (1, 5, cfg.hidden), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)

    pp = p["params"]
    xf = onp.asarray(x, onp.float32)

    def dense(name, v):
        k = onp.asarray(pp["shared"][name]["kernel"], onp.float32)
        return v @ k

    def silu(v):
        return v / (1 + onp.exp(-v))

    shared = dense("w2", silu(dense("w1", xf)) * dense("w3", xf))
    logits = xf @ onp.asarray(pp["gate"]["kernel"], onp.float32)
    probs = onp.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    order = onp.argsort(-probs, axis=-1)[..., :cfg.num_activated]
    routed = onp.zeros_like(shared)
    for b in range(xf.shape[0]):
        for s in range(xf.shape[1]):
            top = order[b, s]
            w = probs[b, s, top]
            w = w / w.sum()
            for e_i, wi in zip(top, w):
                w1 = onp.asarray(pp["experts_w1"][e_i], onp.float32)
                w2 = onp.asarray(pp["experts_w2"][e_i], onp.float32)
                w3 = onp.asarray(pp["experts_w3"][e_i], onp.float32)
                v = xf[b, s]
                routed[b, s] += wi * ((silu(v @ w1) * (v @ w3)) @ w2)
    np.testing.assert_allclose(np.asarray(out), shared + routed,
                               rtol=1e-4, atol=1e-5)


def test_hidream_end_to_end_inpaint(key):
    """HiDream MoE-MMDiT (double+single streams, per-block llama slices)
    through the full inpaint pipeline."""
    from lanpaint_tpu.models.zoo import build_tiny_hidream

    den, _ = build_tiny_hidream()
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[8:, :] = 1.0
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32),
            "vec": jnp.zeros((1, 16), jnp.float32),
            "llama": jnp.zeros((2, 1, 4, 24), jnp.float32)}
    out = ksampler(den, seed=0, steps=3, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wan_end_to_end_video_inpaint(tiny_wan, key):
    """5D video latent + frame-stack mask through the full pipeline
    (reference video path, nodes.py:113-114, 40-71)."""
    den, _ = tiny_wan
    latent = jax.random.normal(key, (1, 4, 4, 16, 16), jnp.float32)
    mask = np.zeros((4, 1, 32, 32), np.float32)  # (F, C, H, W) frame masks
    mask[2:, :, :, :] = 1.0  # repaint the last two frames
    cond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    out = ksampler(den, seed=0, steps=3, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2, video=True)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_control_injection(key):
    """control dict residuals must change the forward; zero residuals must
    be a no-op (comfy apply_control semantics, input/middle/output slots)."""
    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG, UNetModel

    cfg = TINY_UNET_CONFIG
    module = UNetModel(cfg)
    x = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    ctx = jnp.zeros((1, 8, cfg.context_dim), jnp.float32)
    t = jnp.full((1,), 10.0)
    params = module.init(jax.random.PRNGKey(0), x, t, ctx, None)

    y_base = module.apply(params, x, t, ctx, None)
    # n_skips = 1 + levels*res_blocks + (levels-1) = 1 + 2 + 1 = 4
    zeros_ctl = {
        "input": [jnp.zeros((1, 16, 16, 32)), jnp.zeros((1, 16, 16, 32)),
                  jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 8, 8, 64))],
        "middle": jnp.zeros((1, 8, 8, 64)),
    }
    y_zero = module.apply(params, x, t, ctx, None, zeros_ctl)
    np.testing.assert_array_equal(np.asarray(y_base), np.asarray(y_zero))

    mid_only = {"middle": jnp.ones((1, 8, 8, 64))}
    y_mid = module.apply(params, x, t, ctx, None, mid_only)
    assert not np.allclose(np.asarray(y_base), np.asarray(y_mid))

    out_only = {"output": [jnp.ones((1, 16, 16, 32))]}  # first-produced skip
    y_out = module.apply(params, x, t, ctx, None, out_only)
    assert not np.allclose(np.asarray(y_base), np.asarray(y_out))


def test_controlnet_shapes_and_zero_init(key):
    """ControlNet produces one residual per skip position; zero-initialized
    projections make it an exact no-op at init (cldm design)."""
    from lanpaint_tpu.models.controlnet import ControlNet
    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG, UNetModel

    cfg = TINY_UNET_CONFIG
    cn = ControlNet(cfg)
    x = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    hint = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 128, 128))
    ctx = jnp.zeros((1, 8, cfg.context_dim), jnp.float32)
    t = jnp.full((1,), 10.0)
    cn_params = cn.init(jax.random.PRNGKey(1), x, hint, t, ctx, None)
    ctl = cn.apply(cn_params, x, hint, t, ctx, None)
    assert len(ctl["output"]) == 4
    assert ctl["middle"].shape == (1, 8, 8, 64)
    # zero convs at init -> all residuals exactly zero
    for c in ctl["output"]:
        np.testing.assert_array_equal(np.asarray(c), 0.0)
    np.testing.assert_array_equal(np.asarray(ctl["middle"]), 0.0)

    # UNet with init-state control == UNet without
    module = UNetModel(cfg)
    params = module.init(jax.random.PRNGKey(0), x, t, ctx, None)
    y0 = module.apply(params, x, t, ctx, None)
    y1 = module.apply(params, x, t, ctx, None, ctl)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_controlnet_roundtrip_and_end_to_end(key):
    from lanpaint_tpu.models import load as L
    from lanpaint_tpu.models.controlnet import ControlNet
    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
    from lanpaint_tpu.models.zoo import build_controlled_unet

    cfg = TINY_UNET_CONFIG
    cn = ControlNet(cfg)
    x = jnp.zeros((1, 4, 16, 16))
    hint = jnp.zeros((1, 3, 128, 128))
    ctx = jnp.zeros((1, 8, cfg.context_dim))
    cn_params = cn.init(jax.random.PRNGKey(1), x, hint, jnp.zeros((1,)), ctx, None)
    state = L.export_controlnet(cn_params, cfg)
    for want in ["control_model.input_hint_block.0.weight",
                 "control_model.input_hint_block.14.bias",
                 "control_model.zero_convs.0.0.weight",
                 "control_model.zero_convs.3.0.weight",
                 "control_model.middle_block_out.0.weight",
                 "control_model.input_blocks.1.0.in_layers.2.weight",
                 "control_model.time_embed.0.weight"]:
        assert want in state, want
    assert "control_model.out.2.weight" not in state  # encoder only
    back = L.import_controlnet(state, cfg)

    def tree_eq(a, b):
        ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        assert len(ja) == len(jb)
        for u, v in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    tree_eq(cn_params["params"], back["params"])

    # end-to-end: hint-conditioned denoiser through the inpaint pipeline
    den, _ = build_controlled_unet(cfg)
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0
    cond = {"context": jnp.zeros((1, 8, cfg.context_dim), jnp.float32),
            "hint": jax.random.normal(jax.random.fold_in(key, 2),
                                      (1, 3, 128, 128), jnp.float32)}
    out = ksampler(den, seed=0, steps=3, cfg=1.0, sampler_name="euler",
                   scheduler="normal", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_taesd_decoder_shapes_and_roundtrip(key):
    """TAESD preview decoder: 8x upsample to RGB; sequential-layout
    checkpoint mapping roundtrips exactly."""
    from lanpaint_tpu.models.taesd import (
        TAESDDecoder,
        export_taesd_decoder,
        import_taesd_decoder,
    )

    m = TAESDDecoder(latent_channels=4)
    z = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), z)
    rgb = m.apply(params, z)
    assert rgb.shape == (1, 3, 64, 64)
    assert bool(jnp.all(jnp.isfinite(rgb)))

    state = export_taesd_decoder(params)
    for want in ["decoder.1.weight", "decoder.3.conv.0.weight",
                 "decoder.7.weight", "decoder.12.weight",
                 "decoder.17.weight", "decoder.18.conv.4.weight",
                 "decoder.19.bias"]:
        assert want in state, want
    assert "decoder.7.bias" not in state  # upsample convs are bias-free
    back = import_taesd_decoder(state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # preview wiring: throttled callback decodes every 2nd step
    from lanpaint_tpu.utils import make_preview_callback

    frames = []
    cb = make_preview_callback(
        lambda i, den: frames.append((int(i), m.apply(params, den).shape)),
        every=2)
    for i in range(5):
        cb(i, z, z)
    assert [f[0] for f in frames] == [0, 2, 4]
    assert all(f[1] == (1, 3, 64, 64) for f in frames)


def test_zimage_end_to_end_inpaint(key):
    """Z-Image S3-DiT (context/noise refiners + main single-stream layers,
    GQA fused qkv, sandwich norms) through the full inpaint pipeline."""
    from lanpaint_tpu.models.zoo import build_tiny_zimage

    den, _ = build_tiny_zimage()
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[8:, :] = 1.0
    cond = {"context": jnp.zeros((1, 8, 24), jnp.float32)}
    out = ksampler(den, seed=0, steps=3, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2)
    assert out.shape == latent.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_kv_precompute_matches_per_forward(key):
    """The run-constant cross-KV hoist (zoo.unet_precompute_kv /
    Denoiser.precompute) is pure layout: enriching cond with the
    precomputed "kv_cache" must reproduce the per-forward einsum exactly
    (fp32 compute so the comparison is rounding-free)."""
    import dataclasses

    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
    from lanpaint_tpu.models.zoo import build_unet

    cfg = dataclasses.replace(TINY_UNET_CONFIG, dtype=jnp.float32)
    den, params = build_unet(cfg, name="tiny-kv")
    assert den.precompute is not None  # fused_qkv default

    x = jax.random.normal(key, (2, 4, 16, 16), jnp.float32)
    t = jnp.full((2,), 5.0)
    cond = {"context": jax.random.normal(jax.random.PRNGKey(7),
                                         (2, 8, cfg.context_dim), jnp.float32)}
    enriched = den.precompute(params, cond)
    assert "kv_cache" in enriched and enriched["kv_cache"]
    # every fused SpatialTransformer stack is covered, batch-major layout
    for name, kv in enriched["kv_cache"].items():
        assert kv.shape[0] == 2 and kv.shape[2] == 8, (name, kv.shape)

    y_ref = den.apply(x, t, cond)
    y_pre = den.apply(x, t, enriched)
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_unet_kv_precompute_through_sampler(tiny_unet, key):
    """ksampler/LanPaintSampler apply Denoiser.precompute once per launch;
    output must match a sampler whose model has the hoist disabled."""
    import dataclasses

    den, _ = tiny_unet
    latent = jax.random.normal(key, (1, 4, 16, 16), jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0
    cond = {"context": jax.random.normal(jax.random.PRNGKey(3),
                                         (1, 8, 32), jnp.float32)}
    uncond = {"context": jnp.zeros((1, 8, 32), jnp.float32)}
    kw = dict(seed=0, steps=3, cfg=3.0, sampler_name="euler",
              scheduler="normal", positive=cond, negative=uncond,
              latent=latent, mask=jnp.asarray(mask), num_steps=2)
    out_pre = ksampler(den, **kw)
    out_ref = ksampler(dataclasses.replace(den, precompute=None), **kw)
    # bf16 compute: the hoisted einsum's output layout (bdtf vs dbtf) may
    # round differently; the tiny config keeps the drift well under 1e-2
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_ref),
                               rtol=0, atol=1e-2)


def test_wan_kv_precompute_matches_per_forward(key):
    """WanKVPrecompute reads the SAME stacked params as the in-forward
    cross-attention k/v path, so the hoisted forward is bit-identical."""
    import dataclasses

    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG
    from lanpaint_tpu.models.zoo import build_wan

    cfg = dataclasses.replace(TINY_WAN_CONFIG, dtype=jnp.float32)
    den, params = build_wan(cfg, init_shape=(1, 4, 8, 8), name="tiny-wan-kv")
    assert den.precompute is not None

    x = jax.random.normal(key, (1, 4, 4, 8, 8), jnp.float32)
    t = jnp.full((1,), 0.6)
    cond = {"context": jax.random.normal(jax.random.PRNGKey(5),
                                         (1, 8, cfg.context_dim), jnp.float32)}
    enriched = den.precompute(params, cond)
    kv = enriched["kv_cache"]
    assert kv["k"].shape == (1, cfg.depth, 8, cfg.hidden)
    y_ref = den.apply(x, t, cond)
    y_pre = den.apply(x, t, enriched)
    np.testing.assert_array_equal(np.asarray(y_pre), np.asarray(y_ref))


def test_wan_kv_precompute_through_sampler(tiny_wan, key):
    import dataclasses

    den, _ = tiny_wan
    assert den.precompute is not None
    latent = jax.random.normal(key, (1, 4, 4, 8, 8), jnp.float32)
    mask = np.zeros((4, 64, 64), np.float32)
    mask[:, :, 32:] = 1.0
    cond = {"context": jax.random.normal(jax.random.PRNGKey(2),
                                         (1, 8, 32), jnp.float32)}
    kw = dict(seed=0, steps=3, cfg=1.0, sampler_name="euler",
              scheduler="simple", positive=cond, latent=latent,
              mask=jnp.asarray(mask), num_steps=2, video=True)
    out_pre = ksampler(den, **kw)
    out_ref = ksampler(dataclasses.replace(den, precompute=None), **kw)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_ref),
                               rtol=0, atol=1e-2)
