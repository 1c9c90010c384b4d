"""Flow-matching MMDiT family: Flux(.1/.2) / Qwen-Image / Z-Image backbones.

Config-driven multimodal DiT with double-stream (separate img/txt weights,
joint attention) and single-stream blocks, QK-RMSNorm, multi-axis RoPE and
AdaLN modulation — the architecture family behind the reference's
flow-matching workflows (reference README.md:131-139: Flux, Qwen-Image,
Z-Image, Krea2; example_workflows/Flux_Inpaint.json etc.).

TPU-first choices: tokens stay (B, S, hidden) for large fused matmuls on the
MXU; attention uses jax.nn.dot_product_attention; bf16 compute / fp32 params;
`seq_shard_spec` marks the token axis for sequence sharding over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import MLPEmbedder, QKNorm, apply_rope, attention_bshd, layernorm_na, rope_freqs, timestep_embedding


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 64          # packed 2x2 patches of the 16ch latent
    out_channels: int = 64
    hidden: int = 3072
    num_heads: int = 24
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    context_dim: int = 4096        # T5 features
    vec_dim: int = 768             # pooled CLIP
    guidance_embed: bool = True    # Flux-dev guidance distillation input
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    attention_impl: str = "auto"   # see layers.attention_bshd
    patch: int = 2                 # latent pixels per token side
    latent_channels: int = 16
    # RMS-normalize the raw context features before txt_in (Qwen-Image:
    # `txt_norm.weight` over joint_attention_dim in the public checkpoint)
    txt_norm: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


FLUX_DEV_CONFIG = DiTConfig()
FLUX_SCHNELL_CONFIG = DiTConfig(guidance_embed=False)
# Qwen-Image: all-double-stream MMDiT (60 joint blocks, no single stream),
# larger text width (Qwen2.5-VL-7B features), no pooled-vector conditioning,
# RMS txt_norm on the raw context.  Checkpoint layout is diffusers-style
# (QwenImageTransformer2DModel) — see load.import_qwen.
QWEN_IMAGE_CONFIG = DiTConfig(
    hidden=3072, num_heads=24, depth_double=60, depth_single=0,
    context_dim=3584, vec_dim=0, guidance_embed=False, txt_norm=True,
)
# Z-Image: SUPERSEDED in r3 by the real S3-DiT graph (models/zimage.py,
# the Lumina2/NextDiT layout the reference's Z_image workflows load —
# manifest-tested, load.import_zimage).  This generic-MMDiT config remains
# only as a structural fallback.
Z_IMAGE_CONFIG = DiTConfig(
    hidden=2304, num_heads=18, depth_double=6, depth_single=30,
    context_dim=2560, vec_dim=0, guidance_embed=False,
)
# Flux.2-dev (reference example_workflows/Flux.2.Dev_Inpaint.json:
# flux2_dev + mistral_3_small encoder + flux2-vae, Flux2Scheduler,
# FluxGuidance 4, StepSize 0.15): STRUCTURAL STAND-IN on the generic MMDiT.
# Workflow-pinned facts: context features are Mistral-Small-3.1-24B hidden
# states (5120-wide), single text encoder (no CLIP pooled vector), embedded
# guidance.  The exact public topology (depths / width / axes_dim / VAE
# latent channels) is not retrievable offline — docs/family_facts.md.
FLUX2_DEV_CONFIG = DiTConfig(
    hidden=5120, num_heads=40, depth_double=8, depth_single=38,
    context_dim=5120, vec_dim=0, guidance_embed=True,
)
# Flux.2-Klein-9B (reference Flux2_Klein_inpainting.json: flux-2-klein-base-9b
# + qwen_3_8b encoder (4096-wide Qwen3-8B states) + flux2-vae, CFG 5,
# 2 think-steps, lambda 8): stand-in at ~9B scale, same caveat as above.
FLUX2_KLEIN_CONFIG = DiTConfig(
    hidden=3584, num_heads=28, depth_double=8, depth_single=28,
    context_dim=4096, vec_dim=0, guidance_embed=False,
)
# Krea 2 (reference Krea2_LanPaint_Inpaint.json: krea2_turbo_fp8_scaled +
# qwen3vl_4b encoder (2560-wide Qwen3-VL-4B states) + the Qwen-Image 16ch
# VAE; 8-step cfg-1 turbo sampling, optional style LoRA at 0.8): stand-in —
# NOT FLUX.1-Krea (round-1 mislabeled it as a flux-dev alias; the reference
# workflow pins a different encoder+VAE pairing).
KREA2_CONFIG = DiTConfig(
    context_dim=2560, vec_dim=0, guidance_embed=False,
)
# Anima (reference README.md:272-286; workflow embedded in
# examples/Example_26/InPainted_Drag_Me_to_ComfyUI.png metadata:
# anima-preview3-base + qwen_3_06b_base encoder (1024-wide Qwen3-0.6B
# states) + qwen_image_vae; er_sde/simple 30 steps cfg 5, 5 think-steps):
# stand-in at the preview model's ~2B scale.
ANIMA_CONFIG = DiTConfig(
    hidden=2048, num_heads=16, depth_double=8, depth_single=24,
    context_dim=1024, vec_dim=0, guidance_embed=False,
)
# Ideogram 4 (reference Ideogram4_LanPaint_Inpaint.json: dual
# conditional/unconditional checkpoints through DualModelGuider, Qwen3-VL-8B
# text features (4096-wide), flux2-vae, Ideogram4Scheduler): stand-in —
# both models' real topologies are offline-unknown (docs/family_facts.md).
IDEOGRAM4_CONFIG = DiTConfig(
    hidden=3072, num_heads=24, depth_double=8, depth_single=30,
    context_dim=4096, vec_dim=0, guidance_embed=False,
)
# "Hunyuan" (reference example_workflows/Hunyuan_Inpaint.json) is the
# HunyuanVideo T2V DiT sampled single-frame — real architecture in
# models/hyvideo.py (HUNYUAN_VIDEO_720P_CONFIG), not an MMDiT alias.
# SD3.5 / HiDream (reference README.md:131-139 flow-model matrix): served by
# the generic MMDiT (joint double-stream attention, QK-RMSNorm, AdaLN); the
# per-family checkpoint key mappings are round-2 work — the *sampler* side
# (flow schedule, LanPaint math) is family-agnostic and fully covered.
SD35_LARGE_CONFIG = DiTConfig(
    hidden=2432, num_heads=38, depth_double=38, depth_single=0,
    context_dim=4096, vec_dim=2048, guidance_embed=False,
    axes_dim=(16, 24, 24),
)
HIDREAM_CONFIG = DiTConfig(
    hidden=2560, num_heads=20, depth_double=16, depth_single=32,
    context_dim=4096, vec_dim=2048, guidance_embed=False,
)
TINY_DIT_CONFIG = DiTConfig(
    in_channels=16, out_channels=16, hidden=64, num_heads=4,
    depth_double=2, depth_single=2, context_dim=32, vec_dim=16,
    guidance_embed=False, axes_dim=(4, 6, 6), latent_channels=4,
)


class Modulation(nn.Module):
    """AdaLN modulation: vec -> n_sets x (shift, scale, gate)."""

    hidden: int
    double: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vec):
        n = 6 if self.double else 3
        out = nn.Dense(n * self.hidden, dtype=self.dtype, name="lin")(nn.silu(vec))
        return jnp.split(out[:, None, :], n, axis=-1)


def _modulate(x, shift, scale):
    return (1 + scale) * x + shift


class DoubleStreamBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, img, txt, vec, pe):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        mlp_h = int(cfg.hidden * cfg.mlp_ratio)

        im1_shift, im1_scale, im1_gate, im2_shift, im2_scale, im2_gate = \
            Modulation(cfg.hidden, True, dtype=cfg.dtype, name="img_mod")(vec)
        tx1_shift, tx1_scale, tx1_gate, tx2_shift, tx2_scale, tx2_gate = \
            Modulation(cfg.hidden, True, dtype=cfg.dtype, name="txt_mod")(vec)

        def qkv(x, prefix):
            x = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype, name=f"{prefix}_qkv")(x)
            q, k, v = jnp.split(x, 3, axis=-1)
            b, s, _ = q.shape
            q = q.reshape(b, s, h, d)
            k = k.reshape(b, s, h, d)
            v = v.reshape(b, s, h, d)
            q, k = QKNorm(d, name=f"{prefix}_qknorm")(q, k)
            return q, k, v

        img_n = _modulate(layernorm_na(img),
                          im1_shift, im1_scale)
        txt_n = _modulate(layernorm_na(txt),
                          tx1_shift, tx1_scale)
        iq, ik, iv = qkv(img_n.astype(cfg.dtype), "img_attn")
        tq, tk, tv = qkv(txt_n.astype(cfg.dtype), "txt_attn")

        # joint attention over [txt; img] with RoPE
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl)
        b, s, _, _ = attn.shape
        attn = attn.reshape(b, s, cfg.hidden)
        txt_a, img_a = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

        img = img + im1_gate * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                        name="img_attn_proj")(img_a)
        txt = txt + tx1_gate * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                        name="txt_attn_proj")(txt_a)

        img_n2 = _modulate(layernorm_na(img),
                           im2_shift, im2_scale).astype(cfg.dtype)
        txt_n2 = _modulate(layernorm_na(txt),
                           tx2_shift, tx2_scale).astype(cfg.dtype)
        img_h = nn.gelu(nn.Dense(mlp_h, dtype=cfg.dtype, name="img_mlp_0")(img_n2))
        img = img + im2_gate * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                        name="img_mlp_2")(img_h)
        txt_h = nn.gelu(nn.Dense(mlp_h, dtype=cfg.dtype, name="txt_mlp_0")(txt_n2))
        txt = txt + tx2_gate * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                        name="txt_mlp_2")(txt_h)
        return img, txt


class SingleStreamBlock(nn.Module):
    """Fused single-stream block: parallel attention + MLP, one residual."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, vec, pe):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        mlp_h = int(cfg.hidden * cfg.mlp_ratio)
        shift, scale, gate = Modulation(cfg.hidden, False, dtype=cfg.dtype,
                                        name="modulation")(vec)
        xn = _modulate(layernorm_na(x),
                       shift, scale).astype(cfg.dtype)
        fused = nn.Dense(3 * cfg.hidden + mlp_h, dtype=cfg.dtype, name="linear1")(xn)
        qkv, mlp = fused[..., : 3 * cfg.hidden], fused[..., 3 * cfg.hidden:]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        q, k = QKNorm(d, name="qknorm")(q, k)
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl).reshape(b, s, cfg.hidden)
        out = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="linear2")(
            jnp.concatenate([attn, nn.gelu(mlp)], axis=-1)
        )
        return x + gate * out


class _ScanDouble(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, carry, cond):
        img, txt = carry
        v, pe = cond
        img, txt = DoubleStreamBlock(self.cfg, name="block")(img, txt, v, pe)
        return (img, txt), None


class _ScanSingle(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, cond):
        v, pe = cond
        x = SingleStreamBlock(self.cfg, name="block")(x, v, pe)
        return x, None


class LastLayer(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, vec):
        cfg = self.cfg
        mod = nn.Dense(2 * cfg.hidden, dtype=cfg.dtype,
                       name="adaLN_modulation")(nn.silu(vec))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = _modulate(layernorm_na(x),
                      shift, scale)
        return nn.Dense(cfg.out_channels, dtype=jnp.float32,
                        name="linear")(x.astype(jnp.float32))


def pack_latent(x: jnp.ndarray, patch: int = 2) -> jnp.ndarray:
    """(B, C, H, W) latent -> (B, H/p * W/p, C*p*p) token sequence."""
    b, c, hh, ww = x.shape
    x = x.reshape(b, c, hh // patch, patch, ww // patch, patch)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b, (hh // patch) * (ww // patch), c * patch * patch)


def unpack_latent(tokens: jnp.ndarray, h: int, w: int, patch: int = 2) -> jnp.ndarray:
    """Inverse of pack_latent."""
    b, s, cpp = tokens.shape
    c = cpp // (patch * patch)
    x = tokens.reshape(b, h // patch, w // patch, c, patch, patch)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(b, c, h, w)


def image_ids(b: int, h: int, w: int, patch: int = 2) -> jnp.ndarray:
    """(B, S, 3) position ids: (0, y, x) per token (Flux convention)."""
    hh, ww = h // patch, w // patch
    ys = jnp.repeat(jnp.arange(hh), ww)
    xs = jnp.tile(jnp.arange(ww), hh)
    ids = jnp.stack([jnp.zeros_like(ys), ys, xs], axis=-1)
    return jnp.tile(ids[None], (b, 1, 1))


class MMDiT(nn.Module):
    """__call__(x_nchw_latent, t, context, vec, guidance) -> velocity pred."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, context, vec=None, guidance=None,
                 extra_tokens=None):
        cfg = self.cfg
        b, c, hh, ww = x.shape
        img = pack_latent(x, cfg.patch).astype(cfg.dtype)
        n_img = img.shape[1]
        # Qwen-Edit-style reference-latent conditioning: reference tokens (in
        # the same packed-latent space) share the img_in projection, join the
        # sequence, and are excluded from the output unpack.
        n_extra = 0
        if extra_tokens is not None:
            img = jnp.concatenate([img, extra_tokens.astype(cfg.dtype)], axis=1)
            n_extra = extra_tokens.shape[1]
        img = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="img_in")(img)
        ctx_in = context.astype(cfg.dtype)
        if cfg.txt_norm:
            from .layers import RMSNorm

            ctx_in = RMSNorm(cfg.context_dim, name="txt_norm")(ctx_in)
        txt = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="txt_in")(ctx_in)

        v = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="time_in")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        if cfg.guidance_embed:
            g = jnp.full((b,), 3.5, jnp.float32) if guidance is None else guidance
            v = v + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="guidance_in")(
                timestep_embedding(g * 1000.0, 256).astype(cfg.dtype))
        if cfg.vec_dim > 0:
            assert vec is not None, "this DiT config needs pooled conditioning"
            v = v + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="vector_in")(
                vec.astype(cfg.dtype))

        txt_ids = jnp.zeros((b, txt.shape[1], 3), jnp.int32)
        img_ids = image_ids(b, hh, ww, cfg.patch)
        if n_extra:
            # reference tokens live on a shifted first-axis RoPE plane
            grid = image_ids(b, hh, ww, cfg.patch)
            reps = -(-n_extra // grid.shape[1])
            ref_ids = jnp.tile(grid, (1, reps, 1))[:, :n_extra].at[..., 0].set(1)
            img_ids = jnp.concatenate([img_ids, ref_ids], axis=1)
        pe = rope_freqs(jnp.concatenate([txt_ids, img_ids], axis=1),
                        cfg.axes_dim, cfg.theta)

        # scan over depth: N identical blocks compile to one XLA while-body
        # with stacked params (order-of-magnitude smaller HLO than unrolling).
        if cfg.depth_double:
            scan_d = nn.scan(
                _ScanDouble, variable_axes={"params": 0},
                split_rngs={"params": True}, length=cfg.depth_double,
                in_axes=nn.broadcast,
            )
            (img, txt), _ = scan_d(cfg, name="double")((img, txt), (v, pe))
        xcat = jnp.concatenate([txt, img], axis=1)
        if cfg.depth_single:
            scan_s = nn.scan(
                _ScanSingle, variable_axes={"params": 0},
                split_rngs={"params": True}, length=cfg.depth_single,
                in_axes=nn.broadcast,
            )
            xcat, _ = scan_s(cfg, name="single")(xcat, (v, pe))
        img = xcat[:, txt.shape[1]:]
        if n_extra:
            img = img[:, :-n_extra]

        out = LastLayer(cfg, name="final_layer")(img, v)
        return unpack_latent(out, hh, ww, cfg.patch)
