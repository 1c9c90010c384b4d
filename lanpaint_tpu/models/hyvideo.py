"""HunyuanVideo DiT — the backbone behind the reference's "Hunyuan" family.

The reference's Hunyuan workflow (reference example_workflows/
Hunyuan_Inpaint.json) loads `hunyuan_video_t2v_720p_bf16.safetensors` with
the `hunyuan_video` dual text encoder (clip_l pooled + llava-llama3 token
features) and samples it as a single-frame T2I model through
LanPaint_KSampler — i.e. "Hunyuan" support == the HunyuanVideo T2V DiT
(tencent/HunyuanVideo) run with T=1.  This module implements that
architecture natively:

* double-stream blocks (20): separate img/txt weights, fused qkv, per-head
  RMS qk-norm, joint attention over the concatenated [img; txt] sequence
  (HunyuanVideo order — image tokens FIRST, unlike Flux), 6-way AdaLN.
* single-stream blocks (40): fused linear1/linear2 parallel attention+MLP.
* token refiner `txt_in`: 2 transformer blocks over the raw llava features,
  gated by AdaLN on (timestep embed + mean-pooled context projection).
* conditioning vector = time_in(t) + vector_in(clip_l pooled)
  [+ guidance_in(g*1000) — the distilled-CFG input].
* 3D RoPE over (t, y, x) with axes (16, 56, 56) and theta=256
  (HunyuanVideo's rope_theta; Flux uses 10000) applied to IMAGE tokens only
  — text tokens carry no rotary position.

TPU-first: (B, S, hidden) token layout for MXU-sized matmuls, nn.scan over
block depth (one compiled while-body, stacked params), bf16 compute / fp32
LayerNorms, flash-attention via layers.attention_bshd for video-scale S.

Known single-frame semantic deltas vs the torch reference (documented, do
not affect checkpoint key/shape fidelity): the token refiner pools the
context by plain mean (reference: mask-weighted mean when a text mask is
supplied) and attention runs un-masked over the fixed-length padded text.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    LayerNormF32,
    MLPEmbedder,
    RMSNorm,
    apply_rope,
    attention_bshd,
    layernorm_na,
    rope_freqs,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class HYVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden: int = 3072
    num_heads: int = 24
    mlp_ratio: float = 4.0
    depth_double: int = 20
    depth_single: int = 40
    refiner_depth: int = 2
    context_dim: int = 4096        # llava-llama3 token features
    vec_dim: int = 768             # CLIP-L pooled
    guidance_embed: bool = True    # t2v_720p is the distilled-CFG model
    patch: Tuple[int, int, int] = (1, 2, 2)
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 256.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden * self.mlp_ratio)


HUNYUAN_VIDEO_720P_CONFIG = HYVideoConfig()
TINY_HYVIDEO_CONFIG = HYVideoConfig(
    in_channels=4, out_channels=4, hidden=64, num_heads=4,
    depth_double=2, depth_single=2, refiner_depth=2,
    context_dim=32, vec_dim=16, axes_dim=(4, 6, 6),
)


def _modulate(x, shift, scale):
    return (1 + scale) * x + shift


def _ln(name):
    """LayerNorm without affine params, fp32 statistics (the torch model's
    elementwise_affine=False norms — they contribute no checkpoint keys).
    Backed by the fused Pallas row-norm (ops/norms.py) on TPU."""
    del name  # paramless: no scope needed
    return layernorm_na


class _RefinerBlock(nn.Module):
    """Token-refiner transformer block: plain self-attention (no rope, no
    qk-norm), SiLU MLP, per-block 2-gate AdaLN on the (t + pooled-ctx)
    conditioning vector."""

    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, x, c):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        b, s, _ = x.shape
        gates = nn.Dense(2 * cfg.hidden, dtype=cfg.dtype,
                         name="adaLN_modulation")(nn.silu(c))
        gate_msa, gate_mlp = jnp.split(gates[:, None, :], 2, axis=-1)
        # norm1/norm2 ARE affine in the refiner (ckpt: norm1.weight/bias)
        xn = LayerNormF32(name="norm1")(x).astype(cfg.dtype)
        qkv = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype, name="self_attn_qkv")(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = attention_bshd(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                              v.reshape(b, s, h, d), impl="xla")
        attn = attn.reshape(b, s, cfg.hidden)
        x = x + gate_msa * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                    name="self_attn_proj")(attn)
        xn = LayerNormF32(name="norm2")(x).astype(cfg.dtype)
        hdn = nn.silu(nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype, name="mlp_fc1")(xn))
        return x + gate_mlp * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                       name="mlp_fc2")(hdn)


class _ScanRefiner(nn.Module):
    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, x, c):
        x = _RefinerBlock(self.cfg, name="block")(x, c)
        return x, None


class TokenRefiner(nn.Module):
    """`txt_in`: raw llava context -> hidden-width refined text tokens."""

    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, context, t):
        cfg = self.cfg
        c = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="t_embedder")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        # mean-pooled raw context, projected (torch TextProjection)
        c = c + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="c_embedder")(
            jnp.mean(context, axis=1).astype(cfg.dtype))
        x = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="input_embedder")(
            context.astype(cfg.dtype))
        scan = nn.scan(_ScanRefiner, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=cfg.refiner_depth,
                       in_axes=nn.broadcast)
        x, _ = scan(cfg, name="refiner")(x, c)
        return x


class HYDoubleBlock(nn.Module):
    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, img, txt, vec, pe):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim

        def mod6(name):
            out = nn.Dense(6 * cfg.hidden, dtype=cfg.dtype, name=name)(nn.silu(vec))
            return jnp.split(out[:, None, :], 6, axis=-1)

        im1_s, im1_c, im1_g, im2_s, im2_c, im2_g = mod6("img_mod")
        tx1_s, tx1_c, tx1_g, tx2_s, tx2_c, tx2_g = mod6("txt_mod")

        def qkv(x, prefix):
            x = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype, name=f"{prefix}_attn_qkv")(x)
            q, k, v = jnp.split(x, 3, axis=-1)
            b, s, _ = q.shape
            q = RMSNorm(d, name=f"{prefix}_q_norm")(q.reshape(b, s, h, d))
            k = RMSNorm(d, name=f"{prefix}_k_norm")(k.reshape(b, s, h, d))
            return q, k, v.reshape(b, s, h, d)

        img_n = _modulate(_ln("img_norm1")(img), im1_s, im1_c).astype(cfg.dtype)
        txt_n = _modulate(_ln("txt_norm1")(txt), tx1_s, tx1_c).astype(cfg.dtype)
        iq, ik, iv = qkv(img_n, "img")
        tq, tk, tv = qkv(txt_n, "txt")
        # rope on image tokens only; joint attention over [img; txt]
        iq = apply_rope(iq, pe)
        ik = apply_rope(ik, pe)
        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl)
        b, s, _, _ = attn.shape
        attn = attn.reshape(b, s, cfg.hidden)
        img_a, txt_a = attn[:, : img.shape[1]], attn[:, img.shape[1]:]

        img = img + im1_g * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="img_attn_proj")(img_a)
        txt = txt + tx1_g * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="txt_attn_proj")(txt_a)

        img_n2 = _modulate(_ln("img_norm2")(img), im2_s, im2_c).astype(cfg.dtype)
        txt_n2 = _modulate(_ln("txt_norm2")(txt), tx2_s, tx2_c).astype(cfg.dtype)
        img_h = nn.gelu(nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype,
                                 name="img_mlp_fc1")(img_n2))
        img = img + im2_g * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="img_mlp_fc2")(img_h)
        txt_h = nn.gelu(nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype,
                                 name="txt_mlp_fc1")(txt_n2))
        txt = txt + tx2_g * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="txt_mlp_fc2")(txt_h)
        return img, txt


class HYSingleBlock(nn.Module):
    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, x, vec, pe, n_img):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        mod = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype,
                       name="modulation")(nn.silu(vec))
        shift, scale, gate = jnp.split(mod[:, None, :], 3, axis=-1)
        xn = _modulate(_ln("pre_norm")(x), shift, scale).astype(cfg.dtype)
        fused = nn.Dense(3 * cfg.hidden + cfg.mlp_hidden, dtype=cfg.dtype,
                         name="linear1")(xn)
        qkv, mlp = fused[..., : 3 * cfg.hidden], fused[..., 3 * cfg.hidden:]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        q = RMSNorm(d, name="q_norm")(q.reshape(b, s, h, d))
        k = RMSNorm(d, name="k_norm")(k.reshape(b, s, h, d))
        v = v.reshape(b, s, h, d)
        # rope only on the leading n_img image tokens (sequence is [img; txt])
        q = jnp.concatenate([apply_rope(q[:, :n_img], pe), q[:, n_img:]], axis=1)
        k = jnp.concatenate([apply_rope(k[:, :n_img], pe), k[:, n_img:]], axis=1)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl).reshape(b, s, cfg.hidden)
        out = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="linear2")(
            jnp.concatenate([attn, nn.gelu(mlp)], axis=-1))
        return x + gate * out


class _ScanDouble(nn.Module):
    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, carry, cond):
        img, txt = carry
        v, pe = cond
        img, txt = HYDoubleBlock(self.cfg, name="block")(img, txt, v, pe)
        return (img, txt), None


class _ScanSingle(nn.Module):
    cfg: HYVideoConfig
    n_img: int

    @nn.compact
    def __call__(self, x, cond):
        v, pe = cond
        x = HYSingleBlock(self.cfg, name="block")(x, v, pe, self.n_img)
        return x, None


class HYLastLayer(nn.Module):
    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, x, vec):
        cfg = self.cfg
        mod = nn.Dense(2 * cfg.hidden, dtype=cfg.dtype,
                       name="adaLN_modulation")(nn.silu(vec))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = _modulate(_ln("norm_final")(x), shift, scale)
        return nn.Dense(cfg.out_channels * cfg.patch[0] * cfg.patch[1] * cfg.patch[2],
                        dtype=jnp.float32, name="linear")(x.astype(jnp.float32))


def pack_video(x: jnp.ndarray, patch) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T/pf * H/ph * W/pw, C*pf*ph*pw) tokens."""
    b, c, t, hh, ww = x.shape
    pf, ph, pw = patch
    x = x.reshape(b, c, t // pf, pf, hh // ph, ph, ww // pw, pw)
    x = jnp.transpose(x, (0, 2, 4, 6, 1, 3, 5, 7))
    return x.reshape(b, (t // pf) * (hh // ph) * (ww // pw), c * pf * ph * pw)


def unpack_video(tokens: jnp.ndarray, t: int, h: int, w: int, patch) -> jnp.ndarray:
    pf, ph, pw = patch
    b, s, cp = tokens.shape
    c = cp // (pf * ph * pw)
    x = tokens.reshape(b, t // pf, h // ph, w // pw, c, pf, ph, pw)
    x = jnp.transpose(x, (0, 4, 1, 5, 2, 6, 3, 7))
    return x.reshape(b, c, t, h, w)


def video_ids(b: int, t: int, h: int, w: int, patch) -> jnp.ndarray:
    """(B, S, 3) RoPE ids (frame, y, x) per token."""
    pf, ph, pw = patch
    tt, hh, ww = t // pf, h // ph, w // pw
    grid = jnp.stack(jnp.meshgrid(jnp.arange(tt), jnp.arange(hh),
                                  jnp.arange(ww), indexing="ij"), axis=-1)
    ids = grid.reshape(tt * hh * ww, 3)
    return jnp.tile(ids[None], (b, 1, 1))


class HYVideoDiT(nn.Module):
    """__call__(x_bctHW, t, context, vec, guidance) -> velocity prediction.

    x: (B, C, T, H, W) video latent (T=1 for the reference's T2I use).
    context: (B, L, 4096) llava-llama3 token features.
    vec: (B, 768) CLIP-L pooled.  guidance: (B,) distilled-CFG scale.
    """

    cfg: HYVideoConfig

    @nn.compact
    def __call__(self, x, t, context, vec=None, guidance=None):
        cfg = self.cfg
        b, c, tt, hh, ww = x.shape
        img = pack_video(x, cfg.patch).astype(cfg.dtype)
        n_img = img.shape[1]
        img = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="img_in")(img)
        txt = TokenRefiner(cfg, name="txt_in")(context, t)

        v = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="time_in")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        if cfg.vec_dim > 0:
            assert vec is not None, "HunyuanVideo needs CLIP-L pooled `vec`"
            v = v + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="vector_in")(
                vec.astype(cfg.dtype))
        if cfg.guidance_embed:
            g = jnp.full((b,), 6.0, jnp.float32) if guidance is None else guidance
            v = v + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="guidance_in")(
                timestep_embedding(g * 1000.0, 256).astype(cfg.dtype))

        pe = rope_freqs(video_ids(b, tt, hh, ww, cfg.patch), cfg.axes_dim,
                        cfg.theta)

        if cfg.depth_double:
            scan_d = nn.scan(_ScanDouble, variable_axes={"params": 0},
                             split_rngs={"params": True},
                             length=cfg.depth_double, in_axes=nn.broadcast)
            (img, txt), _ = scan_d(cfg, name="double")((img, txt), (v, pe))
        xcat = jnp.concatenate([img, txt], axis=1)  # image tokens FIRST
        if cfg.depth_single:
            scan_s = nn.scan(_ScanSingle, variable_axes={"params": 0},
                             split_rngs={"params": True},
                             length=cfg.depth_single, in_axes=nn.broadcast)
            xcat, _ = scan_s(cfg, n_img, name="single")(xcat, (v, pe))
        img = xcat[:, :n_img]
        out = HYLastLayer(cfg, name="final_layer")(img, v)
        return unpack_video(out, tt, hh, ww, cfg.patch)
