"""Wan2.1 causal 3D video VAE — pixel video <-> latent video.

The reference's video families delegate VAE work to ComfyUI's loaders
(reference example_workflows/wan2_2_T2I_Inpaint.json `VAELoader
['wan_2.1_vae.safetensors']`); a standalone framework needs it natively.
This is the public Wan2.1 VAE architecture (Wan-Video/Wan2.1
`wan/modules/vae.py`, also shipped as `qwen_image_vae.safetensors` for
Qwen-Image / Krea2 / Anima — same 16-channel graph): a causal 3D conv
autoencoder with RMS-normalized residual blocks, one spatial attention in
the middle, 8x spatial and 4x temporal compression (`1+4k` pixel frames ->
`1+k` latent frames), and channel re-widening after each decoder upsample.

TPU-first: NDHWC layout for conv MXU tiling, bf16 conv compute with fp32
RMS norms and heads, full-sequence causal convolution (front zero-pad in
time) instead of the torch implementation's streaming feature cache — the
cache exists for GPU memory, not semantics; XLA sees one static graph.
Temporal edge semantics: causal zero-pad everywhere; the decoder's
time-upsample drops the first interleaved frame (the causal-pad artifact)
so `1+k -> 1+2k` per stage.  Exact frame-edge parity vs the torch
streaming replay is unverifiable offline (needs real weights) and
documented in docs/family_facts.md.

Checkpoint key layout (wan_2.1_vae.safetensors, bare keys) is mirrored in
`load._wan_vae_entries` and manifest-tested (tests/test_manifests.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import attention_bshd


# Per-channel latent normalization of the public Wan2.1 release (model-card
# constants replicated in every public integration of this VAE; the DiT
# consumes (z - mean) / std).  Vendored, not checkpoint keys.
WAN21_LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
WAN21_LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_channels: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    # one temporal flag per down/up stage (len(dim_mult)-1 resamples)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    # Wan2.2 VAE structure (wan/modules/vae2_2.py): pixel-unshuffle patch
    # at input/output and per-stage parameter-free shortcuts (AvgDown3D on
    # the way down, DupUp3D on the way up); upsample convs keep their width
    # (2.1 halves).  Key layout nests an extra Down_/Up_ResidualBlock level.
    patch: int = 1
    stage_shortcuts: bool = False
    latents_mean: Optional[Tuple[float, ...]] = WAN21_LATENTS_MEAN
    latents_std: Optional[Tuple[float, ...]] = WAN21_LATENTS_STD
    dtype: jnp.dtype = jnp.bfloat16


WAN21_VAE_CONFIG = WanVAEConfig()
# qwen_image_vae.safetensors is the same graph (Qwen-Image's latents use
# its own normalization baked into the pipeline; keep identity here).
QWEN_IMAGE_VAE_CONFIG = WanVAEConfig(latents_mean=None, latents_std=None)
# Wan2.2 VAE (wan2.2_vae.safetensors — the TI2V-5B pairing, 48-ch latents,
# 4x16x16 compression via patch-2 + three spatial stages).  Per-channel
# normalization constants ship with the public release's model card and
# are left to the caller here (structure recalled offline — see
# docs/family_facts.md for exactly which facts are pinned vs recalled).
WAN22_VAE_CONFIG = WanVAEConfig(
    dim=160, z_channels=48, patch=2, stage_shortcuts=True,
    temporal_downsample=(True, True, False),  # recalled; see family_facts.md
    latents_mean=None, latents_std=None)
TINY_WAN_VAE_CONFIG = WanVAEConfig(
    dim=8, z_channels=4, dim_mult=(1, 2), num_res_blocks=1,
    temporal_downsample=(True,), latents_mean=None, latents_std=None)
# Three stages so every AvgDown3D group size divides (widening stages must
# carry a resample factor, as in the real config's (1, 2, 4, 4)).
TINY_WAN22_VAE_CONFIG = WanVAEConfig(
    dim=8, z_channels=4, dim_mult=(1, 2, 2), num_res_blocks=1,
    temporal_downsample=(True, False), patch=2, stage_shortcuts=True,
    latents_mean=None, latents_std=None)


class CausalConv3d(nn.Module):
    """Conv3d with causal time padding: front-pad (kt-1), no future taps.
    Input/output NDHWC = (B, T, H, W, C)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2),
                        (kw // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class RMSNorm3d(nn.Module):
    """Wan `RMS_norm(dim, images=False)`: F.normalize over channels *
    sqrt(dim) * gamma, computed in fp32.  gamma ckpt shape (C,1,1,1)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        return (n * (self.dim ** 0.5) * gamma).astype(dt)


class WanVAEResBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = RMSNorm3d(c, name="norm1")(x)
        h = CausalConv3d(self.out_ch, dtype=self.dtype,
                         name="conv1")(nn.silu(h))
        h = RMSNorm3d(self.out_ch, name="norm2")(h)
        h = CausalConv3d(self.out_ch, dtype=self.dtype,
                         name="conv2")(nn.silu(h))
        if c != self.out_ch:
            x = CausalConv3d(self.out_ch, kernel=(1, 1, 1), dtype=self.dtype,
                             name="shortcut")(x)
        return x + h


class WanVAEAttnBlock(nn.Module):
    """Single-head spatial self-attention applied per frame (middle block)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        h = RMSNorm3d(c, name="norm")(x)
        qkv = nn.Conv(3 * c, (1, 1, 1), dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b * t, hh * ww, 1, 3 * c), 3, axis=-1)
        o = attention_bshd(q, k, v).reshape(b, t, hh, ww, c)
        return x + nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="proj")(o)


class SpatialResample(nn.Module):
    """Per-frame spatial resample (Wan `Resample.resample`)."""

    features: int
    down: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.down:
            # ZeroPad2d (0,1,0,1) + stride-2 valid conv
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.features, (1, 3, 3), strides=(1, 2, 2),
                           padding="VALID", dtype=self.dtype, name="conv")(x)
        b, t, hh, ww, c = x.shape
        x = jax.image.resize(x, (b, t, hh * 2, ww * 2, c), "nearest")
        return nn.Conv(self.features, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class WanDownsample(nn.Module):
    """downsample2d / downsample3d: spatial stride-2 conv, then (3d) causal
    stride-2 time conv."""

    dim: int
    temporal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SpatialResample(self.dim, down=True, dtype=self.dtype,
                            name="resample")(x)
        if self.temporal:
            # causal stride-2 in time: front-pad 2, k=3 -> T -> (T-1)//2 + 1
            x = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
            x = nn.Conv(self.dim, (3, 1, 1), strides=(2, 1, 1),
                        padding="VALID", dtype=self.dtype, name="time_conv")(x)
        return x


class WanUpsample(nn.Module):
    """upsample2d / upsample3d: (3d) causal time conv doubling frames via
    2-way channel interleave (first interleaved frame dropped — the causal
    pad artifact: 1+k -> 1+2k), then nearest 2x spatial conv.  The 2.1
    graph halves the width here (`halve`); 2.2 keeps it (its stages narrow
    inside the residual blocks instead)."""

    dim: int                      # input channel count
    temporal: bool
    halve: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.temporal:
            b, t, hh, ww, c = x.shape
            h = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
            h = nn.Conv(2 * self.dim, (3, 1, 1), padding="VALID",
                        dtype=self.dtype, name="time_conv")(h)
            # (B,T,H,W,2*dim) -> interleave the channel pair along time
            h = h.reshape(b, t, hh, ww, 2, self.dim)
            h = jnp.transpose(h, (0, 1, 4, 2, 3, 5)).reshape(
                b, 2 * t, hh, ww, self.dim)
            x = h[:, 1:]
        out = self.dim // 2 if self.halve else self.dim
        return SpatialResample(out, down=False, dtype=self.dtype,
                               name="resample")(x)


def _avg_down3d(x, out_ch: int, ft: int, fs: int):
    """Wan2.2 AvgDown3D (parameter-free stage shortcut): front-pad T to a
    multiple of ft, fold (ft, fs, fs) blocks into channels (C-major order,
    matching the torch pixel-unshuffle), group-mean down to out_ch."""
    b, t, hh, ww, c = x.shape
    pad_t = (-t) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
    t2 = x.shape[1]
    x = x.reshape(b, t2 // ft, ft, hh // fs, fs, ww // fs, fs, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
    x = x.reshape(b, t2 // ft, hh // fs, ww // fs, c * ft * fs * fs, 1)
    x = x.reshape(b, t2 // ft, hh // fs, ww // fs, out_ch, -1)
    return jnp.mean(x, axis=-1)


def _dup_up3d(x, out_ch: int, ft: int, fs: int):
    """Wan2.2 DupUp3D (parameter-free stage shortcut): channel
    repeat-interleave then unfold to (ft, fs, fs) pixel blocks; the ft-1
    causal lead frames are dropped (the full-sequence equivalent of the
    torch streaming first_chunk trim)."""
    b, t, hh, ww, c = x.shape
    repeats = out_ch * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)
    x = x.reshape(b, t, hh, ww, out_ch, ft, fs, fs)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
    x = x.reshape(b, t * ft, hh * fs, ww * fs, out_ch)
    return x[:, ft - 1:] if ft > 1 else x


def _patchify(x, p: int):
    """(B,T,H,W,C) -> (B,T,H/p,W/p,C*p*p), channel order (c, r, q) with q
    the H-subpixel and r the W-subpixel (the Wan2.2 rearrange)."""
    if p == 1:
        return x
    b, t, hh, ww, c = x.shape
    x = x.reshape(b, t, hh // p, p, ww // p, p, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 5, 3))
    return x.reshape(b, t, hh // p, ww // p, c * p * p)


def _unpatchify(x, p: int):
    if p == 1:
        return x
    b, t, hh, ww, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, hh, ww, c, p, p)
    x = jnp.transpose(x, (0, 1, 2, 6, 3, 5, 4))
    return x.reshape(b, t, hh * p, ww * p, c)


class WanVAEEncoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, x):
        """(B, T, H, W, 3) -> (B, T', H/8, W/8, 2z) moments."""
        cfg = self.cfg
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = _patchify(x, cfg.patch)
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(x)
        for i in range(len(cfg.dim_mult)):
            out_dim = dims[i + 1]
            down = i != len(cfg.dim_mult) - 1
            h_in = h
            for j in range(cfg.num_res_blocks):
                h = WanVAEResBlock(out_dim, dtype=cfg.dtype,
                                   name=f"down_{i}_block_{j}")(h)
            if down:
                h = WanDownsample(out_dim, cfg.temporal_downsample[i],
                                  dtype=cfg.dtype, name=f"down_{i}_ds")(h)
            if cfg.stage_shortcuts:  # Wan2.2 Down_ResidualBlock avg path
                ft = 2 if (down and cfg.temporal_downsample[i]) else 1
                fs = 2 if down else 1
                h = h + _avg_down3d(h_in, out_dim, ft, fs).astype(h.dtype)
        c = h.shape[-1]
        h = WanVAEResBlock(c, dtype=cfg.dtype, name="mid_block_1")(h)
        h = WanVAEAttnBlock(dtype=cfg.dtype, name="mid_attn")(h)
        h = WanVAEResBlock(c, dtype=cfg.dtype, name="mid_block_2")(h)
        h = RMSNorm3d(c, name="head_norm")(h)
        return CausalConv3d(2 * cfg.z_channels, dtype=jnp.float32,
                            name="head_conv")(nn.silu(h).astype(jnp.float32))


class WanVAEDecoder(nn.Module):
    cfg: WanVAEConfig

    @nn.compact
    def __call__(self, z):
        """(B, T', h, w, z) -> (B, T, 8h, 8w, 3)."""
        cfg = self.cfg
        rev = tuple(reversed(cfg.dim_mult))
        dims = [cfg.dim * u for u in (rev[0],) + rev]
        temporal_up = tuple(reversed(cfg.temporal_downsample))
        h = CausalConv3d(dims[0], dtype=cfg.dtype, name="conv1")(z)
        c = dims[0]
        h = WanVAEResBlock(c, dtype=cfg.dtype, name="mid_block_1")(h)
        h = WanVAEAttnBlock(dtype=cfg.dtype, name="mid_attn")(h)
        h = WanVAEResBlock(c, dtype=cfg.dtype, name="mid_block_2")(h)
        for i in range(len(cfg.dim_mult)):
            out_dim = dims[i + 1]
            up = i != len(cfg.dim_mult) - 1
            h_in = h
            for j in range(cfg.num_res_blocks + 1):
                h = WanVAEResBlock(out_dim, dtype=cfg.dtype,
                                   name=f"up_{i}_block_{j}")(h)
            if up:
                h = WanUpsample(out_dim, temporal_up[i],
                                halve=not cfg.stage_shortcuts,
                                dtype=cfg.dtype, name=f"up_{i}_us")(h)
                if cfg.stage_shortcuts:  # Wan2.2 Up_ResidualBlock dup path
                    ft = 2 if temporal_up[i] else 1
                    h = h + _dup_up3d(h_in, out_dim, ft, 2).astype(h.dtype)
        h = RMSNorm3d(h.shape[-1], name="head_norm")(h)
        out = CausalConv3d(3 * cfg.patch * cfg.patch, dtype=jnp.float32,
                           name="head_conv")(nn.silu(h).astype(jnp.float32))
        return _unpatchify(out, cfg.patch)


class WanVAE(nn.Module):
    """encode(pixels, rng|None) -> normalized latent; decode -> pixels.

    Pixel videos are (B, 3, T, H, W) in [-1, 1] with T = 1 + 4k (T=1 is the
    image case — Qwen-Image/Krea2/Anima, and Wan T2I workflows); latents
    are (B, z, 1+k, H/8, W/8), normalized per channel when the config
    carries latents_mean/std (the Wan2.1 DiT convention)."""

    cfg: WanVAEConfig

    def setup(self):
        self.encoder = WanVAEEncoder(self.cfg)
        self.quant_conv = CausalConv3d(2 * self.cfg.z_channels,
                                       kernel=(1, 1, 1), dtype=jnp.float32,
                                       name="quant_conv")
        self.post_quant_conv = CausalConv3d(self.cfg.z_channels,
                                            kernel=(1, 1, 1),
                                            dtype=jnp.float32,
                                            name="post_quant_conv")
        self.decoder = WanVAEDecoder(self.cfg)

    def _norm(self):
        cfg = self.cfg
        if cfg.latents_mean is None:
            return 0.0, 1.0
        mean = jnp.asarray(cfg.latents_mean, jnp.float32)[None, :, None, None, None]
        std = jnp.asarray(cfg.latents_std, jnp.float32)[None, :, None, None, None]
        return mean, std

    def encode(self, x_pixels, rng: Optional[jax.Array] = None):
        x = jnp.transpose(x_pixels, (0, 2, 3, 4, 1)).astype(self.cfg.dtype)
        moments = self.quant_conv(self.encoder(x))
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(moments, 2, axis=1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        m, s = self._norm()
        return (mean - m) / s

    def decode(self, latent):
        m, s = self._norm()
        z = latent * s + m
        z = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(jnp.float32)
        out = self.decoder(self.post_quant_conv(z).astype(self.cfg.dtype))
        return jnp.transpose(out, (0, 4, 1, 2, 3))

    def __call__(self, x_pixels, rng: Optional[jax.Array] = None):
        return self.decode(self.encode(x_pixels, rng))
