"""AutoencoderKL (the LDM/SGM image VAE) — pixel <-> latent.

The reference operates purely on latents and delegates VAE encode/decode to
its host (ComfyUI VAEEncode/VAEDecode nodes feeding the LanPaint samplers,
e.g. example_workflows/SDXL_Inpaint.json).  A standalone framework needs the
VAE natively: this is the public AutoencoderKL architecture (conv
encoder/decoder with GroupNorm ResNet blocks and one mid attention), config
covering the 4-channel SD1.x/SD2.x/SDXL family and the 16-channel
SD3/Flux family (same graph, different z width / scaling / quant convs).

TPU-first: NHWC convs, bf16 compute / fp32 norms, and the mid attention
goes through `attention_bshd` so 1024px decodes (16384 tokens, d=512) take
the flash kernel instead of materializing a 1 GB score matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm32, attention_bshd


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    scale_factor: float = 0.18215   # SD1.x/2.x
    shift_factor: float = 0.0
    quant_conv: bool = True         # SD-family; absent in SD3/Flux VAEs
    dtype: jnp.dtype = jnp.bfloat16


SD_VAE_CONFIG = VAEConfig()
SDXL_VAE_CONFIG = VAEConfig(scale_factor=0.13025)
FLUX_VAE_CONFIG = VAEConfig(z_channels=16, scale_factor=0.3611,
                            shift_factor=0.1159, quant_conv=False)
SD3_VAE_CONFIG = VAEConfig(z_channels=16, scale_factor=1.5305,
                           shift_factor=0.0609, quant_conv=False)
TINY_VAE_CONFIG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4)


class VAEResBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = GroupNorm32(name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm32(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        q = q.reshape(b, hh * ww, 1, c)
        k = k.reshape(b, hh * ww, 1, c)
        v = v.reshape(b, hh * ww, 1, c)
        o = attention_bshd(q, k, v).reshape(b, hh, ww, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x_pixels):
        """(B, 3, H, W) in [-1, 1] -> (B, 2*z, H/8, W/8) moments."""
        cfg = self.cfg
        h = jnp.transpose(x_pixels, (0, 2, 3, 1)).astype(cfg.dtype)
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_in")(h)
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = VAEResBlock(ch, dtype=cfg.dtype,
                                name=f"down_{level}_block_{j}")(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad + stride-2 conv (the LDM VAE downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=cfg.dtype, name=f"down_{level}_ds")(h)
        h = VAEResBlock(h.shape[-1], dtype=cfg.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=cfg.dtype, name="mid_attn_1")(h)
        h = VAEResBlock(h.shape[-1], dtype=cfg.dtype, name="mid_block_2")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = nn.Conv(2 * cfg.z_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(nn.silu(h).astype(jnp.float32))
        if cfg.quant_conv:
            h = nn.Conv(2 * cfg.z_channels, (1, 1), dtype=jnp.float32,
                        name="quant_conv")(h)
        return jnp.transpose(h, (0, 3, 1, 2))


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        """(B, z, h, w) unscaled latent -> (B, 3, 8h, 8w) pixels in [-1, 1]."""
        cfg = self.cfg
        h = jnp.transpose(z, (0, 2, 3, 1)).astype(cfg.dtype)
        if cfg.quant_conv:
            h = nn.Conv(cfg.z_channels, (1, 1), dtype=cfg.dtype,
                        name="post_quant_conv")(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(h)
        h = VAEResBlock(ch, dtype=cfg.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=cfg.dtype, name="mid_attn_1")(h)
        h = VAEResBlock(ch, dtype=cfg.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResBlock(ch, dtype=cfg.dtype,
                                name=f"up_{level}_block_{j}")(h)
            if level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{level}_us")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(nn.silu(h).astype(jnp.float32))
        return jnp.transpose(h, (0, 3, 1, 2))


class VAE(nn.Module):
    """encode(pixels, rng|None) -> scaled latent; decode(latent) -> pixels."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = VAEEncoder(self.cfg)
        self.decoder = VAEDecoder(self.cfg)

    def encode(self, x_pixels, rng: Optional[jax.Array] = None):
        cfg = self.cfg
        moments = self.encoder(x_pixels)
        mean, logvar = jnp.split(moments, 2, axis=1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        return (mean - cfg.shift_factor) * cfg.scale_factor

    def decode(self, latent):
        cfg = self.cfg
        z = latent / cfg.scale_factor + cfg.shift_factor
        return self.decoder(z)

    def __call__(self, x_pixels, rng: Optional[jax.Array] = None):
        return self.decode(self.encode(x_pixels, rng))
