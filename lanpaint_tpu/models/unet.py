"""Stable-Diffusion UNet family (SD1.5 / SD2.x / SDXL) in flax.

Config-driven UNet covering the eps-pred backbones the reference's example
workflows use (reference example_workflows/SDXL_Inpaint.json and
README.md:131-139 model matrix).  NHWC layout, bf16 compute / fp32 params,
GroupNorm in fp32.  Channel/attention layouts follow the public LDM/SGM
architecture definitions so safetensors checkpoints map 1:1
(lanpaint_tpu.models.load).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    Downsample,
    GroupNorm32,
    MLPEmbedder,
    ResBlock,
    SpatialTransformer,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    # transformer depth per resolution level; 0 = no attention at that level
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 0)
    transformer_depth_middle: int = 1
    context_dim: int = 768
    # None => fixed 8 heads (SD1.x); an int => fixed head_dim (SDXL: 64)
    head_dim: Optional[int] = None
    num_heads: int = 8
    # SDXL micro-conditioning: pooled text (1280) + 6x256 size embeds -> 2816
    adm_in_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    # Import-time QKV fusion (measured perf lever, docs/architecture.md):
    # attn1 q/k/v as one GEMM, attn2 k/v fused AND hoisted out of the depth
    # scan.  Public checkpoint keys stay split; load.import_unet fuses on
    # import, export_unet splits back (load.fuse_unet_qkv/unfuse_unet_qkv).
    fused_qkv: bool = True


SD15_CONFIG = UNetConfig()
SD21_CONFIG = UNetConfig(context_dim=1024, head_dim=64)
SDXL_CONFIG = UNetConfig(
    channel_mult=(1, 2, 4),
    transformer_depth=(0, 2, 10),
    transformer_depth_middle=10,
    context_dim=2048,
    head_dim=64,
    adm_in_channels=2816,
)
TINY_UNET_CONFIG = UNetConfig(  # test-size config
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    transformer_depth=(1, 1),
    transformer_depth_middle=1,
    context_dim=32,
    head_dim=16,
)


class UNetModel(nn.Module):
    """SD UNet.  __call__(x_nchw, timesteps, context, y) -> eps prediction."""

    cfg: UNetConfig

    def _heads(self, ch: int) -> int:
        if self.cfg.head_dim is not None:
            return ch // self.cfg.head_dim
        return self.cfg.num_heads

    @nn.compact
    def __call__(self, x, timesteps, context, y=None, control=None,
                 kv_cache=None):
        """`control` (ControlNet residual injection, the reference's
        "works with ControlNet" feature via the host's apply_control):
        optional dict with "input" (list added to each skip activation as
        it is produced), "middle" (added after the middle block) and/or
        "output" (list added to each skip as it is consumed in the up
        path).  Both lists are indexed by the skip's production (append)
        order — a ControlNet's encoder-order residuals plug into "output"
        directly.  Entries may be None; lists may be shorter than the
        skip count (missing entries are no-ops).

        `kv_cache` (fused_qkv only): dict mapping SpatialTransformer module
        name -> precomputed cross-attention k/v projection of shape
        (B, depth, T, 2*ch) — see zoo.unet_precompute_kv.  The text context
        is constant within a sampling run, so the sampler hoists these
        einsums out of the solver/think loops entirely."""
        cfg = self.cfg
        kv_cache = kv_cache or {}
        ctl_in = list((control or {}).get("input") or [])
        ctl_out = list((control or {}).get("output") or [])
        ctl_mid = (control or {}).get("middle")

        def add_ctl(h, entries, idx):
            if idx < len(entries) and entries[idx] is not None:
                h = h + entries[idx].astype(h.dtype)
            return h

        x = jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype)  # NCHW -> NHWC
        context = context.astype(cfg.dtype)

        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(cfg.dtype)
        emb = MLPEmbedder(cfg.model_channels * 4, dtype=cfg.dtype, name="time_embed")(t_emb)
        if cfg.adm_in_channels is not None:
            assert y is not None, "SDXL UNet needs pooled conditioning y"
            emb = emb + MLPEmbedder(cfg.model_channels * 4, dtype=cfg.dtype,
                                    name="label_emb")(y.astype(cfg.dtype))

        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    name="input_conv")(x)
        h = add_ctl(h, ctl_in, 0)
        skips = [h]

        # down path
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, dtype=cfg.dtype, name=f"down_{level}_{i}_res")(h, emb)
                if cfg.transformer_depth[level] > 0:
                    name = f"down_{level}_{i}_attn"
                    h = SpatialTransformer(
                        ch, cfg.context_dim, self._heads(ch),
                        depth=cfg.transformer_depth[level], dtype=cfg.dtype,
                        fused=cfg.fused_qkv,
                        name=name)(h, context, kv_pre=kv_cache.get(name))
                h = add_ctl(h, ctl_in, len(skips))
                skips.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=cfg.dtype, name=f"down_{level}_ds")(h)
                h = add_ctl(h, ctl_in, len(skips))
                skips.append(h)

        # middle
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, dtype=cfg.dtype, name="mid_res1")(h, emb)
        if cfg.transformer_depth_middle > 0:
            h = SpatialTransformer(ch, cfg.context_dim, self._heads(ch),
                                   depth=cfg.transformer_depth_middle,
                                   dtype=cfg.dtype, fused=cfg.fused_qkv,
                                   name="mid_attn")(
                h, context, kv_pre=kv_cache.get("mid_attn"))
        h = ResBlock(ch, dtype=cfg.dtype, name="mid_res2")(h, emb)
        if ctl_mid is not None:
            h = h + ctl_mid.astype(h.dtype)

        # up path
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks + 1):
                idx = len(skips) - 1
                skip = add_ctl(skips.pop(), ctl_out, idx)
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(ch, dtype=cfg.dtype, name=f"up_{level}_{i}_res")(h, emb)
                if cfg.transformer_depth[level] > 0:
                    name = f"up_{level}_{i}_attn"
                    h = SpatialTransformer(
                        ch, cfg.context_dim, self._heads(ch),
                        depth=cfg.transformer_depth[level], dtype=cfg.dtype,
                        fused=cfg.fused_qkv,
                        name=name)(h, context, kv_pre=kv_cache.get(name))
            if level != 0:
                h = Upsample(ch, dtype=cfg.dtype, name=f"up_{level}_us")(h)

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="out_conv")(h.astype(jnp.float32))
        return jnp.transpose(h, (0, 3, 1, 2))  # NHWC -> NCHW


def sdxl_pooled_y(pooled_text: jnp.ndarray, height: int = 1024, width: int = 1024,
                  crop_h: int = 0, crop_w: int = 0, target_h: Optional[int] = None,
                  target_w: Optional[int] = None) -> jnp.ndarray:
    """Assemble SDXL's 2816-dim micro-conditioning vector: pooled CLIP text
    (1280) + sinusoidal embeds of (orig_h, orig_w, crop_h, crop_w, target_h,
    target_w), 256 each."""
    target_h = height if target_h is None else target_h
    target_w = width if target_w is None else target_w
    b = pooled_text.shape[0]
    sizes = jnp.asarray([[height, width, crop_h, crop_w, target_h, target_w]],
                        jnp.float32)
    sizes = jnp.tile(sizes, (b, 1))
    embs = [timestep_embedding(sizes[:, i], 256) for i in range(6)]
    return jnp.concatenate([pooled_text] + embs, axis=-1)
