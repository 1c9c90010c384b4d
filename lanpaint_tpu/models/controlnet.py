"""ControlNet (LDM/SGM cldm family) for the SD UNet backbones.

The reference's "works with ControlNet" capability (reference
README.md:133) is host-provided there (ComfyUI controlnet loading +
apply_control); here the standard ControlNet architecture is implemented
natively: the UNet's encoder half with a pixel-space hint encoder
(`input_hint_block`, 8 convs downsampling the control image to latent
resolution) and a zero-initialized 1x1 projection (`zero_convs`) after
every skip position plus `middle_block_out`.  The produced residual dict
plugs into `UNetModel.__call__(..., control=...)`.

Checkpoint layout follows the public cldm keys (prefix `control_model.`):
shared encoder tensors reuse the UNet entry table; ControlNet-specific
tensors are `input_hint_block.{0,2,..,14}`, `zero_convs.{j}.0`,
`middle_block_out.0`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Downsample, MLPEmbedder, ResBlock, SpatialTransformer, timestep_embedding
from .unet import UNetConfig


class _HintBlock(nn.Module):
    """Pixel hint (B, 3, H*8, W*8) -> latent-res feature (model_channels)."""

    model_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hint):
        h = jnp.transpose(hint, (0, 2, 3, 1)).astype(self.dtype)
        widths = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1),
                  (256, 2), (self.model_channels, 1)]
        for j, (w, stride) in enumerate(widths):
            h = nn.Conv(w, (3, 3), strides=(stride, stride), padding=1,
                        dtype=self.dtype, name=f"conv_{j}")(h)
            if j < len(widths) - 1:
                h = nn.silu(h)
        return h


class ControlNet(nn.Module):
    """__call__(x_nchw, hint_nchw_pixels, timesteps, context, y) ->
    {"input": [res per skip position], "middle": res}."""

    cfg: UNetConfig

    def _heads(self, ch: int) -> int:
        if self.cfg.head_dim is not None:
            return ch // self.cfg.head_dim
        return self.cfg.num_heads

    @nn.compact
    def __call__(self, x, hint, timesteps, context, y=None):
        cfg = self.cfg
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype)
        context = context.astype(cfg.dtype)

        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(cfg.dtype)
        emb = MLPEmbedder(cfg.model_channels * 4, dtype=cfg.dtype,
                          name="time_embed")(t_emb)
        if cfg.adm_in_channels is not None:
            assert y is not None
            emb = emb + MLPEmbedder(cfg.model_channels * 4, dtype=cfg.dtype,
                                    name="label_emb")(y.astype(cfg.dtype))

        guided = _HintBlock(cfg.model_channels, dtype=cfg.dtype,
                            name="input_hint_block")(hint)

        outs = []

        def zero_conv(h, j):
            # zero-initialized 1x1 (identity-at-init residuals, cldm design)
            return nn.Conv(h.shape[-1], (1, 1), dtype=cfg.dtype,
                           kernel_init=nn.initializers.zeros,
                           name=f"zero_conv_{j}")(h)

        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    name="input_conv")(x)
        h = h + guided
        outs.append(zero_conv(h, 0))

        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, dtype=cfg.dtype,
                             name=f"down_{level}_{i}_res")(h, emb)
                if cfg.transformer_depth[level] > 0:
                    h = SpatialTransformer(
                        ch, cfg.context_dim, self._heads(ch),
                        depth=cfg.transformer_depth[level], dtype=cfg.dtype,
                        fused=cfg.fused_qkv,
                        name=f"down_{level}_{i}_attn")(h, context)
                outs.append(zero_conv(h, len(outs)))
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=cfg.dtype, name=f"down_{level}_ds")(h)
                outs.append(zero_conv(h, len(outs)))

        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, dtype=cfg.dtype, name="mid_res1")(h, emb)
        if cfg.transformer_depth_middle > 0:
            h = SpatialTransformer(ch, cfg.context_dim, self._heads(ch),
                                   depth=cfg.transformer_depth_middle,
                                   dtype=cfg.dtype, fused=cfg.fused_qkv,
                                   name="mid_attn")(h, context)
        h = ResBlock(ch, dtype=cfg.dtype, name="mid_res2")(h, emb)
        mid = nn.Conv(ch, (1, 1), dtype=cfg.dtype,
                      kernel_init=nn.initializers.zeros,
                      name="middle_block_out")(h)

        # encoder-order residuals are consumed at the matching skips in the
        # UNet's up path -> the "output" slot (see UNetModel control doc)
        return {"output": outs, "middle": mid}


def scale_control(control: dict, strength: float) -> dict:
    """Scale a control dict (the node-graph "strength" knob)."""
    out = {}
    for k, v in control.items():
        if isinstance(v, list):
            out[k] = [None if c is None else c * strength for c in v]
        else:
            out[k] = None if v is None else v * strength
    return out
