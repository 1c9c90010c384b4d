"""TAESD decoder — tiny autoencoder for fast latent previews.

The reference's per-step previews go through its host's
`latent_preview.prepare_callback` TAESD decoding (reference nodes.py:544,
613; throttled every 2 steps at nodes.py:188-196).  This is the public
TAESD decoder graph (madebyollin/taesd): clamp -> conv -> 3x(3 ResBlocks +
upsample + conv) -> ResBlock -> conv, ~1.2M params, cheap enough to run
per preview step.  Pair with `utils.make_preview_callback` and
`LanPaintSampler(callback=...)`.

Variants share the graph: taesd (SD1.x), taesdxl, taesd3/taef1 (16ch
latents) — pick `latent_channels` accordingly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _TBlock(nn.Module):
    """conv-relu-conv-relu-conv + identity skip, fused ReLU."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_2")(nn.relu(h))
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_4")(nn.relu(h))
        return nn.relu(h + x)


class TAESDDecoder(nn.Module):
    """(B, C_latent, h, w) scaled latent -> (B, 3, 8h, 8w) pixels [0, 1]."""

    latent_channels: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, latent):
        x = jnp.transpose(latent, (0, 2, 3, 1)).astype(self.dtype)
        x = jnp.tanh(x / 3.0) * 3.0  # Clamp
        x = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_in")(x))
        idx = 0
        for stage in range(3):
            for _ in range(3):
                x = _TBlock(dtype=self.dtype, name=f"block_{idx}")(x)
                idx += 1
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"up_conv_{stage}")(x)
        x = _TBlock(dtype=self.dtype, name=f"block_{idx}")(x)
        x = nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(x.astype(jnp.float32))
        return jnp.transpose(x, (0, 3, 1, 2))


def taesd_entries():
    """Public taesd_decoder.safetensors sequential layout -> our tree."""
    e = [("decoder.1", ("conv_in",), "conv", None)]
    seq = 3
    idx = 0
    for stage in range(3):
        for _ in range(3):
            for ci in (0, 2, 4):
                e.append((f"decoder.{seq}.conv.{ci}",
                          (f"block_{idx}", f"conv_{ci}"), "conv", None))
            seq += 1
            idx += 1
        seq += 1  # Upsample (no params)
        e.append((f"decoder.{seq}", (f"up_conv_{stage}",), "conv_nb", None))
        seq += 1
    for ci in (0, 2, 4):
        e.append((f"decoder.{seq}.conv.{ci}",
                  (f"block_{idx}", f"conv_{ci}"), "conv", None))
    seq += 1
    e.append((f"decoder.{seq}", ("conv_out",), "conv", None))
    return e


def import_taesd_decoder(state) -> dict:
    from .load import _import

    # tolerate files that store the decoder without the "decoder." prefix
    if not any(k.startswith("decoder.") for k in state):
        state = {f"decoder.{k}": v for k, v in state.items()}
    return _import(state, taesd_entries(), "")


def export_taesd_decoder(params) -> dict:
    from .load import _export

    return _export(params, taesd_entries(), "")
