"""Qwen2.5-VL vision tower — the image half of Qwen-Image-Edit conditioning.

The reference's Qwen edit workflows (example_workflows/Qwen_Image_Edit_2509
.json) encode the source image through Qwen2.5-VL: ViT patches -> 32 blocks
of windowed attention (full attention every 8th block) -> 2x2 patch merger,
and the merged vision tokens are spliced into the prompt sequence consumed
by the Qwen2.5 text stack (models/textenc.py QWEN25_7B_CONFIG).

TPU-first design (vs the HF torch implementation this is golden-tested
against, transformers qwen2_5_vl/modeling_qwen2_5_vl.py):

* The window partition/ordering is STATIC given the image grid — computed
  once host-side in numpy (`vision_plan`), not with device-side dynamic
  `cu_seqlens`.  Partial edge windows are PADDED to full windows and
  masked, so every shape in the program is static.
* Window attention is one batched dense attention over (n_windows,
  window_len) — small uniform tiles that map straight onto the MXU; the
  four full-attention blocks run a single flash-eligible pass over the
  padded sequence.  No varlen kernels, no gather/scatter per block.
* The Conv3d patch embed (kernel == stride) is algebraically one matmul:
  tokens arrive pre-patched as (S, C*tps*ps*ps) rows (`preprocess_image`
  reproduces the HF processor's patch flatten order bit-for-bit).
* Blocks run under one `lax.scan` with a per-layer is_full flag riding the
  xs; `lax.cond` switches attention pattern (identical shapes both ways).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# HF processor constants (transformers image_utils OPENAI_CLIP_MEAN/STD)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden: int = 1280
    num_heads: int = 16
    intermediate: int = 3420
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112              # pixels per attention window side
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_hidden: int = 3584              # text-stack width (QWEN25_7B dim)
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @property
    def window_units(self) -> int:
        """Merged-token units per window side (HF vit_merger_window_size)."""
        return self.window_size // self.spatial_merge_size // self.patch_size


# Qwen2.5-VL-7B-Instruct vision_config (the qwen_2.5_vl_7b.safetensors the
# reference's DualCLIPLoader pins for Qwen-Image / Qwen-Image-Edit)
QWEN25_VL_VISION_CONFIG = QwenVLVisionConfig()
TINY_VL_VISION_CONFIG = QwenVLVisionConfig(
    depth=4, hidden=32, num_heads=4, intermediate=48, patch_size=2,
    window_size=8, fullatt_block_indexes=(1, 3), out_hidden=24,
)


@functools.lru_cache(maxsize=32)
def vision_plan(cfg: QwenVLVisionConfig, grid: Tuple[int, int, int]):
    """Static window/RoPE plan for one image grid (t, h, w in raw patches).

    Mirrors the reference's get_window_index/rot_pos_emb (modeling_qwen2_5_
    vl.py) but keeps the padded window slots instead of filtering them, so
    the device program is shape-static.  Returns numpy arrays:

    gather   (Sp_units,)  source merged-unit index per padded slot (0 for pad)
    valid    (Sp_units,)  bool, slot holds a real unit
    inv      (S_units,)   padded slot holding original unit i (argsort dual)
    cos/sin  (Sp, head_dim) rotary tables in padded window order
    n_win    number of windows; win_len = raw tokens per window
    """
    t, h, w = grid
    m = cfg.spatial_merge_size
    if h % m or w % m:
        raise ValueError(f"grid {grid} not divisible by merge size {m}")
    lh, lw = h // m, w // m
    vw = cfg.window_units
    pad_h, pad_w = (-lh) % vw, (-lw) % vw
    nwh, nww = (lh + pad_h) // vw, (lw + pad_w) // vw

    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    idxp = np.full((t, lh + pad_h, lw + pad_w), -1, np.int64)
    idxp[:, :lh, :lw] = idx
    idxp = (idxp.reshape(t, nwh, vw, nww, vw)
                .transpose(0, 1, 3, 2, 4).reshape(-1))
    valid = idxp >= 0
    gather = np.where(valid, idxp, 0)
    inv = np.zeros(t * lh * lw, np.int64)
    inv[idxp[valid]] = np.nonzero(valid)[0]

    # rotary tables: (h, w) position per raw token in merged-group order
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
    def group(p):  # noqa: E306
        return (p.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1))
    pos = np.stack([group(hpos), group(wpos)], axis=-1)      # (h*w, 2)
    pos = np.tile(pos, (t, 1))                                # (S_raw, 2)
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta
                      ** (np.arange(0, half, 2, np.float32) / half))
    freqs = pos[:, :, None] * inv_freq[None, None, :]         # (S, 2, half/2)
    rpe = freqs.reshape(pos.shape[0], -1)                     # (S, half)
    # permute raw tokens into padded window order (unit = m*m raw tokens)
    unit = cfg.merge_unit
    rpe = rpe.reshape(-1, unit, rpe.shape[-1])[gather].reshape(-1, half)
    emb = np.concatenate([rpe, rpe], axis=-1)                 # (Sp, head_dim)
    return dict(
        gather=gather, valid=valid, inv=inv,
        cos=np.cos(emb).astype(np.float32),
        sin=np.sin(emb).astype(np.float32),
        n_win=t * nwh * nww, win_len=vw * vw * unit,
    )


class _VisionBlock(nn.Module):
    cfg: QwenVLVisionConfig
    n_win: int
    win_len: int

    @nn.compact
    def __call__(self, x, inputs):
        cos, sin, key_ok, is_full = inputs
        c = self.cfg
        dt = c.dtype
        s = x.shape[0]
        hd, nh = c.head_dim, c.num_heads

        h = _rms(x, self.param("norm1", nn.initializers.ones, (c.hidden,),
                               jnp.float32), c.rms_eps).astype(dt)
        qkv = nn.Dense(3 * c.hidden, dtype=dt, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(s, 3 * nh, hd), 3, axis=1)

        # RoPE in fp32 (HF apply_rotary_pos_emb_vision)
        cs, sn = cos[:, None, :], sin[:, None, :]
        q = (q.astype(jnp.float32) * cs
             + _rotate_half(q.astype(jnp.float32)) * sn).astype(dt)
        k = (k.astype(jnp.float32) * cs
             + _rotate_half(k.astype(jnp.float32)) * sn).astype(dt)

        def window_attn(q, k, v):
            shape = (self.n_win, self.win_len, nh, hd)
            mask = key_ok.reshape(self.n_win, self.win_len)[:, None, None, :]
            out = jax.nn.dot_product_attention(
                q.reshape(shape), k.reshape(shape), v.reshape(shape),
                mask=mask)
            return out.reshape(s, nh, hd)

        def full_attn(q, k, v):
            mask = key_ok[None, None, None, :]
            out = jax.nn.dot_product_attention(
                q[None], k[None], v[None], mask=mask)
            return out[0]

        att = jax.lax.cond(is_full, full_attn, window_attn, q, k, v)
        x = x + nn.Dense(c.hidden, dtype=dt,
                         name="proj")(att.reshape(s, c.hidden))

        h = _rms(x, self.param("norm2", nn.initializers.ones, (c.hidden,),
                               jnp.float32), c.rms_eps).astype(dt)
        g = nn.silu(nn.Dense(c.intermediate, dtype=dt, name="gate")(h))
        u = nn.Dense(c.intermediate, dtype=dt, name="up")(h)
        x = x + nn.Dense(c.hidden, dtype=dt, name="down")(g * u)
        return x, None


def _rms(x, scale, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1,
                                    keepdims=True) + eps)
    return n * scale


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


class _ScanVisionBlock(nn.Module):
    cfg: QwenVLVisionConfig
    n_win: int
    win_len: int

    @nn.compact
    def __call__(self, x, inputs):
        return _VisionBlock(self.cfg, self.n_win, self.win_len,
                            name="block")(x, inputs)


class QwenVLVision(nn.Module):
    """__call__(patches (S, C*tps*ps*ps)) -> (S/merge_unit, out_hidden).

    `grid` (t, h, w in raw patches) is static module metadata: parameters
    are grid-independent; a new grid is a new jit specialization, matching
    the HF model's dynamic-resolution contract with static XLA shapes.
    """

    cfg: QwenVLVisionConfig
    grid: Tuple[int, int, int]

    @nn.compact
    def __call__(self, patches):
        c = self.cfg
        plan = vision_plan(c, tuple(self.grid))
        unit = c.merge_unit
        s_raw = patches.shape[0]

        x = nn.Dense(c.hidden, use_bias=False, dtype=c.dtype,
                     name="patch_embed")(patches.astype(c.dtype))
        # permute merged units into padded window order; pad slots are zero
        x = x.reshape(s_raw // unit, unit, c.hidden)
        x = jnp.where(jnp.asarray(plan["valid"])[:, None, None],
                      x[jnp.asarray(plan["gather"])], 0.0)
        sp = x.shape[0] * unit
        x = x.reshape(sp, c.hidden)

        key_ok = jnp.repeat(jnp.asarray(plan["valid"]), unit)
        is_full = jnp.zeros((c.depth,), bool).at[
            jnp.asarray(c.fullatt_block_indexes)].set(True)
        scan = nn.scan(_ScanVisionBlock, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=c.depth,
                       in_axes=((nn.broadcast, nn.broadcast, nn.broadcast,
                                 0),))
        x, _ = scan(c, plan["n_win"], plan["win_len"], name="blocks")(
            x, (jnp.asarray(plan["cos"]), jnp.asarray(plan["sin"]),
                key_ok, is_full))

        # patch merger: RMS -> concat 2x2 unit -> MLP (exact GELU, HF
        # nn.GELU default)
        x = _rms(x, self.param("ln_q", nn.initializers.ones, (c.hidden,),
                               jnp.float32), c.rms_eps).astype(c.dtype)
        x = x.reshape(sp // unit, unit * c.hidden)
        x = nn.Dense(unit * c.hidden, dtype=c.dtype, name="merger_0")(x)
        x = nn.Dense(c.out_hidden, dtype=c.dtype,
                     name="merger_2")(nn.gelu(x, approximate=False))
        # restore original merged-token order, dropping pad slots
        return x[jnp.asarray(plan["inv"])]


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """HF qwen2_vl smart_resize: round to multiples of `factor` inside the
    pixel budget, preserving aspect ratio."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio must be < 200")
    h = round(height / factor) * factor
    w = round(width / factor) * factor
    if h * w > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h = max(factor, math.floor(height / beta / factor) * factor)
        w = max(factor, math.floor(width / beta / factor) * factor)
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h = math.ceil(height * beta / factor) * factor
        w = math.ceil(width * beta / factor) * factor
    return h, w


def preprocess_image(img: np.ndarray, cfg: QwenVLVisionConfig,
                     resize: bool = True):
    """(H, W, 3) float [0, 1] pixels -> (patches (S, C*tps*ps*ps), grid).

    Reproduces the HF Qwen2VLImageProcessor patch pipeline: smart_resize to
    multiples of patch*merge, CLIP mean/std normalize, duplicate the frame
    temporal_patch_size times, and flatten in the processor's exact
    (gh, gw, mh, mw, C, tps, ph, pw) order."""
    img = np.asarray(img, np.float32)
    hh, ww = img.shape[:2]
    factor = cfg.patch_size * cfg.spatial_merge_size
    if resize and (hh % factor or ww % factor):
        th, tw = smart_resize(hh, ww, factor)
        img = np.asarray(jax.image.resize(jnp.asarray(img), (th, tw, 3),
                                          "bicubic"))
        hh, ww = th, tw
    img = (img - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    chw = img.transpose(2, 0, 1)                               # (C, H, W)
    frames = np.broadcast_to(chw, (cfg.temporal_patch_size,) + chw.shape)
    ps, m = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = hh // ps, ww // ps
    p = frames.reshape(1, cfg.temporal_patch_size, cfg.in_channels,
                       gh // m, m, ps, gw // m, m, ps)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = p.reshape(gh * gw, cfg.in_channels
                        * cfg.temporal_patch_size * ps * ps)
    return patches.astype(np.float32), (1, gh, gw)
