"""Z-Image single-stream DiT (Tongyi S3-DiT, the Lumina2/NextDiT graph).

The "Z-Image" rows of the reference's model matrix (reference
README.md:131-139; example_workflows/Z_image_Inpaint.json +
Z_image_base_Inpaint.json).  The reference workflow pins the lineage
explicitly: `CLIPLoader [qwen_3_4b.safetensors, 'lumina2']` +
`ModelSamplingAuraFlow [3]` + the Flux 16ch `ae.safetensors` — Z-Image is
served by ComfyUI's Lumina2 (NextDiT) implementation, so this module
follows the public NextDiT structure (Alpha-VLLM Lumina-Image-2.0
`models/model.py`, mirrored by comfy/ldm/lumina):

* `x_embedder` bare Linear on packed patches;
* `context_refiner.{i}` — unmodulated sandwich-norm blocks over the text
  tokens; `noise_refiner.{i}` — t-modulated blocks over the image tokens;
* `layers.{i}` — the main single-stream blocks over [txt; img];
* JointTransformerBlock: fused GQA `attention.qkv` (bias-free), per-head
  RMS q/k norm, SwiGLU `feed_forward.w1/w2/w3`, sandwich RMSNorm pairs
  (attention_norm1/2, ffn_norm1/2), tanh-gated 4-chunk adaLN
  (scale_msa, gate_msa, scale_mlp, gate_mlp — scale/gate only, no shift);
* `cap_embedder` = RMSNorm + Linear on the Qwen3-4B hidden states;
* `final_layer` = scale-modulated LayerNorm + Linear; `norm_final` RMSNorm.

Key-layout proof: tests/manifests.py::zimage_manifest (independently
authored) vs load.import_zimage — tests/test_manifests.py.  The concrete
6B dims (hidden/depth/ffn) are recalled from the public release and
offline-unverifiable — flagged in docs/family_facts.md; the layout is the
manifest-tested part and the dims are one config edit.

TPU-first: all three block stacks are nn.scan'd (stacked params, one
compiled body each); attention via layers.attention_bshd (flash kernel at
video/image scale); GQA K/V heads broadcast with jnp.repeat before the
kernel (MXU-dense, no gather).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import RMSNorm, apply_rope, attention_bshd, rope_freqs, timestep_embedding


@dataclasses.dataclass(frozen=True)
class ZImageConfig:
    in_channels: int = 16           # latent channels (Flux ae)
    out_channels: int = 16
    patch: int = 2
    hidden: int = 3840
    num_heads: int = 30
    num_kv_heads: int = 30          # GQA-capable fused qkv layout
    depth: int = 30                 # main layers
    refiner_depth: int = 2          # noise_refiner blocks
    context_refiner_depth: int = 2
    ffn_dim: int = 10240            # SwiGLU inner width
    cap_dim: int = 2560             # Qwen3-4B hidden states
    axes_dim: Tuple[int, ...] = (32, 48, 48)
    theta: float = 10000.0
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @property
    def t_dim(self) -> int:
        # NextDiT: TimestepEmbedder(min(dim, 1024))
        return min(self.hidden, 1024)

    @property
    def latent_channels(self) -> int:
        return self.in_channels


Z_IMAGE_S3_CONFIG = ZImageConfig()
TINY_ZIMAGE_CONFIG = ZImageConfig(
    in_channels=4, out_channels=4, hidden=48, num_heads=4, num_kv_heads=2,
    depth=2, refiner_depth=1, context_refiner_depth=1, ffn_dim=80,
    cap_dim=24, axes_dim=(4, 4, 4),
)


def _rms(x, eps=1e-5):
    import jax

    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)


class ZAttention(nn.Module):
    """Fused-QKV grouped-query attention with per-head RMS q/k norm."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, pe):
        cfg = self.cfg
        h, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        b, s, _ = x.shape
        qkv = nn.Dense((h + 2 * kvh) * d, use_bias=False, dtype=cfg.dtype,
                       name="qkv")(x)
        q = qkv[..., : h * d].reshape(b, s, h, d)
        k = qkv[..., h * d: (h + kvh) * d].reshape(b, s, kvh, d)
        v = qkv[..., (h + kvh) * d:].reshape(b, s, kvh, d)
        q = RMSNorm(d, name="q_norm")(q)
        k = RMSNorm(d, name="k_norm")(k)
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        if kvh != h:
            k = jnp.repeat(k, h // kvh, axis=2)
            v = jnp.repeat(v, h // kvh, axis=2)
        out = attention_bshd(q, k, v, impl=cfg.attention_impl)
        out = out.reshape(b, s, h * d)
        return nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype,
                        name="out")(out)


class ZSwiGLU(nn.Module):
    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        a = nn.Dense(cfg.ffn_dim, use_bias=False, dtype=cfg.dtype, name="w1")(x)
        g = nn.Dense(cfg.ffn_dim, use_bias=False, dtype=cfg.dtype, name="w3")(x)
        return nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype,
                        name="w2")(nn.silu(a) * g)


class ZBlock(nn.Module):
    """NextDiT JointTransformerBlock: sandwich RMSNorm, tanh-gated adaLN."""

    cfg: ZImageConfig
    modulated: bool = True

    @nn.compact
    def __call__(self, x, pe, t_emb=None):
        cfg = self.cfg
        dt = cfg.dtype
        if self.modulated:
            mod = nn.Dense(4 * cfg.hidden, dtype=dt,
                           name="adaLN_modulation_1")(nn.silu(t_emb))
            s_msa, g_msa, s_mlp, g_mlp = jnp.split(mod[:, None, :], 4, axis=-1)
            g_msa, g_mlp = jnp.tanh(g_msa), jnp.tanh(g_mlp)
        else:
            s_msa = g_msa = s_mlp = g_mlp = None

        def scale(v, s):
            return v if s is None else v * (1.0 + s)

        def gate(v, g):
            return v if g is None else v * g

        h = RMSNorm(cfg.hidden, name="attention_norm1")(x)
        h = ZAttention(cfg, name="attention")(scale(h, s_msa).astype(dt), pe)
        x = x + gate(RMSNorm(cfg.hidden, name="attention_norm2")(h), g_msa)
        h = RMSNorm(cfg.hidden, name="ffn_norm1")(x)
        h = ZSwiGLU(cfg, name="feed_forward")(scale(h, s_mlp).astype(dt))
        return x + gate(RMSNorm(cfg.hidden, name="ffn_norm2")(h), g_mlp)


class _ScanZMod(nn.Module):
    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, pe, t_emb):
        x = ZBlock(self.cfg, modulated=True, name="block")(x, pe, t_emb)
        return x, None


class _ScanZPlain(nn.Module):
    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, pe):
        x = ZBlock(self.cfg, modulated=False, name="block")(x, pe)
        return x, None


class ZImageModel(nn.Module):
    """__call__(x_nchw, t, context) -> velocity prediction.

    `context`: (B, S_txt, cap_dim) Qwen3-4B hidden states."""

    cfg: ZImageConfig

    @nn.compact
    def __call__(self, x, t, context, vec=None):
        from .dit import image_ids, pack_latent, unpack_latent

        cfg = self.cfg
        dt = cfg.dtype
        b, c, hh, ww = x.shape
        img = pack_latent(x, cfg.patch).astype(dt)
        img = nn.Dense(cfg.hidden, dtype=dt, name="x_embedder")(img)

        # cap_embedder: RMSNorm(cap_dim) -> Linear(cap_dim, dim)
        txt = RMSNorm(cfg.cap_dim, name="cap_norm")(context)
        txt = nn.Dense(cfg.hidden, dtype=dt, name="cap_proj")(txt.astype(dt))

        t_emb = nn.Dense(cfg.t_dim, dtype=dt, name="t_mlp_0")(
            timestep_embedding(t * 1000.0, 256).astype(dt))
        t_emb = nn.Dense(cfg.t_dim, dtype=dt, name="t_mlp_2")(nn.silu(t_emb))

        # position ids: text tokens advance on axis 0; image tokens sit at
        # axis0 = n_txt with 2D spatial ids (NextDiT joint rope)
        n_txt = txt.shape[1]
        txt_ids = jnp.concatenate([
            jnp.arange(n_txt, dtype=jnp.int32)[None, :, None],
            jnp.zeros((1, n_txt, 2), jnp.int32),
        ], axis=-1)
        txt_ids = jnp.broadcast_to(txt_ids, (b, n_txt, 3))
        im_ids = image_ids(b, hh, ww, cfg.patch) + jnp.asarray(
            [n_txt, 0, 0], jnp.int32)
        pe_txt = rope_freqs(txt_ids, cfg.axes_dim, cfg.theta)
        pe_img = rope_freqs(im_ids, cfg.axes_dim, cfg.theta)
        pe_all = jnp.concatenate([pe_txt, pe_img], axis=1)

        if cfg.context_refiner_depth:
            scan_c = nn.scan(_ScanZPlain, variable_axes={"params": 0},
                             split_rngs={"params": True},
                             length=cfg.context_refiner_depth,
                             in_axes=nn.broadcast)
            txt, _ = scan_c(cfg, name="context_refiner")(txt, pe_txt)
        if cfg.refiner_depth:
            scan_n = nn.scan(_ScanZMod, variable_axes={"params": 0},
                             split_rngs={"params": True},
                             length=cfg.refiner_depth, in_axes=nn.broadcast)
            img, _ = scan_n(cfg, name="noise_refiner")(img, pe_img, t_emb)

        xcat = jnp.concatenate([txt, img], axis=1)
        scan_m = nn.scan(_ScanZMod, variable_axes={"params": 0},
                         split_rngs={"params": True}, length=cfg.depth,
                         in_axes=nn.broadcast)
        xcat, _ = scan_m(cfg, name="layers")(xcat, pe_all, t_emb)
        img = xcat[:, n_txt:]

        img = RMSNorm(cfg.hidden, name="norm_final")(img)
        scale = nn.Dense(cfg.hidden, dtype=dt,
                         name="final_adaLN_1")(nn.silu(t_emb))[:, None, :]
        # FinalLayer: parameter-free LayerNorm, scale-only modulation
        mu = jnp.mean(img.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(img.astype(jnp.float32), axis=-1, keepdims=True)
        import jax

        normed = (img.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-6)
        normed = normed * (1.0 + scale.astype(jnp.float32))
        out = nn.Dense(cfg.out_channels * cfg.patch * cfg.patch,
                       dtype=jnp.float32, name="final_linear")(normed)
        return unpack_latent(out, hh, ww, cfg.patch)
