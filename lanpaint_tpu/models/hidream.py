"""HiDream-I1 MoE-MMDiT backbone (flow-matching family).

The "HiDream" row of the reference's supported-model matrix (reference
README.md:131-139).  Structure follows the public HiDream-I1 transformer
(HiDream-ai/HiDream-I1 `transformer_hidream_image.py`, the layout the
ComfyUI host loads through UNETLoader):

* double-stream blocks: separate image/text projections (`to_q` vs
  `to_q_t`), joint attention over [txt; llama_i; img], ONE fused 12-chunk
  adaLN per block (6 img + 6 txt), image-stream SwiGLU **mixture of
  experts** (shared expert + top-k of `num_experts` routed) and a plain
  SwiGLU on the text stream;
* single-stream blocks over the concatenated stream, 6-chunk adaLN, MoE FF;
* per-block text injection: caption_projection.{i} projects one Llama
  hidden-state slice for EVERY double and single block (appended to the
  token stream for that block only, then stripped); the LAST caption
  projection maps the carried T5 stream;
* full-width (not per-head) RMS q/k normalization.

TPU-first choices: experts are evaluated densely as one stacked einsum and
combined with the (renormalized) top-k routing weights — with 4 routed
experts this keeps every FLOP on the MXU with zero gather/scatter dispatch,
and is exactly equivalent to sparse dispatch.  Depth is scanned; the
per-block projected Llama slices ride the scan's per-iteration xs, and the
caption projections are evaluated OUTSIDE the scans as two stacked einsums.

Key-layout fidelity: tests/manifests.py::hidream_manifest reproduces the
public state-dict layout independently; tests/test_manifests.py asserts
load.import_hidream consumes exactly that key set.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MLPEmbedder, RMSNorm, apply_rope, attention_bshd, rope_freqs, timestep_embedding


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    in_channels: int = 64          # packed 2x2 patches of the 16ch latent
    out_channels: int = 64
    hidden: int = 2560
    num_heads: int = 20
    depth_double: int = 16
    depth_single: int = 32
    ffn_dim: int = 6912            # SwiGLU inner width (2/3*4h rounded to 256)
    num_experts: int = 4
    num_activated: int = 2
    context_dim: int = 4096        # T5-XXL features
    llama_dim: int = 4096          # Llama-3.1 hidden states (per layer)
    vec_dim: int = 2048            # pooled CLIP
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    attention_impl: str = "auto"
    patch: int = 2
    latent_channels: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


HIDREAM_I1_CONFIG = HiDreamConfig()
TINY_HIDREAM_CONFIG = HiDreamConfig(
    in_channels=16, out_channels=16, hidden=64, num_heads=4, depth_double=2,
    depth_single=2, ffn_dim=96, context_dim=32, llama_dim=24, vec_dim=16,
    axes_dim=(4, 6, 6), latent_channels=4,
)


class SwiGLU(nn.Module):
    """w2(silu(w1 x) * w3 x) — the shared (always-on) expert."""

    inner: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.inner, use_bias=False, dtype=self.dtype, name="w1")(x)
        g = nn.Dense(self.inner, use_bias=False, dtype=self.dtype, name="w3")(x)
        return nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                        name="w2")(nn.silu(a) * g)


class MoEFeedForward(nn.Module):
    """Shared expert + top-k of `num_experts` routed SwiGLU experts.

    Dense-compute formulation: the routed experts are stacked (E, in, out)
    and evaluated for every token in one einsum, then combined with the
    renormalized top-k softmax gate.  At E=4/k=2 this is 2x the activated
    FLOPs but runs entirely on the MXU with no token dispatch — measured
    faster on TPU than gather/scatter routing at these widths.  Public
    per-expert tensors (`experts.{j}.w1` ...) stack into the (E, ...)
    weights on import (load.import_hidream).
    """

    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        e, inner, h = cfg.num_experts, cfg.ffn_dim, cfg.hidden
        shared = SwiGLU(inner, h, dtype=cfg.dtype, name="shared")(x)

        # router in fp32 for stable softmax/top-k
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          name="gate")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, cfg.num_activated)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # dense weights (B, S, E): renormalized top-k, zero elsewhere
        weights = jnp.sum(
            jax.nn.one_hot(topi, e, dtype=jnp.float32) * topv[..., None],
            axis=-2)

        w1 = self.param("experts_w1", nn.initializers.normal(0.02),
                        (e, h, inner), jnp.float32).astype(cfg.dtype)
        w3 = self.param("experts_w3", nn.initializers.normal(0.02),
                        (e, h, inner), jnp.float32).astype(cfg.dtype)
        w2 = self.param("experts_w2", nn.initializers.normal(0.02),
                        (e, inner, h), jnp.float32).astype(cfg.dtype)
        a = jnp.einsum("bsh,ehi->bsei", x, w1)
        g = jnp.einsum("bsh,ehi->bsei", x, w3)
        out = jnp.einsum("bsei,eih->bseh", nn.silu(a) * g, w2)
        routed = jnp.einsum("bseh,bse->bsh", out,
                            weights.astype(cfg.dtype))
        return shared + routed


class _Modulation(nn.Module):
    """SiLU -> Linear producing n fused adaLN chunks (public
    `adaLN_modulation.1`: ONE Linear per block — 12-chunk for double
    blocks, 6 for single)."""

    hidden: int
    n: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vec):
        out = nn.Dense(self.n * self.hidden, dtype=self.dtype,
                       name="lin")(nn.silu(vec))
        return jnp.split(out[:, None, :], self.n, axis=-1)


def _modulate(x, shift, scale):
    return (1 + scale) * x + shift


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


class HiDreamDoubleBlock(nn.Module):
    """img/txt dual-stream block with joint attention and MoE FF (img).

    `llama` arrives already projected to hidden width (caption_projection
    runs outside the scan); it is appended to the carried txt for this
    block only and stripped afterwards — the public per-block injection.
    """

    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, img, txt, vec, pe, llama):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim

        mods = _Modulation(cfg.hidden, 12, dtype=cfg.dtype,
                           name="adaLN_modulation")(vec)
        im, tm = mods[:6], mods[6:]

        txt_full = jnp.concatenate([txt, llama.astype(txt.dtype)], axis=1)

        def qkv(x, suffix):
            q = nn.Dense(cfg.hidden, dtype=cfg.dtype, name=f"to_q{suffix}")(x)
            k = nn.Dense(cfg.hidden, dtype=cfg.dtype, name=f"to_k{suffix}")(x)
            v = nn.Dense(cfg.hidden, dtype=cfg.dtype, name=f"to_v{suffix}")(x)
            # full-width RMS q/k norm (public q_rms_norm: RMSNorm(inner_dim))
            q = RMSNorm(cfg.hidden, name=f"q_rms_norm{suffix}")(q)
            k = RMSNorm(cfg.hidden, name=f"k_rms_norm{suffix}")(k)
            b, s, _ = q.shape
            return (t.reshape(b, s, h, d) for t in (q, k, v))

        img_n = _modulate(_ln(img), im[0], im[1]).astype(cfg.dtype)
        txt_n = _modulate(_ln(txt_full), tm[0], tm[1]).astype(cfg.dtype)
        iq, ik, iv = qkv(img_n, "")
        tq, tk, tv = qkv(txt_n, "_t")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, cfg.hidden)
        n_txt = txt_full.shape[1]
        txt_a, img_a = attn[:, :n_txt], attn[:, n_txt:]

        img = img + im[2] * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="to_out")(img_a)
        img_n2 = _modulate(_ln(img), im[3], im[4]).astype(cfg.dtype)
        img = img + im[5] * MoEFeedForward(cfg, name="ff_i")(img_n2)

        # carried txt stream keeps only the persistent (T5) tokens
        txt_keep = txt_a[:, :txt.shape[1]]
        txt = txt + tm[2] * nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                     name="to_out_t")(txt_keep)
        txt_n2 = _modulate(_ln(txt), tm[3], tm[4]).astype(cfg.dtype)
        txt = txt + tm[5] * SwiGLU(cfg.ffn_dim, cfg.hidden, dtype=cfg.dtype,
                                   name="ff_t")(txt_n2)
        return img, txt


class HiDreamSingleBlock(nn.Module):
    """single-stream block with per-block llama append (public behavior:
    tokens concatenated before the block, stripped after) and MoE FF."""

    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x, vec, pe, llama):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        n_keep = x.shape[1]
        x_full = jnp.concatenate([x, llama.astype(x.dtype)], axis=1)
        m = _Modulation(cfg.hidden, 6, dtype=cfg.dtype,
                        name="adaLN_modulation")(vec)
        xn = _modulate(_ln(x_full), m[0], m[1]).astype(cfg.dtype)
        q = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="to_q")(xn)
        k = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="to_k")(xn)
        v = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="to_v")(xn)
        q = RMSNorm(cfg.hidden, name="q_rms_norm")(q)
        k = RMSNorm(cfg.hidden, name="k_rms_norm")(k)
        b, s, _ = q.shape
        q, k, v = (t.reshape(b, s, h, d) for t in (q, k, v))
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl)
        x_full = x_full + m[2] * nn.Dense(
            cfg.hidden, dtype=cfg.dtype,
            name="to_out")(attn.reshape(b, s, cfg.hidden))
        xn2 = _modulate(_ln(x_full), m[3], m[4]).astype(cfg.dtype)
        x_full = x_full + m[5] * MoEFeedForward(cfg, name="ff_i")(xn2)
        return x_full[:, :n_keep]


class _ScanHiDouble(nn.Module):
    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, carry, vec, pe, llama):
        img, txt = carry
        img, txt = HiDreamDoubleBlock(self.cfg, name="block")(
            img, txt, vec, pe, llama)
        return (img, txt), None


class _ScanHiSingle(nn.Module):
    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x, vec, pe, llama):
        x = HiDreamSingleBlock(self.cfg, name="block")(x, vec, pe, llama)
        return x, None


class HiDreamModel(nn.Module):
    """__call__(x_nchw, t, context, vec, llama) -> velocity prediction.

    `context`: (B, S_t5, context_dim) carried T5 stream (projected by the
               LAST caption projection, public caption_projection[-1]).
    `llama`:   (L, B, S_ll, llama_dim) per-layer Llama features; block i
               (counting double then single) consumes slice i % L through
               its own caption projection.
    """

    cfg: HiDreamConfig

    @nn.compact
    def __call__(self, x, t, context, vec=None, llama=None):
        from .dit import image_ids, pack_latent, unpack_latent

        cfg = self.cfg
        b, c, hh, ww = x.shape
        img = pack_latent(x, cfg.patch).astype(cfg.dtype)
        img = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="x_embedder")(img)
        # public caption_projection: bias-free TextProjection per consumer
        txt = nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype,
                       name="txt_in")(context.astype(cfg.dtype))

        v = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="time_in")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        if cfg.vec_dim > 0 and vec is not None:
            v = v + MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="vector_in")(
                vec.astype(cfg.dtype))

        if llama is None:
            llama = jnp.zeros((1, b, 1, cfg.llama_dim), jnp.float32)
        n_ll = llama.shape[2]

        # per-block caption projections, evaluated OUTSIDE the scans as two
        # stacked einsums (one for the double range, one for single)
        idx_d = jnp.arange(cfg.depth_double) % llama.shape[0]
        idx_s = (cfg.depth_double + jnp.arange(cfg.depth_single)) % llama.shape[0]
        kd = self.param("cap_proj_double", nn.initializers.lecun_normal(),
                        (cfg.depth_double, cfg.llama_dim, cfg.hidden),
                        jnp.float32)
        ks = self.param("cap_proj_single", nn.initializers.lecun_normal(),
                        (cfg.depth_single, cfg.llama_dim, cfg.hidden),
                        jnp.float32)
        ll = llama.astype(cfg.dtype)
        lp_d = jnp.einsum("dbsl,dlh->dbsh", ll[idx_d], kd.astype(cfg.dtype))
        lp_s = jnp.einsum("dbsl,dlh->dbsh", ll[idx_s], ks.astype(cfg.dtype))

        # RoPE ids: [txt_t5 + llama; img] — text tokens at position 0
        n_txt = txt.shape[1] + n_ll
        txt_ids = jnp.zeros((b, n_txt, 3), jnp.int32)
        img_ids = image_ids(b, hh, ww, cfg.patch)
        pe = rope_freqs(jnp.concatenate([txt_ids, img_ids], axis=1),
                        cfg.axes_dim, cfg.theta)

        scan_d = nn.scan(
            _ScanHiDouble, variable_axes={"params": 0},
            split_rngs={"params": True}, length=cfg.depth_double,
            in_axes=(nn.broadcast, nn.broadcast, 0),
        )
        (img, txt), _ = scan_d(cfg, name="double")((img, txt), v, pe, lp_d)

        xcat = jnp.concatenate([txt, img], axis=1)
        # single-stream pe: carried txt + img + per-block llama (appended
        # at the END inside the block)
        pe_s = rope_freqs(
            jnp.concatenate([jnp.zeros((b, txt.shape[1], 3), jnp.int32),
                             image_ids(b, hh, ww, cfg.patch),
                             jnp.zeros((b, n_ll, 3), jnp.int32)], axis=1),
            cfg.axes_dim, cfg.theta)
        scan_s = nn.scan(
            _ScanHiSingle, variable_axes={"params": 0},
            split_rngs={"params": True}, length=cfg.depth_single,
            in_axes=(nn.broadcast, nn.broadcast, 0),
        )
        xcat, _ = scan_s(cfg, name="single")(xcat, v, pe_s, lp_s)
        img = xcat[:, txt.shape[1]:]

        mod = nn.Dense(2 * cfg.hidden, dtype=cfg.dtype,
                       name="final_mod")(nn.silu(v))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        out = nn.Dense(cfg.out_channels, dtype=jnp.float32, name="final_linear")(
            _modulate(_ln(img), shift, scale).astype(jnp.float32))
        return unpack_latent(out, hh, ww, cfg.patch)
