"""SD3 / SD3.5 MMDiT backbone (rectified-flow family).

Faithful re-implementation of the public SD3 MMDiT-X architecture (the
"SD 3.5" row of the reference's supported-model matrix, reference
README.md:131-139): conv patch embed + learned centered-crop positional
embedding (no RoPE), joint transformer blocks with separate x/context
streams sharing one attention, per-head ln_q/ln_k RMS QK-norm (the 3.5
addition), a pre-only context block in the last layer (contributes k/v but
produces no context output), and an AdaLN final layer.  SD3.5-Medium's
dual self-attention blocks (MMDiT-X `x_block_self_attn_layers`) are
supported via a second scanned segment.

TPU-first choices: tokens stay (B, S, hidden) for fused MXU matmuls,
bf16 compute / fp32 params, and depth is scanned (`nn.scan`) in up to three
uniform segments (dual-attn prefix, plain middle, pre-only last) so the HLO
stays one while-body per segment regardless of depth.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MLPEmbedder, RMSNorm, attention_bshd, timestep_embedding


@dataclasses.dataclass(frozen=True)
class SD3Config:
    in_channels: int = 16
    patch: int = 2
    hidden: int = 2432            # = 64 * depth
    depth: int = 38
    num_heads: int = 38
    mlp_ratio: float = 4.0
    context_dim: int = 4096       # T5-XXL (+ zero-padded CLIP) features
    vec_dim: int = 2048           # CLIP-L + CLIP-G pooled
    pos_embed_max: int = 192      # learned pos-embed grid side
    qk_norm: bool = True          # SD3.5 (3.0 medium ships without)
    dual_attn_layers: Tuple[int, ...] = ()  # SD3.5-Medium MMDiT-X prefix
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


SD35_LARGE_CONFIG = SD3Config()
# Large-Turbo is the same graph (distilled weights only).
SD35_LARGE_TURBO_CONFIG = SD35_LARGE_CONFIG
SD35_MEDIUM_CONFIG = SD3Config(
    hidden=1536, depth=24, num_heads=24, pos_embed_max=384,
    dual_attn_layers=tuple(range(13)),
)
SD3_MEDIUM_CONFIG = SD3Config(hidden=1536, depth=24, num_heads=24,
                              qk_norm=False)
TINY_SD3_CONFIG = SD3Config(
    in_channels=4, hidden=64, depth=4, num_heads=4, context_dim=32,
    vec_dim=16, pos_embed_max=16, dual_attn_layers=(0,),
)


def _modulate(x, shift, scale):
    return (1 + scale) * x + shift


def _layernorm(x, eps: float = 1e-6):
    """Affine-free LayerNorm in fp32 (the SD3 blocks' elementwise_affine=False
    norms; a plain function since there are no parameters)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


class _SelfAttnPre(nn.Module):
    """qkv projection + optional per-head RMS qk-norm -> (q, k, v) BSHD."""

    cfg: SD3Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.head_dim
        qkv = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        if cfg.qk_norm:
            q = RMSNorm(d, name="ln_q")(q)
            k = RMSNorm(d, name="ln_k")(k)
        return q, k, v


class DismantledBlock(nn.Module):
    """One stream of a joint block: AdaLN mod + attn pre/post + MLP.

    Used twice per joint block (context_block / x_block); the attention
    itself happens jointly outside (hence "dismantled").  `pre_only` is the
    final context block (k/v contribution only).  `dual_attn` adds the
    MMDiT-X second self-attention over the x stream.
    """

    cfg: SD3Config
    pre_only: bool = False
    dual_attn: bool = False

    def setup(self):
        cfg = self.cfg
        n = 2 if self.pre_only else (9 if self.dual_attn else 6)
        self.adaLN = nn.Dense(n * cfg.hidden, dtype=cfg.dtype,
                              name="adaLN_modulation")
        self.attn_pre = _SelfAttnPre(cfg, name="attn")
        if self.dual_attn:
            self.attn2_pre = _SelfAttnPre(cfg, name="attn2")
            self.attn2_proj = nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                       name="attn2_proj")
        if not self.pre_only:
            self.attn_proj = nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                      name="attn_proj")
            mlp_h = int(cfg.hidden * cfg.mlp_ratio)
            self.mlp_fc1 = nn.Dense(mlp_h, dtype=cfg.dtype, name="mlp_fc1")
            self.mlp_fc2 = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="mlp_fc2")

    def pre(self, x, c):
        """-> (qkv, state-for-post).  norms in fp32, matmuls in bf16."""
        cfg = self.cfg
        mod = self.adaLN(nn.silu(c))[:, None, :]
        parts = jnp.split(mod, mod.shape[-1] // cfg.hidden, axis=-1)
        xn = _layernorm(x)
        qkv = self.attn_pre(_modulate(xn, parts[0], parts[1]).astype(cfg.dtype))
        qkv2 = None
        if self.dual_attn:
            qkv2 = self.attn2_pre(
                _modulate(xn, parts[6], parts[7]).astype(cfg.dtype))
        return qkv, (parts, qkv2)

    def post(self, x, attn_out, state):
        cfg = self.cfg
        parts, qkv2 = state
        x = x + parts[2] * self.attn_proj(attn_out)
        if self.dual_attn:
            q2, k2, v2 = qkv2
            b, s = q2.shape[:2]
            a2 = attention_bshd(q2, k2, v2, impl=cfg.attention_impl)
            x = x + parts[8] * self.attn2_proj(a2.reshape(b, s, cfg.hidden))
        xn = _layernorm(x)
        h = self.mlp_fc1(_modulate(xn, parts[3], parts[4]).astype(cfg.dtype))
        return x + parts[5] * self.mlp_fc2(nn.gelu(h))


class JointBlock(nn.Module):
    """context/x dismantled pair with one joint attention over [ctx; x]."""

    cfg: SD3Config
    pre_only_ctx: bool = False
    dual_attn: bool = False

    @nn.compact
    def __call__(self, x, ctx, c):
        cfg = self.cfg
        cb = DismantledBlock(cfg, pre_only=self.pre_only_ctx,
                             name="context_block")
        xb = DismantledBlock(cfg, dual_attn=self.dual_attn, name="x_block")
        (cq, ck, cv), cstate = cb.pre(ctx, c)
        (xq, xk, xv), xstate = xb.pre(x, c)
        n_ctx = ctx.shape[1]
        q = jnp.concatenate([cq, xq], axis=1)
        k = jnp.concatenate([ck, xk], axis=1)
        v = jnp.concatenate([cv, xv], axis=1)
        attn = attention_bshd(q, k, v, impl=cfg.attention_impl)
        b, s = attn.shape[:2]
        attn = attn.reshape(b, s, cfg.hidden)
        ctx_a, x_a = attn[:, :n_ctx], attn[:, n_ctx:]
        x = xb.post(x, x_a, xstate)
        if not self.pre_only_ctx:
            ctx = cb.post(ctx, ctx_a, cstate)
        return x, ctx


class _ScanJoint(nn.Module):
    cfg: SD3Config
    dual_attn: bool = False

    @nn.compact
    def __call__(self, carry, cond):
        x, ctx = carry
        x, ctx = JointBlock(self.cfg, dual_attn=self.dual_attn,
                            name="block")(x, ctx, cond)
        return (x, ctx), None


class SD3FinalLayer(nn.Module):
    cfg: SD3Config

    @nn.compact
    def __call__(self, x, c):
        cfg = self.cfg
        mod = nn.Dense(2 * cfg.hidden, dtype=cfg.dtype,
                       name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        xn = _layernorm(x)
        return nn.Dense(cfg.patch * cfg.patch * cfg.in_channels,
                        dtype=jnp.float32, name="linear")(
            _modulate(xn, shift, scale).astype(jnp.float32))


class SD3MMDiT(nn.Module):
    """__call__(x_nchw_latent, t, context, vec) -> velocity prediction."""

    cfg: SD3Config

    @nn.compact
    def __call__(self, x, t, context, vec=None):
        cfg = self.cfg
        p = cfg.patch
        b, _, hh, ww = x.shape
        gh, gw = hh // p, ww // p

        # patch embed: NCHW latent -> NHWC conv -> (B, S, hidden)
        img = nn.Conv(cfg.hidden, (p, p), strides=(p, p), padding="VALID",
                      dtype=cfg.dtype, name="x_embedder")(
            jnp.transpose(x, (0, 2, 3, 1)).astype(cfg.dtype))
        img = img.reshape(b, gh * gw, cfg.hidden)

        # learned pos-embed, centered crop (public MMDiT cropped_pos_embed)
        m = cfg.pos_embed_max
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, m * m, cfg.hidden), jnp.float32)
        top, left = (m - gh) // 2, (m - gw) // 2
        pos = pos.reshape(1, m, m, cfg.hidden)[
            :, top:top + gh, left:left + gw].reshape(1, gh * gw, cfg.hidden)
        img = img + pos.astype(cfg.dtype)

        c = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="t_embedder")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        if cfg.vec_dim > 0 and vec is not None:
            c = c + MLPEmbedder(cfg.hidden, dtype=cfg.dtype,
                                name="y_embedder")(vec.astype(cfg.dtype))
        ctx = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="context_embedder")(
            context.astype(cfg.dtype))

        # depth = [dual-attn prefix][plain middle][pre-only-ctx last]
        n_dual = len(cfg.dual_attn_layers)
        assert cfg.dual_attn_layers == tuple(range(n_dual)), \
            "only a contiguous dual-attn prefix is supported (MMDiT-X layout)"
        n_plain = cfg.depth - 1 - n_dual
        if n_dual:
            scan = nn.scan(_ScanJoint, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=n_dual,
                           in_axes=nn.broadcast)
            (img, ctx), _ = scan(cfg, dual_attn=True,
                                 name="joint_dual")((img, ctx), c)
        if n_plain:
            scan = nn.scan(_ScanJoint, variable_axes={"params": 0},
                           split_rngs={"params": True}, length=n_plain,
                           in_axes=nn.broadcast)
            (img, ctx), _ = scan(cfg, name="joint")((img, ctx), c)
        img, _ = JointBlock(cfg, pre_only_ctx=True, name="joint_last")(
            img, ctx, c)

        out = SD3FinalLayer(cfg, name="final_layer")(img, c)
        # unpatchify: (B, S, p*p*C) -> (B, C, H, W)
        out = out.reshape(b, gh, gw, p, p, cfg.in_channels)
        out = jnp.transpose(out, (0, 5, 1, 3, 2, 4))
        return out.reshape(b, cfg.in_channels, hh, ww)
