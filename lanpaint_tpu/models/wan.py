"""Wan2.2 video DiT: 3D-patchified flow-matching transformer.

Covers the reference's video-inpainting workflows (reference README.md:
205-268 Wan2.2 t2v 14B fp8_scaled high+low-noise pair;
example_workflows/video_Inpaint.json).  Architecture per the public Wan2.x
design: Conv3D (1,2,2) patchify of the 16ch temporal latent, self-attention
with 3D RoPE over (frame, y, x), cross-attention to T5 text features, AdaLN
time modulation with per-block learned offsets.

TPU-first: tokens are (B, F*H*W, hidden); the token axis carries the "seq"
sharding annotation for 81-frame attention over the mesh
(lanpaint_tpu.parallel.seq_sharding).  The two-expert (high/low noise)
deployment is modeled by `SwitchingDenoiser` in models/base-level wrappers
(see models/zoo.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNormF32, MLPEmbedder, apply_rope, attention_bshd, layernorm_na, rope_freqs, timestep_embedding


@dataclasses.dataclass(frozen=True)
class WanConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden: int = 5120
    num_heads: int = 40
    depth: int = 40
    ffn_dim: int = 13824
    context_dim: int = 4096      # umt5-xxl features
    patch: Tuple[int, int, int] = (1, 2, 2)
    axes_dim: Tuple[int, ...] = (44, 42, 42)  # (frame, y, x) RoPE split
    eps: float = 1e-6
    attention_impl: str = "auto"   # see layers.attention_bshd
    # sequence parallelism: when set (e.g. "seq"), the model expects to run
    # inside shard_map with the frame axis sharded over this mesh axis;
    # self-attention becomes ring attention over ICI and RoPE frame ids are
    # offset by the device's ring position (parallel/ring.py)
    seq_axis: Optional[str] = None
    # tensor parallelism inside shard_map (Megatron-style): attention heads
    # and ffn hidden are split tp_size-ways over the tp_axis mesh axis;
    # row-parallel output projections psum over it (bias added post-psum).
    # Composes with seq_axis: the 14B expert pair spans chips this way.
    tp_axis: Optional[str] = None
    tp_size: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # dtype of the residual stream BETWEEN blocks.  None = float32 (the
    # modulation gates are fp32, so `x + g * branch` promotes).  bf16 keeps
    # the (B, S, hidden) stream half-width — at video scale the stream is
    # HBM-bound pointwise traffic through every block, and norm statistics
    # still run in fp32 inside each LayerNorm.
    residual_dtype: Optional[jnp.dtype] = None

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


# Production configs keep the residual stream bf16 — the reference runs the
# whole torch model in bf16 (ComfyUI model dtype), so fp32 residuals would
# *diverge* from reference behavior while costing HBM traffic (measured on
# v5e: 469.5 -> 454.2 ms per 5B forward at 5400 tokens).
WAN22_T2V_14B_CONFIG = WanConfig(residual_dtype=jnp.bfloat16)
# TI2V-5B pairs with the Wan2.2 VAE (4x16x16 compression, 48-ch latents),
# unlike the 14B pair which keeps the Wan2.1 16-ch VAE.
WAN22_TI2V_5B_CONFIG = WanConfig(in_channels=48, out_channels=48,
                                 hidden=3072, num_heads=24, depth=30,
                                 ffn_dim=14336, axes_dim=(44, 42, 42),
                                 residual_dtype=jnp.bfloat16)
TINY_WAN_CONFIG = WanConfig(in_channels=4, out_channels=4, hidden=64,
                            num_heads=4, depth=2, ffn_dim=128, context_dim=32,
                            axes_dim=(8, 4, 4))


class _RowDense(nn.Module):
    """Row-parallel Dense: input dim is tp-sharded; partial products psum
    over tp_axis, bias added once after the reduce.  Param tree identical to
    nn.Dense (kernel + bias) so checkpoint mapping is unchanged."""

    features: int
    tp_axis: Optional[str]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = x @ kernel.astype(self.dtype)
        if self.tp_axis is not None:
            y = jax.lax.psum(y, self.tp_axis)
        return y + bias.astype(self.dtype)


class _WanQKNorm(nn.Module):
    """RMSNorm over the FULL projection width — public Wan semantics:
    norm_q/norm_k = RMSNorm(dim) applied BEFORE the head reshape, checkpoint
    weight shape (dim,) (`blocks.{i}.self_attn.norm_q.weight`).  Under manual
    TP each shard holds dim/tp features: the mean-of-squares is psum-reduced
    so statistics match the unsharded model, and the scale param is the
    local shard (wan_tp_param_specs shards it on its last axis)."""

    dim: int                      # full (unsharded) width
    tp_axis: Optional[str]
    tp_size: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        xf = x.astype(jnp.float32)
        ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
        if self.tp_axis is not None:
            ss = jax.lax.psum(ss, self.tp_axis)
        n = xf * jax.lax.rsqrt(ss / self.dim + self.eps)
        scale = self.param("scale", nn.initializers.ones,
                           (self.dim // self.tp_size,), jnp.float32)
        return (n * scale).astype(dt)


class WanSelfAttention(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, pe):
        cfg = self.cfg
        h, d = cfg.num_heads // cfg.tp_size, cfg.head_dim
        inner = cfg.hidden // cfg.tp_size
        b, s, _ = x.shape
        qk_norm = lambda name: _WanQKNorm(cfg.hidden, cfg.tp_axis, cfg.tp_size,
                                          cfg.eps, name=name)
        q = nn.Dense(inner, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(inner, dtype=cfg.dtype, name="k")(x)
        v = nn.Dense(inner, dtype=cfg.dtype, name="v")(x).reshape(b, s, h, d)
        q = qk_norm("norm_q")(q).reshape(b, s, h, d)
        k = qk_norm("norm_k")(k).reshape(b, s, h, d)
        q = apply_rope(q, pe)
        k = apply_rope(k, pe)
        if cfg.seq_axis is not None:
            from ..parallel.ring import ring_attention

            out = ring_attention(q, k, v, cfg.seq_axis)
        else:
            out = attention_bshd(q, k, v, impl=cfg.attention_impl)
        out = out.reshape(b, s, inner)
        return _RowDense(cfg.hidden, cfg.tp_axis, cfg.dtype, name="o")(out)


class WanCrossAttention(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, context, kv_pre=None):
        """`kv_pre`: optional (k, v) pair, each (B, T_text, inner) — the
        run-constant hoist (WanModel.precompute_kv): the text context never
        changes within a sampling run, so k/v projection + norm_k run once
        per launch instead of once per block per forward.  Values are
        computed by the SAME submodules, so they are bit-identical."""
        cfg = self.cfg
        h, d = cfg.num_heads // cfg.tp_size, cfg.head_dim
        inner = cfg.hidden // cfg.tp_size
        b, s, _ = x.shape
        qk_norm = lambda name: _WanQKNorm(cfg.hidden, cfg.tp_axis, cfg.tp_size,
                                          cfg.eps, name=name)
        q = nn.Dense(inner, dtype=cfg.dtype, name="q")(x)
        q = qk_norm("norm_q")(q).reshape(b, s, h, d)
        if kv_pre is not None:
            k_flat, v_flat = kv_pre
            sk = k_flat.shape[1]
            k = k_flat.astype(cfg.dtype).reshape(b, sk, h, d)
            v = v_flat.astype(cfg.dtype).reshape(b, sk, h, d)
        else:
            sk = context.shape[1]
            k = nn.Dense(inner, dtype=cfg.dtype, name="k")(context)
            v = nn.Dense(inner, dtype=cfg.dtype,
                         name="v")(context).reshape(b, sk, h, d)
            k = qk_norm("norm_k")(k).reshape(b, sk, h, d)
        out = attention_bshd(q, k, v, impl=cfg.attention_impl)
        out = out.reshape(b, s, inner)
        return _RowDense(cfg.hidden, cfg.tp_axis, cfg.dtype, name="o")(out)


class _WanCrossKVOnly(nn.Module):
    """The context-only slice of WanCrossAttention (k/v projection +
    norm_k), used by WanModel.precompute_kv.  Submodule names match
    WanCrossAttention exactly so the SAME stacked checkpoint params are
    read — extra (unused) params like q/o are simply not looked up."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, context):
        cfg = self.cfg
        inner = cfg.hidden // cfg.tp_size
        k = nn.Dense(inner, dtype=cfg.dtype, name="k")(context)
        v = nn.Dense(inner, dtype=cfg.dtype, name="v")(context)
        k = _WanQKNorm(cfg.hidden, cfg.tp_axis, cfg.tp_size, cfg.eps,
                       name="norm_k")(k)
        return k, v


class WanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, x, e, context, pe, kv_pre=None):
        """e: (B, 6, hidden) time modulation; per-block learned offset added."""
        cfg = self.cfg
        mod_table = self.param("modulation", nn.initializers.normal(0.02),
                               (1, 6, cfg.hidden), jnp.float32)
        rdt = jnp.float32 if cfg.residual_dtype is None else cfg.residual_dtype
        e = (mod_table + e.astype(jnp.float32)).astype(rdt)
        sh1, sc1, g1, sh2, sc2, g2 = [e[:, i][:, None] for i in range(6)]

        ln = lambda name: (lambda t: layernorm_na(t, cfg.eps))  # paramless
        xn = ln("norm1")(x) * (1 + sc1) + sh1
        x = x + g1 * WanSelfAttention(cfg, name="self_attn")(xn.astype(cfg.dtype), pe)
        # cross-attn has its own (affine) norm, no modulation
        xn = LayerNormF32(eps=cfg.eps, name="norm3")(x)
        x = x + WanCrossAttention(cfg, name="cross_attn")(
            xn.astype(cfg.dtype), context, kv_pre=kv_pre)
        xn = ln("norm2")(x) * (1 + sc2) + sh2
        ff = nn.gelu(nn.Dense(cfg.ffn_dim // cfg.tp_size, dtype=cfg.dtype,
                              name="ffn_0")(xn.astype(cfg.dtype)), approximate=True)
        ff = _RowDense(cfg.hidden, cfg.tp_axis, cfg.dtype, name="ffn_2")(ff)
        return x + g2 * ff


class _ScanWanBlock(nn.Module):
    cfg: WanConfig

    @nn.compact
    def __call__(self, tokens, cond, kv_pre=None):
        e6, context, pe = cond
        out = WanBlock(self.cfg, name="block")(tokens, e6, context, pe,
                                               kv_pre=kv_pre)
        # keep the scan carry dtype stable (modulation math runs fp32)
        return out.astype(tokens.dtype), None


class _ScanWanKV(nn.Module):
    """Depth scan collecting every block's cross-attention (k, v) from the
    run-constant text context (WanModel.precompute_kv)."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, carry, context):
        class _Block(nn.Module):
            cfg: WanConfig

            @nn.compact
            def __call__(self, context):
                return _WanCrossKVOnly(self.cfg, name="cross_attn")(context)

        k, v = _Block(self.cfg, name="block")(context)
        return carry, (k, v)


def video_ids(b, f, h, w, frame_offset=0) -> jnp.ndarray:
    """(B, F*H*W, 3) position ids over (frame, y, x) token grid.

    frame_offset shifts the frame coordinate — under sequence parallelism
    each device holds a contiguous local frame block and offsets by
    axis_index * local_frames so RoPE sees global positions."""
    fs = jnp.repeat(jnp.arange(f) + frame_offset, h * w)
    ys = jnp.tile(jnp.repeat(jnp.arange(h), w), f)
    xs = jnp.tile(jnp.arange(w), f * h)
    ids = jnp.stack([fs, ys, xs], axis=-1)
    return jnp.tile(ids[None], (b, 1, 1))


class WanModel(nn.Module):
    """__call__(x_ncfhw, t, context) -> velocity prediction (B,C,F,H,W)."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, x, t, context, kv_cache=None):
        """`kv_cache`: optional {"k", "v"} of shape (B, depth, T_text, inner)
        from precompute_kv — the per-block cross-attention projections of the
        run-constant text context, hoisted out of the sampling loops by the
        sampler (Denoiser.precompute).  Bit-identical to the in-forward
        path."""
        cfg = self.cfg
        b, c, f, hh, ww = x.shape
        pf, ph, pw = cfg.patch
        gf, gh, gw = f // pf, hh // ph, ww // pw

        # 3D patchify: implemented as reshape+transpose+Dense (equivalent to
        # the stride-(1,2,2) Conv3D but lowers to one big MXU matmul).
        xt = x.reshape(b, c, gf, pf, gh, ph, gw, pw)
        xt = jnp.transpose(xt, (0, 2, 4, 6, 1, 3, 5, 7))
        tokens = xt.reshape(b, gf * gh * gw, c * pf * ph * pw).astype(cfg.dtype)
        tokens = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="patch_embedding")(tokens)

        context = nn.gelu(nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                   name="text_embedding_0")(context.astype(cfg.dtype)),
                          approximate=True)
        context = nn.Dense(cfg.hidden, dtype=cfg.dtype,
                           name="text_embedding_2")(context)

        te = MLPEmbedder(cfg.hidden, dtype=cfg.dtype, name="time_embedding")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        e6 = nn.Dense(6 * cfg.hidden, dtype=cfg.dtype,
                      name="time_projection")(nn.silu(te))
        e6 = e6.reshape(b, 6, cfg.hidden)

        offset = 0
        if cfg.seq_axis is not None:
            offset = jax.lax.axis_index(cfg.seq_axis) * gf
        pe = rope_freqs(video_ids(b, gf, gh, gw, frame_offset=offset),
                        cfg.axes_dim)

        # scan over depth: 40 identical blocks -> one XLA while-body.
        if kv_cache is not None:
            kv_scan = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1),
                                   (kv_cache["k"], kv_cache["v"]))
            scan = nn.scan(
                _ScanWanBlock, variable_axes={"params": 0},
                split_rngs={"params": True}, length=cfg.depth,
                in_axes=(nn.broadcast, 0),
            )
            tokens, _ = scan(cfg, name="blocks")(tokens, (e6, context, pe),
                                                 kv_scan)
        else:
            scan = nn.scan(
                _ScanWanBlock, variable_axes={"params": 0},
                split_rngs={"params": True}, length=cfg.depth,
                in_axes=nn.broadcast,
            )
            tokens, _ = scan(cfg, name="blocks")(tokens, (e6, context, pe))

        # head: modulated norm + linear to patch voxels
        head_mod = self.param("head_modulation", nn.initializers.normal(0.02),
                              (1, 2, cfg.hidden), jnp.float32)
        he = head_mod + te.astype(jnp.float32)[:, None]
        sh, sc = he[:, 0][:, None], he[:, 1][:, None]
        tn = layernorm_na(tokens, cfg.eps)
        tn = tn * (1 + sc) + sh
        out = nn.Dense(cfg.out_channels * pf * ph * pw, dtype=jnp.float32,
                       name="head")(tn.astype(jnp.float32))

        out = out.reshape(b, gf, gh, gw, cfg.out_channels, pf, ph, pw)
        out = jnp.transpose(out, (0, 4, 1, 5, 2, 6, 3, 7))
        return out.reshape(b, cfg.out_channels, f, hh, ww)


class WanKVPrecompute(nn.Module):
    """Run-constant cross-attention hoist: text embedding + every block's
    cross-attn k/v projection (+ norm_k), computed ONCE per sampling launch
    (zoo.wan_precompute_kv -> Denoiser.precompute) instead of once per block
    per forward.

    A sibling module of WanModel (flax allows one @nn.compact method per
    class) whose param paths match WanModel's root exactly
    (text_embedding_0/2, blocks/block/cross_attn/{k,v,norm_k}) — apply it
    with WanModel's params and the SAME weights are read, so values are
    bit-identical to the in-forward path.

    Returns {"k", "v"}: (B, depth, T_text, inner), batch-major so
    guidance.py's batched-CFG cond concat composes."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, context):
        cfg = self.cfg
        context = nn.gelu(nn.Dense(cfg.hidden, dtype=cfg.dtype,
                                   name="text_embedding_0")(
            context.astype(cfg.dtype)), approximate=True)
        context = nn.Dense(cfg.hidden, dtype=cfg.dtype,
                           name="text_embedding_2")(context)
        scan = nn.scan(
            _ScanWanKV, variable_axes={"params": 0},
            split_rngs={"params": True}, length=cfg.depth,
            in_axes=nn.broadcast,
        )
        _, (k, v) = scan(cfg, name="blocks")(0, context)
        return {"k": jnp.moveaxis(k, 0, 1), "v": jnp.moveaxis(v, 0, 1)}
