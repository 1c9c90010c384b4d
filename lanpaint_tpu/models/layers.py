"""Shared neural building blocks for the diffusion backbones.

flax.linen modules in NHWC layout (TPU-native convolution layout) with
configurable compute dtype (bfloat16 by default on TPU, fp32 params).
Attention goes through `jax.nn.dot_product_attention`, which XLA lowers to
fused flash-style kernels on TPU; long-sequence video attention can swap in
the Pallas splash kernel via `attention_impl`.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import fused_layernorm, fused_rmsnorm


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (DDPM convention: cos/sin halves)."""
    t = jnp.asarray(t, jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


# Flash kernel block size.  Measured on v5e (Wan2.2-5B, S=5400, D=128,
# H=24, B=1): the kernel's default 512 blocks leave ~4x kernel time on the
# table (0.73 s -> 0.19 s of self-attention per 30-block forward at 1024);
# 2816 exceeds the 16 MB scoped-vmem budget.  1024 is the sweet spot across
# every q/k combination swept (512/1024/1408/2048 grid).  Re-confirmed for
# the SDXL-1024 shapes with profiler-derived device times (2026-08-18,
# 9-point q/k grid): S=4096 H=10 D=64 -> 0.630 ms (69 TF/s) and S=1024
# H=20 D=64 -> 0.074 ms (72 TF/s) at 1024/1024; every other block combo
# is equal or worse (q1024/k128 is 2.2x worse).  ~35% MFU is the kernel's
# ceiling at D=64 head width.
FLASH_BLOCK = 1024

# Unroll factor for the scan-over-depth in SpatialTransformer.  Measured
# on v5e (2026-08-18): the scanned while-loop costs ~11% of each depth-10
# transformer's device time in stacked-param dynamic-slices + loop-carry
# copies.  FULL unroll (factor = depth) did not finish COMPILING in 15 min
# (vs 112 s scanned) through the TPU relay — compile survival wins, so the
# only viable settings are small factors.  1 = plain scan (default);
# LANPAINT_DEPTH_UNROLL overrides for measurement.  Measured end-to-end
# on the 20x5think headline (2026-08-18, fused-QKV layout): unroll=2 =
# 13.42 s vs unroll=1 = 12.20 s — a clear REGRESSION (the doubled body
# grows the program without removing the per-iteration slices), so 1
# stays the default and the lever is considered exhausted.
import os as _os

DEPTH_SCAN_UNROLL = int(_os.environ.get("LANPAINT_DEPTH_UNROLL", "1"))

# Fused single-pass Pallas row-norms (ops/norms.py).  Default ON; set
# LANPAINT_FUSED_NORM=0 to A/B against the stock nn.LayerNorm lowering
# (separate XLA reduce fusions with fp32 intermediates in HBM).
FUSED_NORM = _os.environ.get("LANPAINT_FUSED_NORM", "1") != "0"

# Splash-attention kernel for long non-causal self-attention.  Measured on
# v5e (2026-08-19, S=4096 H=10 D=64 bf16, 50-call scan harness): legacy
# flash 1358 us/call vs splash bq=1024/bkv=2048 1109 us/call — ~18% raw,
# ~35% net of the harness's fixed ~660 us overhead (calibrated from the
# S=1024 row where in-program flash is known to be 74 us).  S=1024 was
# inside harness noise in r3; re-measured r5 with the tuned tiles: legacy
# flash clearly wins there (582 vs 866 us/call, H=20 D=64), so the legacy
# kernel keeps every shape below SPLASH_MIN_S.
# LANPAINT_SPLASH=0 reverts to the legacy flash kernel everywhere.
USE_SPLASH = _os.environ.get("LANPAINT_SPLASH", "1") != "0"
SPLASH_MIN_S = 2048
# q tile: None = auto by head dim — the r5 sweeps measured bq=1024 best
# at D=64 (S=4096: 1022 us vs 1037 at bq=512) but bq=512 best at D=128
# (Wan S=5400: 4049 us vs 4137 at bq=1024)
SPLASH_BLOCK_Q = None
SPLASH_BLOCK_KV = 2048
# inner compute tile along kv (<= SPLASH_BLOCK_KV).  None = auto by head
# dim: the r5 sweep (scripts/sweep_splash.py, v5e 2026-08-20) measured
# 1024 best at D=64 (S=4096 H=10: 1022 us vs 1057 at 512, legacy flash
# 1101) but 512 best at D=128 (Wan S=5400 H=24: 4231 us vs 4385 at 1024);
# larger bq/bkv tiles (2048/2048, */4096) VMEM-OOM at compile.
SPLASH_BLOCK_KV_COMPUTE = None


def _flash_block_sizes(s_padded: int, block: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    b = min(block, s_padded)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


@functools.lru_cache(maxsize=32)
def _splash_kernel(s: int, h: int, block_q: int = None, block_kv: int = None,
                   block_kv_compute: int = None):
    """Cached splash-attention kernel for a full (non-causal) S x S mask.

    Block sizes default to the module-level SPLASH_BLOCK_* tuning; the
    explicit arguments exist so sweeps (scripts/sweep_splash.py) can key
    the cache on a trial configuration instead of mutating globals under
    an already-cached kernel.

    Built under `jax.ensure_compile_time_eval()`: make_splash_mha
    materializes its mask-info arrays with jnp.array at construction, and
    the first construction typically happens INSIDE a trace (the engine's
    `lax.while_loop` body).  Without the eval guard those arrays become
    trace-local constants, and reusing the cached kernel under a different
    trace leaks them (UnexpectedTracerError — the BENCH_r03 crash).  With
    it they are concrete device arrays, so the cache is trace-safe.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.FullMask((s, s))] * h)
    bq = min(block_q or SPLASH_BLOCK_Q or 1024, s)
    bkv = min(block_kv or SPLASH_BLOCK_KV, s)
    bkvc = min(block_kv_compute or SPLASH_BLOCK_KV_COMPUTE or 512, bkv)
    with jax.ensure_compile_time_eval():
        return sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1,
            block_sizes=sk.BlockSizes(block_q=bq, block_kv=bkv,
                                      block_kv_compute=bkvc))


def _splash_attention(q, k, v, scale: float):
    """(B, S, H, D) non-causal self-attention via the splash kernel.

    Unaligned S is zero-padded up to the kv block size with SegmentIds
    masking (padding isolated in segment 1 — it attends only to itself, so
    softmax stays valid; the garbage rows are sliced off).  This is what
    admits the Wan video shape S=5400 (padded to 6144)."""
    b, s, h, d = q.shape
    pad = (-s) % SPLASH_BLOCK_KV
    seg = None
    if pad:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
        )

        padw = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, padw) for t in (q, k, v))
        ids = (jnp.arange(s + pad) >= s).astype(jnp.int32)
        seg = sk.SegmentIds(q=ids, kv=ids)
    # pass the current tuning explicitly so the lru cache keys on it
    # (a sweep that changes the module globals must not hit a stale kernel);
    # None -> head-dim-dependent auto rules (see SPLASH_BLOCK_Q /
    # SPLASH_BLOCK_KV_COMPUTE comments: D=64 wants wider q tiles and a
    # bigger compute tile than D=128)
    bq = SPLASH_BLOCK_Q or (1024 if d == 64 else 512)
    bkvc = SPLASH_BLOCK_KV_COMPUTE or (1024 if d == 64 else 512)
    kern = _splash_kernel(s + pad, h, bq, SPLASH_BLOCK_KV, bkvc)

    def one(qi, ki, vi):
        o = kern(jnp.transpose(qi * scale, (1, 0, 2)),
                 jnp.transpose(ki, (1, 0, 2)),
                 jnp.transpose(vi, (1, 0, 2)),
                 segment_ids=seg)
        return jnp.transpose(o, (1, 0, 2))

    out = one(q[0], k[0], v[0])[None] if b == 1 else jax.vmap(one)(q, k, v)
    return out[:, :s] if pad else out


def attention_bshd(q, k, v, impl: str = "auto", sm_scale=None):
    """Multi-head attention on (B, S, H, D) tensors.

    impl: "xla" (jax.nn.dot_product_attention; NOTE: materializes the full
    fp32 S_q x S_kv score matrix — 8.8 GB at Wan video scale, measured OOM),
    "flash" (the Pallas TPU flash-attention kernel — O(S) memory, the
    long-video path, SURVEY.md section 5 long-context), or "auto" (flash on
    TPU for self-attention with S >= 1024 and D % 64 == 0; measured on v5e:
    flash wins from S=1024 up even at D=64 — 1.86 vs 4.33 ms at S=4096
    H=10, 0.81 vs 1.18 ms at S=1024 H=20, the SDXL-1024 shapes).
    Unaligned sequence lengths are zero-padded to the flash block size with
    segment-id masking, so any S works.

    Explicit "flash"/"splash" require SELF-attention (s == sk) and a TPU
    backend — both kernels are built around a square S x S layout (the
    legacy path pads q and kv with ONE shared segment-id vector; splash
    builds a FullMask((s, s))), so a cross-attention call would silently
    attend to garbage.  "splash" on a short/misaligned S falls back to the
    legacy flash kernel (the splash block layout needs S % block == 0);
    the kernel actually used is a perf detail, the math is identical.
    """
    b, s, h, d = q.shape
    sk = k.shape[1]
    if impl in ("flash", "splash"):
        if s != sk:
            raise ValueError(
                f"impl={impl!r} supports only self-attention (s == sk); got "
                f"s={s}, sk={sk}. Use impl='xla'/'auto' for cross-attention.")
        if jax.default_backend() != "tpu":
            raise ValueError(
                f"impl={impl!r} is a Pallas TPU kernel; current backend is "
                f"{jax.default_backend()!r}. Use impl='xla' or 'auto'.")
    use_flash = impl in ("flash", "splash") or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and s == sk and s >= 1024 and d % 64 == 0
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        scale = (1.0 / math.sqrt(d)) if sm_scale is None else sm_scale
        # "auto"/"splash" prefer the splash kernel on long sequences
        # (measured faster at S=4096; see USE_SPLASH note); unaligned S is
        # padded with segment-id masking inside _splash_attention.
        # Explicit impl="flash" always means the legacy kernel.
        if (impl != "flash" and USE_SPLASH and s >= SPLASH_MIN_S
                and d % 64 == 0):
            return _splash_attention(q, k, v, scale)
        pad = (-s) % FLASH_BLOCK
        seg = None
        if pad:
            padw = ((0, 0), (0, pad), (0, 0), (0, 0))
            q, k, v = (jnp.pad(t, padw) for t in (q, k, v))
            ids = (jnp.arange(s + pad) >= s).astype(jnp.int32)[None]
            ids = jnp.broadcast_to(ids, (b, s + pad))
            seg = SegmentIds(q=ids, kv=ids)  # padding isolated in segment 1
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        o = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                            sm_scale=scale,
                            block_sizes=_flash_block_sizes(s + pad, FLASH_BLOCK))
        o = jnp.transpose(o, (0, 2, 1, 3))
        return o[:, :s] if pad else o
    return jax.nn.dot_product_attention(q, k, v)


def attention(q, k, v, *, num_heads: int, mask=None):
    """Multi-head attention on (B, S, H*D) tensors; returns (B, S, H*D).

    Unmasked calls route through attention_bshd, so long self-attention
    (the UNet's 64x64 spatial streams at SDXL-1024) takes the flash kernel
    — measured 2.3x faster than the XLA path at S=4096 D=64 on v5e.
    Masked calls use jax.nn.dot_product_attention (fused on TPU; fp32
    accumulation is implicit on the MXU).
    """
    b, sq, _ = q.shape
    sk = k.shape[1]
    q = q.reshape(b, sq, num_heads, -1)
    k = k.reshape(b, sk, num_heads, -1)
    v = v.reshape(b, sk, num_heads, -1)
    if mask is None:
        return attention_bshd(q, k, v).reshape(b, sq, -1)
    out = jax.nn.dot_product_attention(q, k, v, mask=mask)
    return out.reshape(b, sq, -1)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 regardless of compute dtype."""

    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        x = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return x.astype(dt)


def layernorm_na(x, eps: float = 1e-6):
    """No-affine LayerNorm with fp32 statistics (the adaLN pre-norm used by
    every DiT block).  Fused Pallas single pass on TPU; returns FP32 — every
    consumer modulates (`(1+scale)*x + shift`) before downcasting, and that
    modulation must run at full precision (downcasting the norm output first
    costs ~2.6e-3 rel error on the Wan TP equality tests; VERDICT r3)."""
    if FUSED_NORM:
        return fused_layernorm(x, eps=eps, out_dtype=jnp.float32)
    return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=eps,
                        dtype=jnp.float32)(x)


class LayerNormF32(nn.Module):
    """Drop-in nn.LayerNorm (fp32 statistics, learned scale+bias) backed by
    the fused Pallas row-norm on TPU (ops/norms.py).  Param names/init match
    nn.LayerNorm exactly so checkpoint keys are unchanged.  Output is in the
    INPUT dtype (nn.LayerNorm(dtype=f32) returns fp32 that every consumer
    here immediately downcasts — same bits, minus the fp32 HBM round trip)."""

    eps: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = (self.param("scale", nn.initializers.ones, (c,), jnp.float32)
                 if self.use_scale else None)
        beta = (self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
                if self.use_bias else None)
        if not FUSED_NORM:
            dt = x.dtype
            out = nn.LayerNorm(epsilon=self.eps, use_scale=False,
                               use_bias=False,
                               dtype=jnp.float32)(x.astype(jnp.float32))
            if gamma is not None:
                out = out * gamma
            if beta is not None:
                out = out + beta
            return out.astype(dt)
        return fused_layernorm(x, gamma, beta, self.eps)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    learned: bool = True

    @nn.compact
    def __call__(self, x):
        scale = (self.param("scale", nn.initializers.ones, (self.dim,),
                            jnp.float32) if self.learned else None)
        if not FUSED_NORM:
            dt = x.dtype
            xf = x.astype(jnp.float32)
            n = xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
            if scale is not None:
                n = n * scale
            return n.astype(dt)
        return fused_rmsnorm(x, scale, self.eps)


class QKNorm(nn.Module):
    """Per-head RMS normalization of q and k (Flux/SD3-style)."""

    head_dim: int

    @nn.compact
    def __call__(self, q, k):
        q = RMSNorm(self.head_dim, name="query_norm")(q)
        k = RMSNorm(self.head_dim, name="key_norm")(k)
        return q, k


class CrossAttention(nn.Module):
    """Self- or cross-attention used by the UNet spatial transformer.

    `fused` (the import-time QKV-fusion perf lever, docs/architecture.md):
    self-attention projects q/k/v as ONE GEMM (`to_qkv`); cross-attention
    keeps `to_q` and consumes a precomputed fused k/v tensor (`kv` argument,
    hoisted out of the depth scan by SpatialTransformer).  Public checkpoint
    keys stay split — load.fuse_unet_qkv concatenates them on import.
    """

    query_dim: int
    context_dim: Optional[int] = None
    num_heads: int = 8
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, context=None, kv=None):
        inner = self.num_heads * self.head_dim
        if self.fused and self.context_dim is None:
            qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                           name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif self.fused:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            if kv is None:
                kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                              name="to_kv")(x if context is None else context)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            context = x if context is None else context
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        out = attention(q, k, v, num_heads=self.num_heads)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(g)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """LDM transformer block: self-attn -> cross-attn -> GEGLU FF."""

    dim: int
    context_dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, context, kv=None):
        h = LayerNormF32(name="norm1")(x)
        x = x + CrossAttention(self.dim, None, self.num_heads, self.head_dim,
                               dtype=self.dtype, fused=self.fused,
                               name="attn1")(h)
        h = LayerNormF32(name="norm2")(x)
        x = x + CrossAttention(self.dim, self.context_dim, self.num_heads,
                               self.head_dim, dtype=self.dtype,
                               fused=self.fused, name="attn2")(h, context, kv=kv)
        h = LayerNormF32(name="norm3")(x)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class _ScanBTB(nn.Module):
    """scan-over-depth body for BasicTransformerBlock (compile-time lever:
    N identical blocks become ONE XLA while-body with stacked params)."""

    dim: int
    context_dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype
    fused: bool = False

    @nn.compact
    def __call__(self, x, context, kv=None):
        x = BasicTransformerBlock(self.dim, self.context_dim, self.num_heads,
                                  self.head_dim, dtype=self.dtype,
                                  fused=self.fused, name="block")(x, context,
                                                                  kv=kv)
        return x, None


class SpatialTransformer(nn.Module):
    """GN -> linear proj -> depth x transformer block (scanned) -> proj.

    `fused` additionally hoists the cross-attention k/v projection out of
    the depth scan: the per-depth fused kernels live as ONE stacked
    parameter (`kv_cross`, (depth, context_dim, 2*channels)) contracted
    against the (constant-within-a-forward) text context in a single
    batched einsum — ten M=77 GEMMs per depth-10 transformer become one
    M=770 GEMM, and the scan body stops dynamic-slicing its largest
    per-block weight (measured lever, docs/architecture.md).
    """

    channels: int
    context_dim: int
    num_heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, context, kv_pre=None):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm32(name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        head_dim = c // self.num_heads
        scan = nn.scan(
            _ScanBTB,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            in_axes=(nn.broadcast, 0) if self.fused else nn.broadcast,
            unroll=min(DEPTH_SCAN_UNROLL, self.depth),
        )
        blocks = scan(c, self.context_dim, self.num_heads, head_dim,
                      self.dtype, self.fused, name="blocks")
        if self.fused:
            # The kv_cross param must exist whether or not the caller hands
            # in a precomputed projection (checkpoint keys are layout, not
            # control flow).
            kv_kernel = self.param(
                "kv_cross", nn.initializers.lecun_normal(),
                (self.depth, self.context_dim, 2 * c), jnp.float32)
            if kv_pre is not None:
                # Run-constant hoist (zoo.unet_precompute_kv): the text
                # context never changes within a sampling run, so the
                # sampler computes this einsum ONCE per launch instead of
                # once per forward (230x on the 20x5think headline).
                # kv_pre arrives batch-major (B, depth, T, 2c) — the layout
                # guidance.py's cond-tree concat needs — and is transposed
                # to the scan's depth-major layout here (a few MB).
                kv_all = jnp.moveaxis(kv_pre, 0, 1).astype(self.dtype)
            else:
                kv_all = jnp.einsum("btc,dcf->dbtf",
                                    context.astype(self.dtype),
                                    kv_kernel.astype(self.dtype))
            x, _ = blocks(x, context, kv_all)
        else:
            x, _ = blocks(x, context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding injection."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        c_in = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip_conv")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class MLPEmbedder(nn.Module):
    """two-layer SiLU MLP used for time/vector embeddings in DiTs."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="in_layer")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_layer")(x)


# --------------------------------------------------------------------------
# Rotary position embeddings (DiT family)


def rope_freqs(ids: jnp.ndarray, axes_dim, theta: float = 10000.0) -> jnp.ndarray:
    """Multi-axis RoPE rotation table.

    ids: (B, S, n_axes) integer position ids; axes_dim[i] dims are allotted to
    axis i (sum = head_dim).  Returns (B, S, head_dim//2, 2, 2) rotation
    matrices (Flux convention).
    """
    parts = []
    for i, d in enumerate(axes_dim):
        half = d // 2
        scale = jnp.arange(0, d, 2, dtype=jnp.float32) / d
        omega = 1.0 / (theta**scale)
        out = ids[..., i].astype(jnp.float32)[..., None] * omega  # (B, S, half)
        cos, sin = jnp.cos(out), jnp.sin(out)
        mat = jnp.stack([cos, -sin, sin, cos], axis=-1).reshape(*out.shape, 2, 2)
        parts.append(mat)
    return jnp.concatenate(parts, axis=-3)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation table to (B, S, H, D) q/k tensors."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 1, 2)
    fr = freqs[:, :, None]  # (B, S, 1, D//2, 2, 2)
    out = fr[..., 0] * xf[..., 0] + fr[..., 1] * xf[..., 1]
    return out.reshape(b, s, h, d).astype(x.dtype)
