"""TPU-native text encoders: CLIP, T5/UMT5, Llama/Qwen2.

The reference receives ready conditioning tensors from its ComfyUI host's
CLIP/T5 loader nodes (reference src/LanPaint/nodes.py:327 takes `positive`/
`negative` CONDITIONING inputs); a standalone framework must produce them
itself.  These are flax implementations of the three encoder families every
supported backbone draws from (SURVEY.md section 2 model matrix):

- CLIP text (L and bigG): SD1.x/2.x, SDXL, SD3.5, Flux pooled vector.
- T5 encoder (T5-XXL) and UMT5 (per-layer relative bias): SD3.5, Flux,
  HiDream, Wan2.2.
- Llama-architecture causal LM hidden states (Llama-3.1-8B for HiDream,
  Qwen2.5 text stack for Qwen-Image, Qwen3 0.6B/4B/8B for the
  Anima/Flux.2-Klein/Krea2/Ideogram4 families): RoPE + RMSNorm + SwiGLU +
  GQA, optional QKV bias (Qwen2), optional per-head qk-norm + decoupled
  head_dim (Qwen3).

All encoders run under jit on device (bf16 compute, fp32 norms/logits where
it matters) and load HF-layout safetensors via `load.import_clip/import_t5/
import_llama`.  Layer loops are `nn.scan` over stacked per-layer params so an
N-layer encoder compiles as one XLA while-body.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# CLIP text model


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    intermediate: int = 3072
    act: str = "quick_gelu"      # CLIP-L; bigG uses "gelu"
    projection_dim: int = 0      # 0 = no text_projection head
    eos_token_id: int = 49407
    ln_eps: float = 1e-5         # HF CLIP layer_norm_eps
    dtype: jnp.dtype = jnp.float32


CLIP_L_CONFIG = CLIPTextConfig()
CLIP_G_CONFIG = CLIPTextConfig(width=1280, layers=32, heads=20,
                               intermediate=5120, act="gelu",
                               projection_dim=1280)
# SD 2.x text encoder (OpenCLIP ViT-H text tower)
CLIP_H_CONFIG = CLIPTextConfig(width=1024, layers=24, heads=16,
                               intermediate=4096, act="gelu",
                               projection_dim=1024)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class _CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        dt = c.dtype
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="ln1")(x)
        q = nn.Dense(c.width, dtype=dt, name="q")(h)
        k = nn.Dense(c.width, dtype=dt, name="k")(h)
        v = nn.Dense(c.width, dtype=dt, name="v")(h)
        b, s, _ = q.shape
        hd = c.width // c.heads
        att = jax.nn.dot_product_attention(
            q.reshape(b, s, c.heads, hd), k.reshape(b, s, c.heads, hd),
            v.reshape(b, s, c.heads, hd), mask=mask)
        x = x + nn.Dense(c.width, dtype=dt, name="out")(att.reshape(b, s, -1))
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(c.intermediate, dtype=dt, name="fc1")(h)
        h = _act(c.act)(h)
        x = x + nn.Dense(c.width, dtype=dt, name="fc2")(h)
        return x, x  # carry, per-layer output


class CLIPTextEncoder(nn.Module):
    """Returns (hidden_states stacked (L+1, B, S, D), last_ln, pooled).

    hidden_states[i] is the output after i layers (index 0 = embeddings),
    matching HF `output_hidden_states` indexing, so the hosts' "clip skip 1"
    penultimate convention is `hidden_states[-2] = hs[layers - 1]`.
    last_ln is final_layer_norm(hs[-1]).  pooled is the EOT-token feature of
    last_ln, through text_projection when projection_dim > 0.
    """

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray):
        c = self.cfg
        b, s = ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.width), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_len, c.width), jnp.float32)
        x = tok[ids] + pos[None, :s]
        x = x.astype(c.dtype)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        scan = nn.scan(_CLIPLayer, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=c.layers,
                       in_axes=nn.broadcast)
        last, per_layer = scan(c, name="layers")(x, causal)
        hs = jnp.concatenate([x[None], per_layer], axis=0)
        last_ln = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32,
                               name="final_ln")(last)
        eot = jnp.argmax((ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last_ln[jnp.arange(b), eot]
        if c.projection_dim:
            proj = self.param("text_projection", nn.initializers.normal(0.02),
                              (c.width, c.projection_dim), jnp.float32)
            pooled = pooled.astype(jnp.float32) @ proj
        return hs, last_ln, pooled


# --------------------------------------------------------------------------
# T5 / UMT5 encoder


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    layers: int = 24
    heads: int = 64
    head_dim: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    per_layer_rel_bias: bool = False   # True = UMT5 (Wan2.2 umt5-xxl)
    act: str = "gelu"                  # gated act: gelu (v1.1/xxl) or relu
    dtype: jnp.dtype = jnp.float32


T5_XXL_CONFIG = T5Config()
UMT5_XXL_CONFIG = T5Config(vocab_size=256384, per_layer_rel_bias=True)


def t5_relative_buckets(qlen: int, klen: int, buckets: int, maxdist: int
                        ) -> np.ndarray:
    """Bidirectional T5 relative-position bucket table (static, host-side)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(rel.clip(1) / max_exact) / np.log(maxdist / max_exact)
        * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rel, large)


class _T5Layer(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, inputs):
        pos_bias, mask = inputs
        c = self.cfg
        dt = c.dtype
        inner = c.heads * c.head_dim
        h = _RMS(name="ln1")(x)
        q = nn.Dense(inner, use_bias=False, dtype=dt, name="q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=dt, name="k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=dt, name="v")(h)
        if c.per_layer_rel_bias:
            table = self.param("rel_bias", nn.initializers.normal(1.0),
                               (c.rel_buckets, c.heads), jnp.float32)
            pos_bias = jnp.transpose(table[pos_bias], (2, 0, 1))[None]
        b, s, _ = q.shape
        att = jax.nn.dot_product_attention(
            q.reshape(b, s, c.heads, -1), k.reshape(b, s, c.heads, -1),
            v.reshape(b, s, c.heads, -1),
            bias=pos_bias.astype(dt), mask=mask, scale=1.0)
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=dt,
                         name="o")(att.reshape(b, s, -1))
        h = _RMS(name="ln2")(x)
        act = nn.gelu(nn.Dense(c.d_ff, use_bias=False, dtype=dt,
                               name="wi0")(h), approximate=True) \
            if c.act == "gelu" else \
            nn.relu(nn.Dense(c.d_ff, use_bias=False, dtype=dt, name="wi0")(h))
        h = act * nn.Dense(c.d_ff, use_bias=False, dtype=dt, name="wi1")(h)
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=dt, name="wo")(h)
        return x, None


class _RMS(nn.Module):
    """T5/Llama RMSNorm: fp32 stats, learned scale, no bias, no mean-sub."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        return (n * scale).astype(dt)


class T5Encoder(nn.Module):
    """Returns last_hidden_state (B, S, d_model) after the final RMSNorm.

    attn_mask: optional (B, S) 1/0 key-validity mask (HF attention_mask).
    """

    cfg: T5Config

    @nn.compact
    def __call__(self, ids: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        b, s = ids.shape
        emb = self.param("shared", nn.initializers.normal(1.0),
                         (c.vocab_size, c.d_model), jnp.float32)
        x = emb[ids].astype(c.dtype)
        buckets = jnp.asarray(
            t5_relative_buckets(s, s, c.rel_buckets, c.rel_max_distance))
        if c.per_layer_rel_bias:
            pos_bias = buckets  # each layer looks up its own table
        else:
            table = self.param("rel_bias", nn.initializers.normal(1.0),
                               (c.rel_buckets, c.heads), jnp.float32)
            pos_bias = jnp.transpose(table[buckets], (2, 0, 1))[None]
        mask = None
        if attn_mask is not None:
            mask = attn_mask[:, None, None, :].astype(bool)
        scan = nn.scan(_T5Layer, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=c.layers,
                       in_axes=nn.broadcast)
        x, _ = scan(c, name="blocks")(x, (pos_bias, mask))
        return _RMS(name="final_ln")(x)


# --------------------------------------------------------------------------
# Llama / Qwen2 decoder used as a hidden-state encoder


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8
    intermediate: int = 14336
    rope_theta: float = 500000.0
    # llama3-style rope scaling (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings) or None
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    qkv_bias: bool = False            # True = Qwen2/Qwen2.5
    rms_eps: float = 1e-5
    # Qwen3 family: explicit head width (decoupled from dim//heads) and
    # per-head RMS q/k-norm before RoPE
    head_dim: Optional[int] = None
    qk_norm: bool = False
    # Qwen2.5-VL multimodal rope: channel sections of head_dim//2 assigned
    # to the (temporal, height, width) position streams.  Only engages when
    # pos_ids are passed (vision tokens in the sequence); for pure text all
    # three streams are equal, which reduces exactly to standard RoPE.
    mrope_section: Optional[Tuple[int, int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def head_width(self) -> int:
        return self.head_dim if self.head_dim is not None else self.dim // self.heads


LLAMA31_8B_CONFIG = LlamaConfig(rope_scaling=(8.0, 1.0, 4.0, 8192))
# Qwen2.5-(VL-)7B text stack (Qwen-Image's prompt encoder)
QWEN25_7B_CONFIG = LlamaConfig(vocab_size=152064, dim=3584, layers=28,
                               heads=28, kv_heads=4, intermediate=18944,
                               rope_theta=1000000.0, qkv_bias=True,
                               rms_eps=1e-6, mrope_section=(16, 24, 24))
# Qwen3 dense text stacks — the prompt encoders the reference's newest
# workflow families pin (docs/family_facts.md): 0.6B = Anima, 4B =
# Flux.2-Klein-4b / Krea2 (VL text tower), 8B = Flux.2-Klein-9b /
# Ideogram4 (VL text tower).  All use head_dim 128 + per-head qk-norm.
QWEN3_06B_CONFIG = LlamaConfig(vocab_size=151936, dim=1024, layers=28,
                               heads=16, kv_heads=8, intermediate=3072,
                               rope_theta=1000000.0, rms_eps=1e-6,
                               head_dim=128, qk_norm=True)
QWEN3_4B_CONFIG = LlamaConfig(vocab_size=151936, dim=2560, layers=36,
                              heads=32, kv_heads=8, intermediate=9728,
                              rope_theta=1000000.0, rms_eps=1e-6,
                              head_dim=128, qk_norm=True)
QWEN3_8B_CONFIG = LlamaConfig(vocab_size=151936, dim=4096, layers=36,
                              heads=32, kv_heads=8, intermediate=12288,
                              rope_theta=1000000.0, rms_eps=1e-6,
                              head_dim=128, qk_norm=True)


def _llama3_scale_inv_freq(inv: np.ndarray, factor: float, low: float,
                           high: float, orig: int) -> np.ndarray:
    """Llama-3.1 frequency rescaling (HF ROPE_INIT_FUNCTIONS['llama3'])."""
    low_wl = orig / low
    high_wl = orig / high
    wavelen = 2.0 * np.pi / inv
    smooth = (orig / wavelen - low) / (high - low)
    mid = (1.0 - smooth) * inv / factor + smooth * inv
    return np.where(wavelen > low_wl, inv / factor,
                    np.where(wavelen < high_wl, inv, mid)).astype(np.float32)


def _llama_rope(s: int, head_dim: int, theta: float,
                scaling: Optional[Tuple[float, float, float, int]] = None):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, np.float32) / head_dim))
    if scaling is not None:
        inv = _llama3_scale_inv_freq(inv, *scaling)
    t = np.arange(s, dtype=np.float32)[:, None] * inv[None]
    freqs = jnp.asarray(np.concatenate([t, t], axis=-1))
    return jnp.cos(freqs), jnp.sin(freqs)


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _mrope_tables(pos_ids, head_dim: int, theta: float,
                  section: Tuple[int, int, int]):
    """Qwen2.5-VL multimodal rope tables from 3-stream position ids.

    pos_ids (3, S): temporal/height/width positions (text tokens carry the
    same value in all three).  Channel c of head_dim//2 uses stream k where
    c falls in section k — HF apply_multimodal_rotary_pos_emb's i%3 chunk
    pattern collapses to this single select because cos/sin tables are
    (freqs, freqs) duplicated."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, np.float32) / head_dim))
    freqs = (pos_ids[:, :, None].astype(jnp.float32)
             * jnp.asarray(inv)[None, None])             # (3, S, hd/2)
    bounds = np.cumsum((0,) + tuple(section))
    sel = jnp.concatenate(
        [freqs[k, :, bounds[k]:bounds[k + 1]] for k in range(3)], axis=-1)
    emb = jnp.concatenate([sel, sel], axis=-1)           # (S, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


class _LlamaLayer(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, inputs):
        cos, sin, mask = inputs
        c = self.cfg
        dt = c.dtype
        hd = c.head_width
        h = _RMS(eps=c.rms_eps, name="ln1")(x)
        q = nn.Dense(c.heads * hd, use_bias=c.qkv_bias, dtype=dt, name="q")(h)
        k = nn.Dense(c.kv_heads * hd, use_bias=c.qkv_bias, dtype=dt, name="k")(h)
        v = nn.Dense(c.kv_heads * hd, use_bias=c.qkv_bias, dtype=dt, name="v")(h)
        b, s, _ = q.shape
        q = q.reshape(b, s, c.heads, hd)
        k = k.reshape(b, s, c.kv_heads, hd)
        v = v.reshape(b, s, c.kv_heads, hd)
        if c.qk_norm:  # Qwen3: per-head RMS over head_dim, before RoPE
            q = _RMS(eps=c.rms_eps, name="q_norm")(q)
            k = _RMS(eps=c.rms_eps, name="k_norm")(k)
        # RoPE in fp32 (HF applies it on (B, H, S, D); ours is (B, S, H, D))
        cs, sn = cos[None, :, None].astype(jnp.float32), sin[None, :, None].astype(jnp.float32)
        q = (q.astype(jnp.float32) * cs + _rotate_half(q.astype(jnp.float32)) * sn).astype(dt)
        k = (k.astype(jnp.float32) * cs + _rotate_half(k.astype(jnp.float32)) * sn).astype(dt)
        rep = c.heads // c.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = jax.nn.dot_product_attention(q, k, v, mask=mask)
        x = x + nn.Dense(c.dim, use_bias=False, dtype=dt,
                         name="o")(att.reshape(b, s, -1))
        h = _RMS(eps=c.rms_eps, name="ln2")(x)
        g = nn.silu(nn.Dense(c.intermediate, use_bias=False, dtype=dt,
                             name="gate")(h))
        h = g * nn.Dense(c.intermediate, use_bias=False, dtype=dt, name="up")(h)
        x = x + nn.Dense(c.dim, use_bias=False, dtype=dt, name="down")(h)
        return x, x


class LlamaEncoder(nn.Module):
    """Causal LM trunk used as an encoder.

    Returns (hidden_states (L+1, B, S, D) HF-indexed, final_norm(last)).
    HiDream consumes a selection of the per-layer states; Qwen-Image takes
    the last (or final-normed) hidden state.
    """

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None,
                 embeds: Optional[jnp.ndarray] = None,
                 pos_ids: Optional[jnp.ndarray] = None):
        """`embeds` (B, S, dim) overrides the token-embedding lookup — the
        multimodal injection path (Qwen2.5-VL vision tokens spliced at the
        <|image_pad|> positions; `ids` still provided for shape/mask).
        `pos_ids` (3, S) engages multimodal rope (cfg.mrope_section)."""
        c = self.cfg
        b, s = ids.shape
        emb = self.param("embed_tokens", nn.initializers.normal(0.02),
                         (c.vocab_size, c.dim), jnp.float32)
        x = (emb[ids] if embeds is None else embeds).astype(c.dtype)
        if pos_ids is not None:
            cos, sin = _mrope_tables(pos_ids, c.head_width, c.rope_theta,
                                     c.mrope_section)
        else:
            cos, sin = _llama_rope(s, c.head_width, c.rope_theta,
                                   c.rope_scaling)
        causal = jnp.tril(jnp.ones((s, s), bool))
        if attn_mask is not None:
            causal = causal[None, None] & attn_mask[:, None, None, :].astype(bool)
        else:
            causal = causal[None, None]
        scan = nn.scan(_LlamaLayer, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=c.layers,
                       in_axes=nn.broadcast)
        last, per_layer = scan(c, name="layers")(x, (cos, sin, causal))
        hs = jnp.concatenate([x[None], per_layer], axis=0)
        return hs, _RMS(eps=c.rms_eps, name="final_ln")(last)


# --------------------------------------------------------------------------
# jitted convenience wrappers


def clip_encode(params, ids, cfg: CLIPTextConfig, clip_skip: int = 2
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hidden, pooled): hidden = hidden_states[-clip_skip] (hosts' default
    clip_skip=2 == penultimate layer, un-normed), pooled as HF."""
    hs, _last, pooled = CLIPTextEncoder(cfg).apply(params, ids)
    return hs[cfg.layers + 1 - clip_skip], pooled


def t5_encode(params, ids, cfg: T5Config, attn_mask=None) -> jnp.ndarray:
    return T5Encoder(cfg).apply(params, ids, attn_mask)


def llama_encode(params, ids, cfg: LlamaConfig, attn_mask=None):
    return LlamaEncoder(cfg).apply(params, ids, attn_mask)
