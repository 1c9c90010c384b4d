"""Ring attention over the "seq" mesh axis (sequence parallelism).

SURVEY.md section 5 (long-context): the reference handles Wan2.2 81-frame
video on a single GPU and simply recommends staying under 40 frames
(reference README.md:173).  At 81 frames / 880x480 the DiT self-attention
is ~35k tokens; the score FLOPs alone exceed a single v5e chip's budget per
forward, so the TPU build shards the token axis over ICI and rotates K/V
blocks around the ring, overlapping compute with ICI transfers
(`lax.ppermute`) — the standard blockwise/ring attention construction with
a numerically-stable online softmax (running max + running normalizer),
computed in fp32.

`ring_attention` is the collective primitive (must run inside shard_map
with `axis_name` bound); `seq_parallel_attention` wraps it in shard_map for
standalone use/testing.  The Wan model integrates it via
`WanConfig(attention_impl="ring", seq_axis="seq")` (models/wan.py) and the
`models.zoo.seq_parallel_wan` builder.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(q, k, v, axis_name: str, sm_scale: Optional[float] = None):
    """Blockwise ring attention on per-device shards.

    q, k, v: (B, S_local, H, D) — the local sequence shard of each device.
    Returns (B, S_local, H, D).  Requires being traced inside shard_map (or
    any context binding `axis_name`).  Full (non-causal) attention: every
    device's queries see every device's keys after n_ring steps; K/V blocks
    travel the ring via ppermute while the local partial softmax
    accumulates in fp32.
    """
    n = jax.lax.psum(1, axis_name)
    scale = (1.0 / math.sqrt(q.shape[-1])) if sm_scale is None else sm_scale

    # (B, H, S, D) layout for the score matmuls
    qt = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32) * scale
    kt0 = jnp.transpose(k, (0, 2, 1, 3)).astype(jnp.float32)
    vt0 = jnp.transpose(v, (0, 2, 1, 3)).astype(jnp.float32)

    b, h, s, d = qt.shape
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(_i, carry):
        o, m, l, kt, vt = carry
        sc = jnp.einsum("bhqd,bhkd->bhqk", qt, kt)
        m_blk = jnp.max(sc, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(sc - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, vt)
        kt = jax.lax.ppermute(kt, axis_name, perm)
        vt = jax.lax.ppermute(vt, axis_name, perm)
        return o, m_new, l, kt, vt

    # carry inits derived from the (device-varying) inputs so shard_map's
    # varying-axes tracking accepts the loop carry
    init = (qt * 0.0,
            qt[..., 0] * 0.0 - jnp.inf,
            qt[..., 0] * 0.0, kt0, vt0)
    o, _m, l, _k, _v = jax.lax.fori_loop(0, n, body, init)
    o = o / l[..., None]
    return jnp.transpose(o, (0, 2, 1, 3)).astype(q.dtype)


def seq_parallel_attention(mesh: Mesh, q, k, v,
                           sm_scale: Optional[float] = None,
                           axis_name: str = "seq"):
    """shard_map wrapper: q/k/v are global (B, S, H, D) arrays; the sequence
    axis is sharded over `axis_name`, batch over "data"."""
    spec = P("data", axis_name, None, None)

    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis_name,
                          sm_scale=sm_scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
