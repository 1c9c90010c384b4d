"""Device mesh + sharding layer (the component the reference lacks).

The reference is single-GPU eager PyTorch with no distributed backend
(SURVEY.md section 2: "Parallelism strategies: NONE"); scaling is this
framework's addition.  Design (per SURVEY.md section 7 B7 and the scaling-book
recipe): pick a mesh, annotate shardings on the jitted sampler's inputs, let
XLA insert collectives over ICI.

Axes:
* "data"  — data parallel over the latent batch x CFG cond/uncond pair.  The
  LanPaint update is pointwise over latent elements, so DP sharding is
  communication-free except inside the model forward.
* "seq"   — sequence/spatial parallel for long video latents (Wan2.2
  81-frame): shards the flattened token axis of DiT attention.
* "tensor"— reserved for tensor-parallel model weights (model-side sharding
  hooks live in lanpaint_tpu.models).
* "expert"— expert parallelism for the HiDream MoE: the dense-compute expert
  stack (models/hidream.py MoEFeedForward) carries the expert count as a
  weight axis, so EP is pure GSPMD — shard that axis and XLA turns the final
  gate contraction into a psum over "expert".  No token dispatch, no
  all-to-all.

Pipeline parallelism is deliberately absent: this is a latency-bound
batch-1/2 inference engine, where a P-stage pipeline with M resident
microbatches idles (P-1)/(P-1+M) of each step — 87% at P=8, M=1.  TP/EP
split the same weights with zero bubble, and FSDP-style layer-axis weight
sharding (the scanned block stack's depth axis) covers the fits-in-HBM
problem TP doesn't.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    seq: int = 1
    tensor: int = 1
    expert: int = 1

    @property
    def total(self) -> int:
        return self.data * self.seq * self.tensor * self.expert


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, seq, tensor, expert) mesh.  Defaults to all devices on
    "data"."""
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.total != len(devices):
        raise ValueError(
            f"mesh spec {spec} needs {spec.total} devices, got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(spec.data, spec.seq, spec.tensor,
                                      spec.expert)
    return Mesh(arr, ("data", "seq", "tensor", "expert"))


def shard_batch(mesh: Mesh, x, batch_axis: int = 0):
    """Place an array with its batch axis sharded over the "data" axis."""
    spec = [None] * x.ndim
    spec[batch_axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_params_replicated(mesh: Mesh, params):
    """Replicate model parameters across the whole mesh (DP serving layout)."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P())), params
    )


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def seq_sharding(mesh: Mesh, ndim: int, seq_axis: int) -> NamedSharding:
    spec = [None] * ndim
    spec[0] = "data"
    spec[seq_axis] = "seq"
    return NamedSharding(mesh, P(*spec))


def tp_param_shardings(mesh: Mesh, params, rules):
    """NamedSharding pytree under `shard_params_tp`'s rules — no placement.

    Works on real params or a `jax.eval_shape` tree; feeds jit
    `in_shardings` (the GSPMD path) and capacity planning for models too
    large to initialize (the Wan2.2-14B pair)."""

    def leaf(path, p):
        name = "/".join(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        for pred, spec in rules:
            if pred(name):
                return NamedSharding(mesh, _divisible_spec(mesh, spec, p))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, params)


def _divisible_spec(mesh: Mesh, spec, p) -> P:
    """Drop sharded axes from dims they don't divide (device_put, unlike
    GSPMD-in-jit, cannot pad) — e.g. a depth-2 scanned stack under
    layer_shard_rules on a data=4 mesh stays replicated on dim 0."""
    shape = getattr(p, "shape", None)
    if shape is None or len(spec) == 0:
        return spec
    out = []
    for dim, axis in enumerate(tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        names = (axis,) if isinstance(axis, str) else tuple(axis)
        div = 1
        for a in names:
            div *= mesh.shape[a]
        out.append(axis if shape[dim] % div == 0 else None)
    return P(*out)


def shard_params_tp(mesh: Mesh, params, rules):
    """Megatron-style tensor-parallel weight sharding.

    `rules` is a list of (predicate, PartitionSpec) where predicate takes the
    joined parameter path string (e.g. "blocks/block/self_attn/q/kernel").
    First matching rule wins; unmatched leaves are replicated.  XLA SPMD then
    inserts the psum/all-gather collectives at the row-sharded projections.
    """
    shardings = tp_param_shardings(mesh, params, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def tp_plan_bytes(params_shapes, rules, axis_sizes: dict,
                  dtype_bytes: int = 2) -> int:
    """Per-device parameter bytes under `shard_params_tp`'s rules, computed
    from a `jax.eval_shape` pytree — no materialization.

    This is the capacity-planning half of the TP story: it answers "does the
    Wan2.2-14B expert pair fit a 16 GB v5e at tensor=K?" without initializing
    28 GB of weights.  `axis_sizes` maps mesh axis name -> size (e.g.
    {"tensor": 4}); `dtype_bytes` is the deployed weight width (bf16 = 2).
    Unmatched leaves are counted replicated, matching shard_params_tp.
    """

    def leaf_bytes(path, p):
        name = "/".join(k.key if hasattr(k, "key") else str(k) for k in path)
        shape = list(p.shape)
        for pred, spec in rules:
            if pred(name):
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    names = (axis,) if isinstance(axis, str) else tuple(axis)
                    div = 1
                    for a in names:
                        div *= axis_sizes.get(a, 1)
                    # non-divisible dims stay replicated (matches
                    # shard_params_tp's _divisible_spec placement rule)
                    if shape[dim] % div == 0:
                        shape[dim] = shape[dim] // div
                break
        n = 1
        for s in shape:
            n *= int(s)
        return n * dtype_bytes

    leaves = jax.tree_util.tree_map_with_path(leaf_bytes, params_shapes)
    return sum(jax.tree.leaves(leaves))


def wan_tp_rules():
    """TP rules for the Wan video DiT: column-shard qkv/ffn-in over the
    "tensor" axis (head dim), row-shard the output projections (XLA inserts
    the all-reduce).  Stacked scan weights carry depth as axis 0."""
    col = P(None, None, "tensor")
    row = P(None, "tensor", None)
    return [
        (lambda n: any(f"{a}/{w}/kernel" in n
                       for a in ("self_attn", "cross_attn") for w in "qkv"), col),
        (lambda n: "self_attn/o/kernel" in n or "cross_attn/o/kernel" in n, row),
        (lambda n: "ffn_0/kernel" in n, col),
        (lambda n: "ffn_2/kernel" in n, row),
    ]


def unet_tp_rules():
    """TP rules for the SD/SDXL UNet: shard the transformer blocks (the
    FLOP/time majority at 1024px — spatial self-attention over 4096
    tokens + geglu FFN), Megatron column/row.  Convs/norms/time-emb stay
    replicated: channel-sharding convs buys little at their widths and
    GroupNorm(32) stats would cross shards.  Scanned block weights carry
    depth as axis 0; q/k/v are bias-free, the geglu in-projection's bias
    is column-sharded with its kernel, to_out's bias rides the psum."""
    col3 = P(None, None, "tensor")
    row3 = P(None, "tensor", None)
    return [
        # fused layout (UNetConfig.fused_qkv, the default): attn1 to_qkv +
        # attn2 to_q column-shard; the hoisted cross-kv stack kv_cross
        # (depth, ctx, 2c) is column-parallel too — its einsum output feeds
        # the head split, all logical under GSPMD.
        (lambda n: "/block/" in n and "/attn1/to_qkv/kernel" in n, col3),
        (lambda n: "/kv_cross" in n, col3),
        (lambda n: "/block/" in n and any(
            f"/{a}/{w}/kernel" in n for a in ("attn1", "attn2")
            for w in ("to_q", "to_k", "to_v")), col3),
        (lambda n: "/block/" in n and "/to_out/kernel" in n, row3),
        (lambda n: "/block/" in n and "ff/net_0/proj/kernel" in n, col3),
        (lambda n: "/block/" in n and "ff/net_0/proj/bias" in n,
         P(None, "tensor")),
        (lambda n: "/block/" in n and "ff/net_2/kernel" in n, row3),
        (lambda n: "_attn/proj_in/kernel" in n, P(None, "tensor")),
        (lambda n: "_attn/proj_in/bias" in n, P("tensor")),
        (lambda n: "_attn/proj_out/kernel" in n, P("tensor", None)),
    ]


def dit_tp_rules():
    """TP rules for the MMDiT family (Flux/Qwen/Z-Image)."""
    col = P(None, None, "tensor")
    row = P(None, "tensor", None)
    return [
        (lambda n: "attn_qkv/kernel" in n or "linear1/kernel" in n, col),
        (lambda n: "attn_proj/kernel" in n or "linear2/kernel" in n, row),
        (lambda n: "mlp_0/kernel" in n, col),
        (lambda n: "mlp_2/kernel" in n, row),
    ]


def sd3_tp_rules():
    """TP rules for the SD3/SD3.5 MMDiT: column-shard qkv/mlp-in, row-shard
    the output projections.  Scanned joint blocks carry depth as axis 0;
    the unstacked final joint block gets the 2-D specs."""
    col3, row3 = P(None, None, "tensor"), P(None, "tensor", None)
    col2, row2 = P(None, "tensor"), P("tensor", None)

    def scanned(n):
        return "/block/" in n

    return [
        (lambda n: scanned(n) and ("attn/qkv/kernel" in n
                                   or "attn2/qkv/kernel" in n
                                   or "mlp_fc1/kernel" in n), col3),
        (lambda n: scanned(n) and ("attn_proj/kernel" in n
                                   or "attn2_proj/kernel" in n
                                   or "mlp_fc2/kernel" in n), row3),
        (lambda n: "joint_last" in n and ("attn/qkv/kernel" in n
                                          or "mlp_fc1/kernel" in n), col2),
        (lambda n: "joint_last" in n and ("attn_proj/kernel" in n
                                          or "mlp_fc2/kernel" in n), row2),
    ]


def layer_shard_rules(rules, pred=None, axis: str = "data"):
    """FSDP-style layer-axis weight sharding, composed with TP rules.

    Scanned block stacks (nn.scan) carry depth as weight axis 0; sharding it
    over `axis` divides resident parameter bytes by that axis size — XLA
    all-gathers each layer's slice just-in-time inside the scan.  This is
    the fits-in-HBM lever orthogonal to TP (which splits within a layer):
    at {data: D, tensor: T} a scanned stack is D*T-way split.  `pred` picks
    the scanned leaves (default: path contains "/block/"); TP specs keep
    their within-layer axes, gaining `axis` on dim 0; scanned leaves with no
    TP rule get dim 0 alone; unscanned leaves fall through to `rules`.
    """
    if pred is None:
        pred = lambda n: "/block/" in n  # noqa: E731

    def stacked(spec):
        if len(spec) == 0 or spec[0] is not None:
            return spec  # dim 0 already taken (not a depth-stacked spec)
        return P(axis, *spec[1:])

    out = [(lambda n, p=p: p(n) and pred(n), stacked(spec))
           for p, spec in rules]
    out.append((pred, P(axis)))
    out.extend(rules)
    return out


def hidream_ep_rules():
    """EP x TP rules for the HiDream MoE-MMDiT (models/hidream.py).

    The MoE is evaluated densely — routed experts stacked as weight axis 1
    (axis 0 is scan depth): w1/w3 (L, E, h, inner), w2 (L, E, inner, h).
    Sharding E over "expert" and the SwiGLU inner width over "tensor" makes
    XLA compute each device's expert slice locally and psum over "expert" at
    the gate contraction (einsum "bseh,bse->bsh") and over "tensor" at w2 —
    expert parallelism with zero dispatch/all-to-all, the TPU-native dual of
    token-routing EP.  Dense (non-MoE) projections get standard Megatron TP:
    column-shard qkv / ffn-in, row-shard the output projections.  Router
    gates, norms, and modulations stay replicated (tiny).
    """
    moe_in = P(None, "expert", None, "tensor")    # experts_w1 / experts_w3
    moe_out = P(None, "expert", "tensor", None)   # experts_w2
    col = P(None, None, "tensor")
    row = P(None, "tensor", None)
    return [
        (lambda n: "experts_w1" in n or "experts_w3" in n, moe_in),
        (lambda n: "experts_w2" in n, moe_out),
        # shared expert + carried-txt SwiGLU (w1/w3 in, w2 out)
        (lambda n: ("/w1/kernel" in n or "/w3/kernel" in n), col),
        (lambda n: "/w2/kernel" in n, row),
        # joint / single attention (public names: to_q[_t] ... to_out[_t])
        (lambda n: any(f"/to_{w}/kernel" in n or f"/to_{w}_t/kernel" in n
                       for w in "qkv"), col),
        (lambda n: "/to_out/kernel" in n or "/to_out_t/kernel" in n, row),
    ]


def with_data_parallel(sampler_call, mesh: Mesh):
    """Wrap a LanPaintSampler-style callable so its array inputs are
    DP-sharded over the mesh before the compiled program runs.

    XLA then runs the whole sampler SPMD: the think loop is elementwise (no
    collectives); the model forward all-reduces only where the model itself
    requires it.  Scalars/conditioning are replicated.
    """

    def call(**kwargs):
        out = {}
        for k, v in kwargs.items():
            if k in ("latent", "noise", "mask") and v is not None:
                v = jax.numpy.asarray(v)
                if v.ndim >= 1 and v.shape[0] % mesh.shape["data"] == 0:
                    v = shard_batch(mesh, v)
            out[k] = v
        return sampler_call(**out)

    return call


def wan_tp_param_specs(params):
    """PartitionSpec pytree for shard_map-manual tensor parallelism of the
    Wan DiT (models/wan.py tp_axis mode): column-parallel q/k/v/ffn_0 shard
    kernel AND bias on the feature dim; row-parallel o/ffn_2 shard the
    kernel input dim and replicate the bias (added post-psum inside
    _RowDense).  Scanned block weights carry depth as axis 0."""

    def leaf(path, p):
        name = "/".join(k.key if hasattr(k, "key") else str(k) for k in path)
        col = any(f"{a}/{w}/" in name
                  for a in ("self_attn", "cross_attn") for w in "qkv")
        # full-width qk-norm scales live in the column-parallel (sharded)
        # feature space — each shard keeps its slice (models/wan._WanQKNorm)
        col = col or "/norm_q/" in name or "/norm_k/" in name
        col = col or "ffn_0/" in name
        row = any(f"{a}/o/kernel" in name for a in ("self_attn", "cross_attn"))
        row = row or "ffn_2/kernel" in name
        if col:
            spec = [None] * (p.ndim - 1) + ["tensor"]
        elif row:
            spec = [None] * (p.ndim - 2) + ["tensor", None]
        else:
            spec = [None] * p.ndim
        return P(*spec)

    return jax.tree_util.tree_map_with_path(leaf, params)
