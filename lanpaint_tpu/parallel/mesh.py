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

    @property
    def total(self) -> int:
        return self.data * self.seq * self.tensor


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, seq, tensor) mesh.  Defaults to all devices on "data"."""
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.total != len(devices):
        raise ValueError(
            f"mesh spec {spec} needs {spec.total} devices, got {len(devices)}"
        )
    arr = np.asarray(devices).reshape(spec.data, spec.seq, spec.tensor)
    return Mesh(arr, ("data", "seq", "tensor"))


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
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, params)


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
                    shape[dim] = -(-shape[dim] // div)
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
