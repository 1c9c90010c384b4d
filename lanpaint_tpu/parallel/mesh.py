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
