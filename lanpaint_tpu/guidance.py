"""Classifier-free-guidance double pass.

TPU-native equivalent of the reference's patched `predict_noise`
(reference src/LanPaint/nodes.py:85-132): one *batched* cond/uncond forward
per model call, then two CFG mixes — the normal `cfg` and the `cfg_big`
used by the bidirectional-guidance score on the known region — returning
`(x0, x0_big)`.

Batching cond+uncond along the batch axis doubles the matmul batch (MXU
utilization) and is the axis the data-parallel mesh shards
(lanpaint_tpu.parallel).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

# A "model x0 function": (x, t, cond) -> x0 prediction, where cond is any
# pytree of conditioning tensors batched along axis 0.
ModelX0Fn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]
# A "double denoiser": (x, t) -> (x0, x0_big); what the engine consumes.
DoubleDenoiser = Callable[[jnp.ndarray, jnp.ndarray], tuple]


def resolve_cfg_big(prompt_mode: str, cfg: float, is_flux: bool = False) -> float:
    """cfg_big policy (reference nodes.py:217-220, 337-340).

    "Image First" -> cfg_big = cfg; "Prompt First" -> cfg_big = -0.5;
    FLUX(-family guidance-distilled) backbones force cfg_big = 1.0.
    """
    if is_flux:
        return 1.0
    if prompt_mode == "Image First":
        return float(cfg)
    if prompt_mode == "Prompt First":
        return -0.5
    raise ValueError(f"unknown prompt_mode: {prompt_mode!r}")


def make_cfg_double_denoiser(
    model_x0: ModelX0Fn,
    cond: Any,
    uncond: Optional[Any],
    cfg: float,
    cfg_big: float,
    disable_cfg1_optimization: bool = False,
    pre_cfg_fns: Optional[list] = None,
    sequential: bool = False,
) -> DoubleDenoiser:
    """Build the (x0, x0_big) double denoiser from a raw model-x0 function.

    When cfg == 1 (and the optimization is not disabled) the uncond pass is
    skipped and BOTH outputs equal the cond prediction regardless of
    cfg_big — exactly the reference's cfg1 shortcut (nodes.py:86-89, where
    `uncond_ = None` collapses both cfg_function calls to the cond output).

    `pre_cfg_fns` are applied to the raw (cond_pred, uncond_pred) pair before
    the CFG mixes, mirroring the reference's `sampler_pre_cfg_function` hook
    chain (nodes.py:94-97).  Each fn receives a dict
    {"conds_out": [cond_pred, uncond_pred], "cond_scale", "input", "sigma"}
    and returns the new conds_out list.
    """
    skip_uncond = uncond is None or (
        math.isclose(float(cfg), 1.0) and not disable_cfg1_optimization
    )

    if skip_uncond:

        def denoise_single(x, t):
            x0_c = model_x0(x, t, cond)
            return x0_c, x0_c

        return denoise_single

    def denoise_double(x, t):
        b = x.shape[0]
        if sequential:
            # Two B-sized passes instead of one 2B-sized pass.  Same math;
            # at large-token video scale it is ~20% FASTER (measured
            # Wan-5B: 2 x 0.45 s vs 1.06 s for the batched 2B call — the
            # MXU is already saturated at B=1 and the batched pass loses
            # more to attention) and peak activation memory halves.
            tb = jnp.broadcast_to(t, (b,))
            x0_c = model_x0(x, tb, cond)
            x0_u = model_x0(x, tb, uncond)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([jnp.broadcast_to(t, (b,))] * 2, axis=0)
            c2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0),
                              cond, uncond)
            out = model_x0(x2, t2, c2)
            x0_c, x0_u = out[:b], out[b:]
        for fn in (pre_cfg_fns or []):
            x0_c, x0_u = fn({"conds_out": [x0_c, x0_u], "cond_scale": cfg,
                             "input": x, "sigma": t})
        delta = x0_c - x0_u
        return x0_u + delta * cfg, x0_u + delta * cfg_big

    return denoise_double


