"""Model zoo: packaged Denoisers for every backbone family the reference
supports (reference README.md:131-139: SDXL/SD1.5 eps-pred; Flux, Qwen,
Z-Image, SD3.5, HiDream flow DiT; Wan2.2 video DiT).

Each build_* returns (Denoiser, params).  Params default to random init (for
shape-correct testing/benching on TPU without checkpoint access); pass
`params=` from models.load to use real weights.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import ModelKind
from ..sigmas import EpsSigmaTable, FlowSigmaTable
from .base import Denoiser
from .dit import (
    DiTConfig,
    FLUX_DEV_CONFIG,
    FLUX_SCHNELL_CONFIG,
    MMDiT,
    QWEN_IMAGE_CONFIG,
    TINY_DIT_CONFIG,
    Z_IMAGE_CONFIG,
)
from .sd3 import (
    SD3_MEDIUM_CONFIG,
    SD35_LARGE_CONFIG,
    SD35_LARGE_TURBO_CONFIG,
    SD35_MEDIUM_CONFIG,
    SD3Config,
    SD3MMDiT,
    TINY_SD3_CONFIG,
)
from .unet import SD15_CONFIG, SD21_CONFIG, SDXL_CONFIG, TINY_UNET_CONFIG, UNetConfig, UNetModel
from .wan import TINY_WAN_CONFIG, WanConfig, WanModel


def _bc(t, ndim):
    t = jnp.asarray(t)
    return t.reshape(t.shape[:1] + (1,) * (ndim - 1))


def init_params_host(module, *args, seed: int = 0, scale: float = 0.02,
                     force_dtype=None):
    """Random-init parameters on the HOST (numpy), not the device.

    `module.init` on the tunneled TPU compiles a huge per-parameter RNG
    program (measured: ~10 min for SDXL vs 26 s for the forward itself), so
    random benchmark/test weights are generated with numpy from the shape
    tree instead: kernels ~ N(0, scale^2), biases/norm-offsets zero,
    scales one.

    Leaves are plain numpy (ml_dtypes for bf16): the device transfer then
    happens once, batched, on the first jitted call — per-leaf device puts
    through the tunnel are another multi-minute trap.
    """
    import ml_dtypes
    import numpy as np

    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(seed), *args)
    rng = np.random.default_rng(seed)

    def np_dtype(dt):
        if force_dtype is not None:
            dt = force_dtype  # e.g. bf16 serving weights for 5B+ models:
            # emitting fp32 first doubles host RAM (20 GB for Wan-5B) and
            # can swap-thrash the init for tens of minutes
        return ml_dtypes.bfloat16 if dt == jnp.bfloat16 else np.dtype(dt)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("bias", "shift") or name.endswith("bias"):
            return np.zeros(s.shape, np_dtype(s.dtype))
        if name == "scale":
            return np.ones(s.shape, np_dtype(s.dtype))
        arr = rng.standard_normal(s.shape, dtype=np.float32) * scale
        return arr.astype(np_dtype(s.dtype))

    return jax.tree_util.tree_map_with_path(leaf, shapes)


# --------------------------------------------------------------------------
# eps-prediction UNets (SD1.5 / SD2.1 / SDXL)


def build_unet(
    config: UNetConfig,
    params: Optional[Any] = None,
    *,
    v_prediction: bool = False,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "unet",
):
    module = UNetModel(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.in_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        y = (jnp.zeros((b, config.adm_in_channels), jnp.float32)
             if config.adm_in_channels else None)
        params = init_params_host(module, x, jnp.zeros((b,)), ctx, y, seed=seed)
    table = EpsSigmaTable()
    log_sigmas = jnp.asarray(jnp.log(jnp.asarray(table.sigmas)), jnp.float32)

    def sigma_to_timestep(sigma):
        # traceable log-sigma interpolation into the discrete table
        # (ComfyUI ModelSamplingDiscrete.timestep analogue)
        return jnp.interp(jnp.log(jnp.maximum(sigma, 1e-10)), log_sigmas,
                          jnp.arange(log_sigmas.shape[0], dtype=jnp.float32))

    # eps: x0 = x - sigma * eps, with eps predicted from the VP-scaled input
    # (c_in scaling, ComfyUI EPS.calculate_denoised analogue).
    def raw_apply(p, x, sigma, cond):
        s = _bc(sigma, x.ndim)
        x_in = x / jnp.sqrt(1.0 + s**2)
        t_disc = sigma_to_timestep(sigma)
        y = cond.get("y") if isinstance(cond, dict) else None
        ctx = cond["context"] if isinstance(cond, dict) else cond
        kvc = cond.get("kv_cache") if isinstance(cond, dict) else None
        eps = module.apply(p, x_in, t_disc, ctx, y, kv_cache=kvc)
        if v_prediction:
            return x / (1.0 + s**2) - s / jnp.sqrt(1.0 + s**2) * eps
        return x - s * eps

    precompute = (
        functools.partial(unet_precompute_kv, dtype=config.dtype)
        if config.fused_qkv else None)
    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params,
                   kind=ModelKind.EPS, sigma_table=table,
                   name=name, latent_channels=config.in_channels,
                   precompute=precompute)
    return den, params


def unet_precompute_kv(params, cond, dtype=jnp.bfloat16):
    """Hoist every cross-attention k/v projection of the fused-QKV UNet out
    of the sampling loops: the text context is constant within a run, so
    `context @ kv_cross` per SpatialTransformer is computed ONCE per launch
    (the sampler calls this at trace top level via Denoiser.precompute)
    instead of once per model forward — on the 20x5think SDXL headline that
    is 230 forwards x ~2% of model FLOPs at M=77 GEMM efficiency.

    Returns cond with a "kv_cache" dict {stack_name: (B, depth, T, 2*ch)}
    (batch-major so guidance.py's batched-CFG cond concat composes)."""
    if not isinstance(cond, dict) or "context" not in cond:
        return cond
    ctx = cond["context"].astype(dtype)
    cache = {}
    for sname, sub in params["params"].items():
        if isinstance(sub, dict) and "kv_cross" in sub:
            cache[sname] = jnp.einsum("btc,dcf->bdtf", ctx,
                                      sub["kv_cross"].astype(dtype))
    if not cache:
        return cond
    out = dict(cond)
    out["kv_cache"] = cache
    return out


def build_sd15(params=None, **kw):
    return build_unet(SD15_CONFIG, params, name="sd15", **kw)


def build_sd21_v(params=None, **kw):
    return build_unet(SD21_CONFIG, params, v_prediction=True, name="sd21-v", **kw)


def build_sdxl(params=None, **kw):
    return build_unet(SDXL_CONFIG, params, name="sdxl", **kw)


def build_tiny_unet(params=None, **kw):
    return build_unet(TINY_UNET_CONFIG, params, name="tiny-unet", **kw)


# --------------------------------------------------------------------------
# ControlNet-conditioned UNet


def build_controlled_unet(
    config: UNetConfig,
    unet_params: Optional[Any] = None,
    cn_params: Optional[Any] = None,
    *,
    strength: float = 1.0,
    v_prediction: bool = False,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "controlled-unet",
):
    """UNet + ControlNet pair (reference README.md:133 "ControlNet").

    The conditioning dict must carry `hint`: a (B, 3, H*8, W*8) pixel-space
    control image.  Residuals are computed per forward and injected at the
    UNet skips (UNetModel `control=`), scaled by `strength`.
    """
    from .controlnet import ControlNet, scale_control

    module = UNetModel(config)
    cn = ControlNet(config)
    b = 1
    if unet_params is None:
        x = jnp.zeros((b, config.in_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        y = (jnp.zeros((b, config.adm_in_channels), jnp.float32)
             if config.adm_in_channels else None)
        unet_params = init_params_host(module, x, jnp.zeros((b,)), ctx, y,
                                       seed=seed)
    if cn_params is None:
        x = jnp.zeros((b, config.in_channels, init_hw, init_hw), jnp.float32)
        hint = jnp.zeros((b, 3, init_hw * 8, init_hw * 8), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        y = (jnp.zeros((b, config.adm_in_channels), jnp.float32)
             if config.adm_in_channels else None)
        cn_params = init_params_host(cn, x, hint, jnp.zeros((b,)), ctx, y,
                                     seed=seed + 1)
    params = {"unet": unet_params, "cn": cn_params}

    table = EpsSigmaTable()
    log_sigmas = jnp.asarray(jnp.log(jnp.asarray(table.sigmas)), jnp.float32)

    def sigma_to_timestep(sigma):
        return jnp.interp(jnp.log(jnp.maximum(sigma, 1e-10)), log_sigmas,
                          jnp.arange(log_sigmas.shape[0], dtype=jnp.float32))

    def raw_apply(p, x, sigma, cond):
        s = _bc(sigma, x.ndim)
        x_in = x / jnp.sqrt(1.0 + s**2)
        t_disc = sigma_to_timestep(sigma)
        y = cond.get("y") if isinstance(cond, dict) else None
        ctx = cond["context"] if isinstance(cond, dict) else cond
        hint = cond.get("hint") if isinstance(cond, dict) else None
        control = None
        if hint is not None:
            control = scale_control(
                cn.apply(p["cn"], x_in, hint, t_disc, ctx, y), strength)
        eps = module.apply(p["unet"], x_in, t_disc, ctx, y, control)
        if v_prediction:
            return x / (1.0 + s**2) - s / jnp.sqrt(1.0 + s**2) * eps
        return x - s * eps

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params,
                   kind=ModelKind.EPS, sigma_table=table,
                   name=name, latent_channels=config.in_channels)
    return den, params


# --------------------------------------------------------------------------
# flow-matching DiTs (Flux family, Qwen-Image, Z-Image)


def build_dit(
    config: DiTConfig,
    params: Optional[Any] = None,
    *,
    shift: float = 1.0,
    is_flux: bool = True,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "dit",
):
    module = MMDiT(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.latent_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        vec = (jnp.zeros((b, config.vec_dim), jnp.float32)
               if config.vec_dim > 0 else None)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx, vec,
                                  seed=seed)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vec = cond.get("vec") if isinstance(cond, dict) else None
        guidance = cond.get("guidance") if isinstance(cond, dict) else None
        extra = cond.get("ref_tokens") if isinstance(cond, dict) else None
        vel = module.apply(p, x, t, ctx, vec, guidance, extra)
        return x - tb * vel  # velocity = noise - x0  =>  x0 = x - t*v

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), is_flux=is_flux,
                   name=name, latent_channels=config.latent_channels)
    return den, params


def build_flux_dev(params=None, **kw):
    return build_dit(FLUX_DEV_CONFIG, params, shift=1.15, is_flux=True,
                     name="flux-dev", **kw)


def build_flux_schnell(params=None, **kw):
    return build_dit(FLUX_SCHNELL_CONFIG, params, shift=1.0, is_flux=True,
                     name="flux-schnell", **kw)


def build_qwen_image(params=None, **kw):
    return build_dit(QWEN_IMAGE_CONFIG, params, shift=2.2, is_flux=False,
                     name="qwen-image", **kw)


def build_zimage(
    config=None,
    params: Optional[Any] = None,
    *,
    shift: float = 3.0,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "z-image",
):
    """Z-Image S3-DiT denoiser (models/zimage.py — the Lumina2/NextDiT
    graph the reference's Z_image workflows load; shift=3.0 is the
    workflow's ModelSamplingAuraFlow value)."""
    from .zimage import Z_IMAGE_S3_CONFIG, ZImageModel

    config = Z_IMAGE_S3_CONFIG if config is None else config
    module = ZImageModel(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.in_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.cap_dim), jnp.float32)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx,
                                  seed=seed)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vel = module.apply(p, x, t, ctx)
        return x - tb * vel

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), is_flux=False,
                   name=name, latent_channels=config.in_channels)
    return den, params


def build_tiny_zimage(params=None, **kw):
    from .zimage import TINY_ZIMAGE_CONFIG

    return build_zimage(TINY_ZIMAGE_CONFIG, params, name="tiny-z-image", **kw)


def build_z_image(params=None, **kw):
    """Back-compat alias: the full-size Z-Image S3-DiT."""
    return build_zimage(params=params, **kw)


def build_hyvideo(
    config=None,
    params: Optional[Any] = None,
    *,
    shift: float = 7.0,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "hunyuan-video",
):
    """HunyuanVideo DiT denoiser — the backbone behind the reference's
    "Hunyuan" workflow (example_workflows/Hunyuan_Inpaint.json), which
    samples hunyuan_video_t2v_720p as a single-frame T2I model.  Accepts
    4D (B, C, H, W) image latents (auto-unsqueezed to T=1) or 5D video
    latents.  shift=7.0 is the HunyuanVideo flow-schedule default."""
    from .hyvideo import HUNYUAN_VIDEO_720P_CONFIG, HYVideoDiT

    config = HUNYUAN_VIDEO_720P_CONFIG if config is None else config
    module = HYVideoDiT(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.in_channels, 1, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        vec = (jnp.zeros((b, config.vec_dim), jnp.float32)
               if config.vec_dim > 0 else None)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx, vec,
                                  jnp.full((b,), 6.0), seed=seed)

    def raw_apply(p, x, t, cond):
        squeeze = x.ndim == 4          # image latent -> single-frame video
        xv = x[:, :, None] if squeeze else x
        tb = _bc(t, xv.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vec = cond.get("vec") if isinstance(cond, dict) else None
        guidance = cond.get("guidance") if isinstance(cond, dict) else None
        vel = module.apply(p, xv, t, ctx, vec, guidance)
        x0 = xv - tb * vel
        return x0[:, :, 0] if squeeze else x0

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), name=name,
                   latent_channels=config.in_channels)
    return den, params


def build_tiny_hyvideo(params=None, **kw):
    from .hyvideo import TINY_HYVIDEO_CONFIG

    return build_hyvideo(TINY_HYVIDEO_CONFIG, params, name="tiny-hyvideo", **kw)


def build_flux2_dev(params=None, **kw):
    from .dit import FLUX2_DEV_CONFIG

    return build_dit(FLUX2_DEV_CONFIG, params, shift=1.15, is_flux=True,
                     name="flux2-dev", **kw)


def build_flux2_klein(params=None, **kw):
    from .dit import FLUX2_KLEIN_CONFIG

    return build_dit(FLUX2_KLEIN_CONFIG, params, shift=1.15, is_flux=False,
                     name="flux2-klein", **kw)


def build_krea2(params=None, **kw):
    """Krea 2 turbo (reference Krea2_LanPaint_Inpaint.json) — stand-in
    topology; encoder/VAE pairing per the workflow (docs/family_facts.md)."""
    from .dit import KREA2_CONFIG

    return build_dit(KREA2_CONFIG, params, shift=3.0, is_flux=False,
                     name="krea2", **kw)


def build_anima(params=None, **kw):
    """Anima preview3 (reference README.md:272-286) — stand-in topology;
    Qwen3-0.6B text features + Qwen-Image VAE per the embedded workflow."""
    from .dit import ANIMA_CONFIG

    return build_dit(ANIMA_CONFIG, params, shift=3.0, is_flux=False,
                     name="anima", **kw)


def build_tiny_dit(params=None, **kw):
    return build_dit(TINY_DIT_CONFIG, params, is_flux=False, name="tiny-dit", **kw)


# --------------------------------------------------------------------------
# HiDream-I1 MoE-MMDiT


def build_hidream(
    config=None,
    params: Optional[Any] = None,
    *,
    shift: float = 3.0,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "hidream",
):
    from .hidream import HIDREAM_I1_CONFIG, HiDreamModel

    config = HIDREAM_I1_CONFIG if config is None else config
    module = HiDreamModel(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.latent_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        vec = jnp.zeros((b, config.vec_dim), jnp.float32)
        llama = jnp.zeros((2, b, 4, config.llama_dim), jnp.float32)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx, vec,
                                  llama, seed=seed)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vec = cond.get("vec") if isinstance(cond, dict) else None
        llama = cond.get("llama") if isinstance(cond, dict) else None
        vel = module.apply(p, x, t, ctx, vec, llama)
        return x - tb * vel

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), is_flux=False,
                   name=name, latent_channels=config.latent_channels)
    return den, params


def build_tiny_hidream(params=None, **kw):
    from .hidream import TINY_HIDREAM_CONFIG

    return build_hidream(TINY_HIDREAM_CONFIG, params, name="tiny-hidream", **kw)


# --------------------------------------------------------------------------
# SD3 / SD3.5 rectified-flow MMDiT


def build_sd3(
    config: SD3Config,
    params: Optional[Any] = None,
    *,
    shift: float = 3.0,
    init_hw: int = 16,
    seed: int = 0,
    name: str = "sd3",
):
    module = SD3MMDiT(config)
    if params is None:
        b = 1
        x = jnp.zeros((b, config.in_channels, init_hw, init_hw), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        vec = jnp.zeros((b, config.vec_dim), jnp.float32)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx, vec,
                                  seed=seed)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vec = cond.get("vec") if isinstance(cond, dict) else None
        vel = module.apply(p, x, t, ctx, vec)
        return x - tb * vel

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), is_flux=False,
                   name=name, latent_channels=config.in_channels)
    return den, params


def build_sd35_large(params=None, **kw):
    return build_sd3(SD35_LARGE_CONFIG, params, name="sd3.5-large", **kw)


def build_sd35_large_turbo(params=None, **kw):
    return build_sd3(SD35_LARGE_TURBO_CONFIG, params,
                     name="sd3.5-large-turbo", **kw)


def build_sd35_medium(params=None, **kw):
    return build_sd3(SD35_MEDIUM_CONFIG, params, name="sd3.5-medium", **kw)


def build_sd3_medium(params=None, **kw):
    return build_sd3(SD3_MEDIUM_CONFIG, params, name="sd3-medium", **kw)


def build_tiny_sd3(params=None, **kw):
    return build_sd3(TINY_SD3_CONFIG, params, name="tiny-sd3", **kw)


# --------------------------------------------------------------------------
# Wan2.2 video DiT (+ high/low-noise expert pair)


def build_wan(
    config: WanConfig,
    params: Optional[Any] = None,
    *,
    shift: float = 5.0,
    init_shape=(1, 4, 16, 16),
    seed: int = 0,
    name: str = "wan",
):
    module = WanModel(config)
    if params is None:
        b = 1
        f, hh, ww = init_shape[1], init_shape[2], init_shape[3]
        x = jnp.zeros((b, config.in_channels, f, hh, ww), jnp.float32)
        ctx = jnp.zeros((b, 8, config.context_dim), jnp.float32)
        params = init_params_host(module, x, jnp.full((b,), 0.5), ctx, seed=seed)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        kvc = cond.get("kv_cache") if isinstance(cond, dict) else None
        vel = module.apply(p, x, t, ctx, kv_cache=kvc)
        return x - tb * vel

    # Run-constant cross-KV hoist (WanKVPrecompute): single-device programs
    # only — the manual shard_map TP/SP paths compute k/v inside their own
    # program and are excluded (build_wan_seq_parallel / tp wrappers pass
    # raw context).
    precompute = None
    if config.tp_axis is None and config.seq_axis is None:
        from .wan import WanKVPrecompute

        kv_module = WanKVPrecompute(config)

        def precompute(p, cond):
            if not isinstance(cond, dict) or "context" not in cond:
                return cond
            out = dict(cond)
            out["kv_cache"] = kv_module.apply(p, cond["context"])
            return out

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), name=name,
                   latent_channels=config.in_channels,
                   precompute=precompute)
    return den, params


def build_tiny_wan(params=None, **kw):
    return build_wan(TINY_WAN_CONFIG, params, name="tiny-wan", **kw)


def switching_denoiser(high: Denoiser, low: Denoiser, boundary: float = 0.875,
                       name: str = "wan22-moe") -> Denoiser:
    """Two-expert timestep-switched denoiser (Wan2.2 high-noise + low-noise
    pair, reference README.md:219-225 'high+low noise'; also the dual-model
    guider pattern of the Ideogram4 workflow, nodes.py:558-626).

    The high-noise expert handles t >= boundary.  Under jit this is a
    `lax.cond`, so only one expert executes per step.
    """
    assert high.kind == low.kind
    params = {"high": high.params, "low": low.params}

    def raw_apply(p, x, t, cond):
        use_high = jnp.mean(t) >= boundary
        return jax.lax.cond(
            use_high,
            lambda operands: high.raw_apply(p["high"], *operands),
            lambda operands: low.raw_apply(p["low"], *operands),
            (x, t, cond))

    return Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                    raw_apply=raw_apply, params=params,
                    kind=high.kind, sigma_table=high.sigma_table,
                    is_flux=high.is_flux, name=name,
                    latent_channels=high.latent_channels)


def dual_model_denoiser(positive: Denoiser, negative: Denoiser,
                        name: str = "dual-cfg") -> Denoiser:
    """Two-model CFG — the reference Ideogram4 workflow's `DualModelGuider`
    (docs/family_facts.md): the positive prediction comes from the main
    model, the negative prediction from a SEPARATE model (Ideogram4 pairs
    its conditional model with an unconditional-trained one), and CFG mixes
    across the two.  Distinct from `switching_denoiser` (timestep-routed
    experts — only one runs per step): here both run every step, one per
    CFG branch.

    Usage: put `{"model_select": jnp.ones(())}` in the NEGATIVE cond dict
    and sample with `sequential_cfg=True` — each CFG branch then executes
    exactly one model under `lax.cond` (the batched 2B CFG pass cannot
    route per-half, so the sequential double pass is required)."""
    assert positive.kind == negative.kind
    params = {"pos": positive.params, "neg": negative.params}

    def raw_apply(p, x, t, cond):
        if isinstance(cond, dict):
            sel = cond.get("model_select", jnp.zeros(()))
            inner = {k: v for k, v in cond.items() if k != "model_select"}
        else:
            sel, inner = jnp.zeros(()), cond
        sel = jnp.mean(jnp.asarray(sel, jnp.float32))
        return jax.lax.cond(
            sel > 0.5,
            lambda o: negative.raw_apply(p["neg"], *o),
            lambda o: positive.raw_apply(p["pos"], *o),
            (x, t, inner))

    return Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                    raw_apply=raw_apply, params=params,
                    kind=positive.kind, sigma_table=positive.sigma_table,
                    is_flux=positive.is_flux, name=name,
                    latent_channels=positive.latent_channels)


def build_wan_seq_parallel(
    config: WanConfig,
    params: Any,
    mesh,
    *,
    shift: float = 5.0,
    seq_axis: str = "seq",
    tp_axis: str = None,
    name: str = "wan-sp",
):
    """Sequence-parallel Wan denoiser: the forward runs inside shard_map
    with the latent frame axis sharded over `seq_axis` and self-attention
    as ring attention over ICI (parallel/ring.py — the 81-frame path,
    SURVEY.md section 5 long-context).

    Weights are replicated across the mesh (the 5B expert fits one v5e
    chip; the 14B pair wants tensor parallelism instead —
    parallel.mesh.shard_params_tp — which composes with data, not seq,
    sharding for now).  Latent batch rides the "data" axis.  The global
    frame count must divide evenly over the seq axis.
    """
    import dataclasses as _dc
    import functools as _ft

    from jax.sharding import NamedSharding, PartitionSpec as P

    tp_size = mesh.shape[tp_axis] if tp_axis else 1
    sp_cfg = _dc.replace(config, seq_axis=seq_axis,
                         tp_axis=tp_axis, tp_size=tp_size)
    module = WanModel(sp_cfg)
    if tp_axis:
        from ..parallel.mesh import wan_tp_param_specs

        pspecs = wan_tp_param_specs(params)
        params = jax.tree.map(
            lambda v, sp: jax.device_put(v, NamedSharding(mesh, sp)),
            params, pspecs)
    else:
        pspecs = P()
        params = jax.device_put(params, NamedSharding(mesh, P()))

    spec_x = P("data", None, seq_axis, None, None)

    @_ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspecs, spec_x, P("data"), P("data", None, None)),
        out_specs=spec_x)
    def fwd(p, x, t, ctx):
        return module.apply(p, x, t, ctx)

    def raw_apply(p, x, t, cond):
        tb = _bc(t, x.ndim)
        ctx = cond["context"] if isinstance(cond, dict) else cond
        vel = fwd(p, x, t, ctx)
        return x - tb * vel

    den = Denoiser(apply=lambda x, t, c: raw_apply(params, x, t, c),
                   raw_apply=raw_apply, params=params, kind=ModelKind.FLOW,
                   sigma_table=FlowSigmaTable(shift=shift), name=name,
                   latent_channels=config.in_channels)
    return den, params


# --------------------------------------------------------------------------
# checkpoint key census (the `info --census` CLI, VERDICT r3 task 8)


def family_expected_keys(family: str):
    """The full checkpoint key set each family's importer consumes.

    The census counterpart of load.import_dit_guarded: lets the first real
    checkpoint of a STRUCTURAL STAND-IN family (flux2-dev / flux2-klein /
    krea2 / anima — topologies not retrievable offline, docs/
    family_facts.md) produce an actionable key diff WITHOUT loading any
    tensor data.  Works for every family with an entry-table importer."""
    from . import load as L

    def dit(cfg):
        return L.expected_keys(L._dit_entries(cfg), "")

    if family in ("sd15", "sd21", "sdxl"):
        from .unet import SD15_CONFIG, SD21_CONFIG, SDXL_CONFIG

        cfg = {"sd15": SD15_CONFIG, "sd21": SD21_CONFIG,
               "sdxl": SDXL_CONFIG}[family]
        return L.expected_keys(L._unet_entries(cfg), "model.diffusion_model.")
    if family in ("flux-dev", "flux-schnell"):
        return dit(FLUX_DEV_CONFIG if family == "flux-dev"
                   else FLUX_SCHNELL_CONFIG)
    if family in ("flux2-dev", "flux2-klein", "krea2", "anima"):
        from .dit import ANIMA_CONFIG, FLUX2_DEV_CONFIG, FLUX2_KLEIN_CONFIG, KREA2_CONFIG

        return dit({"flux2-dev": FLUX2_DEV_CONFIG,
                    "flux2-klein": FLUX2_KLEIN_CONFIG,
                    "krea2": KREA2_CONFIG, "anima": ANIMA_CONFIG}[family])
    if family == "qwen":
        return L.qwen_expected_keys(QWEN_IMAGE_CONFIG)
    if family == "hidream":
        from .hidream import HIDREAM_I1_CONFIG

        return L.hidream_expected_keys(HIDREAM_I1_CONFIG)
    if family in ("sd35-large", "sd35-medium", "sd3-medium"):
        cfg = {"sd35-large": SD35_LARGE_CONFIG,
               "sd35-medium": SD35_MEDIUM_CONFIG,
               "sd3-medium": SD3_MEDIUM_CONFIG}[family]
        return L.expected_keys(L._sd3_entries(cfg), "model.diffusion_model.")
    if family == "zimage":
        from .zimage import Z_IMAGE_S3_CONFIG

        return L.expected_keys(L._zimage_entries(Z_IMAGE_S3_CONFIG), "")
    if family in ("wan-14b", "wan-5b"):
        from .wan import WAN22_T2V_14B_CONFIG, WAN22_TI2V_5B_CONFIG

        cfg = WAN22_T2V_14B_CONFIG if family == "wan-14b" else WAN22_TI2V_5B_CONFIG
        return L.expected_keys(L._wan_entries(cfg), "")
    if family == "hyvideo":
        from .hyvideo import HUNYUAN_VIDEO_720P_CONFIG

        return L.expected_keys(L._hyvideo_entries(HUNYUAN_VIDEO_720P_CONFIG), "")
    raise ValueError(
        f"no key census for family {family!r}; supported: sd15 sd21 sdxl "
        "flux-dev flux-schnell flux2-dev flux2-klein krea2 anima qwen "
        "hidream sd35-large sd35-medium sd3-medium zimage wan-14b wan-5b "
        "hyvideo")


def family_census(checkpoint_path: str, family: str) -> dict:
    """Header-only key census of a checkpoint vs a family's import table."""
    from . import load as L

    have = L.safetensors_header_keys(checkpoint_path)
    return L.key_census(have, family_expected_keys(family), family)
