"""LanPaint inner "think loop": masked Langevin dynamics as one XLA program.

TPU-native rebuild of the reference sampler core
(reference src/LanPaint/lanpaint.py:40-288 and earlystop.py), with the
architectural inversions SURVEY.md section 7 calls for:

* the eager Python `for i in range(n_steps)` with a data-dependent `break`
  becomes a `lax.while_loop` — early stopping genuinely skips model forwards
  on device, with zero `.item()` host syncs (the reference pays a device->host
  sync per inner step, earlystop.py:55);
* the exception-driven NaN -> overdamped retry (lanpaint.py:241-250) becomes a
  branchless per-element `jnp.where(isfinite, damped, overdamped)` select that
  reuses the same model call (the reference re-runs the whole step; ours is
  per-element and never doubles the model cost);
* torch global-RNG draws become threaded `jax.random` keys with a documented
  per-iteration draw order (docs/rng.md);
* the SHO transcendental coefficients are evaluated on TWO per-batch scalars
  (known / unknown branch) and mixed by mask afterwards, instead of the
  reference's full-latent-shaped transcendental tensors — the per-element hot
  path is pure multiply-add, ideal for the fused Pallas kernel
  (lanpaint_tpu.ops.fused).

Math preserved exactly: step-size/friction/lambda parameterization
(lanpaint.py:255-288), bidirectional score (lanpaint.py:125-141), Strang-like
split with velocity kick (lanpaint.py:211-225), early-stop metric with
boundary ring, drift anchor, abt-scaled threshold and patience+1 semantics
(earlystop.py:97-101, 273-311).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .config import LanPaintConfig, ModelKind
from .ops.sho import ou_apply, ou_coeffs, sho_apply, sho_coeffs, SHOCoeffs, OUCoeffs
from .schedule import Times, bcast_to, from_vp, noise_scaling, to_vp, vp_to_model_coords

TRACE_WIDTH = 8  # [inner_step, dist, dist_inpaint, dist_ring, dist_drift,
#                  threshold_used, patience_counter, stopped]


class StopState(NamedTuple):
    patience: jnp.ndarray      # int32 scalar
    anchor: jnp.ndarray        # x0-shaped drift anchor
    anchor_valid: jnp.ndarray  # bool scalar
    stopped: jnp.ndarray       # bool scalar


class ThinkCarry(NamedTuple):
    i: jnp.ndarray             # int32 langevin-iteration counter
    x_t: jnp.ndarray           # VP-space latent (fp32)
    v: jnp.ndarray             # Langevin velocity (fp32)
    c: jnp.ndarray             # drift coefficient C (fp32)
    x0: jnp.ndarray            # last region-mixed x0 estimate (fp32)
    out: jnp.ndarray           # final blended x0 (set on the final iteration)
    finished: jnp.ndarray      # bool: final denoise done, loop exits
    stop: StopState
    trace: jnp.ndarray         # (n_steps_max, TRACE_WIDTH) fp32


class ThinkAux(NamedTuple):
    steps_done: jnp.ndarray    # int32: model forwards actually spent
    trace: jnp.ndarray         # per-inner-step semantic-stop trace


def _mix(a, b, mask):
    """Region mix: a on the unknown region, b on the known region."""
    return a + (b - a) * mask


def _mix_sho(cx: SHOCoeffs, cy: SHOCoeffs, mask) -> SHOCoeffs:
    return SHOCoeffs(*(_mix(a, b, mask) for a, b in zip(cx, cy)))


def _mix_ou(cx: OUCoeffs, cy: OUCoeffs, mask) -> OUCoeffs:
    return OUCoeffs(*(_mix(a, b, mask) for a, b in zip(cx, cy)))


def _wmse(a, b, w):
    """Weighted MSE in fp32 (reference earlystop.py:52-55, minus the .item())."""
    d = (a - b).astype(jnp.float32)
    return jnp.sum(d * d * w) / (jnp.sum(w) + 1e-12)


def _abt_scale(abt_val):
    """4*a*(1-a) clipped to [0,1] (reference earlystop.py:21-29)."""
    a = jnp.clip(abt_val, 0.0, 1.0)
    return jnp.clip(4.0 * a * (1.0 - a), 0.0, 1.0)


def boundary_ring_weight(latent_mask, inpaint_weight):
    """4-neighbor boundary: unknown pixels adjacent to known pixels.

    Only defined for 4D (B, C, H, W) masks; video (5D) has no ring, matching
    the reference (earlystop.py:32-49).  Returns None for non-4D.
    """
    if latent_mask.ndim != 4:
        return None
    known = latent_mask > 0.5
    nb = jnp.zeros_like(known)
    nb = nb.at[:, :, 1:, :].set(nb[:, :, 1:, :] | known[:, :, :-1, :])
    nb = nb.at[:, :, :-1, :].set(nb[:, :, :-1, :] | known[:, :, 1:, :])
    nb = nb.at[:, :, :, 1:].set(nb[:, :, :, 1:] | known[:, :, :, :-1])
    nb = nb.at[:, :, :, :-1].set(nb[:, :, :, :-1] | known[:, :, :, 1:])
    ring = (~known) & nb
    return ring.astype(jnp.float32) * inpaint_weight


class _RegionParams(NamedTuple):
    """Mask-mixed per-element Langevin parameters + per-branch scalars."""

    a: jnp.ndarray          # harmonic strength, mask-mixed, [B,1,..] broadcastable
    dt: jnp.ndarray         # half the reference's dtx (i.e. the actual step)
    sqrt_gamma_dt: jnp.ndarray  # sqrt(Gamma)*dt for the velocity kick
    d: jnp.ndarray          # noise amplitude (sqrt(2))
    sho_half: SHOCoeffs     # transition over dt/2
    sho_full: SHOCoeffs     # transition over dt
    ou_half: OUCoeffs
    ou_full: OUCoeffs
    dt_pos: jnp.ndarray     # bool scalar: mean step > 0


def _prepare_region_params(config: LanPaintConfig, times: Times, mask, ndim: int) -> _RegionParams:
    """Step sizes, friction, and SHO/OU coefficients for both regions.

    Parameterization from reference lanpaint.py:255-288:
        dt_branch   = step_size * (1 - abt) * sigma_branch
        Gamma_hat   = friction^2 * step_size * sigma_branch / 0.1 / 2
        Gamma       = Gamma_hat / dt_branch
        A_x         = 1 / (1 - abt);  A_y = (1 + lambda) / (1 - abt)
        D           = sqrt(2)
    where sigma_x = 1 and sigma_y = beta (lanpaint.py:142-147).  All
    coefficients are computed on [B]-shaped scalars per branch and the
    *results* are mask-mixed — never full-latent transcendentals.
    """
    abt = times.abt.astype(jnp.float32)
    one_m_abt = 1.0 - abt
    step_eff = config.step_size * one_m_abt        # [B]

    sig_x = 1.0
    sig_y = config.beta
    dt_x = step_eff * sig_x
    dt_y = step_eff * sig_y
    gam_hat_x = config.friction**2 * config.step_size * sig_x / 0.1 / 2.0
    gam_hat_y = config.friction**2 * config.step_size * sig_y / 0.1 / 2.0
    # Gamma = Gamma_hat / dt; guard dt=0 (abt=1) — the loop is skipped then.
    safe = lambda d: jnp.where(d > 0, d, 1.0)
    gamma_x = gam_hat_x / safe(dt_x)
    gamma_y = gam_hat_y / safe(dt_y)
    a_x = 1.0 / jnp.maximum(one_m_abt, 1e-20)
    a_y = (1.0 + config.lamb) / jnp.maximum(one_m_abt, 1e-20)
    d_noise = jnp.sqrt(jnp.asarray(2.0, jnp.float32))

    sho_half_x = sho_coeffs(gamma_x, a_x, d_noise, dt_x / 2.0)
    sho_half_y = sho_coeffs(gamma_y, a_y, d_noise, dt_y / 2.0)
    sho_full_x = sho_coeffs(gamma_x, a_x, d_noise, dt_x)
    sho_full_y = sho_coeffs(gamma_y, a_y, d_noise, dt_y)
    ou_half_x = ou_coeffs(a_x, d_noise, dt_x / 2.0)
    ou_half_y = ou_coeffs(a_y, d_noise, dt_y / 2.0)
    ou_full_x = ou_coeffs(a_x, d_noise, dt_x)
    ou_full_y = ou_coeffs(a_y, d_noise, dt_y)

    bc = lambda t: bcast_to(t, ndim)
    bc_coeffs = lambda co: type(co)(*(bc(f) for f in co))

    a = _mix(bc(a_x), bc(a_y), mask)
    dt = _mix(bc(dt_x), bc(dt_y), mask)
    sqrt_gamma_dt = _mix(bc(jnp.sqrt(gamma_x) * dt_x), bc(jnp.sqrt(gamma_y) * dt_y), mask)
    return _RegionParams(
        a=a,
        dt=dt,
        sqrt_gamma_dt=sqrt_gamma_dt,
        d=jnp.broadcast_to(d_noise, ()),
        sho_half=_mix_sho(bc_coeffs(sho_half_x), bc_coeffs(sho_half_y), mask),
        sho_full=_mix_sho(bc_coeffs(sho_full_x), bc_coeffs(sho_full_y), mask),
        ou_half=_mix_ou(bc_coeffs(ou_half_x), bc_coeffs(ou_half_y), mask),
        ou_full=_mix_ou(bc_coeffs(ou_full_x), bc_coeffs(ou_full_y), mask),
        dt_pos=jnp.mean(dt_x) > 0.0,
    )


def lanpaint_update(
    denoise: Callable[[jnp.ndarray, jnp.ndarray], tuple],
    x: jnp.ndarray,
    *,
    latent_image: jnp.ndarray,
    noise: jnp.ndarray,
    latent_mask: jnp.ndarray,
    sigma: jnp.ndarray,
    times: Times,
    n_steps: jnp.ndarray,
    config: LanPaintConfig,
    kind: ModelKind,
    key: jax.Array,
    noise_feed: jnp.ndarray = None,
):
    """One outer-denoising-step LanPaint update (think loop + final denoise).

    Equivalent of `LanPaint.__call__` -> `LanPaint.LanPaint`
    (reference lanpaint.py:40-123).  `x` is the sampler-native latent,
    `latent_mask` is 1 on the KNOWN region, `n_steps` may be a traced int32
    (the outer early stop passes 0).  Returns
    (denoised_blend, x_refined, ThinkAux): the blended x0 prediction, the
    Langevin-refined sampler-native latent the outer solver must continue
    from (replacing the reference's in-place `input_x.copy_`,
    lanpaint.py:122), and device-side diagnostics.

    `noise_feed` (parity/replay mode): (n_max, 5, *x.shape) standard-normal
    draws consumed instead of the PRNG, in the documented order
    (docs/rng.md: eps_y1, eps_v1, eps_y2, eps_v2, v_stat per inner step).
    Record the reference's torch draws and feed them here for seed-for-seed
    comparison (SURVEY section 7 "hard parts": torch global RNG makes direct
    seed parity impossible; replay is the sanctioned mechanism).  Forces the
    jnp (non-fused) path.
    """
    in_dtype = x.dtype
    ndim = x.ndim
    xf = x.astype(jnp.float32)
    latent_f = latent_image.astype(jnp.float32)
    mask = latent_mask.astype(jnp.float32)

    k_noise, k_loop = jax.random.split(key)
    # Zero noise (e.g. add_noise=disable) is regenerated so the replace step
    # still injects schedule-consistent randomness (reference lanpaint.py:44-45).
    noise_f = noise.astype(jnp.float32)
    noise_zero = jnp.mean(jnp.abs(noise_f)) < 1e-8
    noise_f = jnp.where(
        noise_zero, jax.random.normal(k_noise, noise_f.shape, jnp.float32), noise_f
    )

    # Replace step: re-noise the known region to its schedule-consistent value.
    known_xt = noise_scaling(kind, times.ve_sigma if kind is ModelKind.EPS else times.flow_t,
                             noise_f, latent_f)
    xf = xf * (1.0 - mask) + known_xt * mask

    # Native -> variance-preserving coordinates for the Langevin dynamics.
    x_t = to_vp(kind, xf, times, ndim)

    params = _prepare_region_params(config, times, mask, ndim)
    abt_b = bcast_to(times.abt.astype(jnp.float32), ndim)
    lamb = config.lamb

    # Fused Pallas path (TPU only): pointwise update phases run as two kernels
    # with in-kernel PRNG; coefficient tables prefetched to SMEM.  Replay
    # mode needs the explicit draws, so it takes the jnp path.
    use_fused = (config.use_fused_kernels and noise_feed is None
                 and jax.default_backend() == "tpu")
    if use_fused:
        from .ops import fused as _fused

        coef_x, coef_y = _fused.pack_branch_coeffs(config, times)
        batch = x_t.shape[0]
        m_flat = int(np.prod(x_t.shape[1:]))
        m_pad = -(-m_flat // _fused.TILE_M) * _fused.TILE_M

        def _to2d(a):
            a2 = a.reshape(batch, m_flat)
            if m_pad != m_flat:
                a2 = jnp.pad(a2, ((0, 0), (0, m_pad - m_flat)))
            return a2

        def _from2d(a2):
            return a2[:, :m_flat].reshape(x_t.shape)

        mask2 = _to2d(mask)
        seed_base = jax.random.randint(jax.random.fold_in(k_loop, 0xF5),
                                       (), 0, 2**31 - 1, jnp.int32)

    def score_to_c(x_eval, x0, x0_big):
        """Bidirectional score -> drift C (lanpaint.py:125-141, 174-177)."""
        x0 = x0.astype(jnp.float32)
        x0_big = x0_big.astype(jnp.float32)
        score_x = -(x_eval - x0)
        score_y = -(1.0 + lamb) * (x_eval - latent_f) + lamb * (x_eval - x0_big)
        score = _mix(score_x, score_y, mask)
        x0_eff = x_eval + score
        c = (jnp.sqrt(abt_b) * x0_eff - x_eval) / jnp.maximum(1.0 - abt_b, 1e-20) \
            + params.a * x_eval
        return c, x0_eff

    # ---- semantic early stop precomputation (device-side) ----
    # `record_trace` computes (and records) the stop metrics even when the
    # stop itself is disabled (threshold 0) — the device-side equivalent of
    # supplying model_options["lanpaint_semantic_trace"] to the reference
    # (earlystop.py:121-131): trace rows are appended regardless of whether
    # the stopper fires.  stop_enabled still requires threshold > 0.
    semantic = config.semantic_stop_possible or config.record_trace
    w_inpaint = (1.0 - mask).astype(jnp.float32)
    w_ring = boundary_ring_weight(mask, w_inpaint) if semantic else None
    if semantic:
        threshold_eff = config.inner_threshold * _abt_scale(jnp.mean(times.abt))
        stop_enabled = (threshold_eff > 0.0) & (jnp.sum(w_inpaint) > 1e-6)
    else:
        threshold_eff = jnp.float32(0.0)
        stop_enabled = jnp.asarray(False)
    patience_eff = config.patience_eff

    n_max = max(config.n_steps, 1)
    trace0 = jnp.zeros((n_max, TRACE_WIDTH), jnp.float32)
    zero = jnp.zeros_like(x_t)
    carry0 = ThinkCarry(
        i=jnp.int32(0),
        x_t=x_t,
        v=zero,
        c=zero,
        x0=zero,
        out=zero,
        finished=jnp.asarray(False),
        stop=StopState(
            patience=jnp.int32(0),
            anchor=zero,
            anchor_valid=jnp.asarray(False),
            stopped=jnp.asarray(False),
        ),
        trace=trace0,
    )

    n_steps = jnp.minimum(jnp.asarray(n_steps, jnp.int32), n_max)

    # The final denoise runs as the loop's LAST iteration (is_final below)
    # instead of as a second model call site after the loop: the whole
    # lanpaint_update then contains exactly ONE instance of the backbone in
    # the compiled program — with the reference structure (loop + separate
    # final forward, lanpaint.py:117) the backbone is compiled twice, which
    # (measured) multiplies TPU compile time.

    def cond_fn(carry: ThinkCarry):
        return ~carry.finished

    def body_fn(carry: ThinkCarry) -> ThinkCarry:
        i = carry.i
        warm = i > 0
        x_t_in, v_in, c_old = carry.x_t, carry.v, carry.c
        is_final = (i >= n_steps) | carry.stop.stopped | (~params.dt_pos)

        if use_fused:
            x2, v2, c2 = _to2d(x_t_in), _to2d(v_in), _to2d(c_old)
            xh2, vh2, xho2 = _fused.fused_half_step(
                seed_base + 2 * i, coef_x, coef_y, 1.0, x2, v2, c2, mask2)
            xh = _from2d(xh2)
        else:
            shape = carry.x_t.shape
            if noise_feed is not None:
                feed = jax.lax.dynamic_index_in_dim(
                    noise_feed.astype(jnp.float32),
                    jnp.minimum(i, noise_feed.shape[0] - 1), keepdims=False)
                eps_y1, eps_v1, eps_y2, eps_v2, eps_v0 = (
                    feed[j] for j in range(5))
            else:
                k_i = jax.random.fold_in(k_loop, i)
                k_y1, k_v1, k_y2, k_v2, k_v0 = jax.random.split(k_i, 5)
                eps_y1 = jax.random.normal(k_y1, shape, jnp.float32)
                eps_v1 = jax.random.normal(k_v1, shape, jnp.float32)
                eps_y2 = jax.random.normal(k_y2, shape, jnp.float32)
                eps_v2 = jax.random.normal(k_v2, shape, jnp.float32)
                eps_v0 = jax.random.normal(k_v0, shape, jnp.float32)
            # Stationary velocity ~ N(0, D^2/2) (reference utils.py:253-254);
            # used for the cold start and as the fallback v where damped NaN'd.
            v_stat = eps_v0 * params.d / jnp.sqrt(2.0)

            # -- warm path: half-step (old C) -> model -> kick -> half-step
            xh_d, vh_d = sho_apply(params.sho_half, x_t_in, v_in, params.a, c_old, eps_y1, eps_v1)
            xh_o = ou_apply(params.ou_half, x_t_in, c_old, eps_y1)
            bad_h = ~(jnp.isfinite(xh_d) & jnp.isfinite(vh_d))
            xh = jnp.where(bad_h, xh_o, xh_d)
            vh = jnp.where(bad_h, v_stat, vh_d)

        # Single model call per iteration — the ONLY backbone call site:
        # langevin cold step evaluates at x_t, warm at the half-point
        # (reference lanpaint.py:214 vs :220), final at x_t (lanpaint.py:117).
        x_eval = jnp.where(warm & ~is_final, xh, x_t_in)
        x_model, t_model = vp_to_model_coords(kind, x_eval, times, ndim)
        x0_raw, x0_big = denoise(x_model, t_model)
        out_final = x0_raw.astype(jnp.float32) * (1.0 - mask) + latent_f * mask
        c_new, x0_eff = score_to_c(x_eval, x0_raw, x0_big)

        if use_fused:
            xn2, vn2 = _fused.fused_finish(
                seed_base + 2 * i + 1, coef_x, coef_y, 1.0,
                warm.astype(jnp.int32), x2, xh2, vh2, xho2, c2,
                _to2d(c_new), mask2)
            x_new, v_new = _from2d(xn2), _from2d(vn2)
        else:
            # warm finish
            v_kick = vh + params.sqrt_gamma_dt * (c_new - c_old)
            xf_d, vf_d = sho_apply(params.sho_half, xh, v_kick, params.a, c_old, eps_y2, eps_v2)
            xk_o = xh_o + (c_new - c_old) * params.dt
            xf_o = ou_apply(params.ou_half, xk_o, c_old, eps_y2)
            bad_f = bad_h | ~(jnp.isfinite(xf_d) & jnp.isfinite(vf_d))
            x_warm = jnp.where(bad_f, xf_o, xf_d)
            v_warm = jnp.where(bad_f, v_stat, vf_d)

            # cold start: one full step with the freshly evaluated C
            xc_d, vc_d = sho_apply(params.sho_full, x_t_in, v_stat, params.a, c_new, eps_y1, eps_v1)
            xc_o = ou_apply(params.ou_full, x_t_in, c_new, eps_y1)
            bad_c = ~(jnp.isfinite(xc_d) & jnp.isfinite(vc_d))
            x_cold = jnp.where(bad_c, xc_o, xc_d)
            v_cold = jnp.where(bad_c, v_stat, vc_d)

            x_new = jnp.where(warm, x_warm, x_cold)
            v_new = jnp.where(warm, v_warm, v_cold)

        # ---- semantic early stop (earlystop.py:238-313) ----
        stop = carry.stop
        trace = carry.trace
        if semantic:
            if config.distance_fn is not None:
                ctx = {"step": i, "n_steps": n_steps, "mask": mask,
                       "latent_image": latent_f, "times": times}
                dist = jnp.asarray(config.distance_fn(x_t_in, x_new, ctx), jnp.float32)
                threshold_used = jnp.float32(config.inner_threshold)
                d_in = d_ring = d_drift = jnp.float32(0.0)
                # custom metric: no drift guard
                below = dist <= threshold_used
                patience = jnp.where(below, stop.patience + 1, 0)
                anchor, anchor_valid = stop.anchor, stop.anchor_valid
            else:
                d_in_x0 = _wmse(x0_eff, carry.x0, w_inpaint)
                d_ring = (_wmse(x0_eff, carry.x0, w_ring)
                          if w_ring is not None else d_in_x0)
                d_x0 = jnp.maximum(d_in_x0, d_ring)
                d_xt = _wmse(x_new, x_t_in, w_inpaint)
                dist = jnp.where(warm, d_x0, d_xt)
                d_in = jnp.where(warm, d_in_x0, d_xt)
                threshold_used = threshold_eff
                below0 = dist <= threshold_used
                # Drift anchor (earlystop.py:295-305): on the first stable
                # step record x0; afterwards fold in drift-from-anchor.
                drift_in = _wmse(x0_eff, stop.anchor, w_inpaint)
                drift_ring = (_wmse(x0_eff, stop.anchor, w_ring)
                              if w_ring is not None else drift_in)
                d_drift = jnp.maximum(drift_in, drift_ring)
                dist = jnp.where(below0 & stop.anchor_valid,
                                 jnp.maximum(dist, d_drift), dist)
                anchor = jnp.where(below0 & ~stop.anchor_valid, x0_eff, stop.anchor)
                anchor_valid0 = jnp.where(below0, stop.anchor_valid | below0,
                                          jnp.asarray(False))
                below = dist <= threshold_used
                patience = jnp.where(below, stop.patience + 1, 0)
                anchor_valid = jnp.where(below, anchor_valid0, jnp.asarray(False))
            stopped = stop_enabled & (patience >= patience_eff)
            patience = jnp.where(stop_enabled, patience, 0)
            row = jnp.stack([
                (i + 1).astype(jnp.float32), dist, d_in, d_ring, d_drift,
                threshold_used, patience.astype(jnp.float32),
                stopped.astype(jnp.float32),
            ])
            trace_upd = lax.dynamic_update_slice(trace, row[None, :], (i, 0))
            trace = jnp.where(is_final, trace, trace_upd)
            stop = StopState(
                patience=jnp.where(is_final, carry.stop.patience, patience),
                anchor=jnp.where(is_final, carry.stop.anchor, anchor),
                anchor_valid=jnp.where(is_final, carry.stop.anchor_valid,
                                       anchor_valid),
                stopped=jnp.where(is_final, carry.stop.stopped, stopped),
            )

        # Final iteration: keep the langevin state, record the blended x0.
        return ThinkCarry(
            i=jnp.where(is_final, i, i + 1),
            x_t=jnp.where(is_final, x_t_in, x_new),
            v=jnp.where(is_final, v_in, v_new),
            c=jnp.where(is_final, c_old, c_new),
            x0=jnp.where(is_final, carry.x0, x0_eff),
            out=jnp.where(is_final, out_final, carry.out),
            finished=is_final,
            stop=stop,
            trace=trace,
        )

    final = lax.while_loop(cond_fn, body_fn, carry0)

    # VP -> native coords (lanpaint.py:110-113); the final denoise + blend
    # already happened inside the loop's last iteration.
    x_out = from_vp(kind, final.x_t, times, ndim)
    out = final.out

    aux = ThinkAux(steps_done=final.i, trace=final.trace)
    return out.astype(in_dtype), x_out.astype(in_dtype), aux
