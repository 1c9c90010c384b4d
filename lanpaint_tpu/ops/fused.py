"""Fused Pallas TPU kernels for the per-element Langevin think-step update.

The think loop's non-model work is entirely pointwise over the latent
(SURVEY.md section 7 B1): SHO/OU transition applies, the velocity kick, the
NaN-fallback selects, and the region mixing.  XLA fuses most of the arithmetic
already; what these kernels add on TPU:

* Gaussian noise is generated IN-KERNEL (pltpu.prng_random_bits + Box-Muller)
  — the jnp path materializes up to five latent-sized normal tensors per
  inner step in HBM; here they never leave VMEM.
* One kernel launch per phase (pre-model half-step / post-model finish)
  instead of several XLA fusions, with all branch coefficients prefetched to
  SMEM as per-batch scalars.

Numerical contract: identical to engine._prepare_region_params +
ops.sho.{sho_apply, ou_apply} up to the PRNG stream (Box-Muller from the TPU
PRNG vs. threefry normals).  `noise_mult=0` makes both paths exactly equal —
that is the equivalence test (tests/test_fused.py).

Layout: latents are viewed as (B, M); M must be a multiple of 128.  The grid
is (B, M // TILE_M); per-batch scalar coefficients live in SMEM via
PrefetchScalarGridSpec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 1024  # elements per program (8 fp32 sublanes x 128 lanes)

# scalar-coefficient row layout (per batch element), x-branch then y-branch:
# [wy_cy, wy_v, wv_cy, wv_v, l_yy, l_vy, l_vv, ou_decay, ou_k, ou_ns, a, sg_dt]
N_COEF = 12


def _pack_coeffs(sho, ou, a, slot11):
    """Stack per-branch coefficient [B]-vectors into a (B, N_COEF) table."""
    b = jnp.broadcast_to
    shape = jnp.shape(a)
    return jnp.stack(
        [b(sho.wy_cy, shape), b(sho.wy_v, shape), b(sho.wv_cy, shape),
         b(sho.wv_v, shape), b(sho.l_yy, shape), b(sho.l_vy, shape),
         b(sho.l_vv, shape), b(ou.decay, shape), b(ou.k, shape),
         b(ou.noise_scale, shape), b(a, shape), b(slot11, shape)], axis=-1
    ).astype(jnp.float32)


def pack_branch_coeffs(config, times):
    """(coef_x, coef_y) tables, each (B, 2*N_COEF): half-step rows followed by
    full-step rows.  Same parameterization as engine._prepare_region_params
    (the equivalence test in tests/test_fused.py guards against drift)."""
    from ..ops.sho import ou_coeffs, sho_coeffs

    abt = times.abt.astype(jnp.float32)
    one_m_abt = 1.0 - abt
    step_eff = config.step_size * one_m_abt
    dt_x = step_eff * 1.0
    dt_y = step_eff * config.beta
    gam_hat_x = config.friction**2 * config.step_size * 1.0 / 0.1 / 2.0
    gam_hat_y = config.friction**2 * config.step_size * config.beta / 0.1 / 2.0
    safe = lambda d: jnp.where(d > 0, d, 1.0)
    gamma_x = gam_hat_x / safe(dt_x)
    gamma_y = gam_hat_y / safe(dt_y)
    a_x = 1.0 / jnp.maximum(one_m_abt, 1e-20)
    a_y = (1.0 + config.lamb) / jnp.maximum(one_m_abt, 1e-20)
    d = jnp.sqrt(jnp.asarray(2.0, jnp.float32))

    def rows(gamma, a, dt):
        half = _pack_coeffs(sho_coeffs(gamma, a, d, dt / 2.0),
                            ou_coeffs(a, d, dt / 2.0), a,
                            jnp.sqrt(gamma) * dt)
        full = _pack_coeffs(sho_coeffs(gamma, a, d, dt),
                            ou_coeffs(a, d, dt), a, dt)
        return jnp.concatenate([half, full], axis=-1)

    return rows(gamma_x, a_x, dt_x), rows(gamma_y, a_y, dt_y)


def _box_muller(shape):
    """Two standard normals per element from the TPU PRNG (fp32).

    prng_random_bits yields signed int32 on hardware; bitcast to uint32
    before shifting or the sign bit smears into the uniforms (log of a
    negative -> NaN).
    """
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits -> [0, 2^24); bitcast the shifted value back to int32
    # (positive) because Mosaic lacks a uint32 -> f32 cast.
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    # uniform in (0, 1]: the +2^-25 offset keeps u1 off zero
    u1 = i1.astype(jnp.float32) * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * jnp.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _mix(cx, cy, mask):
    return cx + (cy - cx) * mask


def _sho_apply_k(co_x, co_y, mask, y0, v0, c, ey, ev, noise_mult):
    wy_cy = _mix(co_x[0], co_y[0], mask)
    wy_v = _mix(co_x[1], co_y[1], mask)
    wv_cy = _mix(co_x[2], co_y[2], mask)
    wv_v = _mix(co_x[3], co_y[3], mask)
    l_yy = _mix(co_x[4], co_y[4], mask) * noise_mult
    l_vy = _mix(co_x[5], co_y[5], mask) * noise_mult
    l_vv = _mix(co_x[6], co_y[6], mask) * noise_mult
    a = _mix(co_x[10], co_y[10], mask)
    drive = c - a * y0
    y = y0 + wy_cy * drive + wy_v * v0 + l_yy * ey
    v = wv_cy * drive + wv_v * v0 + l_vy * ey + l_vv * ev
    return y, v


def _ou_apply_k(co_x, co_y, mask, x0, c, eps, noise_mult):
    decay = _mix(co_x[7], co_y[7], mask)
    k = _mix(co_x[8], co_y[8], mask)
    ns = _mix(co_x[9], co_y[9], mask) * noise_mult
    return decay * x0 + k * c + ns * eps


def _half_kernel(seed_ref, cx_ref, cy_ref, nm_ref,
                 x_ref, v_ref, c_ref, mask_ref,
                 xh_ref, vh_ref, xho_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * 65537 + t * 131)
    cx = [cx_ref[b, i] for i in range(N_COEF)]
    cy = [cy_ref[b, i] for i in range(N_COEF)]
    nm = nm_ref[0].astype(jnp.float32)
    x = x_ref[...]
    v = v_ref[...]
    c = c_ref[...]
    mask = mask_ref[...]
    ey, ev = _box_muller(x.shape)
    vs, _ = _box_muller(x.shape)
    v_stat = vs  # D/sqrt(2) with D=sqrt(2) => unit normal
    xh_d, vh_d = _sho_apply_k(cx, cy, mask, x, v, c, ey, ev, nm)
    xh_o = _ou_apply_k(cx, cy, mask, x, c, ey, nm)
    bad = ~(jnp.isfinite(xh_d) & jnp.isfinite(vh_d))
    xh_ref[...] = jnp.where(bad, xh_o, xh_d)
    vh_ref[...] = jnp.where(bad, v_stat * nm, vh_d)
    xho_ref[...] = xh_o


def _finish_kernel(seed_ref, cx_ref, cy_ref, nm_ref, warm_ref,
                   x_in_ref, xh_ref, vh_ref, xho_ref, co_ref, cn_ref, mask_ref,
                   x_out_ref, v_out_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * 65537 + t * 131)
    cx = [cx_ref[b, i] for i in range(N_COEF)]
    cy = [cy_ref[b, i] for i in range(N_COEF)]
    # full-step coefficient rows are appended after the half-step rows
    fx = [cx_ref[b, N_COEF + i] for i in range(N_COEF)]
    fy = [cy_ref[b, N_COEF + i] for i in range(N_COEF)]
    nm = nm_ref[0].astype(jnp.float32)
    warm = warm_ref[0] > 0

    x_in = x_in_ref[...]
    xh = xh_ref[...]
    vh = vh_ref[...]
    xh_o = xho_ref[...]
    c_old = co_ref[...]
    c_new = cn_ref[...]
    mask = mask_ref[...]

    ey2, ev2 = _box_muller(x_in.shape)
    vs, _ = _box_muller(x_in.shape)
    v_stat = vs * nm

    # slot 11: half rows carry sqrt(gamma)*dt (velocity-kick scale), full rows
    # carry plain dt (overdamped position-kick scale) — see _pack_coeffs use.
    sg_dt = _mix(cx[11], cy[11], mask)
    # warm: kick + second half-step with old C
    v_kick = vh + sg_dt * (c_new - c_old)
    xf_d, vf_d = _sho_apply_k(cx, cy, mask, xh, v_kick, c_old, ey2, ev2, nm)
    xk_o = xh_o + _mix(fx[11], fy[11], mask) * (c_new - c_old)
    xf_o = _ou_apply_k(cx, cy, mask, xk_o, c_old, ey2, nm)
    bad_f = ~(jnp.isfinite(xf_d) & jnp.isfinite(vf_d))
    x_warm = jnp.where(bad_f, xf_o, xf_d)
    v_warm = jnp.where(bad_f, v_stat, vf_d)

    # cold: one full step from x_in with fresh C (reuse ey2/ev2 stream)
    xc_d, vc_d = _sho_apply_k(fx, fy, mask, x_in, v_stat, c_new, ey2, ev2, nm)
    xc_o = _ou_apply_k(fx, fy, mask, x_in, c_new, ey2, nm)
    bad_c = ~(jnp.isfinite(xc_d) & jnp.isfinite(vc_d))
    x_cold = jnp.where(bad_c, xc_o, xc_d)
    v_cold = jnp.where(bad_c, v_stat, vc_d)

    x_out_ref[...] = jnp.where(warm, x_warm, x_cold)
    v_out_ref[...] = jnp.where(warm, v_warm, v_cold)


ROW_TILE = 8  # fp32 sublane count; block = (1, ROW_TILE, 128) = 1024 elements


def _grid_spec(n_scalar, b, rows, n_in, n_out):
    """Grid over (batch, row-tiles) of a (B, rows, 128) view of the latent.

    Mosaic requires the last two block dims to be (8k, 128)-aligned; a flat
    (1, TILE) block violates the sublane constraint, so the latent is viewed
    as (B, M//128, 128) and tiled over rows.
    """
    r_tile = min(ROW_TILE, rows)
    block = pl.BlockSpec((1, r_tile, 128), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(b, rows // r_tile),
        in_specs=[block] * n_in,
        out_specs=[block] * n_out if n_out > 1 else block,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_half_step(seed, coef_x, coef_y, noise_mult, x, v, c, mask,
                    interpret: bool = False):
    interpret = pltpu.InterpretParams() if interpret is True else interpret
    """Pre-model phase: damped+overdamped half-step with fallback select.

    x, v, c, mask: (B, M) fp32 with M % 128 == 0.
    coef_x/coef_y: (B, 2*N_COEF) half-step rows then full-step rows.
    Returns (x_half, v_half, x_half_overdamped).
    """
    b, m = x.shape
    rows = m // 128
    r3 = lambda a: a.reshape(b, rows, 128)
    out_shape = [jax.ShapeDtypeStruct((b, rows, 128), jnp.float32)] * 3
    outs = pl.pallas_call(
        _half_kernel,
        grid_spec=_grid_spec(4, b, rows, 4, 3),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), coef_x, coef_y,
      jnp.asarray([noise_mult], jnp.float32), r3(x), r3(v), r3(c), r3(mask))
    return tuple(o.reshape(b, m) for o in outs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_finish(seed, coef_x, coef_y, noise_mult, warm,
                 x_in, x_half, v_half, x_half_od, c_old, c_new, mask,
                 interpret: bool = False):
    interpret = pltpu.InterpretParams() if interpret is True else interpret
    """Post-model phase: kick + second half (warm) / full cold step + selects."""
    b, m = x_in.shape
    rows = m // 128
    r3 = lambda a: a.reshape(b, rows, 128)
    out_shape = [jax.ShapeDtypeStruct((b, rows, 128), jnp.float32)] * 2
    outs = pl.pallas_call(
        _finish_kernel,
        grid_spec=_grid_spec(5, b, rows, 7, 2),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), coef_x, coef_y,
      jnp.asarray([noise_mult], jnp.float32), jnp.asarray([warm], jnp.int32),
      r3(x_in), r3(x_half), r3(v_half), r3(x_half_od), r3(c_old), r3(c_new),
      r3(mask))
    return tuple(o.reshape(b, m) for o in outs)
