"""Golden tests for the stable special functions against mpmath.

Each function has an exact closed form; we evaluate it at 50-digit precision
with mpmath over a grid spanning the Taylor-fallback region, the oscillatory
(Delta < 0) regime, and the large-argument regime, and require the fp32 jnp
implementation to match to ~1e-4 relative (fp32 round-off dominated).

The reference has no such golden suite (its utils.py is only exercised
indirectly); this is the "golden tests vs recorded reference values" item of
SURVEY.md section 7 B1, realized against the mathematical definitions.
"""

import jax
import jax.numpy as jnp
import mpmath as mp
import numpy as np
import pytest

from lanpaint_tpu.ops import stable

mp.mp.dps = 50

GAMMA_T = [1e-6, 1e-4, 1e-2, 0.05, 0.1, 0.5, 1.0, 3.0, 10.0, 30.0, 80.0]
DELTA = [-25.0, -4.0, -1.0, -0.1, -1e-3, 1e-3, 0.1, 0.5, 0.9, 0.999, 1.0 - 1e-6]


def _exact_epxm1_x(x):
    return (mp.expm1(x)) / x if x != 0 else mp.mpf(1)


def _exact_epxm1mx_x2(x):
    return (mp.expm1(x) - x) / x**2 if x != 0 else mp.mpf("0.5")


def _exact_expm1mxmhx2_x3(x):
    return (mp.expm1(x) - x - x**2 / 2) / x**3 if x != 0 else mp.mpf(1) / 6


def _sqrt_delta(d):
    return mp.sqrt(mp.mpf(d))  # imaginary for d < 0; mpmath handles complex


def _exact_exp_1mcosh_GD(g, d):
    g, d = mp.mpf(g), mp.mpf(d)
    if g == 0:
        return -mp.exp(-g) / 2
    val = mp.e**(-g) * (1 - mp.cosh(g * _sqrt_delta(d))) / (g**2 * d)
    return mp.re(val)


def _exact_exp_sinh_GsqrtD(g, d):
    g, d = mp.mpf(g), mp.mpf(d)
    z = g * _sqrt_delta(d)
    if z == 0:
        return mp.exp(-g)
    return mp.re(mp.e**(-g) * mp.sinh(z) / z)


def _exact_exp_cosh(g, d):
    return mp.re(mp.e**(-mp.mpf(g)) * mp.cosh(mp.mpf(g) * _sqrt_delta(d)))


def _exact_exp_sinh_sqrtD(g, d):
    sd = _sqrt_delta(d)
    if sd == 0:
        return mp.mpf(g) * mp.e**(-mp.mpf(g))
    return mp.re(mp.e**(-mp.mpf(g)) * mp.sinh(mp.mpf(g) * sd) / sd)


def _exact_zeta1(g, d):
    g, d = mp.mpf(g), mp.mpf(d)
    h = g / 2
    num = 1 - (_exact_exp_cosh(h, d) + _exact_exp_sinh_sqrtD(h, d))
    den = g * (1 - d) / 4
    if den == 0:
        return _exact_epxm1_x(-g)
    return 1 - num / den


def _exact_zeta2(g, d):
    return _exact_exp_sinh_GsqrtD(mp.mpf(g) / 2, d)


def _exact_sig11(g, d):
    g = mp.mpf(g)
    return 1 - mp.e**(-g) + g**2 * _exact_exp_1mcosh_GD(g, d) + _exact_exp_sinh_sqrtD(g, d)


def _exact_sig22(g, d):
    g = mp.mpf(g)
    return 1 - _exact_zeta1(2 * g, d) + 2 * g * _exact_exp_1mcosh_GD(g, d)


def _check(fn, exact_fn, args_list, rtol=2e-4, atol=2e-6):
    """Check fp32 at the given tolerance AND fp64 at tight tolerance.

    The fp64 pass proves the formulas are correct; the fp32 pass documents the
    achievable precision of the production dtype (the reference runs the same
    algebra in an fp32 autocast island, lanpaint.py:158, with identical
    round-off near the Taylor crossovers).
    """
    xs = np.array([a if isinstance(a, tuple) else (a,) for a in args_list], dtype=np.float64)
    cols32 = [jnp.asarray(xs[:, i], dtype=jnp.float32) for i in range(xs.shape[1])]
    want = np.array([float(exact_fn(*row)) for row in xs])
    got32 = np.asarray(fn(*cols32), dtype=np.float64)
    np.testing.assert_allclose(got32, want, rtol=rtol, atol=atol, err_msg=f"fp32 {fn}")
    with jax.enable_x64():
        cols64 = [jnp.asarray(xs[:, i], dtype=jnp.float64) for i in range(xs.shape[1])]
        got64 = np.asarray(fn(*cols64), dtype=np.float64)
    # fp64 tolerance is bounded below by the *designed* Taylor truncation error
    # at the branch thresholds (e.g. x^4/720 ~ 1.4e-7 at |x| = 0.1), which the
    # reference series share.
    np.testing.assert_allclose(got64, want, rtol=2e-5, atol=1e-7, err_msg=f"fp64 {fn}")


@pytest.mark.parametrize(
    "fn,exact",
    [
        (stable.epxm1_x, _exact_epxm1_x),
        (stable.epxm1mx_x2, _exact_epxm1mx_x2),
        (stable.expm1mxmhx2_x3, _exact_expm1mxmhx2_x3),
    ],
)
def test_expm1_family(fn, exact):
    xs = [-20.0, -5.0, -1.0, -0.1, -1e-3, -1e-6, 1e-6, 1e-3, 0.1, 1.0, 5.0]
    _check(fn, exact, xs)


@pytest.mark.parametrize(
    "fn,exact,rtol",
    [
        (stable.exp_1mcosh_GD, _exact_exp_1mcosh_GD, 5e-4),
        (stable.exp_sinh_GsqrtD, _exact_exp_sinh_GsqrtD, 5e-4),
        (stable.exp_cosh, _exact_exp_cosh, 5e-4),
        (stable.exp_sinh_sqrtD, _exact_exp_sinh_sqrtD, 5e-4),
        (stable.zeta1, _exact_zeta1, 1e-2),
        (stable.zeta2, _exact_zeta2, 5e-4),
        (stable.sig11, _exact_sig11, 2e-3),
        # sig22 = (1 - zeta1(2g)) + ... cancels catastrophically in fp32 for
        # small gamma_t (abs err ~2e-4; the reference's fp32 autocast shares
        # this); the fp64 pass inside _check holds it to 2e-5 relative.  The
        # integrator clamps cov_yy to 1e-8 so tiny-g absolute error is inert.
        (stable.sig22, _exact_sig22, 1e-2),
    ],
)
def test_sho_coefficient_functions(fn, exact, rtol):
    args = [(g, d) for g in GAMMA_T for d in DELTA]
    _check(fn, exact, args, rtol=rtol, atol=2e-4)


def test_no_nans_extreme_inputs():
    g = jnp.asarray([1e-8, 1e-4, 1.0, 50.0, 200.0], dtype=jnp.float32)
    d = jnp.asarray([-100.0, -1.0, 0.0, 0.5, 1.0], dtype=jnp.float32)
    gg, dd = jnp.meshgrid(g, d)
    for fn in [
        stable.exp_1mcosh_GD,
        stable.exp_sinh_GsqrtD,
        stable.exp_cosh,
        stable.exp_sinh_sqrtD,
        stable.zeta1,
        stable.zeta2,
        stable.sig11,
        stable.sig22,
    ]:
        out = fn(gg, dd)
        assert bool(jnp.all(jnp.isfinite(out))), fn.__name__


def test_zcoefs_unit_decomposition():
    # Zcoef1^2 + Zcoef2^2 + Zcoef3^2 = amplitude^2 by construction.
    g = jnp.asarray([0.1, 1.0, 5.0], dtype=jnp.float32)
    d = jnp.asarray([0.5, -1.0, 0.9], dtype=jnp.float32)
    c1, c2, c3, amp = stable.Zcoefs(g, d)
    np.testing.assert_allclose(
        np.asarray(c1**2 + c2**2 + c3**2), np.asarray(amp**2), rtol=1e-4, atol=1e-6
    )


def test_zcoefs_asymp_matches_ou_limit():
    g = jnp.asarray([10.0], dtype=jnp.float32)
    d = jnp.asarray([0.9], dtype=jnp.float32)
    a_t = g * (1 - d) / 4
    want = np.expm1(-2 * np.asarray(a_t)) / (-2 * np.asarray(a_t))
    np.testing.assert_allclose(np.asarray(stable.Zcoefs_asymp(g, d)), want, rtol=1e-5)
