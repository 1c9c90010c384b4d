"""Outer denoising solvers as a single `lax.scan` program.

TPU-native replacement for the k-diffusion sampler loop the reference
delegates to ComfyUI (reference src/LanPaint/nodes.py:246, whitelist
nodes.py:292-296).  Key contract difference vs. stock k-diffusion: the model
callback returns `(denoised, x_new)` and solvers continue from `x_new` — this
realizes the reference's in-place `input_x.copy_(x)` writeback
(lanpaint.py:122) functionally, so the outer solver resumes from the
Langevin-refined iterate.

All solvers share one carry layout (two denoised-history slots + two
step-size-history scalars) so a single scan skeleton serves every method.
Multi-model-call methods (heun family, dpm_2, dpmpp_sde, seeds_*) run their
stages through ONE model call site (`_staged`: lax.scan over the stage index
+ lax.switch on the evaluation point), so the compiled program contains a
single think-loop/backbone instance regardless of stage count — data-
dependent stage skips (the final-step shortcut) stay behind lax.cond inside
the shared site, so runtime cost is unchanged.

ModelFn signature: (x, sigma_scalar, key) -> (denoised, x_new).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], Tuple[jnp.ndarray, jnp.ndarray]]

SAMPLER_NAMES = []
_SOLVERS = {}


def register_solver(name, *aliases):
    def deco(fn):
        for n in (name,) + aliases:
            _SOLVERS[n] = fn
            SAMPLER_NAMES.append(n)
        return fn

    return deco


class SolverCarry(NamedTuple):
    x: jnp.ndarray
    hist1: jnp.ndarray   # previous denoised (multistep slot 1)
    hist2: jnp.ndarray   # slot 2 (3m methods)
    h1: jnp.ndarray      # previous log-step h
    h2: jnp.ndarray      # h before that
    nhist: jnp.ndarray   # int32: number of valid history entries


def init_carry(x: jnp.ndarray) -> SolverCarry:
    """Fresh solver state for a ladder starting at latent `x`.

    Exposed so chunked launches (api.LanPaintSampler chunk_steps) can thread
    the multistep history across segment boundaries instead of restarting it.
    """
    zero = jnp.zeros_like(x)
    return SolverCarry(x=x, hist1=zero, hist2=zero,
                       h1=jnp.float32(0.0), h2=jnp.float32(0.0),
                       nhist=jnp.int32(0))


def _to_d(x, sigma, denoised):
    return (x - denoised) / jnp.maximum(sigma, 1e-10)


def _ancestral_step(sigma, sigma_next, eta=1.0):
    """sigma_down/sigma_up split of an ancestral step (k-diffusion)."""
    su = jnp.minimum(
        sigma_next,
        eta * jnp.sqrt(
            jnp.maximum(sigma_next**2 * (sigma**2 - sigma_next**2)
                        / jnp.maximum(sigma**2, 1e-20), 0.0)
        ),
    )
    sd = jnp.sqrt(jnp.maximum(sigma_next**2 - su**2, 0.0))
    return sd, su


def _noise_like(x, key):
    return jax.random.normal(key, x.shape, jnp.float32).astype(x.dtype)


def _neg_log(s):
    return -jnp.log(jnp.maximum(s, 1e-10))


def _staged(model, key, branches, needs, x_like):
    """Run an n-stage solver step through ONE model call site.

    Multi-model-call solvers (heun family, dpm_2, dpmpp_sde, seeds_*) used
    to call `model` at 2-4 separate call sites (some inside lax.cond
    branches); each site instantiates the full LanPaint think loop AND the
    backbone in the compiled program — the compile-time multiplier the
    engine's single-call-site design exists to avoid (engine.py "one
    backbone instance per program"; scripts/measure_solver_compile.py
    measures it).  Here the stages run as a lax.scan over the stage index
    with lax.switch selecting each stage's (x_eval, sigma_eval): one model
    instance regardless of stage count.

    `branches[j](dens, xs) -> (x_eval, sigma_eval)`: stage j's evaluation
    point, computed from the stage output buffers (row k < j holds stage
    k's (denoised, x_refined); later rows are zeros).  `needs[j]` gates
    stage j behind lax.cond (False = the reference semantics skip the call,
    e.g. every second-stage call on the final ladder step) so runtime cost
    is unchanged; skipped stages leave zeros in their rows.  Stage j's
    model call consumes fold_in(key, 100 + j) — identical to the previous
    per-call-site key layout, so results are bit-for-bit unchanged.

    Aux mode (sample(collect_aux=True) wraps the model in _aux_capturing,
    which must stash its tracer at the solver's trace level, not inside an
    inner scan): stage 0 runs at top level and only stages 1.. are scanned
    — two instances, acceptable for the diagnostics path.

    Returns (dens, xs): (n_stages, *x) stacked stage outputs.
    """
    n = len(branches)
    needs = jnp.stack([jnp.asarray(v) for v in needs])
    zeros = jnp.zeros((n,) + x_like.shape, x_like.dtype)

    def run_stage(j, dens, xs):
        x_eval, s_eval = lax.switch(j, branches, dens, xs)
        return lax.cond(
            needs[j],
            lambda xe, se: model(xe, se, jax.random.fold_in(key, 100 + j)),
            lambda xe, se: (jnp.zeros_like(xe), jnp.zeros_like(xe)),
            x_eval, s_eval)

    def body(carry, j):
        dens, xs = carry
        den_j, x_j = run_stage(j, dens, xs)
        dens = lax.dynamic_update_index_in_dim(
            dens, den_j.astype(dens.dtype), j, 0)
        xs = lax.dynamic_update_index_in_dim(xs, x_j.astype(xs.dtype), j, 0)
        return (dens, xs), None

    if getattr(model, "aux_capturing", False):
        x0, s0 = branches[0](zeros, zeros)
        den0, xr0 = model(x0, s0, jax.random.fold_in(key, 100))
        dens = zeros.at[0].set(den0.astype(zeros.dtype))
        xs = zeros.at[0].set(xr0.astype(zeros.dtype))
        if n > 1:
            (dens, xs), _ = lax.scan(body, (dens, xs), jnp.arange(1, n))
        return dens, xs
    (dens, xs), _ = lax.scan(body, (zeros, zeros), jnp.arange(n))
    return dens, xs


# --------------------------------------------------------------------------
# Solvers.  Each: fn(model, carry, sigma, sigma_next, i, key) -> (carry, den)


@register_solver("euler")
def _euler(model, c: SolverCarry, s, sn, i, key):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    x = x + _to_d(x, s, den) * (sn - s)
    return c._replace(x=x), den


@register_solver("euler_ancestral")
def _euler_ancestral(model, c, s, sn, i, key):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    sd, su = _ancestral_step(s, sn)
    x = x + _to_d(x, s, den) * (sd - s)
    x = x + _noise_like(x, jax.random.fold_in(key, 0)) * su
    return c._replace(x=x), den


@register_solver("heun")
def _heun(model, c, s, sn, i, key):
    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        return x + _to_d(x, s, den) * (sn - s), sn

    dens, xs = _staged(model, key, [p0, p1], [True, sn > 0], c.x)
    x, den = xs[0], dens[0]
    d = _to_d(x, s, den)
    dt = sn - s
    d2 = _to_d(xs[1], sn, dens[1])
    x = jnp.where(sn > 0, x + (d + d2) / 2.0 * dt, x + d * dt)
    return c._replace(x=x), den


@register_solver("heunpp2")
def _heunpp2(model, c, s, sn, i, key, ctx=None):
    """Heun++2: 1/2/3-stage scheme selected by distance to the ladder end.

    Matches the public k-diffusion `sample_heunpp2` (MIT, from
    sd-webui-samplers-scheduler, vendored by the reference's host): last
    step is plain Euler, second-to-last is Heun with sigma-ratio weights
    w2 = sigma_{i+1}/(2 sigma_0), and every earlier step adds a third
    Euler extrapolation to sigma_{i+2} with weights w_k =
    sigma_{i+k-1}/(3 sigma_0).  Reference whitelist: nodes.py:292-296.
    """
    if "row" in ctx:
        # chunk-safe path: [sigma0, s_end, sigma_{i+2}] of the GLOBAL ladder
        # (prepare_tables("heunpp2", full_sigmas), sliced per segment by the
        # api) — the 3 scalars are all this scheme reads beyond (s, sn).
        sigma0, s_end, snn = ctx["row"][0], ctx["row"][1], ctx["row"][2]
    else:
        sigmas = ctx["sigmas"]
        last = sigmas.shape[0] - 1
        s_end = sigmas[last]
        snn = sigmas[jnp.minimum(i + 2, last)]
        sigma0 = sigmas[0]
    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        return x + _to_d(x, s, den) * (sn - s), sn

    def p2(dens, xs):
        x2, den2 = xs[1], dens[1]
        return x2 + _to_d(x2, sn, den2) * (snn - sn), snn

    not_last = sn != s_end
    dens, xs = _staged(model, key, [p0, p1, p2],
                       [True, not_last, not_last & (snn != s_end)], c.x)
    x, den = xs[0], dens[0]
    d = _to_d(x, s, den)
    dt = sn - s
    d2 = _to_d(xs[1], sn, dens[1])
    d3 = _to_d(xs[2], snn, dens[2])
    w2h = sn / (2.0 * sigma0)
    w2 = sn / (3.0 * sigma0)
    w3 = snn / (3.0 * sigma0)
    x_eul = x + d * dt
    x_heun = x + (d * (1.0 - w2h) + d2 * w2h) * dt
    x_pp = x + ((1.0 - w2 - w3) * d + w2 * d2 + w3 * d3) * dt
    x = jnp.where(sn == s_end, x_eul,
                  jnp.where(snn == s_end, x_heun, x_pp))
    return c._replace(x=x), den


_heunpp2.needs_ctx = True


@register_solver("dpm_2")
def _dpm_2(model, c, s, sn, i, key):
    s_mid = jnp.exp(0.5 * (jnp.log(s) + jnp.log(jnp.maximum(sn, 1e-10))))

    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        return x + _to_d(x, s, den) * (s_mid - s), s_mid

    dens, xs = _staged(model, key, [p0, p1], [True, sn > 0], c.x)
    x, den = xs[0], dens[0]
    d = _to_d(x, s, den)
    d2 = _to_d(xs[1], s_mid, dens[1])
    x = jnp.where(sn > 0, x + d2 * (sn - s), x + d * (sn - s))
    return c._replace(x=x), den


@register_solver("dpm_2_ancestral")
def _dpm_2_ancestral(model, c, s, sn, i, key):
    sd, su = _ancestral_step(s, sn)
    s_mid = jnp.exp(0.5 * (jnp.log(s) + jnp.log(jnp.maximum(sd, 1e-10))))

    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        return x + _to_d(x, s, den) * (s_mid - s), s_mid

    dens, xs = _staged(model, key, [p0, p1], [True, sd > 0], c.x)
    x, den = xs[0], dens[0]
    d = _to_d(x, s, den)
    d2 = _to_d(xs[1], s_mid, dens[1])
    xo = x + d2 * (sd - s)
    xo = xo + _noise_like(xo, jax.random.fold_in(key, 0)) * su
    x = jnp.where(sd > 0, xo, x + d * (sn - s))
    return c._replace(x=x), den


@register_solver("ddpm")
def _ddpm(model, c, s, sn, i, key):
    """DDPM ancestral step in VP coords (ComfyUI DDPMSampler_step)."""
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    eps = _to_d(x, s, den)
    x_vp = x / jnp.sqrt(1.0 + s**2)
    ac = 1.0 / (s**2 + 1.0)
    ac_prev = 1.0 / (sn**2 + 1.0)
    alpha = ac / ac_prev
    mu = jax.lax.rsqrt(alpha) * (x_vp - (1 - alpha) * eps / jnp.sqrt(1 - ac))
    noise_amt = jnp.where(
        sn > 0, jnp.sqrt((1 - alpha) * (1 - ac_prev) / (1 - ac)), 0.0
    )
    mu = mu + _noise_like(mu, jax.random.fold_in(key, 0)) * noise_amt
    x = mu * jnp.sqrt(1.0 + sn**2)
    return c._replace(x=x), den


@register_solver("dpmpp_2m")
def _dpmpp_2m(model, c, s, sn, i, key):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    t, tn = _neg_log(s), _neg_log(sn)
    h = tn - t
    first = c.nhist < 1
    r = c.h1 / jnp.where(h == 0, 1.0, h)
    safe_r = jnp.where(first, 1.0, r)
    den_d = (1 + 1 / (2 * safe_r)) * den - (1 / (2 * safe_r)) * c.hist1
    den_use = jnp.where(first | (sn <= 0), den, den_d)
    x = (sn / s) * x - jnp.expm1(-h) * den_use
    return c._replace(x=x, hist1=den, h1=h, nhist=c.nhist + 1), den


@register_solver("dpmpp_2m_sde", "dpmpp_2m_sde_gpu")
def _dpmpp_2m_sde(model, c, s, sn, i, key, eta=1.0):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))

    def rest(x):
        t, tn = _neg_log(s), _neg_log(sn)
        h = tn - t
        eta_h = eta * h
        x1 = (sn / s) * jnp.exp(-eta_h) * x + (-jnp.expm1(-h - eta_h)) * den
        first = c.nhist < 1
        r = c.h1 / h
        corr = 0.5 * (-jnp.expm1(-h - eta_h)) * (1 / jnp.where(first, 1.0, r)) * (den - c.hist1)
        x1 = jnp.where(first, x1, x1 + corr)
        nz = jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0)) * sn
        return x1 + _noise_like(x1, jax.random.fold_in(key, 0)) * nz, h

    def final(x):
        return den, jnp.float32(0.0)

    x, h = lax.cond(sn > 0, rest, final, x)
    return c._replace(x=x, hist1=den, h1=h, nhist=c.nhist + 1), den


@register_solver("dpmpp_3m_sde", "dpmpp_3m_sde_gpu")
def _dpmpp_3m_sde(model, c, s, sn, i, key, eta=1.0):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))

    def rest(x):
        t, tn = _neg_log(s), _neg_log(sn)
        h = tn - t
        h_eta = h * (eta + 1)
        x1 = jnp.exp(-h_eta) * x + (-jnp.expm1(-h_eta)) * den
        r0 = c.h1 / h
        r1 = c.h2 / h
        safe0 = jnp.where(c.nhist >= 1, r0, 1.0)
        safe1 = jnp.where(c.nhist >= 2, r1, 1.0)
        d1_0 = (den - c.hist1) / safe0
        d1_1 = (c.hist1 - c.hist2) / safe1
        d1 = d1_0 + (d1_0 - d1_1) * safe0 / (safe0 + safe1)
        d2 = (d1_0 - d1_1) / (safe0 + safe1)
        phi2 = jnp.expm1(-h_eta) / h_eta + 1
        phi3 = phi2 / h_eta - 0.5
        x3 = x1 + phi2 * d1 - phi3 * d2   # >= 2 history entries
        x2 = x1 + phi2 * d1_0             # exactly 1 history entry
        x1 = jnp.where(c.nhist >= 2, x3, jnp.where(c.nhist >= 1, x2, x1))
        nz = jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h * eta), 0.0)) * sn
        return x1 + _noise_like(x1, jax.random.fold_in(key, 0)) * nz, h

    x, h = lax.cond(sn > 0, rest, lambda x: (den, jnp.float32(0.0)), x)
    return c._replace(x=x, hist1=den, hist2=c.hist1, h1=h, h2=c.h1,
                      nhist=c.nhist + 1), den


@register_solver("dpmpp_sde", "dpmpp_sde_gpu")
def _dpmpp_sde(model, c, s, sn, i, key, eta=1.0, r=0.5):
    t, tn = _neg_log(s), _neg_log(sn)
    h = tn - t
    s_mid_t = t + h * r
    sig = lambda tt: jnp.exp(-tt)

    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        # stage 1 (to the midpoint, with its own ancestral split)
        x, den = xs[0], dens[0]
        sd1, su1 = _ancestral_step(sig(t), sig(s_mid_t), eta)
        t_mid_d = _neg_log(sd1)
        x2 = (sig(t_mid_d) / sig(t)) * x - jnp.expm1(t - t_mid_d) * den
        x2 = x2 + _noise_like(x2, jax.random.fold_in(key, 0)) * su1
        return x2, sig(s_mid_t)

    dens, xs = _staged(model, key, [p0, p1], [True, sn > 0], c.x)
    x, den = xs[0], dens[0]
    # stage 2 (full step)
    sd2, su2 = _ancestral_step(sig(t), sig(tn), eta)
    tn_d = _neg_log(sd2)
    fac = 1.0 / (2.0 * r)
    den_d = (1 - fac) * den + fac * dens[1]
    x3 = (sig(tn_d) / sig(t)) * x - jnp.expm1(t - tn_d) * den_d
    x3 = x3 + _noise_like(x3, jax.random.fold_in(key, 1)) * su2
    x = jnp.where(sn > 0, x3, x + _to_d(x, s, den) * (sn - s))
    return c._replace(x=x), den


def _res_multistep_core(model, c, s, sn, i, key, eta):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    sd, su = _ancestral_step(s, sn, eta) if eta > 0 else (sn, jnp.float32(0.0))
    t, tn = _neg_log(s), _neg_log(jnp.maximum(sd, 1e-10))
    h = tn - t
    # second-order RES multistep (phi-function form)
    phi1 = jnp.expm1(-h) / jnp.where(h == 0, 1.0, -h)
    phi2 = (phi1 - 1.0) / jnp.where(h == 0, 1.0, -h)
    c2 = (-c.h1) / jnp.where(h == 0, 1.0, h)  # t_old - t = -h1, over h
    safe_c2 = jnp.where(c.nhist >= 1, jnp.where(c2 == 0, 1.0, c2), 1.0)
    b2 = phi2 / safe_c2
    b1 = phi1 - b2
    x_ms = (sd / s) * x + h * (b1 * den + b2 * c.hist1)
    # first step / final step: plain Euler to sigma_down
    x_eul = x + _to_d(x, s, den) * (sd - s)
    use_euler = (c.nhist < 1) | (sd <= 0)
    x1 = jnp.where(use_euler, x_eul, x_ms)
    x1 = x1 + _noise_like(x1, jax.random.fold_in(key, 0)) * su
    return c._replace(x=x1, hist1=den, h1=h, nhist=c.nhist + 1), den


@register_solver("res_multistep")
def _res_multistep(model, c, s, sn, i, key):
    return _res_multistep_core(model, c, s, sn, i, key, eta=0.0)


@register_solver("res_multistep_ancestral")
def _res_multistep_ancestral(model, c, s, sn, i, key):
    return _res_multistep_core(model, c, s, sn, i, key, eta=1.0)


@register_solver("seeds_2")
def _seeds_2(model, c, s, sn, i, key, eta=1.0, r=0.5, s_noise=1.0):
    """SEEDS-2: 2-stage stochastic exponential derivative-free solver
    (Gonzalez et al. 2023).  eta=0 reduces to the deterministic 2-stage
    exponential midpoint method (validated against the closed form)."""
    t, tn = _neg_log(s), _neg_log(sn)
    h = tn - t
    h_eta = h * (eta + 1.0)
    s_mid_t = t + r * h
    sigma_mid = jnp.exp(-s_mid_t)
    fac = 1.0 / (2.0 * r)
    coeff_1 = jnp.expm1(-r * h_eta)
    coeff_2 = jnp.expm1(-h_eta)
    nc_1 = jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * r * h * eta), 0.0))
    nc_2 = jnp.sqrt(jnp.maximum(
        jnp.expm1(-2 * r * h * eta) - jnp.expm1(-2 * h * eta), 0.0))

    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        n1 = _noise_like(x, jax.random.fold_in(key, 0))
        x_2 = (coeff_1 + 1) * x - coeff_1 * den \
            + sigma_mid * nc_1 * n1 * s_noise
        return x_2, sigma_mid

    dens, xs = _staged(model, key, [p0, p1], [True, sn > 0], c.x)
    x, den = xs[0], dens[0]
    n1 = _noise_like(x, jax.random.fold_in(key, 0))
    n2 = _noise_like(x, jax.random.fold_in(key, 1))
    den_d = (1 - fac) * den + fac * dens[1]
    x3 = (coeff_2 + 1) * x - coeff_2 * den_d
    x3 = x3 + sn * (nc_2 * n1 + nc_1 * n2) * s_noise
    x = jnp.where(sn > 0, x3, den)
    return c._replace(x=x), den


@register_solver("seeds_3")
def _seeds_3(model, c, s, sn, i, key, eta=1.0, r_1=1.0 / 3.0, r_2=2.0 / 3.0,
             s_noise=1.0):
    """SEEDS-3: 3-stage stochastic exponential solver."""
    t, tn = _neg_log(s), _neg_log(sn)
    h = tn - t
    h_eta = h * (eta + 1.0)
    s1_t, s2_t = t + r_1 * h, t + r_2 * h
    sig_1, sig_2 = jnp.exp(-s1_t), jnp.exp(-s2_t)
    coeff_1 = jnp.expm1(-r_1 * h_eta)
    coeff_2 = jnp.expm1(-r_2 * h_eta)
    coeff_3 = jnp.expm1(-h_eta)
    nc_1 = jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * r_1 * h * eta), 0.0))
    nc_2 = jnp.sqrt(jnp.maximum(
        jnp.expm1(-2 * r_1 * h * eta) - jnp.expm1(-2 * r_2 * h * eta), 0.0))
    nc_3 = jnp.sqrt(jnp.maximum(
        jnp.expm1(-2 * r_2 * h * eta) - jnp.expm1(-2 * h * eta), 0.0))

    def p0(dens, xs):
        return c.x, s

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        n1 = _noise_like(x, jax.random.fold_in(key, 0))
        x_2 = (coeff_1 + 1) * x - coeff_1 * den + sig_1 * nc_1 * n1 * s_noise
        return x_2, sig_1

    def p2(dens, xs):
        x, den = xs[0], dens[0]
        n1 = _noise_like(x, jax.random.fold_in(key, 0))
        n2 = _noise_like(x, jax.random.fold_in(key, 1))
        x_3 = (coeff_2 + 1) * x - coeff_2 * den \
            + (r_2 / r_1) * (coeff_2 / (r_2 * h_eta) + 1) * (dens[1] - den)
        x_3 = x_3 + sig_2 * (nc_2 * n1 + nc_1 * n2) * s_noise
        return x_3, sig_2

    dens, xs = _staged(model, key, [p0, p1, p2],
                       [True, sn > 0, sn > 0], c.x)
    x, den = xs[0], dens[0]
    n1 = _noise_like(x, jax.random.fold_in(key, 0))
    n2 = _noise_like(x, jax.random.fold_in(key, 1))
    n3 = _noise_like(x, jax.random.fold_in(key, 2))
    x4 = (coeff_3 + 1) * x - coeff_3 * den \
        + (1.0 / r_2) * (coeff_3 / h_eta + 1) * (dens[2] - den)
    x4 = x4 + sn * (nc_3 * n1 + nc_2 * n2 + nc_1 * n3) * s_noise
    x = jnp.where(sn > 0, x4, den)
    return c._replace(x=x), den


def _er_psi(sig):
    """ER-SDE customary noise-scale function psi(s) = s (exp(s^0.3) + 10)."""
    return sig * (jnp.exp(jnp.maximum(sig, 1e-10) ** 0.3) + 10.0)


@register_solver("er_sde")
def _er_sde(model, c, s, sn, i, key):
    """Extended reverse-time SDE solver, max order 3 (VE ER-SDE-Solver-3).

    Public algorithm (arXiv 2309.06169; the k-diffusion `sample_er_sde` the
    reference whitelist names, nodes.py:292-296): stage 1 is
    x <- r x + (1-r) x0 with r = psi(sn)/psi(s); stages 2/3 add first/second
    divided-difference corrections of the denoised history, weighted by
    200-point quadratures of 1/psi and (sigma-s)/psi over [sn, s]; then VE
    noise sqrt(sn^2 - r^2 s^2) xi.  Branchless: all stages are computed and
    stage k = min(3, i+1) selected per step (history slots are valid from
    the steps that fill them, see carry update).

    Carry use: hist1 = previous denoised, hist2 = previous divided
    difference, h1/h2 = sigma_{i-1}/sigma_{i-2}.
    """
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    sn_safe = jnp.maximum(sn, 1e-10)
    r = _er_psi(sn) / _er_psi(s)
    x1 = r * x + (1.0 - r) * den

    dt = sn - s
    npts = 200.0
    pts = jnp.arange(200, dtype=jnp.float32)
    step_sz = -dt / npts
    sigma_pos = sn_safe + pts * step_sz
    scaled_pos = _er_psi(sigma_pos)
    # Stage 2: first divided difference of the denoised history.
    s_int = jnp.sum(1.0 / scaled_pos) * step_sz
    den_d = (den - c.hist1) / jnp.where(c.nhist >= 1, s - c.h1, 1.0)
    x2 = x1 + (dt + s_int * _er_psi(sn)) * den_d
    # Stage 3: second divided difference.
    s_u = jnp.sum((sigma_pos - s) / scaled_pos) * step_sz
    den_u = (den_d - c.hist2) / jnp.where(c.nhist >= 2, (s - c.h2) / 2.0, 1.0)
    x3 = x2 + (dt**2 / 2.0 + s_u * _er_psi(sn)) * den_u

    # Stage from the carried history count (== i+1 un-chunked) so chunked
    # launches that thread the carry keep the same stage schedule.
    stage = jnp.minimum(3, c.nhist + 1)
    x_new = jnp.where(stage >= 3, x3, jnp.where(stage >= 2, x2, x1))
    noise_amt = jnp.sqrt(jnp.maximum(sn**2 - s**2 * r**2, 0.0))
    x_new = x_new + _noise_like(x_new, jax.random.fold_in(key, 0)) * noise_amt
    x_out = jnp.where(sn > 0, x_new, den)
    return c._replace(x=x_out, hist1=den, hist2=den_d, h1=s, h2=c.h1,
                      nhist=c.nhist + 1), den


@register_solver("gradient_estimation")
def _gradient_estimation(model, c, s, sn, i, key, ge_gamma=2.0):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    d = _to_d(x, s, den)
    dt = sn - s
    d_bar = ge_gamma * d + (1 - ge_gamma) * c.hist1
    use_plain = (c.nhist < 1) | (sn <= 0)
    x = x + jnp.where(use_plain, d, d_bar) * dt
    return c._replace(x=x, hist1=d, nhist=c.nhist + 1), den


# --------------------------------------------------------------------------
# DEIS: exponential Adams-Bashforth in eps space (Zhang & Chen, DEIS).
# In VE coords the probability-flow ODE is dx/dsigma = eps(x, sigma), so the
# AB-k update is x_{n+1} = x_n + sum_j C_j eps_{n-j} with C_j the EXACT
# integrals of the Lagrange basis over [sigma_n, sigma_{n+1}] — polynomials,
# integrated analytically on the host from the concrete sigma ladder
# (prepare_tables), no numerical quadrature.


def _deis_coeffs(sigmas: "np_array", max_order: int = 3):
    import numpy as onp

    sig = onp.asarray(sigmas, onp.float64)
    n = len(sig) - 1
    coeffs = onp.zeros((n, max_order), onp.float64)
    for i in range(n):
        order = min(i + 1, max_order, n - i)
        nodes = sig[i - order + 1: i + 1][::-1]  # sigma_i, sigma_{i-1}, ...
        for j in range(order):
            # Lagrange basis L_j over `nodes`, integrated sigma_i -> sigma_{i+1}
            poly = onp.poly1d([1.0])
            for l in range(order):
                if l == j:
                    continue
                poly *= onp.poly1d([1.0, -nodes[l]]) / (nodes[j] - nodes[l])
            P = poly.integ()
            coeffs[i, j] = P(sig[i + 1]) - P(sig[i])
    return coeffs.astype("float32")


@register_solver("deis")
def _deis(model, c, s, sn, i, key, coeff_row=None):
    den, x = model(c.x, s, jax.random.fold_in(key, 100))
    eps = _to_d(x, s, den)
    # history: hist1 = eps_{i-1}, hist2 = eps_{i-2}
    upd = coeff_row[0] * eps + coeff_row[1] * c.hist1 + coeff_row[2] * c.hist2
    x = jnp.where(sn > 0, x + upd, den)
    return c._replace(x=x, hist1=eps, hist2=c.hist1, nhist=c.nhist + 1), den


def prepare_tables(sampler: str, sigmas) -> dict:
    """Host-side per-ladder precomputation (concrete sigmas required).

    Both tables exist to make chunked launches (api chunk_steps) bit-equal
    to the single launch: per-step rows computed from the FULL ladder, then
    sliced per segment."""
    if sampler == "deis":
        return {"deis": jnp.asarray(_deis_coeffs(sigmas))}
    if sampler == "heunpp2":
        import numpy as onp

        sig = onp.asarray(sigmas, onp.float32)
        n = len(sig) - 1
        rows = onp.stack([
            onp.full((n,), sig[0], onp.float32),
            onp.full((n,), sig[-1], onp.float32),
            sig[onp.minimum(onp.arange(n) + 2, n)],
        ], axis=1)
        return {"heunpp2": jnp.asarray(rows)}
    return {}


SAMPLER_NAMES.append("dpm_fast")  # dispatched specially in sample()


# --------------------------------------------------------------------------
# dpm_fast: DPM-Solver fast variant — uniform grid in t = -log sigma, steps
# grouped into order-3 blocks (scanned; one compiled body with 3 model
# calls) plus an order-1/2 tail, exactly the k-diffusion grouping.


def _dpm_eps(x, sigma, den):
    return (x - den) / jnp.maximum(sigma, 1e-10)


def _dpm1(model, x, t, t_next, key, kidx):
    sig, sign = jnp.exp(-t), jnp.exp(-t_next)
    den, x = model(x, sig, jax.random.fold_in(key, kidx))
    eps = _dpm_eps(x, sig, den)
    h = t_next - t
    return x - sign * jnp.expm1(h) * eps, den


def _dpm2(model, x_in, t, t_next, key, kidx, r1=0.5):
    """Order-2 DPM-Solver group through ONE model call site (_staged;
    kidx must be 100 so the stage folds match the previous kidx..kidx+1
    layout bit-for-bit)."""
    assert kidx == 100
    sig = jnp.exp(-t)
    h = t_next - t
    s1 = t + r1 * h

    def p0(dens, xs):
        return x_in, sig

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        eps = _dpm_eps(x, sig, den)
        return x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps, jnp.exp(-s1)

    dens, xs = _staged(model, key, [p0, p1], [True, True], x_in)
    x, den = xs[0], dens[0]
    eps = _dpm_eps(x, sig, den)
    eps1 = _dpm_eps(xs[1], jnp.exp(-s1), dens[1])
    x = x - jnp.exp(-t_next) * jnp.expm1(h) * eps \
        - jnp.exp(-t_next) / (2 * r1) * jnp.expm1(h) * (eps1 - eps)
    return x, den


def _dpm3(model, x_in, t, t_next, key, kidx, r1=1.0 / 3.0, r2=2.0 / 3.0):
    """Order-3 DPM-Solver group through ONE model call site (see _dpm2)."""
    assert kidx == 100
    sig = jnp.exp(-t)
    h = t_next - t
    s1, s2 = t + r1 * h, t + r2 * h

    def p0(dens, xs):
        return x_in, sig

    def p1(dens, xs):
        x, den = xs[0], dens[0]
        eps = _dpm_eps(x, sig, den)
        return x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps, jnp.exp(-s1)

    def p2(dens, xs):
        x, den = xs[0], dens[0]
        eps = _dpm_eps(x, sig, den)
        eps1 = _dpm_eps(xs[1], jnp.exp(-s1), dens[1])
        u2 = x - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps \
            - jnp.exp(-s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1) \
            * (eps1 - eps)
        return u2, jnp.exp(-s2)

    dens, xs = _staged(model, key, [p0, p1, p2], [True, True, True], x_in)
    x, den = xs[0], dens[0]
    eps = _dpm_eps(x, sig, den)
    eps2 = _dpm_eps(xs[2], jnp.exp(-s2), dens[2])
    x = x - jnp.exp(-t_next) * jnp.expm1(h) * eps \
        - jnp.exp(-t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps2 - eps)
    return x, den


def _dpm_fast_orders(m: int):
    """k-diffusion dpm_solver_fast step grouping for m solver steps."""
    if m < 3:
        return [1] * m
    if m % 3 == 0:
        return [3] * (m // 3 - 1) + [2, 1]
    if m % 3 == 1:
        return [3] * (m // 3) + [1]
    return [3] * (m // 3) + [2]


def dpm_fast_groups(total_steps: int):
    """The (static) order grouping for a `total_steps`-step ladder.

    Groups are ATOMIC multi-model-call updates — the chunkable unit for
    dpm_fast (api chunk_steps chunking snaps to group boundaries)."""
    return _dpm_fast_orders(max(total_steps - 1, 1))


def _sample_dpm_fast(model, noise_x, sigmas, key, callback, collect_aux=False,
                     g_range=None):
    """DPM-Solver-fast: uniform grid in t = -log sigma between the ladder's
    endpoints, order-3 groups scanned (one compiled 3-call body) + a 1/2
    order tail, then a final denoise at sigma_min.  Only the grouping is
    static (depends on len(sigmas)); the grid itself is traced.  Assumes the
    ladder ends at 0 (the api always appends it).  With collect_aux the
    model returns (den, x, aux) and per-group first-call aux stacks ride
    along (see sample()).

    `g_range=(g0, g1, include_final)` runs only groups [g0, g1) (plus the
    final sigma_min denoise when include_final) — the chunked-launch path.
    `sigmas` must still be the FULL ladder: the t grid and the
    fold_in(key, g) stream are derived from it, so a chunked run is
    bit-identical to the single launch (same elementwise grid math on the
    same inputs, same global group indices)."""
    n = sigmas.shape[0] - 1
    m = max(n - 1, 1)
    orders = _dpm_fast_orders(m)
    bounds = [0]
    for o in orders:
        bounds.append(bounds[-1] + o)
    sigma_max = sigmas[0]
    sigma_min = sigmas[-2]
    t0_, t1_ = -jnp.log(sigma_max), -jnp.log(sigma_min)
    ts = t0_ + (t1_ - t0_) * jnp.arange(m + 1, dtype=jnp.float32) / m
    g0, g1, include_final = (0, len(orders), True) if g_range is None else g_range

    def wrapped():
        if not collect_aux:
            return model, None
        cell = []
        return _aux_capturing(model, cell), cell

    x = noise_x
    dens = []
    auxs = []
    n3 = sum(1 for o in orders if o == 3)
    n3_lo, n3_hi = g0, min(g1, n3)  # order-3 groups owned by this range
    if n3_hi > n3_lo:
        t_pairs = jnp.stack(
            [jnp.stack([ts[bounds[g]], ts[bounds[g + 1]]])
             for g in range(n3_lo, n3_hi)])

        def body(x, it):
            g, tp = it
            k = jax.random.fold_in(key, g)
            mm, cell = wrapped()
            x, den = _dpm3(mm, x, tp[0], tp[1], k, 100)
            if callback is not None:
                jax.debug.callback(callback, g, den, x, ordered=False)
            return x, ((den, cell[0]) if collect_aux else den)

        x, ys3 = lax.scan(body, x, (jnp.arange(n3_lo, n3_hi), t_pairs))
        if collect_aux:
            dens.append(ys3[0])
            auxs.append(ys3[1])
        else:
            dens.append(ys3)
    for g in range(max(g0, n3), g1):
        o = orders[g]
        k = jax.random.fold_in(key, g)
        fn = _dpm2 if o == 2 else _dpm1
        mm, cell = wrapped()
        x, den = fn(mm, x, ts[bounds[g]], ts[bounds[g + 1]], k, 100)
        if callback is not None:
            jax.debug.callback(callback, g, den, x, ordered=False)
        dens.append(den[None])
        if collect_aux:
            auxs.append(jax.tree.map(lambda a: a[None], cell[0]))
    if include_final:
        # final denoise at the ladder floor (sigma -> 0 step)
        mm, cell = wrapped()
        den, x = mm(x, sigma_min, jax.random.fold_in(key, 9999))
        x = den
        if callback is not None:
            jax.debug.callback(callback, len(orders), den, x, ordered=False)
        dens.append(den[None])
        if collect_aux:
            auxs.append(jax.tree.map(lambda a: a[None], cell[0]))
    if collect_aux:
        aux_all = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *auxs)
        return x, (jnp.concatenate(dens, axis=0), aux_all)
    return x, jnp.concatenate(dens, axis=0)


def get_solver(name: str):
    try:
        return _SOLVERS[name]
    except KeyError:
        raise ValueError(
            f"unknown sampler {name!r}; available: {sorted(set(_SOLVERS))}"
        ) from None


def sample(
    model: ModelFn,
    noise_x: jnp.ndarray,
    sigmas: jnp.ndarray,
    *,
    sampler: str = "euler",
    key: jax.Array,
    callback=None,
    tables: dict = None,
    step_offset=0,
    carry_in: SolverCarry = None,
    return_carry: bool = False,
    collect_aux: bool = False,
    dpm_fast_range=None,
):
    """Run the full outer sampling loop as one `lax.scan`.

    `noise_x` is the initial latent AFTER initial noise scaling
    (reference nodes.py:221).  `sigmas` is the [steps+1] descending ladder.
    Returns (samples, all_denoised) where all_denoised[i] is the x0
    prediction of step i (feeds previews / the custom-sampler
    `denoised_output`, reference nodes.py:543-556).

    `carry_in`/`return_carry`: thread the solver's multistep state across
    chunked launches — pass the carry returned by the previous segment (with
    `noise_x` = its output latent) so dpmpp_2m-style history solvers are
    bit-identical to the single launch.  With `return_carry` the result is
    (samples, all_denoised, carry).

    `collect_aux`: the model returns (denoised, x_new, aux) and the aux
    pytree of each step's FIRST model call is stacked along the step axis
    (the think-loop diagnostics channel, engine.ThinkAux).  Solvers stay
    aux-oblivious: the wrapper captures the aux tracer at the first
    top-level model call — every registered solver's first call happens
    outside `lax.cond` branches, which is what makes the capture legal.
    all_denoised becomes the tuple (denoised_stack, aux_stack).
    """
    if sampler == "dpm_fast":
        out = _sample_dpm_fast(model, noise_x, sigmas, key, callback,
                               collect_aux=collect_aux,
                               g_range=dpm_fast_range)
        x, dens = out
        if return_carry:
            return x, dens, init_carry(x)
        return x, dens
    step_fn = get_solver(sampler)
    if sampler == "deis" and (tables is None or "deis" not in tables):
        if isinstance(sigmas, jax.core.Tracer):
            raise ValueError(
                "deis under jit needs host-precomputed coefficients: pass "
                "tables=prepare_tables('deis', concrete_sigmas)")
        tables = prepare_tables("deis", sigmas)
    # heunpp2 runs fine off its local ladder when unchunked; the table path
    # (full-ladder [sigma0, s_end, sigma_{i+2}] rows) exists so CHUNKED
    # segments keep the global weights — prepare it eagerly when possible.
    if sampler == "heunpp2" and (tables is None or "heunpp2" not in tables) \
            and not isinstance(sigmas, jax.core.Tracer):
        tables = dict(tables or {}, **prepare_tables("heunpp2", sigmas))
    tables = tables or {}
    carry0 = (init_carry(noise_x) if carry_in is None
              else carry_in._replace(x=noise_x))
    n = sigmas.shape[0] - 1
    idx = jnp.arange(n)

    def body(carry, it):
        i = it
        s = sigmas[i]
        sn = sigmas[i + 1]
        # step_offset: global step index when the ladder runs as chunked
        # launches (api.LanPaintSampler chunk_steps) — keeps the per-step
        # RNG stream and callback indices identical to the single-launch
        # program.
        k = jax.random.fold_in(key, i + step_offset)
        cell = []
        m = _aux_capturing(model, cell) if collect_aux else model
        if sampler == "deis":
            carry, den = step_fn(m, carry, s, sn, i, k,
                                 coeff_row=tables["deis"][i])
        elif getattr(step_fn, "needs_ctx", False):
            ctx = {"sigmas": sigmas}
            if sampler == "heunpp2" and "heunpp2" in tables:
                # full-ladder constants (chunk-safe path): row =
                # [sigma0, s_end, sigma_{i+2}] of the GLOBAL ladder
                ctx["row"] = tables["heunpp2"][i]
            carry, den = step_fn(m, carry, s, sn, i, k, ctx=ctx)
        else:
            carry, den = step_fn(m, carry, s, sn, i, k)
        if callback is not None:
            jax.debug.callback(callback, i + step_offset, den, carry.x,
                               ordered=False)
        ys = (den, cell[0]) if collect_aux else den
        return carry, ys

    carry, denoised_all = lax.scan(body, carry0, idx)
    if return_carry:
        return carry.x, denoised_all, carry
    return carry.x, denoised_all


def _aux_capturing(model, cell):
    """Wrap an aux-returning model into the plain (den, x) contract,
    stashing the FIRST call's aux tracer in `cell` (valid within the trace
    of the enclosing scan body — see sample(collect_aux=...))."""

    def m(x, s, k):
        den, xn, aux = model(x, s, k)
        if not cell:
            cell.append(aux)
        return den, xn

    # _staged keys on this: the aux tracer must be stashed at the solver's
    # trace level, so staged solvers run their first call OUTSIDE the
    # stage scan when aux capture is active
    m.aux_capturing = True
    return m
