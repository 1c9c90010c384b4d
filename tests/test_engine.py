"""Think-loop engine tests.

Follows the reference's fake-denoiser unit-test pattern
(reference tests/test_lanpaint_semantic_stop.py) plus an analytic
stationary-distribution convergence test the reference lacks: for unit
Gaussian data the VP-space Langevin dynamics must preserve N(0, 1) on the
unknown region.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu.config import LanPaintConfig, ModelKind
from lanpaint_tpu.engine import lanpaint_update
from lanpaint_tpu.schedule import unify_times


def linear_denoiser(x, t):
    """Exact posterior mean for x0 ~ N(0, I) under the VE model: x0 = x/(1+sigma^2)."""
    sig = t.reshape((-1,) + (1,) * (x.ndim - 1))
    x0 = x / (1.0 + sig**2)
    return x0, x0


def zero_denoiser(x, t):
    z = jnp.zeros_like(x)
    return z, z


def _run(denoiser, x, latent_image, mask, sigma, config, n_steps=None, key=None,
         kind=ModelKind.EPS, noise=None):
    times = unify_times(sigma, kind)
    if noise is None:
        noise = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    if n_steps is None:
        n_steps = config.n_steps
    return lanpaint_update(
        denoiser, x, latent_image=latent_image, noise=noise, latent_mask=mask,
        sigma=sigma, times=times, n_steps=jnp.int32(n_steps), config=config,
        kind=kind, key=key,
    )


def test_smoke_shapes_and_finiteness(key):
    x = jax.random.normal(key, (2, 4, 16, 16), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :8, :].set(1.0)
    sigma = jnp.full((2,), 1.0, jnp.float32)
    cfg = LanPaintConfig(n_steps=3)
    out, x_ref, aux = jax.jit(
        lambda x: _run(linear_denoiser, x, latent, mask, sigma, cfg)
    )(x)
    assert out.shape == x.shape and x_ref.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out))) and bool(jnp.all(jnp.isfinite(x_ref)))
    assert int(aux.steps_done) == 3


def test_known_region_blend_exact(key):
    """Output x0 must equal latent_image exactly on the known region
    (reference lanpaint.py:120)."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jax.random.normal(jax.random.fold_in(key, 1), x.shape, jnp.float32)
    mask = jnp.ones_like(x)  # everything known
    sigma = jnp.ones((1,), jnp.float32)
    out, _, _ = _run(linear_denoiser, x, latent, mask, sigma, LanPaintConfig(n_steps=2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(latent))


def test_n_steps_zero_is_plain_denoise(key):
    """n_steps=0 (outer early stop) = replace step + single forward + blend
    (reference nodes.py:177-183)."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x)
    sigma = jnp.full((1,), 2.0, jnp.float32)
    out, x_ref, aux = _run(linear_denoiser, x, latent, mask, sigma,
                           LanPaintConfig(n_steps=5), n_steps=0)
    assert int(aux.steps_done) == 0
    # All-unknown mask: replace step is a no-op, x comes back unchanged and
    # out is the plain posterior mean.
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x / (1 + 4.0)), rtol=1e-5
    )


def test_stationary_distribution_preserved(key):
    """For unit-Gaussian data the think loop must hold x_t ~ N(0,1) in VP
    coords on an all-unknown mask (analytic-score regression, SURVEY.md B8)."""
    n = (4, 4, 64, 64)  # 65536 elements
    sigma = jnp.ones((4,), jnp.float32)  # abt = 0.5
    x_native = jax.random.normal(key, n, jnp.float32) * jnp.sqrt(2.0)  # VE x at sigma=1
    latent = jnp.zeros(n, jnp.float32)
    mask = jnp.zeros(n, jnp.float32)
    cfg = LanPaintConfig(n_steps=40, step_size=0.2, friction=15.0)
    _, x_ref, _ = jax.jit(
        lambda x: _run(linear_denoiser, x, latent, mask, sigma, cfg)
    )(x_native)
    # x_ref is native VE coords at sigma=1 -> VP = x/sqrt(2).
    x_vp = np.asarray(x_ref) / np.sqrt(2.0)
    assert abs(x_vp.mean()) < 0.02
    np.testing.assert_allclose(x_vp.std(), 1.0, rtol=0.03)


def test_relaxation_toward_stationary(key):
    """Starting far from equilibrium, the unknown region must relax toward
    the model distribution (mean 0) instead of staying at the init."""
    n = (1, 4, 32, 32)
    sigma = jnp.ones((1,), jnp.float32)
    x_native = jnp.full(n, 5.0, jnp.float32)
    latent = jnp.zeros(n, jnp.float32)
    mask = jnp.zeros(n, jnp.float32)
    cfg = LanPaintConfig(n_steps=30)
    _, x_ref, _ = _run(linear_denoiser, x_native, latent, mask, sigma, cfg, key=key)
    assert abs(float(jnp.mean(x_ref))) < 1.0  # started at 5.0


def test_semantic_stop_counts_patience(key):
    """Custom distance fn returning 0 stops after exactly patience+1 inner
    steps (reference earlystop.py:97-101 and
    tests/test_lanpaint_semantic_stop.py:43-104)."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(
        n_steps=10, inner_threshold=1e-6, inner_patience=2,
        distance_fn=lambda prev, cur, ctx: 0.0,
    )
    _, _, aux = _run(linear_denoiser, x, latent, mask, sigma, cfg)
    assert int(aux.steps_done) == 3  # patience_eff = 2 + 1


def test_semantic_stop_legacy_min_steps_floor(key):
    """Legacy `min_steps` maps to a patience floor (reference
    earlystop.py:88-95): min_steps=4 with patience=1 behaves like
    patience=3, so the stop fires after 4 stable inner steps."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(
        n_steps=10, inner_threshold=1e-6, inner_patience=1,
        inner_min_steps=4, distance_fn=lambda prev, cur, ctx: 0.0,
    )
    assert cfg.patience_eff == 4
    _, _, aux = _run(linear_denoiser, x, latent, mask, sigma, cfg)
    assert int(aux.steps_done) == 4
    # min_steps <= 1 is a no-op (reference only applies floors > 1)
    assert LanPaintConfig(inner_patience=2, inner_min_steps=1).patience_eff == 3


def test_noise_feed_replay_reproduces_keyed_run(key):
    """Parity/replay mode: feeding the exact standard-normal draws the keyed
    run would make (docs/rng.md order) reproduces it bit-for-bit, and a
    different feed changes the output (proves the feed is consumed)."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(n_steps=4, use_fused_kernels=False)
    times = unify_times(sigma, ModelKind.EPS)
    noise = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)
    run_key = jax.random.PRNGKey(3)

    def run(feed):
        return lanpaint_update(
            linear_denoiser, x, latent_image=latent, noise=noise,
            latent_mask=mask, sigma=sigma, times=times,
            n_steps=jnp.int32(cfg.n_steps), config=cfg, kind=ModelKind.EPS,
            key=run_key, noise_feed=feed)

    _, x_ref, _ = run(None)

    # reconstruct the documented draw order: k_loop = split(key)[1],
    # per inner step i: fold_in(k_loop, i) -> split 5
    _, k_loop = jax.random.split(run_key)
    rows = []
    for i in range(cfg.n_steps + 1):  # +1: final-denoise iteration draws too
        ks = jax.random.split(jax.random.fold_in(k_loop, i), 5)
        rows.append(jnp.stack([jax.random.normal(k, x.shape, jnp.float32)
                               for k in ks]))
    feed = jnp.stack(rows)
    _, x_replay, _ = run(feed)
    # not bitwise: keyed and replay runs are different XLA programs, so
    # fusion/reassociation can differ in odd elements
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_replay),
                               rtol=1e-5, atol=1e-6)

    _, x_other, _ = run(feed + 0.1)
    assert not np.allclose(np.asarray(x_ref), np.asarray(x_other))


def test_semantic_stop_disabled_when_all_known(key):
    """All-known mask disables the semantic stop (inpaint weight ~ 0,
    reference earlystop.py:115-117); loop runs all n_steps."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.ones_like(x)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(n_steps=10, inner_threshold=1e-6, inner_patience=2)
    _, _, aux = _run(linear_denoiser, x, latent, mask, sigma, cfg)
    assert int(aux.steps_done) == 10


def test_semantic_stop_default_metric_stops_on_static_x0(key):
    """Zero denoiser => x0 constant => default metric dist = 0 from step 2 on;
    with patience 1 (patience_eff 2) the loop stops early."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(n_steps=10, inner_threshold=0.5, inner_patience=1,
                         record_trace=True)
    _, _, aux = _run(zero_denoiser, x, latent, mask, sigma, cfg)
    assert int(aux.steps_done) < 10
    trace = np.asarray(aux.trace)
    done = int(aux.steps_done)
    assert trace[done - 1, 7] == 1.0  # stopped flag set on the last row


def test_trace_rows_recorded(key):
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(n_steps=4, inner_threshold=1e-9, inner_patience=3)
    _, _, aux = _run(linear_denoiser, x, latent, mask, sigma, cfg)
    trace = np.asarray(aux.trace)
    # inner_step column is 1..4 for executed rows
    np.testing.assert_array_equal(trace[:4, 0], np.arange(1, 5, dtype=np.float32))


def test_sigma_zero_skips_loop(key):
    """abt=1 (sigma=0) => dt=0 => think loop must not run (reference
    lanpaint.py:162-163 early return), no NaNs from the 1/(1-abt) terms."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.zeros((1,), jnp.float32)
    out, x_ref, aux = _run(linear_denoiser, x, latent, mask, sigma,
                           LanPaintConfig(n_steps=5))
    assert int(aux.steps_done) == 0
    assert bool(jnp.all(jnp.isfinite(out)))


def test_flow_kind_runs(key):
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    t = jnp.full((1,), 0.5, jnp.float32)

    def flow_denoiser(x, t):
        # pretends to be a rectified-flow model returning x0 directly
        return x * 0.5, x * 0.5

    out, x_ref, aux = _run(flow_denoiser, x, latent, mask, t,
                           LanPaintConfig(n_steps=3), kind=ModelKind.FLOW)
    assert bool(jnp.all(jnp.isfinite(out))) and int(aux.steps_done) == 3


def test_zero_friction_falls_back_to_overdamped(key):
    """Friction=0 makes the damped SHO degenerate (Gamma=0 -> Delta=-inf);
    the per-element fallback must produce finite overdamped updates
    (reference handles this via the NaN retry, lanpaint.py:241-250)."""
    x = jax.random.normal(key, (1, 4, 8, 8), jnp.float32)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    cfg = LanPaintConfig(n_steps=5, friction=0.0)
    out, x_ref, aux = _run(linear_denoiser, x, latent, mask, sigma, cfg)
    assert bool(jnp.all(jnp.isfinite(out))) and bool(jnp.all(jnp.isfinite(x_ref)))
    assert int(aux.steps_done) == 5


def test_bf16_io(key):
    x = jax.random.normal(key, (1, 4, 8, 8)).astype(jnp.bfloat16)
    latent = jnp.zeros_like(x)
    mask = jnp.zeros_like(x, jnp.float32).at[:, :, :4, :].set(1.0)
    sigma = jnp.ones((1,), jnp.float32)
    out, x_ref, _ = _run(linear_denoiser, x, latent, mask, sigma, LanPaintConfig(n_steps=2),
                         noise=jax.random.normal(key, x.shape, jnp.float32))
    assert out.dtype == jnp.bfloat16 and x_ref.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
