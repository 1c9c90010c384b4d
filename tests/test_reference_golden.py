"""Seed-for-seed parity vs the ACTUAL reference implementation.

tests/data/reference_goldens.npz holds inputs, every RNG draw (in consumption
order), and outputs recorded from the reference LanPaint engine
(scraed/LanPaint src/LanPaint/lanpaint.py + utils.py) running on torch-CPU
with a deterministic linear denoiser — see tests/make_reference_goldens.py.

Here the identical draws are replayed through our engine's `noise_feed`
parity mode (docs/rng.md draw-order contract: per inner step
[eps_y1, eps_v1, eps_y2, eps_v2, v_stat]; the reference's order is
[v0-randn, mvn(y,v)] on the cold step and [mvn1(y,v), mvn2(y,v)] on warm
steps) and both the refined latent (the reference's in-place `input_x.copy_`,
lanpaint.py:122) and the blended x0 output must match to fp32 tolerance.

This covers, against the reference's own code: the replace step, VE/flow<->VP
coordinate changes, region-mixed step-size/friction/A/D parameterization
(lanpaint.py:255-288), bidirectional score (lanpaint.py:125-141), the
half-step -> kick -> half-step Strang splitting with old-C half-steps
(lanpaint.py:211-225), the SHO transition coefficients incl. the manual
2x2 Cholesky with its 1e-8 clamps (utils.py:268-300), the stationary
velocity init (utils.py:253-254), n_steps=0 dispatch, video 5D latents,
non-default (lambda, step_size, beta, friction), and the semantic early
stopper (earlystop.py:238-313): with a threshold set, the engine must stop
at the reference's exact iteration (inpaint+ring weighted MSE, abt-scaled
threshold, drift anchor, patience) and still match outputs.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lanpaint_tpu.config import LanPaintConfig, ModelKind
from lanpaint_tpu.engine import lanpaint_update
from lanpaint_tpu.schedule import Times

DATA = os.path.join(os.path.dirname(__file__), "data", "reference_goldens.npz")

CASES = ["eps_n3", "eps_n1", "eps_n0", "eps_b2", "flow_n3",
         "flow_n2_video", "eps_params", "eps_earlystop", "eps_earlystop_p2",
         "eps_customdist", "eps_nanfallback", "eps_nanfallback_warm"]


@pytest.fixture(scope="module")
def goldens():
    return np.load(DATA)


def build_noise_feed(z, name, n_steps, executed, shape, fallback=False):
    """Map the reference's recorded draw sequence onto the engine's
    (n_max, 5, *shape) feed: slots [eps_y1, eps_v1, eps_y2, eps_v2, v_stat].

    `executed` is how many think iterations the reference actually ran
    (early stop may break before n_steps); the feed only holds draws for
    those — if the engine's stop logic diverged and it consumed more, the
    clamped feed rows guarantee a mismatch the output assertions catch.

    `fallback` (NaN/overdamped regime, friction=0): the reference's damped
    attempt consumes a v-init randn then MVN.__init__ raises (no mvn draw)
    and run_overdamped draws fresh randns (lanpaint.py:241-250; draw tags
    recorded by make_reference_goldens.py).  Our engine computes both
    branches from ONE draw set and selects — so the overdamped randns map
    to eps_y1/eps_y2 and the dead v-init draw to v_stat:
        cold: [v_init, od]            -> feed[0] = (od, -, -, -, v_init)
        warm: [v_init, od1, od2]      -> feed[j] = (od1, -, od2, -, v_init)
    """
    n_max = max(n_steps, 1)
    feed = np.zeros((n_max, 5) + shape, np.float32)
    if executed == 0:
        return feed
    draws = [z[f"{name}/draw{j}"] for j in range(int(z[f"{name}/n_draws"]))]
    if fallback:
        feed[0, 4] = draws[0]
        feed[0, 0] = draws[1]
        k = 2
        for j in range(1, executed):
            feed[j, 4] = draws[k]
            feed[j, 0] = draws[k + 1]
            feed[j, 2] = draws[k + 2]
            k += 3
        assert k == len(draws)
        return feed
    # cold step: [v0-randn, mvn]; mvn eps shape (*shape, 2) -> (y, v)
    feed[0, 4] = draws[0]
    feed[0, 0] = draws[1][..., 0]
    feed[0, 1] = draws[1][..., 1]
    k = 2
    for j in range(1, executed):
        feed[j, 0] = draws[k][..., 0]
        feed[j, 1] = draws[k][..., 1]
        feed[j, 2] = draws[k + 1][..., 0]
        feed[j, 3] = draws[k + 1][..., 1]
        k += 2
    assert k == len(draws)
    return feed


@pytest.mark.parametrize("name", CASES)
def test_reference_parity(goldens, name):
    z = goldens
    n_steps, lamb, step_size, beta, friction = (
        float(v) for v in z[f"{name}/meta"])
    n_steps = int(n_steps)
    kind = ModelKind.FLOW if int(z[f"{name}/kind"]) else ModelKind.EPS
    x = z[f"{name}/x"]
    g = jnp.asarray(z[f"{name}/g"])

    def denoiser(xm, t):
        return 0.4 * xm + g, 0.55 * xm - 0.5 * g

    times = Times(
        ve_sigma=jnp.asarray(z[f"{name}/ve"]),
        abt=jnp.asarray(z[f"{name}/abt"]),
        flow_t=jnp.asarray(z[f"{name}/tflow"]),
    )
    stop_vals = [float(v) for v in z[f"{name}/stop"]]
    stop_threshold, stop_patience, executed = stop_vals[:3]
    custom = len(stop_vals) > 3 and stop_vals[3] > 0
    # same metric the torch-side EarlyStopHook computes (3-arg canonical
    # form): mean |cur - prev| over the latent, raw threshold
    distance_fn = (lambda prev, cur, ctx: jnp.mean(jnp.abs(cur - prev))) \
        if custom else None
    config = LanPaintConfig(
        n_steps=max(n_steps, 1), lamb=lamb, step_size=step_size, beta=beta,
        friction=friction, inner_threshold=stop_threshold,
        inner_patience=int(stop_patience), distance_fn=distance_fn)
    fallback = f"{name}/fallback" in z and int(z[f"{name}/fallback"]) == 1
    feed = build_noise_feed(z, name, n_steps, int(executed), x.shape,
                            fallback=fallback)

    import jax

    out, x_ref, aux = lanpaint_update(
        denoiser,
        jnp.asarray(x),
        latent_image=jnp.asarray(z[f"{name}/latent"]),
        noise=jnp.asarray(z[f"{name}/noise"]),
        latent_mask=jnp.asarray(z[f"{name}/mask"]),
        sigma=jnp.asarray(z[f"{name}/sigma_native"]),
        times=times,
        n_steps=jnp.int32(n_steps),
        config=config,
        kind=kind,
        key=jax.random.PRNGKey(0),
        noise_feed=jnp.asarray(feed),
    )

    ref_out = z[f"{name}/out"]
    ref_x = z[f"{name}/x_refined"]
    # early stop parity: the engine must run exactly as many think
    # iterations as the reference did (its langevin call count)
    assert int(aux.steps_done) == int(executed), (
        f"{name}: engine ran {int(aux.steps_done)} think iterations, "
        f"reference ran {int(executed)}")
    np.testing.assert_allclose(np.asarray(x_ref), ref_x, rtol=2e-4, atol=2e-4,
                               err_msg=f"{name}: refined latent mismatch")
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4,
                               err_msg=f"{name}: blended x0 mismatch")


LADDER_CASES = ["ladder_euler_eps", "ladder_dpmpp2m_eps", "ladder_euler_flow",
                "ladder_euler_flow_leftover", "ladder_euler_eps_tail2",
                "ladder_euler_eps_video"]


def build_ladder_feed(z, name, total, n_max, shape):
    """Per-outer-step noise feeds (total, n_max, 5, *shape) from the flat
    recorded draw log, using the per-step boundaries the generator stored
    (make_reference_goldens.run_ladder_case)."""
    bounds = z[f"{name}/bounds"]
    executed = z[f"{name}/executed"]
    feed = np.zeros((total, n_max, 5) + shape, np.float32)
    for i in range(total):
        draws = [z[f"{name}/draw{j}"]
                 for j in range(int(bounds[i]), int(bounds[i + 1]))]
        e = int(executed[i])
        if e == 0:
            continue
        feed[i, 0, 4] = draws[0]
        feed[i, 0, 0] = draws[1][..., 0]
        feed[i, 0, 1] = draws[1][..., 1]
        k = 2
        for j in range(1, e):
            feed[i, j, 0] = draws[k][..., 0]
            feed[i, j, 1] = draws[k][..., 1]
            feed[i, j, 2] = draws[k + 1][..., 0]
            feed[i, j, 3] = draws[k + 1][..., 1]
            k += 2
        assert k == len(draws)
    return feed


@pytest.mark.parametrize("name", LADDER_CASES)
def test_reference_ladder_parity(goldens, name):
    """FULL-ladder seed-for-seed parity vs the reference's outer path.

    The goldens drove the reference's own patched KSAMPLER.sample +
    KSamplerX0Inpaint through a k-diffusion outer loop (reference
    nodes.py:137-249): initial noise scaling (nodes.py:221 incl. the
    max_denoise sqrt(1+sigma^2) branch), per-step think loops with in-place
    writeback (lanpaint.py:122), outer-early-stop tail indexing
    (nodes.py:177-183, incl. EarlyStop=2), terminal inverse noise scaling
    (nodes.py:248, incl. the leftover-noise flow division), for euler and
    dpmpp_2m, eps and flow.  Here the identical run replays through the
    public LanPaintSampler entry with noise_feed, and every per-step
    denoised output plus the final samples must match.

    The dummy backbone is expressed as (cond, uncond) passes mixed by OUR
    CFG double-pass (guidance.py) with cfg=2/cfg_big=0.5, chosen so the
    mixed pair equals the reference dummy's direct (0.4x+g, 0.55x-0.5g) —
    the ladder therefore also covers the guider algebra end-to-end."""
    from lanpaint_tpu import Denoiser, LanPaintConfig, LanPaintSampler

    z = goldens
    n_think, lamb, step_size, beta, friction, early_stop = (
        float(v) for v in z[f"{name}/meta"])
    kind = ModelKind.FLOW if int(z[f"{name}/kind"]) else ModelKind.EPS
    g = jnp.asarray(z[f"{name}/g"])
    sampler_name = "dpmpp_2m" if "dpmpp2m" in name else "euler"

    def apply(x, t, cond):
        c = cond.reshape((-1,) + (1,) * (x.ndim - 1))
        return c * (0.5 * x) + (1.0 - c) * (0.6 * x - g)

    model = Denoiser(apply=apply, kind=kind)
    config = LanPaintConfig(
        n_steps=int(n_think), lamb=lamb, step_size=step_size, beta=beta,
        friction=friction, outer_early_stop=int(early_stop))
    sam = LanPaintSampler(model, config=config, sampler_name=sampler_name,
                          cfg=2.0, cfg_big=0.5)
    sigmas = z[f"{name}/sigmas"]
    total = len(sigmas) - 1
    shape = z[f"{name}/g"].shape
    feed = build_ladder_feed(z, name, total, max(int(n_think), 1), shape)
    # repaint mask (channel-broadcast): 2D for images, (T, H, W) for the
    # 5D video case — exercised through the api's video mask path
    mask = z[f"{name}/mask"][0, 0]
    video = len(shape) == 5
    samples, den = sam(
        latent=jnp.asarray(z[f"{name}/latent"]), sigmas=sigmas,
        cond=jnp.ones((1, 1), jnp.float32),
        uncond=jnp.zeros((1, 1), jnp.float32),
        mask=jnp.asarray(mask), seed=0, video=video,
        noise=jnp.asarray(z[f"{name}/noise"]),
        noise_feed=jnp.asarray(feed))
    np.testing.assert_allclose(
        np.asarray(den), z[f"{name}/outs"], rtol=5e-4, atol=5e-4,
        err_msg=f"{name}: per-step denoised history mismatch")
    np.testing.assert_allclose(
        np.asarray(samples), z[f"{name}/samples"], rtol=5e-4, atol=5e-4,
        err_msg=f"{name}: final samples mismatch")


@pytest.mark.parametrize("overlap", [3, 9])
def test_maskblend_reference_parity(goldens, overlap):
    """mask_blend vs the reference MaskBlend node's recorded outputs
    (nodes.py:436-477): max-pool dilate + Gaussian feather + lerp."""
    from lanpaint_tpu.masks import mask_blend

    z = goldens
    p = f"maskblend_o{overlap}"
    out = mask_blend(jnp.asarray(z[f"{p}/img1"]), jnp.asarray(z[f"{p}/img2"]),
                     jnp.asarray(z[f"{p}/mask"]), blend_overlap=overlap)
    np.testing.assert_allclose(np.asarray(out), z[f"{p}/out"],
                               rtol=1e-5, atol=1e-5)


def test_maskblend_overlap1_is_finite_hard_blend():
    """Divergence from the reference, on purpose: at its own default
    blend_overlap=1 the reference produces NaN (gaussian_kernel sigma=0,
    nodes.py:467 divides by zero).  Ours guards sigma and degrades to the
    hard mask blend."""
    from lanpaint_tpu.masks import mask_blend

    i1 = jnp.zeros((1, 8, 8, 3))
    i2 = jnp.ones((1, 8, 8, 3))
    m = jnp.zeros((1, 8, 8)).at[:, 2:6, 2:6].set(1.0)
    out = mask_blend(i1, i2, m, blend_overlap=1)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), np.asarray(m[0]),
                               atol=1e-6)


@pytest.mark.slow
def test_goldens_regenerable_live():
    """When /root/reference is present, the committed goldens must match a
    fresh recording (guards against stale .npz after generator edits)."""
    if not os.path.isdir("/root/reference/src/LanPaint"):
        pytest.skip("reference checkout not available")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_reference_goldens",
        os.path.join(os.path.dirname(__file__), "make_reference_goldens.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    lanpaint_mod = gen.import_reference()
    import torch

    fresh = gen.run_case(lanpaint_mod, torch, "eps_n3", "eps", [1.2], 3,
                         (1, 4, 8, 8), data_seed=0)
    z = np.load(DATA)
    np.testing.assert_array_equal(fresh["eps_n3/out"], z["eps_n3/out"])
    np.testing.assert_array_equal(fresh["eps_n3/x_refined"], z["eps_n3/x_refined"])
