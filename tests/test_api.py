"""End-to-end API tests with an analytic toy backbone.

The toy data distribution is x0 = c * ones with c ~ N(0, 1) shared across all
pixels; its exact posterior-mean denoiser is
    x0_hat = mean(x) * N / (N + sigma^2) * ones.
Inpainting a latent whose known half equals 3.0 must pull the unknown half
toward 3.0 — the bidirectional-guidance behavior that plain masked denoising
would not produce.  This exercises the full pipeline end-to-end: noise
scaling, CFG double pass, replace step, think loop, solver scan, blend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu import (
    Denoiser,
    LanPaintConfig,
    LanPaintSampler,
    ModelKind,
    ksampler,
    ksampler_advanced,
    sample_custom,
    sample_custom_advanced,
)
from lanpaint_tpu.sigmas import EpsSigmaTable, FlowSigmaTable, karras


def make_toy_model(kind=ModelKind.EPS):
    def apply(x, t, cond):
        # cond is a (B, 1) bias; posterior mean for the shared-c prior
        n = x[0].size
        if kind is ModelKind.EPS:
            w = n / (n + t.reshape((-1,) + (1,) * (x.ndim - 1)) ** 2)
        else:
            # flow x_t = (1-t) x0 + t eps: posterior mean of c from mean(x)
            tt = t.reshape((-1,) + (1,) * (x.ndim - 1))
            w = (1 - tt) * n / ((1 - tt) ** 2 * n + tt**2)
        c_hat = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True) * w
        bias = cond.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.broadcast_to(c_hat, x.shape) + bias

    table = EpsSigmaTable() if kind is ModelKind.EPS else FlowSigmaTable()
    return Denoiser(apply=apply, kind=kind, sigma_table=table, name="toy")


@pytest.fixture(scope="module")
def toy():
    return make_toy_model()


def test_ksampler_inpaint_pulls_unknown_toward_known(toy):
    latent = jnp.full((1, 4, 16, 16), 3.0, jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0  # repaint right half
    cond = jnp.zeros((1, 1), jnp.float32)
    out = ksampler(
        toy, seed=0, steps=20, cfg=1.0, sampler_name="euler",
        scheduler="karras", positive=cond, latent=latent,
        mask=jnp.asarray(mask), num_steps=5,
    )
    o = np.asarray(out)
    # known half must be exactly-ish preserved through the final blend
    # (sampler output is the last solver x, so known region ~ latent + tail noise)
    assert np.isfinite(o).all()
    # unknown half pulled toward 3.0 (plain prior would give |mean| ~ 1)
    assert abs(o[0, :, :, 8:].mean() - 3.0) < 0.5
    # and the two halves agree (global-coherence prior)
    assert abs(o[0, :, :, 8:].mean() - o[0, :, :, :8].mean()) < 0.3


def test_ksampler_no_mask_plain_sampling(toy):
    latent = jnp.zeros((2, 4, 8, 8), jnp.float32)
    cond = jnp.zeros((2, 1), jnp.float32)
    out = ksampler(toy, seed=1, steps=10, cfg=1.0, sampler_name="euler",
                   scheduler="normal", positive=cond, latent=latent)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # plain sampling of the shared-c prior: each sample is ~ c*ones
    per_sample_std = o.reshape(2, -1).std(axis=1)
    assert (per_sample_std < 0.2).all()


def test_cfg_double_pass_shifts_output(toy):
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    cond = jnp.full((1, 1), 1.0, jnp.float32)
    uncond = jnp.zeros((1, 1), jnp.float32)
    out2 = ksampler(toy, seed=2, steps=10, cfg=2.0, sampler_name="euler",
                    scheduler="karras", positive=cond, negative=uncond,
                    latent=latent)
    out1 = ksampler(toy, seed=2, steps=10, cfg=1.0, sampler_name="euler",
                    scheduler="karras", positive=cond, negative=uncond,
                    latent=latent)
    # cfg=2 doubles the cond bias contribution vs cfg=1
    d2 = float(np.mean(np.asarray(out2)))
    d1 = float(np.mean(np.asarray(out1)))
    assert d2 > d1 + 0.5


def test_ksampler_advanced_leftover_noise(toy):
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    out = ksampler_advanced(
        toy, noise_seed=3, steps=10, cfg=1.0, sampler_name="euler",
        scheduler="normal", positive=cond, latent=latent,
        start_at_step=0, end_at_step=5, return_with_leftover_noise=True,
    )
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # stopped mid-schedule with leftover noise -> std well above clean prior
    assert o.std() > 1.0


def test_ksampler_advanced_resume_roundtrip(toy):
    """Split sampling (0..5, then 5..10 with add_noise=False) must produce a
    finite, denoised result — the reference's sampler-level resume
    (nodes.py:364-366, SURVEY.md section 5 checkpoint/resume)."""
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    mid = ksampler_advanced(
        toy, noise_seed=4, steps=10, cfg=1.0, positive=cond, latent=latent,
        scheduler="normal", end_at_step=5, return_with_leftover_noise=True,
    )
    out = ksampler_advanced(
        toy, noise_seed=4, steps=10, cfg=1.0, positive=cond, latent=mid,
        scheduler="normal", add_noise=False, start_at_step=5,
    )
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert o.reshape(-1).std() < 0.5  # fully denoised: collapses to c*ones


def test_sample_custom_returns_denoised(toy):
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = jnp.ones((8, 8), jnp.float32).at[:, :4].set(0.0)
    cond = jnp.zeros((1, 1), jnp.float32)
    sigmas = jnp.asarray(karras(10, 0.03, 14.6), jnp.float32)
    out, denoised = sample_custom(
        toy, noise_seed=5, cfg=1.0, positive=cond, sampler_name="euler",
        sigmas=sigmas, latent=latent, mask=mask, num_steps=3,
    )
    assert out.shape == latent.shape and denoised.shape == latent.shape
    assert np.isfinite(np.asarray(denoised)).all()
    # denoised output blends the known region exactly
    np.testing.assert_allclose(np.asarray(denoised[0, :, :, :4]), 2.0, atol=1e-4)


def test_sample_custom_advanced_full_knobs(toy):
    latent = jnp.full((1, 4, 8, 8), 1.0, jnp.float32)
    mask = jnp.ones((8, 8), jnp.float32).at[:4, :].set(0.0)
    cond = jnp.zeros((1, 1), jnp.float32)
    sigmas = jnp.asarray(karras(8, 0.03, 14.6), jnp.float32)
    out, denoised = sample_custom_advanced(
        toy, noise_seed=6, cfg=1.0, positive=cond, sampler_name="dpmpp_2m",
        sigmas=sigmas, latent=latent, mask=mask, num_steps=2, lamb=8.0,
        step_size=0.1, beta=0.5, friction=10.0, early_stop=2,
        inner_threshold=0.005, inner_patience=1,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_flow_model_end_to_end():
    toy_flow = make_toy_model(ModelKind.FLOW)
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = jnp.ones((8, 8), jnp.float32).at[:, :4].set(0.0)
    cond = jnp.zeros((1, 1), jnp.float32)
    out = ksampler(toy_flow, seed=7, steps=15, cfg=1.0, sampler_name="euler",
                   scheduler="simple", positive=cond, latent=latent,
                   mask=mask, num_steps=3)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert abs(o[0, :, :, 4:].mean() - 2.0) < 0.6


def test_sampler_reuse_no_recompile(toy):
    """Reusing a LanPaintSampler across seeds must hit the jit cache."""
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    cond = jnp.zeros((1, 1), jnp.float32)
    sigmas = jnp.asarray(karras(5, 0.03, 14.6), jnp.float32)
    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0)
    s1, _ = sam(latent=latent, sigmas=sigmas, cond=cond, seed=0)
    s2, _ = sam(latent=latent, sigmas=sigmas, cond=cond, seed=1)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    assert sam._jit_plain._cache_size() == 1


def test_node_entry_points_reuse_compiled_sampler():
    """ksampler must memoize the LanPaintSampler (same jitted program) across
    calls with identical static hyperparameters — a per-request re-jit means
    a multi-minute recompile per serving request on the remote TPU backend."""
    from lanpaint_tpu.api import _SAMPLER_CACHE, _cached_sampler
    from lanpaint_tpu.config import LanPaintConfig

    model = make_toy_model()
    _SAMPLER_CACHE.clear()
    s1 = _cached_sampler(model, LanPaintConfig(n_steps=2), "euler", 5.0,
                         "Image First")
    s2 = _cached_sampler(model, LanPaintConfig(n_steps=2), "euler", 5.0,
                         "Image First")
    s3 = _cached_sampler(model, LanPaintConfig(n_steps=3), "euler", 5.0,
                         "Image First")
    assert s1 is s2
    assert s3 is not s1


@pytest.mark.parametrize("sampler_name", [
    "euler", "euler_ancestral",
    # history-carrying solvers: SolverCarry + full-ladder deis tables are
    # threaded across segment boundaries, so these must be bit-identical too
    "dpmpp_2m", "dpmpp_3m_sde", "res_multistep", "er_sde",
    "gradient_estimation", "deis",
    # heunpp2 reads three full-ladder scalars; they ride per-step table rows
    # (prepare_tables) so chunked segments keep the global weights
    "heunpp2",
    # dpm_fast chunks at group granularity: each launch gets the FULL ladder
    # plus a static (g0, g1, final) range, so grid/grouping/RNG are the
    # single launch's exactly (reference whitelist nodes.py:292-296 includes
    # dpm_fast; this was the last solver-matrix asymmetry, VERDICT r3)
    "dpm_fast",
])
@pytest.mark.slow
def test_chunked_launches_match_single_launch(sampler_name):
    """chunk_steps splits the ladder into multiple jitted launches; the
    result must equal the single launch exactly (same per-step RNG stream,
    same outer-early-stop indices, multistep history threaded across
    boundaries)."""
    from lanpaint_tpu.api import LanPaintSampler
    from lanpaint_tpu.config import LanPaintConfig
    from lanpaint_tpu.sigmas import calculate_sigmas

    model = make_toy_model()
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    mask = np.zeros((1, 4, 8, 8), np.float32)
    mask[..., :, 4:] = 1.0
    cond, uncond = jnp.full((1, 1), 0.3), jnp.full((1, 1), -0.1)
    sigmas = jnp.asarray(calculate_sigmas(model.sigma_table, "karras", 7),
                         jnp.float32)
    sam = LanPaintSampler(model, config=LanPaintConfig(n_steps=2),
                          sampler_name=sampler_name, cfg=3.0)
    out1, den1 = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=jnp.asarray(mask), seed=5)
    out3, den3 = sam(latent=latent, sigmas=sigmas, cond=cond, uncond=uncond,
                     mask=jnp.asarray(mask), seed=5, chunk_steps=3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out3))
    np.testing.assert_array_equal(np.asarray(den1), np.asarray(den3))


def test_chunked_flow_leftover_noise_inverse_scaling():
    """Terminal inverse scaling (FLOW divides by 1-t) must be applied once,
    at the true end — not per chunk — for partial runs ending at t > 0."""
    from lanpaint_tpu.api import LanPaintSampler
    from lanpaint_tpu.config import LanPaintConfig

    model = make_toy_model(kind=ModelKind.FLOW)
    latent = jnp.zeros((1, 4, 8, 8), jnp.float32)
    sigmas = jnp.asarray([0.9, 0.7, 0.5, 0.35, 0.2], jnp.float32)
    sam = LanPaintSampler(model, config=LanPaintConfig(n_steps=1),
                          sampler_name="euler", cfg=1.0)
    cond = jnp.full((1, 1), 0.2)
    out1, _ = sam(latent=latent, sigmas=sigmas, cond=cond, seed=2)
    out2, _ = sam(latent=latent, sigmas=sigmas, cond=cond, seed=2,
                  chunk_steps=2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


# ---------------------------------------------------------------------------
# think-loop trace surfacing (VERDICT r2 item 2: the reference exposes
# model_options["lanpaint_semantic_trace"]; ours is return_aux / trace=)


def test_return_aux_reports_steps_done(toy):
    """aux.steps_done must show n_steps iterations per outer step and 0 in
    the outer-early-stop tail."""
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:, 4:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    from lanpaint_tpu.sigmas import calculate_sigmas
    sigmas = jnp.asarray(calculate_sigmas(toy.sigma_table, "karras", 6))
    sam = LanPaintSampler(
        toy, config=LanPaintConfig(n_steps=3, outer_early_stop=2),
        sampler_name="euler", cfg=1.0, return_aux=True)
    out, den, aux = sam(latent=latent, sigmas=sigmas, cond=cond,
                        mask=jnp.asarray(mask), seed=0)
    steps = np.asarray(aux.steps_done)
    assert steps.shape == (6,)
    # outer early stop: last 2 steps run 0 think iterations
    np.testing.assert_array_equal(steps, [3, 3, 3, 3, 0, 0])
    assert np.asarray(aux.trace).shape == (6, 3, 8)


def test_return_aux_semantic_stop_spends_fewer_steps(toy):
    """With a huge inner threshold the semantic stopper fires at
    patience+1 = 2 stable iterations; steps_done must reflect the actual
    (reduced) spend, and the trace rows must mark the stop."""
    latent = jnp.full((1, 4, 8, 8), 1.0, jnp.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:, 4:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    from lanpaint_tpu.sigmas import calculate_sigmas
    sigmas = jnp.asarray(calculate_sigmas(toy.sigma_table, "karras", 5))
    sam = LanPaintSampler(
        toy, config=LanPaintConfig(n_steps=8, inner_threshold=0.9,
                                   inner_patience=1, outer_early_stop=1,
                                   record_trace=True),
        sampler_name="euler", cfg=1.0, return_aux=True)
    out, den, aux = sam(latent=latent, sigmas=sigmas, cond=cond,
                        mask=jnp.asarray(mask), seed=0)
    steps = np.asarray(aux.steps_done)
    trace = np.asarray(aux.trace)
    # at least some steps stop early (abt-midrange steps, where the
    # 4*abt*(1-abt) threshold scale is near 1)
    stopped_steps = [i for i, s in enumerate(steps[:-1]) if s < 8]
    assert stopped_steps, steps
    # the row at the stop index carries stopped=1
    for i in stopped_steps:
        s = steps[i]
        assert trace[i, s - 1, 7] == 1.0, (i, s, trace[i])


def test_ksampler_trace_hook(toy):
    """ksampler(trace=dict) fills steps_done + per-inner-step rows (the
    reference's lanpaint_semantic_trace equivalent) without changing the
    samples return."""
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:, 4:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    tr: dict = {}
    out = ksampler(toy, seed=0, steps=5, cfg=1.0, sampler_name="euler",
                   scheduler="karras", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=2, trace=tr)
    assert np.isfinite(np.asarray(out)).all()
    assert tr["steps_done"].shape == (5,)
    np.testing.assert_array_equal(tr["steps_done"], [2, 2, 2, 2, 0])
    # record_trace fills metric rows even with the stopper disabled
    # (threshold 0): inner_step column is populated for executed iterations
    assert tr["trace"].shape == (5, 2, 8)
    assert (tr["trace"][0, :, 0] == [1.0, 2.0]).all()


def test_return_aux_chunked_concatenates(toy):
    """Chunked launches must return the same aux stream as one launch."""
    latent = jnp.full((1, 4, 8, 8), 2.0, jnp.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:, 4:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    from lanpaint_tpu.sigmas import calculate_sigmas
    sigmas = jnp.asarray(calculate_sigmas(toy.sigma_table, "karras", 6))
    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=2),
                          sampler_name="dpmpp_2m", cfg=1.0, return_aux=True)
    o1, d1, a1 = sam(latent=latent, sigmas=sigmas, cond=cond,
                     mask=jnp.asarray(mask), seed=3)
    o2, d2, a2 = sam(latent=latent, sigmas=sigmas, cond=cond,
                     mask=jnp.asarray(mask), seed=3, chunk_steps=2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(a1.steps_done),
                                  np.asarray(a2.steps_done))
    np.testing.assert_array_equal(np.asarray(a1.trace), np.asarray(a2.trace))
