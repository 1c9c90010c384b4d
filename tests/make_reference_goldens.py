"""Generate golden records by driving the ACTUAL reference implementation.

Runs the reference LanPaint engine (scraed/LanPaint, mounted read-only at
/root/reference) on torch-CPU with a deterministic dummy denoiser and
*patched RNG*: every stochastic draw (`torch.randn_like` for the stationary
velocity init, utils.py:254, and the MultivariateNormal position/velocity
sample, utils.py:295-298) is replaced by a recorded standard-normal array.
The recorded draws, inputs, and outputs are written to
tests/data/reference_goldens.npz; tests/test_reference_golden.py replays the
same draws through `lanpaint_tpu.engine.lanpaint_update(noise_feed=...)` and
requires the refined latent and blended x0 to match step-for-step.

This is the sanctioned seed-for-seed parity mechanism (docs/rng.md): the
reference consumes torch *global* RNG, so cross-framework parity is only
possible by replaying identical draws.  The fake MultivariateNormal applies
exactly the reference's own sampling law `loc + scale_tril @ eps` with the
reference-computed loc/scale_tril (utils.py:268-300) — nothing is reimplemented
on the torch side.

Usage:  python tests/make_reference_goldens.py
(Only needed to regenerate tests/data/reference_goldens.npz; the committed
file is what CI consumes.)
"""

import importlib
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def import_reference():
    """Import the reference's src/LanPaint as a package without touching it."""
    pkg = types.ModuleType("ref_lanpaint_pkg")
    pkg.__path__ = [REFERENCE_ROOT + "/src/LanPaint"]
    sys.modules["ref_lanpaint_pkg"] = pkg
    return importlib.import_module("ref_lanpaint_pkg.lanpaint")


class DrawRecorder:
    """Deterministic stand-in for torch's stochastic draws, with a log."""

    def __init__(self, torch, seed):
        self.torch = torch
        self.rng = np.random.default_rng(seed)
        self.log = []  # list of (tag, np.ndarray fp32)

    def normal(self, shape, tag):
        a = self.rng.standard_normal(shape).astype(np.float32)
        self.log.append((tag, a))
        return self.torch.from_numpy(a)

    def fake_randn_like(self, t):
        return self.normal(tuple(t.shape), "randn").to(t.dtype)

    def make_fake_mvn(self):
        recorder = self

        class FakeMVN:
            """loc + scale_tril @ eps — exactly MultivariateNormal.sample's law.

            Like the real torch.distributions.MultivariateNormal (which
            validates args by default), construction raises ValueError when
            loc/scale_tril are non-finite — BEFORE any draw is consumed.
            That is what routes the reference into run_overdamped at
            friction=0 (lanpaint.py:244 catches it): verified against real
            torch 2026-08-19 — MVN(..., nan) raises at __init__ with zero
            RNG consumption."""

            def __init__(self, loc, scale_tril):
                t = recorder.torch
                if not bool(t.isfinite(loc).all() & t.isfinite(scale_tril).all()):
                    raise ValueError("Expected parameter loc/scale_tril to "
                                     "satisfy finiteness constraints")
                self.loc = loc
                self.scale_tril = scale_tril

            def sample(self):
                eps = recorder.normal(tuple(self.loc.shape), "mvn")
                eps = eps.to(self.loc.dtype)
                t = recorder.torch
                return self.loc + t.einsum("...ij,...j->...i", self.scale_tril, eps)

        return FakeMVN


def unified_times(sigma_native, kind):
    """(VE_Sigma, abt, Flow_t) float32, same formulas both frameworks use."""
    s = sigma_native.astype(np.float32)
    if kind == "flow":
        t = s
        one_m_t = np.float32(1.0) - t
        abt = one_m_t**2 / (one_m_t**2 + t**2)
        ve = t / one_m_t
        return ve, abt, t
    abt = np.float32(1.0) / (np.float32(1.0) + s**2)
    sq = np.sqrt(np.float32(1.0) - abt)
    return s, abt, sq / (sq + np.sqrt(abt))


def make_dummy_model(torch, g, kind):
    """x0 = 0.4*x + g ; x0_BIG = 0.55*x - 0.5*g — linear, fp32-exact."""
    g_t = torch.from_numpy(g)

    class _Sampling:
        @staticmethod
        def noise_scaling(sigma, noise, latent_image):
            if kind == "flow":
                return sigma * noise + (1.0 - sigma) * latent_image
            return latent_image + noise * sigma

    class _Inner:
        model_sampling = _Sampling()

    class Model:
        inner_model = _Inner()

        def __call__(self, x, t, model_options=None, seed=None):
            return (0.4 * x + g_t, 0.55 * x - 0.5 * g_t)

    return Model()


def run_case(lanpaint_mod, torch, name, kind, sigma_native, n_steps, shape,
             lamb=16.0, step_size=0.2, beta=1.0, friction=15.0, data_seed=0,
             stop_threshold=0.0, stop_patience=1, custom_distance=False,
             expect_fallback=False):
    rng = np.random.default_rng(data_seed)
    b = shape[0]
    x = rng.standard_normal(shape).astype(np.float32)
    latent = (0.3 * rng.standard_normal(shape)).astype(np.float32)
    noise = rng.standard_normal(shape).astype(np.float32)
    # irregular known-region mask (1 = known), ~60% known
    mask = (rng.random(shape[2:]) < 0.6).astype(np.float32)
    mask = np.broadcast_to(mask, shape).copy()
    g = (0.2 * rng.standard_normal(shape)).astype(np.float32)

    sigma_native = np.asarray(sigma_native, np.float32).reshape(b)
    ve, abt, tflow = unified_times(sigma_native, kind)

    base_model = make_dummy_model(torch, g, kind)
    calls = {"n": 0}

    class CountingModel:
        inner_model = base_model.inner_model

        def __call__(self, x, t, model_options=None, seed=None):
            calls["n"] += 1
            return base_model(x, t, model_options=model_options, seed=seed)

    model = CountingModel()
    # canonical 3-arg custom metric (earlystop.py:216-218): mean |cur - prev|
    # over the latent; expressed identically on the jax side in the test
    hook = (lambda prev, cur, ctx: torch.mean(torch.abs(cur - prev))) \
        if custom_distance else None
    lp = lanpaint_mod.LanPaint(
        model, NSteps=n_steps, Friction=friction, Lambda=lamb, Beta=beta,
        StepSize=step_size, IS_FLUX=False, IS_FLOW=(kind == "flow"),
        EarlyStopThreshold=stop_threshold, EarlyStopPatience=stop_patience,
        EarlyStopHook=hook,
    )

    rec = DrawRecorder(torch, data_seed + 1000)
    saved_randn = torch.randn_like
    saved_mvn = torch.distributions.MultivariateNormal
    try:
        torch.randn_like = rec.fake_randn_like
        torch.distributions.MultivariateNormal = rec.make_fake_mvn()
        x_in = torch.from_numpy(x.copy())
        out = lp(
            x_in,
            torch.from_numpy(latent),
            torch.from_numpy(noise),
            torch.from_numpy(sigma_native),
            torch.from_numpy(mask),
            (torch.from_numpy(ve), torch.from_numpy(abt), torch.from_numpy(tflow)),
            {},  # model_options
            0,   # seed
            n_steps,
        )
    finally:
        torch.randn_like = saved_randn
        torch.distributions.MultivariateNormal = saved_mvn

    # think iterations actually executed (early stop may break before
    # n_steps); each langevin iteration = 1 model call, + 1 final denoise.
    tags = [t for t, _ in rec.log]
    if expect_fallback:
        # NaN/overdamped regime (lanpaint.py:241-250).  Per iteration:
        #   cold: run_damped does Coef_C (model call) + v-init randn, then
        #         MVN __init__ raises (NO mvn draw) -> run_overdamped does
        #         Coef_C AGAIN (2nd model call, same x_t) + one randn.
        #   warm: run_damped's first advance_time draws the v-init randn
        #         then raises BEFORE its Coef_C -> run_overdamped: randn
        #         (half 1) + Coef_C (the only model call) + randn (half 2).
        # So calls = 2 + (executed-1) + 1 final.
        executed = calls["n"] - 2
        expected = [] if executed <= 0 else (
            ["randn", "randn"] + ["randn", "randn", "randn"] * (executed - 1))
    else:
        executed = calls["n"] - 1
        expected = [] if executed == 0 else (
            ["randn", "mvn"] + ["mvn", "mvn"] * (executed - 1))
    if tags != expected:
        raise RuntimeError(
            f"{name}: unexpected draw sequence {tags} (expected {expected}) — "
            "the reference hit (or missed) the overdamped fallback or "
            "changed structure")

    arrays = {
        "x": x, "latent": latent, "noise": noise, "mask": mask, "g": g,
        "sigma_native": sigma_native, "ve": ve, "abt": abt, "tflow": tflow,
        "out": out.numpy().astype(np.float32),
        "x_refined": x_in.numpy().astype(np.float32),  # in-place writeback
        "meta": np.array([n_steps, lamb, step_size, beta, friction], np.float32),
        "stop": np.array([stop_threshold, stop_patience, executed,
                          float(custom_distance)], np.float32),
        "kind": np.array(1 if kind == "flow" else 0, np.int32),
        "fallback": np.array(1 if expect_fallback else 0, np.int32),
    }
    for j, (_, a) in enumerate(rec.log):
        arrays[f"draw{j}"] = a
    arrays["n_draws"] = np.array(len(rec.log), np.int32)
    return {f"{name}/{k}": v for k, v in arrays.items()}


def kdiff_sample_euler(torch, model, x, sigmas, extra_args=None,
                       callback=None, disable=None):
    """Faithful re-derivation of k-diffusion's sample_euler at its defaults
    (s_churn=0 so sigma_hat == sigma; Karras et al. 2022 Alg. 2 — the
    public algorithm ComfyUI's comfy/k_diffusion/sampling.py ships and the
    reference whitelists, reference nodes.py:292-296)."""
    extra_args = {} if extra_args is None else extra_args
    s_in = torch.ones((x.shape[0],), dtype=x.dtype)
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i] * s_in, **extra_args)
        if callback is not None:
            callback({"x": x, "i": i, "sigma": sigmas[i], "denoised": denoised})
        d = (x - denoised) / sigmas[i]
        x = x + d * (sigmas[i + 1] - sigmas[i])
    return x


def kdiff_sample_dpmpp_2m(torch, model, x, sigmas, extra_args=None,
                          callback=None, disable=None):
    """Faithful re-derivation of k-diffusion's sample_dpmpp_2m (DPM-Solver++
    2M, Lu et al. 2022 — public algorithm, same provenance as above)."""
    extra_args = {} if extra_args is None else extra_args
    s_in = torch.ones((x.shape[0],), dtype=x.dtype)
    sigma_fn = lambda t: t.neg().exp()
    t_fn = lambda s: s.log().neg()
    old_denoised = None
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i] * s_in, **extra_args)
        if callback is not None:
            callback({"x": x, "i": i, "sigma": sigmas[i], "denoised": denoised})
        t, t_next = t_fn(sigmas[i]), t_fn(sigmas[i + 1])
        h = t_next - t
        if old_denoised is None or sigmas[i + 1] == 0:
            x = sigma_fn(t_next) / sigma_fn(t) * x - (-h).expm1() * denoised
        else:
            h_last = t - t_fn(sigmas[i - 1])
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised \
                - (1 / (2 * r)) * old_denoised
            x = sigma_fn(t_next) / sigma_fn(t) * x - (-h).expm1() * denoised_d
        old_denoised = denoised
    return x


def run_ladder_case(torch, ref_nodes, name, kind, sampler_name, sigma_ladder,
                    n_think, shape, early_stop=1, data_seed=0, lamb=16.0,
                    step_size=0.2, beta=1.0, friction=15.0):
    """Drive the reference's FULL outer path for one sigma ladder.

    Uses the reference's own patched `KSAMPLER.sample` and
    `KSamplerX0Inpaint` (reference nodes.py:137-249) — initial noise
    scaling (nodes.py:221), per-step think loops with in-place writeback
    (lanpaint.py:122), the outer-early-stop tail (nodes.py:177-183) and the
    terminal inverse noise scaling (nodes.py:248) — under recorded RNG, so
    tests/test_reference_golden.py can replay the identical ladder through
    `LanPaintSampler(noise_feed=...)` and require step-for-step equality."""
    rng = np.random.default_rng(data_seed)
    latent = (0.3 * rng.standard_normal(shape)).astype(np.float32)
    noise = rng.standard_normal(shape).astype(np.float32)
    # repaint mask (1 = inpaint), ~40% repaint, broadcast over channels
    mask2d = (rng.random(shape[2:]) < 0.4).astype(np.float32)
    mask = np.broadcast_to(mask2d, shape).copy()
    g = (0.2 * rng.standard_normal(shape)).astype(np.float32)
    sigmas = np.asarray(sigma_ladder, np.float32)
    base_model = make_dummy_model(torch, g, kind)

    stub_model_type = ("FLOW" if kind == "flow" else object())

    class _Inner:
        model_type = stub_model_type

    # comfy EPS.noise_scaling has the max_denoise sqrt(1+sigma^2) branch the
    # per-step dummy never needed; reproduce comfy's exact semantics here
    class _MS:
        @staticmethod
        def noise_scaling(sigma, noise, latent_image, max_denoise=False):
            if kind == "flow":
                return sigma * noise + (1.0 - sigma) * latent_image
            if max_denoise:
                noise = noise * torch.sqrt(1.0 + sigma ** 2)
            else:
                noise = noise * sigma
            return noise + latent_image

        @staticmethod
        def inverse_noise_scaling(sigma, latent):
            if kind == "flow":
                return latent / (1.0 - sigma)
            return latent

    _Inner.model_sampling = _MS()

    import types as _types

    patcher = _types.SimpleNamespace(
        LanPaint_NumSteps=n_think, LanPaint_Friction=friction,
        LanPaint_Lambda=lamb, LanPaint_Beta=beta,
        LanPaint_StepSize=step_size, LanPaint_EarlyStop=early_stop,
        LanPaint_cfg_BIG=0.5,
    )
    calls = {"n": 0}

    class ModelWrap:
        inner_model = _Inner()
        model_patcher = patcher

        def __call__(self, x, t, model_options=None, seed=None):
            calls["n"] += 1
            return base_model(x, t, model_options=model_options, seed=seed)

    model_wrap = ModelWrap()

    sampler = ref_nodes.KSAMPLER.__new__(ref_nodes.KSAMPLER)
    sampler.inpaint_options = {}
    sampler.extra_options = {}
    sampler.max_denoise = lambda mw, sig: kind != "flow"
    kdiff = {"euler": kdiff_sample_euler,
             "dpmpp_2m": kdiff_sample_dpmpp_2m}[sampler_name]
    sampler.sampler_function = lambda *a, **k: kdiff(torch, *a, **k)

    steps_rec = []  # per outer step: (i, out, x_refined, log_len, calls)
    rec = DrawRecorder(torch, data_seed + 2000)

    def record_cb(i, denoised, x, total):
        steps_rec.append((i, denoised.numpy().astype(np.float32).copy(),
                          x.numpy().astype(np.float32).copy(),
                          len(rec.log), calls["n"]))

    saved_randn = torch.randn_like
    saved_mvn = torch.distributions.MultivariateNormal
    try:
        torch.randn_like = rec.fake_randn_like
        torch.distributions.MultivariateNormal = rec.make_fake_mvn()
        samples = sampler.sample(
            model_wrap, torch.from_numpy(sigmas.copy()),
            {"model_options": {}, "seed": 0},
            record_cb, torch.from_numpy(noise.copy()),
            latent_image=torch.from_numpy(latent.copy()),
            denoise_mask=torch.from_numpy(mask.copy()),
        )
    finally:
        torch.randn_like = saved_randn
        torch.distributions.MultivariateNormal = saved_mvn

    total = len(sigmas) - 1
    assert len(steps_rec) == total, (name, len(steps_rec), total)
    # validate the draw sequence and call counts step-for-step: non-tail
    # steps run exactly n_think langevin iterations (no inner stop here)
    # + 1 final denoise; tail steps (outer early stop) 1 call, 0 draws
    tags = [t for t, _ in rec.log]
    expected, bounds = [], []
    exec_per_step = []
    for i in range(total):
        tail = (total - i) <= early_stop
        e = 0 if tail else n_think
        exec_per_step.append(e)
        expected += [] if e == 0 else (["randn", "mvn"] + ["mvn", "mvn"] * (e - 1))
        bounds.append(len(expected))
    if tags != expected:
        raise RuntimeError(f"{name}: draw sequence {tags} != {expected}")
    assert calls["n"] == sum(e + 1 for e in exec_per_step), (
        name, calls["n"], exec_per_step)
    # the callback fires AFTER step j's model call, so the draw log must
    # stand exactly at that step's cumulative boundary
    for j, (i, _, _, log_len, ncalls) in enumerate(steps_rec):
        assert i == j and log_len == bounds[j], (
            f"{name}: step {j} draw boundary {log_len} != {bounds[j]}")

    arrays = {
        "latent": latent, "noise": noise, "mask": mask, "g": g,
        "sigmas": sigmas,
        "samples": samples.numpy().astype(np.float32),
        "outs": np.stack([s[1] for s in steps_rec]),
        "xs": np.stack([s[2] for s in steps_rec]),
        "executed": np.asarray(exec_per_step, np.int32),
        "meta": np.array([n_think, lamb, step_size, beta, friction,
                          early_stop], np.float32),
        "kind": np.array(1 if kind == "flow" else 0, np.int32),
        "n_draws": np.array(len(rec.log), np.int32),
        "bounds": np.asarray([0] + bounds, np.int32),
    }
    for j, (_, a) in enumerate(rec.log):
        arrays[f"draw{j}"] = a
    return {f"{name}/{k}": v for k, v in arrays.items()}


def import_reference_package():
    """The full reference package (installs its own comfy stubs) — gives the
    real node classes (MaskBlend, KSAMPLER, KSamplerX0Inpaint)."""
    if "lanpaint_ref" in sys.modules:
        return sys.modules["lanpaint_ref"]
    spec = importlib.util.spec_from_file_location(
        "lanpaint_ref", REFERENCE_ROOT + "/__init__.py",
        submodule_search_locations=[REFERENCE_ROOT])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["lanpaint_ref"] = mod
    spec.loader.exec_module(mod)
    return mod


def run_maskblend_cases(torch):
    """Goldens from the reference's actual MaskBlend node (nodes.py:436-477).

    Only odd overlaps >= 3: at the node's own default blend_overlap=1 the
    reference produces NaN (sigma=(k-1)/4=0 divides by zero in
    gaussian_kernel, nodes.py:467) — our implementation guards sigma and
    yields the hard blend instead; tested separately."""
    ref = import_reference_package()
    mb = ref.NODE_CLASS_MAPPINGS["LanPaint_MaskBlend"]()
    rng = np.random.default_rng(42)
    out = {}
    for overlap in (3, 9):
        img1 = rng.random((2, 24, 24, 3)).astype(np.float32)
        img2 = rng.random((2, 24, 24, 3)).astype(np.float32)
        mask = np.zeros((2, 24, 24), np.float32)
        mask[0, 6:18, 4:20] = 1.0
        mask[1] = (rng.random((24, 24)) < 0.4).astype(np.float32)
        blended, = mb.blend_images(
            torch.from_numpy(img1), torch.from_numpy(img2),
            torch.from_numpy(mask), overlap)
        p = f"maskblend_o{overlap}"
        out.update({f"{p}/img1": img1, f"{p}/img2": img2, f"{p}/mask": mask,
                    f"{p}/out": blended.numpy().astype(np.float32)})
    return out


def main():
    lanpaint_mod = import_reference()
    import torch

    torch.set_num_threads(1)
    cases = {}
    cases.update(run_case(lanpaint_mod, torch, "eps_n3", "eps",
                          [1.2], 3, (1, 4, 8, 8), data_seed=0))
    cases.update(run_case(lanpaint_mod, torch, "eps_n1", "eps",
                          [0.35], 1, (1, 4, 8, 8), data_seed=1))
    cases.update(run_case(lanpaint_mod, torch, "eps_n0", "eps",
                          [2.5], 0, (1, 4, 8, 8), data_seed=2))
    cases.update(run_case(lanpaint_mod, torch, "eps_b2", "eps",
                          [1.2, 0.5], 3, (2, 4, 6, 6), data_seed=3))
    cases.update(run_case(lanpaint_mod, torch, "flow_n3", "flow",
                          [0.6], 3, (1, 4, 8, 8), data_seed=4))
    cases.update(run_case(lanpaint_mod, torch, "flow_n2_video", "flow",
                          [0.8], 2, (1, 4, 3, 6, 6), data_seed=5))
    cases.update(run_case(lanpaint_mod, torch, "eps_params", "eps",
                          [0.9], 2, (1, 4, 8, 8),
                          lamb=4.0, step_size=0.5, beta=2.0, friction=6.0,
                          data_seed=6))
    # semantic early stop: must break before n_steps=12 and at the SAME
    # iteration our engine stops at under replayed draws
    cases.update(run_case(lanpaint_mod, torch, "eps_earlystop", "eps",
                          [0.8], 12, (1, 4, 8, 8), data_seed=7,
                          stop_threshold=0.4, stop_patience=1))
    cases.update(run_case(lanpaint_mod, torch, "eps_earlystop_p2", "eps",
                          [0.8], 12, (1, 4, 8, 8), data_seed=8,
                          stop_threshold=0.6, stop_patience=2))
    # pluggable custom distance metric (raw threshold, no abt scaling)
    cases.update(run_case(lanpaint_mod, torch, "eps_customdist", "eps",
                          [0.8], 12, (1, 4, 8, 8), data_seed=9,
                          stop_threshold=0.3, stop_patience=1,
                          custom_distance=True))
    # NaN/overdamped regime (VERDICT r3 task 4): friction=0 (a legal UI
    # value, reference nodes.py:372 range 0-50) makes Gamma=0 -> the damped
    # SHO coefficients are NaN -> MultivariateNormal.__init__ raises ->
    # run_overdamped retries EVERY iteration (lanpaint.py:241-250).  With a
    # deterministic model the reference's retry (fresh Coef_C chain) and our
    # per-element select evaluate the model at the SAME points, so parity
    # here is exact; the semantics only diverge on PARTIAL NaN (one region
    # finite, one not) where the reference retries the whole step.
    cases.update(run_case(lanpaint_mod, torch, "eps_nanfallback", "eps",
                          [1.1], 1, (1, 4, 8, 8), friction=0.0,
                          data_seed=10, expect_fallback=True))
    cases.update(run_case(lanpaint_mod, torch, "eps_nanfallback_warm", "eps",
                          [0.7], 3, (1, 4, 8, 8), friction=0.0,
                          data_seed=11, expect_fallback=True))
    cases.update(run_maskblend_cases(torch))

    # Full-ladder cases: the reference's complete outer path (patched
    # KSAMPLER.sample + KSamplerX0Inpaint + k-diffusion loop) end-to-end.
    import_reference_package()
    ref_nodes = sys.modules["lanpaint_ref.src.LanPaint.nodes"]
    eps_ladder = [14.6, 6.0, 2.4, 1.0, 0.4, 0.15, 0.0]
    flow_ladder = [0.96, 0.8, 0.62, 0.44, 0.26, 0.12, 0.0]
    cases.update(run_ladder_case(torch, ref_nodes, "ladder_euler_eps",
                                 "eps", "euler", eps_ladder, 2, (1, 4, 8, 8),
                                 data_seed=20))
    cases.update(run_ladder_case(torch, ref_nodes, "ladder_dpmpp2m_eps",
                                 "eps", "dpmpp_2m", eps_ladder, 2,
                                 (1, 4, 8, 8), data_seed=21))
    cases.update(run_ladder_case(torch, ref_nodes, "ladder_euler_flow",
                                 "flow", "euler", flow_ladder, 2,
                                 (1, 4, 8, 8), data_seed=22))
    # leftover-noise ladder (ends at t=0.12): exercises the terminal
    # inverse_noise_scaling division (reference nodes.py:248)
    cases.update(run_ladder_case(torch, ref_nodes,
                                 "ladder_euler_flow_leftover", "flow",
                                 "euler", flow_ladder[:-1], 2, (1, 4, 8, 8),
                                 data_seed=23))
    # deeper outer-early-stop tail (EarlyStop=2): the LAST TWO steps must
    # skip thinking (reference nodes.py:177-183 indexing)
    cases.update(run_ladder_case(torch, ref_nodes, "ladder_euler_eps_tail2",
                                 "eps", "euler", eps_ladder, 2, (1, 4, 8, 8),
                                 early_stop=2, data_seed=24))
    # 5D video latents through the whole outer path (the reference's 🎬
    # mode shape; per-step video parity exists, this covers the ladder)
    cases.update(run_ladder_case(torch, ref_nodes, "ladder_euler_eps_video",
                                 "eps", "euler", eps_ladder, 2,
                                 (1, 4, 3, 6, 6), data_seed=25))

    import os

    out_path = os.path.join(os.path.dirname(__file__), "data", "reference_goldens.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **cases)
    print(f"wrote {out_path}: {len(cases)} arrays, "
          f"{sum(v.nbytes for v in cases.values()) / 1e6:.2f} MB raw")


if __name__ == "__main__":
    main()
