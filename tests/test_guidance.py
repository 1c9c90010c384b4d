"""CFG double-pass and cfg_big policy unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from lanpaint_tpu.guidance import make_cfg_double_denoiser, resolve_cfg_big


def model_x0(x, t, cond):
    # cond: (B, 1) scalar bias; prediction = bias (ignores x)
    return jnp.broadcast_to(cond.reshape((-1,) + (1,) * (x.ndim - 1)), x.shape)


def test_cfg_mix_values():
    cond = jnp.full((1, 1), 2.0)
    uncond = jnp.full((1, 1), 1.0)
    den = make_cfg_double_denoiser(model_x0, cond, uncond, cfg=3.0, cfg_big=-0.5)
    x = jnp.zeros((1, 2, 4, 4))
    x0, x0_big = den(x, jnp.ones((1,)))
    # x0 = u + (c - u)*cfg = 1 + 1*3 = 4 ; big: 1 + 1*(-0.5) = 0.5
    np.testing.assert_allclose(np.asarray(x0), 4.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_big), 0.5, atol=1e-6)


def test_cfg1_skips_uncond_and_collapses_big():
    """cfg==1 skips the uncond pass: BOTH outputs equal the cond prediction
    regardless of cfg_big (reference nodes.py:86-89 shortcut semantics)."""
    calls = []

    def counting_model(x, t, cond):
        calls.append(x.shape[0])
        return model_x0(x, t, cond)

    cond = jnp.full((1, 1), 2.0)
    uncond = jnp.full((1, 1), 1.0)
    den = make_cfg_double_denoiser(counting_model, cond, uncond, cfg=1.0,
                                   cfg_big=-0.5)
    x0, x0_big = den(jnp.zeros((1, 2, 4, 4)), jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(x0), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_big), 2.0, atol=1e-6)
    assert calls == [1]  # single unbatched forward


def test_cfg1_disable_optimization_forces_double():
    calls = []

    def counting_model(x, t, cond):
        calls.append(x.shape[0])
        return model_x0(x, t, cond)

    cond = jnp.full((1, 1), 2.0)
    uncond = jnp.full((1, 1), 1.0)
    den = make_cfg_double_denoiser(counting_model, cond, uncond, cfg=1.0,
                                   cfg_big=-0.5,
                                   disable_cfg1_optimization=True)
    _, x0_big = den(jnp.zeros((1, 2, 4, 4)), jnp.ones((1,)))
    assert calls == [2]  # batched cond+uncond
    np.testing.assert_allclose(np.asarray(x0_big), 0.5, atol=1e-6)


def test_no_uncond_single_pass():
    cond = jnp.full((1, 1), 2.0)
    den = make_cfg_double_denoiser(model_x0, cond, None, cfg=7.0, cfg_big=3.0)
    x0, x0_big = den(jnp.zeros((1, 2, 4, 4)), jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(x0), 2.0, atol=1e-6)


@pytest.mark.parametrize("mode,cfg,is_flux,want", [
    ("Image First", 5.0, False, 5.0),
    ("Prompt First", 5.0, False, -0.5),
    ("Image First", 5.0, True, 1.0),
    ("Prompt First", 5.0, True, 1.0),
])
def test_cfg_big_policy(mode, cfg, is_flux, want):
    assert resolve_cfg_big(mode, cfg, is_flux) == want


def test_pre_cfg_hook_applied():
    """The pre-CFG hook chain modifies raw predictions before mixing
    (reference sampler_pre_cfg_function, nodes.py:94-97)."""
    cond = jnp.full((1, 1), 2.0)
    uncond = jnp.full((1, 1), 1.0)

    def halve_uncond(args):
        c, u = args["conds_out"]
        return c, u * 0.0

    den = make_cfg_double_denoiser(model_x0, cond, uncond, cfg=2.0,
                                   cfg_big=1.0, pre_cfg_fns=[halve_uncond])
    x0, x0_big = den(jnp.zeros((1, 2, 4, 4)), jnp.ones((1,)))
    # u -> 0: x0 = 0 + (2-0)*2 = 4; big = 0 + 2*1 = 2
    np.testing.assert_allclose(np.asarray(x0), 4.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_big), 2.0, atol=1e-6)


def test_unknown_prompt_mode_raises():
    with pytest.raises(ValueError, match="prompt_mode"):
        resolve_cfg_big("whatever", 5.0)


def test_sequential_matches_batched():
    """sequential=True (two B-sized passes) must equal the batched 2B pass
    bit-for-bit in fp32 — it is the memory-halving video-scale variant."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)

    def model(x, t, cond):
        bias = cond.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.einsum("bchw,cd->bdhw", x, w) * 0.1 + bias + \
            t.reshape((-1,) + (1,) * (x.ndim - 1)) * 0.01

    cond = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    uncond = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.full((2,), 0.7, jnp.float32)
    den_b = make_cfg_double_denoiser(model, cond, uncond, cfg=5.0, cfg_big=-0.5)
    den_s = make_cfg_double_denoiser(model, cond, uncond, cfg=5.0, cfg_big=-0.5,
                                     sequential=True)
    for a, b in zip(den_b(x, t), den_s(x, t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
