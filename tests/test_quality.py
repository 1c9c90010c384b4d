"""Masked-region quality metrics (lanpaint_tpu.quality).

The BASELINE.json north star is "masked-region LPIPS within 1% of
reference"; these CPU-toy tests pin the metric semantics (locality to the
mask, identity, known-value behavior) so real-weight evaluation is
plug-and-measure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu import quality


def _imgs(key, b=1, c=3, h=64, w=64):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    a = jax.random.uniform(k1, (b, c, h, w), jnp.float32, -1.0, 1.0)
    return a


def _left_mask(h=64, w=64):
    m = np.zeros((h, w), np.float32)
    m[:, : w // 2] = 1.0
    return jnp.asarray(m)


def test_masked_psnr_identity_and_locality():
    a = _imgs(0)
    mask = _left_mask()
    assert float(quality.masked_psnr(a, a, mask)) > 100.0
    # perturb OUTSIDE the mask: masked PSNR unchanged (still identical inside)
    b = a.at[:, :, :, 48:].add(0.5)
    assert float(quality.masked_psnr(a, b, mask)) > 100.0
    # perturb INSIDE: drops
    c = a.at[:, :, :, :16].add(0.5)
    p = float(quality.masked_psnr(a, c, mask))
    assert p < 30.0
    # reference value: uniform +0.5 on half the masked area ->
    # mse = 0.25 * 0.5, psnr = 10 log10(4 / 0.125)
    np.testing.assert_allclose(p, 10 * np.log10(4 / 0.125), rtol=1e-5)


def test_masked_ssim_identity_and_range():
    a = _imgs(1)
    mask = _left_mask()
    assert float(quality.masked_ssim(a, a, mask)) == pytest.approx(1.0, abs=1e-5)
    # independent noise inside the mask: structure term collapses toward 0
    # (note SSIM(x, -x) is ~ +1 for zero-mean x — sign flips cancel — so a
    # sign flip is NOT a valid "different image" probe)
    noise = jax.random.uniform(jax.random.PRNGKey(99), a.shape,
                               jnp.float32, -1.0, 1.0)
    b = a.at[:, :, :, :32].set(noise[:, :, :, :32])
    s = float(quality.masked_ssim(a, b, mask))
    assert -1.0 <= s < 0.5
    # perturbation far outside the mask (beyond the 11px window reach)
    c = a.at[:, :, :, 50:].add(0.7)
    np.testing.assert_allclose(float(quality.masked_ssim(a, c, mask)),
                               1.0, atol=1e-5)


def test_lpips_identity_positivity_locality():
    params = quality.init_lpips_params(jax.random.PRNGKey(0))
    a = _imgs(2)
    mask = _left_mask()
    d_same = np.asarray(quality.lpips(params, a, a))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    b = a.at[:, :, :, :16].add(0.8)
    assert float(jnp.mean(quality.lpips(params, a, b))) > 1e-4
    # masked LPIPS responds far more to in-mask than out-of-mask changes
    far = a.at[:, :, :, 56:].add(0.8)
    d_in = float(jnp.mean(quality.lpips(params, a, b, mask)))
    d_out = float(jnp.mean(quality.lpips(params, a, far, mask)))
    assert d_in > 5 * max(d_out, 1e-8)


def test_lpips_jittable():
    params = quality.init_lpips_params(jax.random.PRNGKey(1))
    a = _imgs(3, h=32, w=32)
    b = a + 0.1
    f = jax.jit(quality.lpips)
    np.testing.assert_allclose(np.asarray(f(params, a, b)),
                               np.asarray(quality.lpips(params, a, b)),
                               rtol=1e-5, atol=1e-6)


def test_load_lpips_params_from_torch():
    torch = pytest.importorskip("torch")
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    cin = 3
    for idx, w in zip(conv_idx, widths):
        sd[f"features.{idx}.weight"] = torch.randn(w, cin, 3, 3)
        sd[f"features.{idx}.bias"] = torch.zeros(w)
        cin = w
    ld = {}
    for i, ch in enumerate([64, 128, 256, 512, 512]):
        ld[f"lin{i}.model.1.weight"] = torch.rand(1, ch, 1, 1)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        vp, lp = os.path.join(d, "vgg.pth"), os.path.join(d, "lin.pth")
        torch.save(sd, vp)
        torch.save(ld, lp)
        params = quality.load_lpips_params(vp, lp)
    assert params["vgg"]["conv0"]["kernel"].shape == (64, 3, 3, 3)
    assert params["vgg"]["conv12"]["kernel"].shape == (512, 512, 3, 3)
    assert params["lin"]["lin4"].shape == (512,)
    # loaded params run end-to-end
    a = _imgs(4, h=32, w=32)
    d0 = float(jnp.mean(quality.lpips(params, a, a)))
    assert d0 == pytest.approx(0.0, abs=1e-6)


def test_quality_report_keys():
    a = _imgs(5)
    b = a.at[:, :, 20:40, 20:40].add(0.3)
    mask = _left_mask()
    q = quality.quality_report(a, b, mask)
    assert set(q) == {"masked_psnr", "masked_ssim"}
    params = quality.init_lpips_params(jax.random.PRNGKey(2))
    q2 = quality.quality_report(a, b, mask, lpips_params=params)
    assert "masked_lpips" in q2 and np.isfinite(q2["masked_lpips"])
