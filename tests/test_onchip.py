"""On-chip end-to-end smoke tests (bench.py selftest set; skipped on CPU).

VERDICT r3 post-mortem: the CPU suite was green while the real pipeline
crashed on the chip (splash kernel tracer leak, only reachable through the
engine's `lax.while_loop`).  These tests drive the PACKAGE BOUNDARY —
`ksampler` through the full engine — on the real TPU with a toy backbone
small enough that the tunnel compile stays in seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="on-chip smoke tests run on the real TPU (bench.py selftest)")


def _toy():
    from lanpaint_tpu import Denoiser, ModelKind
    from lanpaint_tpu.sigmas import EpsSigmaTable

    def apply(x, t, cond):
        n = x[0].size
        w = n / (n + t.reshape((-1,) + (1,) * (x.ndim - 1)) ** 2)
        c_hat = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True) * w
        return jnp.broadcast_to(c_hat, x.shape) + cond.reshape(
            (-1,) + (1,) * (x.ndim - 1))

    return Denoiser(apply=apply, kind=ModelKind.EPS,
                    sigma_table=EpsSigmaTable(), name="toy")


def test_ksampler_end_to_end_on_chip():
    """Tiny full-pipeline run on the chip: noise scaling, CFG, replace step,
    think loop (lax.while_loop), solver scan, blend."""
    from lanpaint_tpu import ksampler

    latent = jnp.full((1, 4, 16, 16), 3.0, jnp.float32)
    mask = np.zeros((16, 16), np.float32)
    mask[:, 8:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    out = ksampler(_toy(), seed=0, steps=8, cfg=1.0, sampler_name="euler",
                   scheduler="karras", positive=cond, latent=latent,
                   mask=jnp.asarray(mask), num_steps=3)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert abs(o[0, :, :, 8:].mean() - 3.0) < 0.8


def test_attention_backbone_inside_engine_on_chip():
    """A backbone whose forward calls attention_bshd on a splash-eligible
    shape (S=2048, D=64), driven through the ENGINE's while_loop — the exact
    call pattern that leaked tracers out of the lru-cached splash kernel in
    round 3 (BENCH_r03 rc=1).  Two sampler launches = two traces reusing the
    cached kernel."""
    from lanpaint_tpu import Denoiser, LanPaintConfig, LanPaintSampler, ModelKind
    from lanpaint_tpu.models.layers import attention_bshd
    from lanpaint_tpu.sigmas import EpsSigmaTable, karras

    def apply(x, t, cond):
        b = x.shape[0]
        # (B, 4, 32, 64) latent -> (B, 2048, 1, 64) token stream
        tok = x.reshape(b, 4 * 32 * 64 // 64, 1, 64).astype(jnp.bfloat16)
        o = attention_bshd(tok, tok, tok)  # auto -> splash at S=2048 on TPU
        return x - 0.1 * o.reshape(x.shape).astype(x.dtype)

    den = Denoiser(apply=apply, kind=ModelKind.EPS,
                   sigma_table=EpsSigmaTable(), name="attn-toy")
    latent = jnp.zeros((1, 4, 32, 64), jnp.float32)
    mask = np.zeros((256, 512), np.float32)
    mask[:, 256:] = 1.0
    cond = jnp.zeros((1, 1), jnp.float32)
    sam = LanPaintSampler(den, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0)
    # different sigma counts -> two DISTINCT jit traces; the second one
    # reuses the kernel the first trace constructed and cached
    for steps in (4, 6):
        sigmas = jnp.asarray(karras(steps, 0.03, 14.6))
        out, _ = sam(latent=latent, sigmas=sigmas, cond=cond,
                     mask=jnp.asarray(mask), seed=0)
        assert np.isfinite(np.asarray(out)).all()
