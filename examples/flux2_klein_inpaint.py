"""Flux2-Klein inpainting (reference example_workflows/
Flux2_Klein_inpainting.json: LanPaint_SamplerCustomAdvanced with 2
think-steps, lambda 8, step-size 0.2, CFGGuider cfg 5, euler, 20 steps;
flux-2-klein-base-9b + Qwen3-8B text features + flux2-vae).

The workflow routes the source image's VAE latent through ReferenceLatent
nodes into BOTH the positive and negative conditioning (real CFG at 5) —
mirrored here via cond["ref_tokens"] on both conds.

FLUX2_KLEIN_CONFIG is a structural stand-in on the generic MMDiT — the
encoder width (4096) and reference-latent conditioning are workflow-pinned
facts, the DiT topology is not retrievable offline (docs/family_facts.md)."""

import jax.numpy as jnp

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import sample_custom_advanced
from lanpaint_tpu.models.dit import FLUX2_KLEIN_CONFIG, TINY_DIT_CONFIG, pack_latent
from lanpaint_tpu.models.load import import_dit_guarded, load_safetensors
from lanpaint_tpu.models.zoo import build_flux2_klein, build_tiny_dit
from lanpaint_tpu.sigmas import resolution_shift_sigmas


def main():
    args = example_argparser("Flux2-Klein LanPaint inpainting").parse_args()
    if args.checkpoint:
        cfg = FLUX2_KLEIN_CONFIG
        params = import_dit_guarded(load_safetensors(args.checkpoint), cfg,
                                    family="flux2-klein")
        model, _ = build_flux2_klein(params)
        b, hw = 1, 128
        cond = {"context": jnp.zeros((b, 512, cfg.context_dim), jnp.float32)}
        uncond = {"context": jnp.zeros((b, 512, cfg.context_dim), jnp.float32)}
    else:
        model, _ = build_tiny_dit()
        cfg = TINY_DIT_CONFIG
        b, hw = 1, 16
        cond = {"context": jnp.zeros((b, 8, cfg.context_dim), jnp.float32),
                "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}
        uncond = {"context": jnp.ones((b, 8, cfg.context_dim), jnp.float32) * 0.1,
                  "vec": jnp.zeros((b, cfg.vec_dim), jnp.float32)}

    latent = jnp.zeros((b, cfg.latent_channels, hw, hw), jnp.float32)
    # ReferenceLatent on BOTH conds (workflow-pinned: two ReferenceLatent
    # nodes feed positive and negative under CFGGuider 5)
    ref = pack_latent(latent, cfg.patch)
    cond["ref_tokens"] = ref
    uncond["ref_tokens"] = ref
    mask = center_square_mask(hw * 8, hw * 8)
    # Flux2Scheduler [steps, 1024, 1024] (workflow-pinned)
    sigmas = jnp.asarray(
        resolution_shift_sigmas(args.steps, hw * 8, hw * 8))

    out, denoised = sample_custom_advanced(
        model, noise_seed=args.seed, cfg=5.0, positive=cond,
        negative=uncond,
        sampler_name="euler", sigmas=sigmas, latent=latent, mask=mask,
        num_steps=2, lamb=8.0, step_size=0.2,
    )
    report("flux2_klein_inpaint", out)


if __name__ == "__main__":
    main()
