"""Complete SDXL pipeline from ONE single-file checkpoint: text -> image.

The reference's SDXL workflow loads everything through its host's
CheckpointLoaderSimple node (reference example_workflows/SDXL_Inpaint.json);
here one safetensors file is split into UNet + CLIP-L + CLIP-G + VAE
(load.split_checkpoint), both text encoders run natively on device
(models/textenc.py), the prompt is tokenized by the standalone CLIP BPE
(tokenizers.py, vocab files next to the checkpoint), and the pixel-level
inpaint runs VAE encode -> LanPaint -> VAE decode -> MaskBlend.

Usage:
    python examples/sdxl_single_file.py \
        --checkpoint sd_xl_base_1.0.safetensors \
        --vocab vocab.json --merges merges.txt \
        --prompt "a corgi wearing sunglasses"

Without --checkpoint, runs the same pipeline end to end at tiny scale with
random weights and a byte-alphabet tokenizer (smoke mode).
"""

import numpy as np

from common import center_square_mask, example_argparser, report
from lanpaint_tpu import tokenizers as tk
from lanpaint_tpu.api import inpaint_image
from lanpaint_tpu.models import textenc as TE
from lanpaint_tpu.text import NativeEncoder, encode_prompt

import jax
import jax.numpy as jnp


def byte_clip_tokenizer():
    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    for ch in sorted(byte_enc.values()):
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return tk.ClipBpeTokenizer(
        vocab, [], bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"]), vocab


def main():
    p = example_argparser("SDXL single-file text-to-inpaint")
    p.add_argument("--vocab", default=None, help="CLIP vocab.json")
    p.add_argument("--merges", default=None, help="CLIP merges.txt")
    p.add_argument("--prompt", default="a photo of a corgi")
    args = p.parse_args()

    if args.checkpoint:
        from lanpaint_tpu.models.load import (
            import_clip, import_clip_openclip, import_unet, import_vae,
            load_safetensors, split_checkpoint,
        )
        from lanpaint_tpu.models.unet import SDXL_CONFIG
        from lanpaint_tpu.models.vae import SD_VAE_CONFIG, VAE
        from lanpaint_tpu.models.zoo import build_unet

        comps = split_checkpoint(load_safetensors(args.checkpoint))
        model, _ = build_unet(SDXL_CONFIG,
                              import_unet(comps["unet"], SDXL_CONFIG,
                                          prefix=""), name="sdxl")
        vae_module = VAE(SD_VAE_CONFIG)
        vae_params = import_vae(comps["vae"], SD_VAE_CONFIG, prefix="")
        tok = tk.ClipBpeTokenizer.from_files(args.vocab, args.merges)
        clip_l = NativeEncoder(
            "clip", import_clip(comps["clip_l"], TE.CLIP_L_CONFIG),
            TE.CLIP_L_CONFIG, tok)
        clip_g = NativeEncoder(
            "clip", import_clip_openclip(comps["clip_g"], TE.CLIP_G_CONFIG),
            TE.CLIP_G_CONFIG, tok)
        h = w = 1024
        image = jnp.zeros((1, 3, h, w), jnp.float32)
    else:  # smoke mode: tiny everything, random weights
        from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
        from lanpaint_tpu.models.vae import TINY_VAE_CONFIG, VAE
        from lanpaint_tpu.models.zoo import build_tiny_unet, init_params_host

        model, _ = build_tiny_unet()
        vae_module = VAE(TINY_VAE_CONFIG)
        h = w = 64
        image = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, 3, h, w)), jnp.float32)
        vae_params = init_params_host(vae_module, image)
        tok, vocab = byte_clip_tokenizer()
        ctx_d = TINY_UNET_CONFIG.context_dim
        cl_cfg = TE.CLIPTextConfig(
            vocab_size=len(vocab), width=ctx_d // 2, layers=2, heads=2,
            intermediate=32, projection_dim=0,
            eos_token_id=tok.eos_token_id)
        cg_cfg = TE.CLIPTextConfig(
            vocab_size=len(vocab), width=ctx_d - ctx_d // 2, layers=2,
            heads=2, intermediate=32, projection_dim=ctx_d - ctx_d // 2,
            eos_token_id=tok.eos_token_id)
        mk = lambda cfg: TE.CLIPTextEncoder(cfg).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))
        clip_l = NativeEncoder("clip", mk(cl_cfg), cl_cfg, tok)
        clip_g = NativeEncoder("clip", mk(cg_cfg), cg_cfg, tok)

    cond = encode_prompt(args.prompt, family="sdxl", clip_l=clip_l,
                         clip_g=clip_g, height=h, width=w)
    if not args.checkpoint:  # tiny UNet has no pooled-y head
        cond.pop("y", None)
    uncond = encode_prompt("", family="sdxl", clip_l=clip_l, clip_g=clip_g,
                           height=h, width=w)
    if not args.checkpoint:
        uncond.pop("y", None)

    out = inpaint_image(
        model, vae_module, vae_params,
        image=image, mask=center_square_mask(h, w),
        positive=cond, negative=uncond, seed=args.seed, steps=args.steps,
        cfg=5.0, num_steps=args.think_steps,
    )
    report("sdxl_single_file", out)


if __name__ == "__main__":
    main()
