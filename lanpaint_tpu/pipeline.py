"""One-object pipeline: checkpoint file -> prompt -> inpainted image.

The reference's user assembles a node graph (CheckpointLoaderSimple ->
CLIPTextEncode -> VAEEncode -> LanPaint_KSampler -> VAEDecode ->
LanPaint_MaskBlend, e.g. reference example_workflows/SDXL_Inpaint.json);
`LanPaintPipeline` is that graph as one object:

    pipe = LanPaintPipeline.from_single_file(
        "sd_xl_base_1.0.safetensors", vocab="vocab.json", merges="merges.txt")
    out = pipe("a corgi", image=img, mask=mask, steps=30, num_steps=5)

Every stage stays overridable: pass your own Denoiser/encoders/VAE to the
constructor, or call `.encode()` / `.sample()` directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from .api import inpaint_image, ksampler
from .text import NativeEncoder, encode_prompt


def _import_clip_auto(sub: Dict[str, Any], cfg):
    """Import a CLIP text tower from either layout found in checkpoints."""
    from .models.load import import_clip, import_clip_openclip

    if any(k.startswith("ln_final.") for k in sub):
        return import_clip_openclip(sub, cfg)
    return import_clip(sub, cfg)


class LanPaintPipeline:
    def __init__(self, model, *, vae_module=None, vae_params=None,
                 encoders: Optional[Dict[str, NativeEncoder]] = None,
                 family: str = "sdxl", height: int = 1024,
                 width: int = 1024):
        self.model = model
        self.vae_module = vae_module
        self.vae_params = vae_params
        self.encoders = encoders or {}
        self.family = family
        self.height = height
        self.width = width

    # ------------------------------------------------------------------
    @classmethod
    def from_single_file(cls, path: str, *, vocab: str, merges: str,
                         family: Optional[str] = None,
                         unet_config=None, clip_l_config=None,
                         clip_g_config=None, vae_config=None,
                         height: int = 1024, width: int = 1024,
                         clip_pad_token_id: Optional[int] = None,
                         state: Optional[Dict[str, Any]] = None
                         ) -> "LanPaintPipeline":
        """Build the whole pipeline from one SD1.x/SDXL safetensors file.

        `vocab`/`merges` are the CLIP tokenizer files (shipped with every
        SD release).  Configs default by detected family: clip_g present
        in the file => SDXL, else SD1.x.  Pass `state` to skip file I/O
        (pre-loaded/pre-merged state dicts, e.g. after LoRA merging).
        """
        from .models import textenc as TE
        from .models.load import (
            import_unet, import_vae, load_safetensors, split_checkpoint,
        )
        from .models.unet import SD15_CONFIG, SDXL_CONFIG
        from .models.vae import SD_VAE_CONFIG, VAE
        from .models.zoo import build_unet
        from .tokenizers import ClipBpeTokenizer

        comps = split_checkpoint(state if state is not None
                                 else load_safetensors(path))
        if family is None:
            family = "sdxl" if "clip_g" in comps else "sd15"
        unet_config = unet_config or (SDXL_CONFIG if family == "sdxl"
                                      else SD15_CONFIG)
        vae_config = vae_config or SD_VAE_CONFIG
        model, _ = build_unet(unet_config,
                              import_unet(comps["unet"], unet_config,
                                          prefix=""), name=family)
        vae_module = VAE(vae_config)
        vae_params = import_vae(comps["vae"], vae_config, prefix="")

        tok = ClipBpeTokenizer.from_files(vocab, merges,
                                          pad_token_id=clip_pad_token_id)
        encoders: Dict[str, NativeEncoder] = {}
        if "clip_l" in comps:
            cfg_l = clip_l_config or TE.CLIP_L_CONFIG
            encoders["clip_l"] = NativeEncoder(
                "clip", _import_clip_auto(comps["clip_l"], cfg_l), cfg_l, tok)
        if "clip_g" in comps:
            cfg_g = clip_g_config or TE.CLIP_G_CONFIG
            encoders["clip_g"] = NativeEncoder(
                "clip", _import_clip_auto(comps["clip_g"], cfg_g), cfg_g, tok)
        return cls(model, vae_module=vae_module, vae_params=vae_params,
                   encoders=encoders, family=family, height=height,
                   width=width)

    # ------------------------------------------------------------------
    def encode(self, prompt: str, **kw) -> Dict[str, Any]:
        if self.family in ("sdxl",):
            kw.setdefault("height", self.height)
            kw.setdefault("width", self.width)
        return encode_prompt(prompt, family=self.family, **self.encoders,
                             **kw)

    def sample(self, *, positive, negative=None, latent, mask, **kw):
        """Latent-space LanPaint sampling (node-equivalent ksampler)."""
        return ksampler(self.model, positive=positive, negative=negative,
                        latent=latent, mask=mask, **kw)

    def __call__(self, prompt: str, *, image, mask,
                 negative_prompt: str = "", seed: int = 0, steps: int = 30,
                 cfg: float = 5.0, num_steps: int = 5,
                 sampler_name: str = "euler", scheduler: str = "karras",
                 blend_overlap: int = 9, **kw):
        """Pixel-level inpaint: encode prompt(s) + VAE encode -> LanPaint ->
        VAE decode -> MaskBlend.  image: (B, 3, H, W) in [-1, 1]; mask:
        (H, W), 1 = repaint."""
        image = jnp.asarray(image, jnp.float32)
        positive = self.encode(prompt)
        negative = self.encode(negative_prompt)
        return inpaint_image(
            self.model, self.vae_module, self.vae_params, image=image,
            mask=mask, positive=positive, negative=negative, seed=seed,
            steps=steps, cfg=cfg, num_steps=num_steps,
            sampler_name=sampler_name, scheduler=scheduler,
            blend_overlap=blend_overlap, **kw)
