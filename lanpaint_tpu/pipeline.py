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


class _SingleFrameVAE:
    """Adapter: a 3D (video) VAE used as a 2D image VAE (T=1 frame).

    Qwen-Image pairs the Wan2.1-style causal video VAE with a 2D image DiT
    (reference workflow qwen_image_vae); the 1+4k frame law maps one pixel
    frame to one latent frame, so squeezing the frame axis is exact."""

    def __init__(self, module):
        self.module = module

    def apply(self, params, x, method: str):
        out = self.module.apply(params, x[:, :, None], method=method)
        return out[:, :, 0]


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
    @classmethod
    def from_components(cls, *, family: str, model, vae,
                        clip_l=None, clip_g=None, t5=None, llama=None,
                        clip_vocab: Optional[str] = None,
                        clip_merges: Optional[str] = None,
                        t5_tokenizer=None, llama_tokenizer=None,
                        with_vision: bool = False,
                        model_config=None, vae_config=None,
                        clip_l_config=None, clip_g_config=None,
                        t5_config=None, llama_config=None,
                        vision_config=None, shift: Optional[float] = None,
                        height: int = 1024, width: int = 1024
                        ) -> "LanPaintPipeline":
        """Build a pipeline from the multi-file layout modern releases ship
        (separate diffusion model / text encoder(s) / VAE safetensors — the
        reference's UNETLoader + DualCLIPLoader + VAELoader node trio).

        Families: "flux" (clip_l + t5 + 16ch VAE), "sd35" (clip_l + clip_g
        + t5 + 16ch VAE), "qwen" (Qwen2.5-VL llama stack + Wan-style 3D
        VAE; with_vision=True also loads the vision tower for
        Qwen-Image-Edit image conditioning), "z-image" (Qwen3-4B stack +
        16ch VAE).  Component args accept file
        paths or pre-loaded state dicts; tokenizer args accept paths
        (tokenizer.json / spiece.model / vocab+merges) or constructed
        tokenizer objects.  *_config args override the full-size defaults
        (used by the tiny-model tests).
        """
        from .models import textenc as TE
        from .models.load import (
            import_clip, import_dit, import_llama, import_qwen_vl_vision,
            import_sd3, import_t5, import_vae, import_wan_vae,
            load_safetensors,
        )

        def _state(x):
            return load_safetensors(x) if isinstance(x, str) else x

        def _vae_import(x, vae_cfg):
            st = _state(x)
            pre = ("first_stage_model."
                   if any(k.startswith("first_stage_model.") for k in st)
                   else "")  # combined checkpoints embed the VAE prefixed
            return import_vae(st, vae_cfg, prefix=pre)

        def _clip_tok():
            from .tokenizers import ClipBpeTokenizer

            if not isinstance(clip_vocab, str):
                return clip_vocab  # constructed tokenizer object
            return ClipBpeTokenizer.from_files(clip_vocab, clip_merges)

        def _t5_tok():
            from .tokenizers import from_tokenizer_json, unigram_from_sentencepiece

            if not isinstance(t5_tokenizer, str):
                return t5_tokenizer
            if t5_tokenizer.endswith(".json"):
                return from_tokenizer_json(t5_tokenizer)
            return unigram_from_sentencepiece(t5_tokenizer)

        def _llama_tok():
            from .tokenizers import from_tokenizer_json

            if not isinstance(llama_tokenizer, str):
                return llama_tokenizer
            return from_tokenizer_json(llama_tokenizer)

        encoders: Dict[str, Any] = {}
        if family == "flux":
            from .models.dit import FLUX_DEV_CONFIG
            from .models.vae import FLUX_VAE_CONFIG, VAE
            from .models.zoo import build_dit

            cfg = model_config or FLUX_DEV_CONFIG
            den, _ = build_dit(cfg, import_dit(_state(model), cfg),
                               shift=1.15 if shift is None else shift,
                               is_flux=True, name="flux")
            vae_cfg = vae_config or FLUX_VAE_CONFIG
            vae_module = VAE(vae_cfg)
            vae_params = _vae_import(vae, vae_cfg)
            cl = clip_l_config or TE.CLIP_L_CONFIG
            encoders["clip_l"] = NativeEncoder(
                "clip", import_clip(_state(clip_l), cl), cl, _clip_tok())
            tc = t5_config or TE.T5_XXL_CONFIG
            encoders["t5"] = NativeEncoder(
                "t5", import_t5(_state(t5), tc), tc, _t5_tok())
        elif family == "sd35":
            from .models.sd3 import SD35_LARGE_CONFIG as _SD35
            from .models.vae import SD3_VAE_CONFIG, VAE
            from .models.zoo import build_sd3

            cfg = model_config or _SD35
            st = _state(model)
            prefix = ("model.diffusion_model."
                      if any(k.startswith("model.diffusion_model.")
                             for k in st) else "")
            den, _ = build_sd3(cfg, import_sd3(st, cfg, prefix=prefix),
                               shift=3.0 if shift is None else shift,
                               name="sd35")
            vae_cfg = vae_config or SD3_VAE_CONFIG
            vae_module = VAE(vae_cfg)
            vae_params = _vae_import(vae, vae_cfg)
            tok = _clip_tok()
            cl = clip_l_config or TE.CLIP_L_CONFIG
            cg = clip_g_config or TE.CLIP_G_CONFIG
            encoders["clip_l"] = NativeEncoder(
                "clip", _import_clip_auto(_state(clip_l), cl), cl, tok)
            encoders["clip_g"] = NativeEncoder(
                "clip", _import_clip_auto(_state(clip_g), cg), cg, tok)
            tc = t5_config or TE.T5_XXL_CONFIG
            encoders["t5"] = NativeEncoder(
                "t5", import_t5(_state(t5), tc), tc, _t5_tok())
            family = "sd3"
        elif family == "z-image":
            from .models.load import import_zimage
            from .models.vae import FLUX_VAE_CONFIG, VAE
            from .models.zimage import Z_IMAGE_S3_CONFIG
            from .models.zoo import build_zimage

            cfg = model_config or Z_IMAGE_S3_CONFIG
            den, _ = build_zimage(cfg, import_zimage(_state(model), cfg),
                                  shift=3.0 if shift is None else shift,
                                  name="z-image")
            vae_cfg = vae_config or FLUX_VAE_CONFIG
            vae_module = VAE(vae_cfg)
            vae_params = _vae_import(vae, vae_cfg)
            lc = llama_config or TE.QWEN3_4B_CONFIG
            encoders["llama"] = NativeEncoder(
                "llama", import_llama(_state(llama), lc), lc, _llama_tok())
            family = "qwen3"
        elif family == "qwen":
            from .models.dit import QWEN_IMAGE_CONFIG
            from .models.video_vae import QWEN_IMAGE_VAE_CONFIG, WanVAE
            from .models.zoo import build_dit
            from .text import VisionEncoder

            from .models.load import import_mmdit_auto

            cfg = model_config or QWEN_IMAGE_CONFIG
            den, _ = build_dit(cfg, import_mmdit_auto(_state(model), cfg),
                               shift=2.2 if shift is None else shift,
                               is_flux=False, name="qwen-image")
            vae_cfg = vae_config or QWEN_IMAGE_VAE_CONFIG
            vae_module = _SingleFrameVAE(WanVAE(vae_cfg))
            vae_params = import_wan_vae(_state(vae), vae_cfg)
            lst = _state(llama)
            lc = llama_config or TE.QWEN25_7B_CONFIG
            encoders["llama"] = NativeEncoder(
                "llama", import_llama(lst, lc), lc, _llama_tok())
            if with_vision:
                from .models.vision import QWEN25_VL_VISION_CONFIG

                vc = vision_config or QWEN25_VL_VISION_CONFIG
                encoders["vision"] = VisionEncoder(
                    import_qwen_vl_vision(lst, vc), vc)
        else:
            raise ValueError(f"from_components: unknown family {family!r} "
                             "(flux, sd35, qwen, z-image)")
        return cls(den, vae_module=vae_module, vae_params=vae_params,
                   encoders=encoders, family=family, height=height,
                   width=width)

    # ------------------------------------------------------------------
    def encode(self, prompt: str, **kw) -> Dict[str, Any]:
        if self.family in ("sdxl",):
            kw.setdefault("height", self.height)
            kw.setdefault("width", self.width)
        family = self.family
        encoders = self.encoders
        if family == "qwen" and kw.get("image") is not None:
            if "vision" not in encoders:
                raise ValueError("image conditioning needs "
                                 "from_components(with_vision=True)")
            family = "qwen_edit"
        elif "vision" in encoders:
            encoders = {k: v for k, v in encoders.items() if k != "vision"}
        return encode_prompt(prompt, family=family, **encoders, **kw)

    def sample(self, *, positive, negative=None, latent, mask, **kw):
        """Latent-space LanPaint sampling (node-equivalent ksampler)."""
        return ksampler(self.model, positive=positive, negative=negative,
                        latent=latent, mask=mask, **kw)

    def __call__(self, prompt: str, *, image, mask,
                 negative_prompt: str = "", seed: int = 0, steps: int = 30,
                 cfg: float = 5.0, num_steps: int = 5,
                 sampler_name: str = "euler", scheduler: str = "karras",
                 blend_overlap: int = 9,
                 encode_kw: Optional[Dict[str, Any]] = None, **kw):
        """Pixel-level inpaint: encode prompt(s) + VAE encode -> LanPaint ->
        VAE decode -> MaskBlend.  image: (B, 3, H, W) in [-1, 1]; mask:
        (H, W), 1 = repaint.  `encode_kw` goes to encode_prompt (e.g.
        t5_length); other kwargs go to the sampler."""
        ek = dict(encode_kw or {})
        image = jnp.asarray(image, jnp.float32)
        positive = self.encode(prompt, **ek)
        negative = self.encode(negative_prompt, **ek)
        return inpaint_image(
            self.model, self.vae_module, self.vae_params, image=image,
            mask=mask, positive=positive, negative=negative, seed=seed,
            steps=steps, cfg=cfg, num_steps=num_steps,
            sampler_name=sampler_name, scheduler=scheduler,
            blend_overlap=blend_overlap, **kw)
