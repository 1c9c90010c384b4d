"""Text-conditioning assembly for every backbone family.

The reference receives ready conditioning tensors from its host's CLIP/T5
nodes; a standalone framework needs the assembly conventions natively.
The `*_cond` functions take raw encoder outputs (as numpy/JAX arrays — from
HF transformers on the host CPU, or any other source) and produce the cond
dict each zoo denoiser expects.  `encode_prompt_hf` is an optional
convenience that runs HuggingFace text encoders (torch CPU) and feeds the
assemblers; it is import-gated so the package has no hard torch dependency.

Conventions implemented (public model cards / reference hosts):
- SD1.x/2.x: single CLIP hidden-state sequence.
- SDXL: CLIP-L ⊕ CLIP-G hidden states on the channel axis (2048) + pooled
  CLIP-G with size micro-conditioning (`sdxl_pooled_y`).
- SD3/3.5: (CLIP-L ⊕ CLIP-G) zero-padded from 2048 to the T5 width (4096)
  and concatenated with T5-XXL along the sequence; vec = pooled-L ⊕ pooled-G.
- Flux family: T5-XXL sequence + pooled CLIP-L vec (+ guidance scalar).
- Qwen-Image / Wan2.2: the LLM/umt5 hidden-state sequence directly.
- HiDream: T5 sequence + pooled vec + per-layer Llama hidden states.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _a(x):
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return jnp.asarray(np.asarray(x), jnp.float32)


def sd15_cond(clip_hidden) -> Dict[str, Any]:
    return {"context": _a(clip_hidden)}


def sdxl_cond(clip_l_hidden, clip_g_hidden, clip_g_pooled,
              height: int = 1024, width: int = 1024, **size_kw) -> Dict[str, Any]:
    from .models.unet import sdxl_pooled_y

    context = jnp.concatenate([_a(clip_l_hidden), _a(clip_g_hidden)], axis=-1)
    y = sdxl_pooled_y(_a(clip_g_pooled), height, width, **size_kw)
    return {"context": context, "y": y}


def sd3_cond(t5_hidden, clip_l_hidden, clip_g_hidden,
             clip_l_pooled, clip_g_pooled) -> Dict[str, Any]:
    clip = jnp.concatenate([_a(clip_l_hidden), _a(clip_g_hidden)], axis=-1)
    t5 = _a(t5_hidden)
    pad = t5.shape[-1] - clip.shape[-1]
    clip = jnp.pad(clip, ((0, 0), (0, 0), (0, pad)))
    context = jnp.concatenate([clip, t5], axis=1)
    vec = jnp.concatenate([_a(clip_l_pooled), _a(clip_g_pooled)], axis=-1)
    return {"context": context, "vec": vec}


def flux_cond(t5_hidden, clip_pooled, guidance: Optional[float] = None
              ) -> Dict[str, Any]:
    cond = {"context": _a(t5_hidden), "vec": _a(clip_pooled)}
    if guidance is not None:
        b = cond["context"].shape[0]
        cond["guidance"] = jnp.full((b,), float(guidance), jnp.float32)
    return cond


def qwen_cond(llm_hidden) -> Dict[str, Any]:
    return {"context": _a(llm_hidden)}


def wan_cond(umt5_hidden) -> Dict[str, Any]:
    return {"context": _a(umt5_hidden)}


def hidream_cond(t5_hidden, pooled, llama_hidden_stack) -> Dict[str, Any]:
    """llama_hidden_stack: (L, B, S, D) per-layer Llama hidden states."""
    return {"context": _a(t5_hidden), "vec": _a(pooled),
            "llama": _a(llama_hidden_stack)}


def encode_prompt_hf(prompt: str, *, clip_l=None, clip_g=None, t5=None,
                     tokenizer_l=None, tokenizer_g=None, tokenizer_t5=None,
                     family: str = "sdxl", max_length: int = 77,
                     **assemble_kw) -> Dict[str, Any]:
    """Run HuggingFace text encoders (torch, host CPU) and assemble cond.

    Pass the already-constructed HF models/tokenizers for the family:
    sd15 (clip_l), sdxl (clip_l + clip_g), sd3 (clip_l + clip_g + t5),
    flux (clip_l + t5).  CLIP hidden states are taken from the penultimate
    layer (the hosts' "clip skip 1" default for SDXL-class models).
    """
    import torch

    def run_clip(tok, model, length):
        ids = tok([prompt], padding="max_length", max_length=length,
                  truncation=True, return_tensors="pt")
        with torch.no_grad():
            out = model(**ids, output_hidden_states=True)
        hidden = out.hidden_states[-2]
        pooled = getattr(out, "text_embeds", None)
        if pooled is None:
            pooled = out.pooler_output if hasattr(out, "pooler_output") else None
        return hidden, pooled

    def run_t5(tok, model, length):
        ids = tok([prompt], padding="max_length", max_length=length,
                  truncation=True, return_tensors="pt")
        with torch.no_grad():
            return model(**ids).last_hidden_state

    if family == "sd15":
        ids = tokenizer_l([prompt], padding="max_length", max_length=max_length,
                          truncation=True, return_tensors="pt")
        with torch.no_grad():
            hidden = clip_l(**ids).last_hidden_state
        return sd15_cond(hidden)
    if family == "sdxl":
        h_l, _ = run_clip(tokenizer_l, clip_l, max_length)
        h_g, p_g = run_clip(tokenizer_g, clip_g, max_length)
        return sdxl_cond(h_l, h_g, p_g, **assemble_kw)
    if family == "sd3":
        h_l, p_l = run_clip(tokenizer_l, clip_l, max_length)
        h_g, p_g = run_clip(tokenizer_g, clip_g, max_length)
        h_t5 = run_t5(tokenizer_t5, t5, assemble_kw.pop("t5_length", 154))
        return sd3_cond(h_t5, h_l, h_g, p_l, p_g)
    if family == "flux":
        _, p_l = run_clip(tokenizer_l, clip_l, max_length)
        h_t5 = run_t5(tokenizer_t5, t5, assemble_kw.pop("t5_length", 512))
        return flux_cond(h_t5, p_l, **assemble_kw)
    raise ValueError(f"unknown family {family!r}")


# --------------------------------------------------------------------------
# fully native pipeline: standalone tokenizers (tokenizers.py) + on-device
# flax encoders (models/textenc.py) -> cond dict.  No torch, no host round
# trips beyond the token ids themselves.


QWEN_IMAGE_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects "
    "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n")


class NativeEncoder:
    """One text encoder = (flax params, config, tokenizer).

    kind: "clip" (CLIPTextConfig), "t5" (T5Config), "llama" (LlamaConfig).
    The apply function is jitted once per (kind, config) and reused across
    prompts; ids are padded to fixed lengths so recompiles don't happen
    per prompt.
    """

    def __init__(self, kind: str, params, cfg, tokenizer, clip_skip: int = 2):
        import jax

        from .models import textenc as TE

        self.kind = kind
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.clip_skip = clip_skip
        if kind == "clip":
            self._fn = jax.jit(lambda p, i: TE.CLIPTextEncoder(cfg).apply(p, i))
        elif kind == "t5":
            self._fn = jax.jit(lambda p, i: TE.T5Encoder(cfg).apply(p, i))
        elif kind == "llama":
            self._fn = jax.jit(lambda p, i: TE.LlamaEncoder(cfg).apply(p, i))
        else:
            raise ValueError(kind)

    def ids(self, prompt: str, length: Optional[int] = None) -> jnp.ndarray:
        tok = self.tokenizer
        if self.kind == "clip":
            out = tok.encode(prompt)
        else:
            out = tok.encode(prompt, pad_to=length) if length else tok.encode(prompt)
        return jnp.asarray(np.asarray(out, np.int32))[None]

    def __call__(self, prompt: str, length: Optional[int] = None):
        return self._fn(self.params, self.ids(prompt, length))


def encode_prompt(prompt: str, *, family: str,
                  clip_l: Optional[NativeEncoder] = None,
                  clip_g: Optional[NativeEncoder] = None,
                  t5: Optional[NativeEncoder] = None,
                  llama: Optional[NativeEncoder] = None,
                  t5_length: int = 512, **assemble_kw) -> Dict[str, Any]:
    """Prompt string -> cond dict, entirely on-device.

    Families mirror `encode_prompt_hf`: sd15 (clip_l), sdxl (clip_l+clip_g),
    sd3 (clip_l+clip_g+t5), flux (clip_l+t5), qwen/wan (llama/t5),
    qwen3 (bare Qwen3 states: Anima/Klein/Krea2), hidream (t5+clip_l+llama).  CLIP hidden states use each encoder's
    clip_skip (default 2 = penultimate, the hosts' convention).
    """

    def clip_out(enc):
        hs, _last, pooled = enc(prompt)
        return hs[enc.cfg.layers + 1 - enc.clip_skip], pooled

    if family == "sd15":
        h, _ = clip_out(clip_l)
        return sd15_cond(h)
    if family == "sdxl":
        h_l, _ = clip_out(clip_l)
        h_g, p_g = clip_out(clip_g)
        return sdxl_cond(h_l, h_g, p_g, **assemble_kw)
    if family == "sd3":
        h_l, p_l = clip_out(clip_l)
        h_g, p_g = clip_out(clip_g)
        h_t5 = t5(prompt, assemble_kw.pop("sd3_t5_length", 154))
        return sd3_cond(h_t5, h_l, h_g, p_l, p_g)
    if family == "flux":
        _, p_l = clip_out(clip_l)
        return flux_cond(t5(prompt, t5_length), p_l, **assemble_kw)
    if family == "wan":
        return wan_cond(t5(prompt, t5_length))
    if family == "qwen":
        # Qwen-Image convention (public diffusers QwenImagePipeline): the
        # prompt is wrapped in a vision-describe chat template and the
        # template-prefix hidden states are dropped before conditioning.
        tpl = assemble_kw.pop("template", QWEN_IMAGE_TEMPLATE)
        drop = assemble_kw.pop("drop_prefix_tokens",
                               34 if tpl is QWEN_IMAGE_TEMPLATE else 0)
        _hs, final = llama(tpl.format(prompt) if tpl else prompt)
        return qwen_cond(final[:, drop:])
    if family == "qwen3":
        # Plain Qwen3 final hidden states as context — the prompt stack of
        # the Anima / Flux.2-Klein / Krea2 families (docs/family_facts.md;
        # encoders models/textenc.py QWEN3_*_CONFIG).  Their exact
        # chat-template conventions are offline-unknown; pass template= to
        # wrap the prompt once known.
        tpl = assemble_kw.pop("template", None)
        _hs, final = llama(tpl.format(prompt) if tpl else prompt)
        return qwen_cond(final)
    if family == "hidream":
        hs, _final = llama(prompt)
        pooled = clip_out(clip_l)[1]
        return hidream_cond(t5(prompt, t5_length), pooled, hs[1:])
    raise ValueError(f"unknown family {family!r}")
