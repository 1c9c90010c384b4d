"""Vendored checkpoint key/shape manifests, authored INDEPENDENTLY of
lanpaint_tpu.models.load's mapping tables.

Each generator reproduces the public torch implementation's state-dict
layout from its module/ModuleList structure:

* SDXL UNet — Stability sgm/ldm `UNetModel` (single-file checkpoints under
  `model.diffusion_model.`, the layout the reference's
  CheckpointLoaderSimple consumes).
* Flux — black-forest-labs `flux.model.Flux` (bare keys, the UNETLoader
  layout of flux1-dev.safetensors).
* SD3/SD3.5 — Stability `sd3_impls`/mmdit reference (joint_blocks under
  `model.diffusion_model.`, pre-only final context block, per-head RMS
  qk-norm).
* Wan2.x — Wan-Video `wan.modules.model.WanModel` (bare keys:
  blocks.{i}.self_attn/cross_attn/ffn, full-width norm_q/norm_k).
* Qwen-Image — diffusers `QwenImageTransformer2DModel` (split
  to_q/to_k/to_v + add_*_proj, AdaLayerNormContinuous norm_out).

The tests (tests/test_manifests.py) assert (a) at FULL scale the key set
matches what the importers consume — a wrong key name in load.py's tables
shows up as a leftover/missing key; (b) at tiny scale with every axis size
distinct, the exported tensor shapes equal the manifest shapes — a wrong
transpose or fused-split shows up as a shape mismatch.
"""

from __future__ import annotations


def _lin(m, k, o, i, bias=True):
    m[k + ".weight"] = (o, i)
    if bias:
        m[k + ".bias"] = (o,)


def _conv(m, k, o, i, s=3):
    m[k + ".weight"] = (o, i, s, s)
    m[k + ".bias"] = (o,)


def _norm(m, k, c):
    m[k + ".weight"] = (c,)
    m[k + ".bias"] = (c,)


# ---------------------------------------------------------------------------
# SDXL / SD-family UNet (sgm/ldm layout)


def unet_manifest(cfg, prefix="model.diffusion_model.", linear_proj=True):
    """ldm/sgm UNetModel state dict.  `linear_proj`: SDXL ships
    use_linear_in_transformer=True (2-D proj_in/out); SD1.x uses 1x1 convs."""
    m = {}
    p = prefix
    mc = cfg.model_channels
    emb = 4 * mc
    ctx = cfg.context_dim
    mult, nres, tdepth = cfg.channel_mult, cfg.num_res_blocks, cfg.transformer_depth

    def resblock(k, ic, oc):
        _norm(m, k + ".in_layers.0", ic)
        _conv(m, k + ".in_layers.2", oc, ic)
        _lin(m, k + ".emb_layers.1", oc, emb)
        _norm(m, k + ".out_layers.0", oc)
        _conv(m, k + ".out_layers.3", oc, oc)
        if ic != oc:
            _conv(m, k + ".skip_connection", oc, ic, 1)

    def attn(k, c, depth):
        _norm(m, k + ".norm", c)
        if linear_proj:
            _lin(m, k + ".proj_in", c, c)
            _lin(m, k + ".proj_out", c, c)
        else:
            _conv(m, k + ".proj_in", c, c, 1)
            _conv(m, k + ".proj_out", c, c, 1)
        for j in range(depth):
            b = f"{k}.transformer_blocks.{j}"
            for a, kv in (("attn1", c), ("attn2", ctx)):
                m[f"{b}.{a}.to_q.weight"] = (c, c)
                m[f"{b}.{a}.to_k.weight"] = (c, kv)
                m[f"{b}.{a}.to_v.weight"] = (c, kv)
                _lin(m, f"{b}.{a}.to_out.0", c, c)
            _lin(m, f"{b}.ff.net.0.proj", 8 * c, c)   # GEGLU: 2 x 4c
            _lin(m, f"{b}.ff.net.2", c, 4 * c)
            _norm(m, f"{b}.norm1", c)
            _norm(m, f"{b}.norm2", c)
            _norm(m, f"{b}.norm3", c)

    _lin(m, p + "time_embed.0", emb, mc)
    _lin(m, p + "time_embed.2", emb, emb)
    if cfg.adm_in_channels is not None:
        _lin(m, p + "label_emb.0.0", emb, cfg.adm_in_channels)
        _lin(m, p + "label_emb.0.2", emb, emb)
    _conv(m, p + "input_blocks.0.0", mc, cfg.in_channels)

    ch = mc
    stack = [mc]
    idx = 1
    for lvl, mu in enumerate(mult):
        oc = mc * mu
        for _ in range(nres):
            resblock(p + f"input_blocks.{idx}.0", ch, oc)
            ch = oc
            if tdepth[lvl]:
                attn(p + f"input_blocks.{idx}.1", ch, tdepth[lvl])
            stack.append(ch)
            idx += 1
        if lvl != len(mult) - 1:
            _conv(m, p + f"input_blocks.{idx}.0.op", ch, ch)
            stack.append(ch)
            idx += 1

    resblock(p + "middle_block.0", ch, ch)
    if cfg.transformer_depth_middle:
        attn(p + "middle_block.1", ch, cfg.transformer_depth_middle)
        resblock(p + "middle_block.2", ch, ch)
    else:
        resblock(p + "middle_block.1", ch, ch)

    idx = 0
    for lvl in reversed(range(len(mult))):
        oc = mc * mult[lvl]
        for i in range(nres + 1):
            ic = ch + stack.pop()
            resblock(p + f"output_blocks.{idx}.0", ic, oc)
            ch = oc
            k2 = 1
            if tdepth[lvl]:
                attn(p + f"output_blocks.{idx}.{k2}", ch, tdepth[lvl])
                k2 += 1
            if lvl != 0 and i == nres:
                _conv(m, p + f"output_blocks.{idx}.{k2}.conv", ch, ch)
            idx += 1

    _norm(m, p + "out.0", mc)
    _conv(m, p + "out.2", cfg.out_channels, mc)
    return m


# ---------------------------------------------------------------------------
# Flux (black-forest-labs layout)


def flux_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    hd = cfg.head_dim
    mlp = int(h * cfg.mlp_ratio)

    _lin(m, p + "img_in", h, cfg.in_channels)
    _lin(m, p + "txt_in", h, cfg.context_dim)
    _lin(m, p + "time_in.in_layer", h, 256)
    _lin(m, p + "time_in.out_layer", h, h)
    if cfg.vec_dim > 0:
        _lin(m, p + "vector_in.in_layer", h, cfg.vec_dim)
        _lin(m, p + "vector_in.out_layer", h, h)
    if cfg.guidance_embed:
        _lin(m, p + "guidance_in.in_layer", h, 256)
        _lin(m, p + "guidance_in.out_layer", h, h)
    for i in range(cfg.depth_double):
        b = f"{p}double_blocks.{i}"
        for s in ("img", "txt"):
            _lin(m, f"{b}.{s}_mod.lin", 6 * h, h)
            _lin(m, f"{b}.{s}_attn.qkv", 3 * h, h)
            m[f"{b}.{s}_attn.norm.query_norm.scale"] = (hd,)
            m[f"{b}.{s}_attn.norm.key_norm.scale"] = (hd,)
            _lin(m, f"{b}.{s}_attn.proj", h, h)
            _lin(m, f"{b}.{s}_mlp.0", mlp, h)
            _lin(m, f"{b}.{s}_mlp.2", h, mlp)
    for i in range(cfg.depth_single):
        b = f"{p}single_blocks.{i}"
        _lin(m, f"{b}.modulation.lin", 3 * h, h)
        _lin(m, f"{b}.linear1", 3 * h + mlp, h)
        _lin(m, f"{b}.linear2", h, h + mlp)
        m[f"{b}.norm.query_norm.scale"] = (hd,)
        m[f"{b}.norm.key_norm.scale"] = (hd,)
    _lin(m, p + "final_layer.adaLN_modulation.1", 2 * h, h)
    _lin(m, p + "final_layer.linear", cfg.out_channels, h)
    return m


# ---------------------------------------------------------------------------
# SD3 / SD3.5 MMDiT (Stability reference layout)


def sd3_manifest(cfg, prefix="model.diffusion_model."):
    m = {}
    p = prefix
    h = cfg.hidden
    hd = cfg.head_dim
    mlp = int(h * cfg.mlp_ratio)
    patch_out = cfg.patch * cfg.patch * cfg.in_channels

    m[p + "x_embedder.proj.weight"] = (h, cfg.in_channels, cfg.patch, cfg.patch)
    m[p + "x_embedder.proj.bias"] = (h,)
    m[p + "pos_embed"] = (1, cfg.pos_embed_max * cfg.pos_embed_max, h)
    _lin(m, p + "t_embedder.mlp.0", h, 256)
    _lin(m, p + "t_embedder.mlp.2", h, h)
    if cfg.vec_dim > 0:
        _lin(m, p + "y_embedder.mlp.0", h, cfg.vec_dim)
        _lin(m, p + "y_embedder.mlp.2", h, h)
    _lin(m, p + "context_embedder", h, cfg.context_dim)

    def attn(k, with_proj=True):
        _lin(m, k + ".qkv", 3 * h, h)
        if cfg.qk_norm:
            m[k + ".ln_q.weight"] = (hd,)
            m[k + ".ln_k.weight"] = (hd,)
        if with_proj:
            _lin(m, k + ".proj", h, h)

    for i in range(cfg.depth):
        b = f"{p}joint_blocks.{i}"
        last = i == cfg.depth - 1
        dual = i in cfg.dual_attn_layers
        for stream in ("context_block", "x_block"):
            s = f"{b}.{stream}"
            pre_only = last and stream == "context_block"
            # MMDiT-X dual-attention x_blocks modulate attn+attn2+mlp: 9 sets
            n_mod = 2 if pre_only else (9 if dual and stream == "x_block" else 6)
            _lin(m, s + ".adaLN_modulation.1", n_mod * h, h)
            attn(s + ".attn", with_proj=not pre_only)
            if not pre_only:
                _lin(m, s + ".mlp.fc1", mlp, h)
                _lin(m, s + ".mlp.fc2", h, mlp)
            if dual and stream == "x_block":
                attn(s + ".attn2")
    _lin(m, p + "final_layer.adaLN_modulation.1", 2 * h, h)
    _lin(m, p + "final_layer.linear", patch_out, h)
    return m


# ---------------------------------------------------------------------------
# Wan2.x video DiT (Wan-Video layout)


def wan_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    m[p + "patch_embedding.weight"] = (h, cfg.in_channels) + tuple(cfg.patch)
    m[p + "patch_embedding.bias"] = (h,)
    _lin(m, p + "text_embedding.0", h, cfg.context_dim)
    _lin(m, p + "text_embedding.2", h, h)
    _lin(m, p + "time_embedding.0", h, 256)
    _lin(m, p + "time_embedding.2", h, h)
    _lin(m, p + "time_projection.1", 6 * h, h)
    pf, ph, pw = cfg.patch
    _lin(m, p + "head.head", cfg.out_channels * pf * ph * pw, h)
    m[p + "head.modulation"] = (1, 2, h)
    for i in range(cfg.depth):
        b = f"{p}blocks.{i}"
        m[f"{b}.modulation"] = (1, 6, h)
        # cross-attn k/v consume the ALREADY-EMBEDDED text (text_embedding
        # maps context_dim -> dim before the blocks), so every projection
        # in the public WanModel is (dim, dim)
        for a in ("self_attn", "cross_attn"):
            _lin(m, f"{b}.{a}.q", h, h)
            _lin(m, f"{b}.{a}.k", h, h)
            _lin(m, f"{b}.{a}.v", h, h)
            _lin(m, f"{b}.{a}.o", h, h)
            m[f"{b}.{a}.norm_q.weight"] = (h,)
            m[f"{b}.{a}.norm_k.weight"] = (h,)
        _norm(m, f"{b}.norm3", h)
        _lin(m, f"{b}.ffn.0", cfg.ffn_dim, h)
        _lin(m, f"{b}.ffn.2", h, cfg.ffn_dim)
    return m


# ---------------------------------------------------------------------------
# HunyuanVideo (ComfyUI-native layout of the Comfy-Org repackaged
# hunyuan_video_t2v_720p checkpoint: Flux-style double/single streams +
# tencent-named token refiner + Conv3D patch embed)


def hyvideo_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    hd = cfg.head_dim
    mlp = int(h * cfg.mlp_ratio)

    m[p + "img_in.proj.weight"] = (h, cfg.in_channels) + tuple(cfg.patch)
    m[p + "img_in.proj.bias"] = (h,)
    _lin(m, p + "time_in.in_layer", h, 256)
    _lin(m, p + "time_in.out_layer", h, h)
    if cfg.vec_dim > 0:
        _lin(m, p + "vector_in.in_layer", h, cfg.vec_dim)
        _lin(m, p + "vector_in.out_layer", h, h)
    if cfg.guidance_embed:
        _lin(m, p + "guidance_in.in_layer", h, 256)
        _lin(m, p + "guidance_in.out_layer", h, h)

    _lin(m, p + "txt_in.input_embedder", h, cfg.context_dim)
    _lin(m, p + "txt_in.t_embedder.mlp.0", h, 256)
    _lin(m, p + "txt_in.t_embedder.mlp.2", h, h)
    _lin(m, p + "txt_in.c_embedder.linear_1", h, cfg.context_dim)
    _lin(m, p + "txt_in.c_embedder.linear_2", h, h)
    for i in range(cfg.refiner_depth):
        b = f"{p}txt_in.individual_token_refiner.blocks.{i}"
        _norm(m, f"{b}.norm1", h)
        _norm(m, f"{b}.norm2", h)
        _lin(m, f"{b}.self_attn_qkv", 3 * h, h)
        _lin(m, f"{b}.self_attn_proj", h, h)
        _lin(m, f"{b}.mlp.fc1", mlp, h)
        _lin(m, f"{b}.mlp.fc2", h, mlp)
        _lin(m, f"{b}.adaLN_modulation.1", 2 * h, h)

    for i in range(cfg.depth_double):
        b = f"{p}double_blocks.{i}"
        for s in ("img", "txt"):
            _lin(m, f"{b}.{s}_mod.lin", 6 * h, h)
            _lin(m, f"{b}.{s}_attn.qkv", 3 * h, h)
            m[f"{b}.{s}_attn.norm.query_norm.scale"] = (hd,)
            m[f"{b}.{s}_attn.norm.key_norm.scale"] = (hd,)
            _lin(m, f"{b}.{s}_attn.proj", h, h)
            _lin(m, f"{b}.{s}_mlp.0", mlp, h)
            _lin(m, f"{b}.{s}_mlp.2", h, mlp)
    for i in range(cfg.depth_single):
        b = f"{p}single_blocks.{i}"
        _lin(m, f"{b}.modulation.lin", 3 * h, h)
        _lin(m, f"{b}.linear1", 3 * h + mlp, h)
        _lin(m, f"{b}.linear2", h, h + mlp)
        m[f"{b}.norm.query_norm.scale"] = (hd,)
        m[f"{b}.norm.key_norm.scale"] = (hd,)
    _lin(m, p + "final_layer.adaLN_modulation.1", 2 * h, h)
    pf, ph, pw = cfg.patch
    _lin(m, p + "final_layer.linear", cfg.out_channels * pf * ph * pw, h)
    return m


# ---------------------------------------------------------------------------
# Wan2.1 causal video VAE (Wan-Video wan/modules/vae.py module structure;
# the same file ships as qwen_image_vae.safetensors)


def wan_vae_manifest(cfg, prefix=""):
    m = {}
    p = prefix

    def conv3(k, o, i, kt=3, kh=3, kw=3):
        m[k + ".weight"] = (o, i, kt, kh, kw)
        m[k + ".bias"] = (o,)

    def conv2(k, o, i, s=3):
        m[k + ".weight"] = (o, i, s, s)
        m[k + ".bias"] = (o,)

    def res(k, cin, cout):
        m[k + ".residual.0.gamma"] = (cin, 1, 1, 1)
        conv3(k + ".residual.2", cout, cin)
        m[k + ".residual.3.gamma"] = (cout, 1, 1, 1)
        conv3(k + ".residual.6", cout, cout)
        if cin != cout:
            conv3(k + ".shortcut", cout, cin, 1, 1, 1)

    def attn(k, c):
        m[k + ".norm.gamma"] = (c, 1, 1)   # RMS_norm(images=True)
        conv2(k + ".to_qkv", 3 * c, c, 1)
        conv2(k + ".proj", c, c, 1)

    nested = cfg.stage_shortcuts  # Wan2.2 vae2_2.py nested Sequential
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    conv3(p + "encoder.conv1", dims[0], 3 * cfg.patch * cfg.patch)
    idx = 0
    cin = dims[0]
    for i in range(len(cfg.dim_mult)):
        cout = dims[i + 1]
        if nested:
            stage = f"{p}encoder.downsamples.{i}.downsamples"
            idx = 0
        else:
            stage = f"{p}encoder.downsamples"
        for _ in range(cfg.num_res_blocks):
            res(f"{stage}.{idx}", cin, cout)
            cin = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            conv2(f"{stage}.{idx}.resample.1", cout, cout)
            if cfg.temporal_downsample[i]:
                conv3(f"{stage}.{idx}.time_conv", cout, cout, 3, 1, 1)
            idx += 1
    c = dims[-1]
    res(p + "encoder.middle.0", c, c)
    attn(p + "encoder.middle.1", c)
    res(p + "encoder.middle.2", c, c)
    m[p + "encoder.head.0.gamma"] = (c, 1, 1, 1)
    conv3(p + "encoder.head.2", 2 * cfg.z_channels, c)
    conv3(p + "conv1", 2 * cfg.z_channels, 2 * cfg.z_channels, 1, 1, 1)
    conv3(p + "conv2", cfg.z_channels, cfg.z_channels, 1, 1, 1)

    rev = tuple(reversed(cfg.dim_mult))
    ddims = [cfg.dim * u for u in (rev[0],) + rev]
    conv3(p + "decoder.conv1", ddims[0], cfg.z_channels)
    c = ddims[0]
    res(p + "decoder.middle.0", c, c)
    attn(p + "decoder.middle.1", c)
    res(p + "decoder.middle.2", c, c)
    idx = 0
    cin = ddims[0]
    for i in range(len(cfg.dim_mult)):
        cout = ddims[i + 1]
        if nested:
            stage = f"{p}decoder.upsamples.{i}.upsamples"
            idx = 0
        else:
            stage = f"{p}decoder.upsamples"
        for _ in range(cfg.num_res_blocks + 1):
            res(f"{stage}.{idx}", cin, cout)
            cin = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            if tuple(reversed(cfg.temporal_downsample))[i]:
                conv3(f"{stage}.{idx}.time_conv", 2 * cout, cout, 3, 1, 1)
            up_out = cout if nested else cout // 2  # 2.2 keeps the width
            conv2(f"{stage}.{idx}.resample.1", up_out, cout)
            idx += 1
            cin = up_out
    m[p + "decoder.head.0.gamma"] = (cin, 1, 1, 1)
    conv3(p + "decoder.head.2", 3 * cfg.patch * cfg.patch, cin)
    return m


# ---------------------------------------------------------------------------
# Qwen-Image (diffusers QwenImageTransformer2DModel layout)


def qwen_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    hd = cfg.head_dim
    mlp = int(h * cfg.mlp_ratio)
    _lin(m, p + "time_text_embed.timestep_embedder.linear_1", h, 256)
    _lin(m, p + "time_text_embed.timestep_embedder.linear_2", h, h)
    m[p + "txt_norm.weight"] = (cfg.context_dim,)
    _lin(m, p + "img_in", h, cfg.in_channels)
    _lin(m, p + "txt_in", h, cfg.context_dim)
    for i in range(cfg.depth_double):
        b = f"{p}transformer_blocks.{i}"
        _lin(m, f"{b}.img_mod.1", 6 * h, h)
        _lin(m, f"{b}.txt_mod.1", 6 * h, h)
        for s in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            _lin(m, f"{b}.attn.{s}", h, h)
        for s in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            m[f"{b}.attn.{s}.weight"] = (hd,)
        _lin(m, f"{b}.attn.to_out.0", h, h)
        _lin(m, f"{b}.attn.to_add_out", h, h)
        for s in ("img", "txt"):
            _lin(m, f"{b}.{s}_mlp.net.0.proj", mlp, h)
            _lin(m, f"{b}.{s}_mlp.net.2", h, mlp)
    _lin(m, p + "norm_out.linear", 2 * h, h)
    _lin(m, p + "proj_out", cfg.out_channels, h)
    return m


# ---------------------------------------------------------------------------
# HiDream-I1 (HiDream-ai/HiDream-I1 transformer_hidream_image.py layout —
# the Comfy-Org repackaged hidream_i1_*.safetensors the reference's HiDream
# workflow loads through UNETLoader: x_embedder/t_embedder/p_embedder
# embedders, ONE caption_projection TextProjection per double+single block
# plus a final one for T5, `.block.`-wrapped streams with attn1.to_q[_t],
# full-width q_rms_norm[_t], fused 12-chunk (double) / 6-chunk (single)
# adaLN, ff_i MOEFeedForwardSwiGLU (shared_experts + experts.{j} + gate) and
# ff_t FeedForwardSwiGLU)


def hidream_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    inner = cfg.ffn_dim
    e_n = cfg.num_experts

    _lin(m, p + "x_embedder.proj", h, cfg.in_channels)
    _lin(m, p + "t_embedder.timestep_embedder.linear_1", h, 256)
    _lin(m, p + "t_embedder.timestep_embedder.linear_2", h, h)
    if cfg.vec_dim > 0:
        _lin(m, p + "p_embedder.pooled_embedder.linear_1", h, cfg.vec_dim)
        _lin(m, p + "p_embedder.pooled_embedder.linear_2", h, h)
    n_blocks = cfg.depth_double + cfg.depth_single
    for i in range(n_blocks):
        m[f"{p}caption_projection.{i}.linear.weight"] = (h, cfg.llama_dim)
    m[f"{p}caption_projection.{n_blocks}.linear.weight"] = (h, cfg.context_dim)

    def swiglu(k):
        m[k + ".w1.weight"] = (inner, h)
        m[k + ".w2.weight"] = (h, inner)
        m[k + ".w3.weight"] = (inner, h)

    def moe(k):
        swiglu(k + ".shared_experts")
        for j in range(e_n):
            swiglu(f"{k}.experts.{j}")
        m[k + ".gate.weight"] = (e_n, h)

    def attn(k, with_t):
        for s in (("", "_t") if with_t else ("",)):
            for w in ("to_q", "to_k", "to_v", "to_out"):
                _lin(m, f"{k}.{w}{s}", h, h)
            m[f"{k}.q_rms_norm{s}.weight"] = (h,)
            m[f"{k}.k_rms_norm{s}.weight"] = (h,)

    for i in range(cfg.depth_double):
        b = f"{p}double_stream_blocks.{i}.block"
        _lin(m, b + ".adaLN_modulation.1", 12 * h, h)
        attn(b + ".attn1", with_t=True)
        moe(b + ".ff_i")
        swiglu(b + ".ff_t")
    for i in range(cfg.depth_single):
        b = f"{p}single_stream_blocks.{i}.block"
        _lin(m, b + ".adaLN_modulation.1", 6 * h, h)
        attn(b + ".attn1", with_t=False)
        moe(b + ".ff_i")
    _lin(m, p + "final_layer.adaLN_modulation.1", 2 * h, h)
    _lin(m, p + "final_layer.linear", cfg.out_channels, h)
    return m


# ---------------------------------------------------------------------------
# Z-Image (Tongyi S3-DiT via the Lumina2/NextDiT layout — the reference's
# Z_image workflows load z_image_*_bf16.safetensors through UNETLoader with
# CLIPLoader type 'lumina2': Alpha-VLLM NextDiT module structure)


def zimage_manifest(cfg, prefix=""):
    m = {}
    p = prefix
    h = cfg.hidden
    d = cfg.head_dim
    tdim = cfg.t_dim

    _lin(m, p + "x_embedder", h, cfg.in_channels * cfg.patch * cfg.patch)
    m[p + "cap_embedder.0.weight"] = (cfg.cap_dim,)
    _lin(m, p + "cap_embedder.1", h, cfg.cap_dim)
    _lin(m, p + "t_embedder.mlp.0", tdim, 256)
    _lin(m, p + "t_embedder.mlp.2", tdim, tdim)
    m[p + "norm_final.weight"] = (h,)
    _lin(m, p + "final_layer.linear",
         cfg.out_channels * cfg.patch * cfg.patch, h)
    _lin(m, p + "final_layer.adaLN_modulation.1", h, tdim)

    def block(k, modulated):
        m[f"{k}.attention.qkv.weight"] = (
            (cfg.num_heads + 2 * cfg.num_kv_heads) * d, h)
        m[f"{k}.attention.out.weight"] = (h, cfg.num_heads * d)
        m[f"{k}.attention.q_norm.weight"] = (d,)
        m[f"{k}.attention.k_norm.weight"] = (d,)
        m[f"{k}.feed_forward.w1.weight"] = (cfg.ffn_dim, h)
        m[f"{k}.feed_forward.w2.weight"] = (h, cfg.ffn_dim)
        m[f"{k}.feed_forward.w3.weight"] = (cfg.ffn_dim, h)
        for n in ("attention_norm1", "attention_norm2", "ffn_norm1",
                  "ffn_norm2"):
            m[f"{k}.{n}.weight"] = (h,)
        if modulated:
            _lin(m, f"{k}.adaLN_modulation.1", 4 * h, tdim)

    for i in range(cfg.context_refiner_depth):
        block(f"{p}context_refiner.{i}", modulated=False)
    for i in range(cfg.refiner_depth):
        block(f"{p}noise_refiner.{i}", modulated=True)
    for i in range(cfg.depth):
        block(f"{p}layers.{i}", modulated=True)
    return m
