"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


from lanpaint_tpu import Denoiser, LanPaintConfig, LanPaintSampler, ModelKind
from lanpaint_tpu.parallel import MeshSpec, make_mesh, shard_batch
from lanpaint_tpu.sigmas import EpsSigmaTable, karras


def _toy():
    def apply(x, t, cond):
        n = x[0].size
        w = n / (n + t.reshape((-1,) + (1,) * (x.ndim - 1)) ** 2)
        c_hat = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True) * w
        return jnp.broadcast_to(c_hat, x.shape)

    return Denoiser(apply=apply, kind=ModelKind.EPS, sigma_table=EpsSigmaTable())


def test_mesh_creation():
    mesh = make_mesh(MeshSpec(data=8))
    assert mesh.shape == {"data": 8, "seq": 1, "tensor": 1, "expert": 1}
    mesh2 = make_mesh(MeshSpec(data=2, seq=4))
    assert mesh2.shape["seq"] == 4
    mesh3 = make_mesh(MeshSpec(data=2, tensor=2, expert=2))
    assert mesh3.shape["expert"] == 2


def test_mesh_wrong_size_raises():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(MeshSpec(data=3))


def test_dp_sharded_inpaint_runs_and_matches_single_device():
    """The full inpainting program must run SPMD over a DP-sharded batch and
    produce the same values as the unsharded run (XLA determinism on CPU)."""
    assert jax.device_count() >= 8
    mesh = make_mesh(MeshSpec(data=8))
    toy = _toy()
    latent = jnp.tile(jnp.full((1, 4, 8, 8), 2.0, jnp.float32), (8, 1, 1, 1))
    mask = jnp.zeros((8, 4, 8, 8), jnp.float32).at[:, :, :, 4:].set(1.0)
    sigmas = jnp.asarray(karras(6, 0.03, 14.6), jnp.float32)
    cond = jnp.zeros((8, 1), jnp.float32)

    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0)
    out_ref, _ = sam(latent=latent, sigmas=sigmas, cond=cond, mask=mask, seed=0)

    latent_s = shard_batch(mesh, latent)
    mask_s = shard_batch(mesh, mask)
    cond_s = shard_batch(mesh, cond)
    out_sh, _ = sam(latent=latent_s, sigmas=sigmas, cond=cond_s, mask=mask_s, seed=0)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    # the result actually carries the DP sharding
    shard_devs = {s.device.id for s in out_sh.addressable_shards}
    assert len(shard_devs) == 8


def test_tensor_parallel_sd3_matches_replicated():
    """TP-sharded SD3 MMDiT weights (scanned joint blocks 3-D specs, final
    unstacked block 2-D specs) must match the replicated forward.  fp32
    compute so the check is tight (bf16 adds ~5e-4 reduction-order noise
    because the fused-qkv column shards cross the q/k/v split boundaries)."""
    import dataclasses

    from lanpaint_tpu.models.sd3 import TINY_SD3_CONFIG
    from lanpaint_tpu.models.zoo import build_sd3
    from lanpaint_tpu.parallel.mesh import sd3_tp_rules, shard_params_tp

    mesh = make_mesh(MeshSpec(data=2, tensor=4))
    cfg = dataclasses.replace(TINY_SD3_CONFIG, dtype=jnp.float32)
    den, params = build_sd3(cfg, name="tiny-sd3-f32")
    x = jnp.ones((2, 4, 16, 16), jnp.float32) * 0.3
    cond = {"context": jnp.zeros((2, 8, 32), jnp.float32),
            "vec": jnp.zeros((2, 16), jnp.float32)}
    t = jnp.full((2,), 0.6, jnp.float32)

    want = den.raw_apply(params, x, t, cond)

    params_tp = shard_params_tp(mesh, params, sd3_tp_rules())
    with mesh:
        got = jax.jit(den.raw_apply)(params_tp, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_tensor_parallel_wan_matches_replicated():
    """TP-sharded Wan weights (Megatron column/row rules) must produce the
    same output as the replicated run; XLA inserts the collectives."""
    from lanpaint_tpu.models.zoo import build_tiny_wan
    from lanpaint_tpu.parallel.mesh import shard_params_tp, wan_tp_rules

    mesh = make_mesh(MeshSpec(data=2, tensor=4))
    den, params = build_tiny_wan()
    x = jnp.ones((2, 4, 4, 8, 8), jnp.float32) * 0.3
    cond = {"context": jnp.zeros((2, 8, 32), jnp.float32)}
    t = jnp.full((2,), 0.6, jnp.float32)

    want = den.raw_apply(params, x, t, cond)

    params_tp = shard_params_tp(mesh, params, wan_tp_rules())
    with mesh:
        got = jax.jit(den.raw_apply)(params_tp, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_expert_parallel_hidream_matches_replicated():
    """EP x TP-sharded HiDream MoE weights (expert axis over "expert",
    SwiGLU inner width over "tensor") must match the replicated forward —
    XLA psums over "expert" at the gate contraction, no token dispatch."""
    import dataclasses

    from lanpaint_tpu.models.hidream import TINY_HIDREAM_CONFIG
    from lanpaint_tpu.models.zoo import build_hidream
    from lanpaint_tpu.parallel.mesh import hidream_ep_rules, shard_params_tp

    mesh = make_mesh(MeshSpec(data=2, tensor=2, expert=2))
    cfg = dataclasses.replace(TINY_HIDREAM_CONFIG, dtype=jnp.float32)
    den, params = build_hidream(cfg, name="tiny-hidream-f32")
    x = jnp.linspace(-1, 1, 2 * 4 * 16 * 16, dtype=jnp.float32
                     ).reshape(2, 4, 16, 16)
    cond = {"context": jnp.full((2, 8, 32), 0.1, jnp.float32),
            "vec": jnp.full((2, 16), 0.2, jnp.float32),
            "llama": jnp.full((2, 2, 4, 24), 0.3, jnp.float32)}
    t = jnp.full((2,), 0.6, jnp.float32)

    want = den.raw_apply(params, x, t, cond)

    params_ep = shard_params_tp(mesh, params, hidream_ep_rules())
    # the expert axis is really sharded (scanned moe w1: L, E, h, inner)
    moe_w1 = params_ep["params"]["single"]["block"]["ff_i"]["experts_w1"]
    assert {s.device.id for s in moe_w1.addressable_shards} != {0}
    assert moe_w1.addressable_shards[0].data.shape[1] == 2  # E=4 over 2

    with mesh:
        got = jax.jit(den.raw_apply)(params_ep, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tensor_parallel_unet_matches_replicated():
    """TP-sharded SDXL-style UNet (transformer blocks column/row, convs
    replicated) must match the replicated forward — the headline model's
    multi-chip latency path."""
    import dataclasses

    from lanpaint_tpu.models.unet import TINY_UNET_CONFIG
    from lanpaint_tpu.models.zoo import build_unet
    from lanpaint_tpu.parallel.mesh import shard_params_tp, unet_tp_rules

    mesh = make_mesh(MeshSpec(data=2, tensor=4))
    # fp32 compute and jit-vs-jit: the tiny config's bf16 eager forward
    # differs from ANY jitted forward by ~0.1 (fusion/reduction order),
    # sharded or not — that noise would mask a real TP bug
    cfg = dataclasses.replace(TINY_UNET_CONFIG, dtype=jnp.float32)
    den, params = build_unet(cfg, name="tiny-unet-f32")
    x = jnp.linspace(-1, 1, 2 * 4 * 16 * 16, dtype=jnp.float32
                     ).reshape(2, 4, 16, 16)
    cond = {"context": jnp.full((2, 8, 32), 0.1, jnp.float32),
            "y": jnp.full((2, 64), 0.2, jnp.float32)}
    t = jnp.full((2,), 5.0, jnp.float32)

    want = jax.jit(den.raw_apply)(params, x, t, cond)

    params_tp = shard_params_tp(mesh, params, unet_tp_rules())
    # the attention kernels are really sharded (fused layout: attn1 to_qkv
    # column-parallel, hoisted kv_cross stack column-parallel)
    st = params_tp["params"]["mid_attn"]
    qk = st["blocks"]["block"]["attn1"]["to_qkv"]["kernel"]
    assert qk.addressable_shards[0].data.shape[-1] < qk.shape[-1]
    kv = st["kv_cross"]
    assert kv.addressable_shards[0].data.shape[-1] < kv.shape[-1]
    with mesh:
        got = jax.jit(den.raw_apply)(params_tp, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fsdp_layer_sharding_wan_matches_and_shrinks():
    """layer_shard_rules composes FSDP-style depth-axis sharding with TP:
    per-device plan bytes drop by ~data*tensor for the scanned stack, and
    the forward still matches (XLA gathers each layer just-in-time)."""
    from lanpaint_tpu.models.zoo import build_tiny_wan
    from lanpaint_tpu.parallel.mesh import (
        layer_shard_rules, shard_params_tp, tp_plan_bytes, wan_tp_rules,
    )

    den, params = build_tiny_wan()
    shapes = jax.eval_shape(lambda: params)
    tp_only = tp_plan_bytes(shapes, wan_tp_rules(), {"tensor": 4})
    fsdp = layer_shard_rules(wan_tp_rules())
    both = tp_plan_bytes(shapes, fsdp, {"tensor": 4, "data": 2})
    # tiny config: depth-2 stack over data=2 halves the scanned bytes; the
    # unscanned head/embeddings (replicated, and dominant at tiny scale)
    # cap the total ratio — measured 0.83
    assert both < 0.9 * tp_only

    mesh = make_mesh(MeshSpec(data=2, tensor=4))
    x = jnp.ones((2, 4, 4, 8, 8), jnp.float32) * 0.3
    cond = {"context": jnp.zeros((2, 8, 32), jnp.float32)}
    t = jnp.full((2,), 0.6, jnp.float32)
    want = den.raw_apply(params, x, t, cond)

    params_f = shard_params_tp(mesh, params, fsdp)
    blk = params_f["params"]["blocks"]["block"]["ffn_0"]["kernel"]
    assert blk.addressable_shards[0].data.shape[0] < blk.shape[0]
    with mesh:
        got = jax.jit(den.raw_apply)(params_f, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------
# ring attention / sequence parallelism (parallel/ring.py)


def test_ring_attention_matches_full_attention():
    from lanpaint_tpu.parallel.ring import seq_parallel_attention

    mesh = make_mesh(MeshSpec(data=2, seq=4))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 32, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 32, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 32, 4, 16)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        out = seq_parallel_attention(mesh, q, k, v)
        ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_custom_scale_and_uneven_heads():
    from lanpaint_tpu.parallel.ring import seq_parallel_attention

    mesh = make_mesh(MeshSpec(data=1, seq=8))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 64, 3, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 64, 3, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 64, 3, 8)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        out = seq_parallel_attention(mesh, q, k, v, sm_scale=0.5)
        ref = jax.nn.dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seq_parallel_wan_matches_single_device():
    import dataclasses

    from lanpaint_tpu.models import zoo
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG

    cfg = dataclasses.replace(TINY_WAN_CONFIG, dtype=jnp.float32)
    den, params = zoo.build_wan(cfg, init_shape=(1, 8, 8, 8))
    mesh = make_mesh(MeshSpec(data=2, seq=4))
    den_sp, _ = zoo.build_wan_seq_parallel(cfg, params, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)), jnp.float32)
    t = jnp.full((2,), 0.7, jnp.float32)
    cond = {"context": jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)}
    with jax.default_matmul_precision("highest"):
        ref = den.raw_apply(params, x, t, cond)
        out = den_sp.raw_apply(den_sp.params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_parallel_full_sampler_matches_single_device():
    """The whole LanPaint program (outer scan + think loop) with the
    ring-attention seq-parallel Wan backbone == single-device output."""
    import dataclasses

    from lanpaint_tpu.models import zoo
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG

    cfg = dataclasses.replace(TINY_WAN_CONFIG, dtype=jnp.float32)
    den, params = zoo.build_wan(cfg, init_shape=(1, 8, 8, 8))
    mesh = make_mesh(MeshSpec(data=1, seq=8))
    den_sp, _ = zoo.build_wan_seq_parallel(cfg, params, mesh)

    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 8)), jnp.float32)
    mask = np.zeros((1, 4, 8, 8, 8), np.float32)
    mask[..., 4:] = 1.0
    cond = {"context": jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)}
    sigmas = jnp.asarray([0.99, 0.6, 0.3, 0.0], jnp.float32)

    outs = []
    with jax.default_matmul_precision("highest"):
        for d in (den, den_sp):
            sam = LanPaintSampler(d, config=LanPaintConfig(n_steps=2),
                                  sampler_name="euler", cfg=1.0)
            out, _ = sam(latent=latent, sigmas=sigmas, cond=cond,
                         mask=jnp.asarray(mask), seed=0)
            outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[1], outs[0], rtol=3e-4, atol=3e-4)


def test_seq_plus_tensor_parallel_wan_matches_single_device():
    """3D mesh: batch on data, frames on seq (ring attention), heads/ffn on
    tensor (Megatron TP inside shard_map, psum at row projections)."""
    import dataclasses

    from lanpaint_tpu.models import zoo
    from lanpaint_tpu.models.wan import TINY_WAN_CONFIG

    cfg = dataclasses.replace(TINY_WAN_CONFIG, dtype=jnp.float32)
    den, params = zoo.build_wan(cfg, init_shape=(1, 8, 8, 8))
    mesh = make_mesh(MeshSpec(data=2, seq=2, tensor=2))
    den_sp, sharded = zoo.build_wan_seq_parallel(cfg, params, mesh,
                                                 tp_axis="tensor")
    # weights really are distributed: a col-parallel kernel's shards live on
    # different devices
    qk = sharded["params"]["blocks"]["block"]["self_attn"]["q"]["kernel"]
    assert len(qk.sharding.device_set) == 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 8)), jnp.float32)
    t = jnp.full((2,), 0.7, jnp.float32)
    cond = {"context": jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)}
    with jax.default_matmul_precision("highest"):
        ref = den.raw_apply(params, x, t, cond)
        out = den_sp.raw_apply(den_sp.params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_chunked_launches_preserve_sharding():
    """chunk_steps under a mesh: the chunk-loop device pin must leave
    mesh-sharded inputs in place (a bare device_put would gather them onto
    one device) and match the single launch exactly."""
    assert jax.device_count() >= 8
    mesh = make_mesh(MeshSpec(data=8))
    toy = _toy()
    latent = jnp.tile(jnp.full((1, 4, 8, 8), 2.0, jnp.float32), (8, 1, 1, 1))
    mask = jnp.zeros((8, 4, 8, 8), jnp.float32).at[:, :, :, 4:].set(1.0)
    sigmas = jnp.asarray(karras(6, 0.03, 14.6), jnp.float32)
    cond = jnp.zeros((8, 1), jnp.float32)

    sam = LanPaintSampler(toy, config=LanPaintConfig(n_steps=2),
                          sampler_name="euler", cfg=1.0)
    latent_s = shard_batch(mesh, latent)
    mask_s = shard_batch(mesh, mask)
    cond_s = shard_batch(mesh, cond)
    out_1, _ = sam(latent=latent_s, sigmas=sigmas, cond=cond_s, mask=mask_s,
                   seed=0)
    out_c, _ = sam(latent=latent_s, sigmas=sigmas, cond=cond_s, mask=mask_s,
                   seed=0, chunk_steps=2)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_1))
    shard_devs = {s.device.id for s in out_c.addressable_shards}
    assert len(shard_devs) == 8


def test_wan14b_pair_multichip_plan():
    """The reference's actual benchmark model (Wan2.2 t2v 14B high+low pair,
    reference README.md:219-266) must have a validated multi-chip execution
    plan: per-device weight bytes fit a v5e (16 GB) under the TP rules, and
    a tiny-frame forward with the FULL-SIZE config's structure compiles
    through GSPMD on the 8-device mesh — no 28 GB init required
    (`jax.eval_shape` shape trees only)."""
    import math

    from jax.sharding import NamedSharding, PartitionSpec as P

    from lanpaint_tpu.models.wan import WAN22_T2V_14B_CONFIG, WanModel
    from lanpaint_tpu.parallel.mesh import (
        tp_param_shardings, tp_plan_bytes, wan_tp_rules,
    )

    cfg = WAN22_T2V_14B_CONFIG
    module = WanModel(cfg)
    b = 1
    x = jax.ShapeDtypeStruct((b, cfg.in_channels, 2, 16, 16), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((b,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((b, 64, cfg.context_dim), jnp.bfloat16)
    pshape = jax.eval_shape(module.init, jax.random.PRNGKey(0), x, t, ctx)

    n_params = sum(math.prod(p.shape) for p in jax.tree.leaves(pshape))
    assert 13.5e9 < n_params < 15.5e9, f"14B config has {n_params/1e9:.2f}B params"

    v5e = 16 * 2**30
    rules = wan_tp_rules()
    per_dev_tp2 = tp_plan_bytes(pshape, rules, {"tensor": 2})
    per_dev_tp4 = tp_plan_bytes(pshape, rules, {"tensor": 4})
    # single expert fits at tensor=2; the resident high+low pair at tensor=4
    assert per_dev_tp2 < v5e, f"tp2: {per_dev_tp2/2**30:.2f} GiB"
    assert 2 * per_dev_tp4 < v5e, f"tp4 pair: {2*per_dev_tp4/2**30:.2f} GiB"
    # sanity: sharding actually divides the big kernels (~2x per doubling)
    assert per_dev_tp2 < 0.56 * tp_plan_bytes(pshape, rules, {"tensor": 1})

    # structural compile: the full 14B topology through GSPMD (TP x SP mesh)
    mesh = make_mesh(MeshSpec(data=1, seq=2, tensor=4),
                     devices=jax.devices()[:8])
    pshard = tp_param_shardings(mesh, pshape, rules)
    xsh = NamedSharding(mesh, P(None, None, "seq", None, None))
    fn = jax.jit(module.apply, in_shardings=(pshard, xsh, None, None),
                 out_shardings=xsh)
    compiled = fn.lower(pshape, x, t, ctx).compile()
    assert compiled is not None
