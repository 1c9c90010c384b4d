"""User-facing sampling API.

Pure-functional equivalents of the reference's five exported nodes
(reference src/LanPaint/nodes.py:631-638):

* `ksampler`            <-> LanPaint_KSampler (fixed defaults, nodes.py:298-349)
* `ksampler_advanced`   <-> LanPaint_KSamplerAdvanced (nodes.py:350-413)
* `sample_custom`       <-> LanPaint_SamplerCustom (nodes.py:491-556)
* `sample_custom_advanced` <-> LanPaint_SamplerCustomAdvanced (nodes.py:558-626)
* `lanpaint_tpu.masks.mask_blend` <-> LanPaint_MaskBlend

Instead of monkey-patching a host sampler (nodes.py:251-267), everything is
one jit-compiled XLA program built by `LanPaintSampler`: outer solver scan,
per-step think loop, CFG double pass, replace step — no host round-trips.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import samplers
from .config import LanPaintConfig, ModelKind
from .engine import lanpaint_update
from .guidance import make_cfg_double_denoiser, resolve_cfg_big
from .masks import prepare_mask
from .models.base import Denoiser
from .schedule import inverse_noise_scaling, noise_scaling, unify_times
from .sigmas import apply_denoise, calculate_sigmas


def _max_denoise(sigmas, sigma_table) -> bool:
    if sigma_table is None:
        return True
    s0 = float(sigmas[0])
    mx = float(sigma_table.sigma_max)
    return math.isclose(s0, mx, rel_tol=1e-5) or s0 > mx


def _seed_arg(seed):
    """Seed as a host uint32 scalar so it rides the prep launch as a traced
    argument (a new seed must NOT retrace, and an eager PRNGKey costs a
    tunnel round trip).  Bit-identical to eager PRNGKey(seed) for every int:
    with x64 disabled JAX folds the seed to its low 32 bits (verified:
    PRNGKey(2**33+5) == PRNGKey(5), PRNGKey(-1) == PRNGKey(0xFFFFFFFF)),
    which is exactly this mask.  Array seeds (e.g. a caller-held jnp.int32
    scalar) are normalized to uint32 too, so the decoupled-noise `seed + 1`
    in _run_prep uses the documented uint32 wrap on every input type
    instead of int32 overflow semantics."""
    if isinstance(seed, (int, np.integer)):
        return np.uint32(int(seed) & 0xFFFFFFFF)
    return jnp.asarray(seed).astype(jnp.uint32)


class LanPaintSampler:
    """A compiled LanPaint sampling program for one (model, config, solver).

    Reuse instances across calls — `jax.jit` caches on input shapes.  The
    hyperparameters that change compiled code (solver, think-loop config,
    cfg values via the cfg1 shortcut) are constructor arguments; latents,
    masks, conditioning and seeds are runtime arguments.
    """

    def __init__(
        self,
        model: Denoiser,
        *,
        config: LanPaintConfig = LanPaintConfig(),
        sampler_name: str = "euler",
        cfg: float = 5.0,
        cfg_big: Optional[float] = None,
        prompt_mode: str = "Image First",
        disable_cfg1_optimization: bool = False,
        denoise_mask_fn: Optional[Callable] = None,
        callback: Optional[Callable] = None,
        pre_cfg_fns: Optional[list] = None,
        sequential_cfg: bool = False,
        return_aux: bool = False,
    ):
        # callback(i, denoised, x) fires per outer step from inside the
        # compiled scan via jax.debug.callback (host round-trip; preview use
        # only — see utils.make_preview_callback for the every-2-steps
        # throttle matching reference nodes.py:188-196).
        self.model = model
        self.config = config
        self.sampler_name = sampler_name
        self.cfg = float(cfg)
        if cfg_big is None:
            cfg_big = resolve_cfg_big(prompt_mode, cfg, model.is_flux)
        self.cfg_big = float(cfg_big)
        self.disable_cfg1_optimization = disable_cfg1_optimization
        self.denoise_mask_fn = denoise_mask_fn
        self.callback = callback
        self.pre_cfg_fns = pre_cfg_fns
        # Sequential cond/uncond passes (two B-sized model calls instead of
        # one 2B-sized): same math; halves peak activation memory.  Use for
        # large-token video models — see guidance.make_cfg_double_denoiser.
        self.sequential_cfg = sequential_cfg
        # Surface the think-loop diagnostics (engine.ThinkAux): __call__
        # returns (samples, denoised, aux) where aux.steps_done[i] is the
        # Langevin iterations actually spent at outer step i and aux.trace
        # the per-inner-step semantic-stop rows — the user-reachable
        # equivalent of the reference's
        # model_options["lanpaint_semantic_trace"] (earlystop.py:315-334).
        # Pair with LanPaintConfig(record_trace=True) to fill trace rows
        # even when the stopper is disabled.
        self.return_aux = return_aux
        # Pin weights on device ONCE.  Host (numpy) params passed per call
        # re-upload the full weight tree every invocation — measured 11.2 s
        # vs 0.156 s per SDXL forward through the TPU tunnel.
        self._params = (
            jax.device_put(model.params) if model.params is not None else None
        )
        # dpm_fast_range is static: it selects which (atomic) solver groups
        # a chunked dpm_fast launch executes — program structure, not data.
        self._jit_inpaint = jax.jit(self._run_inpaint,
                                    static_argnames=("dpm_fast_range",))
        self._jit_plain = jax.jit(self._run_plain,
                                  static_argnames=("dpm_fast_range",))
        # Per-call prep (PRNG draws, noise scaling, mask resize, solver
        # carry init) as ONE jitted launch.  Eagerly these are ~15 separate
        # device ops, and on the tunneled TPU backend every eager op is a
        # host<->device round trip — measured 95-121 ms per __call__ at the
        # SDXL-1024 headline shapes (scripts/measure_prep.py, 2026-08-20),
        # a fixed cost the single-launch sampler cannot amortize and that
        # repeats per segment under chunked launches.
        self._jit_prep = jax.jit(
            self._run_prep,
            static_argnames=("add_noise", "decoupled", "max_denoise",
                             "video"))

    # -- compiled bodies ---------------------------------------------------

    def _precompute_cond(self, params, cond, uncond):
        """Apply the model's run-constant conditioning precompute (e.g. the
        UNet cross-attention k/v hoist, zoo.unet_precompute_kv) at trace top
        level — inside jit, OUTSIDE the solver scan and think while_loop —
        so it executes once per launch instead of once per model forward."""
        if self.model.precompute is None:
            return cond, uncond
        p = params if params is not None else self.model.params
        cond = self.model.precompute(p, cond)
        if uncond is not None:
            uncond = self.model.precompute(p, uncond)
        return cond, uncond

    def _denoise_pair(self, params, cond, uncond):
        # params flow through jit as an argument (model.bind) so weights are
        # never baked into the HLO as constants.
        return make_cfg_double_denoiser(
            self.model.bind(params), cond, uncond, self.cfg, self.cfg_big,
            self.disable_cfg1_optimization, self.pre_cfg_fns,
            sequential=self.sequential_cfg,
        )

    def _run_inpaint(self, params, x_init, think_noise, sigmas, latent,
                     denoise_mask, cond, uncond, key, tables,
                     step_offset, total_steps, carry_in,
                     noise_feed=None, dpm_fast_range=None):
        # step_offset/total_steps: global position of this (possibly
        # chunked) ladder segment — the RNG stream, outer-early-stop index
        # and callback step numbers stay those of the single-launch
        # program.  Terminal inverse noise scaling happens in __call__
        # (host side) so intermediate segments compose by identity.
        cond, uncond = self._precompute_cond(params, cond, uncond)
        denoise = self._denoise_pair(params, cond, uncond)
        kind = self.model.kind
        cfg_ = self.config

        def wrapped(x, sigma, k):
            sigma_b = jnp.broadcast_to(sigma, (x.shape[0],))
            times = unify_times(sigma_b, kind)
            dm = denoise_mask
            if self.denoise_mask_fn is not None:
                dm = self.denoise_mask_fn(sigma, dm)
            dm = (dm > 0.5).astype(jnp.float32)
            latent_mask = 1.0 - dm
            # Outer early stop: zero think steps in the tail
            # (reference nodes.py:177-183).
            step = jnp.argmin(jnp.abs(sigmas - sigma)) + step_offset
            n = jnp.where(total_steps - step <= cfg_.outer_early_stop, 0,
                          cfg_.n_steps)
            # Parity/replay mode: noise_feed is (total_steps, n_max, 5,
            # *x.shape) recorded reference draws; each outer step consumes
            # its own row (engine.lanpaint_update noise_feed contract).
            feed_step = None
            if noise_feed is not None:
                feed_step = jax.lax.dynamic_index_in_dim(
                    noise_feed, step, keepdims=False)
            out, x_new, aux = lanpaint_update(
                denoise, x, latent_image=latent, noise=think_noise,
                latent_mask=latent_mask, sigma=sigma_b, times=times,
                n_steps=n, config=cfg_, kind=kind, key=k,
                noise_feed=feed_step,
            )
            if self.return_aux:
                return out, x_new, aux
            return out, x_new

        return samplers.sample(
            wrapped, x_init, sigmas, sampler=self.sampler_name, key=key,
            callback=self.callback, tables=tables, step_offset=step_offset,
            carry_in=carry_in, return_carry=True,
            collect_aux=self.return_aux,
            dpm_fast_range=dpm_fast_range,
        )

    def _run_plain(self, params, x_init, sigmas, cond, uncond, key, tables,
                   step_offset, carry_in, dpm_fast_range=None):
        cond, uncond = self._precompute_cond(params, cond, uncond)
        denoise = self._denoise_pair(params, cond, uncond)
        kind = self.model.kind

        def wrapped(x, sigma, k):
            sigma_b = jnp.broadcast_to(sigma, (x.shape[0],))
            times = unify_times(sigma_b, kind)
            t = times.flow_t if kind is ModelKind.FLOW else times.ve_sigma
            out, _ = denoise(x, t)
            return out, x

        return samplers.sample(
            wrapped, x_init, sigmas, sampler=self.sampler_name, key=key,
            callback=self.callback, tables=tables, step_offset=step_offset,
            carry_in=carry_in, return_carry=True,
            dpm_fast_range=dpm_fast_range,
        )

    def _run_prep(self, latent, sigma0, seed, noise, mask, *,
                  add_noise: bool, decoupled: bool, max_denoise: bool,
                  video: bool):
        """Everything __call__ needs on device before the solver launch,
        as one program: RNG key derivation + initial/think noise draws
        (bit-identical to the former eager path — threefry is
        deterministic under jit), forward noise scaling, mask -> latent
        grid, and the solver-carry init.  `noise`/`mask` may be None
        (static program structure, like the eager code's branches).

        Takes only the SCALAR sigmas[0] (not the ladder): the prep program
        is then shape-stable across ladder lengths, so varying step counts
        reuse one compile instead of paying a 20-40 s tunnel compile each."""
        key = jax.random.PRNGKey(seed)
        k_init, k_think, k_solve = jax.random.split(key, 3)
        if noise is None:
            noise = (
                jax.random.normal(k_init, latent.shape, jnp.float32)
                if add_noise
                else jnp.zeros_like(latent, dtype=jnp.float32)
            )
        else:
            noise = jnp.asarray(noise)
        # Optional decoupled think-loop noise from seed+1
        # (reference nodes.py:208-212).
        think_noise = (
            jax.random.normal(jax.random.PRNGKey(seed + 1), latent.shape,
                              jnp.float32)
            if decoupled
            else noise
        )
        x_init = noise_scaling(
            self.model.kind,
            jnp.broadcast_to(sigma0, (latent.shape[0],)),
            noise, latent, max_denoise=max_denoise,
        )
        denoise_mask = (None if mask is None
                        else prepare_mask(mask, latent.shape, video))
        return x_init, think_noise, k_solve, denoise_mask, \
            samplers.init_carry(x_init)

    # -- runtime entry -----------------------------------------------------

    def __call__(
        self,
        *,
        latent: jnp.ndarray,
        sigmas,
        cond: Any,
        uncond: Any = None,
        mask=None,
        seed: int = 0,
        noise: Optional[jnp.ndarray] = None,
        add_noise: bool = True,
        decoupled_noise: bool = False,
        video: bool = False,
        chunk_steps: Optional[int] = None,
        noise_feed: Optional[jnp.ndarray] = None,
    ):
        """Run sampling.  Returns (samples, denoised_history).

        `noise_feed` (parity/replay mode): (total_steps, n_max, 5, *latent
        .shape) recorded standard-normal draws consumed by the think loop
        instead of the PRNG (engine.lanpaint_update contract) — the
        full-ladder seed-for-seed mechanism used by
        tests/test_reference_golden.py's ladder cases.

        `chunk_steps`: run the sigma ladder as ceil(steps/chunk) jitted
        launches of at most `chunk_steps` outer steps each instead of one.
        Bit-identical to the single launch for every solver: the per-step
        RNG stream, outer early stop and callbacks carry the global step
        index; the multistep history (dpmpp_2m, dpmpp_2m/3m_sde,
        res_multistep(_ancestral), gradient_estimation, er_sde, deis) is
        threaded across segment boundaries as a SolverCarry, and deis
        coefficients are precomputed from the FULL ladder then sliced per
        segment; heunpp2's three full-ladder scalars ride its per-step
        table rows; dpm_fast chunks at its atomic group granularity (each
        launch gets the full ladder plus a static group range, so grid,
        grouping and RNG stream match the single launch exactly — launch
        boundaries snap to group boundaries).  Use at video scale: bounds
        single-execution device time (the remote-TPU transport kills
        executions beyond ~1 min) and gives the serving layer per-chunk
        progress/cancellation points.
        """
        latent = jnp.asarray(latent)
        # Keep the ladder HOST-side for the whole entry: tables, chunk
        # planning and max_denoise need host values anyway, and the jitted
        # launches upload it as an ordinary argument.  Device-resident
        # callers pay ONE readback here; host callers pay zero round trips
        # (the old code did an eager device cast plus two readbacks).
        sig_host = np.asarray(sigmas, dtype=np.float32)
        sigmas = sig_host

        # All per-call device prep in one jitted launch (see _run_prep).
        x_init, think_noise, k_solve, denoise_mask, carry0 = self._jit_prep(
            latent, np.float32(sig_host[0]), _seed_arg(seed), noise,
            # host masks ride the prep launch as an argument (np.asarray is
            # host-side) instead of paying a separate eager transfer
            None if mask is None
            else mask if isinstance(mask, jax.Array) else np.asarray(mask),
            add_noise=add_noise, decoupled=decoupled_noise,
            max_denoise=_max_denoise(sig_host, self.model.sigma_table),
            video=video,
        )

        params = self._params  # device-resident; traced through jit
        kind = self.model.kind
        total = int(sigmas.shape[0]) - 1
        chunk = total if not chunk_steps else max(1, int(chunk_steps))
        if total <= 0:
            return (inverse_noise_scaling(kind, sigmas[-1:], x_init),
                    jnp.zeros((0,) + x_init.shape, x_init.dtype))
        # dpm_fast chunking works on GROUPS (its order-3/2/1 multi-call
        # updates are atomic): each launch executes a contiguous group range
        # against the FULL ladder, so the t grid, the fold_in(key, g) stream
        # and the order grouping are exactly those of the single launch —
        # bit-identical, with launch boundaries snapped to group boundaries
        # (a chunk may therefore span up to chunk_steps+2 grid steps).
        dpm_ranges = None
        if chunk_steps is not None and self.sampler_name == "dpm_fast":
            orders = samplers.dpm_fast_groups(total)
            dpm_ranges = []
            g0, span = 0, 0
            for g, o in enumerate(orders):
                if span and span + o > chunk:
                    dpm_ranges.append((g0, g, False))
                    g0, span = g, 0
                span += o
            dpm_ranges.append((g0, len(orders), True))
        chunked = (chunk < total) if dpm_ranges is None else len(dpm_ranges) > 1
        if chunked:
            # Pin per-call constants to the device before the launch loop:
            # host-resident jit arguments re-upload on EVERY launch, and on
            # the tunneled TPU backend that transfer dwarfs the compute
            # (measured: ~130 s/launch for ~15 MB of latent+noise+mask).
            # Arrays already sharded over a multi-chip mesh are left alone —
            # a bare device_put would re-place them on one device.
            def _pin(a):
                if isinstance(a, jax.Array) and len(a.sharding.device_set) > 1:
                    return a
                return jax.device_put(a)

            latent, think_noise = jax.tree.map(_pin, (latent, think_noise))
            cond, uncond = jax.tree.map(_pin, (cond, uncond))
            if denoise_mask is not None:
                denoise_mask = _pin(denoise_mask)
        x = x_init
        carry = carry0  # built on device by the prep launch
        den_parts = []
        aux_parts = []
        # deis coefficients come from the FULL ladder (then sliced per
        # segment) so chunked launches see the same per-step rows as the
        # single launch — segment-local ladders would re-taper the order.
        full_tables = samplers.prepare_tables(self.sampler_name, sig_host)
        if dpm_ranges is not None:
            # every dpm_fast launch sees the full ladder; the static group
            # range selects its share of the work
            segments = [(sigmas, full_tables, 0, r) for r in dpm_ranges]
        else:
            segments = []
            for start in range(0, total, chunk):
                end = min(start + chunk, total)
                segments.append((sigmas[start:end + 1],
                                 {k: v[start:end] for k, v in full_tables.items()},
                                 start, None))
        for seg, tables, start, g_range in segments:
            if denoise_mask is None:
                x, den, carry = self._jit_plain(
                    params, x, seg, cond, uncond, k_solve, tables,
                    np.int32(start), carry, dpm_fast_range=g_range)
            else:
                x, den, carry = self._jit_inpaint(
                    params, x, think_noise, seg, latent, denoise_mask, cond,
                    uncond, k_solve, tables, np.int32(start),
                    np.int32(total), carry, noise_feed=noise_feed,
                    dpm_fast_range=g_range)
                if self.return_aux:
                    den, aux = den
                    aux_parts.append(aux)
            den_parts.append(den)

        samples = inverse_noise_scaling(kind, sigmas[-1:], x)
        den_all = (den_parts[0] if len(den_parts) == 1
                   else jnp.concatenate(den_parts, axis=0))
        if self.return_aux:
            # per-outer-step ThinkAux (None on the plain/no-mask path —
            # there is no think loop to report on)
            aux_all = None
            if aux_parts:
                aux_all = (aux_parts[0] if len(aux_parts) == 1 else
                           jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                                        *aux_parts))
            return samples, den_all, aux_all
        return samples, den_all


# ---------------------------------------------------------------------------
# Node-equivalent convenience entry points


_SAMPLER_CACHE: dict = {}


def _cached_sampler(model: Denoiser, config: LanPaintConfig,
                    sampler_name: str, cfg: float, prompt_mode: str,
                    sequential_cfg: bool = False,
                    with_callback: bool = False,
                    return_aux: bool = False) -> LanPaintSampler:
    """Memoize LanPaintSampler per (model, static hyperparameters).

    The node-style entry points (ksampler etc.) are called per request;
    constructing a fresh sampler each time would re-jit (and on the remote
    TPU backend re-COMPILE, minutes) the identical program.  Keyed on the
    model object identity plus every constructor argument that shapes the
    compiled code; latents/conds/seeds stay runtime arguments.

    with_callback=True traces a swappable TRAMPOLINE into the program (the
    actual callback is a trace-time constant via jax.debug.callback, so
    per-request callbacks would otherwise recompile): callers set
    `sam._cb_holder["cb"]` around the launch.  Kept out of the default
    program — the debug.callback host sync costs real time per step.
    """
    import dataclasses as _dc

    # id(model.params) is part of the key: Denoiser is mutable, and a
    # LoRA merge / expert swap replaces the params tree — a cache hit on
    # the old tree would silently sample with stale device-pinned weights.
    key = (id(model), id(model.params), _dc.astuple(
        _dc.replace(config, distance_fn=None)), config.distance_fn,
        sampler_name, float(cfg), prompt_mode, sequential_cfg,
        with_callback, return_aux)
    # LRU: a hit re-inserts at the end so a serving mix of >8 variants
    # evicts the coldest compiled program, not the hottest.
    sam = _SAMPLER_CACHE.pop(key, None)
    if sam is None:
        holder: dict = {}
        tramp = None
        if with_callback:
            def tramp(i, den, x, _h=holder):  # noqa: E306
                cb = _h.get("cb")
                if cb is not None:
                    cb(i, den, x)
        sam = LanPaintSampler(model, config=config, sampler_name=sampler_name,
                              cfg=cfg, prompt_mode=prompt_mode,
                              sequential_cfg=sequential_cfg, callback=tramp,
                              return_aux=return_aux)
        sam._cb_holder = holder
    _SAMPLER_CACHE[key] = sam
    # Bounded: each entry pins a device-resident weight copy; evict the
    # least-recently-used beyond 8 variants (dict preserves insertion order).
    while len(_SAMPLER_CACHE) > 8:
        _SAMPLER_CACHE.pop(next(iter(_SAMPLER_CACHE)))
    return sam


def _build_sigmas(model: Denoiser, scheduler: str, steps: int, denoise: float = 1.0):
    if model.sigma_table is None:
        raise ValueError("model has no sigma_table; pass explicit sigmas")
    return jnp.asarray(apply_denoise(model.sigma_table, scheduler, steps, denoise))


def ksampler(
    model: Denoiser,
    *,
    seed: int = 0,
    steps: int = 30,
    cfg: float = 5.0,
    sampler_name: str = "euler",
    scheduler: str = "karras",
    positive: Any,
    negative: Any = None,
    latent: jnp.ndarray,
    mask=None,
    denoise: float = 1.0,
    num_steps: int = 5,
    prompt_mode: str = "Image First",
    video: bool = False,
    chunk_steps: Optional[int] = None,
    sequential_cfg: bool = False,
    noise: Optional[jnp.ndarray] = None,
    callback: Optional[Callable] = None,
    trace: Optional[dict] = None,
):
    """LanPaint_KSampler equivalent: simple API with reference defaults
    (StepSize=0.2, Lambda=16, Beta=1, Friction=15, EarlyStop=1;
    reference nodes.py:329-336).  `noise` overrides the seed-derived
    initial noise (e.g. per-lane seeded noise in a served batch);
    `callback(i, denoised, x)` fires per outer step (preview/progress —
    costs a host sync per step, so the no-callback program stays clean).

    `trace`: pass a dict to receive the think-loop diagnostics — filled
    with "steps_done" (int array, Langevin iterations actually spent per
    outer step) and "trace" ((steps, n_max, 8) float array of per-inner-step
    rows: [inner_step, dist, dist_inpaint, dist_ring, dist_drift, threshold,
    patience, stopped]).  The user-reachable equivalent of the reference's
    model_options["lanpaint_semantic_trace"] (earlystop.py:315-334)."""
    config = LanPaintConfig(n_steps=num_steps, record_trace=trace is not None)
    sam = _cached_sampler(model, config, sampler_name, cfg, prompt_mode,
                          sequential_cfg, with_callback=callback is not None,
                          return_aux=trace is not None)
    sigmas = _build_sigmas(model, scheduler, steps, denoise)
    if callback is not None:
        sam._cb_holder["cb"] = callback
    try:
        out = sam(latent=latent, sigmas=sigmas, cond=positive,
                  uncond=negative, mask=mask, seed=seed, video=video,
                  chunk_steps=chunk_steps, noise=noise)
    finally:
        if callback is not None:
            sam._cb_holder["cb"] = None
    if trace is not None:
        samples, _, aux = out
        _fill_trace(trace, aux)
        return samples
    samples, _ = out
    return samples


def _fill_trace(trace: dict, aux) -> None:
    """Materialize a ThinkAux into a user-supplied trace dict (host numpy)."""
    if aux is None:
        trace["steps_done"] = None
        trace["trace"] = None
        return
    trace["steps_done"] = np.asarray(aux.steps_done)
    trace["trace"] = np.asarray(aux.trace)


def ksampler_advanced(
    model: Denoiser,
    *,
    add_noise: bool = True,
    noise_seed: int = 0,
    steps: int = 30,
    cfg: float = 5.0,
    sampler_name: str = "euler",
    scheduler: str = "karras",
    positive: Any,
    negative: Any = None,
    latent: jnp.ndarray,
    mask=None,
    start_at_step: int = 0,
    end_at_step: int = 10000,
    return_with_leftover_noise: bool = False,
    num_steps: int = 5,
    lamb: float = 16.0,
    step_size: float = 0.2,
    beta: float = 1.0,
    friction: float = 15.0,
    prompt_mode: str = "Image First",
    early_stop: int = 1,
    inner_threshold: float = 0.0,
    inner_patience: int = 1,
    video: bool = False,
    chunk_steps: Optional[int] = None,
    sequential_cfg: bool = False,
    trace: Optional[dict] = None,
):
    """LanPaint_KSamplerAdvanced equivalent: full hyperparameter surface
    (reference nodes.py:350-413).  `trace`: see `ksampler` — with
    inner_threshold > 0 the rows also show the semantic stopper's
    patience/stop decisions."""
    config = LanPaintConfig(
        n_steps=num_steps, lamb=lamb, step_size=step_size, beta=beta,
        friction=friction, outer_early_stop=early_stop,
        inner_threshold=inner_threshold, inner_patience=inner_patience,
        record_trace=trace is not None,
    )
    sigmas = np.asarray(calculate_sigmas(model.sigma_table, scheduler, steps))
    last = min(end_at_step, steps)
    sigmas = sigmas[start_at_step: last + 1].copy()
    if len(sigmas) == 0:
        return latent
    if not return_with_leftover_noise:
        sigmas[-1] = 0.0
    sam = _cached_sampler(model, config, sampler_name, cfg, prompt_mode,
                          sequential_cfg, return_aux=trace is not None)
    out = sam(latent=latent, sigmas=sigmas, cond=positive,
              uncond=negative, mask=mask, seed=noise_seed,
              add_noise=add_noise, video=video,
              chunk_steps=chunk_steps)
    if trace is not None:
        samples, _, aux = out
        _fill_trace(trace, aux)
        return samples
    samples, _ = out
    return samples


def sample_custom(
    model: Denoiser,
    *,
    add_noise: bool = True,
    noise_seed: int = 0,
    cfg: float = 8.0,
    positive: Any,
    negative: Any = None,
    sampler_name: str = "euler",
    sigmas,
    latent: jnp.ndarray,
    mask=None,
    num_steps: int = 5,
    prompt_mode: str = "Image First",
    video: bool = False,
    chunk_steps: Optional[int] = None,
    sequential_cfg: bool = False,
):
    """LanPaint_SamplerCustom equivalent: caller-supplied sigma ladder;
    returns (output, denoised_output) (reference nodes.py:491-556)."""
    config = LanPaintConfig(n_steps=num_steps)
    sam = _cached_sampler(model, config, sampler_name, cfg, prompt_mode,
                          sequential_cfg)
    samples, den_all = sam(latent=latent, sigmas=sigmas, cond=positive,
                           uncond=negative, mask=mask, seed=noise_seed,
                           add_noise=add_noise, video=video,
                           chunk_steps=chunk_steps)
    denoised = den_all[-1]
    if model.process_latent_out is not None:
        denoised = model.process_latent_out(denoised)
    return samples, denoised


def sample_custom_advanced(
    model: Denoiser,
    *,
    noise_seed: int = 0,
    noise: Optional[jnp.ndarray] = None,
    cfg: float = 8.0,
    positive: Any,
    negative: Any = None,
    sampler_name: str = "euler",
    sigmas,
    latent: jnp.ndarray,
    mask=None,
    num_steps: int = 5,
    lamb: float = 16.0,
    step_size: float = 0.2,
    beta: float = 1.0,
    friction: float = 15.0,
    prompt_mode: str = "Image First",
    early_stop: int = 1,
    inner_threshold: float = 0.0,
    inner_patience: int = 1,
    video: bool = False,
    chunk_steps: Optional[int] = None,
    sequential_cfg: bool = False,
):
    """LanPaint_SamplerCustomAdvanced equivalent: full knobs + custom sigmas
    + caller-supplied noise (reference nodes.py:558-626)."""
    config = LanPaintConfig(
        n_steps=num_steps, lamb=lamb, step_size=step_size, beta=beta,
        friction=friction, outer_early_stop=early_stop,
        inner_threshold=inner_threshold, inner_patience=inner_patience,
    )
    sam = _cached_sampler(model, config, sampler_name, cfg, prompt_mode,
                          sequential_cfg)
    samples, den_all = sam(latent=latent, sigmas=sigmas, cond=positive,
                           uncond=negative, mask=mask, seed=noise_seed,
                           noise=noise, video=video,
                           chunk_steps=chunk_steps)
    denoised = den_all[-1]
    if model.process_latent_out is not None:
        denoised = model.process_latent_out(denoised)
    return samples, denoised


def inpaint_image(
    model: Denoiser,
    vae_module,
    vae_params,
    *,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    positive: Any,
    negative: Any = None,
    seed: int = 0,
    steps: int = 30,
    cfg: float = 5.0,
    sampler_name: str = "euler",
    scheduler: str = "karras",
    num_steps: int = 5,
    prompt_mode: str = "Image First",
    blend_overlap: int = 9,
    **sampler_kwargs,
):
    """Pixel-space inpainting: VAE encode -> LanPaint ksampler -> VAE decode
    -> MaskBlend.

    Composes the full workflow the reference's example graphs run through
    their host (VAEEncode -> LanPaint_KSampler -> VAEDecode ->
    LanPaint_MaskBlend, e.g. example_workflows/SDXL_Inpaint.json) as one
    call.  `image` is (B, 3, H, W) in [-1, 1] with H/W multiples of 8;
    `mask` is (H, W) pixel mask (1 = repaint).  Returns (B, 3, H, W).
    """
    from .masks import mask_blend

    latent = vae_module.apply(vae_params, image, method="encode")
    out_latent = ksampler(
        model, seed=seed, steps=steps, cfg=cfg, sampler_name=sampler_name,
        scheduler=scheduler, positive=positive, negative=negative,
        latent=latent, mask=mask, num_steps=num_steps,
        prompt_mode=prompt_mode, **sampler_kwargs,
    )
    decoded = vae_module.apply(vae_params, out_latent, method="decode")
    if blend_overlap <= 0:
        return decoded
    img_hwc = jnp.transpose(image, (0, 2, 3, 1))
    dec_hwc = jnp.transpose(decoded, (0, 2, 3, 1)).astype(img_hwc.dtype)
    m = jnp.asarray(mask, jnp.float32)
    if m.ndim == 2:
        m = m[None]
    m = jnp.broadcast_to(m, img_hwc.shape[:3])
    blended = mask_blend(img_hwc, dec_hwc, m, blend_overlap=blend_overlap)
    return jnp.transpose(blended, (0, 3, 1, 2))


def outpaint_image(
    model: Denoiser,
    vae_module,
    vae_params,
    *,
    image: jnp.ndarray,
    padding,
    positive: Any,
    **kw,
):
    """Outpainting (reference Qwen_Image_Outpainting workflow): grow the
    canvas by `padding` = (top, bottom, left, right) pixels (multiples of
    the VAE stride), edge-replicate the source into the new border, mask
    the border as the repaint region, and run the pixel inpaint pipeline.

    Returns the (B, 3, H+t+b, W+l+r) outpainted canvas."""
    import numpy as np

    t, b, lft, r = padding
    img = np.asarray(image, np.float32)
    canvas = np.pad(img, ((0, 0), (0, 0), (t, b), (lft, r)), mode="edge")
    hh, ww = canvas.shape[2], canvas.shape[3]
    mask = np.ones((hh, ww), np.float32)
    mask[t:hh - b if b else hh, lft:ww - r if r else ww] = 0.0
    return inpaint_image(model, vae_module, vae_params,
                         image=jnp.asarray(canvas), mask=jnp.asarray(mask),
                         positive=positive, **kw)


def edit_image(
    model: Denoiser,
    vae_module,
    vae_params,
    *,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    positive: Any,
    negative: Any = None,
    blend_overlap: int = 9,
    **sampler_kwargs,
):
    """Qwen-Image-Edit masked edit: the source image conditions the DiT as
    packed reference latents appended to the image token stream (the
    reference workflow's ReferenceLatent path, Qwen_Image_Edit_2509.json),
    on top of the usual VAE encode -> LanPaint -> decode -> MaskBlend.

    For the full reference conditioning also pass `positive` built by
    `text.encode_prompt(family="qwen_edit", vision=..., image=...)`, which
    adds the Qwen2.5-VL vision tokens to the prompt sequence.  `image` is
    (B, 3, H, W) in [-1, 1]; `mask` (H, W) with 1 = region to edit.
    """
    from .models.dit import pack_latent

    latent = vae_module.apply(vae_params, image, method="encode")
    ref = pack_latent(latent, 2)

    def with_ref(cond):
        if not isinstance(cond, dict):
            return cond
        out = dict(cond)
        out.setdefault("ref_tokens", ref)
        return out

    return inpaint_image(
        model, vae_module, vae_params, image=image, mask=mask,
        positive=with_ref(positive), negative=with_ref(negative),
        blend_overlap=blend_overlap, **sampler_kwargs)


def inpaint_video(
    model: Denoiser,
    vae_module,
    vae_params,
    *,
    video: jnp.ndarray,
    mask: jnp.ndarray,
    positive: Any,
    negative: Any = None,
    seed: int = 0,
    steps: int = 20,
    cfg: float = 5.0,
    sampler_name: str = "euler",
    scheduler: str = "simple",
    num_steps: int = 2,
    prompt_mode: str = "Image First",
    blend_overlap: int = 9,
    **sampler_kwargs,
):
    """Pixel-space VIDEO inpainting: Wan VAE encode -> LanPaint (video mask
    path) -> decode -> per-frame MaskBlend.

    The video analog of `inpaint_image` — the reference runs this graph
    through ComfyUI (VAEEncode with wan_2.1_vae -> LanPaint_KSampler 🎬 ->
    VAEDecode, reference README.md:205-268 video workflows).  `video` is
    (B, 3, T, H, W) in [-1, 1] with T = 1+4k and H/W multiples of the
    VAE's spatial stride (8 for Wan2.1, 16 for the Wan2.2/TI2V-5B VAE —
    both are `models.video_vae.WanVAE` configs and plug in unchanged);
    `mask` is a (T, H, W) or (H, W) pixel mask (1 = repaint; 2D masks
    apply to every frame).  Returns (B, 3, T, H, W).
    """
    from .masks import mask_blend

    latent = vae_module.apply(vae_params, video, method="encode")
    out_latent = ksampler(
        model, seed=seed, steps=steps, cfg=cfg, sampler_name=sampler_name,
        scheduler=scheduler, positive=positive, negative=negative,
        latent=latent, mask=mask, num_steps=num_steps,
        prompt_mode=prompt_mode, video=True, **sampler_kwargs,
    )
    decoded = vae_module.apply(vae_params, out_latent, method="decode")
    if blend_overlap <= 0:
        return decoded
    b, _, t, hh, ww = video.shape
    m = jnp.asarray(mask, jnp.float32)
    if m.ndim == 2:
        m = jnp.broadcast_to(m[None], (t, hh, ww))
    # fold frames into the batch axis for the 2D blend
    img_hwc = jnp.transpose(video, (0, 2, 3, 4, 1)).reshape(b * t, hh, ww, 3)
    dec_hwc = jnp.transpose(decoded, (0, 2, 3, 4, 1)).reshape(
        b * t, hh, ww, 3).astype(img_hwc.dtype)
    mf = jnp.broadcast_to(m[None], (b, t, hh, ww)).reshape(b * t, hh, ww)
    blended = mask_blend(img_hwc, dec_hwc, mf, blend_overlap=blend_overlap)
    return jnp.transpose(blended.reshape(b, t, hh, ww, 3), (0, 4, 1, 2, 3))
