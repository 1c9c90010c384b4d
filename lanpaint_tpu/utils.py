"""Observability and persistence utilities.

TPU-native equivalents of the reference's aux subsystems (SURVEY.md section
5): profiling hooks (`jax.profiler` instead of nothing), weight persistence
(orbax instead of nothing), and the preview-callback plumbing (the
reference's TAESD preview callback, nodes.py:188-196, becomes an optional
host callback fired from inside the jitted scan via jax.debug.callback).
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/lanpaint_trace"):
    """Capture a jax.profiler trace of everything inside the block.

    View with TensorBoard or xprof.  Wrap a sampler call:

        with profile_trace("/tmp/trace"):
            sampler(latent=..., sigmas=..., cond=...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def save_params(path: str, params) -> None:
    """Persist a parameter pytree with orbax (weights checkpoint)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    """Restore a parameter pytree saved by save_params."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))


def make_preview_callback(fn: Callable[[int, "jax.Array"], None],
                          every: int = 2) -> Callable:
    """Throttle a host preview callback to every `every`-th step
    (reference nodes.py:192 shows previews every 2nd step)."""

    def cb(i, denoised, x):
        if int(i) % every == 0:
            fn(int(i), denoised)

    return cb
