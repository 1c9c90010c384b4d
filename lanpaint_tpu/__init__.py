"""lanpaint-tpu: TPU-native training-free diffusion inpainting (LanPaint rebuild).

A standalone JAX framework with the capabilities of scraed/LanPaint: a
per-denoising-step Langevin "think loop" with bidirectional guidance between
known and masked latent regions, compiled to a single XLA program
(lax.scan outer sampler, lax.while_loop think loop, fused Pallas update
kernels) driving JAX diffusion backbones.
"""

from .api import (  # noqa: F401
    LanPaintSampler,
    edit_image,
    inpaint_image,
    inpaint_video,
    ksampler,
    ksampler_advanced,
    outpaint_image,
    sample_custom,
    sample_custom_advanced,
)
from .config import LanPaintConfig, ModelKind  # noqa: F401
from .pipeline import LanPaintPipeline  # noqa: F401
from .masks import mask_blend, prepare_mask, reshape_mask  # noqa: F401
from .models.base import (  # noqa: F401
    Denoiser,
    x0_from_eps,
    x0_from_flow_velocity,
    x0_from_v,
)

__version__ = "0.1.0"
