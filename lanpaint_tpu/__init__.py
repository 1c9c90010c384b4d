"""lanpaint-tpu: TPU-native training-free diffusion inpainting (LanPaint rebuild).

A standalone JAX framework with the capabilities of scraed/LanPaint: a
per-denoising-step Langevin "think loop" with bidirectional guidance between
known and masked latent regions, compiled to a single XLA program
(lax.scan outer sampler, lax.while_loop think loop, fused Pallas update
kernels) driving JAX diffusion backbones.
"""

__version__ = "0.1.0"
