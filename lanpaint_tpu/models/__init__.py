from .base import Denoiser, x0_from_eps, x0_from_v, x0_from_flow_velocity  # noqa: F401
