"""TPU-native rebuild of the CARLA diffusion-planner framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``Justin900429/autonomous_driving_with_diffusion_model``: a conditional
trajectory-diffusion planner (temporal 1-D U-Net + ResNet-34 perception),
guided/inpainting DDPM/DDIM samplers fused into single XLA programs,
an SPMD data-parallel training stack, and a host-side driving layer
(PID control, route planning, closed-loop agents) for the CARLA simulator.
"""

__version__ = "0.1.0"

from .utils import (  # noqa: F401
    CfgNode,
    GuidanceType,
    MAGIC_NUM,
    create_cfg,
    merge_possible_with_base,
    show_config,
)
