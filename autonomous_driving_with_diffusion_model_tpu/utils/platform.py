"""Host-platform override shared by every CLI entry point.

The image's sitecustomize programmatically forces jax_platforms="axon,cpu"
(the remote TPU tunnel); env vars alone hang backend init, so honoring
``ADM_PLATFORM`` requires flipping jax.config before the backend starts.
"""

from __future__ import annotations

import os

__all__ = ["apply_adm_platform"]


def apply_adm_platform() -> str | None:
    """If ADM_PLATFORM is set, point jax at it (e.g. "cpu" for host-only
    smoke runs). Call before any jax backend initialization. Returns the
    applied platform or None."""
    platform = os.environ.get("ADM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform or None
