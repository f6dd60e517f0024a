"""Platform helpers: backend selection utilities for tests/dev loops."""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int | None = None) -> None:
    """Force the CPU backend (optionally with N virtual devices).

    Must run before any array is created on the target backend.  Needed
    because this image's sitecustomize force-selects a remote TPU backend
    via jax.config, which plain ``JAX_PLATFORMS=cpu`` does not override.
    """
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
