"""Test configuration: force the CPU backend with 8 virtual devices so
sharding logic is testable without a TPU pod (SURVEY.md §4).

Note: this image's sitecustomize registers a remote TPU ("axon") backend and
forces ``jax_platforms`` via config, so the env var alone is not enough — we
override the config and clear any initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass
