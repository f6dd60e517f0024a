from .cpu_renderer import OracleRenderer  # noqa: F401
