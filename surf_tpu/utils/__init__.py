from .platform import force_cpu  # noqa: F401
