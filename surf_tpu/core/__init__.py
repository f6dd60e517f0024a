from . import rng, sampling, geometry, vecmath  # noqa: F401
