from .builder import BVH, build_bvh, build_blas, build_tlas, refit  # noqa: F401
