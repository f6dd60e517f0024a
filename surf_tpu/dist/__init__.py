from .sharding import (  # noqa: F401
    make_mesh,
    render_frame_sharded,
    grad_step_sharded,
    scaling_sweep,
)
