from .sharding import (  # noqa: F401
    ShardedSession,
    grad_step_compiled,
    grad_step_sharded,
    make_mesh,
    make_mesh_2d,
    render_frame_sharded,
    scaling_sweep,
    weak_scaling_sweep,
)
