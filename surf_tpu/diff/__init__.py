from .estimator import (  # noqa: F401
    DiffTargets,
    render_image_diff,
    image_loss,
    grad_image_loss,
)
from .fd import finite_difference  # noqa: F401
