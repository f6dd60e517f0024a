from .config import AppConfig  # noqa: F401
from .metrics import FrameMetrics, MetricsLog  # noqa: F401
from . import image_io  # noqa: F401
