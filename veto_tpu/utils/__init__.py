from .checkpoint import CheckpointManager  # noqa: F401
from .logger import MetricLogger, setup_logger  # noqa: F401
