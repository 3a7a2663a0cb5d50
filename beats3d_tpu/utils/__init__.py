from .profiler import ProfileTimer
from .intrinsics import CameraIntrinsics, rs_projection
from .compile_cache import enable_compilation_cache
from .logging import get_logger, MetricsLog

__all__ = [
    "ProfileTimer",
    "CameraIntrinsics",
    "rs_projection",
    "enable_compilation_cache",
    "get_logger",
    "MetricsLog",
]
