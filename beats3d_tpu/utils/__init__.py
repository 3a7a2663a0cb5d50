from .profiler import ProfileTimer
from .intrinsics import CameraIntrinsics, rs_projection

__all__ = ["ProfileTimer", "CameraIntrinsics", "rs_projection"]
