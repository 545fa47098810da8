from . import projection, quaternion, dual_quaternion, se3  # noqa: F401
