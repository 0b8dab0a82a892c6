"""Scalar-function surface: NiFi Expression Language / RecordPath → Spark."""

from .el import EL_FUNCTIONS, el  # noqa: F401
