from sypha_tpu.core.status import IpmStatus, MilpStatus
from sypha_tpu.core.problem import ScpModel, PaddedLp

__all__ = ["IpmStatus", "MilpStatus", "ScpModel", "PaddedLp"]
