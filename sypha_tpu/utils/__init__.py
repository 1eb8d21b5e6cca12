from sypha_tpu.utils.logging import Logger
from sypha_tpu.utils.timers import PhaseTimers

__all__ = ["Logger", "PhaseTimers"]
