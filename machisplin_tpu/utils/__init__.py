from .logging import banner, log, run_log
from .timing import PhaseTimer, trace

__all__ = ["PhaseTimer", "banner", "log", "run_log", "trace"]
