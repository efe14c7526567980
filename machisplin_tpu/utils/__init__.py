from .cache import enable_compile_cache
from .logging import banner, log, run_log
from .timing import PhaseTimer, trace

__all__ = ["PhaseTimer", "banner", "enable_compile_cache", "log", "run_log", "trace"]
