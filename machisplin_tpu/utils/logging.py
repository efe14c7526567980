"""Run logging — the MachiSplin.LOG.txt tee, structured.

The reference tees every progress print to 'MachiSplin.LOG.txt' via sink()
(V73:200/966).  Here the pipeline logs through the standard ``machisplin``
logger; ``run_log`` attaches a file handler for the same
tee-everything-to-a-run-log behavior, plus timestamped phase banners.
"""
from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("machisplin")


@contextlib.contextmanager
def run_log(path: str = "MachiSplin.LOG.txt", level=logging.INFO, echo: bool = True):
    """Tee pipeline logging to ``path`` for the duration of the context."""
    handler = logging.FileHandler(path, mode="w")
    handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    log.addHandler(handler)
    prev_level = log.level
    log.setLevel(level)
    stream = None
    if echo and not any(isinstance(h, logging.StreamHandler) for h in log.handlers):
        stream = logging.StreamHandler()
        log.addHandler(stream)
    try:
        yield log
    finally:
        log.removeHandler(handler)
        handler.close()
        if stream is not None:
            log.removeHandler(stream)
        log.setLevel(prev_level)


def banner(title: str):
    bar = "#" * 91
    log.info(bar)
    log.info("### %s", title)
    log.info(bar)
