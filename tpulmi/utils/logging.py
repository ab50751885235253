"""Structured logging for tpulmi.

The reference exposes a ``Logger`` mixin that calls ``logging.basicConfig`` on
every property access (`search/li/Logger.py:13-18`); here we configure once
and hand out per-component loggers.
"""

import logging
import time
from contextlib import contextmanager

_FORMAT = "[%(asctime)s][%(levelname)-5.5s][%(name)-.24s] %(message)s"
_configured = False


def _configure_once(level: int = logging.INFO) -> None:
    global _configured
    if not _configured:
        logging.basicConfig(level=level, format=_FORMAT)
        _configured = True


def get_logger(name: str) -> logging.Logger:
    """Return a configured logger for a component."""
    _configure_once()
    return logging.getLogger(name)


class LoggerMixin:
    """Per-class logger property — the reference's ``Logger`` mixin contract
    (`search/li/Logger.py:13-18`), minus its bug of reconfiguring the root
    logger on every property access."""

    @property
    def logger(self) -> logging.Logger:
        return get_logger(f"{type(self).__module__}.{type(self).__name__}")


@contextmanager
def log_duration(logger: logging.Logger, phase: str):
    """Wall-clock a phase and log it. Caller is responsible for calling
    ``jax.block_until_ready`` on device values inside the block if device
    time is what should be measured."""
    start = time.perf_counter()
    yield
    logger.info("%s took %.3fs", phase, time.perf_counter() - start)
