"""Logging bridge.

Reference parity: the C++ `htool::Logger` singleton forwards to
`logging.getLogger("Htool")` (src/htool/misc/logger.hpp:10-37, installed at
main.cpp:42) with a `test_logger()` smoke hook emitting one message per
level (misc/testing.hpp:5-11).  This framework logs natively through the
same logger name so downstream `logging` configuration is identical.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("Htool")


def get_logger() -> logging.Logger:
    return logger


def test_logger() -> None:
    """Emit one message per level (reference: misc/testing.hpp:5-11)."""
    logger.debug("Test debug message")
    logger.info("Test info message")
    logger.warning("Test warning message")
    logger.error("Test error message")
    logger.critical("Test critical message")
