"""Logger-bridge test (parity with reference tests/test_logger.py:6-8):
`test_logger()` emits one message per level through
`logging.getLogger("Htool")`."""

import logging

import htool_python_tpu as H


def test_logger(caplog):
    logging.basicConfig(level=logging.DEBUG)
    with caplog.at_level(logging.DEBUG, logger="Htool"):
        H.test_logger()
    levels = [r.levelno for r in caplog.records if r.name == "Htool"]
    assert levels == [logging.DEBUG, logging.INFO, logging.WARNING,
                      logging.ERROR, logging.CRITICAL]
