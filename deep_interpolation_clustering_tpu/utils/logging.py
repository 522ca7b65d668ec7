"""Singleton stdlib logger (reference utils.py:21-35)."""

from __future__ import annotations

import logging


def get_logger(log_level: str = "INFO") -> logging.Logger:
    lg = logging.getLogger("dicl")
    if not getattr(lg, "handler_set", None):
        formatter = logging.Formatter(
            "%(asctime)s %(levelname)s - %(funcName)s(%(lineno)d): %(message)s",
            "%H:%M:%S",
        )
        lg.setLevel(log_level.upper())
        stream = logging.StreamHandler()
        stream.setLevel(log_level.upper())
        stream.setFormatter(formatter)
        lg.addHandler(stream)
        lg.handler_set = True
        lg.propagate = False
    return lg


logger = get_logger("INFO")
