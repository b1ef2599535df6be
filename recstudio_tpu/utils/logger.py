"""Logging helpers: colorful console + plain file logs.

Reference behavior: recstudio/utils/utils.py:401-443 (color console handler and
an ANSI-stripping file handler under a log dir named by model/dataset/time).
"""
from __future__ import annotations

import logging
import os
import re
import time

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")

_COLORS = {
    logging.DEBUG: "\x1b[36m",     # cyan
    logging.INFO: "\x1b[32m",      # green
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[35m",  # magenta
}
_RESET = "\x1b[0m"


class ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color else msg


class StripAnsiFormatter(logging.Formatter):
    def format(self, record):
        return _ANSI_RE.sub("", super().format(record))


def get_logger(name: str = "recstudio_tpu", log_dir: str | None = None,
               filename: str | None = None, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(ColorFormatter("[%(asctime)s] %(levelname)s %(message)s", "%H:%M:%S"))
        logger.addHandler(sh)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        if filename is None:
            filename = time.strftime("%Y-%m-%d-%H-%M-%S.log")
        path = os.path.join(log_dir, filename)
        if not any(isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path)
                   for h in logger.handlers):
            fh = logging.FileHandler(path)
            fh.setFormatter(StripAnsiFormatter("[%(asctime)s] %(levelname)s %(message)s"))
            logger.addHandler(fh)
    return logger
