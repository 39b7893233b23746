"""Logging configuration.

The reference instantiates per-module loggers but never configures them,
so they are effectively silent (SURVEY §5). Here ``configure()`` wires a
sane default handler; the pipeline CLI calls it on startup.
"""

from __future__ import annotations

import logging
import sys


def configure(level: int = logging.INFO, stream=None) -> None:
    root = logging.getLogger("fava_tpu")
    if root.handlers:
        return
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(
        logging.Formatter("[%(asctime)s] %(levelname)s %(name)s: %(message)s", "%H:%M:%S")
    )
    root.addHandler(handler)
    root.setLevel(level)
