"""``python -m fava_tpu``: run the analysis pipeline in the current
directory (reads pipeline_settings.json, resumes from fava.checkpoint).
Reference entry point: fava/__main__.py:282-290."""

import logging
import sys

from fava_tpu.pipeline import main

LOGGER = logging.getLogger(__name__)

if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as exc:
        LOGGER.exception("", exc_info=exc)
        sys.exit(1)
