"""Stdlib-logging wrapper (reference: thre3d_atom/utils/logging.py:1-4)."""
import logging
import sys

logging.basicConfig(
    stream=sys.stdout,
    level=logging.INFO,
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)
log = logging.getLogger("voxe_tpu")
