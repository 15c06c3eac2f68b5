"""ComfyUI custom-node package entry (reference __init__.py:1-19).

When this repo is cloned into ComfyUI's custom_nodes/, ComfyUI imports this
file and reads NODE_CLASS_MAPPINGS. The framework itself lives in
comfyui_keep_tpu/ (absolute imports), so the repo root goes on sys.path
first.
"""
import logging
import os
import sys

logger = logging.getLogger(__name__)
logger.setLevel(logging.INFO)
if not logger.hasHandlers():
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    logger.addHandler(_handler)

_here = os.path.dirname(os.path.abspath(__file__))
if _here not in sys.path:
    sys.path.insert(0, _here)

from comfyui_keep_tpu.nodes import (NODE_CLASS_MAPPINGS,  # noqa: E402
                                    NODE_DISPLAY_NAME_MAPPINGS)

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
