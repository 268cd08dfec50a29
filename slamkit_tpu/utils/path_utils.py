"""`//reference` path macro (reference slamkit/utils/path_utils.py:3-8)."""
from __future__ import annotations

import os
from typing import Optional


def resolve_reference_path(path: str, reference_path: Optional[str] = None) -> str:
    if path.startswith("//reference"):
        root = reference_path or os.environ.get("SLAM_REFERENCE_PATH")
        if root is None:
            raise ValueError(
                "Path starts with //reference but no reference_path given and "
                "$SLAM_REFERENCE_PATH is not set")
        return path.replace("//reference", root, 1)
    return path
