"""Small helpers (capability match for mogen/utils/misc.py and
mogen/utils/path_utils.py)."""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence


def str2bool(v) -> bool:
    """argparse-friendly bool parser (reference mogen/utils/misc.py)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"not a boolean: {v!r}")


def multi_apply(func, *args, **kwargs):
    """Apply ``func`` over zipped args, returning tuple-of-lists
    (reference mogen/utils/misc.py)."""
    pfunc = partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))


def mkdir_or_exist(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def check_files_exist(paths: Sequence[str]):
    missing = [p for p in paths if not os.path.isfile(p)]
    if missing:
        raise FileNotFoundError(f"missing files: {missing}")
