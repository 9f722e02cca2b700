"""Small host-side helpers (ctu/utils/misc.py + preprocessing.py analogs)."""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np


def atoi(text: str):
    return int(text) if text.isdigit() else text


def natural_keys(text: str):
    """Human-order sort key (misc.py:157-164)."""
    return [atoi(c) for c in re.split(r"(\d+)", text)]


def natural_sort(items: List[str]) -> List[str]:
    items.sort(key=natural_keys)
    return items


def mkdirs(path: str):
    os.makedirs(path, exist_ok=True)


def tensor2im(arr: np.ndarray, mean, std) -> np.ndarray:
    """Normalized HWC/NHWC float -> uint8 (host-side tensor2im,
    misc.py:64-95)."""
    arr = np.asarray(arr, np.float32)
    x = (arr * np.asarray(std, np.float32) + np.asarray(mean, np.float32)) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def count_params(tree) -> int:
    """Total parameter count of a PyTree (network_utils.py:4-10 analog)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
