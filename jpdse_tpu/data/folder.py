"""Directory walking for image datasets (ctu/data/image_folder.py:11-95)."""

from __future__ import annotations

import os
from typing import List

IMG_EXTENSIONS = (
    ".jpg", ".JPG", ".jpeg", ".JPEG",
    ".png", ".PNG", ".ppm", ".PPM", ".bmp", ".BMP", ".tiff", ".webp",
)


def is_image_file(filename: str) -> bool:
    return filename.endswith(IMG_EXTENSIONS)


def make_dataset(directory: str, recursive: bool = True) -> List[str]:
    """Collect image paths under a directory. The reference's recursive and
    flat branches both walk the whole tree (image_folder.py:32-61), so there
    is a single implementation here."""
    if not (os.path.isdir(directory) or os.path.islink(directory)):
        raise ValueError(f"{directory} is not a valid directory")
    images = []
    for root, _, fnames in sorted(os.walk(directory, followlinks=True)):
        for fname in fnames:
            if is_image_file(fname):
                images.append(os.path.join(root, fname))
    return images
