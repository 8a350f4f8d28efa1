"""Padded image batches.

Replaces detectron2's ImageList / the reference's FakeImageList
(modified_class.py:10-24): a fixed-shape NHWC tensor plus per-image true
(h, w) sizes. The batch tensor is always padded to a static bucket size so
XLA compiles one program per bucket.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class ImageList:
    def __init__(self, tensor: jnp.ndarray, image_sizes: Sequence[Tuple[int, int]]):
        """tensor: (N, H, W, C) padded batch; image_sizes: true (h, w) per image."""
        self.tensor = tensor
        self.image_sizes = [tuple(s) for s in image_sizes]

    def __len__(self) -> int:
        return len(self.image_sizes)

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    @staticmethod
    def from_tensors(
        tensors: Sequence[np.ndarray],
        size_divisibility: int = 32,
        pad_to: Tuple[int, int] | None = None,
    ) -> "ImageList":
        """Zero-pad HWC images bottom/right into one NHWC batch
        (reference pads bottom/right: deploy_utils.py:85-90)."""
        sizes = [(t.shape[0], t.shape[1]) for t in tensors]
        if pad_to is None:
            max_h = max(s[0] for s in sizes)
            max_w = max(s[1] for s in sizes)
            d = size_divisibility
            max_h = int(np.ceil(max_h / d) * d)
            max_w = int(np.ceil(max_w / d) * d)
        else:
            max_h, max_w = pad_to
        batch = np.zeros(
            (len(tensors), max_h, max_w, tensors[0].shape[-1]), dtype=np.float32
        )
        for i, t in enumerate(tensors):
            batch[i, : t.shape[0], : t.shape[1]] = t
        return ImageList(jnp.asarray(batch), sizes)
