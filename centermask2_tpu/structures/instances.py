"""Static-shape instance containers.

``Instances`` replaces detectron2's dynamic Instances for on-device code:
a pytree of fixed-capacity arrays (leading dim = capacity) plus a boolean
``valid`` field. Where the reference filters (``instances[idxs]``,
nonzero+gather, see pooler.py:361-365), this framework masks.

Shape contract mirrors the reference's 6-tensor output
(deploy_utils.py:117-126): locations, mask_scores, pred_boxes,
pred_classes, pred_masks, scores.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Instances:
    """A fixed-capacity bag of per-instance fields.

    Fields are arrays whose leading dimension is the (static) capacity.
    ``valid`` is a (capacity,) bool array marking live rows. ``image_size``
    is static python metadata (h, w) — it does not flow through jit as a
    tensor unless stored as a field.
    """

    def __init__(self, image_size: Tuple[int, int], **fields: Any):
        object.__setattr__(self, "_image_size", tuple(image_size))
        object.__setattr__(self, "_fields", dict(fields))

    # -- basic access --------------------------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def __setattr__(self, name: str, value: Any) -> None:
        self._fields[name] = value

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._fields[name]
        except KeyError as e:
            raise AttributeError(f"Instances has no field '{name}'") from e

    def set(self, name: str, value: Any) -> None:
        self._fields[name] = value

    def get(self, name: str) -> Any:
        return self._fields[name]

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return dict(self._fields)

    @property
    def capacity(self) -> int:
        for v in self._fields.values():
            return v.shape[0]
        return 0

    def __len__(self) -> int:
        return self.capacity

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self._fields["valid"].astype(jnp.int32))

    # -- functional updates ---------------------------------------------------
    def replace(self, **updates: Any) -> "Instances":
        fields = dict(self._fields)
        fields.update(updates)
        return Instances(self._image_size, **fields)

    def gather(self, indices: jnp.ndarray, indices_valid: jnp.ndarray) -> "Instances":
        """Reorder/select rows by index; output capacity = len(indices).

        Replaces dynamic ``instances[idxs]``: every field is gathered with
        the same static-size index vector, and validity is AND-ed with
        ``indices_valid`` so padded slots stay dead.
        """
        fields = {}
        for k, v in self._fields.items():
            g = jnp.take(v, indices, axis=0)
            if k == "valid":
                g = g & indices_valid
            fields[k] = g
        return Instances(self._image_size, **fields)

    @staticmethod
    def cat(instance_list) -> "Instances":
        """Concatenate along capacity (all inputs: same fields, same image)."""
        first = instance_list[0]
        keys = first._fields.keys()
        fields = {
            k: jnp.concatenate([inst._fields[k] for inst in instance_list], axis=0)
            for k in keys
        }
        return Instances(first.image_size, **fields)

    # -- pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        names = sorted(self._fields.keys())
        return tuple(self._fields[n] for n in names), (self._image_size, tuple(names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, names = aux
        return cls(image_size, **dict(zip(names, children)))

    def __repr__(self) -> str:  # pragma: no cover
        fields = ", ".join(
            f"{k}={tuple(v.shape) if hasattr(v, 'shape') else v}"
            for k, v in self._fields.items()
        )
        return f"Instances(image_size={self._image_size}, {fields})"
