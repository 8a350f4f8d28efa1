from .head import FCOSHead, Tower
from .outputs import (
    DecodedProposals,
    compute_locations,
    compute_locations_per_level,
    decode_batch,
    decode_single_image,
)
from .losses import (
    INF,
    assign_targets_single_image,
    compute_ctrness_targets,
    fcos_losses,
    level_metadata,
)

__all__ = [
    "FCOSHead",
    "Tower",
    "DecodedProposals",
    "compute_locations",
    "compute_locations_per_level",
    "decode_batch",
    "decode_single_image",
    "INF",
    "assign_targets_single_image",
    "compute_ctrness_targets",
    "fcos_losses",
    "level_metadata",
]
