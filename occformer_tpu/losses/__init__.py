from .seg_losses import (
    dice_loss,
    binary_cross_entropy_with_logits,
    softmax_cross_entropy,
)
from .matching import hungarian_match, mask_matching_cost
from .point_sampling import (
    gumbel_topk_sample,
    sample_with_frequencies,
    uncertainty_sample_coords,
)

__all__ = [
    "dice_loss",
    "binary_cross_entropy_with_logits",
    "softmax_cross_entropy",
    "hungarian_match",
    "mask_matching_cost",
    "gumbel_topk_sample",
    "sample_with_frequencies",
    "uncertainty_sample_coords",
]
