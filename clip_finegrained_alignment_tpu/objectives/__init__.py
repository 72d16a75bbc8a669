from .losses import (clip_count_loss, clip_loss, count_loss,
                     grouped_count_loss, l2_normalize,
                     masked_pairwise_contrastive_loss,
                     pairwise_contrastive_loss, softmax_cross_entropy,
                     sparc_alignment_weights, sparc_loss)

__all__ = [
    "clip_count_loss", "clip_loss", "count_loss", "grouped_count_loss",
    "l2_normalize", "masked_pairwise_contrastive_loss",
    "pairwise_contrastive_loss", "softmax_cross_entropy",
    "sparc_alignment_weights", "sparc_loss",
]
