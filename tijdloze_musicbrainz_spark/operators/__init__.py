from .canonical import argmax_with_threshold, top1_per_group

__all__ = ["top1_per_group", "argmax_with_threshold"]
