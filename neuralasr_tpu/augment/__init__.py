"""On-device data augmentation (SpecAugment; config 3+)."""

from .specaugment import specaugment

__all__ = ["specaugment"]
