"""Placeholder — filled in by the device pipeline commit."""
from __future__ import annotations
import dataclasses
import numpy as np


@dataclasses.dataclass(frozen=True)
class BwtResult:
    bwt6: np.ndarray
    sharp_pos: np.ndarray
    dollar_pos: int


def build_bwt(*a, **k):
    raise NotImplementedError
