"""Small pure-Python helpers shared across the framework.

The reference repo re-declares these per file (e.g. ``pair`` vit.py:15,
``cast_tuple`` levit.py:19, ``conv_output_size`` t2t.py:23,
``exists``/``default`` cross_vit.py:11-15); here they exist once.
"""

from __future__ import annotations

from typing import Any, Tuple, TypeVar

T = TypeVar("T")


def pair(t) -> Tuple[Any, Any]:
    """Return ``t`` as a 2-tuple, duplicating scalars."""
    return t if isinstance(t, tuple) else (t, t)


def exists(val) -> bool:
    return val is not None


def default(val, d):
    return val if val is not None else d


def cast_tuple(val, length: int = 1) -> tuple:
    """Broadcast a scalar to a tuple of ``length``; pass tuples through."""
    return val if isinstance(val, tuple) else ((val,) * length)


def conv_output_size(image_size: int, kernel_size: int, stride: int, padding: int = 0) -> int:
    return int(((image_size - kernel_size + (2 * padding)) / stride) + 1)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
