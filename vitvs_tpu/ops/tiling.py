"""Shared Pallas-kernel tiling helpers."""


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m that is >= x (pad-to-tile alignment)."""
    return (x + m - 1) // m * m
