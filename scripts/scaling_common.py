"""Shared scaling-sweep helpers for scripts/scaling_*.py."""

from __future__ import annotations

import math


def fit_exponent(
    sizes: dict[str, float], times: dict[str, float], floor: float = 1e-3
) -> float:
    """Log-log least-squares slope of time vs size over the labels of
    ``sizes`` — the measured scaling exponent all three sweep scripts
    record in SCALING.md. ``floor`` clamps sub-millisecond timings so
    a zero/noise measurement cannot produce -inf."""
    xs = [math.log(sizes[s]) for s in sizes]
    ys = [math.log(max(times[s], floor)) for s in sizes]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    return round(slope, 2)
