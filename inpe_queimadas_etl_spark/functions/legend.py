"""Choropleth legend breaks — exact nearest-rank quantiles.

Behavior parity with the reference's compute_breaks
(api/app/main.py:218-314): quantile method over positive values with a
separate zero class, strictly-increasing validation, equal-interval
fallback, fixed palette. The reference runs this on <= 5,570 collected
values (one per municipality/UF), so the engine does the same: the
aggregate DataFrame is collapsed to a value list driver-side and the
exact algorithm runs in Python — approximate percentiles would change
the legend (SURVEY.md §7.7).
"""

from __future__ import annotations

ZERO_COLOR = "#1a1b2f"
QUANTILE_COLORS = ["#ffd166", "#fca311", "#f77f00", "#d62828", "#5a189a"]


def _nearest_rank(sorted_values: list, q: float) -> float:
    """Nearest-rank quantile with Python banker's rounding on the
    index, as the reference does (main.py:218-224)."""
    if not sorted_values:
        return 0.0
    n = len(sorted_values)
    idx = int(round((n - 1) * q))
    idx = max(0, min(n - 1, idx))
    return float(sorted_values[idx])


def _strictly_increasing(values: list) -> bool:
    if len(values) < 2:
        return False
    return all(values[i] > values[i - 1] for i in range(1, len(values)))


def _equal_breaks(min_v: float, max_v: float, classes: int) -> list[float]:
    if classes < 1:
        classes = 1
    if max_v <= min_v:
        return [min_v, min_v + 1.0]
    step = (max_v - min_v) / float(classes)
    return [min_v + step * i for i in range(classes + 1)]


def _palette(classes: int, zero_class: bool) -> list[str]:
    classes = max(1, int(classes))
    colors = QUANTILE_COLORS[:classes]
    if len(colors) < classes:
        colors += [QUANTILE_COLORS[-1]] * (classes - len(colors))
    return ([ZERO_COLOR] + colors) if zero_class else colors


def compute_breaks(
    values: list[int],
    method: str = "quantile",
    k: int = 5,
    zero_class: bool = True,
) -> dict:
    """Exact quantile legend breaks (reference main.py:255-314)."""
    if method != "quantile":
        raise ValueError(f"unsupported breaks method: {method}")
    classes = max(1, int(k))
    if not values:
        breaks = [0.0, 1.0]
        return {
            "breaks": breaks,
            "domain": [0.0, 0.0],
            "method": "equal",
            "unit": "focos",
            "zero_class": bool(zero_class),
            "palette": _palette(len(breaks) - 1, bool(zero_class)),
        }

    safe = [int(v) for v in values]
    has_nonpositive = any(v <= 0 for v in safe)
    positives = sorted(v for v in safe if v > 0)
    use_zero_class = bool(zero_class and has_nonpositive and positives)
    method_out = "quantile"

    sample = positives if (use_zero_class and positives) else sorted(safe)
    unique = sorted(set(sample))
    if len(unique) <= 1:
        only = float(unique[0]) if unique else 0.0
        breaks = [only, only + 1.0]
        method_out = "equal"
    else:
        q_breaks = [_nearest_rank(sample, i / classes) for i in range(classes + 1)]
        if _strictly_increasing(q_breaks):
            breaks = q_breaks
        else:
            eq_classes = min(classes, max(2, len(unique) - 1))
            breaks = _equal_breaks(float(unique[0]), float(unique[-1]), eq_classes)
            method_out = "equal"

    if not _strictly_increasing(breaks):
        breaks = _equal_breaks(float(min(sample)), float(max(sample)), 1)
        method_out = "equal"

    return {
        "breaks": breaks,
        "domain": [float(min(safe)), float(max(safe))],
        "method": method_out,
        "unit": "focos",
        "zero_class": use_zero_class,
        "palette": _palette(max(1, len(breaks) - 1), use_zero_class),
    }
