"""Report-stage statistics (SURVEY §2.6 A13).

Wald / Wilson confidence intervals for a proportion and the
two-proportion z-test, as in the reference's result scripts
(OmniDocBench/scripts/ci_wald.py:20-42, scripts/p_test_calc.py:1-10).
Driver-side math on aggregated scalars — no Spark types involved.
"""

from __future__ import annotations

import math

Z95 = 1.959963984540054  # two-sided 95%


def wald_ci(p: float, n: int, z: float = Z95) -> tuple[float, float]:
    """Wald interval: p +- z*sqrt(p(1-p)/n) (ci_wald.py:20-27)."""
    if n <= 0:
        return (0.0, 0.0)
    half = z * math.sqrt(p * (1 - p) / n)
    return (max(0.0, p - half), min(1.0, p + half))


def wilson_ci(p: float, n: int, z: float = Z95) -> tuple[float, float]:
    """Wilson score interval (ci_wald.py:29-42)."""
    if n <= 0:
        return (0.0, 0.0)
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (max(0.0, center - half), min(1.0, center + half))


def _norm_cdf(x: float) -> float:
    return 0.5 * (1 + math.erf(x / math.sqrt(2)))


def two_proportion_z(p1: float, n1: int, p2: float, n2: int) -> tuple[float, float]:
    """(z, two-sided p-value) for H0: p1 == p2 (p_test_calc.py:1-10).

    Pooled-variance form; the reference reports z=-1.025/p=0.305 for
    DeepSeek 84.24% vs olmOCR-2 81.56% at n=1355 each — regression
    target in tests."""
    if n1 <= 0 or n2 <= 0:
        return (0.0, 1.0)
    pooled = (p1 * n1 + p2 * n2) / (n1 + n2)
    se = math.sqrt(pooled * (1 - pooled) * (1 / n1 + 1 / n2))
    if se == 0:
        return (0.0, 1.0)
    z = (p2 - p1) / se
    return (z, 2 * (1 - _norm_cdf(abs(z))))
