"""Engine-version-proof 6-decimal rounding, shared by every query that
exposes a rounded double in its hash surface.

Two conventions, per the determinism notes in ``queries/registry.py``:

- **Exact inputs** (DECIMAL sums, integer counts): round in integer
  micro-units — ``(x_micro + d div 2) div d`` — so the half-way rule is
  applied to the true rational, not a double approximation
  (``queries/text_analysis.py`` bigram-LM convention).
- **Double-computed expressions** (BM25 terms, cosines, logs): use the
  floor form here — ``floor(x*1e6 + 0.5)/1e6``. Every op (multiply,
  add, floor, divide) is IEEE-754-defined and correctly rounded, so
  for the same input double both engines produce the same output
  bit-for-bit — unlike ``ROUND(double, 6)``, whose half-way handling
  is an engine implementation detail (the class behind the bigram-LM
  sf0.1 divergence and the r06 sketch-battery hash exposure; the
  incremental-rollup mean diverged the same way at sf1). Valid for
  either sign at magnitudes < ~2^45 (negative inputs round half-way
  toward +inf — identically on both engines, which is all parity
  needs).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def round6_det(x):
    """Spark side: floor(x*1e6 + 0.5)/1e6 — see module docstring."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def round6_det_sql(expr: str) -> str:
    """DuckDB mirror of :func:`round6_det` (same IEEE op sequence)."""
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000.0"


def micro_sql(num: str, den: str) -> str:
    """Round-half-up ratio of EXACT integers in micro-units, DuckDB
    form: ``(num*1e6 + den//2) // den`` — all-integer arithmetic, so
    no engine rounding rule is involved at all (the convention for
    count/sum-derived ratios; doubles use round6_det instead).

    PRECONDITION: ``num >= 0`` and ``den > 0``. The Spark mirror's
    ``div`` truncates toward zero while DuckDB's ``//`` floors, so the
    two forms diverge for negative numerators — and the ``+ den//2``
    half-up adjustment itself assumes a non-negative quotient. Every
    current call site feeds counts/sums of counts; a signed ratio
    needs a floor-normalized variant on the Spark side first."""
    return f"(({num}) * 1000000 + ({den}) // 2) // ({den})"


def micro_spark(num: str, den: str) -> str:
    """Spark SQL mirror of :func:`micro_sql` (`div` is integer
    division on longs). Same PRECONDITION: ``num >= 0``, ``den > 0``
    — ``div`` truncates toward zero where DuckDB's ``//`` floors, so
    the mirrors silently diverge on negative numerators."""
    return f"(({num}) * 1000000L + ({den}) div 2) div ({den})"
