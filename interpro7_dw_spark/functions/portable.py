"""Engine-portable rounding of integer ratios.

``F.round(a / b, d)`` on an integer ratio is NOT portable between
engines: Spark rounds the double's SHORTEST DECIMAL REPR half-up
(BigDecimal.valueOf), DuckDB rounds the BINARY value — they disagree
exactly when a/b terminates at d+1 decimals with a trailing 5 and is
not binary-representable (e.g. 10473/80/1000 = 0.1309125 → Spark
0.130913, DuckDB 0.130912 — found by the round-9 sf0.1 full sweep on
z_quality_classifier; 1/160 → 0.00625 is the round-4 analogue).

:func:`round_div` computes round-half-up EXACTLY in integers:
``round(a/b, d) = floor((a/b)*10^d + 1/2) = (2*10^d*a + b) FLOORDIV
(2b)`` for b > 0 and ANY-SIGN a — "half up" meaning half toward
+infinity (-0.0055 at 3 digits → -0.005), the same convention on both
engines. No float touches the decision, so any engine replays it.
:func:`round_div_sql` is the DuckDB twin; DuckDB's ``//`` truncates
toward ZERO on negatives (``-7 // 2 = -3``) while Spark's
pmod-subtract quotient floors, so the SQL side materializes the same
pmod-subtract form — the dividend is made exactly divisible first,
where truncation and floor agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_div(numer: Column, denom: Column, digits: int) -> Column:
    """Round-half-up (half toward +inf) of ``numer/denom`` to
    ``digits`` decimals as an exact integer computation, returned as
    double. Preconditions: ``denom > 0``, both integral, and
    ``|2*10^digits*numer| < 2^53`` (holds for every count ratio in
    this engine); ``numer`` may be negative. The quotient is extracted
    with the ``(q - pmod(q, d))/d`` identity — pmod is non-negative,
    so the subtraction lands on the FLOOR multiple for either sign and
    the division is exact in double."""
    p = 10 ** digits
    n_l = numer.cast("long")   # int inputs would overflow at 2*10^d*n
    d_l = denom.cast("long")
    q = F.lit(2 * p).cast("long") * n_l + d_l
    d = F.lit(2).cast("long") * d_l
    quot = (q - F.pmod(q, d)) / d
    return quot.cast("long") / F.lit(float(p))


def round_div_sql(numer: str, denom: str, digits: int) -> str:
    """DuckDB fragment replaying :func:`round_div` verbatim, including
    for negative numerators: DuckDB ``%`` follows the dividend's sign
    and ``//`` truncates toward zero, so the non-negative remainder is
    rebuilt as ``((q % d) + d) % d`` and subtracted before the
    division — exactly divisible, where trunc == floor."""
    p = 10 ** digits
    q = f"(2 * {p} * ({numer}) + ({denom}))"
    d = f"(2 * ({denom}))"
    return f"((({q}) - ((({q}) % ({d})) + ({d})) % ({d})) // ({d})) / {p}.0"
