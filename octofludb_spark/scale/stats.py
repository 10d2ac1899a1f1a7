"""Closed-form distributed statistics for corpus curation.

A 100-TB curation pipeline constantly fits tiny models over huge
tables — "how does token count scale with byte length per language?",
"is quality correlated with document age?".  The right distributed
shape is the classical one: sufficient statistics are SUMS, so the
whole fit is ONE map-side-combinable aggregation and a closed-form
driver-free projection — never an iterative solver, never a collect
of the data.

Cross-engine determinism discipline (matches simsearch.py's
fixed-point convention): every sufficient statistic is an exact
BIGINT sum over integer-valued columns, so partial aggregation order
can never change a bit; the only floating-point operations are the
final closed-form divisions, computed from identical integer operands
in any engine.  At 10^12-row scale the BIGINT sums of fourth-order-
free statistics here stay in range for x,y < ~3e3 (Sxy <= n*x*y);
beyond that the same plan runs with DECIMAL(38) sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_linear_fit(df: DataFrame, x_col: str, y_col: str,
                     key: str) -> DataFrame:
    """Per-group simple linear regression y ~ a + b*x by the
    closed-form normal equations over exact integer sufficient
    statistics.

    Output: (grp, n, slope, intercept, r2) with
      slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
      intercept = (Sy - slope*Sx) / n
      r2        = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    all rounded to 6 dp; groups with a degenerate x (zero variance)
    emit NULL slope/intercept/r2 rather than a division blow-up.

    Scale shape: ONE aggregation with map-side partials (five BIGINT
    sums + a count per group); the closed form is a projection over
    |groups| rows.  No joins, no second pass, no driver math.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(F.col(key).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    # integer numerators/denominators first: bit-identical on any
    # engine; float enters only in the final division.
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n.cast("double") / var_x.cast("double")
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) \
        / F.col("n").cast("double")
    # cast to double BEFORE squaring: cov_n^2 can exceed BIGINT long
    # before the statistics themselves do (and an ANSI overflow here
    # would fail loudly rather than silently — but why fail at all).
    r2 = (cov_n.cast("double") * cov_n.cast("double")) \
        / (var_x.cast("double") * var_y.cast("double"))
    guard = var_x > 0
    guard_y = (var_x > 0) & (var_y > 0)
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.round(F.when(guard, slope), 6).alias("slope"),
        F.round(F.when(guard, intercept), 6).alias("intercept"),
        F.round(F.when(guard_y, r2), 6).alias("r2"),
    )


def group_moments(df: DataFrame, x_col: str, key: str) -> DataFrame:
    """Per-group mean / variance / skewness over an integer column via
    exact raw power sums (the one-pass, merge-anywhere shape sketch
    servers use).

    Output: (grp, n, mean, variance, skewness), 6 dp.  variance is the
    population variance n*Sxx - Sx^2 over n^2; skewness the
    standardized third central moment computed from raw S1,S2,S3 —
    every numerator integer-exact before the final float step.
    """
    x = F.col(x_col).cast("long")
    agg = df.groupBy(F.col(key).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
    )
    n = F.col("n")
    # central moments from raw sums, integer numerators:
    #   m2_num = n*S2 - S1^2                       (over n^2)
    #   m3_num = n^2*S3 - 3n*S1*S2 + 2*S1^3        (over n^3)
    m2_num = n * F.col("s2") - F.col("s1") * F.col("s1")
    m3_num = (n * n * F.col("s3")
              - F.lit(3) * n * F.col("s1") * F.col("s2")
              + F.lit(2) * F.col("s1") * F.col("s1") * F.col("s1"))
    mean = F.col("s1").cast("double") / n.cast("double")
    variance = m2_num.cast("double") / (n * n).cast("double")
    skew = (m3_num.cast("double") / (n * n * n).cast("double")) \
        / F.pow(variance, F.lit(1.5))
    return agg.select(
        "grp",
        n.cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(variance, 6).alias("variance"),
        F.round(F.when(m2_num > 0, skew), 6).alias("skewness"),
    )
