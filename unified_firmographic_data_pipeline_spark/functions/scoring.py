"""Model scoring as pure Catalyst expressions.

Small linear models (quality classifiers, spam filters, language scorers in
the fasttext tradition) don't need an inference service or a UDF: with the
weights frozen as literals, scoring is one scalar expression fused into
whole-stage codegen — it rides the scan like any other projection and costs
nothing at 100 TB beyond reading the feature columns.

Determinism note: the linear part is fixed-order double arithmetic
(bit-identical across engines given identical features); ``exp`` is the one
transcendental, so callers that need cross-engine bit-equality should round
the sigmoid output (6 decimals is the repo convention, far above the ~1 ULP
libm-vs-JVM drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def linear_score(
    feature_weights: Sequence[tuple[Column, float]], intercept: float = 0.0
) -> Column:
    """``intercept + sum(w_i * f_i)`` with additions in the given order
    (fixed-order IEEE evaluation — reproducible everywhere)."""
    z = F.lit(float(intercept))
    for col, w in feature_weights:
        z = z + F.lit(float(w)) * col
    return z


def logistic_score(
    feature_weights: Sequence[tuple[Column, float]], intercept: float = 0.0
) -> Column:
    """Sigmoid of :func:`linear_score`: ``1 / (1 + exp(-z))``."""
    z = linear_score(feature_weights, intercept)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
