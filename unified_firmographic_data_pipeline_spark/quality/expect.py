"""``expect(df)`` — the dbt-test analogue as chainable DataFrame assertions.

Reference test taxonomy (SURVEY.md §5): ``not_null``, ``unique``,
``relationships`` (FK), ``accepted_values``, ``accepted_range``
(dbt_utils), plus singular violation-SELECT tests. Semantics preserved: each
check is a SELECT of violating rows; pass = 0 violations; ``run()`` raises
(gating downstream models, like dbt test gates the DAG — ``DAG:201``).

Every check counts violations in a single aggregate job; ``run()`` batches
them so N checks cost one pass per underlying frame, not N actions, which is
what makes the suite usable on 100 TB tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class QualityError(AssertionError):
    """One or more expectations failed; message lists each violation."""


@dataclass
class _Check:
    name: str
    # violation count expression evaluated over the base frame, OR a
    # standalone counting thunk for checks needing their own plan (unique/fk)
    agg: Column | None = None
    thunk: object | None = None
    # lazy builder returning a 1-row DataFrame with BIGINT column `n` —
    # the plan-native twin of `thunk`, used by report()
    frame: object | None = None


@dataclass
class Expectation:
    df: DataFrame
    checks: list[_Check] = field(default_factory=list)

    # -- generic tests ------------------------------------------------------
    def not_null(self, cols: Sequence[str]) -> "Expectation":
        for c in cols:
            self.checks.append(
                _Check(f"not_null({c})", agg=F.count(F.when(F.col(c).isNull(), 1)))
            )
        return self

    def unique(self, cols: Sequence[str]) -> "Expectation":
        """dbt ``unique``: GROUP BY col HAVING count(*) > 1 (SURVEY §2.H H2)."""
        for c in cols:
            df = self.df

            def _count(df=df, c=c) -> int:
                return (
                    df.groupBy(c).count().filter(F.col("count") > 1).limit(1).count()
                )

            def _frame(df=df, c=c) -> DataFrame:
                return (
                    df.groupBy(c)
                    .count()
                    .filter(F.col("count") > 1)
                    .agg(F.count("*").cast("long").alias("n"))
                )

            self.checks.append(_Check(f"unique({c})", thunk=_count, frame=_frame))
        return self

    def fk(self, key: str, dim: DataFrame, dim_key: str | None = None) -> "Expectation":
        """dbt ``relationships``: every fact key exists in the dimension
        (left-anti join count — SURVEY §2.C C2)."""
        dim_key = dim_key or key
        df = self.df

        def _count(df=df, key=key, dim=dim, dim_key=dim_key) -> int:
            return (
                df.select(F.col(key)).where(F.col(key).isNotNull())
                .join(dim.select(F.col(dim_key).alias(key)), key, "left_anti")
                .limit(1)
                .count()
            )

        def _frame(df=df, key=key, dim=dim, dim_key=dim_key) -> DataFrame:
            return (
                df.select(F.col(key)).where(F.col(key).isNotNull())
                .join(dim.select(F.col(dim_key).alias(key)), key, "left_anti")
                .agg(F.count("*").cast("long").alias("n"))
            )

        self.checks.append(_Check(f"fk({key})", thunk=_count, frame=_frame))
        return self

    def accepted(self, col: str, values: Sequence) -> "Expectation":
        cond = F.col(col).isNotNull() & ~F.col(col).isin(list(values))
        self.checks.append(_Check(f"accepted({col})", agg=F.count(F.when(cond, 1))))
        return self

    def in_range(self, col: str, lo=None, hi=None) -> "Expectation":
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < lo)
        if hi is not None:
            cond = cond | (F.col(col) > hi)
        self.checks.append(_Check(f"in_range({col})", agg=F.count(F.when(cond, 1))))
        return self

    def custom(self, name: str, violation: Column) -> "Expectation":
        """Singular test: rows where ``violation`` holds are failures
        (e.g. ``profits_m > revenues_m`` —
        ``tests/test_fortune_profit_not_exceed_revenue.sql``)."""
        self.checks.append(_Check(name, agg=F.count(F.when(violation, 1))))
        return self

    # -- execution ----------------------------------------------------------
    def collect_failures(self) -> dict[str, int]:
        failures: dict[str, int] = {}
        agg_checks = [c for c in self.checks if c.agg is not None]
        if agg_checks:
            row = self.df.agg(
                *[c.agg.alias(f"c{i}") for i, c in enumerate(agg_checks)]
            ).first()
            for i, c in enumerate(agg_checks):
                n = row[f"c{i}"]
                if n:
                    failures[c.name] = n
        for c in self.checks:
            if c.thunk is not None:
                n = c.thunk()
                if n:
                    failures[c.name] = n
        return failures

    def run(self) -> None:
        failures = self.collect_failures()
        if failures:
            msg = "; ".join(f"{k}: {v} violation(s)" for k, v in failures.items())
            raise QualityError(msg)

    def passes(self) -> bool:
        return not self.collect_failures()

    def report(self, table: str) -> DataFrame:
        """The dbt-`test`-run artifact as ONE lazy DataFrame: (table,
        test, n_violations, passed) with a row per registered check.
        All expression checks fold into a single aggregate pass over the
        base frame (then melt via stack); unique/fk contribute their own
        1-row count plans — so N checks still cost one job per
        underlying plan when the union executes, the same batching
        contract as run()."""
        frames: list[DataFrame] = []
        agg_checks = [c for c in self.checks if c.agg is not None]
        if agg_checks:
            one = self.df.agg(
                *[c.agg.cast("long").alias(f"c{i}") for i, c in enumerate(agg_checks)]
            )
            pairs = ", ".join(
                "'" + c.name.replace("'", "") + f"', c{i}"
                for i, c in enumerate(agg_checks)
            )
            frames.append(
                one.select(
                    F.expr(
                        f"stack({len(agg_checks)}, {pairs}) AS (test, n_violations)"
                    )
                )
            )
        for c in self.checks:
            if c.frame is not None:
                frames.append(
                    c.frame().select(
                        F.lit(c.name).alias("test"),
                        F.col("n").alias("n_violations"),
                    )
                )
        if not frames:
            # no registered checks (or none with an agg/frame): an empty
            # report with the contract schema, not an IndexError
            return self.df.sparkSession.createDataFrame(
                [], "table string, test string, n_violations long, passed boolean"
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.select(
            F.lit(table).alias("table"),
            "test",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )


def expect(df: DataFrame) -> Expectation:
    return Expectation(df)
