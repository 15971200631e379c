"""Declarative data-quality expectations (Deequ / dbt-tests shape).

A warehouse load isn't done when the rows land — it's done when the
contract holds: keys non-null and unique, measures in range, foreign keys
resolvable. This module evaluates a list of declared expectations and
returns ONE summary DataFrame (check_name, n_violations, n_checked) suitable
for gating a publish step (write-audit-publish) or feeding a quality mart.

Scale shape — the point of the design:
- All ROW-LEVEL checks (not_null, range, regex, custom predicate) fold
  into a SINGLE aggregate pass over the table: one conditional-sum per
  check, zero shuffles beyond the one partial+final agg. Adding a check
  adds a column, not a scan.
- ``unique`` needs a groupBy on the key (one shuffle, count>1 groups).
- ``foreign_key`` is a left-anti join against the parent key set —
  broadcast when the parent side is dimension-sized.
Each non-scan check is its own bounded job; the summary unions the tiny
(one-row-per-check) results.

No exceptions are thrown here: gating policy (fail the load, quarantine,
alert) belongs to the caller — the operator just measures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expect:
    """One expectation. kind: not_null | range | regex | predicate |
    unique | foreign_key."""

    name: str
    kind: str
    cols: list[str] = field(default_factory=list)
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    predicate: Column | None = None
    parent: DataFrame | None = None
    parent_cols: list[str] | None = None


def _row_violation(e: Expect) -> Column:
    if e.kind == "not_null":
        cond = None
        for c in e.cols:
            n = F.col(c).isNull()
            cond = n if cond is None else (cond | n)
        return cond
    if e.kind == "range":
        c = F.col(e.cols[0])
        return ~c.between(F.lit(e.lo), F.lit(e.hi)) | c.isNull()
    if e.kind == "regex":
        return ~F.col(e.cols[0]).rlike(e.pattern) | F.col(e.cols[0]).isNull()
    if e.kind == "predicate":
        return ~e.predicate
    raise ValueError(f"not a row-level check: {e.kind}")


_KINDS = ("not_null", "range", "regex", "predicate", "unique", "foreign_key")


def run_expectations(df: DataFrame, checks: list[Expect]) -> DataFrame:
    """Evaluate all checks; returns (check_name, n_violations, n_checked).

    Unknown kinds raise immediately: a typo'd check silently missing from
    the summary would let a gate publish unvalidated data."""
    if not checks:
        raise ValueError("run_expectations: empty check list")
    for c in checks:
        if c.kind not in _KINDS:
            raise ValueError(
                f"run_expectations: unknown kind {c.kind!r} for check "
                f"{c.name!r} (valid: {', '.join(_KINDS)})"
            )
    row_level = [c for c in checks if c.kind in ("not_null", "range", "regex", "predicate")]
    results: list[DataFrame] = []

    if row_level:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            # coalesce: SUM over zero rows is NULL; an empty partition has
            # zero violations, not unknown violations.
            F.coalesce(F.sum(_row_violation(e).cast("long")), F.lit(0)).alias(
                f"__v_{i}"
            )
            for i, e in enumerate(row_level)
        ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{e.name}', __v_{i}" for i, e in enumerate(row_level)
        )
        results.append(
            wide.selectExpr(
                f"stack({len(row_level)}, {stack_args}) AS (check_name, n_violations)",
                "__n AS n_checked",
            ).select("check_name", "n_violations", "n_checked")
        )

    for e in checks:
        if e.kind == "unique":
            dup = (
                df.groupBy(*e.cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                    ).alias("n_violations"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
                )
                .select(F.lit(e.name).alias("check_name"), "n_violations", "n_checked")
            )
            results.append(dup)
        elif e.kind == "foreign_key":
            parent_keys = e.parent.select(
                *[
                    F.col(pc).alias(cc)
                    for pc, cc in zip(e.parent_cols, e.cols)
                ]
            ).distinct()
            orphans = df.join(F.broadcast(parent_keys), e.cols, "left_anti")
            results.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations")).crossJoin(
                    df.agg(F.count(F.lit(1)).alias("n_checked"))
                ).select(F.lit(e.name).alias("check_name"), "n_violations", "n_checked")
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
