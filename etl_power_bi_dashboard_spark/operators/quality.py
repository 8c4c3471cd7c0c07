"""Data-quality operators (reference notebook cell 21, SURVEY §2.9):
FK containment, null audit, aggregate reconciliation, shape report —
promoted from inline prints to reusable assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FK_COLUMNS = {
    "customer": "customer_id",
    "product": "product_id",
    "seller": "seller_id",
    "date": "date_id",
    "order": "order_id",
}


def fk_violations(fact: DataFrame, dims: dict[str, DataFrame]) -> dict[str, int]:
    """Q1: per-dimension count of fact FKs with no matching dim id
    (left-anti join on distinct keys — zero on a consistent star)."""
    out: dict[str, int] = {}
    for dim_name, fk in FK_COLUMNS.items():
        if dim_name not in dims or fk not in fact.columns:
            continue
        dim_ids = dims[dim_name].select(F.col("id"))
        orphans = (
            fact.select(F.col(fk).alias("fk"))
            .distinct()
            .join(dim_ids, F.col("fk") == F.col("id"), "left_anti")
        )
        out[dim_name] = orphans.count()
    return out


def null_audit(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """Q2: null counts per column in one aggregation pass."""
    cols = cols or df.columns
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("bigint")).alias(c) for c in cols]
    ).first()
    return {c: int(row[c] or 0) for c in cols}


def reconcile_totals(fact: DataFrame, monthly: DataFrame) -> float:
    """Q3: |Σ fact.price − Σ agg.total_sales| (should be ~0)."""
    t1 = fact.agg(F.sum("price")).first()[0] or 0.0
    t2 = monthly.agg(F.sum("total_sales")).first()[0] or 0.0
    return abs(t1 - t2)


def shape_report(tables: dict[str, DataFrame]) -> dict[str, tuple[int, int]]:
    """Q4: rows × cols per table."""
    return {name: (df.count(), len(df.columns)) for name, df in tables.items()}


def expectation_report(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Declarative expectation suite — the Great-Expectations-style
    contract check as ONE aggregation pass: each rule is a row-level SQL
    predicate; the report is (rule, n_rows, n_violations, violation_rate,
    passed) per rule.

    Scale shape: every rule compiles to a conditional SUM inside a
    single agg over one scan — N rules cost one pass, not N (the naive
    loop re-scans per rule, which at 100 TB turns a 20-rule contract
    into 20 table scans). The wide 1-row result unpivots via ``stack``
    into the report rows; the only shuffle is the single-row combine.
    NULL predicate results count as violations (SQL three-valued logic
    would otherwise silently pass NULL rows through ``NOT cond``)."""
    aggs = [
        F.sum(
            F.when(F.expr(cond), F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint").alias(f"_v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    wide = df.agg(F.count("*").alias("_n"), *aggs)
    stack_args = ", ".join(
        f"'{name.replace(chr(39), '')}', _v{i}" for i, (name, _) in enumerate(rules)
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (
            F.col("n_violations").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )
