"""MERGE INTO as a batch DataFrame operator over vanilla parquet.

Spark's `MERGE INTO` SQL statement requires a table provider implementing
row-level operations (SupportsRowLevelOperations — Delta/Iceberg territory);
vanilla parquet directories cannot support it transactionally, and the
recorded decision (SCALE.md "Row-level operations / MERGE INTO") is that
this operator + the foreachBatch/CDC patterns ARE the engine's contract.
This module makes the MERGE *semantics* first-class anyway: one call site
expresses the same matched/not-matched clause set as the SQL statement,
compiled to a single full-outer-join plan Catalyst optimizes like any
other join (broadcastable small source, AQE skew handling — nothing
imperative). Writing the result back then uses the partition-level
idempotency the sinks already provide (dynamic partition overwrite).

Clause semantics follow the SQL standard's MERGE:
  WHEN MATCHED [AND cond] THEN DELETE      -> row dropped
  WHEN MATCHED [AND cond] THEN UPDATE SET  -> assignments applied
  WHEN MATCHED (neither)                   -> target row kept unchanged
  WHEN NOT MATCHED THEN INSERT             -> source-only row inserted
  target-only rows                         -> kept unchanged
Clause order: DELETE is evaluated before UPDATE (callers needing the
opposite encode it in the conditions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    matched_update: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    not_matched_insert: dict[str, Column] | None = None,
    op_column: str | None = None,
) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target relation.

    `on` columns must exist on both sides and be null-free (standard
    MERGE key discipline). `matched_update` / `not_matched_insert` map
    target column name -> expression over the joined row (source columns
    visible under their own names). `matched_delete` is a boolean
    expression over the joined row. `op_column`, when set, appends an
    audit column tagging each surviving row 'update' / 'insert' / 'keep'
    — the lineage a CDC-applied table wants for reconciliation.

    Plan shape: ONE full outer join on the merge keys; every clause is a
    projection over it (no second pass, no driver loop). At 100 TB the
    join is shuffle-on-key with AQE; a dim-sized source side broadcasts.
    """
    t_cols = target.columns
    # Presence markers survive the outer join where key columns nullify.
    tgt = target.withColumn("__t", F.lit(1))
    src = source.withColumn("__s", F.lit(1))
    joined = tgt.join(src, on=on, how="fullOuter")
    matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
    t_only = F.col("__t").isNotNull() & F.col("__s").isNull()
    s_only = F.col("__t").isNull() & F.col("__s").isNotNull()

    # SQL MERGE clause conditions treat NULL as not-satisfied: a matched
    # row whose WHEN MATCHED ... DELETE condition evaluates to NULL falls
    # through to UPDATE/keep instead of being silently dropped, so the
    # boolean is coalesced to FALSE before negations are built from it.
    delete_cond = (
        matched & F.coalesce(matched_delete, F.lit(False))
        if matched_delete is not None
        else F.lit(False)
    )
    update_cond = matched & ~delete_cond if matched_update else F.lit(False)
    insert_cond = s_only if not_matched_insert is not None else F.lit(False)
    keep_cond = (matched & ~delete_cond & ~update_cond) | t_only

    out_cols: list[Column] = []
    for c in t_cols:
        expr = F.col(c)
        if matched_update and c in matched_update:
            expr = F.when(update_cond, matched_update[c]).otherwise(expr)
        if not_matched_insert is not None:
            if c in (not_matched_insert or {}):
                expr = F.when(insert_cond, not_matched_insert[c]).otherwise(expr)
            elif c in on:
                # merge keys come from the join output (coalesced by the
                # USING-style join), already correct on insert rows
                pass
        out_cols.append(expr.alias(c))
    if op_column:
        out_cols.append(
            F.when(insert_cond, F.lit("insert"))
            .when(update_cond, F.lit("update"))
            .otherwise(F.lit("keep"))
            .alias(op_column)
        )
    return joined.where(keep_cond | update_cond | insert_cond).select(*out_cols)
