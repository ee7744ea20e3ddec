"""Slowly-changing-dimension maintenance (SCD Type 2).

The serving-side complement to the ingest operators: reference data
(customers, parts, configs) changes slowly, and analytical queries need
AS-OF correctness ("which segment was this customer in when the order
shipped") — which requires keeping validity-ranged history rows, not
overwriting.  ``scd2_merge`` is the standard merge: close the open row
when attributes change, insert the new version, keep everything else.

Scale shape: ONE co-partitioned join on the dimension key (both sides
shuffle on the same key), pure Column expressions for the change test —
no windows over the full dimension, no driver-side diffing.  At 100 TB
the dimension is small next to facts but can still be billions of rows;
this plan is the same MERGE shape Delta/Iceberg execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_META = ("valid_from", "valid_to", "is_current")


def scd2_init(
    snapshot: DataFrame, effective_ts, key_col: str = "key"
) -> DataFrame:
    """Bootstrap a type-2 dimension from a first snapshot: every row
    becomes an open version effective at ``effective_ts`` (a literal or
    Column)."""
    ts = effective_ts if isinstance(effective_ts, F.Column) else F.lit(effective_ts)
    return snapshot.select(
        "*",
        ts.cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Merge an update batch into a type-2 dimension.

    ``dim``: (key, attrs…, valid_from, valid_to, is_current) — as
    produced by ``scd2_init`` or a prior merge.  ``updates``:
    (key, attrs…, ts_col).  Per key the LATEST update in the batch wins
    (max ``ts_col``, attrs tie-broken deterministically by struct
    order); intra-batch intermediate versions are collapsed — run one
    merge per batch boundary if every transition must be kept.

    Semantics per open row / update pair (null-safe attribute compare):

    - update with CHANGED attrs → the open row closes
      (``valid_to = update ts``) and a new open version is inserted;
    - update with identical attrs → no-op (idempotent re-deliveries);
    - update whose ts does NOT EXCEED the open row's ``valid_from`` →
      no-op (out-of-order/late batch: applying it would close the open
      row with ``valid_to < valid_from`` and insert a backwards
      version, silently corrupting history — stale updates are dropped);
    - key with no update / historical (closed) rows → pass through;
    - brand-new key → inserted as an open version.
    """
    for c in _META:
        if c not in dim.columns:
            raise ValueError(f"dim is not an SCD2 table (missing {c!r})")
    # latest update per key: max_by over the event time, deterministic
    # tie-break via the full attrs struct riding the max
    latest = (
        updates.groupBy(key_col)
        .agg(
            F.max(
                F.struct(F.col(ts_col).alias("_ts"), *[F.col(c) for c in attr_cols])
            ).alias("_u")
        )
        .select(
            key_col,
            F.col("_u._ts").alias("_new_ts"),
            *[F.col(f"_u.{c}").alias(f"_new_{c}") for c in attr_cols],
        )
    )
    closed = dim.filter(~F.col("is_current"))
    open_rows = dim.filter(F.col("is_current"))
    j = open_rows.join(latest, key_col, "full_outer")
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_new_{c}"))
    has_open = F.col("valid_from").isNotNull()
    has_update = F.col("_new_ts").isNotNull()
    # a real transition needs the update to be strictly AFTER the open
    # row took effect; anything else is a late replay of history
    applies = has_update & (~has_open | (F.col("_new_ts") > F.col("valid_from")))

    # surviving open rows: untouched keys, updates that changed nothing
    # (idempotent), or stale out-of-order updates (dropped)
    keep_open = j.filter(has_open & (~applies | ~changed)).select(*dim.columns)
    # closed by this merge
    close_now = (
        j.filter(has_open & applies & changed)
        .select(
            *[c for c in dim.columns if c not in ("valid_to", "is_current")],
            F.col("_new_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        .select(*dim.columns)
    )
    # inserted versions: changed keys + brand-new keys
    attr_exprs = [F.col(f"_new_{c}").alias(c) for c in attr_cols]
    non_attr = [
        c for c in dim.columns if c not in attr_cols and c not in _META and c != key_col
    ]
    if non_attr:
        raise ValueError(
            f"dim carries non-attribute payload columns {non_attr}; include them "
            "in attr_cols so inserted versions are fully populated"
        )
    inserted = (
        j.filter(applies & (~has_open | changed))
        .select(
            F.col(key_col),
            *attr_exprs,
            F.col("_new_ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*dim.columns)
    )
    return closed.unionByName(keep_open).unionByName(close_now).unionByName(inserted)


def asof_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
) -> DataFrame:
    """Join each fact row to the dimension version valid AT its
    timestamp: ``valid_from ≤ ts < coalesce(valid_to, ∞)``.  Equi-join
    on the key (co-partitioned both sides) with the validity range as
    the join residual — versions per key are few, so the residual
    evaluates during the hash probe, never a nested loop over the
    dimension."""
    cond = (
        (facts[key_col] == dim[key_col])
        & (facts[fact_ts_col] >= dim["valid_from"])
        & (
            dim["valid_to"].isNull()
            | (facts[fact_ts_col] < dim["valid_to"])
        )
    )
    return facts.join(dim, cond, "left").drop(dim[key_col])
