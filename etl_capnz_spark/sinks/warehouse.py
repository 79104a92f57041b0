"""Partitioned-warehouse sink: day-partitioned tables with dynamic
partition overwrite — the standard lakehouse write pattern when no
transactional table format is available (the batch twin of
streaming/stream.py's manifest-logged sink).

``overwrite_partitions`` re-lands ONLY the partitions present in the
incoming batch (``partitionOverwriteMode=dynamic``): yesterday's late
data replaces yesterday's partition, history is untouched, and readers
prune to the partitions they filter on (PartitionFilters in the scan).
That triple — partition-scoped rewrite, untouched history, pruned
reads — is what makes a 100 TB fact table maintainable without MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Initial land: parquet partitioned by ``partition_cols``."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic mode);
    all other partitions are preserved. Restores the session's previous
    overwrite mode afterwards."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set(key, prev)


def delete_keys(
    spark,
    path: str,
    partition_cols: list[str],
    key_col: str,
    keys: DataFrame,
) -> dict:
    """Hard-delete rows by key (GDPR/right-to-erasure) touching ONLY the
    partitions that contain matching keys.

    Steps: (1) find affected partitions via a broadcast semi-join —
    driver state is the (bounded) list of partition values, never rows;
    (2) re-read ONLY those partitions (the IN-filter partition-prunes
    the scan), anti-join the keys out, dynamic-overwrite them back;
    (3) partitions whose every row matched produce no output — dynamic
    mode would silently leave the old files, so those directories are
    removed explicitly (a transactional table format does this step via
    its log; this sink is the no-table-format fallback, like the
    streaming manifest sink).

    Returns {"partitions_rewritten": n, "partitions_removed": m}.
    History partitions with no matching keys are untouched (verifiable
    by file mtime). Single partition column only — the layouts this
    repo writes.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    if len(partition_cols) != 1:
        raise ValueError("delete_keys supports exactly one partition column")
    pcol = partition_cols[0]
    data = spark.read.parquet(path)
    kdf = keys.select(key_col).distinct()
    affected = sorted(
        str(r[pcol])
        for r in data.join(F.broadcast(kdf), key_col, "left_semi")
        .select(pcol)
        .distinct()
        .collect()
    )
    if not affected:
        return {"partitions_rewritten": 0, "partitions_removed": 0}
    scoped = data.filter(F.col(pcol).cast("string").isin(affected))
    remaining = scoped.join(F.broadcast(kdf), key_col, "left_anti")
    survived = {
        str(r[pcol])
        for r in remaining.select(pcol).distinct().collect()
    }
    if survived:
        overwrite_partitions(
            remaining.filter(
                F.col(pcol).cast("string").isin(sorted(survived))
            ),
            path,
            partition_cols,
        )
    emptied = [p for p in affected if p not in survived]
    if emptied:
        # Resolve directories from the ACTUAL listing, not string
        # interpolation: Spark %XX-escapes special chars in partition dir
        # names (' ' → '%20'), so f"{pcol}={value}" can name a dir that
        # does not exist — with ignore_errors that was a silent GDPR
        # hard-delete failure (ADVICE r3). Listing + post-delete existence
        # check turns any miss into a loud error. os.listdir also fails
        # loudly for non-local paths rather than pretending to delete.
        import re

        def _unescape(name: str) -> str:
            return re.sub(
                r"%([0-9A-Fa-f]{2})",
                lambda m: chr(int(m.group(1), 16)),
                name,
            )

        prefix = f"{pcol}="
        dirs = {
            _unescape(d[len(prefix):]): os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith(prefix)
            and os.path.isdir(os.path.join(path, d))
        }
        missing = [p for p in emptied if p not in dirs]
        if missing:
            raise RuntimeError(
                f"GDPR delete: partition dirs not found for "
                f"{pcol} values {missing} under {path}"
            )
        for p in emptied:
            shutil.rmtree(dirs[p])
            if os.path.exists(dirs[p]):
                raise RuntimeError(
                    f"GDPR delete incomplete: {dirs[p]} still present"
                )
    return {
        "partitions_rewritten": len(survived),
        "partitions_removed": len(emptied),
    }


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    as_of: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 maintenance without MERGE — the
    third member of the no-table-format trio (with
    :func:`overwrite_partitions` and :func:`delete_keys`). Given the
    current SCD-2 table and a CDC batch, produce the new SCD-2 table:

    * changed key (any attr differs, NULL-safe): the open row is closed
      (``effective_to = as_of``, ``is_current = false``) AND a new open
      row is inserted (``effective_from = as_of``);
    * new key: inserted open;
    * unchanged key / key absent from the batch: row passes through
      byte-identical;
    * history rows (``is_current = false``) NEVER enter the join — they
      are filtered off and unioned back map-only, so a 100 TB dimension
      with deep history joins only its current slice.

    Plan shape: Spark cannot broadcast either side of a FULL outer
    join, so the naive single full-outer would shuffle the whole
    dimension on every CDC batch. Instead: (1) current LEFT JOIN
    broadcast(updates) — map-only over the dim — feeds the close+insert
    fan-out, a single Generate over a 1-or-2 element row array (no
    union of three filtered scans); (2) brand-new keys come from a
    broadcast semi-join of the dim's key column (column-pruned scan)
    against the update keys, anti-joined back — two more broadcast
    joins over small sides. Net: zero shuffles of dimension rows when
    ``broadcast_updates`` (the CDC-batch-is-small norm; set False for a
    huge backfill and Catalyst plans sort-merge). Compose with
    :func:`overwrite_partitions` (partition the dim by bucket(key)) to
    rewrite only touched partitions at scale.

    ``updates`` must be unique per ``key_col`` (one CDC image per key
    per batch — pre-collapse multi-change batches upstream); ``as_of``
    is an injected ISO date string, same discipline as the expiry
    filter's injected now (operators/extract.py). Re-updating a key on
    its own ``effective_from`` day yields a zero-length closed row —
    kept, matching warehouse convention (half-open [from, to)
    intervals).
    """
    from pyspark.sql import functions as F

    current = dim.filter(F.col(current_col))
    history = dim.filter(~F.col(current_col))
    upd = updates.select(
        F.col(key_col),
        *[F.col(a).alias(f"_u_{a}") for a in attr_cols],
        F.lit(True).alias("_has_upd"),
    )
    matched = current.select(key_col).join(
        F.broadcast(updates.select(key_col)) if broadcast_updates
        else updates.select(key_col),
        key_col,
        "left_semi",
    )
    new_side = updates.join(
        F.broadcast(matched) if broadcast_updates else matched,
        key_col,
        "left_anti",
    )
    if broadcast_updates:
        upd = F.broadcast(upd)
    j = current.join(upd, key_col, "left")

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))

    def _row(vals, eff_from, eff_to, is_cur):
        return F.struct(
            *[v.alias(a) for a, v in zip(attr_cols, vals)],
            eff_from.cast("date").alias(from_col),
            eff_to.cast("date").alias(to_col),
            is_cur.alias(current_col),
        )

    old_vals = [F.col(a) for a in attr_cols]
    new_vals = [F.col(f"_u_{a}") for a in attr_cols]
    as_of_d = F.lit(as_of)
    old_row = _row(old_vals, F.col(from_col), F.col(to_col), F.lit(True))
    closed = _row(old_vals, F.col(from_col), as_of_d, F.lit(False))
    opened = _row(new_vals, as_of_d, F.lit(None), F.lit(True))
    fanout = (
        F.when(~F.coalesce(F.col("_has_upd"), F.lit(False)), F.array(old_row))
        .when(changed, F.array(closed, opened))
        .otherwise(F.array(old_row))
    )
    merged = (
        j.select(F.col(key_col), F.explode(fanout).alias("_r"))
        .select(key_col, "_r.*")
    )
    inserted = new_side.select(
        F.col(key_col),
        *[F.col(a) for a in attr_cols],
        F.lit(as_of).cast("date").alias(from_col),
        F.lit(None).cast("date").alias(to_col),
        F.lit(True).alias(current_col),
    )
    return merged.unionByName(inserted).unionByName(
        history.select(key_col, *attr_cols, from_col, to_col, current_col)
    )


def scd2_snapshot_at(
    dim: DataFrame,
    as_of: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Point-in-time query of an SCD-2 dimension: the rows that were
    effective at ``as_of`` — the read-side reason SCD-2 history exists
    ("join facts to the dimension AS IT WAS"). A version row qualifies
    when ``effective_from <= as_of < effective_to``; a NULL
    ``effective_from`` means since-forever, a NULL ``effective_to``
    means still-open. At most one row per key qualifies because
    :func:`scd2_apply` keeps the validity intervals of a key disjoint
    (pinned in tests).

    Map-only — a pure filter over the dimension scan, so the
    effective-date predicate reaches the parquet row-group stats; at
    100 TB a date-partitioned or range-clustered history makes the
    time-travel read touch only the overlapping files
    (sinks/storage.write_clustered is the companion layout).
    """
    from pyspark.sql import functions as F

    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col(from_col).isNull() | (F.col(from_col) <= d))
        & (F.col(to_col).isNull() | (d < F.col(to_col)))
    )


def bitemporal_apply(
    dim: DataFrame,
    corrections: DataFrame,
    key_col: str,
    attr_cols: list[str],
    tx_time: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    tx_from_col: str = "tx_from",
    tx_to_col: str = "tx_to",
    broadcast_corrections: bool = True,
) -> DataFrame:
    """Bitemporal (valid-time x transaction-time) retroactive
    correction — the fourth member of the no-table-format family: the
    warehouse learns AT ``tx_time`` that a key's attributes have been
    different SINCE the correction's ``valid_from``. SCD-2 alone
    cannot express this (it conflates "when true" with "when
    recorded"); bitemporal keeps both axes so the question "what did
    we BELIEVE on date X about the state on date V?" stays answerable
    after the fix — the audit/compliance query.

    Semantics per corrected key, applied to TX-CURRENT rows
    (``tx_to IS NULL``) whose valid interval intersects
    [valid_from, ∞):

    * the intersecting row is CLOSED in transaction time
      (``tx_to = tx_time``) — byte-preserved otherwise (the old belief
      remains queryable at old tx instants);
    * its pre-correction slice [row.valid_from, c.valid_from) is
      re-inserted with the OLD attributes at ``tx_from = tx_time``
      (empty slice → no row);
    * the corrected slice [max(c.valid_from, row.valid_from),
      row.valid_to) with the NEW attributes is inserted at
      ``tx_from = tx_time`` — each intersecting slice keeps its OWN
      valid interval, so a key with an SCD2-style multi-slice
      tx-current history (several disjoint valid slices) yields
      disjoint corrected slices, never overlapping open rows, and
      ``bitemporal_snapshot`` keeps its at-most-one-row-per-key
      invariant at every (valid, tx) point. For a single open slice
      containing c.valid_from this is exactly the corrected open row
      [c.valid_from, ∞).

    Non-intersecting rows, rows of untouched keys, and tx-closed
    history pass through byte-identical WITHOUT entering the join —
    the scd2_apply discipline: tx-current rows LEFT JOIN
    broadcast(corrections), one Generate fan-out, zero shuffles of
    dimension rows for a small correction batch. ``corrections`` must
    be unique per key: (key, attrs..., valid_from).
    """
    from pyspark.sql import functions as F

    tx_cur = dim.filter(F.col(tx_to_col).isNull())
    tx_hist = dim.filter(F.col(tx_to_col).isNotNull())
    corr = corrections.select(
        F.col(key_col),
        *[F.col(a).alias(f"_c_{a}") for a in attr_cols],
        F.col(valid_from_col).alias("_c_vf"),
        F.lit(True).alias("_has_c"),
    )
    if broadcast_corrections:
        corr = F.broadcast(corr)
    j = tx_cur.join(corr, key_col, "left")

    tx_d = F.lit(tx_time).cast("date")
    intersects = F.coalesce(F.col("_has_c"), F.lit(False)) & (
        F.col(valid_to_col).isNull()
        | (F.col(valid_to_col) > F.col("_c_vf"))
    )

    def _row(vals, vf, vt, tf, tt):
        return F.struct(
            *[v.alias(a) for a, v in zip(attr_cols, vals)],
            vf.cast("date").alias(valid_from_col),
            vt.cast("date").alias(valid_to_col),
            tf.cast("date").alias(tx_from_col),
            tt.cast("date").alias(tx_to_col),
        )

    old_vals = [F.col(a) for a in attr_cols]
    new_vals = [F.col(f"_c_{a}") for a in attr_cols]
    unchanged = _row(
        old_vals,
        F.col(valid_from_col),
        F.col(valid_to_col),
        F.col(tx_from_col),
        F.col(tx_to_col),
    )
    tx_closed = _row(
        old_vals,
        F.col(valid_from_col),
        F.col(valid_to_col),
        F.col(tx_from_col),
        tx_d,
    )
    pre_slice = _row(
        old_vals, F.col(valid_from_col), F.col("_c_vf"), tx_d, F.lit(None)
    )
    corrected = _row(
        new_vals,
        F.greatest(F.col(valid_from_col), F.col("_c_vf")),
        F.col(valid_to_col),
        tx_d,
        F.lit(None),
    )
    fanout = F.when(
        intersects,
        F.when(
            F.col(valid_from_col) < F.col("_c_vf"),
            F.array(tx_closed, pre_slice, corrected),
        ).otherwise(F.array(tx_closed, corrected)),
    ).otherwise(F.array(unchanged))
    merged = (
        j.select(F.col(key_col), F.explode(fanout).alias("_r"))
        .select(key_col, "_r.*")
    )
    passthrough = tx_hist.select(
        key_col, *attr_cols, valid_from_col, valid_to_col,
        tx_from_col, tx_to_col,
    )
    return merged.unionByName(passthrough)


def bitemporal_snapshot(
    dim: DataFrame,
    valid_at: str,
    tx_at: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    tx_from_col: str = "tx_from",
    tx_to_col: str = "tx_to",
) -> DataFrame:
    """Dual-axis point-in-time query: the rows we BELIEVED at ``tx_at``
    to describe the state at ``valid_at`` — both intervals half-open
    [from, to) with NULL = ∞. Pure filter (partition-prunable on
    either date axis at scale)."""
    from pyspark.sql import functions as F

    v = F.lit(valid_at).cast("date")
    t = F.lit(tx_at).cast("date")
    return dim.filter(
        (F.col(tx_from_col) <= t)
        & (F.col(tx_to_col).isNull() | (F.col(tx_to_col) > t))
        & (F.col(valid_from_col) <= v)
        & (F.col(valid_to_col).isNull() | (F.col(valid_to_col) > v))
    )
