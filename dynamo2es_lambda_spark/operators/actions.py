"""Action dispatch + last-writer-wins: the reference's event-name switch as
a DataFrame stage.

Reference semantics (citations):
- INSERT / MODIFY → index (upsert) action with document body;
  REMOVE → delete action, no body (lib/handler.js:95-110).
- REMOVE bumps the resolved version by 1 so the tombstone supersedes the
  last indexed version (lib/handler.js:104-106).
- any other event name → UnknownEventNameError, routed to the per-record
  error channel (lib/handler.js:111-112, errors/UnknownEventNameError.js).
- external versioning = highest version wins (versionType 'external',
  lib/handler.js:86); within a batch the engine resolves order by version
  instead of arrival order (SURVEY.md §2.1 #4, #11) — on a version tie the
  delete wins deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ACTION_INDEX = "index"
ACTION_DELETE = "delete"


def dispatch(df: DataFrame) -> DataFrame:
    """Adds ``action`` (index/delete/null) and folds unknown-event errors
    into the ``error`` channel column; applies the REMOVE version bump."""
    action = (
        F.when(F.col("event_name").isin("INSERT", "MODIFY"), ACTION_INDEX)
        .when(F.col("event_name") == "REMOVE", ACTION_DELETE)
        .otherwise(F.lit(None).cast("string"))
    )
    unknown_err = F.when(
        action.isNull(),
        F.concat(F.lit('"'), F.col("event_name"),
                 F.lit('" is an unknown event name')),
    )
    out = df.withColumn("action", action)
    if "error" in df.columns:
        out = out.withColumn("error", F.coalesce(F.col("error"), unknown_err))
    else:
        out = out.withColumn("error", unknown_err)
    if "version" in out.columns:
        out = out.withColumn(
            "version",
            F.when(
                F.col("action") == ACTION_DELETE, F.col("version") + F.lit(1.0)
            ).otherwise(F.col("version")),
        )
    return out


def last_writer_wins(df: DataFrame) -> DataFrame:
    """One row per doc_id: highest version; version ties → delete wins,
    then latest arrival is undefined so we pin a total order on action and
    finally on a full-row hash — deterministic under any shuffle order
    (same policy as plans/build.dedup_latest_version)."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy("doc_id").orderBy(
        F.col("version").desc_nulls_last(), F.col("action").asc(),
        row_hash.desc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
