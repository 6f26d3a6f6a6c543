"""Structured Streaming wrapper over the CDC apply plan.

The reference is itself a stream consumer — DynamoDB Streams delivers
micro-batches to the Lambda (lib/handler.js:29). The engine analog is
``readStream`` over the change-event source with ``foreachBatch`` applying
each micro-batch through plans/cdc.apply_changes (exactly-once per epoch via
the streaming checkpoint + the store's idempotent batch commits).

No watermarks or event-time windows: the reference has no time semantics —
ordering is resolved by the external version column (lib/handler.js:80-87),
which is watermark-free last-writer-wins (SURVEY.md §2.3 streaming note).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import IndexerConfig
from ..plans import cdc

EVENT_SCHEMA = (
    "event_name string, "
    "keys struct<repo:string,path:string,commit:string>, "
    "new_image struct<repo:string,path:string,commit:string,lang:string,"
    "content:string,version:long>, "
    "old_image struct<repo:string,path:string,commit:string,lang:string,"
    "content:string,version:long>"
)


def start_cdc_stream(
    spark: SparkSession,
    cfg: IndexerConfig,
    store_path: str,
    source_path: str,
    checkpoint_dir: str,
    schema: str = EVENT_SCHEMA,
    **apply_kwargs,
):
    """File-source CDC stream → index store. Returns the StreamingQuery.

    ``trigger(availableNow=True)`` drains existing batches and stops — the
    test/smoke mode; drop it for a continuous stream.
    """
    events = spark.readStream.schema(schema).parquet(source_path)

    def process(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cdc.apply_changes(batch_df, cfg, store_path, **apply_kwargs)

    return (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
