"""Structured Streaming ingestion: micro-batches as index epochs.

The reference has no streaming (SURVEY.md §2.6); its incremental analog is
``add_document`` + ``commit`` batches.  The Spark-native equivalent is a
``foreachBatch`` sink: each micro-batch becomes one committed epoch (same
manifest/resume machinery as batch builds), so a query over
``load_index`` always sees a consistent prefix of the stream.

Exactly-once across restarts comes from pairing the streaming checkpoint
with the epoch's idempotency: ``epoch = first_uncommitted`` + batch_id is
recorded in the manifest, so a replayed micro-batch overwrites its own
(uncommitted) epoch instead of duplicating documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .analysis import FieldSpec
from .epochs import _epoch_dir, _read_manifest, build_epoch, list_epochs


def epoch_sink(
    specs: list[FieldSpec],
    root: str,
    *,
    doc_id_col: str | None = "doc_id",
    order_cols: list[str] | None = None,
    content_col: str | None = None,
    n_shards: int = 8,
    buckets: int = 8,
):
    """Returns a foreachBatch function: one committed epoch per micro-batch.

    Wire up::

        q = (stream.writeStream
             .foreachBatch(epoch_sink(specs, root, content_col="content"))
             .option("checkpointLocation", f"{root}/_stream_checkpoint")
             .start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # replay-safety: if this batch_id already committed, skip
        for e in list_epochs(root):
            m = _read_manifest(_epoch_dir(root, e))
            if m and m.get("stream_batch_id") == batch_id:
                return
        # the stream batch id rides the manifest itself (written atomically,
        # and present BEFORE _EPOCH_SUCCESS) — no post-commit stamp, so
        # there is no crash window in which a committed epoch lacks its
        # replay marker and a replayed micro-batch double-builds
        build_epoch(
            batch_df.sparkSession,
            batch_df,
            specs,
            root,
            doc_id_col=doc_id_col,
            order_cols=order_cols,
            content_col=content_col,
            n_shards=n_shards,
            buckets=buckets,
            extra_manifest={"stream_batch_id": batch_id},
        )

    return sink
