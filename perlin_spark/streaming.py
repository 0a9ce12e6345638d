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
    compact_every: int | None = None,
):
    """Returns a foreachBatch function: one committed epoch per micro-batch.

    ``compact_every=N`` folds accumulated epochs into one whenever N or
    more are committed (``epochs.compact_epochs``), keeping query-time
    epoch fan-in O(1) on a long-running stream instead of O(batches).

    Wire up::

        q = (stream.writeStream
             .foreachBatch(epoch_sink(specs, root, content_col="content"))
             .option("checkpointLocation", f"{root}/_stream_checkpoint")
             .start())
    """
    from .epochs import compact_epochs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # replay-safety: if this batch_id already committed, skip
        # (compacted epochs carry the union of consumed ids forward)
        for e in list_epochs(root):
            m = _read_manifest(_epoch_dir(root, e))
            if m and (
                m.get("stream_batch_id") == batch_id
                or batch_id in m.get("stream_batch_ids", [])
            ):
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
        if compact_every is not None and len(list_epochs(root)) >= compact_every:
            # the compacted manifest carries the consumed epochs'
            # stream_batch_ids, so replay-safety survives compaction
            compact_epochs(batch_df.sparkSession, root)

    return sink


def dedup_stream(stream: DataFrame, key_cols: list[str], order_col: str):
    """EXACT streaming deduplication with keyed state
    (``applyInPandasWithState``): the first-seen row per key is emitted,
    every later arrival — same micro-batch or any later one — is dropped.
    "First" is deterministic: the minimum ``order_col`` within the
    earliest batch that contains the key.

    State per key is one counter (16 bytes), so the state store scales to
    billions of keys; keys hash-partition across executors.  This is the
    streaming analog of ``extras.dedup.exact_dedup_stats`` for a
    continuous ingest pipeline (dedup-before-index)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = stream.schema

    def fn(key, pdfs, state):
        (seen,) = state.get if state.exists else (0,)
        rows = [pdf for pdf in pdfs if len(pdf)]
        n_new = sum(len(p) for p in rows)
        if seen == 0 and n_new:
            batch = pd.concat(rows, ignore_index=True)
            yield batch.loc[[batch[order_col].idxmin()]]
        state.update((seen + n_new,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, "seen LONG", "update", GroupStateTimeout.NoTimeout
    )


def sessionize_stream(
    stream: DataFrame,
    gap_s: int | None = None,
    time_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
):
    """Streaming twin of ``extras.events.sessionize`` (r3 verdict item 7):
    gap-based sessions per user with keyed state
    (``applyInPandasWithState``).  Events merge into the user's OPEN
    session while within ``gap_s`` of it (across micro-batches); an event
    beyond the gap CLOSES the open session (emitted) and starts a new
    one, and a processing-time timeout of ``gap_s`` closes idle sessions
    when the stream goes quiet.  Emits closed sessions only:
    (user_id, sess_start_s, sess_end_s, n_events, sum_value_x100).

    State per user is one 4-field tuple (the open session), so the state
    store scales with ACTIVE users, not history.  Out-of-order arrivals
    are merged if they land within the gap of the open session (in
    either direction); an event more than ``gap_s`` OLDER than the open
    session's start belongs to an already-closed session and is emitted
    immediately as its own single-event late session — it never
    stretches ``sess_start`` backwards — the standard bounded-state
    trade-off; widen the gap or buffer upstream for heavier disorder."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .extras.events import SESSION_GAP_S, _epoch_s

    gap = SESSION_GAP_S if gap_s is None else gap_s
    out_cols = ["user_id", "sess_start_s", "sess_end_s", "n_events", "sum_value_x100"]
    # epoch seconds are derived JVM-side and TIMEZONE-INVARIANTLY before
    # the stateful op (extras.events._epoch_s): the Arrow conversion into
    # the UDF renders timestamps in the SESSION timezone as naive
    # datetimes, so int64-ing them in pandas would silently make session
    # boundaries timezone-dependent — the exact defect the batch
    # sessionize fixed this round
    stream = stream.withColumn("_sec", _epoch_s(stream, time_col))

    def close(uid, cur):
        start, last, n, sv = cur
        return (uid, int(start), int(last), int(n), int(math.floor(sv * 100 + 0.5)))

    def fn(key, pdfs, state):
        uid = key[0]
        closed = []
        if state.hasTimedOut:
            closed.append(close(uid, state.get))
            state.remove()
        else:
            rows = [p for p in pdfs if len(p)]
            if rows:
                batch = pd.concat(rows, ignore_index=True)
                secs = batch["_sec"].to_numpy()
                vals = batch[value_col].to_numpy()
                cur = tuple(state.get) if state.exists else None
                for i in np.argsort(secs, kind="stable"):
                    s, v = int(secs[i]), float(vals[i])
                    if cur is None:
                        cur = (s, s, 1, v)
                    elif cur[0] - s > gap:
                        # beyond the gap BELOW the open session: part of an
                        # already-closed session — emit as a late singleton,
                        # never stretch sess_start backwards without bound
                        closed.append(close(uid, (s, s, 1, v)))
                    elif s - cur[1] > gap:
                        closed.append(close(uid, cur))
                        cur = (s, s, 1, v)
                    else:
                        cur = (min(cur[0], s), max(cur[1], s), cur[2] + 1, cur[3] + v)
                state.update(cur)
                state.setTimeoutDuration(gap * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=out_cols)

    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        "user_id long, sess_start_s long, sess_end_s long, "
        "n_events long, sum_value_x100 long",
        "sess_start long, last_s long, n_events long, sum_value double",
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def vector_sink(
    path: str,
    n_centroids: int = 16,
    m: int | None = None,
    ks: int | None = None,
    refine_iters: int = 5,
    keep_embeddings: bool = True,
):
    """foreachBatch sink: continuous embedding ingest into the composed
    IVF+PQ cell layout (the vector twin of :func:`epoch_sink`).

    The FIRST non-empty micro-batch trains the index (k-means-refined
    centroids + codebooks on a renumbered view of the batch — training
    is batch-sized and driver-sampled, classic ANN practice) and writes
    the ``_centroids``/``_codebooks`` side tables; every batch is then
    assigned + PQ-encoded with those FROZEN artifacts and written to its
    own ``batch=<id>/cell=<c>/`` partition directory.  Queries via
    :func:`perlin_spark.extras.similarity.ivf_pq_topk_from_cells` see
    all committed batches (``batch`` is just another partition column;
    cell pruning still reaches the scan).

    Replay-safe: each batch directory is written once and recognized by
    its ``_SUCCESS`` marker — a replayed micro-batch is skipped, never
    double-appended.  Restarting the stream in a NEW process reloads the
    frozen side tables instead of retraining.

    Wire up::

        q = (vectors.writeStream
             .foreachBatch(vector_sink("/idx/vectors"))
             .option("checkpointLocation", "/idx/vectors/_ckpt")
             .start())
    """
    from pyspark.sql import Window, functions as F

    from .extras import similarity as S

    m = S.PQ_M if m is None else m
    ks = S.PQ_KS if ks is None else ks
    state: dict = {}

    def _fs_exists(spark, p: str) -> bool:
        # Hadoop FileSystem, not os.path: the index root is typically
        # s3a://... or hdfs://... in production — a driver-local check
        # would always be False there, re-training on restart and
        # silently mixing codebooks across batches
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bdir = path.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, bdir + "/_SUCCESS"):
            return  # replayed micro-batch: already committed
        if "cents" not in state:
            if _fs_exists(spark, path.rstrip("/") + "/_centroids"):
                state["cents"] = S.read_ivf_centroids(spark, path)
                state["cb"] = S.read_pq_codebooks(spark, path)
            else:
                # the k-means seeds expect vec_ids 0..k-1; train on a
                # renumbered view so ANY id range trains (ids are only
                # seeds — training uses the vectors)
                w = Window.orderBy("vec_id")
                train = batch_df.select(
                    (F.row_number().over(w) - 1).alias("vec_id"), "embedding"
                )
                state["cents"] = S.ivf_kmeans_centroids(
                    train, n_centroids, iters=refine_iters
                )
                state["cb"] = S.pq_kmeans_codebooks(
                    train, m=m, ks=ks, iters=refine_iters
                )
                S.write_centroids_table(spark, path, state["cents"])
                S.write_codebooks_table(spark, path, state["cb"])
        cols = ["vec_id", "codes"] + (["embedding"] if keep_embeddings else [])
        (
            batch_df
            .withColumn("cell", S.ivf_cell_udf(state["cents"])(F.col("embedding")))
            .withColumn("codes", S.pq_encode_udf(state["cb"])(F.col("embedding")))
            .select(*cols, "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(bdir)
        )

    return sink


def windowed_doc_stats(
    stream: DataFrame,
    time_col: str = "event_time",
    content_col: str = "text",
    window: str = "1 minute",
    watermark: str = "2 minutes",
):
    """Per-event-time-window corpus stats (docs, tokens, avg doc length)
    with a watermark bounding state for late data — the standard
    Structured Streaming shape for monitoring an ingest pipeline."""
    from pyspark.sql import functions as F

    n_tokens = F.size(
        F.filter(F.split(F.col(content_col), r"\s+"), lambda x: x != F.lit(""))
    )
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
            F.avg(n_tokens).alias("avg_dl"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "n_docs",
            "n_tokens",
            "avg_dl",
        )
    )
