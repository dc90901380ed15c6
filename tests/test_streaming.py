"""True Structured Streaming execution: the same window functions used
by the batch-twin queries, run through readStream -> memory sink with
availableNow, must equal the batch results. Plus a custom stateful
operator via applyInPandasWithState."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.sources import load_table
from lightweight_vector_database_spark.streaming.windows import (
    session_agg,
    stream_events,
    tumbling_agg,
)


def _run_stream(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    }
    stream = tumbling_agg(stream_events(spark, sf_dir))
    _run_stream(stream, "tumbling_t")
    assert _rows(spark, "tumbling_t") == batch


def test_streaming_session_equals_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in session_agg(load_table(spark, sf_dir, "events")).collect()
    }
    stream = session_agg(stream_events(spark, sf_dir))
    _run_stream(stream, "session_t")
    assert _rows(spark, "session_t") == batch


def test_streaming_dedup_within_watermark(spark, sf_dir):
    ev = stream_events(spark, sf_dir, watermark="2 hours")
    dedup = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, "dedup_t")
    batch_keys = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == batch_keys  # one row per key


def test_stateful_running_count(spark, sf_dir):
    """Custom stateful streaming op: per-user running event count via
    applyInPandasWithState."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def count_fn(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    ev = stream_events(spark, sf_dir, watermark="2 hours")
    out = ev.groupBy("user_id").applyInPandasWithState(
        count_fn,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("state_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.n_events for r in spark.sql("SELECT * FROM state_t").collect()}
    batch = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # final state per user must equal the batch count
    assert got == batch


def test_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with watermarks + time-range condition:
    each purchase joined to the same user's clicks in the preceding
    hour. Checked against the identical batch join."""
    purchases = (
        stream_events(spark, sf_dir, watermark="2 hours")
        .filter("event_type = 'purchase'")
        .selectExpr("event_id AS p_id", "user_id", "ts AS p_ts")
    )
    clicks = (
        stream_events(spark, sf_dir, watermark="2 hours")
        .filter("event_type = 'click'")
        .selectExpr("event_id AS c_id", "user_id AS c_user", "ts AS c_ts")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """
            user_id = c_user AND
            c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
            """
        ),
    ).select("p_id", "c_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, "ss_join_t")

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS p_id", "user_id", "ts AS p_ts"
    )
    c = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS c_id", "user_id AS c_user", "ts AS c_ts"
    )
    batch = {
        tuple(r)
        for r in p.join(
            c,
            F.expr(
                "user_id = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
            ),
        )
        .select("p_id", "c_id")
        .collect()
    }
    assert got == batch
    assert len(batch) > 0


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: arbitrary sink logic (upsert-style write) driven
    by the streaming engine."""
    seen = []

    def sink(df, epoch_id):
        df.write.mode("append").parquet(str(tmp_path / "fb_out"))
        seen.append(epoch_id)

    ev = stream_events(spark, sf_dir).select("event_id", "event_type")
    q = ev.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    back = spark.read.parquet(str(tmp_path / "fb_out"))
    assert back.count() == load_table(spark, sf_dir, "events").count()
    assert len(seen) >= 1


def test_streaming_knn_probes(spark, sf_dir):
    """Streaming similarity search: a stream of probe vectors joined
    against the static embeddings table via knn_join in foreachBatch —
    results must equal the batch knn_join."""
    from lightweight_vector_database_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    batch_probes = emb.filter("vec_id < 5").selectExpr(
        "vec_id AS probe_id", "embedding AS probe_vec"
    )
    expected = {
        (r.probe_id, r.rank, r.vec_id)
        for r in knn_join(batch_probes, emb, k=3).collect()
    }

    # stream the same probes from a staged parquet dir
    import tempfile

    d = tempfile.mkdtemp(prefix="knn_probes_")
    batch_probes.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "probe_id long, probe_vec array<float>"
    ).parquet(d)

    got = set()

    def do_knn(batch_df, epoch_id):
        for r in knn_join(batch_df, emb, k=3).collect():
            got.add((r.probe_id, r.rank, r.vec_id))

    q = stream.writeStream.foreachBatch(do_knn).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert got == expected


def test_transform_with_state_running_stats(spark, sf_dir):
    # Spark 4's StatefulProcessor API (transformWithStateInPandas):
    # per-user running event count + max value, verified against the
    # batch aggregate. This is the modern custom-state surface (typed
    # value state, explicit handle) vs applyInPandasWithState above.
    # the TWS driver worker speaks protobuf to the JVM; this container
    # ships a broken google.protobuf, so gate (runs where protobuf works)
    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n", LongType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("mx", DoubleType())]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            if self._state.exists():
                pn, pmx = self._state.get()
                n, mx = n + pn, max(mx, pmx)
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, sf_dir).select("user_id", "value")
        result = ev.groupBy("user_id").transformWithStateInPandas(
            RunningStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            result.writeStream.format("memory")
            .queryName("tws_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old_prov)

    # last update per user must equal the batch aggregate
    got = {
        r.user_id: (r.n, r.max_value)
        for r in spark.sql(
            """SELECT user_id, n, max_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n DESC) rk
                 FROM tws_stats) WHERE rk = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, r.max_value)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_value"))
        .collect()
    }
    assert got == batch


def test_watermark_drops_late_events(spark, tmp_path):
    # two files processed as separate micro-batches (maxFilesPerTrigger=1):
    # batch 1 advances the watermark to ~12:00-10min; batch 2 contains one
    # event INSIDE the horizon (kept) and one far behind it (dropped).
    # Append-mode windowed counts must reflect exactly the kept rows.
    import time as _time
    from datetime import datetime as _dt

    stage = str(tmp_path / "late_events")
    schema = "event_id long, ts timestamp, user_id long"

    def t(s):
        return _dt.fromisoformat(s)

    # watermark computed at the end of batch N becomes effective in
    # batch N+1, so a middle batch is needed between "watermark source"
    # and "late arrival" for the eviction to be observable
    early = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:05:00"), 1),
            (2, t("2024-01-01 11:05:00"), 1),
            (3, t("2024-01-01 12:00:00"), 1),  # -> watermark 11:50
        ],
        schema,
    )
    advance = spark.createDataFrame(
        [(4, t("2024-01-01 12:05:00"), 1)], schema  # evicts the 10:00 window
    )
    late = spark.createDataFrame(
        [(5, t("2024-01-01 10:10:00"), 1)], schema  # behind watermark: dropped
    )
    early.coalesce(1).write.mode("overwrite").parquet(stage)
    _time.sleep(1.1)  # file mtime orders the micro-batches
    advance.coalesce(1).write.mode("append").parquet(stage)
    _time.sleep(1.1)
    late.coalesce(1).write.mode("append").parquet(stage)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.start, r.n) for r in spark.sql("SELECT * FROM late_t").collect()
    }
    # the 10:00 window closed with ONLY event 1 — the late event 5 was
    # discarded and did not resurrect (or duplicate) the emitted window;
    # the 11:00/12:00 windows are still open (not emitted in append mode)
    assert got == {("2024-01-01 10:00:00", 1)}


def test_stream_near_dup_flags_equal_batch(spark, sf_dir):
    """Stream-static LSH near-dup admission check: the streamed
    documents' band collisions against the static corpus index must
    equal the same operator run on the batch table (the signature and
    banding expressions are stateless, so stream == batch exactly),
    and the streaming plan must be append-mode stateless (no state
    store rows)."""
    import hashlib
    import os

    from lightweight_vector_database_spark.sources import load_table
    from lightweight_vector_database_spark.streaming.neardup import (
        corpus_band_index,
        stream_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    index = corpus_band_index(docs)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = f"/tmp/lvdb_docstream_{tag}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/documents.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/documents.parquet", link)
    stream_docs = spark.readStream.schema(
        "doc_id long, url string, source string, lang string, ts timestamp, "
        "text string"
    ).parquet(stage).select("doc_id", "text")

    out = stream_near_dup_pairs(stream_docs, index)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_t")
        .outputMode("append")  # stateless stream-static join
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM neardup_t").collect()}

    batch = {
        tuple(r)
        for r in stream_near_dup_pairs(
            docs.select("doc_id", "text"), index
        ).collect()
    }
    assert got == batch and got  # non-empty: fixture has near-dups
    # symmetric collisions: (a,b) collide <=> (b,a) collide
    pairs = {(a, b) for a, b, _ in got}
    assert pairs == {(b, a) for a, b in pairs}


def test_stream_stream_left_outer_join(spark, sf_dir):
    """Left-outer stream-stream join with watermarks: purchases with no
    click in the preceding hour must surface with a NULL click id once
    the watermark passes their join window. Semantics pinned:
    matched rows == the batch inner join; null-emission covers exactly
    the unmatched purchases whose window closed before the final
    watermark (newer ones stay pending state — never wrong rows)."""
    purchases = (
        stream_events(spark, sf_dir, watermark="2 hours")
        .filter("event_type = 'purchase'")
        .selectExpr("event_id AS p_id", "user_id", "ts AS p_ts")
    )
    clicks = (
        stream_events(spark, sf_dir, watermark="2 hours")
        .filter("event_type = 'click'")
        .selectExpr("event_id AS c_id", "user_id AS c_user", "ts AS c_ts")
    )
    cond = F.expr(
        "user_id = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
    )
    q = (
        purchases.join(clicks, cond, "left_outer")
        .select("p_id", "c_id")
        .writeStream.format("memory")
        .queryName("ss_left_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark, "ss_left_t")

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS p_id", "user_id", "ts AS p_ts"
    )
    c = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS c_id", "user_id AS c_user", "ts AS c_ts"
    )
    inner = {tuple(r) for r in p.join(c, cond).select("p_id", "c_id").collect()}
    left = {
        tuple(r)
        for r in p.join(c, cond, "left_outer").select("p_id", "c_id").collect()
    }

    # every matched pair is emitted, and nothing outside the batch
    # left join ever appears
    assert inner <= got <= left
    # the null-emission path actually fired for closed windows
    null_rows = {t for t in got if t[1] is None}
    assert null_rows, "no watermark-closed unmatched purchases emitted"
    # a purchase is either matched or null-emitted, never both
    matched_ids = {t[0] for t in got if t[1] is not None}
    assert not matched_ids & {t[0] for t in null_rows}


def test_incremental_band_index_equals_rebuild(spark, sf_dir, tmp_path):
    """extend_band_index: appending new docs to the persisted index
    then deleting one must equal a from-scratch rebuild of the same
    corpus — and the admission check against the maintained index
    flags exactly the rebuilt index's collisions."""
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )
    from lightweight_vector_database_spark.streaming.neardup import (
        corpus_band_index,
        extend_band_index,
        stream_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter("doc_id < 60")
    b = docs.filter("doc_id >= 60 AND doc_id < 100")

    store = DeltaSnapshotStore(spark, str(tmp_path / "idx"), id_col="corpus_id")
    extend_band_index(store, a)
    extend_band_index(store, b)
    store.commit_delete(spark.createDataFrame([(7,)], "corpus_id long"))

    rebuilt = corpus_band_index(docs.filter("doc_id < 100 AND doc_id != 7"))
    got = {tuple(r) for r in store.read().collect()}
    want = {tuple(r) for r in rebuilt.collect()}
    assert got == want and got

    probes = docs.filter("doc_id >= 100 AND doc_id < 130")
    via_store = {
        tuple(r)
        for r in stream_near_dup_pairs(probes, store.read()).collect()
    }
    via_rebuild = {
        tuple(r) for r in stream_near_dup_pairs(probes, rebuilt).collect()
    }
    assert via_store == via_rebuild


def test_streaming_topk_foreachbatch_equals_batch(spark, sf_dir):
    """Per-window heavy hitters on a true stream: ranking over a
    streaming aggregate is not expressible in one streaming plan, so
    the counts run in complete mode and rank_topk applies in the
    foreachBatch sink — the final epoch must equal the batch
    windowed_topk exactly."""
    from lightweight_vector_database_spark.streaming.windows import (
        rank_topk,
        windowed_topk,
    )

    batch = {
        tuple(r)
        for r in windowed_topk(
            load_table(spark, sf_dir, "events"), "1 hour", 3
        ).collect()
    }
    ev = stream_events(spark, sf_dir)
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )
    result: list[tuple] = []

    def sink(df, epoch_id):
        result.clear()
        result.extend(tuple(r) for r in rank_topk(df, 3).collect())

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(result) == batch
