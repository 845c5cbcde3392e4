"""Structured Streaming batch/stream parity on the events table."""

import pytest
from pyspark.sql import functions as F

from knovexlite_spark.datasets import load_table
from knovexlite_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_SMALL, "events").cache()


def _stream(spark):
    return read_events_stream(spark, SF_SMALL)


def test_tumbling_stream_equals_batch(spark, events_batch):
    run_to_memory(tumbling_counts(_stream(spark)), "t_tumble")
    got = {
        (r["w"], r["event_type"]): (r["c"], r["s"])
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = (
        events_batch.groupBy(
            F.date_trunc("HOUR", "ts").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("string").alias("s"),
        )
        .collect()
    )
    want = {(r["w"], r["event_type"]): (r["c"], r["s"]) for r in batch}
    assert got == want


def test_sliding_stream_covers_tumbling(spark, events_batch):
    run_to_memory(sliding_counts(_stream(spark)), "t_slide")
    rows = spark.sql("SELECT * FROM t_slide").collect()
    # every event lands in exactly 2 sliding windows (1h window, 30m slide)
    assert sum(r["c"] for r in rows) == 2 * events_batch.count()


def test_session_stream_equals_lag_sessionization(spark, events_batch):
    run_to_memory(session_windows(_stream(spark)), "t_sess")
    n_sessions = spark.sql("SELECT COUNT(*) AS n FROM t_sess").collect()[0]["n"]
    events_total = spark.sql("SELECT SUM(n_events) AS s FROM t_sess").collect()[0]["s"]
    # batch twin: a session starts where the gap to the previous event
    # exceeds 30 minutes (Q19 semantics)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch_sessions = (
        events_batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev").cast("long")
                    > 30 * 60
                ),
                1,
            ).otherwise(0),
        )
        .agg(F.sum("new_s"))
        .collect()[0][0]
    )
    assert n_sessions == batch_sessions
    assert events_total == events_batch.count()


def test_custom_stateful_operator_batch_parity(spark, events_batch):
    """applyInPandasWithState keyed state: after the source drains, the
    last emitted row per user equals the batch aggregation."""
    from knovexlite_spark.streaming.stateful import running_user_stats

    out = running_user_stats(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS s, MAX(max_value) AS m "
        "FROM t_state GROUP BY user_id"
    ).toPandas()
    want = (
        events_batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        )
        .toPandas()
    )
    g = got.sort_values("user_id", ignore_index=True)
    w = want.sort_values("user_id", ignore_index=True)
    assert g["user_id"].tolist() == w["user_id"].tolist()
    assert g["n"].tolist() == w["n"].tolist()
    assert all(abs(a - b) < 1e-6 for a, b in zip(g["s"], w["s"]))
    assert g["m"].tolist() == w["m"].tolist()

def test_watermark_drops_late_event_across_triggers(spark, tmp_path):
    """The one streaming semantic batch parity can't show: an event
    arriving beyond the watermark, AFTER its window's state has been
    evicted, is provably dropped (round-2 judge ask).

    Spark's watermark is a state-eviction bound, not a strict input
    filter: a late row that lands in the same micro-batch in which its
    window is still in state is merged before eviction.  The drop
    guarantee applies from the first trigger after finalization — which
    is what this pins, via four single-file triggers (mtime-ordered):

      f1: 2 events in [10:00,10:10) + one at 11:00  -> wm becomes 10:50
      f2: on-time 11:05; end of this batch evicts + emits [10:00,10:10)
      f3: LATE 10:02 (window already finalized)     -> must be dropped
      f4: 12:00 advances wm past 11:10 so [11:00,11:10) finalizes

    Append mode emits each finalized window once: [10:00,10:10) must
    show c=2 (3 would mean the late row resurrected state; a duplicate
    row would mean re-emission), and the engine must report exactly one
    numRowsDroppedByWatermark."""
    import json
    import os

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name, rows, mtime):
        p = src / name
        with open(p, "w") as f:
            for ts in rows:
                f.write(json.dumps({"ts": ts, "event_type": "x", "value": 1.0}) + "\n")
        os.utime(p, (mtime, mtime))

    day = "2024-01-01T"
    write_file("f1.json", [day + "10:00:00", day + "10:04:00", day + "11:00:00"], 1000)
    write_file("f2.json", [day + "11:05:00"], 2000)
    write_file("f3.json", [day + "10:02:00"], 3000)  # beyond watermark
    write_file("f4.json", [day + "12:00:00"], 4000)

    events = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = tumbling_counts(events, window_len="10 minutes", watermark="10 minutes")
    q = run_to_memory(out, "t_latedrop", mode="append")
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    rows = spark.sql("SELECT * FROM t_latedrop").collect()
    got = {}
    for r in rows:
        got.setdefault(str(r["w"]), []).append(r["c"])
    assert dropped == 1, f"expected exactly one watermark-dropped row, got {dropped}"
    assert got.get("2024-01-01 10:00:00") == [2], (
        f"late event beyond the watermark must not resurrect or re-emit "
        f"the finalized window, got {got}"
    )
    assert got.get("2024-01-01 11:00:00") == [2], f"on-time events must aggregate, got {got}"
    # the 12:00 window is still open (watermark 11:50) -> not emitted
    assert "2024-01-01 12:00:00" not in got


def test_stream_reads_directory_layout_events(spark, events_batch, tmp_path):
    """Spark-written events.parquet is a DIRECTORY of part-files (the
    rehearsal blow-up layout); the old filename-glob source matched
    zero part-files there and yielded a SILENTLY EMPTY stream (caught
    by the round-4 rehearsal only because row counts are recorded next
    to timings).  The stream must see every row of both layouts."""
    d = str(tmp_path / "sfdir")
    events_batch.limit(500).write.parquet(f"{d}/events.parquet")
    run_to_memory(
        read_events_stream(spark, d).groupBy().count(), "t_dirlayout"
    )
    rows = spark.sql("SELECT * FROM t_dirlayout").collect()
    assert rows and rows[0]["count"] == 500


def test_dedup_stream_removes_in_horizon_duplicates(spark, events_batch):
    """A self-unioned stream delivers every event twice (the
    at-least-once redelivery shape); dedup_stream must emit each
    event_id once, matching the batch distinct count."""
    from knovexlite_spark.streaming.events import dedup_stream

    doubled = _stream(spark).unionByName(_stream(spark))
    run_to_memory(
        dedup_stream(doubled).select("event_id"), "t_dedup", mode="append"
    )
    got = spark.sql("SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM t_dedup").first()
    n = events_batch.select("event_id").distinct().count()
    assert (got["c"], got["d"]) == (n, n)


def test_near_dup_flagging_at_ingest_stream_static(spark):
    """Near-dup flagging AT INGEST: stream documents through the
    stateless kernel fingerprinter, band them (per-row explode), and
    stream-static join against a static banded index of the existing
    corpus — append mode, no watermark, no state.  The flagged
    (incoming, existing) pairs must equal the batch computation."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.dedup import (
        simhash_band_buckets,
        simhash_fingerprints,
        simhash_fingerprints_kernel,
    )
    from knovexlite_spark.streaming.events import run_to_memory
    from tests.conftest import SF_SMALL

    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select("doc_id", "text")
    # static index: the "existing corpus" = even docs; the stream
    # replays ALL docs as new arrivals (so every even doc re-arrives)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    index = simhash_band_buckets(simhash_fingerprints(existing)).withColumnsRenamed(
        {"doc": "existing_doc"}
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMALL)
        .select("doc_id", "text")
    )
    flagged = (
        simhash_band_buckets(simhash_fingerprints_kernel(stream))
        .join(index, ["band", "bucket"])  # stream-static: stateless
        .filter(F.col("doc") != F.col("existing_doc"))
        .select("doc", "existing_doc")
    )
    run_to_memory(flagged, "t_ingest_neardup", mode="append")
    got = {
        (r["doc"], r["existing_doc"])
        for r in spark.sql("SELECT * FROM t_ingest_neardup").collect()
    }
    want = {
        (r["doc"], r["existing_doc"])
        for r in simhash_band_buckets(simhash_fingerprints(docs))
        .join(index, ["band", "bucket"])
        .filter(F.col("doc") != F.col("existing_doc"))
        .select("doc", "existing_doc")
        .collect()
    }
    assert got == want and want  # non-empty: every even doc re-arrived


def test_minhash_near_dup_flagging_at_ingest_stream_static(spark):
    """Round-6 stretch #8: the MinHash family at ingest.  Stream
    documents through the shuffle-free per-row signature fold
    (minhash_signatures_hof — zero exchanges, so it is legal on a
    streaming frame), band with the stateless minhash_band_buckets
    explode, and stream-static join against a static banded index of
    the existing corpus — append mode, no watermark, no state.  The
    flagged (incoming, existing) pairs must equal the batch
    computation via the GROUPED signature path (so the test also spans
    the hof==grouped equivalence on real corpus data)."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.dedup import (
        minhash_band_buckets,
        minhash_signatures,
        minhash_signatures_hof,
    )
    from knovexlite_spark.streaming.events import run_to_memory
    from tests.conftest import SF_SMALL

    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    index = minhash_band_buckets(minhash_signatures(existing)).withColumnsRenamed(
        {"doc": "existing_doc"}
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMALL)
        .select("doc_id", "text")
    )
    flagged = (
        minhash_band_buckets(minhash_signatures_hof(stream))
        .join(index, ["band", "bucket"])  # stream-static: stateless
        .filter(F.col("doc") != F.col("existing_doc"))
        .select("doc", "existing_doc")  # no distinct: stays stateless
    )
    run_to_memory(flagged, "t_ingest_minhash", mode="append")
    got = {
        (r["doc"], r["existing_doc"])
        for r in spark.sql("SELECT * FROM t_ingest_minhash").collect()
    }
    want = {
        (r["doc"], r["existing_doc"])
        for r in minhash_band_buckets(minhash_signatures(docs))
        .join(index, ["band", "bucket"])
        .filter(F.col("doc") != F.col("existing_doc"))
        .select("doc", "existing_doc")
        .collect()
    }
    assert got == want and want  # non-empty: every even doc re-arrived


def test_asof_enrich_stream_matches_batch_asof(spark, tmp_path):
    """Streaming as-of enrichment (broadcast sorted static right +
    per-batch binary search) must equal ops/asof.asof_join row-for-row
    on the same frames — all three directions, tolerance, NULL
    payloads, unknown keys."""
    import pandas as pd

    from knovexlite_spark.ops.asof import asof_join
    from knovexlite_spark.streaming.events import asof_enrich_stream

    quotes_rows = [
        ("a", 10, 1.0), ("a", 20, None), ("a", 35, 3.0),
        ("b", 5, 10.0), ("b", 30, 20.0),
    ]
    trades_rows = [
        ("a", 9, 1), ("a", 10, 2), ("a", 25, 3), ("a", 40, 4),
        ("b", 4, 5), ("b", 30, 6), ("b", 100, 7), ("c", 50, 8),
    ]
    quotes = spark.createDataFrame(quotes_rows, "sym string, ts long, px double")
    trades = spark.createDataFrame(trades_rows, "sym string, ts long, qty long")
    src = str(tmp_path / "trades")
    trades.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(trades.schema).parquet(src)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 5):
            out = asof_enrich_stream(
                stream, quotes, on="ts", by=("sym",),
                direction=direction, tolerance=tol,
            )
            name = f"asof_{direction}_{tol or 0}"
            q = (
                out.writeStream.format("memory").queryName(name)
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination(120)
            got = {
                (r["sym"], r["ts"], r["qty"]): (r["px"], r["ts_r"])
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
            want = {
                (r["sym"], r["ts"], r["qty"]): (r["px"], r["ts_r"])
                for r in asof_join(
                    trades, quotes, on="ts", by=("sym",),
                    direction=direction, tolerance=tol,
                ).collect()
            }
            assert got == want, (direction, tol)
    # NULL payload preserved (no backfill) through the stream too
    assert got != {}  # sanity


def test_asof_enrich_stream_timestamp_ordering(spark, tmp_path):
    """Timestamp ordering columns: match + tolerance in seconds, same
    as the batch operator."""
    from pyspark.sql import functions as SF

    from knovexlite_spark.ops.asof import asof_join
    from knovexlite_spark.streaming.events import asof_enrich_stream

    q = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 12:00:00", 2.0)],
        "ts string, px double",
    ).select(SF.col("ts").cast("timestamp").alias("ts"), "px")
    t = spark.createDataFrame(
        [("2024-01-01 09:59:00", 1), ("2024-01-01 11:00:00", 2),
         ("2024-01-01 12:00:00", 3)],
        "ts string, qty long",
    ).select(SF.col("ts").cast("timestamp").alias("ts"), "qty")
    src = str(tmp_path / "t_ts")
    t.write.parquet(src)
    stream = spark.readStream.schema(t.schema).parquet(src)
    out = asof_enrich_stream(stream, q, on="ts", tolerance=1800)
    qh = (
        out.writeStream.format("memory").queryName("asof_ts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(120)
    got = {r["qty"]: r["px"] for r in spark.sql("SELECT * FROM asof_ts").collect()}
    want = {
        r["qty"]: r["px"]
        for r in asof_join(t, q, on="ts", tolerance=1800).collect()
    }
    assert got == want == {1: None, 2: None, 3: 2.0}


def test_asof_enrich_stream_null_timestamps(spark, tmp_path):
    """Review finding: a NULL right ts crashed the driver-side sort,
    and a NULL left ts would binary-search as NaN.  Both must follow
    batch semantics: NULL ordering values never match."""
    from knovexlite_spark.ops.asof import asof_join
    from knovexlite_spark.streaming.events import asof_enrich_stream

    quotes = spark.createDataFrame(
        [("a", None, 9.0), ("a", 10, 1.0)], "sym string, ts long, px double"
    )
    trades = spark.createDataFrame(
        [("a", None, 1), ("a", 15, 2)], "sym string, ts long, qty long"
    )
    src = str(tmp_path / "t_null")
    trades.write.parquet(src)
    stream = spark.readStream.schema(trades.schema).parquet(src)
    out = asof_enrich_stream(stream, quotes, on="ts", by=("sym",))
    q = (
        out.writeStream.format("memory").queryName("asof_null")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["qty"]: (r["px"], r["ts_r"])
        for r in spark.sql("SELECT * FROM asof_null").collect()
    }
    want = {
        r["qty"]: (r["px"], r["ts_r"])
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    }
    assert got == want == {1: (None, None), 2: (1.0, 10)}


def test_bloom_dedup_stream_against_history_matches_batch(spark):
    """Round-7: the incremental-ingest Bloom dedup on a stream.  The
    history half of the documents table is the static corpus; the full
    table re-arrives as a stream.  The streaming form (collected-filter
    map probe + stream-static anti-join verification) must return
    EXACTLY the rows the batch operator (ops/sketch.
    dedup_against_history) returns — which itself equals the exact
    content anti-join."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.sketch import dedup_against_history
    from knovexlite_spark.streaming.events import (
        dedup_stream_against_history,
        run_to_memory,
    )
    from tests.conftest import SF_SMALL

    docs = Engine.for_dir(spark, SF_SMALL).table("documents").select(
        "doc_id", "text"
    )
    history = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint()

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMALL)
        .select("doc_id", "text")
    )
    M = 1 << 14
    out = dedup_stream_against_history(stream, history, m_bits=M)
    run_to_memory(out, "t_bloom_ingest", mode="append")
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT * FROM t_bloom_ingest").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_against_history(docs, history, m_bits=M).collect()
    )
    exact = sorted(
        r["doc_id"]
        for r in docs.join(
            history.select(F.md5("text").alias("h")),
            F.md5(docs["text"]) == F.col("h"),
            "left_anti",
        ).collect()
    )
    assert got == want == exact
    # the odd docs survive (duplicate TEXT across ids is possible in
    # the corpus, so compare against the exact semantics, not id parity)
    assert got and all(d % 2 == 1 for d in got)


def _np_semantic_ingest_expected(stream_rows, hist_rows, cent, thr, probes):
    """Independent NumPy replay of the probe-limited ingest contract:
    a stream vector is dropped iff some history vector assigned to one
    of its `probes` nearest cells has cosine >= thr."""
    import numpy as np

    cent = np.asarray(cent, dtype=np.float32)
    hmat = np.stack([np.asarray(v, dtype=np.float32) for _, v in hist_rows])
    hcell = (
        ((hmat[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(axis=1)
    )
    hn = hmat / np.maximum(np.linalg.norm(hmat, axis=1, keepdims=True), 1e-30)
    keep = []
    for sid, v in stream_rows:
        x = np.asarray(v, dtype=np.float32)
        d = ((x[None, :] - cent) ** 2).sum(-1)
        cells = np.argsort(d)[:probes]
        nx = np.linalg.norm(x)
        dropped = False
        if nx > 0:
            xs = x / nx
            for ci in cells:
                mask = hcell == ci
                if mask.any() and float((hn[mask] @ xs).max()) >= thr:
                    dropped = True
                    break
        if not dropped:
            keep.append(sid)
    return sorted(keep)


def test_semantic_ingest_dedup_stream_matches_batch_and_numpy(spark):
    """Round-8 ask #5: embedding near-dup at ingest.  History = even
    vec_ids of the embeddings table; the full table re-arrives as a
    stream.  The streaming output must equal (a) the SAME operator run
    in batch mode and (b) an independent NumPy replay of the
    probe-limited contract.  Every even id (an exact copy of history)
    is dropped."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.cluster import kmeans_fit
    from knovexlite_spark.streaming.events import (
        run_to_memory,
        semantic_dedup_stream_against_history,
    )
    from tests.conftest import SF_SMALL

    emb = Engine.for_dir(spark, SF_SMALL).table("embeddings").select(
        "vec_id", "embedding"
    )
    history = emb.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    cent = kmeans_fit(history, 8, max_iter=3)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(SF_SMALL)
        .select("vec_id", "embedding")
    )
    out = semantic_dedup_stream_against_history(
        stream, history, threshold=0.95, probes=2, centroids=cent
    )
    run_to_memory(out, "t_sem_ingest", mode="append")
    got = sorted(
        r["vec_id"] for r in spark.sql("SELECT * FROM t_sem_ingest").collect()
    )
    batch = sorted(
        r["vec_id"]
        for r in semantic_dedup_stream_against_history(
            emb, history, threshold=0.95, probes=2, centroids=cent
        ).collect()
    )
    hist_rows = [(r["vec_id"], r["embedding"]) for r in history.collect()]
    all_rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    want = _np_semantic_ingest_expected(all_rows, hist_rows, cent, 0.95, 2)
    assert got == batch == want
    assert all(v % 2 == 1 for v in got)  # every history copy dropped
    assert got  # and genuinely-new vectors survive
    # the anti joins use the CELL equi key with the cosine test as a
    # residual — hash joins, never a nested loop over history
    plan = (
        semantic_dedup_stream_against_history(
            emb, history, threshold=0.95, probes=2, centroids=cent
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("LeftAnti") == 2


def test_ingest_dedup_pipeline_stream_matches_batch(spark, tmp_path):
    """Round 8: the COMPOSED ingest chain (exact Bloom removal ->
    LSH near-dup hint vs history's banded index -> semantic embedding
    removal) — stream output == the same operator in batch mode ==
    the planted expectation: exact copies die at stage 1, a lexical
    near-dup survives WITH near_dup_hint, an embedding near-dup dies
    at stage 3, novel rows survive unflagged."""
    import numpy as np

    from knovexlite_spark.ops.cluster import kmeans_fit
    from knovexlite_spark.streaming.events import (
        ingest_dedup_pipeline,
        run_to_memory,
    )

    rng = np.random.default_rng(17)
    body = " ".join(f"token{j} word{j * 3}" for j in range(12))  # 24 toks
    hist_rows = [
        (i, f"history document number {i} begins here {body}",
         rng.normal(0, 1, 16).astype(float).tolist())
        for i in range(50)
    ]
    history_docs = spark.createDataFrame(
        [(i, t) for i, t, _ in hist_rows], "doc_id long, text string"
    ).localCheckpoint()
    history_emb = spark.createDataFrame(
        [(i, v) for i, _, v in hist_rows],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()
    cent = kmeans_fit(history_emb, 4, max_iter=3)

    novel = lambda i: (
        f"totally fresh content {i} nothing like the rest {i * 31}"
    )
    stream_rows = [
        # exact copy of history doc 3 -> removed by the Bloom stage
        (100, hist_rows[3][1], rng.normal(0, 1, 16).astype(float).tolist()),
        # history doc 5 plus a short tail -> near-dup: content hash
        # differs (survives the exact stage) but ~90% of shingles are
        # shared, so >= 1 LSH band collides -> hint True
        (101, hist_rows[5][1] + " trailing addendum",
         rng.normal(0, 1, 16).astype(float).tolist()),
        # novel text but the embedding of history vec 7 -> semantic kill
        (102, novel(102),
         (np.array(hist_rows[7][2]) + 1e-5).astype(float).tolist()),
        # fully novel -> survives, hint False
        (103, novel(103), rng.normal(0, 1, 16).astype(float).tolist()),
    ]
    batch_docs = spark.createDataFrame(
        stream_rows, "doc_id long, text string, embedding array<float>"
    )
    src = str(tmp_path / "ingest_src")
    batch_docs.coalesce(1).write.parquet(src)
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(src)

    kwargs = dict(
        history_emb=history_emb, m_bits=1 << 14,
        semantic_kwargs=dict(threshold=0.95, probes=2, centroids=cent),
    )
    out = ingest_dedup_pipeline(stream_docs, history_docs, **kwargs)
    run_to_memory(out, "t_ingest_pipe", mode="append")
    got = {
        r["doc_id"]: r["near_dup_hint"]
        for r in spark.sql("SELECT * FROM t_ingest_pipe").collect()
    }
    batch = {
        r["doc_id"]: r["near_dup_hint"]
        for r in ingest_dedup_pipeline(
            batch_docs, history_docs, **kwargs
        ).collect()
    }
    assert got == batch == {101: True, 103: False}
    # without embeddings the semantic stage is skipped: 102 survives
    no_emb = {
        r["doc_id"]
        for r in ingest_dedup_pipeline(
            batch_docs.drop("embedding"), history_docs,
            m_bits=1 << 14,
        ).collect()
    }
    assert no_emb == {101, 102, 103}


def test_semantic_ingest_boundary_straddler_needs_probes_2(spark):
    """The paper's recall knob on the ingest path: a history match
    living in the stream vector's SECOND-nearest cell is invisible to
    probes=1 and dropped at probes=2."""
    import math

    from knovexlite_spark.streaming.events import (
        semantic_dedup_stream_against_history,
    )

    cent = [[1.0, 0.0], [0.0, 1.0]]
    # history vector just on the cell-1 side of the 45-degree boundary
    a = [math.cos(math.radians(46)), math.sin(math.radians(46))]
    # stream near-duplicate just on the cell-0 side
    b = [math.cos(math.radians(44)), math.sin(math.radians(44))]
    history = spark.createDataFrame(
        [(0, a)], "vec_id long, embedding array<float>"
    )
    stream = spark.createDataFrame(
        [(10, b), (11, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got1 = sorted(
        r["vec_id"]
        for r in semantic_dedup_stream_against_history(
            stream, history, threshold=0.95, probes=1, centroids=cent
        ).collect()
    )
    got2 = sorted(
        r["vec_id"]
        for r in semantic_dedup_stream_against_history(
            stream, history, threshold=0.95, probes=2, centroids=cent
        ).collect()
    )
    assert got1 == [10, 11]  # probes=1 misses the straddler
    assert got2 == [11]      # probes=2 drops it; the unrelated row survives


def test_semantic_ingest_consistent_with_semantic_dedup_components(spark):
    """Planted-duplicate consistency with the batch SemDeDup operator:
    on a corpus with no stream-internal duplicates, the ingest operator
    drops exactly the stream rows whose semantic_dedup(history+stream)
    component contains a history member."""
    import numpy as np

    from knovexlite_spark.ops.cluster import semantic_dedup
    from knovexlite_spark.streaming.events import (
        semantic_dedup_stream_against_history,
    )

    rng = np.random.default_rng(5)
    # 4 well-separated history anchors (scaled unit axes in 8-dim)
    hist_rows = []
    for i in range(4):
        v = np.zeros(8, dtype=np.float32)
        v[i] = 1.0
        hist_rows.append((i, (v + rng.normal(0, 0.01, 8)).astype(float).tolist()))
    # stream: near-copies of anchors 0 and 2, plus two novel directions
    stream_rows = []
    for sid, src in ((10, 0), (12, 2)):
        v = np.array(hist_rows[src][1]) + rng.normal(0, 0.005, 8)
        stream_rows.append((sid, v.astype(float).tolist()))
    for sid, axis in ((20, 5), (21, 6)):
        v = np.zeros(8)
        v[axis] = 1.0
        stream_rows.append((sid, v.tolist()))
    history = spark.createDataFrame(
        hist_rows, "vec_id long, embedding array<float>"
    )
    stream = spark.createDataFrame(
        stream_rows, "vec_id long, embedding array<float>"
    )
    cent = np.stack(
        [np.array(v, dtype=np.float32) for _, v in hist_rows]
        + [np.eye(8, dtype=np.float32)[5], np.eye(8, dtype=np.float32)[6]]
    )
    got = sorted(
        r["vec_id"]
        for r in semantic_dedup_stream_against_history(
            stream, history, threshold=0.95, probes=2, centroids=cent
        ).collect()
    )
    assert got == [20, 21]
    # cross-check vs batch SemDeDup components over history+stream
    both = history.unionByName(stream)
    comp = {
        r["doc"]: r["component"]
        for r in semantic_dedup(
            both, k=6, threshold=0.95, probes=2, centroids=cent
        ).collect()
    }
    hist_comps = {comp[i] for i, _ in hist_rows}
    want = sorted(
        sid for sid, _ in stream_rows if comp[sid] not in hist_comps
    )
    assert got == want


def test_streaming_quantiles_hold_rank_error_vs_batch(spark, events_batch):
    """Streaming GK quantiles (keyed state = a mergeable summary,
    ops/quantile.py py_gk_* kernels): after the source drains, each
    user's latest p50/p90/p99 lands within the documented rank-error
    budget of the EXACT batch ranks over the full history — while the
    state carried only ~32 points per key across every trigger."""
    from knovexlite_spark.streaming.stateful import running_quantiles

    out = running_quantiles(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_quant")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = spark.sql(
        """
        SELECT user_id, p50, p90, p99 FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY n_seen DESC
            ) AS rn FROM t_quant
        ) WHERE rn = 1
        """
    ).collect()
    assert latest, "no streaming output"
    quant = events_batch.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("qv")
    ).cache()
    by_user = {
        r["user_id"]: sorted(x["qv"] for x in quant.filter(
            F.col("user_id") == r["user_id"]
        ).collect())
        for r in latest
    }
    import math

    for r in latest:
        vals = by_user[r["user_id"]]
        n = len(vals)
        tol = max(3, math.ceil(0.10 * n))
        for frac, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            a = r[col]
            assert a is not None
            # exact rank of the answer (count <= a) vs the target rank
            import bisect

            got_rank = bisect.bisect_right(vals, a)
            target = max(1, math.ceil(frac * n))
            assert abs(got_rank - target) <= tol, (
                f"user {r['user_id']} {col}: rank {got_rank} vs "
                f"{target} (n={n}, tol={tol})"
            )
        # n_seen matches the exact per-key history length
        assert vals, r


def test_streaming_heavy_hitters_hold_brackets_vs_batch(spark, events_batch):
    """Streaming Misra-Gries (keyed state = a counter table of <= m
    items, ops/sketch.py py_mg_* kernels): after the source drains,
    each user's latest table satisfies the FULL-history contract —
    n_seen == exact count, kept brackets cnt <= true <= cnt + err,
    absent items true <= err — with m below the event_type
    vocabulary, so trims and error accounting actually fire."""
    from collections import Counter

    from knovexlite_spark.streaming.stateful import running_heavy_hitters

    out = running_heavy_hitters(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = spark.sql(
        """
        SELECT user_id, n_seen, item, cnt, err FROM (
            SELECT *, MAX(n_seen) OVER (PARTITION BY user_id) AS mx
            FROM t_hh
        ) WHERE n_seen = mx
        """
    ).collect()
    assert latest, "no streaming output"
    truth: dict[int, Counter] = {}
    for r in events_batch.select("user_id", "event_type").collect():
        truth.setdefault(r["user_id"], Counter())[str(r["event_type"])] += 1
    by_user: dict[int, list] = {}
    for r in latest:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(truth)
    any_err_positive = False
    for uid, rows in by_user.items():
        t = truth[uid]
        n = sum(t.values())
        errs = {r["err"] for r in rows}
        assert len(errs) == 1
        err = errs.pop()
        any_err_positive |= err > 0
        assert all(r["n_seen"] == n for r in rows)
        assert len(rows) <= 3  # HH_M
        kept = {r["item"] for r in rows}
        for r in rows:
            assert r["cnt"] <= t[r["item"]] <= r["cnt"] + err, (uid, r)
        for it, c in t.items():
            if it not in kept:
                assert c <= err, (uid, it, c, err)
    assert any_err_positive  # the trim path actually fired


def _roll_batch_twin(spark, events_df):
    """The batch chain the streaming rolling state must reproduce
    bucket-for-bucket: resample -> rolling(frame='range') for the
    integer aggregates ++ gap_fill(None) -> ewma for the float."""
    from knovexlite_spark.ops.timeseries import (
        ewma,
        gap_fill,
        resample,
        rolling,
    )
    from knovexlite_spark.streaming.stateful import (
        ROLL_ALPHA,
        ROLL_STRIDE_US,
        ROLL_WINDOW,
    )

    ev = events_df.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("qv")
    )
    res = resample(
        ev,
        "ts",
        ROLL_STRIDE_US,
        ["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("qv").alias("sv")],
    )
    rolled = rolling(
        res,
        ["user_id"],
        {"n": ["sum", "max", "count"], "sv": ["sum"]},
        ROLL_WINDOW,
        frame="range",
        stride=ROLL_STRIDE_US,
    )
    dense = gap_fill(
        res, ROLL_STRIDE_US, ["user_id"], fill={"n": None, "sv": None}
    )
    ew = ewma(
        dense, ["user_id"], "sv", alpha=ROLL_ALPHA, window=ROLL_WINDOW
    ).select("user_id", "bucket_us", f"sv_ewma{ROLL_WINDOW}")
    w = ROLL_WINDOW
    return rolled.join(ew, ["user_id", "bucket_us"]).select(
        "user_id",
        "bucket_us",
        "n",
        "sv",
        F.col(f"n_sum{w}").alias("n_sum"),
        F.col(f"n_max{w}").alias("n_max"),
        F.col(f"n_count{w}").alias("n_count"),
        F.col(f"sv_sum{w}").alias("sv_sum"),
        F.col(f"sv_ewma{w}").alias("sv_ewma"),
    )


def _roll_latest(spark, table):
    return spark.sql(
        f"""
        SELECT user_id, bucket_us, n, sv, n_sum, n_max, n_count,
               sv_sum, sv_ewma
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, bucket_us ORDER BY trig DESC
            ) AS rn FROM {table}
        ) WHERE rn = 1
        """
    )


def test_streaming_rolling_equals_batch_chain(spark, events_batch):
    """Streaming rolling/EWMA (keyed state = per-bucket resample
    partials): after the source drains, the latest row per (user,
    bucket) equals the batch chain EXACTLY — integer window aggs
    engine-exact, the EWMA bit-exact (same IEEE fold on both sides)."""
    from knovexlite_spark.streaming.stateful import running_rolling

    out = running_rolling(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_roll")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in _roll_latest(spark, "t_roll").collect()
    )
    want = sorted(
        tuple(r) for r in _roll_batch_twin(spark, events_batch).collect()
    )
    assert got, "no streaming output"
    assert got == want


def test_streaming_rolling_late_data_reopens_touched_buckets(spark, tmp_path):
    """Late data across triggers: a third file carries an event into
    an EARLY bucket — the state re-emits that bucket and every later
    bucket within the window span, so the final latest rows still
    equal the batch chain over the full history."""
    import os

    from knovexlite_spark.streaming.stateful import (
        ROLL_STRIDE_US,
        running_rolling,
    )

    s = ROLL_STRIDE_US
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)

    def write(rows):
        spark.createDataFrame(rows, "user_id long, b long, value double").select(
            "user_id",
            F.timestamp_micros(F.col("b") * s + 1).alias("ts"),
            "value",
        ).coalesce(1).write.mode("append").parquet(d)

    write([(1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0)])
    write([(1, 5, 4.0), (2, 0, 7.0)])
    write([(1, 1, 10.0)])  # LATE: lands in bucket 1
    batch = spark.read.parquet(d)
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = running_rolling(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_roll_late")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in _roll_latest(spark, "t_roll_late").collect()
    )
    want = sorted(
        tuple(r) for r in _roll_batch_twin(spark, batch).collect()
    )
    assert got == want
    # the late bucket's final answer really includes the late event
    by_key = {(r[0], r[1]): r for r in got}
    assert by_key[(1, 1 * s)][2] == 2  # n: two events in bucket 1


def test_streaming_rolling_retention_horizon_bounds_state(spark, tmp_path):
    """max_buckets: the production state bound — only the newest N
    observed buckets survive per key; a late arrival below the
    retention horizon is DROPPED (never resurrected as a partial
    bucket), while retained buckets' answers stay exact."""
    import os

    from knovexlite_spark.streaming.stateful import (
        ROLL_STRIDE_US,
        running_rolling,
    )

    s = ROLL_STRIDE_US
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)

    def write(rows):
        spark.createDataFrame(rows, "user_id long, b long, value double").select(
            "user_id",
            F.timestamp_micros(F.col("b") * s + 1).alias("ts"),
            "value",
        ).coalesce(1).write.mode("append").parquet(d)

    write([(1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0), (1, 3, 4.0), (1, 4, 5.0)])
    write([(1, 0, 9.0), (1, 5, 6.0)])  # bucket 0 is BELOW the horizon
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = running_rolling(stream, max_buckets=3)
    q = (
        out.writeStream.format("memory")
        .queryName("t_roll_hor")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM t_roll_hor").collect()
    by_bt = {}
    for r in rows:
        by_bt.setdefault(r["bucket_us"], []).append(r)
    # eviction runs within the trigger BEFORE emission: trigger 1's
    # 5 buckets evict down to {2,3,4} with the horizon at bucket 2,
    # so buckets 0/1 never emit — and the late bucket-0 event in
    # trigger 2 must NOT resurrect bucket 0 as a partial bucket
    assert 0 * s not in by_bt and 1 * s not in by_bt
    # bucket 5's window sees only RETAINED buckets: adding 5 evicts 2
    # (keep 3), so the trailing window is buckets 3,4,5 — the
    # documented trade (size max_buckets >= window + late slack to
    # keep full windows)
    b5 = max(by_bt[5 * s], key=lambda r: r["trig"])
    assert b5["n_sum"] == 3
    assert b5["sv_sum"] == 400 + 500 + 600
    with pytest.raises(ValueError, match="max_buckets"):
        running_rolling(spark.readStream.schema(schema).parquet(d), max_buckets=0)


def test_streaming_distinct_registers_equal_batch_build(spark, events_batch):
    """Streaming HLL distinct (keyed state = <= 2^p registers,
    bucket/rank computed JVM-side by the same hll_bucket_rank
    expressions the batch build uses): after the source drains, each
    user's latest register table equals the batch
    hll_registers(group_col=user_id) build BIT-FOR-BIT, n_seen equals
    the exact non-null item count, and the running estimate lands
    within budget of the exact per-user distinct count."""
    from knovexlite_spark.ops.sketch import hll_registers
    from knovexlite_spark.streaming.stateful import DIST_P, running_distinct

    out = running_distinct(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_dist")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = spark.sql(
        """
        SELECT user_id, n_seen, estimate, bucket, register FROM (
            SELECT *, MAX(n_seen) OVER (PARTITION BY user_id) AS mx
            FROM t_dist
        ) WHERE n_seen = mx
        """
    ).collect()
    assert latest, "no streaming output"
    got = sorted((r["user_id"], r["bucket"], r["register"]) for r in latest)
    want = sorted(
        (r["grp"], r["bucket"], r["register"])
        for r in hll_registers(
            events_batch.select(
                "user_id", F.col("props").cast("string").alias("it")
            ),
            "it",
            p=DIST_P,
            group_col="user_id",
        ).collect()
    )
    assert got == want
    exact = {
        r["user_id"]: (r["n"], r["d"])
        for r in events_batch.filter(F.col("props").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"), F.countDistinct("props").alias("d")
        )
        .collect()
    }
    seen_users = set()
    for r in latest:
        n, d = exact[r["user_id"]]
        assert r["n_seen"] == n, (r["user_id"], r["n_seen"], n)
        assert abs(r["estimate"] - d) <= max(2.0, 0.15 * d), (
            r["user_id"],
            r["estimate"],
            d,
        )
        seen_users.add(r["user_id"])
    assert seen_users == set(exact)


def test_streaming_distinct_multi_trigger_interleaving(spark, tmp_path):
    """Register merge is associative max, so ANY trigger interleaving
    (three files, one per trigger, duplicate items across triggers)
    drains to exactly the batch registers — including a NULL item
    (dropped, COUNT DISTINCT semantics) and a single-item trigger."""
    import os

    from knovexlite_spark.ops.sketch import hll_registers
    from knovexlite_spark.streaming.stateful import DIST_P, running_distinct

    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, props string"
        ).coalesce(1).write.mode("append").parquet(d)

    write([(1, "a"), (1, "b"), (2, "a"), (1, None)])
    write([(1, "b"), (1, "c"), (2, "a")])
    write([(2, "zzz")])
    batch = spark.read.parquet(d)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        running_distinct(stream)
        .writeStream.format("memory")
        .queryName("t_dist_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = spark.sql(
        """
        SELECT user_id, n_seen, bucket, register FROM (
            SELECT *, MAX(n_seen) OVER (PARTITION BY user_id) AS mx
            FROM t_dist_multi
        ) WHERE n_seen = mx
        """
    ).collect()
    got = sorted((r["user_id"], r["bucket"], r["register"]) for r in latest)
    want = sorted(
        (r["grp"], r["bucket"], r["register"])
        for r in hll_registers(
            batch.select("user_id", F.col("props").alias("it")),
            "it",
            p=DIST_P,
            group_col="user_id",
        ).collect()
    )
    assert got == want
    n_seen = {r["user_id"]: r["n_seen"] for r in latest}
    assert n_seen == {1: 4, 2: 3}  # NULL item dropped from n_seen


def test_streaming_profile_all_families_vs_batch(spark, events_batch):
    """The streaming PROFILER twin (running_profile): GK + MG + HLL +
    row count in ONE keyed state.  After drain, per user: n_seen ==
    exact row count, HLL rows == hll_registers(group_col) BIT-FOR-BIT,
    GK brackets hold vs the exact quantized full history (max rmax ==
    the non-null count), MG brackets/coverage hold vs exact item
    counts."""
    import bisect
    from collections import Counter

    from knovexlite_spark.ops.sketch import hll_registers
    from knovexlite_spark.streaming.stateful import (
        PROF_P,
        running_profile,
    )

    out = running_profile(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_profs")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = spark.sql(
        """
        SELECT user_id, n_seen, family, s, x, y, z FROM (
            SELECT *, MAX(n_seen) OVER (PARTITION BY user_id) AS mx
            FROM t_profs
        ) WHERE n_seen = mx
        """
    ).collect()
    assert latest, "no streaming output"
    rows_by_user: dict[int, list] = {}
    for r in latest:
        rows_by_user.setdefault(r["user_id"], []).append(r)
    # exact sides
    n_exact = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows_by_user) == set(n_exact)
    qvals: dict[int, list] = {}
    items: dict[int, Counter] = {}
    for r in events_batch.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("qv"),
        "event_type",
    ).collect():
        if r["qv"] is not None:
            qvals.setdefault(r["user_id"], []).append(r["qv"])
        if r["event_type"] is not None:
            items.setdefault(r["user_id"], Counter())[
                str(r["event_type"])
            ] += 1
    for vs in qvals.values():
        vs.sort()
    want_regs = sorted(
        (r["grp"], r["bucket"], r["register"])
        for r in hll_registers(
            events_batch.select(
                F.col("user_id").alias("g"),
                F.col("props").cast("string").alias("it"),
            ),
            "it",
            p=PROF_P,
            group_col="g",
        ).collect()
    )
    got_regs = sorted(
        (u, r["x"], r["y"])
        for u, rs in rows_by_user.items()
        for r in rs
        if r["family"] == "hll"
    )
    assert got_regs == want_regs and got_regs
    any_trim = False
    for u, rs in rows_by_user.items():
        st = [r for r in rs if r["family"] == "stat"]
        assert len(st) == 1 and st[0]["x"] == n_exact[u]
        vs = qvals.get(u, [])
        gk = [r for r in rs if r["family"] == "gk"]
        if vs:
            assert max(r["z"] for r in gk) == len(vs)
            for r in gk:
                assert r["y"] <= bisect.bisect_right(vs, r["x"])
                assert r["z"] >= bisect.bisect_left(vs, r["x"]) + 1
        mg = [r for r in rs if r["family"] == "mg"]
        cnt = items.get(u, Counter())
        errs = {r["y"] for r in mg}
        assert len(errs) <= 1
        err = errs.pop() if errs else 0
        any_trim = any_trim or err > 0
        kept = set()
        for r in mg:
            kept.add(r["s"])
            assert r["x"] <= cnt[r["s"]] <= r["x"] + err, tuple(r)
        for it, c in cnt.items():
            if it not in kept:
                assert c <= err, (u, it, c, err)
    assert any_trim  # m=3 < vocabulary: trims actually fired
