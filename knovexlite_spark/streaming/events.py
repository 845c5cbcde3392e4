"""Structured Streaming over the events table (SURVEY §2.9 gap surface):
watermarked tumbling / sliding / session windows and a stateful
session-count operator.

Batch/stream parity is the design invariant: every streaming
transformation here has the same semantics as its batch twin (Q18/Q19),
which is what the tests pin (run the stream from a file source, compare
the complete output against the batch aggregation).

Scale notes: watermark + windowed aggregation is incremental state in
the state store, partitioned by group key — the 100 TB shape is
(event-time partitioned source) -> (keyed state) -> (append sink);
nothing here collects unbounded state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch replay of history; in production this is Kafka/files
    arriving).  File streams require a DIRECTORY source, and the events
    table ships in two layouts: a single ``events.parquet`` FILE
    (driver-generated testdata — stream the sf dir filtered to that
    filename) or a Spark-written ``events.parquet/`` DIRECTORY of
    part-files (e.g. the scale-rehearsal blow-up — stream the directory
    itself; a filename glob would match zero part-files and SILENTLY
    yield an empty stream, which is how the round-4 rehearsal caught
    this).

    readStream needs an explicit schema, so take it from the batch
    footer: parquet TIMESTAMP(NANOS) data arrives as an epoch-nanos
    long (session.py nanosAsLong) and is converted here, TIMESTAMP
    (micros) data arrives as a native timestamp — same dual handling
    as the batch loader (datasets.py)."""
    import os

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if os.path.isdir(path):
        raw = reader.parquet(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    if isinstance(schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (with-tz); the session tz is
        # pinned to UTC, so the cast is value-preserving wall-clock
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Q18 streaming twin: watermarked tumbling window counts + sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )
        .select(F.col("w").start.alias("w"), "event_type", "c", F.col("s").cast("string").alias("s"))
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.col("w").start.alias("w"), "event_type", "c")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Q19 streaming twin: native session windows (gap-based) per user —
    the stateful sessionization operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup at ingest — the streaming twin of
    ops/dedup.exact_duplicates: watermarked
    ``dropDuplicatesWithinWatermark`` keeps one row per key and DROPS
    the key's state once the watermark passes its event time.  That
    bound is the 100-TB point: state is O(keys inside the watermark
    horizon), not O(stream length) — a plain ``dropDuplicates`` on an
    unbounded stream holds every key ever seen and OOMs the state
    store.  Duplicates arriving within the horizon (the at-least-once
    redelivery window of any real source) are removed; replays older
    than the horizon are the source's responsibility, as with any
    watermarked operator."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a stream to the in-memory sink until the source drains;
    returns the query handle (results via spark.sql(f"select * from
    {name}"))."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def asof_enrich_stream(
    events: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Streaming twin of ops/asof.asof_join: enrich a STREAM with the
    as-of row of a STATIC dimension-sized table (the market-data shape:
    live trades against a reference quote/metadata table).

    The batch operator's union-sort-carry needs a global per-key sort —
    not expressible on an unbounded stream — so the streaming form uses
    the other classical evaluation: the static right side is collected
    per key, sorted by the ordering column, and BROADCAST (the same
    dimension-sized contract as decontaminate's eval set — this is NOT
    for a fact-sized right side); each micro-batch then binary-searches
    its rows against the key's sorted timestamps inside an
    Arrow-batched ``mapInPandas`` (stateless — streaming-legal in any
    output mode, no watermark required).  Matching semantics are
    IDENTICAL to the batch operator (ties match; backward/forward/
    nearest with backward tie-break; tolerance nulls far matches;
    intra-row NULL payloads preserved) — pinned by a stream-vs-batch
    parity test.

    Late stream rows are still enriched correctly: the right side is
    static, so a row's match depends only on its own event time."""
    import numpy as np
    import pandas as pd

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    bys = list(by)
    payload = [c for c in right.columns if c != on and c not in bys]
    taken = set(events.columns)
    ren: dict[str, str] = {}
    for c in payload:
        name = c
        while name in taken:
            name = name + suffix
        ren[c] = name
        taken.add(name)
    match_col = f"{on}{suffix}"
    if match_col in events.columns or match_col in ren.values():
        raise ValueError(
            f"asof_enrich_stream reserves output column {match_col!r}; "
            f"pass a different suffix="
        )
    rdt = dict(right.dtypes)[on]
    time_typed = rdt.startswith("timestamp") or rdt == "date"

    def _key_ts(vals):
        if time_typed:
            return pd.Series(vals).astype("datetime64[ns]").astype("int64").to_numpy()
        return np.asarray(vals, dtype=np.int64 if "int" in rdt or rdt == "bigint" else np.float64)

    index: dict = {}
    # NULL ordering values never match (batch-operator parity) — and
    # would crash the sort below; drop them at collect time
    rows = (
        right.filter(F.col(on).isNotNull())
        .select(*bys, on, *payload)
        .collect()
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(tuple(r[c] for c in bys), []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r[on])
        ts_arr = _key_ts([r[on] for r in rs])
        pls = [tuple(r[c] for c in payload) for r in rs]
        raw_ts = [r[on] for r in rs]
        index[k] = (ts_arr, pls, raw_ts)
    b_index = events.sparkSession.sparkContext.broadcast(index)

    ev_fields = events.schema.fields
    r_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in ev_fields]
        + [f"{ren[c]} {r_schema[c]}" for c in payload]
        + [f"{match_col} {r_schema[on]}"]
    )
    tol_ns = None
    if tolerance is not None:
        tol_ns = float(tolerance) * (1e9 if time_typed else 1.0)

    def enrich(it):
        idx = b_index.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            keys = list(zip(*[pdf[c] for c in bys])) if bys else [()] * n
            if time_typed:
                lts = pd.Series(pdf[on]).astype("datetime64[ns]").astype("int64").to_numpy()
            else:
                lts = pdf[on].to_numpy()
            # NULL event times match nothing — mask BEFORE the int64
            # view (NaT collapses to int min there, NaN sorts last)
            null_mask = pd.isna(pdf[on]).to_numpy()
            out_p = {c: [None] * n for c in payload}
            out_m = [None] * n
            for i in range(n):
                if null_mask[i]:
                    continue
                ent = idx.get(keys[i])
                if ent is None:
                    continue
                ts_arr, pls, raw_ts = ent
                t = lts[i]
                bi = int(np.searchsorted(ts_arr, t, side="right")) - 1
                fi = int(np.searchsorted(ts_arr, t, side="left"))
                pick = None
                if direction == "backward":
                    pick = bi if bi >= 0 else None
                elif direction == "forward":
                    pick = fi if fi < len(ts_arr) else None
                else:  # nearest, backward tie-break
                    db = t - ts_arr[bi] if bi >= 0 else None
                    df_ = ts_arr[fi] - t if fi < len(ts_arr) else None
                    if db is not None and (df_ is None or db <= df_):
                        pick = bi
                    elif df_ is not None:
                        pick = fi
                if pick is None:
                    continue
                if tol_ns is not None and abs(float(t - ts_arr[pick])) > tol_ns:
                    continue
                for c, v in zip(payload, pls[pick]):
                    out_p[c][i] = v
                out_m[i] = raw_ts[pick]
            res = pdf.copy()
            for c in payload:
                res[ren[c]] = out_p[c]
            res[match_col] = (
                pd.Series(out_m, dtype="datetime64[ns]") if time_typed
                else out_m
            )
            yield res

    return events.mapInPandas(enrich, schema=out_schema)


def dedup_stream_against_history(
    docs: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 7,
    salt: str = "bloom",
) -> DataFrame:
    """Streaming twin of ops/sketch.dedup_against_history: drop
    incoming documents whose content hash already exists in a STATIC
    historical corpus.  Stream-legal by construction:

    - the Bloom filter is built ONCE from static history
      (ops/sketch.bloom_filter — same salt family, so prebuilt batch
      filters and this probe agree) and collected into a dense
      m_bits/64-long array literal (2^20 bits = 16K longs = 128 KB —
      parameter-sized; on a cluster it ships once per executor like
      any broadcast).  The probe is then a PURE MAP: one SQL
      expression tests all k bit positions per row — zero joins, zero
      state, no watermark.
    - bloom POSITIVES are exact-verified by a stream-static LEFT ANTI
      join against the history hash set (append-legal), so the output
      is EXACT: a stream row survives iff its content hash is
      genuinely absent from history.  Cache the static side — Spark
      re-reads it every micro-batch otherwise.

    The negatives bypass the join entirely, so at a healthy
    false-positive rate the per-batch join probe side is ~the true
    duplicates, not the batch."""
    from knovexlite_spark.ops.sketch import bloom_filter

    hist_h = history.select(F.md5(F.col(text_col)).alias("__h"))
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_filter(hist_h, "__h", m_bits, k, salt).collect()
    }
    dense = [words.get(w, 0) for w in range(m_bits // 64)]

    # the k Kirsch-Mitzenmacher positions as ONE SQL predicate — must
    # mirror ops/sketch._bloom_positions exactly (same xxhash64 salts)
    h_sql = f"md5({text_col})"
    h1 = f"pmod(xxhash64('{salt}|1', {h_sql}), {m_bits})"
    h2 = f"(pmod(xxhash64('{salt}|2', {h_sql}), {m_bits - 1}) + 1)"

    def bit_test(i: int) -> str:
        pos = f"pmod({h1} + {i} * {h2}, {m_bits})"
        return (
            f"(shiftright(element_at(__words, CAST({pos} / 64 AS INT) + 1), "
            f"CAST(pmod({pos}, 64) AS INT)) & 1) = 1"
        )

    predicate = " AND ".join(bit_test(i) for i in range(k))
    flagged = docs.withColumn(
        "__words", F.lit(dense).cast("array<long>")
    ).withColumn("__maybe", F.expr(predicate)).drop("__words")
    clean = flagged.filter(~F.col("__maybe")).drop("__maybe")
    candidates = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .withColumn("__h", F.md5(F.col(text_col)))
    )
    survivors = candidates.join(hist_h, "__h", "left_anti").drop("__h")
    return clean.unionByName(survivors)


def ingest_dedup_pipeline(
    docs: DataFrame,
    history_docs: DataFrame,
    history_emb: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    m_bits: int = 1 << 20,
    k_hash: int = 7,
    minhash_index: DataFrame | None = None,
    num_hashes: int = 8,
    band_size: int = 2,
    semantic_kwargs: dict | None = None,
) -> DataFrame:
    """The COMPOSED ingest-dedup story: one stream-legal operator
    chaining all three granularities against a static history —

    1. EXACT (removes): ``dedup_stream_against_history`` — Bloom
       prefilter (pure map) + stream-static anti-join verification;
    2. LEXICAL (flags): MinHash banding of the survivors joined
       stream-static against history's banded signature index —
       near-dup CANDIDATES are surfaced as ``near_dup_hint`` (LSH
       collision with >= 1 history doc), not removed: LSH flags need
       Jaccard verification, and at ingest the honest contract is a
       reviewable hint column (the batch pipeline's verify step runs
       downstream);
    3. SEMANTIC (removes, optional): when the stream carries
       ``vec_col`` and ``history_emb`` is given,
       ``semantic_dedup_stream_against_history`` drops embedding
       near-dups of history.

    Every stage is append-legal with zero streaming state (broadcast
    filter/centroids, stream-static joins only — the LSH flag avoids
    any stream-side explode/groupBy/self-join by carrying the band
    buckets as per-row COLUMNS and running one static LEFT join per
    band against the bucket-unique index, the same chained-join trick
    the semantic probes use), so the composition is too.  Pass
    ``minhash_index`` (banded history signatures from
    minhash_signatures_hof + minhash_band_buckets) to skip rebuilding
    it per call; at 100 TB persist it bucketed by (band, bucket) —
    the broadcast here assumes an index that fits executors."""
    from knovexlite_spark.ops.dedup import (
        minhash_band_buckets,
        minhash_shingle_mins,
        minhash_signatures_hof,
    )
    from knovexlite_spark.ops.text import tokens

    out = dedup_stream_against_history(
        docs, history_docs, text_col=text_col, m_bits=m_bits, k=k_hash
    )
    if minhash_index is None:
        minhash_index = minhash_band_buckets(
            minhash_signatures_hof(
                history_docs.select(
                    F.col(id_col).alias("doc_id"), F.col(text_col)
                ),
                num_hashes=num_hashes,
            ),
            num_hashes=num_hashes,
            band_size=band_size,
        )
    # per-row signature + band-bucket COLUMNS (no explode — the stream
    # side must stay map-only for append mode); the bucket expression
    # mirrors minhash_band_buckets' concat_ws exactly
    out = out.withColumn(
        "__sig", minhash_shingle_mins(
            tokens(F.col(text_col)), num_hashes=num_hashes
        )
    )
    band_ids = list(range(0, num_hashes, band_size))
    for i, band_id in enumerate(band_ids):
        out = out.withColumn(
            f"__bkt{i}",
            F.concat_ws(
                "|",
                *[F.col("__sig")[k] for k in range(band_id, band_id + band_size)],
            ),
        )
    hit_cols = []
    for i, band_id in enumerate(band_ids):
        b_idx = (
            minhash_index.filter(F.col("band") == band_id)
            .select(F.col("bucket").alias(f"__ib{i}"))
            .dropDuplicates([f"__ib{i}"])  # static side: left join stays 1:1
            .withColumn(f"__hit{i}", F.lit(True))
        )
        out = out.join(
            F.broadcast(b_idx),
            F.col(f"__bkt{i}") == F.col(f"__ib{i}"),
            "left",
        ).drop(f"__ib{i}")
        hit_cols.append(f"__hit{i}")
    out = out.withColumn(
        "near_dup_hint",
        F.coalesce(*[F.col(c) for c in hit_cols], F.lit(False)),
    ).drop("__sig", *[f"__bkt{i}" for i in range(len(band_ids))], *hit_cols)
    if history_emb is not None and vec_col in docs.columns:
        out = semantic_dedup_stream_against_history(
            out, history_emb, vec_col=vec_col, id_col=id_col,
            **(semantic_kwargs or {}),
        )
    return out


def semantic_dedup_stream_against_history(
    docs: DataFrame,
    history: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 2,
    max_iter: int = 5,
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """Embedding near-dup at ingest (round-8 ask #5): drop incoming
    vectors whose cosine similarity to ANY vector in a STATIC
    historical corpus reaches ``threshold`` — the SemDeDup analogue of
    ``dedup_stream_against_history``, completing the ingest-dedup
    story (exact: Bloom; lexical: MinHash; semantic: this).

    Stream-legal by construction — zero state, no watermark:

    - centroids come from ``kmeans_fit`` on the static history (or are
      injected via ``centroids=`` — at 100 TB always a sample fit) and
      ride a parameter-sized broadcast inside a SCALAR Arrow UDF that
      emits each vector's ``probes`` nearest cells;
    - history is assigned ONCE to its single nearest cell and cached —
      the per-cell layout is exactly SemDeDup's partition (size k so
      corpus/k fits an executor; at 100 TB persist it bucketed by
      cell);
    - each probe is ONE stream-static LEFT ANTI join: equi on the
      probed cell (hash-joinable — never a nested loop over history)
      with the cosine test as the join residual, evaluated JVM-side
      (``ops.similarity.cosine``, a higher-order fold — no Python in
      the join).  Chaining the ``probes`` anti joins implements "drop
      if ANY probed cell holds a match" without a stateful aggregation,
      so the query stays append-mode.

    ``probes=2`` is the paper's recall knob: a duplicate pair
    straddling a cell boundary is invisible to probes=1 and found when
    the stream vector also probes its second-nearest cell (pinned by
    test).  Zero-norm stream vectors never match (cosine NaN compares
    false), mirroring the batch kernel's guarded normalization.

    Works identically on a BATCH ``docs`` frame (the parity tests run
    the same code both ways).  Returns the surviving ``docs`` rows,
    schema unchanged."""
    from pyspark.sql.functions import pandas_udf

    from knovexlite_spark.ops.cluster import kmeans_fit
    from knovexlite_spark.ops.similarity import cosine

    cent = (
        np.asarray(centroids, dtype=np.float32)
        if centroids is not None
        else kmeans_fit(
            history, k, vec_col=vec_col, id_col=id_col,
            max_iter=max_iter, seed=seed,
        )
    )
    n_probe = max(1, min(int(probes), cent.shape[0]))
    spark = docs.sparkSession
    b_c = spark.sparkContext.broadcast(cent)

    def _probe_udf(p: int):
        @pandas_udf("array<long>")
        def probe_cells(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype=object)
            c = b_c.value
            mat = np.stack(vs.to_numpy()).astype(np.float32)
            d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            near = np.argsort(d, axis=1)[:, :p]
            return pd.Series([row.tolist() for row in near])

        return probe_cells

    hist_cells = (
        history.select(
            F.element_at(_probe_udf(1)(F.col(vec_col)), 1).alias("__cell"),
            F.col(vec_col).alias("__hvec"),
        )
        .persist()
    )

    # materialize the UDF once, then split cells into plain columns so
    # the Arrow kernel runs a single time per row
    out = docs.withColumn("__cells", _probe_udf(n_probe)(F.col(vec_col)))
    out = out.withColumns(
        {f"__cell{i}": F.element_at("__cells", i + 1) for i in range(n_probe)}
    ).drop("__cells")
    thr = float(threshold)
    for i in range(n_probe):
        out = out.join(
            hist_cells,
            (F.col(f"__cell{i}") == F.col("__cell"))
            & (cosine(F.col(vec_col), F.col("__hvec")) >= F.lit(thr)),
            "left_anti",
        )
    return out.drop(*[f"__cell{i}" for i in range(n_probe)])
