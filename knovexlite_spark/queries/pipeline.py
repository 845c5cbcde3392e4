"""Training-data pipeline correctness corpus: dedup / text analysis /
similarity search over the documents and embeddings tables, each checked
against an independent DuckDB formulation.

Hash-stability rules: only integers and strings leave these queries
(ratios become exact integer numerator/denominator pairs; thresholds are
integer-arithmetic comparisons; fingerprints are md5 strings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops import cluster as C
from knovexlite_spark.ops import dedup as D
from knovexlite_spark.ops import similarity as S
from knovexlite_spark.ops import text as T

SELF_UNION_OFFSET = 1_000_000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Engine.for_dir(spark, sf_dir).table("documents")


def _docs_selfunion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus an id-shifted copy — a corpus with guaranteed
    exact/near duplicates for the dedup gates."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(
        d.select((F.col("doc_id") + SELF_UNION_OFFSET).alias("doc_id"), "text")
    )


# --- text analysis --------------------------------------------------------


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def _text_quality_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench member: the quality features alone (the r1-r5 row shape,
    kept round-comparable; the PII tier is timed as its own
    first-class bench row `pii_scrub`)."""
    return T.quality_features(_docs(spark, sf_dir))


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row `pii_scrub`: the PII tier alone on the planted text —
    four regexp_count scans + the chained ordered redaction + redacted
    length (all map-only JVM regex work).  ONE projection (round-15
    optimization, guide §2.4): counts and redacted length are
    independent expressions over the same planted text, so computing
    them in one select removes the former self-join on doc_id — the
    plant was evaluated twice and the join paid the row's only
    Exchange; same columns, same values (text_quality gate re-proven)."""
    planted = _pii_planted(spark, sf_dir)
    t = F.col("ptext")
    from knovexlite_spark.ops.text import PII_PATTERNS

    return planted.select(
        "doc_id",
        *[
            F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
        F.length(T.redact_pii(t)).cast("long").alias("n_redacted_chars"),
    )


def _pii_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII planting: each document prefixed with one
    email / phone / ipv4 / ssn keyed by doc_id, so per-kind counts are
    non-zero and the redacted length varies per doc — DuckDB replays
    the same planting (the patterns live in the Java∩RE2 regex subset
    on purpose; natural text also flows through, pinning
    no-false-positive behavior on real corpus bytes)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call (555) 123-4567 ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 ssn 123-45-6789 "),
            F.col("text"),
        ).alias("ptext"),
    )


def _gopher_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Gopher-rule garnish: the raw corpus is single-line
    and symbol-free, so every ratio rule would sit at 0 — each keyed
    slice plants the signal its rule needs (symbols for the
    symbol-ratio, bullet/ellipsis lines for the line fractions,
    numeric words for the alpha fraction), replayed verbatim in the
    DuckDB oracle."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit(" # marked... section")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.lit(
                    "\n- bullet item one\n• second bullet\ntrailing thoughts…"
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" 123 4567")).otherwise(
                F.lit("")
            ),
        ).alias("gtext"),
    )


def _gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-pack gate columns (round 8): the INTEGER count
    signals (gopher_features(counts=True) — engine-exact, no float
    ratios cross the oracle) plus the REAL gopher_filter keep verdict
    on the planted garnish.  The oracle replays keep via integer
    cross-multiplication (10*n_symbols <= n_words etc.) — exactly
    equivalent to the operator's correctly-rounded double ratios for
    any count below 2^51, since every threshold boundary is either
    exactly representable (3, 10) or farther from any representable
    ratio n/m than half an ulp (0.1, 0.3, 0.8 at realistic m).
    min_stop_hits=1 because the synthetic vocabulary carries only
    'the' from the published list; min_words=50 splits the corpus
    near its median."""
    g = _gopher_planted(spark, sf_dir)
    counts = T.gopher_features(g, text_col="gtext", counts=True).select(
        "doc_id",
        F.col("n_words").alias("g_n_words"),
        F.col("total_chars").alias("g_total_chars"),
        F.col("n_symbols").alias("g_n_symbols"),
        F.col("n_lines").alias("g_n_lines"),
        F.col("n_bullet_lines").alias("g_n_bullet_lines"),
        F.col("n_ellipsis_lines").alias("g_n_ellipsis_lines"),
        F.col("n_alpha_words").alias("g_n_alpha_words"),
        F.col("n_stop_hits").alias("g_n_stop_hits"),
    )
    kept = T.gopher_filter(
        g, text_col="gtext", min_words=50, min_stop_hits=1
    ).select("doc_id", F.lit(1).cast("long").alias("__k"))
    return counts.join(kept, "doc_id", "left").withColumn(
        "g_keep", F.coalesce("__k", F.lit(0).cast("long"))
    ).drop("__k")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features on the raw text PLUS the PII tier (round 6) on
    the planted variant (see _pii_planted) PLUS the Gopher rule-pack
    integer counts and keep verdict (round 8, see _gopher_gate) — one
    gate row pinning all three surfaces against the DuckDB replay."""
    return (
        _text_quality_base(spark, sf_dir)
        .join(_pii_scrub(spark, sf_dir), "doc_id")
        .join(_gopher_gate(spark, sf_dir), "doc_id")
    )


def _lang_id_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r1-r9 marker-heuristic form (also the frozen bench row)."""
    return T.language_id(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union (round 10): 'marker' = the deterministic 7-language
    heuristic over the documents table (the r1-r9 row, byte-identical);
    'lidm' = the TRAINED model path, oracle-verified end-to-end — Spark
    scores the byte-stable fixture test split with the COMMITTED
    integer-quantized weights (knovexlite_spark/resources, regenerated
    by scripts/train_langid_gate.py; training bit-determinism is
    test-pinned) while DuckDB replays feature hashing, exact-integer
    margins, and earliest-class argmax from GENERATED SQL.  Floats
    appear nowhere in the member, so the hash gate is exact."""
    from knovexlite_spark.ops.langid import (
        language_id_quantized,
        multilingual_corpus,
    )
    from knovexlite_spark.resources.langid_gate_weights import (
        QMODEL,
        TEST_DOCS_PER_LANG,
        TEST_ID_OFFSET,
    )

    marker = _lang_id_marker(spark, sf_dir).select(
        F.lit("marker").alias("member"), "doc_id", "lang_pred"
    )
    test = multilingual_corpus(
        spark, docs_per_lang=TEST_DOCS_PER_LANG, id_offset=TEST_ID_OFFSET
    )
    lidm = language_id_quantized(test, QMODEL).select(
        F.lit("lidm").alias("member"), "doc_id", "lang_pred"
    )
    return marker.unionByName(lidm)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = T.min_shingle_fingerprint(_docs(spark, sf_dir))
    roll = _docs(spark, sf_dir).select(
        "doc_id", T.rolling_hash(F.col("text")).alias("fp_roll")
    )
    return fp.join(roll, "doc_id")


# --- dedup ----------------------------------------------------------------


# Planted boilerplate for the substring-dedup gate member: 12 tokens,
# prepended to every 5th document, so the span-frequency pass finds the
# header spans hot (>= fixture-docs/5 occurrences) and cuts exactly the
# header back out — while each doc's own text stays untouched (windows
# crossing the header/body boundary are unique per doc).
SUBSTR_HDR = (
    "terms of service apply to this document please read carefully before use"
)
SUBSTR_SPAN = 8  # tokens per window at the gate (prod default is 50)


def _docs_boiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(SUBSTR_HDR + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _substr_dedup_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: the substring-dedup member alone (span explode +
    combinable frequency groupBy + semi-join + HOF rebuild) at the
    production hash keying."""
    return D.substring_dedup(
        _docs_boiler(spark, sf_dir),
        span_tokens=SUBSTR_SPAN,
        min_count=2,
        key="hash",
    )


def _ngram_ppl_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: train a bigram LM on the documents corpus (one
    combinable n-gram groupBy) and perplexity-score every document
    against it (broadcast model join + per-doc log-prob agg) — the
    CCNet-style quality signal end to end (ops/lm.py)."""
    from knovexlite_spark.ops.lm import score_documents, train_ngram_lm

    d = _docs(spark, sf_dir).select("doc_id", "text")
    lm = train_ngram_lm(d, n=2)
    return score_documents(d, lm, n=2)


def _bm25_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: BM25 top-10 retrieval (ops/retrieval.py) — index
    build (explode + combinable groupBys) + broadcast query-term
    scoring join + per-query window top-k, end to end.  Queries are
    the first 8 tokens of the 5 smallest doc_ids (deterministic,
    guaranteed hits)."""
    from knovexlite_spark.ops.retrieval import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", "text")
    queries = (
        d.orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(F.split(F.trim("text"), r"\s+"), 1, 8), " "
            ).alias("text"),
        )
    )
    return bm25_topk(d, queries, k=10)


def _rrf_fuse_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: hybrid retrieval — reciprocal-rank fusion
    (ops/retrieval.rrf_fuse) of the BM25 lexical candidates (the
    `bm25_topk` fixture: first-8-token queries of the 5 smallest docs)
    with the dense ANN candidates for the SAME query ids (vec_id and
    doc_id share the corpus id space, so query 0..4 retrieves against
    both indexes).  End to end: both candidate generators + the
    candidate-sized fusion groupBy + per-query re-rank window."""
    from knovexlite_spark.ops.retrieval import rrf_fuse

    lexical = _bm25_bench(spark, sf_dir).select("query_id", "doc_id", "rn")
    dense = _ann_brute(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rn"
    )
    return rrf_fuse([lexical, dense], k=60, out_k=10)


def _semantic_dedup_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: the production SemDeDup path end to end
    (ops/cluster.semantic_dedup) on the halved-copy embedding plant —
    kmeans_fit (3 Lloyd iterations: Arrow argmin kernel + combinable
    per-dim groupBy per iteration), per-cell tiled-GEMM pair search,
    pointer-jumping closure + canonical survivor."""
    from knovexlite_spark.ops.cluster import semantic_dedup

    return semantic_dedup(
        _emb_semsrc(spark, sf_dir), k=8, threshold=0.95, max_iter=3
    )


def _domain_cap_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row for cap_per_domain (round-7 ask #7).  The documents
    corpus carries no URLs, so the fixture injects a deterministic URL
    per even doc (37 synthetic domains, ~doc_count/74 docs each) and
    caps at 20 docs/domain — exercising the extract -> domain ->
    hash-rank window path with real evictions; odd docs stay URL-free
    and pass through uncapped."""
    from knovexlite_spark.ops.sample import cap_per_domain

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("http://site"),
                (F.col("doc_id") % 37).cast("string"),
                F.lit(".example.com/p "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return cap_per_domain(d, max_docs=20)


def _clf_score_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: the funnel's clf_score stage shape (ops/classifier.py)
    — 3 full-batch logistic-GD epochs (ONE Spark job each) on an
    every-100th-doc positive slice vs a disjoint equal-rate negative
    slice, then ONE broadcast-model scoring pass over the full corpus.
    Training runs eagerly inside the callable (driver-looped epochs,
    parameter-sized collects); the returned frame is the corpus-sized
    scoring pass, so the timed noop save covers train + score end to
    end — the same envelope the curation funnel reports."""
    from knovexlite_spark.ops.classifier import (
        classify,
        train_quality_classifier,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    pos = d.filter(F.col("doc_id") % 100 == 0)
    neg = d.filter(F.col("doc_id") % 100 == 50)
    w, bias = train_quality_classifier(pos, neg, n_buckets=1 << 14, epochs=3)
    return classify(d, w, bias)


def _c4_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic C4-rule fixture: the raw corpus is one unpunctuated
    line per doc (every C4 rule would fire the same way on every doc),
    so each keyed line plants one rule's trigger — a terminal-punct body
    line carrying the doc's own text, a 'javascript' line, a too-short
    line, a no-terminal-punct line (terminal only on every 3rd doc, so
    the sentence-count doc rule splits the corpus), and kept-but-
    poisoned '{{'/'lorem ipsum' lines on the %13 / %17 slices so the
    DOCUMENT-level drops fire on rewritten text that passed the line
    cut.  concat_ws skips the NULL slices in both engines."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(" one.")),
            F.lit("filler javascript content sits on this line."),
            F.lit("tiny line."),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("an extra closing sentence with several words included."),
            ).otherwise(
                F.lit("an extra trailing clause lacking punctuation")
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit("curly brace { appears within this sentence clearly."),
            ),
            F.when(
                F.col("doc_id") % 17 == 0,
                F.lit("we certainly love lorem ipsum placeholder text today."),
            ),
        ).alias("text"),
    )


def _pagerank_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench row: 5 synchronous PageRank power steps over the bridge
    KG edge set (ops/graph.pagerank) — the iterative join-aggregate-
    rejoin loop, ONE job per step, node-sized rank frame moving
    against a reusable edge partitioning."""
    from knovexlite_spark.ops.graph import pagerank

    engine = Engine.for_dir(spark, sf_dir)
    return pagerank(engine.triples.select("h", "t"), iterations=5)


# --- raw-crawl ingest gate (round 9) ---------------------------------------
#
# Every constant below is shared by the Spark-side archive builder AND
# the oracle-SQL f-string, so the byte accounting can't drift.
_WARC_HTML_PRE = "<html><body><h1>Doc "
_WARC_HTML_MID = "</h1><p>"
_WARC_HTML_POST = "</p></body></html>"
_WARC_ENV_200 = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    "Content-Length: "
)
_WARC_ENV_404 = (
    "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n"
    "Content-Length: 4\r\n\r\n"
)
_WARC_SLICE_MOD = 7  # documents slice: doc_id % 7 == 0


def _warc_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-bytes crawl ingest through the gate (two tagged members of
    the dedup_exact row — the driver records at most 50 rows, so new
    coverage rides existing unions): the ENTIRE WARC -> records ->
    HTTP strip -> charset decode -> html_to_text chain (ops/warc.py +
    ops/text.py) value-checked at the oracle — previously each stage
    was pytest-verified but no gate row ran the chain from archive
    bytes (round-8 verdict ask #5).

    The archive is synthesized IN-QUERY from the documents table (the
    multimodal_features pattern): each sliced doc's text is wrapped in
    deterministic HTML, an HTTP/1.1 envelope (charset=utf-8 declared),
    and an ISO 28500 response record, prefixed by a warcinfo record
    and suffixed by a 404 response — so the warc-type filter AND the
    status filter are both load-bearing (a leak changes row counts).
    Even doc_ids ship as per-record gzip MEMBERS (the Common-Crawl
    layout, mtime=0 for byte-stable replays), odd as plain .warc, so
    both container paths run on gate data.

    Members (dedup_exact schema member/content_hash/canonical_id/
    n_docs):

    - 'warc': the full-chain product — canonical_id recovered from
      the record's target URI, content_hash = md5 of the extracted
      text (html_to_text of the decoded body), n_docs = its length.
      DuckDB replays by applying the GENERATED html_to_text chain
      (ops/text.html_to_text_duckdb_sql — same pattern tables as the
      operator) to the same HTML built with string concatenation.  A
      slip anywhere — record framing, Content-Length, envelope split,
      charset decode, entity order — breaks the hash.
    - 'hdr': parse-level integer accounting per RESPONSE record
      (status 200 AND 404): content_hash = the parsed HTTP status,
      n_docs = payload_len (envelope + body BYTES, which DuckDB
      recomputes as fixed-prefix + digits(octet_length) +
      octet_length)."""
    from knovexlite_spark.ops.warc import parse_warc_records, warc_to_documents

    src = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull() & (F.col("doc_id") % _WARC_SLICE_MOD == 0))
        .select("doc_id", "text")
    )

    pre, mid, post = _WARC_HTML_PRE, _WARC_HTML_MID, _WARC_HTML_POST
    env200, env404 = _WARC_ENV_200, _WARC_ENV_404

    def build(it):
        import gzip

        import pandas as pd

        from knovexlite_spark.ops.warc import warc_record

        for pdf in it:
            paths, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                html = f"{pre}{did}{mid}{text}{post}".encode()
                recs = [
                    warc_record(
                        "warcinfo", None, b"software: synth\r\n", f"info-{did}"
                    ),
                    warc_record(
                        "response",
                        f"http://synth.test/{did}",
                        f"{env200}{len(html)}\r\n\r\n".encode() + html,
                        f"resp-{did}",
                    ),
                    warc_record(
                        "response",
                        f"http://synth.test/404/{did}",
                        env404.encode() + b"gone",
                        f"miss-{did}",
                    ),
                ]
                if did % 2 == 0:
                    paths.append(f"synth/{did}.warc.gz")
                    blobs.append(
                        b"".join(gzip.compress(r, mtime=0) for r in recs)
                    )
                else:
                    paths.append(f"synth/{did}.warc")
                    blobs.append(b"".join(recs))
            yield pd.DataFrame({"path": paths, "content": blobs})

    files = src.mapInPandas(build, "path string, content binary")

    hdr = (
        parse_warc_records(files)
        .filter(F.col("warc_type") == "response")
        .select(
            F.lit("hdr").alias("member"),
            F.col("http_status").cast("string").alias("content_hash"),
            # sign-preserving: a negative doc_id must round-trip the
            # URI exactly, not flip positive (ADVICE r9)
            F.regexp_extract("target_uri", r"(-?\d+)$", 1)
            .cast("long")
            .alias("canonical_id"),
            F.col("payload_len").cast("long").alias("n_docs"),
        )
    )
    warc_m = warc_to_documents(files).select(
        F.regexp_extract("url", r"(-?\d+)$", 1).cast("long").alias("canonical_id"),
        T.html_to_text(F.col("text")).alias("out"),
    ).select(
        F.lit("warc").alias("member"),
        F.md5("out").alias("content_hash"),
        "canonical_id",
        F.length("out").cast("long").alias("n_docs"),
    )
    return warc_m.unionByName(hdr)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup gate row, SEVEN tagged members since round 9:

    - 'doc': content-hash doc-level dedup on the self-union corpus
      (the r1-r6 row) — (content_hash, canonical_id=min id, n_docs).
    - 'substr': SUBSTRING-level repeated-span removal (round-7 ask #3,
      ops/dedup.py substring_dedup) on documents with a planted
      boilerplate header in every 5th doc.  Column reuse across the
      union: content_hash = md5 of the REBUILT text plus the MERGED
      maximal-span count (round 8: 'clean_text|n_spans' — the 12-token
      header seen through 8-token windows must collapse to ONE segment,
      value-checking the variable-length merge as well as the whole
      tokenize->hot-span->cut->rejoin pipeline), canonical_id = doc_id,
      n_docs = tokens removed.  key='string' so DuckDB replays the
      spans exactly (no hash family).
    - 'c4': the C4 cleanup rule pack (round 8, ops/text.c4_clean) on
      the planted fixture (_c4_planted) — line cut (terminal punct,
      >= 5 words, no 'javascript') then document cut (>= 2 sentences,
      no brace, no 'lorem ipsum') as a text REWRITE.  content_hash =
      md5 of the rewritten text, canonical_id = doc_id, n_docs = its
      length; only survivors emit rows, so the document-level drops
      are value-checked by row membership and the line-level cuts by
      the hash.
    - 'para'/'nfc': round 8 — see the inline comments below.
    - 'warc'/'hdr' (round 9): the raw-bytes WARC->documents->text
      ingest chain, end-to-end at the oracle — see _warc_members."""
    doc = D.exact_duplicates(_docs_selfunion(spark, sf_dir)).select(
        F.lit("doc").alias("member"),
        "content_hash",
        "canonical_id",
        "n_docs",
    )
    sub = D.substring_dedup(
        _docs_boiler(spark, sf_dir),
        span_tokens=SUBSTR_SPAN,
        min_count=2,
        key="string",
    ).select(
        F.lit("substr").alias("member"),
        F.md5(
            F.concat_ws("|", "clean_text", F.col("n_spans").cast("string"))
        ).alias("content_hash"),
        F.col("doc_id").alias("canonical_id"),
        F.col("n_removed").alias("n_docs"),
    )
    c4 = T.c4_clean(_c4_planted(spark, sf_dir), min_sentences=2).select(
        F.lit("c4").alias("member"),
        F.md5("text").alias("content_hash"),
        F.col("doc_id").alias("canonical_id"),
        F.length("text").cast("long").alias("n_docs"),
    )
    # 'para' member (round 8): PARAGRAPH-level dedup (ops/dedup.py
    # paragraph_dedup, the CCNet granularity) on a planted multi-
    # paragraph fixture — a corpus-wide boilerplate paragraph on every
    # 3rd doc, a second one on every 4th, and a within-doc self-repeat
    # on every 5th; content_hash = md5 of the rebuilt text (canonical
    # copy = min (doc, position), value-checked per doc), n_docs =
    # paragraphs removed.
    pdocs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("subscribe to our newsletter for updates today"),
            ),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("copyright notice all rights reserved"),
            ),
            F.when(F.col("doc_id") % 5 == 0, F.col("text")),
        ).alias("text"),
    )
    para = D.paragraph_dedup(pdocs).select(
        F.lit("para").alias("member"),
        F.md5("clean_text").alias("content_hash"),
        F.col("doc_id").alias("canonical_id"),
        F.col("n_removed").alias("n_docs"),
    )
    # 'nfc' member (round 8): unicode canonicalization (ops/text.py
    # normalize_text — Arrow-batched unicodedata NFC + control strip +
    # whitespace collapse) on text garnished with a decomposed
    # combining sequence (e + U+0301), a compatibility point (U+212B
    # angstrom -> U+00C5), a control byte and a tab; DuckDB replays
    # the normalization with nfc_normalize (same UAX#15 algorithm),
    # so the rewritten text hashes byte-for-byte.
    nfc_garnish = " cafe\u0301 \u212B x\x01y\tz"  # decomposed e+acute, angstrom sign
    nfc_src = _docs(spark, sf_dir).select(
        "doc_id", F.concat(F.col("text"), F.lit(nfc_garnish)).alias("text")
    )
    nfc = T.normalize_text(nfc_src).select(
        F.lit("nfc").alias("member"),
        F.md5("text").alias("content_hash"),
        F.col("doc_id").alias("canonical_id"),
        F.length("text").cast("long").alias("n_docs"),
    )
    return (
        doc.unionByName(sub)
        .unionByName(c4)
        .unionByName(para)
        .unionByName(nfc)
        .unionByName(_warc_members(spark, sf_dir))
    )


BASE_DUP_MOD = 10  # baseline-density fixture: every 10th doc duplicated


def _docs_basedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-DENSITY dedup fixture (round-6 ask #1): documents plus
    an id-shifted copy of every ``BASE_DUP_MOD``-th document — ~10%
    duplicate density, the shape of a real crawl corpus, as opposed to
    the adversarial 100%-density self-union.  On this fixture the
    library-default candidate-doc restriction actually restricts."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(
        d.filter(F.col("doc_id") % BASE_DUP_MOD == 0).select(
            (F.col("doc_id") + SELF_UNION_OFFSET).alias("doc_id"), "text"
        )
    )


def _minhash_selfu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member 'selfu': MinHash-LSH on the 100%-density self-union
    corpus — the adversarial fixture (every doc is in >= 1 candidate
    pair).  restrict_verify=False ON THIS FIXTURE ONLY: the restriction
    filters nothing here and its extra stages cost ~1 s (measured
    2.8 -> 3.6 s).  The 'base' member below measures the shipped
    default (restriction ON) at baseline density; the round-6
    full-pipeline A/B of the restriction itself is in SCALE.md —
    its verify saving is structural (output-scale vs corpus-scale)
    but its fixed overhead dominates at 10-20% candidate share on
    short-document corpora.

    Shingle-projection note: inside minhash_near_duplicates the shingle
    projection is computed TWICE (signatures on raw shingles — min is
    duplicate-insensitive — and distinct sets for verification).
    Measured A/B at sf0.1 (3 cold runs each): double-parse ~5.8-6.9s;
    .cache()-shared shingles ~6.6-8.2s; eager distinct cache ~9s.  The
    cache loses because it breaks the parse->partial-agg whole-stage-
    codegen fusion and pays an InMemoryRelation materialization."""
    out = D.minhash_near_duplicates(
        _docs_selfunion(spark, sf_dir),
        threshold=0.8,
        restrict_verify=False,
        raw_counts=True,
    )
    return out.select("doc_a", "doc_b", "inter", F.col("union").alias("un"))


def _minhash_base_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member 'base': the SHIPPED DEFAULT path (restrict_verify=True —
    the asymmetric-risk default; the adaptive "auto" mode was built,
    measured, and deliberately NOT made default — see SCALE.md) on the
    baseline-density fixture.  This is the number a user gets; bench
    row `dedup_minhash_default` times it first-class."""
    out = D.minhash_near_duplicates(
        _docs_basedup(spark, sf_dir), threshold=0.8, raw_counts=True
    )
    return out.select("doc_a", "doc_b", "inter", F.col("union").alias("un"))


def _minhash_base_default_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench member: the default path with the xxhash64 signature
    family — the PRODUCTION hash (one salted JVM hash per signature
    slot vs two md5 calls per shingle) that the gate cannot use
    because DuckDB must replay the family.  Timed as a member of
    `dedup_minhash_default` so the artifact carries both the
    oracle-replayable and the production family cost."""
    out = D.minhash_near_duplicates(
        _docs_basedup(spark, sf_dir),
        threshold=0.8,
        raw_counts=True,
        family="xxhash64",
    )
    return out.select("doc_a", "doc_b", "inter", F.col("union").alias("un"))


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup, TWO tagged members sharing one gate row
    (driver 50-row cap):

    - 'selfu': adversarial 100%-density self-union corpus, restriction
      off (the configuration where restriction cannot help),
    - 'base': the library-default path (restriction ON) at ~10%
      baseline duplicate density — the configuration a user runs.

    Both emit the verified candidate set with exact integer
    (inter, union) at jaccard >= 4/5 decided by integer arithmetic
    (raw_counts=True); the DuckDB oracle replays the full LSH chain on
    each corpus (the restriction is plan-only — it cannot change the
    verified output, which the oracle equality proves)."""
    selfu = _minhash_selfu(spark, sf_dir).select(
        F.lit("selfu").alias("member"), "doc_a", "doc_b", "inter", "un"
    )
    base = _minhash_base_default(spark, sf_dir).select(
        F.lit("base").alias("member"), "doc_a", "doc_b", "inter", "un"
    )
    return selfu.unionByName(base)


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench member: stage 1 of q_dedup_minhash only (shingle explode +
    single-pass signature aggregation)."""
    return D.minhash_signatures(_docs_selfunion(spark, sf_dir))


def _minhash_cand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench member: stages 1-2 of q_dedup_minhash (signatures + banded
    LSH candidate join, before exact Jaccard verification)."""
    return D.minhash_lsh_candidates(_minhash_sigs(spark, sf_dir))


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs (threshold 1/2) on a bounded slice —
    the quadratic exactness baseline the sub-quadratic paths verify
    against — PLUS the transitive closure of those pairs (round 5):

    - member 'pair': (doc_a, doc_b, inter, un) as before,
    - member 'cluster': (doc, component, size, -1) — near-dup pairs
      closed into connected components (ops/graph.py hash-to-min with
      pointer jumping; ops/dedup.py near_dup_clusters), component =
      min doc id = the canonical survivor, singletons included.  The
      DuckDB oracle replays the closure with a recursive CTE, so the
      iterative DataFrame loop is value-checked end to end."""
    docs = _docs_selfunion(spark, sf_dir).filter(
        (F.col("doc_id") % SELF_UNION_OFFSET) < 50
    )
    sh = D.shingle_sets(docs, "text", "doc_id", 3)
    a = sh.withColumnsRenamed({"doc": "doc_a"})
    b = sh.withColumnsRenamed({"doc": "doc_b"})
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    jac = D.jaccard_for_pairs(pairs, sh)
    near = jac.filter(F.col("inter") * 2 >= F.col("union")).select(
        "doc_a", "doc_b", "inter", F.col("union").alias("un")
    )
    pair_rows = near.select(
        F.lit("pair").alias("member"),
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.col("inter").cast("long"),
        F.col("un").cast("long"),
    )
    clusters = D.near_dup_clusters(docs, near.select("doc_a", "doc_b"), "doc_id")
    cluster_rows = clusters.select(
        F.lit("cluster").alias("member"),
        F.col("doc").cast("long").alias("doc_a"),
        F.col("component").cast("long").alias("doc_b"),
        F.col("size").cast("long").alias("inter"),
        F.lit(-1).cast("long").alias("un"),
    )
    # 'decon' member (round 8): FUZZY benchmark decontamination
    # (ops/dedup.decontaminate min_overlap_frac) — eval set = the
    # first 24 tokens of every 50th document (guaranteed containment
    # in its source doc, overlap 1.0; cross-doc 8-gram collisions are
    # corpus-determined and replayed identically), threshold 0.5.
    # Column reuse: doc_a = train doc, doc_b = eval id, inter = shared
    # distinct 8-grams, un = floor(overlap_frac * 1e6) — the ratio as
    # an engine-exact integer (identical correctly-rounded double
    # division + floor in both engines).
    ev = _docs(spark, sf_dir).filter(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.array_join(
            F.slice(T.tokens(F.col("text")), 1, 24), " "
        ).alias("text"),
    )
    dec = D.decontaminate(
        _docs(spark, sf_dir).select("doc_id", "text"),
        ev,
        n=8,
        min_hits=1,
        min_overlap_frac=0.5,
    )
    decon_rows = dec.select(
        F.lit("decon").alias("member"),
        F.col("doc_id").cast("long").alias("doc_a"),
        F.col("eval_id").cast("long").alias("doc_b"),
        F.col("hits").cast("long").alias("inter"),
        F.floor(F.col("overlap_frac") * 1000000).cast("long").alias("un"),
    )
    return pair_rows.unionByName(cluster_rows).unionByName(decon_rows)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup on the self-union corpus.  Oracle-backed: the
    md5-hex -> 60-bit int -> ±1 per-bit sums -> sign pack -> pigeonhole
    banding chain is pure integer arithmetic, replayed verbatim in
    DuckDB (CAST('0x'||hex AS BIGINT) == Spark's conv(hex,16,10)).

    Runs the KERNEL fingerprint path (one mapInPandas pass per doc, no
    x60 bit explode — the production form at scale); it is bit-for-bit
    equal to the expression form the DuckDB oracle replays (pinned by
    test_dedup_ops).  A/B at sf0.1, 3 fresh processes each: expr
    5.27/5.07/4.88s, kernel 4.23/4.11/5.42s (~15% median win, growing
    with corpus size as the explode amplification dominates)."""
    return D.simhash_near_duplicates(
        _docs_selfunion(spark, sf_dir), max_hamming=3, fingerprints="kernel"
    ).select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


# --- graph functionals ------------------------------------------------------


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 at the gate, a tagged union since round 8:

    - 'bfs': BFS layers from the pinned customer over the bridge KG —
      the iterative Pregel-style DataFrame loop, checked against a
      recursive-CTE shortest-layer formulation in DuckDB.
    - 'pr2': EXACT-INTEGER PageRank (ops/graph.pagerank_scaled, the
      kmeans_exact pattern) after 2 power steps over the same edge
      set — every step floor divisions at scale 10^12, replayed as
      unrolled CTEs, so the iterative join-aggregate-rejoin loop is
      value-checked bit-for-bit (the float `pagerank` twin is pinned
      to it and to a Python reference in tests/test_graph_ops.py)."""
    from knovexlite_spark.ops.graph import bfs_layers, pagerank_scaled
    from knovexlite_spark.queries.efo import _pinned_constants

    engine = Engine.for_dir(spark, sf_dir)
    s1 = _pinned_constants(engine)["s1"]
    seeds = spark.createDataFrame([(int(s1),)], "node long")
    out = bfs_layers(seeds, engine.triples.select("h", "t"), max_depth=3)
    bfs = out.select(
        F.lit("bfs").alias("member"),
        "node",
        F.col("layer").cast("long").alias("value"),
    )
    pr2 = pagerank_scaled(
        engine.triples.select("h", "t"), iterations=2
    ).select(
        F.lit("pr2").alias("member"),
        "node",
        F.col("pr").alias("value"),
    )
    return bfs.unionByName(pr2)


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew mitigation at the gate: the two-phase salted aggregation
    (ops/skew.py — the shape AQE cannot split) must equal a plain
    GROUP BY.  Decomposable aggs only; the sum runs on a decimal cast
    so both engines combine exactly."""
    from knovexlite_spark.ops.skew import salted_agg

    li = (
        Engine.for_dir(spark, sf_dir)
        .table("lineitem")
        .withColumn("qty_dec", F.col("l_quantity").cast("decimal(18,2)"))
    )
    out = salted_agg(
        li,
        ["l_suppkey"],
        [("*", "count"), ("qty_dec", "sum"), ("l_extendedprice", "max")],
    )
    return out.select(
        "l_suppkey",
        F.col("count_all").cast("long").alias("count_all"),
        F.col("sum_qty_dec").cast("string").alias("sum_qty"),
        # hash-stability rule: no raw doubles leave a gate query
        F.col("max_l_extendedprice").cast("decimal(18,2)").cast("string").alias("max_price"),
    )


def q_graph_topo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 at the gate: Kahn frontier-elimination layers over the bridge
    KG (a DAG: cust -> order -> part/supp -> nation).  A node's Kahn
    round equals its longest path from any source, which the DuckDB
    mirror computes as MAX(walk depth) in a recursive CTE."""
    from knovexlite_spark.ops.graph import topological_order

    engine = Engine.for_dir(spark, sf_dir)
    edges = engine.triples.select("h", "t")
    nodes = edges.select(F.col("h").alias("node")).unionByName(
        edges.select(F.col("t").alias("node"))
    ).distinct()
    out = topological_order(nodes, edges)
    return out.select("node", F.col("topo_layer").cast("long").alias("topo_layer"))


# --- similarity -----------------------------------------------------------


def _ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Engine.for_dir(spark, sf_dir).table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "rn"
    )


def _lexical_overlap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-rankable lexical candidate list for the RRF gate member:
    per query (= the first 8 distinct tokens of docs 0-4, the id space
    the dense list's vec_id < 5 queries share), rank documents by
    DISTINCT-query-term overlap count, doc_id tie-break, top 10.
    Deliberately integer-ordered (the BM25 float scores would make the
    cross-engine ordering replay depend on ln(); BM25 itself is gated
    by exact integer index-stat replays + 1e-9 Python parity in
    tests/test_retrieval.py)."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("doc_id", "text")
    qterms = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.array_distinct(F.slice(T.tokens(F.col("text")), 1, 8))
        ).alias("term"),
    )
    dterms = d.select(
        "doc_id",
        F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("term"),
    )
    ov = (
        dterms.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("ov"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ov").desc(), F.col("doc_id")
    )
    return (
        ov.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
        .select("query_id", "doc_id", "rn")
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k AND the IVF full-probe path in ONE
    tagged gate row (the 50-row driver cap — the slot freed by this
    merge carries lmpnn_exactcheck).  Both members must equal the same
    exact-top-k oracle: brute force by construction, IVF because
    n_probe == n_cells degenerates to an exhaustive partitioned scan.

    Round-8 members 'rrf' / 'rrfs': hybrid retrieval fusion
    (ops/retrieval.rrf_fuse) of the lexical overlap list
    (_lexical_overlap_topk) with the dense brute list over the SAME
    query ids 0-4 — neighbor_id = fused doc, rn = fused_rank ('rrf')
    and rn = rrf_scaled ('rrfs', the exact-integer-division score sum),
    so both the fused ORDERING and the fused SCORE replay in DuckDB."""
    brute = _ann_brute(spark, sf_dir).select(
        F.lit("brute").alias("kind"), "query_id", "neighbor_id", "rn"
    )
    ivf = _ann_ivf_full(spark, sf_dir).select(
        F.lit("ivf_full").alias("kind"), "query_id", "neighbor_id", "rn"
    )
    from knovexlite_spark.ops.retrieval import rrf_fuse

    lex = _lexical_overlap_topk(spark, sf_dir)
    dense = _ann_brute(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rn"
    )
    fused = rrf_fuse([lex, dense], k=60)
    rrf = fused.select(
        F.lit("rrf").alias("kind"),
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.col("fused_rank").alias("rn"),
    )
    rrfs = fused.select(
        F.lit("rrfs").alias("kind"),
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.col("rrf_scaled").alias("rn"),
    )
    return brute.unionAll(ivf).unionAll(rrf).unionAll(rrfs)


def _ann_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF path with n_probe == n_cells: must equal brute force exactly.
    (Partial-probe recall is pinned by unit tests AND the ann_ivf_probe
    gate; this member pins the probe/rerank machinery.)"""
    import numpy as np
    from pyspark.sql import Window

    emb = Engine.for_dir(spark, sf_dir).table("embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < 5).orderBy("vec_id").select("vec_id", "embedding").collect()
    )
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    cent = S.sample_centroids(emb, n_cells=8)
    topk = S.ivf_topk(emb, qmat, cent, n_probe=8, k=11)
    # query ids are positional == vec_id here; drop self-matches, re-rank
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        topk.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.col("rn").cast("long").alias("rn"))
    )


IVF_CELLS = 8


def _clustered_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically cluster-separated corpus DERIVED from the
    embeddings table: +10.0 at dimension (vec_id % 8).  Intra-cluster
    cosine ~0.98, inter-cluster ~0.0, so true top-k neighbors live in
    the query's own cell with a wide margin — partial-probe IVF recall
    is exactly 1.0, deterministically, and SQL can replay the shift."""
    emb = Engine.for_dir(spark, sf_dir).table("embeddings")
    cell = (F.col("vec_id") % IVF_CELLS).cast("int")
    return emb.select(
        "vec_id",
        (F.col("vec_id") % IVF_CELLS).cast("long").alias("cell"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i == cell, F.lit(10.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )


def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe(2) < n_cells(8) under the exact oracle: the
    pruning path actually skips 6/8 of the corpus per query and must
    still equal brute force (guaranteed by the cluster-separated
    construction above).  Centroids are the exact per-cell means,
    computed distributedly (posexplode + groupBy avg); only the
    [n_cells x dim] matrix is collected."""
    import numpy as np

    shifted = _clustered_embeddings(spark, sf_dir).cache()
    cent_rows = (
        shifted.select("cell", F.posexplode("embedding"))
        .groupBy("cell", "pos")
        .agg(F.avg("col").alias("v"))
        .collect()
    )
    dim = max(r["pos"] for r in cent_rows) + 1
    cent = np.zeros((IVF_CELLS, dim), dtype=np.float32)
    for r in cent_rows:
        cent[r["cell"], r["pos"]] = r["v"]

    qrows = (
        shifted.filter(F.col("vec_id") < 5).orderBy("vec_id").select("embedding").collect()
    )
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in qrows])
    # the cache only amortizes the two driver collects above; release it
    # before returning so repeated gate runs don't pin InMemoryRelations
    # (the returned plan recomputes the cheap projection on execution)
    shifted.unpersist()

    from pyspark.sql import Window

    topk = S.ivf_topk(shifted.select("vec_id", "embedding"), qmat, cent, n_probe=2, k=11)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        topk.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", F.col("rn").cast("long").alias("rn"))
    )


def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4 — the synthetic
    vectors are near-orthogonal, SURVEY brief) via EXACT tiled block
    GEMM (ops/similarity.blocked_near_pairs).  The 6x rehearsal showed
    banded LSH is the wrong tool at this adversarial threshold (its
    candidate volume beats brute force's flop count; see the operator
    docstrings for the math) — the exact tiling materializes no
    sub-threshold pair and needs no recall argument at all.  The brute
    crossJoin formulation survives solely as the DuckDB oracle;
    lsh_near_pairs remains the >= 0.9-regime operator with its own
    recall-pinned tests.

    Round 7 tagged members (ops/cluster.py), schema (member, a, b, v):
    - 'brute': the pairs above, v = 0.
    - 'kmeans': integer-exact distributed k-means assignments
      (kmeans_exact: floor(x*2^10) BIGINT vectors, centroids carried
      as (sum, count) so means never materialize as floats, cost = ONE
      correctly-rounded double division of exact integers — the Lloyd
      unroll is ENGINE-INDEPENDENT, so the oracle's SQL replay matches
      hash-for-hash with no tolerance machinery).  a = vec_id,
      b = cell, k=4, 2 update passes, init = the 4 smallest vec_ids.
    - 'sem': SemDeDup pair search (semantic_pairs_exact) over the
      planted-halved-copies corpus — within-cell EQUI-join, pair
      survives iff 25 dot^2 >= 16 |a|^2 |b|^2 over the quantized
      vectors (cos >= 4/5 decided exactly, the raw_counts trick).
      a/b = doc pair, v = integer dot."""
    emb = Engine.for_dir(spark, sf_dir).table("embeddings")
    brute = S.blocked_near_pairs(emb, threshold=0.4).select(
        F.lit("brute").alias("member"),
        F.col("a"),
        F.col("b"),
        F.lit(0).cast("long").alias("v"),
    )
    assign = C.kmeans_exact(emb, k=KMEANS_K, iters=KMEANS_ITERS, dim=EMB_DIM).select(
        F.lit("kmeans").alias("member"),
        F.col("vec_id").alias("a"),
        F.col("cell").alias("b"),
        F.lit(0).cast("long").alias("v"),
    )
    sem = C.semantic_pairs_exact(
        _emb_semsrc(spark, sf_dir),
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        threshold_num=4,
        threshold_den=5,
    ).select(
        F.lit("sem").alias("member"),
        F.col("doc_a").alias("a"),
        F.col("doc_b").alias("b"),
        F.col("dot").alias("v"),
    )
    return brute.unionByName(assign).unionByName(sem)


# --- embedding clustering (ops/cluster.py) --------------------------------

EMB_DIM = 64
KMEANS_K = 4
KMEANS_ITERS = 2


def _emb_semsrc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus exactly-halved copies of every 7th vector —
    scaled copies have cosine 1, the semantic-duplicate plant.  The
    halving runs in double and casts back to float (exact in both
    engines: a float32 halves to a representable float32)."""
    emb = Engine.for_dir(spark, sf_dir).table("embeddings").select(
        "vec_id", "embedding"
    )
    dup = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + SELF_UNION_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") / F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    return emb.unionByName(dup)


def _kmeans_exact_sql(src: str, k: int, iters: int, dim: int, scale: int) -> str:
    """The kmeans_exact unroll as DuckDB CTEs ending in assignment
    a{iters}(vec_id, xq, cell).  Every intermediate is exact integer
    arithmetic (DuckDB widens SUM to HUGEINT — same values); the only
    float is the final cost division, correctly rounded identically in
    any IEEE engine."""
    rng = f"range(1, {dim + 1})"

    def assign(name: str, cents: str) -> str:
        return f"""
        {name} AS (
            SELECT vec_id, xq, cell FROM (
                SELECT q.vec_id, q.xq, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           CAST(list_sum(list_transform({rng},
                               i -> (q.xq[i] * c.n - c.s[i])
                                    * (q.xq[i] * c.n - c.s[i]))) AS DOUBLE)
                           / (c.n * c.n), c.cell) AS rn
                FROM q CROSS JOIN {cents} c)
            WHERE rn = 1
        )"""

    parts = [
        f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS xq
            FROM {src}
        ),
        c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
                   xq AS s, CAST(1 AS BIGINT) AS n
            FROM q QUALIFY row_number() OVER (ORDER BY vec_id) <= {k}
        ),"""
        + assign("a0", "c0")
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
        u{t} AS (
            SELECT a.cell, r.i, SUM(a.xq[r.i]) AS si, COUNT(*) AS cnt
            FROM a{t - 1} a CROSS JOIN {rng} r(i)
            GROUP BY 1, 2
        ),
        cu{t} AS (
            SELECT cell, list(si ORDER BY i) AS s,
                   CAST(any_value(cnt) AS BIGINT) AS n
            FROM u{t} GROUP BY cell
        ),
        c{t} AS (
            SELECT p.cell, coalesce(u.s, p.s) AS s, coalesce(u.n, p.n) AS n
            FROM c{t - 1} p LEFT JOIN cu{t} u USING (cell)
        ),"""
            + assign(f"a{t}", f"c{t}")
        )
    return "".join(parts)


_EMB_SEMSRC_SQL = f"""(
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {SELF_UNION_OFFSET},
           list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / 2 AS FLOAT))
    FROM embeddings WHERE vec_id % 7 = 0
)"""


# --- DuckDB oracles -------------------------------------------------------

_SHINGLES_SQL = """
    WITH toks AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\\s+') AS l
        FROM {src}
    ),
    idx AS (
        SELECT doc, l, unnest(generate_series(1, len(l) - 2)) AS i FROM toks
        WHERE len(l) >= 3
    ),
    shingles AS (
        SELECT DISTINCT doc, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
        FROM idx
    )
"""

_SELFU = f"""(SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + {SELF_UNION_OFFSET}, text FROM documents)"""

_BASEDUP = f"""(SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + {SELF_UNION_OFFSET}, text FROM documents
    WHERE doc_id % {BASE_DUP_MOD} = 0)"""


def _minhash_lsh_sql(src: str) -> str:
    """The full MinHash-LSH chain as one DuckDB query over ``src``:
    shingles -> sliced-md5 signatures (ops/dedup.py minhash_hash_exprs:
    hashes 0-3 = 8-hex slices of md5(shingle), 4-7 of md5('x|' ||
    shingle)) -> 4 bands of 2 -> candidate bucket join -> exact Jaccard
    with the 4/5 threshold decided in integer arithmetic.  Shared by
    both tagged members of the dedup_minhash gate row."""
    return (
        _SHINGLES_SQL.format(src=src)
        + """
        , sigs AS (
            SELECT doc,
                   MIN(substring(md5(shingle), 1, 8))  AS mh0,
                   MIN(substring(md5(shingle), 9, 8))  AS mh1,
                   MIN(substring(md5(shingle), 17, 8)) AS mh2,
                   MIN(substring(md5(shingle), 25, 8)) AS mh3,
                   MIN(substring(md5('x|' || shingle), 1, 8))  AS mh4,
                   MIN(substring(md5('x|' || shingle), 9, 8))  AS mh5,
                   MIN(substring(md5('x|' || shingle), 17, 8)) AS mh6,
                   MIN(substring(md5('x|' || shingle), 25, 8)) AS mh7
            FROM shingles GROUP BY doc
        ),
        buckets AS (
            SELECT doc, 0 AS band, mh0 || '|' || mh1 AS bucket FROM sigs
            UNION ALL SELECT doc, 2, mh2 || '|' || mh3 FROM sigs
            UNION ALL SELECT doc, 4, mh4 || '|' || mh5 FROM sigs
            UNION ALL SELECT doc, 6, mh6 || '|' || mh7 FROM sigs
        ),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
        ),
        sizes AS (SELECT doc, COUNT(*) AS sz FROM shingles GROUP BY doc),
        inter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
            FROM cand c
            JOIN shingles sa ON sa.doc = c.doc_a
            JOIN shingles sb ON sb.doc = c.doc_b AND sb.shingle = sa.shingle
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT c.doc_a, c.doc_b,
               CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
               CAST(za.sz + zb.sz - COALESCE(i.inter, 0) AS BIGINT) AS un
        FROM cand c
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes za ON za.doc = c.doc_a
        JOIN sizes zb ON zb.doc = c.doc_b
        WHERE COALESCE(i.inter, 0) * 5 >= (za.sz + zb.sz - COALESCE(i.inter, 0)) * 4
    """
    )

_LANG_HITS = {
    lang: "len(regexp_extract_all(text, '\\b(" + "|".join(words) + ")\\b'))"
    for lang, words in T.LANG_MARKERS.items()
}


def _lidm_oracle_sql() -> str:
    """The 'lidm' member replay: generated from the committed quantized
    weights and the same byte-stable fixture texts the Spark side
    scores (ops/langid.langid_gate_duckdb_sql)."""
    from knovexlite_spark.ops.langid import (
        langid_gate_duckdb_sql,
        multilingual_rows,
    )
    from knovexlite_spark.resources.langid_gate_weights import (
        QMODEL,
        TEST_DOCS_PER_LANG,
        TEST_ID_OFFSET,
    )

    return langid_gate_duckdb_sql(
        QMODEL, multilingual_rows(TEST_DOCS_PER_LANG, id_offset=TEST_ID_OFFSET)
    )


_LIDM_ORACLE_SQL = _lidm_oracle_sql()

# exact cosine top-10 for the 5 query vectors; both tagged members of
# the merged ann_topk row (brute force, IVF at full probe) must equal it
_ANN_EXACT_TOPK = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5
    ),
    s AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.qe, e.embedding) AS c
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
        FROM s
    ) WHERE rn <= 10
"""

# the warc/hdr members' ingest-chain replay: HTML rebuilt by string
# concatenation from the SAME shared constants the Spark-side archive
# builder uses, extraction via the GENERATED html_to_text chain,
# payload_len by byte accounting (fixed envelope prefix + decimal
# digits of the body's octet_length + separator + body bytes)
_WARC_SRC_SQL = f"""(
    SELECT doc_id,
           '{_WARC_HTML_PRE}' || CAST(doc_id AS VARCHAR) ||
           '{_WARC_HTML_MID}' || text || '{_WARC_HTML_POST}' AS html
    FROM documents
    WHERE text IS NOT NULL AND doc_id % {_WARC_SLICE_MOD} = 0
)"""

_WARC_MEMBERS_SQL = f"""
    SELECT 'warc', md5(x), doc_id, CAST(length(x) AS BIGINT)
    FROM (
        SELECT doc_id, {T.html_to_text_duckdb_sql("html")} AS x
        FROM {_WARC_SRC_SQL} s
    )
    UNION ALL
    SELECT 'hdr', '200', doc_id,
           CAST({len(_WARC_ENV_200)}
                + length(CAST(octet_length(encode(html)) AS VARCHAR))
                + 4 + octet_length(encode(html)) AS BIGINT)
    FROM {_WARC_SRC_SQL} s
    UNION ALL
    SELECT 'hdr', '404', doc_id, CAST({len(_WARC_ENV_404) + 4} AS BIGINT)
    FROM {_WARC_SRC_SQL} s
"""

ORACLES: dict[str, str] = {
    "ann_topk": f"""
        SELECT 'brute' AS kind, * FROM ({_ANN_EXACT_TOPK}) b
        UNION ALL
        SELECT 'ivf_full' AS kind, * FROM ({_ANN_EXACT_TOPK}) i
        UNION ALL
        -- 'rrf'/'rrfs' members: reciprocal-rank fusion of the lexical
        -- overlap list (distinct-term intersection count, doc_id
        -- tie-break, top 10, queries = first 8 distinct tokens of
        -- docs 0-4) with the dense exact top-k; rrf_scaled = sum of
        -- 1e9 // (60 + rn) per list (exact integer division), fused
        -- rank ordered by (rrf_scaled DESC, doc_id)
        SELECT r.kind, r.query_id, r.doc_id AS neighbor_id, r.rn FROM (
          WITH lex AS (
            SELECT query_id, doc_id, CAST(rn AS BIGINT) AS rn FROM (
              SELECT ov.query_id, ov.doc_id,
                     ROW_NUMBER() OVER (
                         PARTITION BY ov.query_id
                         ORDER BY ov.ov DESC, ov.doc_id) AS rn
              FROM (
                SELECT q.query_id, t.doc_id, COUNT(*) AS ov
                FROM (
                  SELECT query_id, unnest(list_distinct(l[1:8])) AS term
                  FROM (
                    SELECT doc_id AS query_id,
                           string_split_regex(trim(text), '\\s+') AS l
                    FROM documents WHERE doc_id < 5
                  )
                ) q
                JOIN (
                  SELECT doc_id, unnest(list_distinct(
                      string_split_regex(trim(text), '\\s+'))) AS term
                  FROM documents
                ) t USING (term)
                GROUP BY q.query_id, t.doc_id
              ) ov
            ) WHERE rn <= 10
          ),
          dense AS (
            SELECT query_id, neighbor_id AS doc_id, rn
            FROM ({_ANN_EXACT_TOPK})
          ),
          u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
          f AS (
            SELECT query_id, doc_id,
                   SUM(1000000000 // (60 + rn)) AS rrf_scaled
            FROM u GROUP BY query_id, doc_id
          ),
          ranked AS (
            SELECT query_id, doc_id, rrf_scaled,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY rrf_scaled DESC, doc_id) AS fused_rank
            FROM f
          )
          SELECT 'rrf' AS kind, query_id, doc_id,
                 CAST(fused_rank AS BIGINT) AS rn FROM ranked
          UNION ALL
          SELECT 'rrfs', query_id, doc_id,
                 CAST(rrf_scaled AS BIGINT) FROM ranked
        ) r
    """,
    "graph_bfs": """
        WITH RECURSIVE triples(h, t) AS (
            SELECT o_custkey, 1000000 + o_orderkey FROM orders
            UNION ALL
            SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem
            UNION ALL
            SELECT 1000000 + l_orderkey, 3000000 + l_suppkey FROM lineitem
            UNION ALL
            SELECT 3000000 + s_suppkey, 4000000 + s_nationkey FROM supplier
            UNION ALL
            SELECT c_custkey, 4000000 + c_nationkey FROM customer
        ),
        walk(node, layer) AS (
            SELECT CAST((SELECT MIN(c_custkey) FROM customer) AS BIGINT), 0
            UNION ALL
            SELECT CAST(t.t AS BIGINT), w.layer + 1
            FROM walk w JOIN triples t ON t.h = w.node
            WHERE w.layer < 3
        ),
        -- 'pr2': two unrolled steps of exact-integer PageRank at
        -- scale 10^12 over the same edge set — floor divisions only
        -- (pr div outdeg per edge; (15*scale) div 100 + 85*sum div
        -- 100 per node), bit-identical to pagerank_scaled
        -- NOTE: inside a WITH RECURSIVE scope a bare anchor-UNION-step
        -- shape is parsed as a recursive CTE (measured: it returned
        -- UNION ALL cardinality here) — spell the dedup explicitly
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT h AS node FROM triples
                UNION ALL SELECT t FROM triples
            )
        ),
        outdeg AS (SELECT h, COUNT(*) AS deg FROM triples GROUP BY h),
        p0 AS (
            SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM nodes
        ),
        c1 AS (
            SELECT t.t AS node, SUM(p.pr // o.deg) AS s
            FROM triples t
            JOIN p0 p ON p.node = t.h JOIN outdeg o ON o.h = t.h
            GROUP BY t.t
        ),
        p1 AS (
            SELECT n.node,
                   150000000000 + (85 * coalesce(c.s, 0)) // 100 AS pr
            FROM nodes n LEFT JOIN c1 c ON c.node = n.node
        ),
        c2 AS (
            SELECT t.t AS node, SUM(p.pr // o.deg) AS s
            FROM triples t
            JOIN p1 p ON p.node = t.h JOIN outdeg o ON o.h = t.h
            GROUP BY t.t
        ),
        p2 AS (
            SELECT n.node,
                   150000000000 + (85 * coalesce(c.s, 0)) // 100 AS pr
            FROM nodes n LEFT JOIN c2 c ON c.node = n.node
        )
        SELECT 'bfs' AS member, node, CAST(MIN(layer) AS BIGINT) AS value
        FROM walk GROUP BY node
        UNION ALL
        SELECT 'pr2', CAST(node AS BIGINT), CAST(pr AS BIGINT) FROM p2
    """,

    "skew_salted_agg": """
        SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS count_all,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS sum_qty,
               CAST(CAST(MAX(l_extendedprice) AS DECIMAL(18,2)) AS STRING) AS max_price
        FROM lineitem GROUP BY l_suppkey
    """,
    "graph_topo": """
        WITH RECURSIVE triples(h, t) AS (
            SELECT o_custkey, 1000000 + o_orderkey FROM orders
            UNION ALL
            SELECT 1000000 + l_orderkey, 2000000 + l_partkey FROM lineitem
            UNION ALL
            SELECT 1000000 + l_orderkey, 3000000 + l_suppkey FROM lineitem
            UNION ALL
            SELECT 3000000 + s_suppkey, 4000000 + s_nationkey FROM supplier
            UNION ALL
            SELECT c_custkey, 4000000 + c_nationkey FROM customer
        ),
        nodes(node) AS (
            SELECT DISTINCT h FROM triples UNION SELECT DISTINCT t FROM triples
        ),
        sources AS (
            SELECT node FROM nodes
            WHERE node NOT IN (SELECT t FROM triples)
        ),
        walk(node, layer) AS (
            SELECT CAST(node AS BIGINT), 0 FROM sources
            UNION ALL
            SELECT CAST(e.t AS BIGINT), w.layer + 1
            FROM walk w JOIN triples e ON e.h = w.node
            WHERE w.layer < 6
        )
        SELECT node, CAST(MAX(layer) AS BIGINT) AS topo_layer
        FROM walk GROUP BY node
    """,
    "text_tokens": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text,
                   '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+'))
                   AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": r"""
        WITH planted AS (
            SELECT doc_id, text,
                   'user' || CAST(doc_id AS VARCHAR)
                   || '@example.com call (555) 123-4567 ip 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR)
                   || '.1 ssn 123-45-6789 ' || text AS ptext
            FROM documents
        ),
        -- Gopher garnish: replay of _gopher_planted verbatim
        gplant AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' # marked... section' ELSE '' END
                   || CASE WHEN doc_id % 6 = 0
                           THEN chr(10) || '- bullet item one' || chr(10)
                                || '• second bullet' || chr(10)
                                || 'trailing thoughts…' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN ' 123 4567' ELSE '' END
                       AS gtext
            FROM documents
        ),
        gwords AS (
            SELECT doc_id, gtext,
                   list_filter(string_split(
                       trim(regexp_replace(gtext, '\s+', ' ', 'g')), ' '),
                       w -> w <> '') AS words,
                   list_filter(string_split(gtext, chr(10)),
                       x -> length(trim(x)) > 0) AS lines
            FROM gplant
        ),
        gcounts AS (
            SELECT doc_id,
                   CAST(len(words) AS BIGINT) AS g_n_words,
                   CAST(coalesce(list_sum(
                       list_transform(words, w -> length(w))), 0)
                       AS BIGINT) AS g_total_chars,
                   CAST(len(regexp_extract_all(gtext, '#'))
                        + len(regexp_extract_all(gtext, '\.\.\.|…'))
                        AS BIGINT) AS g_n_symbols,
                   CAST(len(lines) AS BIGINT) AS g_n_lines,
                   CAST(len(list_filter(lines,
                       x -> regexp_matches(trim(x), '^[-*•‣▪]')))
                       AS BIGINT) AS g_n_bullet_lines,
                   CAST(len(list_filter(lines,
                       x -> regexp_matches(trim(x), '(\.\.\.|…)$')))
                       AS BIGINT) AS g_n_ellipsis_lines,
                   CAST(len(list_filter(words,
                       x -> regexp_matches(x, '[a-zA-Z]')))
                       AS BIGINT) AS g_n_alpha_words,
                   CAST(len(list_intersect(
                       list_transform(words, w -> lower(w)),
                       ['the','be','to','of','and','that','have','with']))
                       AS BIGINT) AS g_n_stop_hits
            FROM gwords
        ),
        -- keep via integer cross-multiplication: exactly the
        -- operator's double-ratio thresholds (min_words=50,
        -- min_stop_hits=1; boundaries 3/10 exactly representable,
        -- 0.1/0.3/0.8 farther from any realistic n/m than half an ulp)
        gkeep AS (
            SELECT doc_id,
                   CAST(CASE WHEN g_n_words >= 50 AND g_n_words <= 100000
                        AND g_total_chars >= 3 * g_n_words
                        AND g_total_chars <= 10 * g_n_words
                        AND 10 * g_n_symbols <= g_n_words
                        AND 10 * g_n_bullet_lines <= g_n_lines
                        AND 10 * g_n_ellipsis_lines <= 3 * g_n_lines
                        AND 5 * g_n_alpha_words >= 4 * g_n_words
                        AND g_n_stop_hits >= 1
                        THEN 1 ELSE 0 END AS BIGINT) AS g_keep
            FROM gcounts
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
               CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a)\b')) AS BIGINT) AS n_stopwords,
               CAST(len(regexp_extract_all(ptext, '{email}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(ptext, '{ssn}')) AS BIGINT) AS n_ssn,
               CAST(len(regexp_extract_all(ptext, '{ipv4}')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(ptext, '{phone}')) AS BIGINT) AS n_phone,
               CAST(length(
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       ptext,
                       '{email}', '[EMAIL]', 'g'),
                       '{ssn}', '[SSN]', 'g'),
                       '{ipv4}', '[IPV4]', 'g'),
                       '{phone}', '[PHONE]', 'g')
               ) AS BIGINT) AS n_redacted_chars,
               gc.g_n_words, gc.g_total_chars, gc.g_n_symbols,
               gc.g_n_lines, gc.g_n_bullet_lines, gc.g_n_ellipsis_lines,
               gc.g_n_alpha_words, gc.g_n_stop_hits, gk.g_keep
        FROM planted
        JOIN gcounts gc USING (doc_id)
        JOIN gkeep gk USING (doc_id)
    """.format(**{k: p for k, p in T.PII_PATTERNS}),
    # 'marker' = the generated heuristic replay (r1-r9 form); 'lidm' =
    # the trained-model replay, generated by langid_gate_duckdb_sql
    # from the committed integer weights + the byte-stable test texts
    "lang_id": "\n".join(
        [
            "SELECT 'marker' AS member, doc_id, lang_pred FROM (",
            "WITH hits AS (SELECT doc_id,",
            ",\n".join(
                f"  {_LANG_HITS[lang]} AS h_{lang}"
                for lang in T.LANG_MARKERS
            ),
            "FROM documents)",
            "SELECT doc_id, CASE",
            "  WHEN " + " + ".join(f"h_{l}" for l in T.LANG_MARKERS)
            + " = 0 THEN 'und'",
            # earliest-wins argmax: language i wins when >= every LATER
            # language (generated from the SAME dict the Spark operator
            # reads, so adding a language updates both engines at once)
            *[
                "  WHEN "
                + " AND ".join(
                    f"h_{l} >= h_{m}"
                    for m in list(T.LANG_MARKERS)[i + 1 :]
                )
                + f" THEN '{l}'"
                for i, l in enumerate(list(T.LANG_MARKERS)[:-1])
            ],
            f"  ELSE '{list(T.LANG_MARKERS)[-1]}'",
            "END AS lang_pred FROM hits",
            ") UNION ALL",
            "SELECT 'lidm', doc_id, lang_pred FROM (",
            _LIDM_ORACLE_SQL,
            ")",
        ]
    ),
    "doc_fingerprint": _SHINGLES_SQL.format(src="documents")
    + """
        , mdfp AS (
            SELECT doc AS doc_id, MIN(md5(shingle)) AS fp_min,
                   MAX(md5(shingle)) AS fp_max
            FROM shingles GROUP BY doc
        )
        SELECT m.doc_id, m.fp_min, m.fp_max,
               CAST(CASE WHEN length(d.text) = 0 THEN 0 ELSE
                   list_reduce(
                       list_transform(string_split_regex(d.text, ''),
                                      c -> CAST(ord(c) AS BIGINT)),
                       (acc, x) -> (acc * 257 + x) % 1000000007)
               END AS BIGINT) AS fp_roll
        FROM mdfp m JOIN documents d ON d.doc_id = m.doc_id
    """,
    "dedup_exact": f"""
        SELECT 'doc' AS member, md5(text) AS content_hash,
               MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM {_SELFU} AS d(doc_id, text)
        GROUP BY md5(text)
        UNION ALL
        -- 'substr' member: exact replay of substring_dedup (span
        -- windows -> corpus frequency -> covered-token removal ->
        -- rejoin) with string span keys; hash of the rebuilt text
        -- PLUS the merged maximal-span count (round 8: segments break
        -- exactly where a sorted start exceeds predecessor + L, since
        -- every merge sets the segment end to start + L) + removed-
        -- token count per doc
        SELECT 'substr', md5(clean_text || '|' || CAST(n_spans AS VARCHAR)),
               doc_id, CAST(n_removed AS BIGINT)
        FROM (
          WITH base AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(
                       CASE WHEN doc_id % 5 = 0
                            THEN '{SUBSTR_HDR} ' || text ELSE text END,
                       '\\s+', ' ', 'g')), ' ') AS t
            FROM documents
          ),
          wins AS (
            SELECT doc_id, s AS start,
                   array_to_string(t[s+1 : s+{SUBSTR_SPAN}], ' ') AS k
            FROM base, unnest(generate_series(0, len(t) - {SUBSTR_SPAN})) AS g(s)
            WHERE len(t) >= {SUBSTR_SPAN}
          ),
          hot AS (SELECT k FROM wins GROUP BY k HAVING COUNT(*) >= 2),
          rem AS (
            SELECT doc_id, list_sort(list(DISTINCT start)) AS rs
            FROM wins JOIN hot USING (k) GROUP BY doc_id
          ),
          rebuilt AS (
            SELECT b.doc_id, b.t,
                   [b.t[i+1] FOR i IN range(0, len(b.t))
                    IF len(list_filter(coalesce(r.rs, []),
                           s -> s <= i AND i < s + {SUBSTR_SPAN})) = 0] AS kept,
                   CASE WHEN r.rs IS NULL THEN 0
                        ELSE 1 + len([j FOR j IN range(1, len(r.rs))
                                      IF r.rs[j+1] > r.rs[j] + {SUBSTR_SPAN}])
                   END AS n_spans
            FROM base b LEFT JOIN rem r USING (doc_id)
          )
          -- DuckDB's array_to_string([]) is NULL, Spark's array_join
          -- is '' — normalize fully-removed docs to ''
          SELECT doc_id,
                 CASE WHEN kept IS NOT NULL
                      THEN coalesce(array_to_string(kept, ' '), '') END
                     AS clean_text,
                 len(t) - len(kept) AS n_removed,
                 n_spans
          FROM rebuilt
        )
        UNION ALL
        -- 'c4' member: exact replay of c4_clean on the planted fixture
        -- (_c4_planted): line cut = terminal punct AND >= 5 words AND
        -- no 'javascript'; doc cut on the REWRITTEN text = >= 2
        -- sentences, no brace, no 'lorem ipsum'
        SELECT 'c4', md5(ctext2), doc_id, CAST(length(ctext2) AS BIGINT)
        FROM (
          WITH cplant AS (
            SELECT doc_id, concat_ws(chr(10),
                text || ' one.',
                'filler javascript content sits on this line.',
                'tiny line.',
                CASE WHEN doc_id % 3 = 0
                     THEN 'an extra closing sentence with several words included.'
                     ELSE 'an extra trailing clause lacking punctuation' END,
                CASE WHEN doc_id % 13 = 0
                     THEN 'curly brace {{ appears within this sentence clearly.' END,
                CASE WHEN doc_id % 17 = 0
                     THEN 'we certainly love lorem ipsum placeholder text today.' END
            ) AS ctext FROM documents
          ),
          ckept AS (
            SELECT doc_id,
                   list_filter(string_split(ctext, chr(10)),
                       x -> regexp_matches(trim(x), '[.!?"]$')
                            AND len(list_filter(
                                string_split_regex(trim(x), '\\s+'),
                                w -> w <> '')) >= 5
                            AND NOT contains(lower(x), 'javascript')) AS kept
            FROM cplant
          )
          SELECT doc_id,
                 coalesce(array_to_string(kept, chr(10)), '') AS ctext2
          FROM ckept
        )
        WHERE len(regexp_extract_all(ctext2, '[.!?]')) >= 2
          AND NOT contains(ctext2, '{{')
          AND NOT contains(lower(ctext2), 'lorem ipsum')
        UNION ALL
        -- 'para' member: paragraph_dedup replay — canonical copy of
        -- each exact paragraph = min (doc_id, position), short/blank
        -- fragments pass through unhashed, docs rebuilt in order
        SELECT 'para', md5(coalesce(ct, '')), doc_id,
               CAST(np - coalesce(nk, 0) AS BIGINT)
        FROM (
          WITH pplant AS (
            SELECT doc_id, concat_ws(chr(10) || chr(10), text,
                CASE WHEN doc_id % 3 = 0
                     THEN 'subscribe to our newsletter for updates today' END,
                CASE WHEN doc_id % 4 = 0
                     THEN 'copyright notice all rights reserved' END,
                CASE WHEN doc_id % 5 = 0 THEN text END) AS ptxt
            FROM documents
          ),
          paras AS (
            SELECT doc_id, ps[i] AS para, i - 1 AS idx
            FROM (
              SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i
              FROM (
                SELECT doc_id,
                       string_split(ptxt, chr(10) || chr(10)) AS ps
                FROM pplant
              )
            )
          ),
          canon AS (
            SELECT h, doc_id AS ci, idx AS cx FROM (
              SELECT md5(para) AS h, doc_id, idx,
                     ROW_NUMBER() OVER (
                         PARTITION BY md5(para)
                         ORDER BY doc_id, idx) AS rn
              FROM paras WHERE length(trim(para)) >= 1
            ) WHERE rn = 1
          ),
          kept AS (
            SELECT p.doc_id, p.idx, p.para
            FROM paras p LEFT JOIN canon c ON md5(p.para) = c.h
            WHERE length(trim(p.para)) < 1
               OR (c.ci = p.doc_id AND c.cx = p.idx)
          ),
          rebuilt AS (
            SELECT doc_id,
                   string_agg(para, chr(10) || chr(10) ORDER BY idx) AS ct,
                   COUNT(*) AS nk
            FROM kept GROUP BY doc_id
          ),
          tot AS (SELECT doc_id, COUNT(*) AS np FROM paras GROUP BY doc_id)
          SELECT t.doc_id, r.ct, r.nk, t.np
          FROM tot t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
        )
        UNION ALL
        -- 'nfc' member: normalize_text replay — nfc_normalize (same
        -- UAX#15 algorithm as Python's unicodedata), control strip
        -- BEFORE the whitespace collapse (\\x0B/\\x0C are Java-regex
        -- whitespace but not RE2 whitespace), trim; garnish = the
        -- decomposed e+U+0301, U+212B, a control byte, a tab
        SELECT 'nfc', md5(ntext), doc_id, CAST(length(ntext) AS BIGINT)
        FROM (
          SELECT doc_id, trim(regexp_replace(
              regexp_replace(
                nfc_normalize(text || ' cafe' || chr(769) || ' '
                              || chr(8491) || ' x' || chr(1) || 'y'
                              || chr(9) || 'z'),
                '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
              '\\s+', ' ', 'g')) AS ntext
          FROM documents
        )
        UNION ALL
        -- 'warc'/'hdr' members (round 9): raw-bytes ingest replay,
        -- see _WARC_MEMBERS_SQL above
        {_WARC_MEMBERS_SQL}
    """,
    # both tagged members replay the IDENTICAL LSH chain, only the
    # corpus differs; the Spark side's restrict_verify difference is
    # plan-only, which the oracle equality proves
    "dedup_minhash": f"""
        SELECT 'selfu' AS member, *
        FROM ({_minhash_lsh_sql(_SELFU + " AS d(doc_id, text)")}) s
        UNION ALL
        SELECT 'base' AS member, *
        FROM ({_minhash_lsh_sql(_BASEDUP + " AS d(doc_id, text)")}) b
    """,
    # WITH -> WITH RECURSIVE: the cluster member's closure CTE below
    # needs it, and DuckDB accepts non-recursive CTEs under RECURSIVE
    "dedup_ngram": _SHINGLES_SQL.format(
        src=f"(SELECT doc_id, text FROM {_SELFU} AS d(doc_id, text) "
        f"WHERE doc_id % {SELF_UNION_OFFSET} < 50) AS dd(doc_id, text)"
    ).replace("WITH toks", "WITH RECURSIVE toks", 1)
    + r"""
        , pairs AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc < b.doc
        ),
        sizes AS (SELECT doc, COUNT(*) AS sz FROM shingles GROUP BY doc),
        inter AS (
            SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
            FROM pairs p
            JOIN shingles sa ON sa.doc = p.doc_a
            JOIN shingles sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
            GROUP BY p.doc_a, p.doc_b
        )
        , near AS (
            SELECT p.doc_a, p.doc_b, CAST(i.inter AS BIGINT) AS inter,
                   CAST(za.sz + zb.sz - i.inter AS BIGINT) AS un
            FROM pairs p
            JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
            JOIN sizes za ON za.doc = p.doc_a
            JOIN sizes zb ON zb.doc = p.doc_b
            WHERE i.inter * 2 >= za.sz + zb.sz - i.inter
        ),
        -- transitive closure of the near-dup pairs (the 'cluster'
        -- member): component = MIN reachable doc over the symmetric
        -- edge set; every slice doc is a node (singletons label
        -- themselves)
        alldocs AS (SELECT DISTINCT doc FROM toks),
        sym AS (
            SELECT doc_a AS a, doc_b AS b FROM near
            UNION ALL SELECT doc_b, doc_a FROM near
        ),
        reach(node, lab) AS (
            SELECT doc, doc FROM alldocs
            UNION
            SELECT e.b, r.lab FROM reach r JOIN sym e ON r.node = e.a
        ),
        comp AS (
            SELECT node, MIN(lab) AS component FROM reach GROUP BY node
        ),
        csize AS (
            SELECT component, COUNT(*) AS size FROM comp GROUP BY component
        )
        SELECT 'pair' AS member, doc_a, doc_b, inter, un FROM near
        UNION ALL
        SELECT 'cluster', CAST(c.node AS BIGINT), CAST(c.component AS BIGINT),
               CAST(s.size AS BIGINT), CAST(-1 AS BIGINT)
        FROM comp c JOIN csize s ON s.component = c.component
        UNION ALL
        -- 'decon' member: fuzzy decontamination replay — train-side
        -- 8-gram shingles (full documents, NOT the self-union slice)
        -- joined to the DISTINCT 8-grams of each eval doc (= first 24
        -- tokens of every 50th document); hits = shared distinct
        -- shingles, overlap ratio >= 0.5, un = floor(ratio * 1e6)
        SELECT 'decon', CAST(h.doc_id AS BIGINT), CAST(h.eval_id AS BIGINT),
               CAST(h.hits AS BIGINT),
               CAST(FLOOR(h.hits / d.ev_n * 1000000) AS BIGINT)
        FROM (
            SELECT t.doc_id, e.eval_id, COUNT(DISTINCT t.shingle) AS hits
            FROM (
                SELECT doc_id, array_to_string(l[i:i+7], ' ') AS shingle
                FROM (
                    SELECT doc_id,
                           string_split_regex(trim(text), '\s+') AS l,
                           unnest(generate_series(1,
                               len(string_split_regex(trim(text), '\s+')) - 7)) AS i
                    FROM documents
                    WHERE len(string_split_regex(trim(text), '\s+')) >= 8
                )
            ) t
            JOIN (
                SELECT DISTINCT eval_id,
                       array_to_string(el[i:i+7], ' ') AS shingle
                FROM (
                    SELECT doc_id AS eval_id,
                           (string_split_regex(trim(text), '\s+'))[1:24] AS el,
                           unnest(generate_series(1,
                               len((string_split_regex(trim(text), '\s+'))[1:24]) - 7)) AS i
                    FROM documents WHERE doc_id % 50 = 0
                )
            ) e ON e.shingle = t.shingle
            GROUP BY t.doc_id, e.eval_id
        ) h
        JOIN (
            SELECT eval_id, COUNT(*) AS ev_n FROM (
                SELECT DISTINCT eval_id,
                       array_to_string(el[i:i+7], ' ') AS shingle
                FROM (
                    SELECT doc_id AS eval_id,
                           (string_split_regex(trim(text), '\s+'))[1:24] AS el,
                           unnest(generate_series(1,
                               len((string_split_regex(trim(text), '\s+'))[1:24]) - 7)) AS i
                    FROM documents WHERE doc_id % 50 = 0
                )
            ) GROUP BY eval_id
        ) d ON d.eval_id = h.eval_id
        WHERE h.hits / d.ev_n >= 0.5
    """,
    # Replays ops/dedup.py simhash_fingerprints + simhash_near_duplicates
    # bit-for-bit: tokens (all occurrences, not distinct) -> 60-bit int
    # from the first 15 md5 hex chars -> per-bit ±1 sums -> sign-packed
    # fingerprint -> 4 x 15-bit pigeonhole bands -> bucket join ->
    # bit_count(xor) <= 3 verify.
    "dedup_simhash": f"""
        WITH toks AS (
            SELECT doc_id AS doc,
                   unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM {_SELFU} AS d(doc_id, text)
        ),
        hashed AS (
            SELECT doc,
                   CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
            FROM toks
        ),
        weighted AS (
            SELECT doc, bit, ((h >> bit) & 1) * 2 - 1 AS w
            FROM hashed, (SELECT unnest(generate_series(0, 59)) AS bit) bits
        ),
        per_bit AS (
            SELECT doc, bit, SUM(w) AS s FROM weighted GROUP BY doc, bit
        ),
        fp AS (
            SELECT doc,
                   SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                       ELSE 0 END) AS simhash
            FROM per_bit GROUP BY doc
        ),
        buckets AS (
            SELECT doc, band, (simhash >> (band * 15)) & 32767 AS bucket
            FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) bands
        ),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
        )
        SELECT c.doc_a, c.doc_b,
               CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
        FROM cand c
        JOIN fp fa ON fa.doc = c.doc_a
        JOIN fp fb ON fb.doc = c.doc_b
        WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
    """,
    # brute-force top-10 over the same +10-at-dim(vec_id%8) shifted
    # corpus the Spark side probes with n_probe < n_cells
    "ann_ivf_probe": f"""
        WITH shifted AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       (x, i) -> x + CASE WHEN i - 1 = vec_id % {IVF_CELLS}
                                     THEN 10.0 ELSE 0.0 END) AS e
            FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, e AS qe FROM shifted WHERE vec_id < 5),
        s AS (
            SELECT q.query_id, sh.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qe, sh.e) AS c
            FROM q CROSS JOIN shifted sh
            WHERE sh.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
            FROM s
        ) WHERE rn <= 10
    """,
    # three tagged members: brute cosine pairs; integer-exact k-means
    # assignments (same unroll as the Spark side — hash-exact by
    # construction); SemDeDup within-cell pairs decided in exact
    # integers (25 dot^2 >= 16 |a|^2 |b|^2) on the halved-copy plant
    "emb_neardup": f"""
        SELECT 'brute' AS member, a.vec_id AS a, b.vec_id AS b,
               CAST(0 AS BIGINT) AS v
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        UNION ALL
        SELECT 'kmeans', vec_id, cell, CAST(0 AS BIGINT) FROM (
        {_kmeans_exact_sql("embeddings", KMEANS_K, KMEANS_ITERS, EMB_DIM, 1024)}
        SELECT vec_id, cell FROM a{KMEANS_ITERS}
        ) km
        UNION ALL
        SELECT 'sem', doc_a, doc_b, CAST(dot AS BIGINT) FROM (
        {_kmeans_exact_sql(_EMB_SEMSRC_SQL, KMEANS_K, KMEANS_ITERS, EMB_DIM, 1024)}
        , n2 AS (
            SELECT vec_id,
                   list_sum(list_transform(xq, x -> x * x)) AS nsq
            FROM q
        ),
        pairs AS (
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   list_sum(list_transform(range(1, {EMB_DIM + 1}),
                       i -> qa.xq[i] * qb.xq[i])) AS dot,
                   na.nsq AS na, nb.nsq AS nb
            FROM a{KMEANS_ITERS} a
            JOIN a{KMEANS_ITERS} b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN q qa ON qa.vec_id = a.vec_id
            JOIN q qb ON qb.vec_id = b.vec_id
            JOIN n2 na ON na.vec_id = a.vec_id
            JOIN n2 nb ON nb.vec_id = b.vec_id
        )
        SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot
        FROM pairs
        WHERE dot > 0 AND 25 * dot * dot >= 16 * na * nb
        ) sem
    """,
}

_RUNNERS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_ngram": q_dedup_ngram,
    "dedup_simhash": q_dedup_simhash,
    "graph_bfs": q_graph_bfs,
    "graph_topo": q_graph_topo,
    "skew_salted_agg": q_skew_salted_agg,
    "ann_topk": q_ann_topk,
    "ann_ivf_probe": q_ann_ivf_probe,
    "emb_neardup": q_emb_neardup,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_RUNNERS)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
