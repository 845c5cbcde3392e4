"""Raw-crawl ingest rehearsal: WARC archives -> training-ready corpus,
every stage the real operator, measured end to end.

Closes the loop between the round-8 source tier (ops/warc.py,
html_to_text) and the curation funnel (scripts/curation_rehearsal.py,
which starts from already-clean parquet): synthesizes N_DOCS HTML
pages (deterministic content derived from the sf0.1 documents corpus,
~1/7 exact-duplicate bodies, boilerplate nav/footer on every page)
packed into N_FILES .warc.gz archives (record-gzip, the Common Crawl
layout), then runs

  parse/strip (warc_to_documents) -> html_to_text -> normalize_text
  -> c4_clean -> gopher_filter -> exact dedup -> paragraph dedup
  -> token count + pack_chunked

reporting rows + seconds per stage.  One JSON line; save it under
artifacts/ to make the run citable.

Usage: python scripts/ingest_rehearsal.py [n_docs] [n_files]
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/ingest_rehearsal_warc"


def _http(body: bytes) -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _record(uri: str, payload: bytes, rid: int) -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid:08d}>\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def synthesize(spark, n_docs: int, n_files: int) -> None:
    """Build the archives from the sf0.1 documents corpus (driver-side
    file write — the rehearsal's input-prep, not the measured path)."""
    texts = [
        r["text"]
        for r in Engine.for_dir(spark, SRC).table("documents").collect()
    ]  # 5000 at sf0.1; cycled below when n_docs exceeds it
    os.makedirs(WORK, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    rid = 0
    for fi in range(n_files):
        buf = bytearray()
        for k in range(per):
            i = fi * per + k
            if i >= n_docs:
                break
            j = i % len(texts)
            body_src = texts[j - (j % 7)] if i % 7 == 1 else texts[j]
            sentences = ". ".join(
                " ".join(body_src.split()[j : j + 12])
                for j in range(0, min(len(body_src.split()), 96), 12)
            )
            html = (
                "<html><head><title>page</title><style>a{x:1}</style></head>"
                "<body><div>HOME | ABOUT | CONTACT</div>"
                f"<h1>Document {i}</h1>"
                f"<p>{sentences}.</p>"
                "<p>All content reviewed by our editorial team today.</p>"
                "<div>copyright footer all rights reserved</div>"
                "</body></html>"
            ).encode()
            buf += gzip.compress(_record(f"http://site{i % 53}.test/p{i}", _http(html), rid))
            rid += 1
        with open(os.path.join(WORK, f"seg{fi:03d}.warc.gz"), "wb") as f:
            f.write(bytes(buf))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="ingest_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from knovexlite_spark.ops.dedup import exact_duplicates, paragraph_dedup
    from knovexlite_spark.ops.sample import pack_chunked
    from knovexlite_spark.ops.text import (
        c4_clean,
        gopher_filter,
        html_to_text,
        normalize_text,
        token_count,
    )
    from knovexlite_spark.ops.warc import warc_to_documents

    if not os.path.exists(os.path.join(WORK, "seg000.warc.gz")):
        synthesize(spark, n_docs, n_files)

    out = {"metric": "ingest_rehearsal", "n_docs": n_docs, "n_files": n_files,
           "stages": []}

    def stage(name, frame):
        t0 = time.time()
        frame = frame.localCheckpoint()
        n = frame.count()
        out["stages"].append(
            {"stage": name, "rows": int(n), "sec": round(time.time() - t0, 2)}
        )
        return frame

    files = spark.read.format("binaryFile").load(WORK).select("path", "content")
    docs = stage("warc_to_documents", warc_to_documents(files))
    docs = stage(
        "html_to_text",
        docs.select("doc_id", "url", html_to_text(F.col("text")).alias("text")),
    )
    # keep line structure: c4_clean/line-dedup downstream need the
    # newlines html_to_text preserved
    docs = stage(
        "normalize_text", normalize_text(docs, collapse_whitespace=False)
    )
    docs = stage(
        "c4_clean", c4_clean(docs.select("doc_id", "text"), min_sentences=2)
    )
    docs = stage(
        "gopher_filter",
        gopher_filter(docs, min_words=20, min_stop_hits=0, min_mean_word_len=2.0),
    )
    # doc-level exact dedup: keep canonical survivors only
    canon = exact_duplicates(docs).select(
        F.col("canonical_id").alias("doc_id")
    )
    docs = stage("exact_dedup", docs.join(canon, "doc_id", "semi"))
    para = stage(
        "line_dedup",
        paragraph_dedup(docs, sep="\n").select(
            "doc_id", F.col("clean_text").alias("text"), "n_removed"
        ),
    )
    sized = para.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    packed = stage("pack_chunked", pack_chunked(sized, budget=2048, num_shards=8))
    out["total_sec"] = round(sum(s["sec"] for s in out["stages"]), 2)
    out["boilerplate_paras_removed"] = int(
        para.agg(F.sum("n_removed")).first()[0] or 0
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
