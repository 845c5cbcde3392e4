"""WARC ingestion (ops/warc.py) vs synthesized archives — record
parsing, record-gzip members, HTTP stripping, document projection."""

import gzip
import io

from pyspark.sql import functions as F


def _record(warc_type: str, uri: str, payload: bytes, rid: str) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _archive() -> bytes:
    info = _record("warcinfo", "", b"software: test\r\n", "aaa")
    r1 = _record(
        "response", "http://example.com/a", _http(b"<html>alpha page</html>"), "bbb"
    )
    r2 = _record(
        "response", "http://example.com/b", _http(b"not found", 404), "ccc"
    )
    req = _record("request", "http://example.com/a", b"GET /a HTTP/1.1\r\n", "ddd")
    r3 = _record(
        "response", "http://example.com/c", _http("unicode café".encode()), "eee"
    )
    return info + r1 + r2 + req + r3


def _files_df(spark, blobs):
    return spark.createDataFrame(
        [(p, bytearray(b)) for p, b in blobs], "path string, content binary"
    )


def test_parse_warc_records_plain(spark):
    from knovexlite_spark.ops.warc import parse_warc_records

    df = _files_df(spark, [("f1.warc", _archive())])
    rows = {r["record_idx"]: r for r in parse_warc_records(df).collect()}
    assert len(rows) == 5
    assert rows[0]["warc_type"] == "warcinfo" and rows[0]["http_status"] is None
    assert rows[1]["warc_type"] == "response" and rows[1]["http_status"] == 200
    assert rows[1]["target_uri"] == "http://example.com/a"
    assert rows[2]["http_status"] == 404
    assert rows[3]["warc_type"] == "request"
    assert rows[1]["payload_len"] == len(_http(b"<html>alpha page</html>"))


def test_parse_warc_record_gzip_members(spark):
    """Common Crawl layout: one gzip MEMBER per record, concatenated."""
    from knovexlite_spark.ops.warc import parse_warc_records

    recs = [
        _record("response", "http://x/1", _http(b"one"), "r1"),
        _record("response", "http://x/2", _http(b"two"), "r2"),
    ]
    gz = b"".join(gzip.compress(r) for r in recs)
    df = _files_df(spark, [("f2.warc.gz", gz)])
    rows = sorted(
        (r["record_idx"], r["target_uri"])
        for r in parse_warc_records(df).collect()
    )
    assert rows == [(0, "http://x/1"), (1, "http://x/2")]


def test_gunzip_members_chunked_walk():
    """_gunzip_members feeds the decompressor fixed-size chunks (the
    O(member), not O(members x file) form): with a chunk far smaller
    than a member AND far larger than several members, every member
    boundary — mid-chunk, at-chunk-edge — rewinds correctly and the
    members replay byte-exact in order."""
    from knovexlite_spark.ops.warc import _gunzip_members

    members = [
        b"A" * 10_000,           # many chunks per member
        b"short",                # several members inside one chunk
        b"x",
        b"B" * 257,
        "café".encode() * 99,
    ]
    gz = b"".join(gzip.compress(m) for m in members)
    for chunk in (7, 64, 1 << 20):
        got = list(_gunzip_members(gz, chunk_size=chunk))
        assert got == members, f"chunk_size={chunk}"
    # plain (non-gzip) buffer yields itself untouched
    assert list(_gunzip_members(b"plain bytes")) == [b"plain bytes"]


def test_warc_to_documents_strips_http_and_filters_status(spark):
    from knovexlite_spark.ops.warc import warc_to_documents

    df = _files_df(spark, [("f1.warc", _archive())])
    docs = {r["url"]: r for r in warc_to_documents(df).collect()}
    # 2xx responses only: the 404 and non-response records drop
    assert set(docs) == {"http://example.com/a", "http://example.com/c"}
    assert docs["http://example.com/a"]["text"] == "<html>alpha page</html>"
    assert docs["http://example.com/c"]["text"] == "unicode café"
    # stable ids: re-ingestion is idempotent
    again = {r["url"]: r["doc_id"] for r in warc_to_documents(df).collect()}
    assert all(again[u] == docs[u]["doc_id"] for u in docs)


def test_warc_feeds_the_dedup_tier(spark):
    """End-to-end composition: WARC -> documents -> exact dedup."""
    from knovexlite_spark.ops.dedup import exact_duplicates
    from knovexlite_spark.ops.warc import warc_to_documents

    same = _http(b"<html>dup body</html>")
    blob = (
        _record("response", "http://a/1", same, "x1")
        + _record("response", "http://a/2", same, "x2")
        + _record("response", "http://a/3", _http(b"<html>unique</html>"), "x3")
    )
    docs = warc_to_documents(_files_df(spark, [("f3.warc", blob)]))
    groups = exact_duplicates(docs).collect()
    sizes = sorted(r["n_docs"] for r in groups)
    assert sizes == [1, 2]


def test_malformed_archive_raises_loudly(spark):
    import pytest

    from knovexlite_spark.ops.warc import parse_warc_records

    df = _files_df(spark, [("bad.warc", b"NOT A WARC FILE")])
    with pytest.raises(Exception, match="not a WARC record"):
        parse_warc_records(df).collect()


def test_warc_ingest_is_stream_legal(spark, tmp_path):
    """The whole WARC -> documents chain is stateless (mapInPandas +
    filters + projections), so it runs unchanged on a STREAMING frame
    of archive blobs (the drop-folder ingest shape) in append mode —
    parity with the batch path on the same blobs."""
    from knovexlite_spark.ops.warc import warc_to_documents

    blobs = [
        ("s1.warc", _archive()),
        (
            "s2.warc",
            _record("response", "http://s2/only", _http(b"stream body"), "zz"),
        ),
    ]
    batch = spark.createDataFrame(
        [(p, bytearray(b)) for p, b in blobs], "path string, content binary"
    )
    src = str(tmp_path / "warc_blobs")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = warc_to_documents(stream)
    q = (
        out.writeStream.format("memory").queryName("warc_docs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["url"]: (r["doc_id"], r["text"])
        for r in spark.sql("SELECT * FROM warc_docs").collect()
    }
    want = {
        r["url"]: (r["doc_id"], r["text"])
        for r in warc_to_documents(batch).collect()
    }
    assert got == want and "http://s2/only" in got


def test_warc_to_documents_honors_declared_charset(spark):
    """The HTTP Content-Type charset drives decoding: a latin-1 body
    declared as such decodes correctly where UTF-8 would mangle it; a
    LYING utf-8 declaration still yields replaced (not raised) output;
    an unknown charset label falls back to UTF-8."""
    from knovexlite_spark.ops.warc import warc_to_documents

    latin = "caf\xe9 cr\xe8me".encode("latin-1")
    blob = (
        _record(
            "response", "http://x/latin",
            _http(latin, ctype="text/html; charset=ISO-8859-1"), "l1",
        )
        + _record(
            "response", "http://x/lying",
            _http(latin, ctype="text/html; charset=utf-8"), "l2",
        )
        + _record(
            "response", "http://x/garbage",
            _http("plain ascii".encode(), ctype="text/html; charset=not-a-charset"),
            "l3",
        )
    )
    docs = {
        r["url"]: r["text"]
        for r in warc_to_documents(_files_df(spark, [("cs.warc", blob)])).collect()
    }
    assert docs["http://x/latin"] == "café crème"
    assert "�" in docs["http://x/lying"]  # mangled but not raised
    assert docs["http://x/garbage"] == "plain ascii"
