"""WARC (ISO 28500) crawl-archive ingestion.

The reference engine reads TSV/JSON graph files (SURVEY §2.1); a
training-data pipeline's raw input is WARC — the Common Crawl / IA
format — so this closes the source gap for the LLM-curation tier.
Pure-stdlib parsing (the spec is public; no warcio dependency in the
container) over Spark's ``binaryFile`` source:

- one input row per .warc / .warc.gz FILE (path, content bytes),
- ``parse_warc_records``: mapInPandas -> one output row per WARC
  record with the load-bearing headers promoted to columns and the
  raw payload kept as binary,
- ``warc_to_documents``: response records -> (doc_id, url, text)
  with the HTTP envelope stripped — the shape the dedup/quality tier
  consumes.

Scale shape: parallelism is per-FILE (binaryFile is not splittable),
which matches how Common Crawl ships — ~1 GB .warc.gz segments, tens
of thousands of them; with files >> cores the per-file granularity
saturates a cluster.  Record-gzip (the CC layout: one gzip MEMBER per
record) decompresses incrementally member-by-member, so memory is
bounded by one record, not the file.  Arrow batches carry the
records; nothing is collected to the driver.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "path string, record_idx long, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "http_status int, payload binary, payload_len long"
)


def _gunzip_members(data: bytes, chunk_size: int = 1 << 20):
    """Yield decompressed gzip members (WARC record-gzip: one member
    per record).  A plain (non-gzip) buffer yields itself.

    Memory shape: the compressed buffer is walked through a
    ``memoryview`` in fixed-size chunks, so per-member work is
    O(member + chunk) — NOT ``data[pos:]`` per member, which on a
    ~1 GB Common-Crawl segment with tens of thousands of record-gzip
    members would re-copy the file tail every member
    (O(members x file_size) traffic).  When a member ends inside a
    chunk the decompressor parks the remainder in ``unused_data``
    (at most one chunk), and the cursor rewinds by that amount."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n and bytes(view[pos : pos + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = []
        member_start = pos
        while pos < n and not d.eof:
            fed = min(chunk_size, n - pos)
            out.append(d.decompress(view[pos : pos + fed]))
            pos += fed
        pos -= len(d.unused_data)  # tail of the final chunk, <= one chunk
        yield b"".join(out)
        if pos <= member_start:
            break


def warc_record(
    warc_type: str, uri: str | None, payload: bytes, record_id: str
) -> bytes:
    """Serialize ONE ISO 28500 record (header block + payload +
    separator) — the write-side twin of ``_parse_buffer``, used by the
    warc_ingest gate and tests to synthesize archives deterministically
    (fixed WARC-Date; no wall clock so replays are byte-stable)."""
    hdr = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _parse_buffer(buf: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record in one
    decompressed buffer.  Record = header block ending \\r\\n\\r\\n,
    Content-Length payload bytes, then \\r\\n\\r\\n separator."""
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not buf[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"not a WARC record at offset {pos}: {buf[pos:pos+16]!r}"
            )
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = buf[pos:hdr_end].decode("utf-8", errors="replace").split("\r\n")
        headers: dict[str, str] = {"__version__": lines[0]}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        yield headers, buf[body_start : body_start + length]
        pos = body_start + length


def _http_split(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) for an HTTP response payload; (None, payload)
    when it doesn't look like HTTP."""
    if not payload[:5] == b"HTTP/":
        return None, payload
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        return None, payload
    status_line = payload.split(b"\r\n", 1)[0].decode("latin-1", "replace")
    parts = status_line.split(" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[end + 4 :]


def _http_charset(payload: bytes) -> str | None:
    """charset= from the HTTP Content-Type header (the header block is
    ASCII-ish by spec; latin-1 decode never fails)."""
    end = payload.find(b"\r\n\r\n")
    if not payload[:5] == b"HTTP/" or end < 0:
        return None
    for ln in payload[:end].decode("latin-1", "replace").split("\r\n"):
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type" and "charset=" in v.lower():
            cs = v.lower().split("charset=", 1)[1].split(";")[0]
            return cs.strip().strip('"').strip("'") or None
    return None


def _decode_body(body: bytes, charset: str | None) -> str:
    """Decode with the declared charset, falling back to UTF-8; errors
    always replaced (crawl bytes lie about their encoding routinely —
    a loud raise here would poison whole-archive tasks)."""
    if charset:
        try:
            return body.decode(charset, errors="replace")
        except LookupError:  # unknown/garbage charset label
            pass
    return body.decode("utf-8", errors="replace")


def parse_warc_records(files: DataFrame) -> DataFrame:
    """(path, content) binaryFile rows -> one row per WARC record.

    Output: path, record_idx (0-based within file), warc_type,
    target_uri, warc_date, record_id, content_type (the WARC-level
    one), http_status (response records; NULL otherwise), payload
    (HTTP envelope NOT stripped — ``warc_to_documents`` does that),
    payload_len."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                idx = 0
                for member in _gunzip_members(bytes(content)):
                    for headers, payload in _parse_buffer(member):
                        status, _ = _http_split(payload)
                        rows.append(
                            {
                                "path": path,
                                "record_idx": idx,
                                "warc_type": headers.get("warc-type"),
                                "target_uri": headers.get("warc-target-uri"),
                                "warc_date": headers.get("warc-date"),
                                "record_id": headers.get("warc-record-id"),
                                "content_type": headers.get("content-type"),
                                "http_status": status,
                                "payload": payload,
                                "payload_len": len(payload),
                            }
                        )
                        idx += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_idx", "warc_type", "target_uri",
                    "warc_date", "record_id", "content_type",
                    "http_status", "payload", "payload_len",
                ],
            )

    return files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)


def warc_to_documents(files: DataFrame, min_status: int = 200, max_status: int = 299) -> DataFrame:
    """Response records -> (doc_id, url, text): HTTP envelope stripped,
    body decoded with the charset the HTTP Content-Type header
    DECLARES (falling back to UTF-8; decode errors always replaced —
    crawl bytes lie about their encoding routinely, and a loud raise
    would poison whole-archive tasks), 2xx only by default.  doc_id is
    a stable 64-bit hash of (path, record_idx) so re-ingestion is
    idempotent."""
    from pyspark.sql import functions as F

    recs = parse_warc_records(files).filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(min_status, max_status)
    )

    def strip(it):
        import pandas as pd

        for pdf in it:
            out = {"path": [], "record_idx": [], "url": [], "text": []}
            for path, idx, uri, payload in zip(
                pdf["path"], pdf["record_idx"], pdf["target_uri"], pdf["payload"]
            ):
                raw = bytes(payload)
                _, body = _http_split(raw)
                out["path"].append(path)
                out["record_idx"].append(idx)
                out["url"].append(uri)
                out["text"].append(_decode_body(body, _http_charset(raw)))
            yield pd.DataFrame(out)

    stripped = recs.mapInPandas(
        strip, "path string, record_idx long, url string, text string"
    )
    return stripped.select(
        F.xxhash64("path", "record_idx").alias("doc_id"), "url", "text"
    )
