"""WARC source — the container Common-Crawl-style corpora actually ship in.

The north rule's input is an Iceberg table of (url, warc_ts, html, ...) rows;
this module is the step that PRODUCES that table from raw crawl archives:
WARC/1.0 response records (ISO 28500), one gzip member per record in the
``.warc.gz`` convention, parsed into (url, warc_ts, html binary) rows.

Scale shape: ``read_warc`` reads whole archive files via Spark's binaryFile
source — one task per archive, the standard Common-Crawl processing grain
(CC archives are ~1 GB each and a crawl has ~64k of them, so file-level
parallelism saturates any cluster; record-level splitting would require a
gzip-member index and buys nothing at that file count). Record parsing is a
single linear pass per archive inside one Arrow-batched task; the emitted
rows carry only url/ts/payload, so the exchange after the source is exactly
the payload bytes once.

Error contract: malformed records/members are skipped and COUNTED (an
``n_bad`` column per archive is available via ``warc_file_stats``), never
thrown — one corrupt archive must not kill a crawl-scale job.

The reference (tesseract-wasm) has no source tier at all (it consumes
in-memory ImageBitmap/ImageData — src/ocr-engine.ts:171-210); this module is
brief-scope (training-data pipeline), not reference-parity scope.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"

#: WARC header keys this parser consumes (case-insensitive per ISO 28500)
_H_TYPE = b"warc-type"
_H_URI = b"warc-target-uri"
_H_DATE = b"warc-date"
_H_CLEN = b"content-length"


def make_warc(records: list[tuple], *,
              compress: bool = True,
              content_type: str = "text/html") -> bytes:
    """Deterministic WARC fixture generator: one WARC/1.0 ``response`` record
    per (url, iso_ts, payload[, content_type]) tuple, each wrapped in an
    HTTP/1.1 200 envelope (a 4th tuple element overrides ``content_type``
    per record — e.g. 'text/html; charset=windows-1252' to exercise the
    transport-charset channel); ``compress=True`` emits one gzip member PER
    RECORD (the ``.warc.gz`` convention that lets a reader seek between
    records)."""
    out = io.BytesIO()
    for rec in records:
        url, ts, payload = rec[0], rec[1], rec[2]
        ctype = rec[3] if len(rec) > 3 else content_type
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode("ascii")
            + b"\r\nContent-Length: " + str(len(payload)).encode("ascii")
            + b"\r\n\r\n" + payload
        )
        head = (
            _WARC_VERSION + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + url.encode("ascii") + _CRLF
            + b"WARC-Date: " + ts.encode("ascii") + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + b"Content-Length: " + str(len(http)).encode("ascii") + _CRLF
            + _CRLF
        )
        record = head + http + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out.write(buf.getvalue())
        else:
            out.write(record)
    return out.getvalue()


def _split_members(raw: bytes) -> list[bytes]:
    """Concatenated gzip members -> one decompressed blob per member (the
    per-record grain of .warc.gz); plain (uncompressed) input comes back as
    a single pseudo-member."""
    if raw[:2] != b"\x1f\x8b":
        return [raw]
    members: list[bytes] = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            members.append(d.decompress(raw[pos:]))
        except zlib.error:
            break  # trailing garbage / truncated member: stop, keep parsed
        tail = len(d.unused_data)
        nxt = len(raw) - tail
        if nxt <= pos:
            break
        pos = nxt
    return members


#: HTTP envelope Content-Type header + its charset parameter — the
#: transport channel WHATWG ranks ABOVE <meta charset> (BOM > transport >
#: meta). WARC hands this to us for free; it is exactly what disambiguates
#: the no-meta pages.
_HTTP_CTYPE_RE = re.compile(rb"(?im)^content-type:[ \t]*([^\r\n]+)")
_CHARSET_PARAM_RE = re.compile(
    rb"(?i)charset[ \t]*=[ \t]*[\"']?[ \t]*([A-Za-z0-9_\-]+)"
)


def parse_warc_bytes(raw: bytes) -> tuple[list[dict], int]:
    """One archive's bytes -> (response-record rows, n_bad). Each row:
    {url, warc_ts (ISO string), html (payload bytes), http_charset
    (lowercase charset label from the HTTP Content-Type header, or None)}.
    Non-response records (warcinfo, request, metadata) are skipped silently
    — they are structure, not data; malformed records count as bad."""
    rows: list[dict] = []
    n_bad = 0
    for member in _split_members(raw):
        # a plain-format archive holds many records in one member; walk them
        pos = 0
        while True:
            start = member.find(_WARC_VERSION, pos)
            if start < 0:
                break
            head_end = member.find(_CRLF + _CRLF, start)
            if head_end < 0:
                n_bad += 1
                break
            headers: dict[bytes, bytes] = {}
            for line in member[start + len(_WARC_VERSION):head_end].split(_CRLF):
                k, sep, v = line.partition(b":")
                if sep:
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers[_H_CLEN])
            except (KeyError, ValueError):
                n_bad += 1
                pos = head_end + 4
                continue
            body = member[head_end + 4: head_end + 4 + clen]
            pos = head_end + 4 + clen
            if headers.get(_H_TYPE, b"").lower() != b"response":
                continue
            if len(body) != clen or _H_URI not in headers:
                n_bad += 1
                continue
            # strip the HTTP envelope: payload starts after its header block;
            # the envelope's Content-Type charset is surfaced (WHATWG ranks
            # transport above <meta> — webtext.detect_charset_expr consumes
            # it through its header_label argument)
            sep_at = body.find(b"\r\n\r\n")
            payload = body[sep_at + 4:] if sep_at >= 0 else body
            http_charset = None
            if sep_at >= 0:
                cm = _HTTP_CTYPE_RE.search(body[:sep_at])
                if cm is not None:
                    pm = _CHARSET_PARAM_RE.search(cm.group(1))
                    if pm is not None:
                        http_charset = pm.group(1).decode("ascii").lower()
            rows.append({
                "url": headers[_H_URI].decode("ascii", "replace"),
                "warc_ts": headers.get(_H_DATE, b"").decode("ascii", "replace"),
                "html": payload,
                "http_charset": http_charset,
            })
    return rows, n_bad


WARC_ROWS_DDL = "url string, warc_ts timestamp, html binary, http_charset string"


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Crawl archives -> the north rule's input table (url, warc_ts, html):
    whole-file reads (binaryFile source — one task per archive, the
    Common-Crawl grain), one linear parse per archive, bad records skipped.
    ``warc_ts`` is a real timestamp column so time-partitioned Iceberg
    layouts can partition on days(warc_ts)."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                rows, _ = parse_warc_bytes(bytes(content))
                out.extend(rows)
            frame = pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "http_charset"]
            )
            frame["warc_ts"] = pd.to_datetime(
                frame["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield frame

    files = spark.read.format("binaryFile").load(path_glob).select("content")
    return files.mapInPandas(run, schema=WARC_ROWS_DDL)


def warc_file_stats(spark: SparkSession, path_glob: str) -> DataFrame:
    """Per-archive lineage row: (path, n_records, n_bad, n_bytes) — the
    observable that catches a corrupt archive batch before extraction."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows, n_bad = parse_warc_bytes(bytes(content))
                out.append({"path": path, "n_records": len(rows),
                            "n_bad": n_bad, "n_bytes": len(content)})
            yield pd.DataFrame(
                out, columns=["path", "n_records", "n_bad", "n_bytes"]
            )

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(
        run, schema="path string, n_records long, n_bad long, n_bytes long"
    )
