"""WARC (ISO 28500) connector — the crawl ecosystem's archive format.

A production crawler interoperates with WARC on both sides: it EXPORTS
fetch results so downstream consumers (and replay/dedup tooling) read a
standard format, and it INGESTS existing archives (e.g. Common-Crawl-
style dumps) as a page source. Reference tree was empty at build time
(SURVEY.md §0); the format is pinned to the published ISO 28500 /
IIPC warc-specifications text:

  - record = header block (CRLF lines: `WARC/1.0`, named fields incl.
    mandatory WARC-Record-ID / Content-Length / WARC-Date / WARC-Type)
    + CRLF CRLF + content block + CRLF CRLF;
  - a .warc.gz file is a sequence of INDEPENDENT gzip members, one per
    record (the spec's seekability requirement) — the reader walks
    members with zlib.decompressobj(wbits=31), the writer emits one
    member per record;
  - response records carry `application/http;msgtype=response` content:
    an HTTP/1.1 status line + headers + CRLF CRLF + payload.

Spark surfaces:
  - write_warc(df, path): one .warc.gz per input partition, written
    INSIDE the task (mapInPandas), returning a manifest frame
    (file, n_records, n_bytes) — the action that materializes it is the
    caller's collect/count, same contract as every sink here. Files
    land on task-local visible storage (shared FS / object store on a
    cluster).
  - read_warc(spark, glob): binaryFile scan → mapInPandas record walk;
    yields (src_file, record_type, target_uri, warc_date, status,
    content_type, payload). Non-response records keep their headers
    with null HTTP fields.

Untrusted-input posture (same as the codec family): per-record inflate
is capped (WARC_MAX_RECORD default 1 GiB, env-overridable), stated
Content-Length is validated against the decoded member before any
slice, and a corrupt member ends that FILE's walk cleanly after the
records already parsed (partial archives are the common wild failure).

Determinism: WARC-Record-ID is a blake2 digest of (uri, date, payload)
— re-exporting the same rows yields byte-identical records (modulo
gzip mtime, which the writer pins to 0), so resumed runs don't fork
archive content.
"""

from __future__ import annotations

import hashlib
import os
import uuid
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_MAX_RECORD = int(
    os.environ.get("JIRLBOT_WARC_MAX_RECORD", str(1 << 30))
)

_CRLF = b"\r\n"


def _record_id(uri: str, date: str, payload: bytes) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(uri.encode())
    h.update(date.encode())
    h.update(payload)
    return f"<urn:uuid:{uuid.UUID(bytes=h.digest())}>"


def build_record(
    record_type: str,
    content: bytes,
    target_uri: str = "",
    warc_date: str = "1970-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record, spec framing."""
    lines = [b"WARC/1.0"]
    fields = {
        "WARC-Type": record_type,
        "WARC-Record-ID": _record_id(target_uri, warc_date, content),
        "WARC-Date": warc_date,
        "Content-Length": str(len(content)),
        "Content-Type": content_type,
    }
    if target_uri:
        fields["WARC-Target-URI"] = target_uri
    fields.update(extra_headers or {})
    for k, v in fields.items():
        lines.append(f"{k}: {v}".encode())
    return _CRLF.join(lines) + _CRLF * 2 + content + _CRLF * 2


def build_response_record(
    url: str,
    status: int,
    content_type: str,
    body: bytes,
    warc_date: str = "1970-01-01T00:00:00Z",
) -> bytes:
    http = (
        f"HTTP/1.1 {int(status)} \r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + bytes(body)
    return build_record(
        "response",
        http,
        target_uri=url,
        warc_date=warc_date,
        content_type='application/http;msgtype=response',
    )


def _gzip_member(raw: bytes) -> bytes:
    """One independent gzip member, mtime pinned to 0 (determinism)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    # zlib's gzip header stamps current time; build our own header
    body = co.compress(raw) + co.flush()
    # replace MTIME (bytes 4:8) with zeros
    return body[:4] + b"\x00\x00\x00\x00" + body[8:]


WRITE_MANIFEST_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("n_records", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    status_col: str = "status",
    content_type_col: str = "content_type",
    body_col: str = "body",
    date_col: str | None = None,
) -> DataFrame:
    """Export fetch results as per-partition .warc.gz files under
    `path`. Returns the manifest frame; collect()/count() it to run the
    export. Each record is its own gzip member per the spec."""
    cols = [url_col, status_col, content_type_col, body_col] + (
        [date_col] if date_col else []
    )
    sel = df.select(*cols)

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        blobs: list[bytes] = []
        n = 0
        for pdf in it:
            for row in pdf.itertuples(index=False):
                url = str(getattr(row, url_col))
                status = int(getattr(row, status_col) or 0)
                ct = str(getattr(row, content_type_col) or "")
                body = bytes(getattr(row, body_col) or b"")
                date = (
                    str(getattr(row, date_col))
                    if date_col
                    else "1970-01-01T00:00:00Z"
                )
                blobs.append(
                    _gzip_member(
                        build_response_record(url, status, ct, body, date)
                    )
                )
                n += 1
        if not n:
            return
        os.makedirs(path, exist_ok=True)
        data = b"".join(blobs)
        fname = os.path.join(path, f"part-{pid:05d}.warc.gz")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, fname)  # atomic: readers never see partials
        yield pd.DataFrame(
            {"file": [fname], "n_records": [n], "n_bytes": [len(data)]}
        )

    return sel.mapInPandas(part, WRITE_MANIFEST_SCHEMA)


READ_SCHEMA = StructType(
    [
        StructField("src_file", StringType()),
        StructField("record_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("status", LongType()),
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def parse_warc_bytes(data: bytes, src: str = "") -> list[dict]:
    """Walk one WARC file (gzip-membered or plain). Corruption ends the
    walk after the records already parsed — never raises on wild data."""
    records: list[dict] = []
    members: list[bytes] = []
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                out = d.decompress(data[pos:], WARC_MAX_RECORD + 1)
            except zlib.error:
                break
            if len(out) > WARC_MAX_RECORD or not d.eof:
                break  # inflate bomb or truncated member
            members.append(out)
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
    else:
        members.append(data)
    for blob in members:
        off = 0
        while off < len(blob):
            rec, off = _parse_one(blob, off)
            if rec is None:
                break
            rec["src_file"] = src
            records.append(rec)
    return records


def _parse_one(blob: bytes, off: int):
    # skip inter-record CRLFs
    while blob[off : off + 2] == _CRLF:
        off += 2
    if off >= len(blob):
        return None, off
    hdr_end = blob.find(_CRLF * 2, off)
    if hdr_end < 0:
        return None, off
    head = blob[off:hdr_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    if not lines[0].startswith("WARC/"):
        return None, off
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        fields[k.strip().lower()] = v.strip()
    try:
        clen = int(fields.get("content-length", ""))
    except ValueError:
        return None, off
    start = hdr_end + 4
    if clen < 0 or clen > WARC_MAX_RECORD or start + clen > len(blob):
        return None, off  # claims bytes the file does not ship
    content = blob[start : start + clen]
    rec = {
        "record_type": fields.get("warc-type", ""),
        "target_uri": fields.get("warc-target-uri", ""),
        "warc_date": fields.get("warc-date", ""),
        "status": None,
        "content_type": None,
        "payload": None,
    }
    ctype = fields.get("content-type", "")
    if rec["record_type"] == "response" and "msgtype=response" in ctype:
        he = content.find(_CRLF * 2)
        if he >= 0 and content[:5] == b"HTTP/":
            status_line = content[: content.find(_CRLF)].decode(
                "latin1", errors="replace"
            )
            parts = status_line.split()
            try:
                rec["status"] = int(parts[1])
            except (IndexError, ValueError):
                rec["status"] = None
            for ln in content[:he].split(_CRLF)[1:]:
                k, _, v = ln.partition(b":")
                if k.strip().lower() == b"content-type":
                    rec["content_type"] = v.strip().decode(
                        "latin1", errors="replace"
                    )
            rec["payload"] = content[he + 4 :]
    else:
        rec["payload"] = content
    return rec, start + clen


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan .warc(.gz) files into records. binaryFile source → Arrow-
    batched record walk; one task per file (WARC files are written
    partition-sized, so file count tracks upstream parallelism)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def walk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), src=str(p)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[f.name for f in READ_SCHEMA.fields],
                )

    return files.select("path", "content").mapInPandas(walk, READ_SCHEMA)
