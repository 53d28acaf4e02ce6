"""WARC(.gz) source — Common Crawl's native container, read natively.

The north rule's input is an "Iceberg table of Common-Crawl-style web
pages"; the crawl itself ships as WARC files (ISO 28500): per-record
gzip members, each holding a WARC header block + an HTTP response.
This module ingests that format straight into the pages schema
(url, warc_ts, html, text, lang) — the path a real deployment runs
BEFORE the engine's parquet/Iceberg tables exist.

Scale model: one ``.warc.gz`` file per task via Spark's ``binaryFile``
source — exactly how crawl archives are processed in practice (the
gzip stream is not block-splittable; Common Crawl publishes ~1 GB
files in the tens of thousands, so parallelism comes from file count,
and ``spark.sql.files.maxPartitionBytes`` is irrelevant here). Records
are parsed inside one Arrow stage; malformed records degrade to
skipped, never task failures.

The writer produces real archives for tests/fixtures and round-trip
proofs: each record is an independent gzip member (the Common Crawl
convention — readers can seek to member boundaries), ``mtime=0`` so
output is byte-deterministic, and EVERY partition writes its own
file from the executor (the driver only collects paths + counts, so
no corpus bytes ever funnel through it). A petabyte-scale WARC
*sink* would wrap the same per-partition write in a Hadoop
OutputFormat commit protocol.

Non-response records (warcinfo, request, metadata) are skipped.
``text/plain`` payloads land in the ``text`` column, everything else
(html, pdf, junk) in ``html`` — the same routing contract
``sources/pages.synthesize_pages`` produces, which is what lets the
flagship construction oracle verify a WARC-fed extraction run
bit-for-bit (catalog query ``warc_extraction``).
"""

from __future__ import annotations

import datetime
import gzip
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF2 = b"\r\n\r\n"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


# ----------------------------------------------------------------- write
def build_warc_record(
    url: str,
    ts: datetime.datetime,
    payload: bytes,
    content_type: str,
    lang: str | None = None,
) -> bytes:
    """One WARC response record wrapping an HTTP/1.1 200 response."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + b"Content-Type: " + content_type.encode("ascii") + b"\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii"),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    if lang:
        headers.append(
            b"WARC-Identified-Content-Language: " + lang.encode("ascii")
        )
    return b"\r\n".join(headers) + _CRLF2 + http + _CRLF2


def pages_to_warc_files(
    pages: DataFrame, out_dir: str, n_files: int = 8
) -> list[str]:
    """Pages rows -> up to ``n_files`` real ``.warc.gz`` files under
    ``out_dir``. Each partition builds, gzips AND WRITES its own
    archive from the executor (temp file + ``os.replace`` so reruns
    are atomic), yielding only (path, n_records) back — the driver
    never holds archive bytes, so the write path scales with file
    count, not corpus size. Byte-determinism contract: the
    url-hash repartition fixes which file each record lands in, the
    in-partition url sort fixes member order, and ``mtime=0`` fixes
    the gzip bytes — two runs produce identical files. At petabyte
    scale ``out_dir`` is a shared filesystem path (HDFS/S3 fuse); a
    Hadoop OutputFormat sink remains the module-docstring story."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def member(row) -> bytes:
        if row.text is not None:
            payload, ctype = row.text.encode("utf-8"), "text/plain; charset=utf-8"
        else:
            payload, ctype = bytes(row.html), "application/octet-stream"
        rec = build_warc_record(row.url, row.warc_ts, payload, ctype, row.lang)
        return gzip.compress(rec, 6, mtime=0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        from pyspark import TaskContext

        # one partition may arrive as several Arrow batches: gather
        # them all before sorting, or member order would depend on
        # batch boundaries
        parts = list(batches)
        if not parts:
            return
        pdf = _pd.concat(parts, ignore_index=True)
        if not len(pdf):
            return
        # shuffle-fetch order is NOT deterministic: sort by url inside
        # the partition so two runs concatenate members in identical
        # order (the byte-determinism contract)
        pdf = pdf.sort_values("url", kind="mergesort")
        # repartition(n, "url") maps urls to partition ids by hash —
        # deterministic, so the file name is stable across runs
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = f"{path}.inprogress-{os.getpid()}"
        with open(tmp, "wb") as f:
            for row in pdf.itertuples(index=False):
                f.write(member(row))
        os.replace(tmp, path)
        yield _pd.DataFrame({"path": [path], "n_records": [len(pdf)]})

    # the collect is bounded by FILE count (one tiny row per non-empty
    # partition), never by corpus size
    rows = (
        pages.repartition(n_files, "url")
        .mapInPandas(run, "path string, n_records long")
        .collect()
    )
    return sorted(r.path for r in rows)


# ------------------------------------------------------------------ read
def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext (zlib
    member loop; gzip.decompress also handles multi-member, but the
    explicit loop recovers cleanly from trailing garbage)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=47)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return bytes(out)


def parse_warc(stream: bytes) -> list[dict]:
    """Decompressed WARC stream -> list of response-record dicts
    (url, warc_ts, payload, content_type, lang). Malformed records
    stop the scan for that file (degrade, never raise)."""
    out = []
    pos = 0
    n = len(stream)
    while pos < n:
        if stream[pos : pos + 5] != b"WARC/":
            nxt = stream.find(b"WARC/1.", pos)
            if nxt == -1:
                break
            pos = nxt
        hdr_end = stream.find(_CRLF2, pos)
        if hdr_end == -1:
            break
        headers = {}
        for line in stream[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        body = stream[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # trailing \r\n\r\n
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = None
        try:
            ts = datetime.datetime.strptime(
                headers.get(b"warc-date", b"").decode("ascii"),
                "%Y-%m-%dT%H:%M:%SZ",
            )
        except ValueError:
            pass
        lang = headers.get(b"warc-identified-content-language")
        http_end = body.find(_CRLF2)
        if http_end == -1:
            continue
        ctype = b""
        for line in body[:http_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-type":
                ctype = v.strip()
        out.append(
            {
                "url": url,
                "warc_ts": ts,
                "payload": body[http_end + 4 :],
                "content_type": ctype.decode("latin-1"),
                "lang": lang.decode("ascii") if lang else None,
            }
        )
    return out


def read_warc(
    spark: SparkSession, path: str, with_provenance: bool = False
) -> DataFrame:
    """``.warc.gz`` files -> pages DataFrame (url, warc_ts, html,
    text, lang). One file per task (binaryFile source).
    ``with_provenance`` appends ``warc_file`` — which archive each
    page came from (the lineage column a crawl pipeline records so a
    bad extraction can be traced to its source file and that one file
    reprocessed); the extraction plan's column pruning drops it for
    free when unused."""
    cols = ["content"] + (["path"] if with_provenance else [])
    files = spark.read.format("binaryFile").load(path).select(*cols)
    out_cols = ("url", "warc_ts", "html", "text", "lang") + (
        ("warc_file",) if with_provenance else ()
    )
    schema = (
        PAGES_SCHEMA
        if not with_provenance
        else T.StructType(PAGES_SCHEMA.fields + [T.StructField("warc_file", T.StringType(), True)])
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in out_cols}
            paths = pdf["path"] if with_provenance else [None] * len(pdf)
            for content, src in zip(pdf["content"], paths):
                for rec in parse_warc(_gunzip_members(bytes(content))):
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(rec["warc_ts"])
                    if rec["content_type"].startswith("text/plain"):
                        rows["html"].append(None)
                        rows["text"].append(
                            rec["payload"].decode("utf-8", "replace")
                        )
                    else:
                        rows["html"].append(rec["payload"])
                        rows["text"].append(None)
                    rows["lang"].append(rec["lang"])
                    if with_provenance:
                        rows["warc_file"].append(src)
            yield pd.DataFrame(rows)

    return files.mapInPandas(run, schema=schema)
