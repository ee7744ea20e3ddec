"""WARC source — the container format web crawls actually ship in
(ISO 28500; Common Crawl publishes .warc/.warc.gz).

Design: one Spark task per WARC FILE via the built-in ``binaryFile``
data source, with the record split done in an Arrow ``mapInPandas``
pass.  File-level (not record-level) parallelism is the right
granularity here — production WARCs are gzip members, and gzip is not
splittable, so per-file work is what a real cluster gets anyway; a
100 TB crawl is millions of ~1 GB files, which parallelizes fine.
Gzipped inputs are detected by magic bytes and inflated in-process.

The parser is a plain public-spec implementation: records are
``WARC/1.x`` header blocks (CRLF-separated ``Name: value`` lines,
terminated by an empty line) followed by ``Content-Length`` payload
bytes and a CRLF CRLF record separator.  For ``response`` records the
HTTP envelope is split off so ``body`` is the actual page bytes.
Malformed tails degrade to fewer records, never an error.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "source_file string, record_idx int, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, body binary"
)


def _parse_warc_bytes(data: bytes, source: str) -> list[dict]:
    rows: list[dict] = []
    pos, n, idx = 0, len(data), 0
    while pos < n:
        # seek the next record marker (tolerates leading separators)
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        if len(payload) < length:
            break  # truncated tail degrades
        pos = hdr_end + 4 + length
        wtype = headers.get("warc-type", "")
        status, http_ct, body = None, None, payload
        if wtype == "response" and payload[:5] == b"HTTP/":
            he = payload.find(b"\r\n\r\n")
            if he >= 0:
                lines = payload[:he].split(b"\r\n")
                parts = lines[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in lines[1:]:
                    k, sep, v = line.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        http_ct = v.strip().decode("latin-1")
                body = payload[he + 4 :]
        rows.append(
            {
                "source_file": source,
                "record_idx": idx,
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "http_status": status,
                "http_content_type": http_ct,
                "body": body,
            }
        )
        idx += 1
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC (or gzipped WARC) files into one row per record:
    ``(source_file, record_idx, warc_type, target_uri, warc_date,
    content_type, http_status, http_content_type, body)`` — for
    ``response`` records ``body`` is the page bytes with the HTTP
    envelope split off into status/content-type.

    ``path`` accepts the same globs as ``binaryFile`` (e.g.
    ``dir/*.warc.gz``).  Downstream, ``body`` feeds the HTML/URL/
    multimodal operators directly (``strip_html_col``,
    ``web_link_graph``, the manifest parsers)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "source_file", "record_idx", "warc_type", "target_uri",
            "warc_date", "content_type", "http_status",
            "http_content_type", "body",
        ]
        for pdf in batches:
            rows: list[dict] = []
            for fp, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = gzip.decompress(data)
                    except OSError:
                        continue  # corrupt member degrades to no rows
                rows.extend(_parse_warc_bytes(data, fp))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
