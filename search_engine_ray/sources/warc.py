"""WARC (Web ARChive, ISO 28500) ingestion — the container format Common
Crawl ships.  The engine's native corpus is the extracted parquet shape
``(url, warc_ts, html, ...)`` (corpus/pages.py); this module converts /
streams WARC **response** records into it.

Format (public spec, ISO 28500 / WARC 1.0-1.1): a WARC file is a
sequence of records; each record is a version line (``WARC/1.0\\r\\n``),
CRLF-separated named headers up to a blank line, exactly
``Content-Length`` payload bytes, then a ``\\r\\n\\r\\n`` separator.  A
*response* record's payload is an HTTP response (status line + headers +
blank line + body); the html body is the payload after the HTTP header
block.  Only ``WARC-Type: response`` records with a ``WARC-Target-URI``
are ingested; request / metadata / warcinfo / resource records are
skipped (the Common Crawl layout interleaves them).

gzip: Common Crawl ``.warc.gz`` files are concatenated per-record gzip
members; ``gzip.decompress`` handles multi-member streams, so ``.gz``
inputs route through the same byte parser.

Scale shape mirrors sources/trec.py: conversion is an embarrassingly
parallel one-task-per-file map (a file's records must stay contiguous
and in file order for deterministic docIDs), resumable with the
input-set manifest guard; ``read_warc`` streams via
``read_binary_files`` for ad-hoc pipelines.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_CRLF2 = b"\r\n\r\n"
_VERSION = b"WARC/"


def _parse_warc_date(s: str) -> int:
    """WARC-Date (ISO 8601, UTC 'Z') -> epoch microseconds.  Fractional
    seconds are optional per WARC 1.1."""
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def parse_warc_bytes(
    data: bytes,
) -> tuple[list[str], list[int], list[bytes]]:
    """(target URIs, epoch-us timestamps, html payload bytes) for the
    response records of one (decompressed) WARC file."""
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    pos = 0
    while True:
        s = data.find(_VERSION, pos)
        if s < 0:
            break
        he = data.find(_CRLF2, s)
        if he < 0:
            break
        headers: dict[str, str] = {}
        for line in data[s:he].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        payload = data[he + 4 : he + 4 + clen]
        pos = he + 4 + clen
        if headers.get("warc-type", "").lower() != "response":
            continue
        uri = headers.get("warc-target-uri", "")
        if not uri:
            continue
        try:
            ts = _parse_warc_date(headers.get("warc-date", ""))
        except ValueError:
            continue  # malformed record: quarantine-by-skip, never crash
        # the HTTP header block (if present) ends at the first CRLFCRLF;
        # identity payloads (no HTTP envelope) are taken whole
        if payload[:5] == b"HTTP/":
            be = payload.find(_CRLF2)
            body = payload[be + 4 :] if be >= 0 else b""
        else:
            body = payload
        urls.append(uri)
        tss.append(ts)
        htmls.append(body)
    return urls, tss, htmls


def write_warc(table: pa.Table, path: str, compress: bool = False) -> int:
    """Write (url, warc_ts, html) rows as WARC 1.0 response records (for
    tests and the roundtrip gate; this engine never re-exports WARC in
    production).  Returns the record count."""
    chunks: list[bytes] = []
    urls = table["url"].to_pylist()
    tss = table["warc_ts"].to_pylist()
    htmls = table["html"].to_pylist()
    for url, ts, html in zip(urls, tss, htmls):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        rec = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
        ).encode() + http + _CRLF2
        chunks.append(gzip.compress(rec) if compress else rec)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tmp", "wb") as fh:
        fh.write(b"".join(chunks))
    os.replace(path + ".tmp", path)
    return len(urls)


def _read_warc_file(path: str) -> bytes:
    with open(path, "rb") as fh:
        data = fh.read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)  # handles concatenated members
    return data


def _list_warc_files(src: str | list[str]) -> list[str]:
    if isinstance(src, str):
        if os.path.isdir(src):
            return sorted(
                os.path.join(src, f)
                for f in os.listdir(src)
                if os.path.isfile(os.path.join(src, f))
            )
        return [src]
    return sorted(src)


def _file_table(path: str) -> pa.Table:
    urls, tss, htmls = parse_warc_bytes(_read_warc_file(path))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def warc_to_parquet(
    src: str | list[str],
    out_dir: str,
    row_group_size: int = 2048,
) -> list[str]:
    """Convert WARC file(s)/directory into the engine's pages parquet
    layout (columns ``url, warc_ts, html``); one parquet per input file
    named by sorted rank, resumable with the input-set manifest guard
    (the trec_to_parquet protocol — a changed input set clears derived
    outputs so rank-shifts can't produce a silently wrong corpus)."""
    import json

    import ray.data

    files = _list_warc_files(src)
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, ".warc_inputs.json")
    current = [[p_, os.path.getsize(p_), os.path.getmtime(p_)] for p_ in files]
    prior = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            prior = json.load(fh)
    if prior != current:
        for f in os.listdir(out_dir):
            if f.endswith(".parquet"):
                os.remove(os.path.join(out_dir, f))
        with open(manifest_path + ".tmp", "w") as fh:
            json.dump(current, fh)
        os.replace(manifest_path + ".tmp", manifest_path)
    jobs = [
        {"path": p, "out": os.path.join(out_dir, f"part-{i:06d}.parquet")}
        for i, p in enumerate(files)
    ]

    def convert(batch: dict) -> pa.Table:
        done = []
        for path, out in zip(batch["path"], batch["out"]):
            if not os.path.exists(out):
                tbl = _file_table(str(path))
                pq.write_table(tbl, str(out) + ".tmp", row_group_size=row_group_size)
                os.replace(str(out) + ".tmp", str(out))
            done.append(str(out))
        return pa.table({"out": pa.array(done, pa.string())})

    out = ray.data.from_items(jobs).map_batches(convert, batch_size=1, num_cpus=1)
    return sorted(r["out"] for r in out.take_all())


def read_warc(src: str | list[str]):
    """WARC corpus as a streaming Dataset of (url, warc_ts, html) rows —
    ``read_binary_files`` -> per-file boundary parse, no conversion step.
    Use ``warc_to_parquet`` + ``build_index`` when deterministic docIDs
    are needed (index builds)."""
    import ray.data

    ds = ray.data.read_binary_files(_list_warc_files(src), include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for payload in batch["bytes"].to_pylist():
            # gate on the gzip magic, not the filename: Arrow's filesystem
            # layer under read_binary_files already auto-decompresses .gz
            if payload[:2] == b"\x1f\x8b":
                payload = gzip.decompress(payload)
            u, t, h = parse_warc_bytes(payload)
            urls.extend(u)
            tss.extend(t)
            htmls.extend(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(
                    np.asarray(tss, dtype="datetime64[us]"), pa.timestamp("us")
                ),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
