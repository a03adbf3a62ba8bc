"""TREC ``<DOC>``/``<DOCNO>`` corpus ingestion — the reference engine's
native input format (/root/reference/src/Indexing/Parser.cs:14-110).

Reference semantics reproduced:

- a document starts at ``<DOCNO>``; its id is the ASCII bytes up to
  ``</DOCNO>``, whitespace-trimmed (Parser.cs:69);
- its content is every byte after ``</DOCNO>`` up to the next ``</DOC>``
  EXCLUDING the byte immediately before the tag (Parser.cs:98 computes
  length ``i - start - docStop.Length`` with ``i`` at the tag's last byte —
  the preceding byte, usually a newline, is dropped; reproduced exactly);
  the raw TREC text keeps its tags: the reference feeds it straight to the
  tokenizer, whose XML-tag filter (M2) drops ``<tag>`` tokens, so ingestion
  does NOT run the HTML extractor;
- bytes outside <DOCNO>...</DOC> spans are ignored.

Documented deviation: Parser.cs matches tags with a naive reset-on-mismatch
state machine that can MISS a tag immediately preceded by its own first
byte (e.g. ``<<DOCNO>``); this implementation uses standard substring
search, which finds it.  Well-formed TREC collections (tags at line starts)
are byte-identical under both.

Scale shape: ``trec_to_parquet`` converts a TREC directory into the
engine's parquet corpus layout with ONE parquet file per input file, named
by the input file's rank in sorted order — docID assignment then inherits
the standard deterministic fragment planning (engine/reader.plan_fragments)
and the conversion itself is an embarrassingly parallel map over files
(each task reads one file, parses, writes one parquet; re-runs skip files
whose output already exists, so conversion is resumable).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

_DOCNO, _DOCNO_END, _DOC_END = b"<DOCNO>", b"</DOCNO>", b"</DOC>"


def parse_trec_bytes(data: bytes) -> tuple[list[str], list[bytes]]:
    """(doc ids, raw content bytes) for one TREC file."""
    ids: list[str] = []
    contents: list[bytes] = []
    pos = 0
    while True:
        s = data.find(_DOCNO, pos)
        if s < 0:
            break
        e = data.find(_DOCNO_END, s + len(_DOCNO))
        if e < 0:
            break
        doc_id = data[s + len(_DOCNO) : e].decode("ascii", "replace").strip()
        c_start = e + len(_DOCNO_END)
        stop = data.find(_DOC_END, c_start)
        if stop < 0:
            break
        ids.append(doc_id)
        # Parser.cs:98 takes length i - start - docStop.Length with i at the
        # LAST byte of "</DOC>", which drops the byte immediately preceding
        # the tag (usually the newline) — reproduced exactly; tokenization
        # is unaffected (the dropped byte is a delimiter) but raw-content
        # comparisons against the reference are byte-identical this way
        contents.append(data[c_start : max(c_start, stop - 1)])
        pos = stop + len(_DOC_END)
    return ids, contents


def _list_trec_files(src: str | list[str]) -> list[str]:
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
    with open(path, "rb") as fh:
        ids, contents = parse_trec_bytes(fh.read())
    return pa.table(
        {
            "doc_name": pa.array(ids, pa.string()),
            "text": pa.array([c.decode("utf-8", "replace") for c in contents], pa.string()),
        }
    )


def trec_to_parquet(
    src: str | list[str],
    out_dir: str,
    row_group_size: int = 2048,
) -> list[str]:
    """Convert a TREC directory/file list into the engine's parquet corpus
    layout (columns ``doc_name``, ``text``); returns the written paths.

    Distributed: one Ray-Data task per input file (each file's docs must
    stay contiguous and in file order for deterministic docIDs, so a file
    is the natural work unit); output files are named by sorted input rank
    so ``plan_fragments`` sees the same order as the reference's directory
    scan.  Existing outputs are skipped (resumable)."""
    import json

    import ray.data

    files = _list_trec_files(src)
    os.makedirs(out_dir, exist_ok=True)
    # Resume is keyed on the INPUT FILE SET, not on output-rank existence:
    # rank-named outputs from a previous run over a different file list
    # would silently produce a wrong corpus (e.g. adding a file that sorts
    # first shifts every rank).  A manifest records the inputs; any change
    # clears the derived outputs before reconverting (r2 review finding).
    manifest_path = os.path.join(out_dir, ".trec_inputs.json")
    # identity = (path, size, mtime): an in-place re-download of the same
    # filename must also invalidate its derived output
    current = [
        [p_, os.path.getsize(p_), os.path.getmtime(p_)] for p_ in files
    ]
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


def read_trec(src: str | list[str]):
    """TREC corpus as a streaming Dataset of (doc_name, text) rows —
    ``read_binary_files`` -> vectorized boundary parse, no conversion step.
    Use ``trec_to_parquet`` + ``build_index`` when deterministic docIDs are
    needed (index builds); this reader is for ad-hoc dataops pipelines."""
    import ray.data

    ds = ray.data.read_binary_files(_list_trec_files(src), include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        texts: list[str] = []
        for payload in batch["bytes"].to_pylist():
            ids, contents = parse_trec_bytes(payload)
            names.extend(ids)
            texts.extend(c.decode("utf-8", "replace") for c in contents)
        return pa.table(
            {"doc_name": pa.array(names, pa.string()), "text": pa.array(texts, pa.string())}
        )

    return ds.map_batches(parse, batch_format="pyarrow")
