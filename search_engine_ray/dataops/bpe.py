"""Byte-pair-encoding merge training — the tokenizer-training stage of an
LLM data pipeline, in the shape production trainers (HF tokenizers,
SentencePiece in BPE mode) actually use at scale:

1. the CORPUS-sized work is one distributed pass: whitespace word counts
   (the pinned class, text/ws.py) folded by a groupby-sum, with the
   ``min_count`` floor and ``max_vocab`` cap applied INSIDE the Dataset
   (the train_unigram_lm convention — at 100 TB the distinct-word tail is
   10^9+ rows and must never reach the driver);
2. the merge loop itself runs driver-side over the bounded (word, count)
   table — O(vocab x word_len) per merge, independent of corpus size.
   This is not a shortcut: BPE merges are inherently sequential (merge
   r+1 depends on the text as rewritten by merge r), so the standard
   algorithm IS "distributed count once, iterate on the dictionary".

Determinism: the merge at each rank is the adjacent symbol pair with the
highest count, ties broken by the lexicographically smallest (lhs,
rhs).  Pair counting is positional (``"aaa"`` contributes (a,a)
twice); merge application is greedy left-to-right — the Sennrich 2016
conventions.  No end-of-word marker (symbols start as the word's code
points), documented so oracles can reproduce rank 1 in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..text.ws import ws_token_flat


def word_counts(
    ds: ray.data.Dataset,
    text_column: str = "text",
    min_count: int = 2,
    max_vocab: int | None = 50_000,
    max_driver_rows: int = 2_000_000,
) -> pa.Table:
    """Pruned (word, count) over whitespace words — the only corpus pass.
    Prune runs inside the Dataset; the driver receives <= max_vocab rows,
    sorted by word ascending.  ``max_vocab=None`` (explicitly unbounded)
    still fail-louds above ``max_driver_rows`` distinct words rather than
    silently materializing a corpus-scale vocabulary on the driver (the
    ``max_boiler`` convention)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = ws_token_flat(batch[text_column])
        if len(flat) == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        denc = flat.dictionary_encode()
        counts = np.bincount(
            np.asarray(denc.indices, dtype=np.int64), minlength=len(denc.dictionary)
        )
        return pa.table(
            {
                "word": denc.dictionary.cast(pa.string()),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    cds = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("count", alias_name="count"))
    )
    if min_count > 1:
        cds = cds.filter(expr=f"count >= {min_count}")
    if max_vocab is not None:
        cds = cds.sort(["count", "word"], descending=[True, False]).limit(max_vocab)
    else:
        cds = cds.materialize()  # vocab-sized; count is free afterwards
        n_words = cds.count()
        if n_words > max_driver_rows:
            raise ValueError(
                f"word_counts: {n_words} distinct words exceed "
                f"max_driver_rows={max_driver_rows} with max_vocab=None — "
                "set max_vocab (or raise min_count) to keep the collect "
                "driver-sized"
            )
    out = cds.sort("word").to_pandas()
    return pa.table(
        {
            "word": pa.array(out["word"], pa.string()),
            "count": pa.array(out["count"].astype(np.int64), pa.int64()),
        }
    )


def _pair_counts(words: list[tuple[str, ...]], counts: np.ndarray) -> dict:
    pc_: dict[tuple[str, str], int] = {}
    for syms, c in zip(words, counts):
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            pc_[pair] = pc_.get(pair, 0) + int(c)
    return pc_


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    joined = pair[0] + pair[1]
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    ds: ray.data.Dataset,
    n_merges: int = 30,
    text_column: str = "text",
    min_count: int = 2,
    max_vocab: int | None = 50_000,
    counts: pa.Table | None = None,
) -> pa.Table:
    """-> (rank, lhs, rhs, count): the first ``n_merges`` BPE merges.
    ``counts`` short-circuits the corpus pass (pass a precomputed
    :func:`word_counts` table).  Stops early when no pair repeats."""
    if counts is None:
        counts = word_counts(ds, text_column, min_count, max_vocab)
    words = [tuple(w) for w in counts["word"].to_pylist()]
    freqs = np.asarray(counts["count"], dtype=np.int64)

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    merge_counts: list[int] = []
    for rank in range(1, n_merges + 1):
        pcounts = _pair_counts(words, freqs)
        if not pcounts:
            break
        # highest count, ties -> lexicographically smallest (left, right)
        best = min(pcounts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        if c < 2:
            break  # nothing repeats; further merges are arbitrary
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        merge_counts.append(c)
        pair = (left, right)
        words = [
            _merge_word(s, pair) if left in s else s for s in words
        ]
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "lhs": pa.array(lefts, pa.string()),
            "rhs": pa.array(rights, pa.string()),
            "count": pa.array(merge_counts, pa.int64()),
        }
    )


def top_pair_counts(
    ds: ray.data.Dataset,
    k: int = 20,
    text_column: str = "text",
    min_count: int = 2,
    max_vocab: int | None = 50_000,
) -> pa.Table:
    """The rank-1 iteration's full pair table: top-k adjacent CHARACTER
    pairs weighted by pruned word counts (count desc, then (lhs, rhs)
    asc) — the SQL-checkable face of BPE training."""
    counts = word_counts(ds, text_column, min_count, max_vocab)
    pcounts = _pair_counts(
        [tuple(w) for w in counts["word"].to_pylist()],
        np.asarray(counts["count"], dtype=np.int64),
    )
    rows = sorted(pcounts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "lhs": pa.array([p[0] for p, _ in rows], pa.string()),
            "rhs": pa.array([p[1] for p, _ in rows], pa.string()),
            "count": pa.array([c for _, c in rows], pa.int64()),
        }
    )


class _BPEEncoder:
    """Actor-pool encode stage: the merge ranks build ONCE per actor
    (``__init__``), and a per-actor word->length memo persists across
    batches — under a Zipf vocabulary most words in every later batch
    are already encoded."""

    def __init__(self, merges_ref):
        ranks_tbl = ray.get(merges_ref)
        self.ranks = {
            (l, r): i
            for i, (l, r) in enumerate(
                zip(ranks_tbl["lhs"].to_pylist(), ranks_tbl["rhs"].to_pylist())
            )
        }
        self.memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self.memo.get(word)
        if n is not None:
            return n
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            syms = list(_merge_word(tuple(syms), best_pair))
        self.memo[word] = len(syms)
        return len(syms)

    def __call__(
        self, batch: pa.Table, text_column: str = "text", id_column: str = "doc_id"
    ) -> pa.Table:
        from ..text.ws import WS_RE

        lists = pc.split_pattern_regex(
            pc.fill_null(batch[text_column], ""), pattern=WS_RE
        )
        flat = pc.list_flatten(lists)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        lens_pre = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(lens_pre)), lens_pre)[nonempty]
        flat = flat.filter(pa.array(nonempty))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        out = np.zeros(len(lens_pre), dtype=np.int64)
        if len(flat):
            denc = flat.dictionary_encode()
            # encode each DISTINCT word once (memo persists across batches)
            uniq_lens = np.fromiter(
                (self._encode_len(w) for w in denc.dictionary.to_pylist()),
                dtype=np.int64,
                count=len(denc.dictionary),
            )
            per_token = uniq_lens[np.asarray(denc.indices, dtype=np.int64)]
            np.add.at(out, doc_idx, per_token)
        return pa.table(
            {id_column: batch[id_column], "n_bpe_tokens": pa.array(out)}
        )


def bpe_encode_counts(
    ds: ray.data.Dataset,
    merges: pa.Table,
    text_column: str = "text",
    id_column: str = "doc_id",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Per-doc token count under the TRAINED merge list — the encode side
    of BPE, as an ACTOR-POOL stage: merge ranks are broadcast once
    (``ray.put``) and built per actor in ``__init__``; a per-actor word
    memo amortizes encoding across batches (Zipf vocabulary: later
    batches are nearly all memo hits).  Greedy lowest-rank merging — the
    GPT-2 ``bpe()`` loop — applied to whitespace words of the pinned
    class."""
    merges_ref = ray.put(merges.select(["lhs", "rhs"]).combine_chunks())
    return ds.map_batches(
        _BPEEncoder,
        fn_constructor_args=(merges_ref,),
        fn_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
