"""Deliberately-slow, obviously-correct oracle index.

Transcribes the reference's posting-construction semantics
(/root/reference/src/Indexing/WriteableIndex.cs:54-69 ``AddWord`` +
PostingList.cs:26-72): per (term, doc) consecutive adds fold into a term
frequency, posting lists are docID-sorted by construction, and
``doc_len`` counts every kept token (WriteableIndex.cs:68).

The engine's Ray-built index must decode-equal this structure
(tests/test_index_build.py), and the oracle scorers in ``scorers.py``
consume it to produce golden run files.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import IndexOptions
from ..text.tokenizer import normalize_text_oracle


@dataclass
class OracleIndex:
    options: IndexOptions
    doc_names: list[str] = field(default_factory=list)
    doc_lens: list[int] = field(default_factory=list)
    # term -> parallel lists (doc_ids ascending, tfs)
    postings: dict[str, tuple[list[int], list[int]]] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doc_names)

    @property
    def avgdl(self) -> float:
        # ReadableIndex.cs:52-59 — mean of per-doc kept-token counts.
        return sum(self.doc_lens) / len(self.doc_lens)

    def add_document(self, name: str, text: str) -> int:
        doc_id = len(self.doc_names)
        self.doc_names.append(name)
        self.doc_lens.append(0)
        for term in normalize_text_oracle(
            text,
            case_folding=self.options.case_folding,
            remove_stopwords=self.options.remove_stopwords,
            stemming=self.options.stemming,
        ):
            self._add_word(term, doc_id)
        return doc_id

    def _add_word(self, term: str, doc_id: int) -> None:
        entry = self.postings.get(term)
        if entry is None:
            self.postings[term] = ([doc_id], [1])
        else:
            doc_ids, tfs = entry
            if doc_ids[-1] == doc_id:
                tfs[-1] += 1
            else:
                doc_ids.append(doc_id)
                tfs.append(1)
        self.doc_lens[doc_id] += 1

    @staticmethod
    def build(docs: list[tuple[str, str]], options: IndexOptions | None = None) -> "OracleIndex":
        idx = OracleIndex(options=options or IndexOptions())
        for name, text in docs:
            idx.add_document(name, text)
        return idx

    def df(self, term: str) -> int:
        entry = self.postings.get(term)
        return 0 if entry is None else len(entry[0])
