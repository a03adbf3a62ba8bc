"""Unigram LM scoring and DSIR importance weights (dataops/lm.py)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.config import IndexOptions
from search_engine_ray.dataops.lm import (
    _logp_micros,
    dsir_importance_weights,
    train_unigram_lm,
    unigram_counts,
    unigram_lm_scores,
)
from search_engine_ray.text.tokenizer import normalize_text_oracle

OPTS = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)

TEXTS = [
    "spark hash join hash",
    "window sort merge sort sort",
    "spark window",
    "",
    "the a with",  # all stopwords -> zero kept tokens
]
DOC_IDS = list(range(100, 100 + len(TEXTS)))


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)})
    )


def _brute_tokens():
    return {
        d: normalize_text_oracle(t, case_folding=True, remove_stopwords=True, stemming=False)
        for d, t in zip(DOC_IDS, TEXTS)
    }


def test_unigram_counts(docs_ds):
    got = dict(
        zip(*(unigram_counts(docs_ds, OPTS).sort("term").to_pandas()[c] for c in ("term", "count")))
    )
    exp = {}
    for toks in _brute_tokens().values():
        for t in toks:
            exp[t] = exp.get(t, 0) + 1
    assert got == exp


def test_logp_micros_matches_scalar():
    c = np.array([1, 2, 7], dtype=np.int64)
    m = _logp_micros(c, 10)
    exp = [math.floor(math.log(x / 10.0) * 1_000_000 + 0.5) for x in c]
    assert m.tolist() == exp


def test_unigram_lm_scores_self(docs_ds):
    out = (
        unigram_lm_scores(docs_ds, OPTS)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    toks = _brute_tokens()
    counts = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    for d, ts in toks.items():
        exp_sum = sum(
            math.floor(math.log(counts[t] / total) * 1_000_000 + 0.5) for t in ts
        )
        assert out.loc[d, "n_tokens"] == len(ts)
        assert out.loc[d, "sum_logp_micros"] == exp_sum


def test_unigram_lm_oov_floor(docs_ds, ray_session):
    import ray.data

    lm = train_unigram_lm(docs_ds, OPTS)
    _, _, total = lm
    other = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["zzzunknown zzzunknown"])})
    )
    out = unigram_lm_scores(other, OPTS, lm=lm).to_pandas()
    oov = math.floor(math.log(1.0 / (total + 1)) * 1_000_000 + 0.5)
    assert out["sum_logp_micros"].iloc[0] == 2 * oov
    assert out["n_tokens"].iloc[0] == 2


def _md5be_bucket(token: str, n_buckets: int) -> int:
    h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
    return h % n_buckets


def test_dsir_importance_weights(docs_ds, ray_session):
    import ray.data

    B = 64
    target_texts = TEXTS[:2]
    target = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(target_texts)}
        )
    )
    got = (
        dsir_importance_weights(docs_ds, target, n_buckets=B)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    def ws_tokens(text):
        return [t for t in text.split() if t]

    c_raw = np.zeros(B, np.int64)
    for t in TEXTS:
        for tok in ws_tokens(t):
            c_raw[_md5be_bucket(tok, B)] += 1
    c_tgt = np.zeros(B, np.int64)
    for t in target_texts:
        for tok in ws_tokens(t):
            c_tgt[_md5be_bucket(tok, B)] += 1
    R, T = c_raw.sum(), c_tgt.sum()
    ratio = _logp_micros(c_tgt + 1, int(T) + B) - _logp_micros(c_raw + 1, int(R) + B)

    for d, text in zip(DOC_IDS, TEXTS):
        toks = ws_tokens(text)
        exp = int(sum(ratio[_md5be_bucket(t, B)] for t in toks))
        assert got.loc[d, "n_tokens"] == len(toks)
        assert got.loc[d, "weight_micros"] == exp

    # docs drawn from the target distribution must out-weigh per-token
    tgt_rows = got.loc[[100, 101]]
    other_rows = got.loc[[102]]
    assert (
        tgt_rows["weight_micros"] / tgt_rows["n_tokens"]
    ).mean() > 0 or (other_rows["weight_micros"] <= tgt_rows["weight_micros"].max()).all()
