"""Web link graph: extraction kernel vs scalar oracle, the invariance of
text extraction under links, and the graph operators' exactness."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.config import IndexOptions
from search_engine_ray.corpus.extract import (
    extract_text_batch,
    extract_text_oracle,
    html_from_text,
)
from search_engine_ray.corpus.links import (
    ANCHOR_WORDS,
    extract_links_batch,
    extract_links_oracle,
    link_anchor,
    link_targets_for_doc,
    link_url,
    nav_links_for_doc,
)
from search_engine_ray.corpus.pages import generate_pages_table


def _batch_links(htmls):
    parents, dst, anchor = extract_links_batch(pa.array(htmls, pa.binary()))
    return list(zip(parents.tolist(), dst.to_pylist(), anchor.to_pylist()))


def _oracle_links(htmls):
    out = []
    for i, h in enumerate(htmls):
        out.extend((i, d, a) for d, a in extract_links_oracle(h))
    return out


def test_no_links_html_byte_identical_to_pre_links_template():
    # links=None must keep the exact legacy template bytes (cache/golden
    # stability): re-derive the legacy form inline and compare.
    from search_engine_ray.corpus.extract import escape_text

    text, title, seed = "hello\nworld & <x>", "t & <y>", 5
    legacy = [
        "<html><head><title>",
        escape_text(title),
        '</title><meta charset="utf-8"></head><body>',
    ]
    for i, line in enumerate(text.split("\n")):
        if i > 0 and (seed + i) % 3 == 0:
            legacy.append(f"<!--noise {seed & 0xFFFF}:{i}-->")
        legacy.append(f'<p id="p{i}" class="c{i % 7}">{escape_text(line)}</p>')
    legacy.append("</body></html>")
    assert html_from_text(text, title, seed) == "".join(legacy).encode()
    assert html_from_text(text, title, seed, links=None) == "".join(legacy).encode()


def test_text_extraction_invariant_under_links():
    t = generate_pages_table(70, seed=9)
    assert extract_text_batch(t["html"]).to_pylist() == t["text"].to_pylist()
    for h, txt in zip(t["html"].to_pylist()[:20], t["text"].to_pylist()[:20]):
        assert extract_text_oracle(h) == txt


def test_extract_links_matches_oracle_on_corpus():
    t = generate_pages_table(70, seed=9)
    htmls = t["html"].to_pylist()
    assert _batch_links(htmls) == _oracle_links(htmls)
    # and the corpus really contains links
    assert len(_oracle_links(htmls)) > 50


def test_closed_form_rule_round_trips_through_html():
    n = 40
    for i in (0, 1, 3, 7, 39):
        links = nav_links_for_doc(i, n)
        html = html_from_text(f"body {i}", title=f"p{i}", noise_seed=i, links=links)
        got = extract_links_oracle(html)
        exp = [(link_url(d), link_anchor(d, j)) for j, d in link_targets_for_doc(i, n)]
        assert got == exp
        # anchors carry a raw '&' that must round-trip through escaping
        for _, a in got:
            assert " & " in a


anchor_text = st.text(
    alphabet=st.sampled_from(list("ab &<>9é")), min_size=0, max_size=12
).filter(lambda s: "</a" not in s and "<a " not in s)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.tuples(st.integers(0, 99), anchor_text), min_size=0, max_size=4),
        min_size=1,
        max_size=6,
    )
)
def test_extract_links_hypothesis(rows):
    htmls = []
    for links in rows:
        htmls.append(
            html_from_text(
                "some body text",
                title="t",
                links=[(f"https://h{d}.example/x{d}", a) for d, a in links],
            )
        )
    assert _batch_links(htmls) == _oracle_links(htmls)


def test_extract_links_handles_linkless_and_empty():
    htmls = [
        html_from_text("plain", title="t"),
        html_from_text("x", title="", links=[("https://a.example/", "")]),
    ]
    got = _batch_links(htmls)
    assert got == [(1, "https://a.example/", "")]


def test_host_degree_and_anchor_agg_exact(ray_session):
    from search_engine_ray.dataops.weblinks import anchor_agg, host_degree, link_edges

    n = 60
    t = generate_pages_table(n, seed=4)
    edges_ds = link_edges(ray.data.from_arrow(t))
    edges = edges_ds.to_pandas()

    hd = host_degree(edges_ds).to_pandas().set_index("host")
    import pandas as pd

    src_h = edges["src_url"].str.extract(r"^https?://(?:[^/@]*@)?([^/:?#]+)")[0]
    dst_h = edges["dst_url"].str.extract(r"^https?://(?:[^/@]*@)?([^/:?#]+)")[0]
    exp_out = src_h.value_counts()
    exp_in = dst_h.value_counts()
    for host in set(exp_out.index) | set(exp_in.index):
        assert hd.loc[host, "outdeg"] == exp_out.get(host, 0)
        assert hd.loc[host, "indeg"] == exp_in.get(host, 0)

    aa = anchor_agg(edges_ds).to_pandas().set_index("dst_url")
    exp = edges.groupby("dst_url").agg(
        n_inlinks=("anchor", "size"),
        n_src=("src_url", "nunique"),
        min_anchor=("anchor", "min"),
    )
    assert len(aa) == len(exp)
    for u, row in exp.iterrows():
        assert aa.loc[u, "n_inlinks"] == row["n_inlinks"]
        assert aa.loc[u, "n_src"] == row["n_src"]
        assert aa.loc[u, "min_anchor"] == row["min_anchor"]


def test_bm25_anchor_scores_brute_force(ray_session):
    from search_engine_ray.dataops.weblinks import bm25_anchor_scores, link_edges
    from search_engine_ray.text.tokenizer import normalize_text_oracle

    opts = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)
    n = 80
    t = generate_pages_table(n, seed=11)
    edges_ds = link_edges(ray.data.from_arrow(t))
    edges = edges_ds.to_pandas()
    query = [("spark", 1), ("join", 2)]

    got = bm25_anchor_scores(edges_ds, query, opts, k=10).to_pandas()

    # brute force: concatenated inbound anchors per target
    toks = {}
    for u, grp in edges.groupby("dst_url"):
        tok = []
        for a in grp["anchor"]:
            tok.extend(normalize_text_oracle(a, stemming=False))
        if tok:
            toks[u] = tok
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    df = {}
    for q, _ in query:
        df[q] = sum(1 for v in toks.values() if q in v)
    scores = {}
    for u, v in toks.items():
        s = 0.0
        for q, qtf in query:
            tf = v.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = np.log((N - df[q] + 0.5) / (df[q] + 0.5))
            s += qtf * idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if s != 0.0:
            scores[u] = s
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["dst_url"]) == [u for u, _ in exp]
    exp_micros = [int(np.floor(s * 1_000_000 + 0.5)) for _, s in exp]
    assert list(got["score_micros"]) == exp_micros


def test_reciprocal_host_pairs_and_frontier_schedule(ray_session):
    import ray.data

    from search_engine_ray.dataops.weblinks import (
        frontier_schedule,
        reciprocal_host_pairs,
    )

    def u(h, p):
        return f"https://{h}.example/{p}"

    rows = [
        (u("a", "1"), u("b", "2")),
        (u("a", "3"), u("b", "9")),
        (u("b", "1"), u("a", "2")),  # a<->b reciprocal: 2 links vs 1
        (u("a", "1"), u("c", "2")),  # a->c only
        (u("c", "5"), u("d", "1")),
        (u("d", "2"), u("c", "7")),  # c<->d reciprocal: 1 vs 1
        (u("e", "1"), u("e", "2")),  # intra-host, excluded
    ]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([r[0] for r in rows]),
                "dst_url": pa.array([r[1] for r in rows]),
                "anchor": pa.array(["x"] * len(rows)),
            }
        )
    )
    rec = (
        reciprocal_host_pairs(edges)
        .to_pandas()
        .sort_values(["host_a", "host_b"], ignore_index=True)
    )
    assert rec.to_dict("list") == {
        "host_a": ["a.example", "c.example"],
        "host_b": ["b.example", "d.example"],
        "ab_links": [2, 1],
        "ba_links": [1, 1],
    }
    # partition invariance
    rec2 = (
        reciprocal_host_pairs(edges.repartition(4))
        .to_pandas()
        .sort_values(["host_a", "host_b"], ignore_index=True)
    )
    assert rec2.equals(rec)

    sch = (
        frontier_schedule(edges, per_host_rate=1)
        .to_pandas()
        .sort_values(["host", "fetch_round", "url"], ignore_index=True)
    )
    by_url = dict(zip(sch["url"], sch["fetch_round"]))
    # b.example/2 has 2 inlinks -> fetched before b.example/9
    assert by_url[u("b", "2")] == 0 and by_url[u("b", "9")] == 1
    # rate 2: both b urls land in round 0
    sch2 = frontier_schedule(edges, per_host_rate=2).to_pandas()
    by2 = dict(zip(sch2["url"], sch2["fetch_round"]))
    assert by2[u("b", "2")] == 0 and by2[u("b", "9")] == 0
    with pytest.raises(ValueError):
        frontier_schedule(edges, per_host_rate=0)


def test_cocitation_pairs(ray_session):
    import ray.data

    from search_engine_ray.dataops.weblinks import cocitation_pairs

    # sources 1,2 both cite {10,11}; source 3 cites {10,11,12};
    # multi-edges (1->10 twice) must not inflate counts
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
                "dst": pa.array([10, 11, 10, 10, 11, 10, 11, 12], pa.int64()),
            }
        )
    )
    out = cocitation_pairs(edges, min_co=2).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["co"]))
    assert got == [(10, 11, 3)]
    out1 = cocitation_pairs(edges, min_co=1).to_pandas()
    got1 = sorted(zip(out1["a"], out1["b"], out1["co"]))
    assert got1 == [(10, 11, 3), (10, 12, 1), (11, 12, 1)]
    # skew cap: dropping source 3 (outdeg 3 > 2) removes its pairs
    capped = cocitation_pairs(edges, min_co=1, max_out=2).to_pandas()
    assert sorted(zip(capped["a"], capped["b"], capped["co"])) == [(10, 11, 2)]
    # partition invariance
    rep = cocitation_pairs(edges.repartition(5), min_co=1).to_pandas()
    assert sorted(zip(rep["a"], rep["b"], rep["co"])) == got1
