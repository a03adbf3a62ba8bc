"""Training-data operators: dedup, similarity search, text stats, windows,
multimodal plumbing — checked against slow exact computations."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_exact_dedup(docs_ds, docs_tbl):
    from search_engine_ray.dataops.dedup import exact_dedup

    # plant duplicates by unioning a copy with shifted ids
    import ray.data

    dup = docs_tbl.set_column(0, "doc_id", pa.array(np.asarray(docs_tbl["doc_id"]) + 10_000))
    ds = docs_ds.union(ray.data.from_arrow(dup))
    out = exact_dedup(ds).to_pandas()
    assert len(out) == docs_tbl.num_rows  # every text appears twice -> one row
    assert (out["n_copies"] == 2).all()
    assert (out["keep_doc_id"] < 10_000).all()  # min id kept
    # hash agrees with md5 semantics
    texts = {hashlib.md5(t.encode()).hexdigest() for t in docs_tbl["text"].to_pylist()}
    assert set(out["dup_key"]) == texts


def test_minhash_lsh_finds_near_dups(docs_ds, docs_tbl, ray_session):
    import ray.data

    from search_engine_ray.dataops.dedup import minhash_lsh_pairs

    # construct near-duplicates: copy 5 docs with a few words changed
    base = docs_tbl.to_pandas().head(5)
    mutated = base.copy()
    mutated["doc_id"] = mutated["doc_id"] + 10_000
    mutated["text"] = mutated["text"].str.replace("table", "tableX", regex=False)
    ds = docs_ds.union(ray.data.from_pandas(mutated))
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    for did in base["doc_id"]:
        assert (did, did + 10_000) in found, (did, sorted(found)[:10])


def test_simhash_near_for_near_texts(docs_ds, ray_session):
    import ray.data

    from search_engine_ray.dataops.dedup import simhash

    out = simhash(docs_ds).to_pandas().sort_values("doc_id")
    assert len(out) == docs_ds.count()
    assert out["simhash"].nunique() > len(out) * 0.9  # mostly distinct

    # a doc and its light mutation differ in few bits
    tbl = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(1)
    mut = tbl.copy()
    mut["doc_id"] = [1_000_000]
    mut["text"] = tbl["text"].str.replace("value", "valueX", regex=False)
    two = simhash(ray.data.from_pandas(pd.concat([tbl, mut]))).to_pandas()
    a, b = np.uint64(two["simhash"].iloc[0]), np.uint64(two["simhash"].iloc[1])
    assert bin(int(a) ^ int(b)).count("1") <= 16


def test_simhash_hamming_pairs_matches_brute(docs_ds, ray_session):
    """Banded pigeonhole == brute-force all-pairs popcount, pairs emitted
    exactly once (first agreeing band), partition-invariant."""
    import ray.data

    from search_engine_ray.dataops.dedup import (
        _popcount64,
        simhash,
        simhash_hamming_pairs,
    )

    base = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(40)
    mut = base.head(6).copy()
    mut["doc_id"] = mut["doc_id"] + 50_000
    mut["text"] = mut["text"].str.replace("the", "thee", regex=False)
    df = pd.concat([base, mut], ignore_index=True)
    ds = ray.data.from_pandas(df)

    for max_dist in (0, 3, 7):
        got = simhash_hamming_pairs(ds, max_dist=max_dist).to_pandas()
        got_pairs = sorted(zip(got["a"], got["b"], got["dist"]))
        sh = simhash(ds).to_pandas().sort_values("doc_id", ignore_index=True)
        ids = sh["doc_id"].to_numpy(np.int64)
        h = sh["simhash"].to_numpy(np.int64).view(np.uint64)
        ai, bi = np.triu_indices(len(ids), k=1)
        d = _popcount64(h[ai] ^ h[bi])
        keep = d <= max_dist
        exp_pairs = sorted(zip(ids[ai[keep]], ids[bi[keep]], d[keep]))
        assert got_pairs == exp_pairs, (max_dist, got_pairs[:5], exp_pairs[:5])
        # no duplicate emissions across bands
        assert len({(a, b) for a, b, _ in got_pairs}) == len(got_pairs)
    # mutations must be found at the loose threshold
    loose = simhash_hamming_pairs(ds, max_dist=15).to_pandas()
    found = set(zip(loose["a"], loose["b"]))
    hits = sum((did, did + 50_000) in found for did in mut["doc_id"] - 50_000)
    assert hits >= 4, sorted(found)[:10]
    # partition invariance
    rep = simhash_hamming_pairs(ds.repartition(7), max_dist=3).to_pandas()
    assert sorted(zip(rep["a"], rep["b"], rep["dist"])) == sorted(
        zip(*(simhash_hamming_pairs(ds, max_dist=3).to_pandas()[c] for c in ("a", "b", "dist")))
    )


def test_ngram_containment_asymmetry(ray_session):
    """A short doc quoted inside a long one: containment(short->long)
    is high while Jaccard is small — the case the directed measure
    exists for."""
    import ray.data

    from search_engine_ray.dataops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long = filler + " " + short + " " + " ".join(f"z{i} q{i}" for i in range(40))
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": [short, long]})
    )
    cont = ngram_containment_pairs(ds, n=3, threshold=0.5).to_pandas()
    by = {(r.src, r.dst): r.containment for r in cont.itertuples()}
    assert by.get((1, 2), 0) == 1.0  # every short shingle appears in long
    assert (2, 1) not in by  # the long doc is NOT contained in the short
    jac = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
    assert len(jac) == 0  # jaccard misses it entirely
    # symmetric duplicates: both directions emitted
    dup = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [7, 8], "text": [short, short]})
    )
    both = ngram_containment_pairs(dup, n=3, threshold=0.9).to_pandas()
    got = {(r.src, r.dst): r.containment for r in both.itertuples()}
    assert got == {(7, 8): 1.0, (8, 7): 1.0}


def test_simhash_hamming_pairs_bucket_cap_and_validation(ray_session):
    import ray.data

    from search_engine_ray.dataops.dedup import simhash_hamming_pairs

    # identical texts all collide into one bucket; cap drops it
    df = pd.DataFrame({"doc_id": range(10), "text": ["same text here"] * 10})
    ds = ray.data.from_pandas(df)
    full = simhash_hamming_pairs(ds, max_dist=0).to_pandas()
    assert len(full) == 45  # all C(10,2) identical pairs, dist 0
    assert (full["dist"] == 0).all()
    capped = simhash_hamming_pairs(ds, max_dist=0, max_bucket=5).to_pandas()
    assert len(capped) == 0
    with pytest.raises(ValueError):
        simhash_hamming_pairs(ds, max_dist=16)


def test_ngram_jaccard_pairs(ray_session):
    import ray.data

    from search_engine_ray.dataops.dedup import ngram_jaccard_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon eta",   # shares 3 of the 4-ish shingles
                "completely different words entirely here now",
            ],
        }
    )
    out = ngram_jaccard_pairs(ray.data.from_pandas(df), n=3, threshold=0.1).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # exact value: doc1 shingles {abc,bcd,cde,dez}, doc2 {abc,bcd,cde,dee'} -> 3 common of 5 union... verify computed
    row = out[(out["a"] == 1) & (out["b"] == 2)].iloc[0]
    assert 0 < row["jaccard"] < 1


def test_knn_brute_force_exact(emb_ds, emb_tbl):
    from search_engine_ray.dataops.similarity import knn_brute_force

    emb = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    ids = np.asarray(emb_tbl["vec_id"])
    queries = emb[:3]
    out = knn_brute_force(emb_ds, queries, k=5).to_pandas()
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for qi in range(3):
        sims = norm @ (norm[qi])
        order = np.lexsort((ids, -sims))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == ids[order].tolist()
        np.testing.assert_allclose(got["cos_sim"], sims[order], atol=1e-12)


def test_knn_lsh_recall(emb_ds, emb_tbl):
    from search_engine_ray.dataops.similarity import knn_brute_force, knn_lsh

    emb = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    queries = emb[:3]
    exact = knn_brute_force(emb_ds, queries, k=10).to_pandas()
    approx = knn_lsh(emb_ds, queries, k=10, n_planes=6).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_knn_ivf_recall(emb_ds, emb_tbl):
    from search_engine_ray.dataops.similarity import knn_brute_force, knn_ivf

    emb = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    queries = emb[:3]
    exact = knn_brute_force(emb_ds, queries, k=10).to_pandas()
    approx = knn_ivf(emb_ds, queries, k=10, n_centroids=8, nprobe=3).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls
    # determinism: same seed -> same result
    again = knn_ivf(emb_ds, queries, k=10, n_centroids=8, nprobe=3).to_pandas()
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_embedding_near_dup(emb_ds, emb_tbl, ray_session):
    import ray.data

    from search_engine_ray.dataops.similarity import embedding_near_dup_pairs

    # plant one exact duplicate vector (keep the list<float> arrow type)
    extra = emb_tbl.slice(0, 1).set_column(
        emb_tbl.schema.get_field_index("vec_id"), "vec_id", pa.array([999_999], pa.int64())
    )
    ds = emb_ds.union(ray.data.from_arrow(extra))
    pairs = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
    assert ((pairs["a"] == t0_id(emb_tbl)) & (pairs["b"] == 999_999)).any()


def t0_id(emb_tbl):
    return int(emb_tbl["vec_id"][0].as_py())


def test_token_count_and_quality(docs_ds, docs_tbl):
    from search_engine_ray.dataops.textstats import quality_scores, token_counts

    out = token_counts(docs_ds).to_pandas().sort_values("doc_id")
    expected = [len(t.split()) for t in docs_tbl["text"].to_pylist()]
    assert out["n_tokens"].tolist() == expected

    q = quality_scores(docs_ds).to_pandas().sort_values("doc_id")
    assert (q["n_chars"].to_numpy() == np.asarray(docs_tbl["n_chars"])).all()
    assert ((q["stop_ratio"] >= 0) & (q["stop_ratio"] <= 1)).all()
    assert ((q["alpha_ratio"] > 0) & (q["alpha_ratio"] <= 1)).all()


def test_lang_id_runs_deterministic(docs_ds):
    from search_engine_ray.dataops.textstats import lang_id

    a = lang_id(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = lang_id(docs_ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["pred_lang"]) <= {"en", "de", "fr", "es", "zh"}


def test_fingerprints(docs_ds, docs_tbl, ray_session):
    import ray.data

    from search_engine_ray.dataops.textstats import fingerprints

    out = fingerprints(docs_ds).to_pandas().sort_values("doc_id")
    assert out["doc_hash"].nunique() == len(out)
    # identical text -> identical fingerprint
    df = docs_tbl.to_pandas().head(2)
    df2 = df.copy()
    df2["doc_id"] = df2["doc_id"] + 500
    both = fingerprints(ray.data.from_pandas(pd.concat([df, df2]))).to_pandas()
    h = both.sort_values("doc_id")["doc_hash"].to_numpy()
    assert (h[:2] == h[2:]).all()


def test_tumbling_window(ray_session):
    import ray.data

    from search_engine_ray.dataops.windows import tumbling_window_agg

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    out = tumbling_window_agg(events, window_seconds=3600).to_pandas()
    # cross-check against pandas
    pdf = pq.read_table(f"{SF}/events.parquet").to_pandas()
    pdf["window_start_us"] = (pdf["ts"].astype("int64") // 3_600_000_000) * 3_600_000_000
    exp = (
        pdf.groupby(["event_type", "window_start_us"])
        .agg(n=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    merged = out.merge(
        exp, left_on=["key", "window_start_us"], right_on=["event_type", "window_start_us"]
    )
    assert len(merged) == len(exp) == len(out)
    assert (merged["n_x"] == merged["n_y"]).all()
    np.testing.assert_allclose(merged["sum_value_x"], merged["sum_value_y"], rtol=1e-12)


def test_sessionize(ray_session):
    import ray.data

    from search_engine_ray.dataops.windows import sessionize

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    out = sessionize(events, gap_seconds=600).to_pandas()
    assert (out["session_end_us"] >= out["session_start_us"]).all()
    pdf = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert out["n_events"].sum() == len(pdf)


def test_multimodal_plumbing(docs_tbl, ray_session):
    import ray.data

    from search_engine_ray.dataops.multimodal import (
        AudioFrameSampler,
        ImageDecoder,
        decode_images,
        sample_audio_frames,
        synthesize_media,
    )

    df = docs_tbl.to_pandas().head(20)
    media = synthesize_media(df["doc_id"].tolist(), df["text"].tolist(), kind="image")
    ds = ray.data.from_arrow(media)
    feats = decode_images(ds).to_pandas()
    assert len(feats) == 20
    assert (feats["decoder"] == "fake").all()
    assert all(len(e) == 16 for e in feats["embedding"])
    # deterministic: same payload -> same features
    again = ImageDecoder()(media)
    got = [list(map(float, e)) for e in feats.sort_values("media_id")["embedding"]]
    assert again["embedding"].to_pylist() == got

    audio = synthesize_media(df["doc_id"].tolist(), df["text"].tolist(), kind="audio")
    a = sample_audio_frames(ray.data.from_arrow(audio)).to_pandas()
    assert (a["n_frames_sampled"] == 8).all()

    with pytest.raises(NotImplementedError):
        ImageDecoder(strict=True)(media)
    with pytest.raises(NotImplementedError):
        AudioFrameSampler(strict=True)(audio)


def test_multimodal_real_decoders(ray_session):
    """PPM images and PCM16 WAVs are REALLY decoded (pure numpy, no deps) —
    including in strict mode, which only rejects undecodable payloads."""
    import struct

    from search_engine_ray.dataops.multimodal import AudioFrameSampler, ImageDecoder

    # 4x2 PPM with a comment in the header; pixel (y, x) gray value = y*10 + x
    w, h = 4, 2
    raster = bytes(
        v for y in range(h) for x in range(w) for v in (y * 10 + x,) * 3
    )
    ppm = b"P6\n# test comment\n%d %d\n255\n" % (w, h) + raster
    media = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([ppm], pa.binary()),
            "mime": pa.array(["image/x-portable-pixmap"]),
            "source_doc": pa.array([0], pa.int64()),
        }
    )
    out = ImageDecoder(strict=True)(media)  # strict: must NOT fall back to fake
    assert out["width"][0].as_py() == w and out["height"][0].as_py() == h
    assert out["decoder"][0].as_py() == "ppm"
    emb = np.asarray(out["embedding"][0].as_py())
    # 4x4 grid over a 2x4 image: first grid row covers pixel row 0 (gray 0..3)
    assert emb.min() >= 0.0 and emb.max() <= 1.0
    assert abs(emb[0] - 0.0) < 1e-6  # top-left cell = pixel (0,0) = 0/255

    # minimal PCM16 WAV: 8000 Hz mono, 16 samples of a known square wave
    rate, samples = 8000, np.asarray([16384, -16384] * 8, dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    audio = media.set_column(2, "payload", pa.array([wav], pa.binary()))
    a = AudioFrameSampler(n_frames=4, strict=True)(audio)
    assert a["sample_rate"][0].as_py() == rate
    assert a["n_samples"][0].as_py() == 16
    assert a["decoder"][0].as_py() == "wav"
    en = np.asarray(a["frame_energy"][0].as_py())
    assert np.allclose(en, 0.5, atol=1e-4)  # |±16384|/32768 RMS = 0.5


def test_fingerprint_vectorized_matches_per_doc_reference():
    """The batch-wide winnowing kernel must be value-identical to the
    straightforward per-doc computation, including the short-doc classes
    (empty, < k bytes, < window k-grams) and byte-identical unicode."""
    from search_engine_ray.dataops.textstats import fingerprint_batch

    k, window = 8, 4
    B = np.uint64(1099511628211)

    def ref_one(t: str):
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            if len(data):
                pos = np.arange(len(data), dtype=np.uint64)
                full = np.bitwise_xor.reduce(
                    (data + np.uint64(1)) * (pos * B + np.uint64(0x9E3779B9))
                )
            else:
                full = np.uint64(0)
            if len(data) >= k:
                acc = data[: len(data) - k + 1].copy()
                for j in range(1, k):
                    acc = acc * B + data[j : len(data) - k + 1 + j]
                if len(acc) >= window:
                    s = np.lib.stride_tricks.as_strided(
                        acc, (len(acc) - window + 1, window), (acc.strides[0],) * 2
                    )
                    fps = np.unique(s.min(axis=1))
                else:
                    fps = np.unique(acc)
            else:
                fps = np.asarray([full], dtype=np.uint64)
        return int(full), len(fps), int(fps.min())

    texts = [
        "",                      # empty
        "a",                     # 1 byte
        "abcdefg",               # k-1 bytes
        "abcdefgh",              # exactly k bytes -> 1 k-gram (< window)
        "abcdefghij",            # k-grams 1..window-1
        "the quick brown fox jumps over the lazy dog " * 3,
        "unicode é中文 bytes",  # multi-byte utf-8
        "aaaaaaaaaaaaaaaaaaaaa",  # repeated -> few distinct fingerprints
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = fingerprint_batch(batch, k=k, window=window)
    for i, t in enumerate(texts):
        full, nfp, mfp = ref_one(t)
        assert out["doc_hash"][i].as_py() == np.int64(np.uint64(full)).item(), i
        assert out["n_fingerprints"][i].as_py() == nfp, i
        assert out["min_fingerprint"][i].as_py() == np.int64(np.uint64(mfp)).item(), i


def test_persisted_ivf_index_probe(emb_ds, emb_tbl, ray_session, tmp_path):
    """build once -> pruned probe reads only nprobe partitions -> recall."""
    import os

    from search_engine_ray.dataops.similarity import (
        build_ivf_index,
        knn_brute_force,
        knn_ivf_probe,
    )

    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(emb_ds, idx, n_centroids=8)
    assert meta["n_centroids"] == 8
    parts = os.listdir(os.path.join(idx, "lists"))
    assert 1 < len(parts) <= 8 and all(p.startswith("centroid=") for p in parts)

    q = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()[:4]])
    k = 5
    approx = knn_ivf_probe(idx, q, k=k, nprobe=3).to_pandas()
    exact = knn_brute_force(emb_ds, q, k=k).to_pandas()
    recalls = []
    for qi in range(len(q)):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recalls.append(len(a & e) / k)
    assert np.mean(recalls) >= 0.6, recalls
    # nprobe = n_centroids degenerates to exact: full agreement
    full = knn_ivf_probe(idx, q, k=k, nprobe=8).to_pandas()
    assert full[["query_id", "vec_id"]].values.tolist() == exact[["query_id", "vec_id"]].values.tolist()


def test_persisted_lsh_index_probe(emb_ds, emb_tbl, ray_session, tmp_path):
    import os

    from search_engine_ray.dataops.similarity import (
        build_lsh_index,
        knn_brute_force,
        knn_lsh_probe,
    )

    dim = len(emb_tbl["embedding"][0].as_py())
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb_ds, idx, dim=dim, n_planes=5, n_tables=3)
    tables = os.listdir(os.path.join(idx, "buckets"))
    assert sorted(tables) == ["table=0", "table=1", "table=2"]

    q = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()[:4]])
    k = 5
    approx = knn_lsh_probe(idx, q, k=k).to_pandas()
    exact = knn_brute_force(emb_ds, q, k=k).to_pandas()
    recalls = []
    for qi in range(len(q)):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recalls.append(len(a & e) / k)
    # every query vector is itself in the corpus -> its own bucket always
    # probed -> rank-1 is always found
    assert np.mean(recalls) >= 0.4, recalls
    for qi in range(len(q)):
        top = exact[exact["query_id"] == qi].iloc[0]["vec_id"]
        assert top in set(approx[approx["query_id"] == qi]["vec_id"])


def test_hopping_window_agg(ray_session):
    """1h windows hopping every 30min: each event lands in exactly 2
    windows; per-window counts match a brute-force enumeration."""
    import ray.data

    from search_engine_ray.dataops.windows import hopping_window_agg

    events = ray.data.read_parquet(f"{SF}/events.parquet")
    out = hopping_window_agg(events, window_seconds=3600, hop_seconds=1800).to_pandas()
    n_events = events.count()
    assert out["n"].sum() == 2 * n_events  # explode factor k=2

    # brute force on the raw table
    raw = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ts = raw["ts"].astype("int64").to_numpy()  # datetime64[us] -> epoch us
    hop, win = 1_800_000_000, 3_600_000_000
    import collections
    exp = collections.Counter()
    for t, k in zip(ts, raw["event_type"]):
        base = (t // hop) * hop
        for j in range(2):
            s = base - j * hop
            if s <= t < s + win:
                exp[(k, s)] += 1
    got = {(r.key, r.window_start_us): r.n for r in out.itertuples()}
    assert got == dict(exp)

    with pytest.raises(ValueError):
        hopping_window_agg(events, window_seconds=3600, hop_seconds=1000)


def test_sampling_operators(docs_ds, docs_tbl, ray_session):
    """deterministic_sample is stable across partitionings; head_per_key
    and topk_by match the pandas reference exactly."""
    import ray.data

    from search_engine_ray.dataops.sample import (
        deterministic_sample,
        head_per_key,
        sample_hash,
        topk_by,
    )

    ids = np.asarray(docs_tbl["doc_id"], dtype=np.int64)
    got = np.sort(
        deterministic_sample(docs_ds, 0.2).to_pandas()["doc_id"].to_numpy()
    )
    exp = np.sort(ids[sample_hash(ids) < 200_000])
    assert got.tolist() == exp.tolist() and 0 < len(got) < len(ids)
    # identical survivors at a different partitioning
    got2 = np.sort(
        deterministic_sample(docs_ds.repartition(7), 0.2).to_pandas()["doc_id"].to_numpy()
    )
    assert got2.tolist() == got.tolist()

    df = docs_tbl.to_pandas()
    hp = head_per_key(docs_ds, "lang", 5).to_pandas()
    exp_hp = df.sort_values("doc_id").groupby("lang", sort=False).head(5)
    assert (
        hp.sort_values(["lang", "doc_id"])[["lang", "doc_id"]].values.tolist()
        == exp_hp.sort_values(["lang", "doc_id"])[["lang", "doc_id"]].values.tolist()
    )

    top = topk_by(docs_ds, "n_chars", 10).to_pandas()
    exp_top = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(10)
    assert top["doc_id"].tolist() == exp_top["doc_id"].tolist()
    bot = topk_by(docs_ds, "n_chars", 10, ascending=True).to_pandas()
    exp_bot = df.sort_values(["n_chars", "doc_id"], ascending=[True, True]).head(10)
    assert bot["doc_id"].tolist() == exp_bot["doc_id"].tolist()


def test_clean_operators(ray_session):
    """PII redaction, benchmark decontamination, repetition signals."""
    import ray.data

    from search_engine_ray.dataops.clean import (
        decontaminate,
        redact_pii,
        repetition_stats,
    )

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail me at alice.smith+x@example.org or call 555-123-4567 now",
                "server at 192.168.1.254 is fine; text untouched otherwise",
                "no pii here",
            ],
        }
    )
    out = redact_pii(ray.data.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["text"].iloc[0] == "mail me at <EMAIL> or call <PHONE> now"
    assert out["text"].iloc[1] == "server at <IP> is fine; text untouched otherwise"
    assert out["text"].iloc[2] == "no pii here"

    # decontamination: doc 1 shares an 8-gram with the test text, doc 2 not
    words = [f"w{i}" for i in range(12)]
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "prefix " + " ".join(words) + " suffix",
                " ".join(f"z{i}" for i in range(20)),
            ],
        }
    )
    flagged = (
        decontaminate(ray.data.from_pandas(corpus), [" ".join(words)], n=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert flagged["contaminated"].tolist() == [True, False]
    assert flagged["n_hits"].iloc[0] == 5  # 12-8+1 overlapping 8-grams
    dropped = decontaminate(
        ray.data.from_pandas(corpus), [" ".join(words)], n=8, mode="drop"
    ).to_pandas()
    assert dropped["doc_id"].tolist() == [2]

    rep = (
        repetition_stats(
            ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "doc_id": [0, 1],
                        "text": ["a b\na b\nc d\n\n", "x y z"],
                    }
                )
            )
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert rep.iloc[0][["n_lines", "n_distinct_lines", "n_tokens", "n_distinct_tokens"]].tolist() == [3, 2, 6, 4]
    assert rep.iloc[1][["n_lines", "n_distinct_lines", "n_tokens", "n_distinct_tokens"]].tolist() == [1, 1, 3, 3]


def test_dedup_apply_stages(docs_ds, docs_tbl, ray_session):
    """exact_dedup_apply keeps exactly the min-id row per content;
    near_dup_filter drops the higher-id member of each pair."""
    import ray.data

    from search_engine_ray.dataops.dedup import exact_dedup_apply, near_dup_filter

    dup = docs_tbl.set_column(
        0, "doc_id", pa.array(np.asarray(docs_tbl["doc_id"]) + 10_000)
    )
    ds = docs_ds.union(ray.data.from_arrow(dup))
    surv = exact_dedup_apply(ds).to_pandas()
    assert sorted(surv["doc_id"]) == sorted(docs_tbl["doc_id"].to_pylist())

    pairs = ray.data.from_pandas(
        pd.DataFrame({"a": [0, 0, 2], "b": [1, 3, 4], "est_jaccard": [0.9, 0.8, 0.95]})
    )
    kept = near_dup_filter(docs_ds, pairs).to_pandas()
    all_ids = set(docs_tbl["doc_id"].to_pylist())
    assert set(kept["doc_id"]) == all_ids - {1, 3, 4}


def test_empty_doc_batch_boundaries(ray_session):
    """r2 review regressions: trailing token-less docs must not crash
    simhash nor perturb the PREVIOUS doc's fingerprint; a doc's outputs
    must not depend on batch composition."""
    from search_engine_ray.dataops.dedup import simhash_batch
    from search_engine_ray.dataops.textstats import fingerprint_batch

    text = "hello world this is a doc"
    solo = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([text])})
    with_tail = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array([text, "", "   "])}
    )

    fp_solo = fingerprint_batch(solo)
    fp_tail = fingerprint_batch(with_tail)
    assert fp_tail["doc_hash"][0].as_py() == fp_solo["doc_hash"][0].as_py()
    assert fp_tail["min_fingerprint"][0].as_py() == fp_solo["min_fingerprint"][0].as_py()

    sh_solo = simhash_batch(solo)          # used to IndexError with a
    sh_tail = simhash_batch(with_tail)     # trailing empty doc
    assert sh_tail["simhash"][0].as_py() == sh_solo["simhash"][0].as_py()
    assert sh_tail["simhash"][1].as_py() == 0 and sh_tail["simhash"][2].as_py() == 0

    # leading/mid empties too
    mixed = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(["", text, ""])}
    )
    assert simhash_batch(mixed)["simhash"][1].as_py() == sh_solo["simhash"][0].as_py()
    assert fingerprint_batch(mixed)["doc_hash"][1].as_py() == fp_solo["doc_hash"][0].as_py()


def test_minhash_no_self_pairs_on_duplicated_rows(docs_tbl, ray_session):
    """A doc_id appearing twice in the input must not become its own
    near-dup pair (which would make near_dup_filter delete it)."""
    import ray.data

    from search_engine_ray.dataops.dedup import minhash_lsh_pairs

    two = docs_tbl.to_pandas().head(3)
    doubled = pd.concat([two, two])  # same doc_ids twice
    # plant one REAL near-dup so the expected output is nonempty
    mut = two.head(1).copy()
    mut["doc_id"] = [77_777]
    mut["text"] = mut["text"].str.replace("table", "tableX", regex=False)
    pairs = minhash_lsh_pairs(
        ray.data.from_pandas(pd.concat([doubled, mut])), threshold=0.5
    ).to_pandas()
    assert not (pairs["a"] == pairs["b"]).any()
    assert (int(two["doc_id"].iloc[0]), 77_777) in set(zip(pairs["a"], pairs["b"]))

    # all-duplicate corpus with no cross pairs: empty result, no crash
    empty = minhash_lsh_pairs(ray.data.from_pandas(doubled), threshold=0.5)
    assert empty.count() == 0


def test_connected_components_and_exact_filter(docs_ds, docs_tbl, ray_session):
    """Min-label propagation finds whole clusters; exact mode keeps only
    the min-id member even when the pair graph is not transitively closed
    (the case greedy mode over-keeps)."""
    import ray.data

    from search_engine_ray.dataops.dedup import connected_components, near_dup_filter

    # cluster {1,5,6,7,8} as a chain + cross edge; isolated pair {20,30}
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([5, 6, 7, 20, 1], pa.int64()),
                  "b": pa.array([6, 7, 8, 30, 6], pa.int64()),
                  "est_jaccard": pa.array([0.9] * 5)})
    )
    cc = connected_components(pairs).to_pandas().sort_values("doc_id")
    assert cc.values[:, :2].tolist() == [
        [1, 1], [5, 1], [6, 1], [7, 1], [8, 1], [20, 20], [30, 20]
    ]

    # greedy over-keep case: pairs (1,6) and (5,6) — 5 never appears as b
    tricky = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 5], pa.int64()), "b": pa.array([6, 6], pa.int64()),
                  "est_jaccard": pa.array([0.9, 0.9])})
    )
    all_ids = set(docs_tbl["doc_id"].to_pylist())
    greedy = near_dup_filter(docs_ds, tricky, mode="greedy").to_pandas()
    assert set(greedy["doc_id"]) == all_ids - {6}  # keeps 1 AND 5
    exact = near_dup_filter(docs_ds, tricky, mode="exact").to_pandas()
    assert set(exact["doc_id"]) == all_ids - {5, 6}  # keeps only the cluster min

    # empty pair set: corpus unchanged
    nothing = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "est_jaccard": pa.array([], pa.float64())})
    )
    assert near_dup_filter(docs_ds, nothing, mode="exact").count() == len(all_ids)


def test_paragraph_dedup(docs_ds, docs_tbl, ray_session):
    """Distributed paragraph dedup vs a driver-side exact computation, plus
    the boilerplate case: a paragraph shared by many docs keeps exactly its
    first (doc_id, para_idx) occurrence."""
    import ray.data

    from search_engine_ray.dataops.dedup import paragraph_dedup

    got = paragraph_dedup(docs_ds).to_pandas().set_index("para_key").sort_index()

    expected = {}
    for doc_id, text in zip(
        docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
    ):
        for idx, para in enumerate((text or "").split("\n"), 1):
            if not para:
                continue
            key = hashlib.md5(para.encode()).hexdigest()
            prev = expected.get(key)
            cand = (doc_id, idx)
            if prev is None:
                expected[key] = [cand, 1]
            else:
                expected[key][1] += 1
                if cand < prev[0]:
                    expected[key][0] = cand
    assert len(got) == len(expected)
    for key, ((d, i), n) in expected.items():
        row = got.loc[key]
        assert (int(row["keep_doc_id"]), int(row["keep_para_idx"]), int(row["n_copies"])) == (d, i, n)

    # boilerplate: the same footer in every doc -> one survivor, first doc
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 3, 9], pa.int64()),
            "text": pa.array(
                ["body a\nSHARED FOOTER", "body b\nSHARED FOOTER", "\nSHARED FOOTER"]
            ),
        }
    )
    out = paragraph_dedup(ray.data.from_arrow(tbl)).to_pandas()
    footer = out[out["n_copies"] == 3]
    assert len(footer) == 1
    assert int(footer.iloc[0]["keep_doc_id"]) == 3 and int(footer.iloc[0]["keep_para_idx"]) == 2


def test_exact_int_quantiles(docs_ds, docs_tbl, ray_session):
    from search_engine_ray.dataops.sample import exact_int_quantiles
    from search_engine_ray.dataops.textstats import token_counts

    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    got = exact_int_quantiles(token_counts(docs_ds), "n_tokens", qs=qs)
    counts = np.sort(
        np.array([len([t for t in (x or "").split() if t]) for x in docs_tbl["text"].to_pylist()])
    )
    n = len(counts)
    for q_micros, value in zip(got["q_micros"].to_pylist(), got["value"].to_pylist()):
        q = q_micros / 1e6
        # percentile_disc: value at ordinal ceil(q*n), 1-based
        exp = counts[max(1, int(np.ceil(q * n))) - 1]
        assert value == exp, (q, value, exp)


def test_grouped_int_quantiles(docs_ds, docs_tbl, ray_session):
    """Per-key percentile_disc == the per-group brute force, for every
    key and q, at several partitionings."""
    import pyarrow as pa

    from search_engine_ray.dataops.sample import grouped_int_quantiles
    from search_engine_ray.dataops.textstats import token_count_batch

    def with_lang(batch: pa.Table) -> pa.Table:
        return token_count_batch(batch).append_column("lang", batch["lang"])

    qs = (0.25, 0.5, 0.9)
    tl = docs_ds.map_batches(with_lang, batch_format="pyarrow")
    got = grouped_int_quantiles(tl, "lang", "n_tokens", qs=qs)

    langs = docs_tbl["lang"].to_pylist()
    texts = docs_tbl["text"].to_pylist()
    brute: dict[str, list[int]] = {}
    for lang, x in zip(langs, texts):
        brute.setdefault(lang, []).append(len([t for t in (x or "").split() if t]))
    rows = list(
        zip(
            got["lang"].to_pylist(),
            got["q_micros"].to_pylist(),
            got["value"].to_pylist(),
        )
    )
    assert [r[0] for r in rows] == sorted(r[0] for r in rows)
    assert len(rows) == len(brute) * len(qs)
    for lang, q_micros, value in rows:
        counts = np.sort(np.array(brute[lang]))
        exp = counts[max(1, int(np.ceil(q_micros / 1e6 * len(counts)))) - 1]
        assert value == exp, (lang, q_micros, value, exp)
    # partition invariance
    got7 = grouped_int_quantiles(
        docs_ds.repartition(7).map_batches(with_lang, batch_format="pyarrow"),
        "lang",
        "n_tokens",
        qs=qs,
    )
    assert got7.equals(got)


def test_incremental_dedup_against_store(docs_ds, docs_tbl, ray_session, tmp_path):
    """Daily-ingest shape: standing hash store + new batch -> survivors
    are exactly the unseen contents (and first-within-batch); with
    update_store a SECOND pass over the same batch drops everything."""
    import ray.data

    from search_engine_ray.dataops.dedup import build_hash_store, dedup_against_store

    store = str(tmp_path / "store")
    n_distinct = build_hash_store(docs_ds, store)
    assert n_distinct == docs_tbl.num_rows  # corpus has distinct texts

    # new batch: 3 docs copied from the corpus (seen), 2 genuinely new
    # texts (one duplicated inside the batch)
    base = docs_tbl.to_pandas().head(3)
    newdf = pd.DataFrame(
        {
            "doc_id": [90_001, 90_002, 90_003, 90_004, 90_005],
            "text": [
                base["text"].iloc[0],  # seen in store
                base["text"].iloc[1],  # seen in store
                "a genuinely new document about quasars",
                "another new document entirely",
                "a genuinely new document about quasars",  # intra-batch dup
            ],
        }
    )
    new_ds = ray.data.from_pandas(newdf).repartition(3)
    out = dedup_against_store(new_ds, store, update_store=True).to_pandas()
    assert sorted(out["doc_id"]) == [90_003, 90_004]  # min-id winner kept
    assert "dup_key" not in out.columns

    # the survivors' hashes were appended: replaying the batch yields none
    again = dedup_against_store(new_ds, store)
    assert again.count() == 0

    # a batch touching no existing bucket... (empty store dir case)
    empty_store = str(tmp_path / "empty")
    import os

    os.makedirs(empty_store)
    fresh = dedup_against_store(new_ds, empty_store).to_pandas()
    assert sorted(fresh["doc_id"]) == [90_001, 90_002, 90_003, 90_004]


def test_mix_sources(docs_ds, docs_tbl, ray_session):
    """Integer mixing plan matches brute force; membership is the
    deterministic id-hash; unweighted sources drop; invalid input raises."""
    from search_engine_ray.dataops.sample import mix_sources, sample_hash

    parts = {"src0": 5, "src1": 3, "src2": 1}
    sampled, plan = mix_sources(docs_ds, parts)
    df = docs_tbl.to_pandas()
    n = df.groupby("source").size().to_dict()
    k_scale = min(n[s] // w for s, w in parts.items())
    thr = {s: (w * k_scale * 1_000_000) // n[s] for s, w in parts.items()}
    assert plan["threshold_micros"].to_pylist() == [
        thr[s] for s in sorted(parts)
    ]
    out = sampled.to_pandas().sort_values("doc_id", ignore_index=True)
    h = sample_hash(df["doc_id"].to_numpy(np.int64))
    exp_keep = df[
        [thr.get(s, 0) > hv for s, hv in zip(df["source"], h)]
    ]["doc_id"].sort_values(ignore_index=True)
    assert out["doc_id"].tolist() == exp_keep.tolist()
    assert set(out["source"]) <= set(parts)
    # invariance to partitioning
    sampled2, _ = mix_sources(docs_ds.repartition(5), parts)
    assert sorted(sampled2.to_pandas()["doc_id"]) == out["doc_id"].tolist()
    with pytest.raises(ValueError, match="positive"):
        mix_sources(docs_ds, {"src0": 0})
    with pytest.raises(ValueError, match="no rows"):
        mix_sources(docs_ds, {"no_such_source": 1})
    # a weight larger than its source's row count cannot be satisfied
    # even once: loud error, not a silent empty corpus
    with pytest.raises(ValueError, match="fewer rows"):
        mix_sources(docs_ds, {"src0": 10_000_000})


def test_export_training_shards(docs_ds, docs_tbl, ray_session, tmp_path):
    """Deterministic hash sharding: manifest matches brute force, shard
    membership is partition-invariant, and the written files round-trip
    every row into its assigned shard."""
    import os

    import ray.data

    from search_engine_ray.dataops.export import export_training_shards, shard_of_ids

    out = str(tmp_path / "shards")
    manifest = export_training_shards(docs_ds, out, n_shards=8)
    ids = np.asarray(docs_tbl["doc_id"], dtype=np.int64)
    exp = np.bincount(shard_of_ids(ids, 8), minlength=8)
    assert manifest["shard"].to_pylist() == list(range(8))
    assert manifest["n_docs"].to_pylist() == exp.tolist()
    assert sum(manifest["n_docs"].to_pylist()) == len(ids)
    # re-export into the SAME dir must overwrite, not double-count
    m_again = export_training_shards(docs_ds, out, n_shards=8)
    assert m_again.equals(manifest)
    # round-trip: every row landed in its assigned partition
    back = ray.data.read_parquet(out).to_pandas()
    got_assign = dict(zip(back["doc_id"].astype(np.int64), back["shard"].astype(np.int64)))
    brute = dict(zip(ids, shard_of_ids(ids, 8)))
    assert got_assign == brute
    assert os.path.isdir(os.path.join(out, "shard=0"))
    # partition invariance of the manifest
    out2 = str(tmp_path / "shards2")
    m2 = export_training_shards(docs_ds.repartition(7), out2, n_shards=8)
    assert m2.equals(manifest)


def test_normalize_nfc(ray_session):
    """Composed == decomposed after NFC; ASCII untouched (fast path);
    matches Python's unicodedata on every row."""
    import unicodedata

    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.clean import normalize_nfc

    texts = [
        "cafe\u0301",  # decomposed e + combining acute -> café
        "café",  # precomposed
        "plain ascii only",
        "A\u030a ring",  # A + combining ring -> Å
        "",
        "ＡＢＣ fullwidth stays (NFC != NFKC)",
        "astral \U0001d518 ok",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
    )
    out = normalize_nfc(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    exp = [unicodedata.normalize("NFC", t) for t in texts]
    assert out["text"].tolist() == exp
    assert out["text"][0] == out["text"][1] == "café"
    assert out["text"][5].startswith("Ａ")  # NFC keeps fullwidth


def test_grouped_int_quantiles_empty(ray_session):
    """Zero input rows -> typed empty table, not a concat crash (found by
    code review)."""
    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.sample import grouped_int_quantiles

    ds = ray.data.from_arrow(
        pa.table(
            {"lang": pa.array([], pa.string()), "n_tokens": pa.array([], pa.int64())}
        )
    )
    got = grouped_int_quantiles(ds, "lang", "n_tokens")
    assert got.num_rows == 0
    assert got.column_names == ["lang", "q_micros", "value"]
    assert got.schema.field("lang").type == pa.string()


def test_semantic_dedup_matches_brute_force(emb_ds, emb_tbl, ray_session):
    """SemDeDup == the single-machine reference: same deterministic
    centroids, same assignment, drop j iff some lower-id clustermate has
    cos >= tau; partition-invariant."""
    from search_engine_ray.dataops.cluster import semantic_dedup

    k, tau = 4, 0.35  # low tau so random vectors produce real drops
    got = semantic_dedup(emb_ds, k=k, tau=tau).to_pandas()
    got = got.sort_values("vec_id", ignore_index=True)

    ids = np.asarray(emb_tbl["vec_id"], dtype=np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    cents = m[:k]
    d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ cents.T) + (cents * cents).sum(1)[None, :]
    assign = np.argmin(d2, axis=1)
    mn = m / np.linalg.norm(m, axis=1)[:, None]
    keep = np.ones(len(ids), dtype=bool)
    for j in range(len(ids)):
        for i in range(j):
            if assign[i] == assign[j] and mn[i] @ mn[j] >= tau:
                keep[j] = False
                break
    assert int((~keep).sum()) > 0, "fixture must produce drops"
    assert got["vec_id"].tolist() == ids.tolist()
    assert got["cluster"].tolist() == assign.tolist()
    assert got["keep"].tolist() == keep.tolist()

    got3 = semantic_dedup(emb_ds.repartition(3), k=k, tau=tau).to_pandas()
    got3 = got3.sort_values("vec_id", ignore_index=True)
    assert got3["keep"].tolist() == keep.tolist()


def test_kmeans_matches_numpy_reference(emb_ds, emb_tbl, ray_session):
    """Distributed Lloyd's == single-machine numpy Lloyd's: same init (k
    lowest ids), same iteration count -> identical assignments and
    centroids (to float tolerance)."""
    from search_engine_ray.dataops.cluster import kmeans_fit

    k, iters = 4, 3
    cents, assign = kmeans_fit(emb_ds, k=k, n_iter=iters)
    got = assign.to_pandas().set_index("vec_id")["cluster"].sort_index()

    ids = np.asarray(emb_tbl["vec_id"].to_pylist())
    m = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    ref_c = m[:k].copy()
    for _ in range(iters):
        d2 = ((m[:, None, :] - ref_c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                ref_c[c] = m[a == c].mean(axis=0)
    d2 = ((m[:, None, :] - ref_c[None, :, :]) ** 2).sum(axis=2)
    ref_a = np.argmin(d2, axis=1)

    np.testing.assert_allclose(cents, ref_c, rtol=1e-9, atol=1e-12)
    assert (got.loc[ids].to_numpy() == ref_a).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """A centroid that captures no points must stay where it was (no NaNs,
    no resample)."""
    import ray.data

    from search_engine_ray.dataops.cluster import kmeans_fit

    # vec 0 and 1 are far outliers used as init; all later points cluster
    # near vec 1's side, so centroid 0 keeps exactly vec 0's position
    vecs = [[100.0, 100.0], [0.0, 0.0]] + [[0.1 * i, 0.0] for i in range(1, 9)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    cents, assign = kmeans_fit(ray.data.from_arrow(tbl), k=2, n_iter=2)
    a = assign.to_pandas().set_index("vec_id")["cluster"]
    assert a.loc[0] == 0 and (a.drop(0) == 1).all()
    np.testing.assert_allclose(cents[0], [100.0, 100.0])


def test_stratified_sample(docs_ds, docs_tbl, ray_session):
    """Per-stratum keep-fractions applied via the stable id-hash — exact
    kept-set equality vs a driver-side evaluation of the same hash."""
    from search_engine_ray.dataops.sample import sample_hash, stratified_sample

    fr = {"src0": 1.0, "src1": 0.4}
    got = (
        stratified_sample(docs_ds, "source", fr, default_fraction=0.1)
        .to_pandas()["doc_id"]
        .sort_values()
        .to_numpy()
    )
    ids = np.asarray(docs_tbl["doc_id"].to_pylist())
    srcs = docs_tbl["source"].to_pylist()
    thr = np.array([int(round(fr.get(s, 0.1) * 1_000_000)) for s in srcs])
    exp = np.sort(ids[sample_hash(ids) < thr])
    assert (got == exp).all()
    # src0 keeps everything
    src0 = {i for i, s in zip(ids, srcs) if s == "src0"}
    assert src0 <= set(got)


def test_gopher_quality_rules(ray_session):
    """Gopher-rule signals on constructed edge cases: bullets, ellipses,
    symbol density, stop-word diversity, and the empty doc."""
    import ray.data

    from search_engine_ray.dataops.textstats import gopher_quality

    good = "the quick brown fox jumps over the lazy dog and that have with " * 5
    bullets = "\n".join("- item %d here" % i for i in range(10))
    dots = "the and " + "wait... " * 30
    hashes = "the and " + "# " * 50
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([good, bullets, dots, hashes, ""]),
        }
    )
    out = (
        gopher_quality(ray.data.from_arrow(tbl), min_words=30, min_stop_words=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[0, "gopher_pass"])
    assert out.loc[0, "n_stop_words"] == 5  # the, and, that, have, with
    # bullets: every line bullet-started -> fails the 90% bullet rule
    assert out.loc[1, "n_bullet_lines"] == 10 and not out.loc[1, "gopher_pass"]
    # ellipsis doc: '...' runs counted non-overlapping, fails symbol ratio
    assert out.loc[2, "n_symbols"] == 30 and not out.loc[2, "gopher_pass"]
    # hash doc: 50 '#' vs 52 words -> symbol/word >= 0.1 fails
    assert out.loc[3, "n_symbols"] == 50 and not out.loc[3, "gopher_pass"]
    # empty doc: zero everything, one line, fails
    assert out.loc[4, "n_words"] == 0 and out.loc[4, "n_lines"] == 1
    assert not out.loc[4, "gopher_pass"]


def test_url_parts_edges(ray_session):
    """Normalization edge cases: userinfo, default vs non-default ports,
    tracking-param removal around kept params, multi-label suffixes,
    non-URL rows pass through with null host/domain."""
    from search_engine_ray.dataops.urlops import url_parts_batch

    urls = [
        "HTTPS://U:P@WWW.News.Example.CO.UK:443/Path?utm_source=f&q=En&utm_medium=x#frag",
        "http://example.com:8080/a?ref=z&keep=1",
        "https://sub.shop.com.au/x?fbclid=abc",
        "not a url",
        "https://localhost/x",
    ]
    t = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()), "url": pa.array(urls)})
    out = url_parts_batch(t, keep_columns=("doc_id",)).to_pylist()
    assert out[0]["url_norm"] == "https://www.news.example.co.uk/Path?q=En"
    assert out[0]["domain"] == "example.co.uk"
    assert out[1]["url_norm"] == "http://example.com:8080/a?keep=1"
    assert out[1]["host"] == "example.com"
    assert out[2]["url_norm"] == "https://sub.shop.com.au/x"
    assert out[2]["domain"] == "shop.com.au"
    assert out[3]["host"] is None and out[3]["url_norm"] == "not a url"
    assert out[4]["domain"] == "localhost"


def test_top_ngrams(ray_session):
    """Bigram counts: no cross-document bigrams, ties break by n-gram
    ascending, k cut is deterministic."""
    import ray.data

    from search_engine_ray.dataops.textstats import top_ngrams

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c", "c a b", "b c  a"],
        }
    )
    out = top_ngrams(ray.data.from_pandas(df), n=2, k=3)
    rows = list(zip(out["ngram"].to_pylist(), out["cnt"].to_pylist()))
    # bigrams: d1 {a b, b c}, d2 {c a, a b}, d3 {b c, c a} -> each of the
    # three distinct bigrams has count 2; ties -> lexical ascending
    assert rows == [("a b", 2), ("b c", 2), ("c a", 2)]
    # trigram across all docs: only within-doc windows
    out3 = top_ngrams(ray.data.from_pandas(df), n=3, k=10)
    assert sorted(out3["ngram"].to_pylist()) == ["a b c", "b c a", "c a b"]


def test_ivfpq_index_probe(emb_ds, emb_tbl, ray_session, tmp_path):
    """IVF-PQ: 16-byte codes, pruned ADC probe, recall vs brute force,
    deterministic rebuild."""
    from search_engine_ray.dataops.similarity import (
        build_ivfpq_index,
        knn_brute_force,
        knn_ivfpq_probe,
    )

    emb = np.stack([np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()])
    queries = emb[:3]
    idx = str(tmp_path / "ivfpq")
    meta = build_ivfpq_index(emb_ds, idx, n_centroids=8, m_subspaces=16)
    assert meta["m_subspaces"] == 16
    # codes really are m bytes per vector
    import glob as _glob

    files = _glob.glob(f"{idx}/lists/centroid=*/*.parquet")
    assert files, "partitioned inverted lists missing"
    t = pq.read_table(files[0])
    assert all(len(c) == 16 for c in t["code"].to_pylist())

    exact = knn_brute_force(emb_ds, queries, k=10).to_pandas()
    approx = knn_ivfpq_probe(idx, queries, k=10, nprobe=6).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls

    again = knn_ivfpq_probe(idx, queries, k=10, nprobe=6).to_pandas()
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_curate_web_corpus(ray_session):
    """Composed web curation: domain cap, exact dedup, Gopher gate, and
    decontamination each drop exactly the docs they should."""
    import pyarrow as pa
    import ray.data

    from search_engine_ray.pipelines import curate_web_corpus

    def good(d):
        # 36 words, mean length in [3,10], 'the' satisfies the stop-word
        # minimum, all words alphanumeric; vocab disjoint across docs so
        # no cross-doc 8-grams exist
        return "the " + " ".join(f"d{d}w{j}" for j in range(35))

    rows = [
        (0, "https://a.com/1", good(0)),   # the decontamination test doc
        (1, "https://a.com/2", good(1)),
        (2, "https://a.com/3", good(2)),
        (3, "https://a.com/4", good(3)),   # 4th on a.com -> domain-capped
        (4, "https://b.com/1", good(1)),   # exact dup of doc1 -> deduped
        (5, "https://c.com/1", "short text"),  # fails Gopher min_words
        (6, "https://d.com/1", good(6)),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = curate_web_corpus(ds, test_texts=[rows[0][2]], domain_cap_n=3).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 6]


def test_topk_per_key(ray_session):
    """Grouped top-k equals the brute-force per-key ranking; partials
    bound the shuffle (every batch emits <= k rows per key)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.sample import topk_per_key

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "grp": rng.integers(0, 7, size=n),
            "val": rng.integers(0, 50, size=n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    for ascending in (False, True):
        got = topk_per_key(
            ds, "grp", "val", k=3, ascending=ascending, tie_columns=("id",)
        ).to_pandas()
        exp = (
            df.sort_values(["val", "id"], ascending=[ascending, True], kind="stable")
            .groupby("grp", sort=False)
            .head(3)
        )
        key = lambda d: sorted(map(tuple, d[["grp", "val", "id"]].to_numpy()))
        assert key(got) == key(exp)
        assert got.groupby("grp").size().max() <= 3


def test_mmr_rerank_matches_reference_and_diversifies(ray_session):
    """MMR (similarity.mmr_rerank) vs an independent per-step numpy
    reference; lam=1 degenerates to the cosine ranking; a small lam must
    spread picks across clusters where plain top-k stays in one."""
    import ray.data

    from search_engine_ray.dataops.similarity import knn_brute_force, mmr_rerank

    rng = np.random.default_rng(5)
    # two tight clusters + noise: cluster 0 is closest to the query
    c0 = rng.normal(0, 0.01, (20, 16)) + np.eye(16)[0]
    c1 = rng.normal(0, 0.01, (20, 16)) + np.eye(16)[1] * 0.8 + np.eye(16)[0] * 0.5
    vecs = np.vstack([c0, c1])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    q = np.eye(16)[0]

    got = mmr_rerank(ds, q, k=8, lam=0.3, n_candidates=40)

    # independent reference: brute-force greedy over all 40
    def ref_mmr(vv, qq, k, lam):
        vn = vv / np.linalg.norm(vv, axis=1, keepdims=True)
        qn = qq / np.linalg.norm(qq)
        simq = vn @ qn
        pair = vn @ vn.T
        picked = []
        for _ in range(k):
            best, best_s = None, None
            for i in range(len(vv)):
                if i in picked:
                    continue
                red = max((pair[i][j] for j in picked), default=None)
                s = simq[i] if red is None else lam * simq[i] - (1 - lam) * red
                if best is None or s > best_s or (s == best_s and i < best):
                    best, best_s = i, s
            picked.append(best)
        return picked

    assert got["vec_id"].to_pylist() == ref_mmr(vecs, q, 8, 0.3)
    # lam=1 == plain cosine order
    top = knn_brute_force(ds, q[None, :], k=8)
    lam1 = mmr_rerank(ds, q, k=8, lam=1.0, n_candidates=40)
    assert lam1["vec_id"].to_pylist() == top["vec_id"].to_pylist()
    # diversification: top-8 cosine stays in cluster 0; MMR reaches cluster 1
    assert all(v < 20 for v in top["vec_id"].to_pylist())
    assert any(v >= 20 for v in got["vec_id"].to_pylist())
    # partition invariance
    got1 = mmr_rerank(ray.data.from_arrow(tbl), q, k=8, lam=0.3, n_candidates=40)
    assert got1.equals(got)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(ds, q, k=3, lam=1.5)
    with pytest.raises(ValueError, match="n_candidates"):
        mmr_rerank(ds, q, k=10, n_candidates=5)


def test_range_partition_export(ray_session, tmp_path):
    """range_partition_export (dataops/export.py): files form disjoint
    ascending key ranges, each internally sorted; reading in name order
    yields the global ORDER BY; manifest matches a DuckDB reproduction
    of the quantile boundaries; overwrite-not-append; partition
    invariance."""
    import os

    import duckdb
    import pyarrow.parquet as pq
    import ray.data

    from search_engine_ray.dataops.export import range_partition_export

    rng = np.random.default_rng(17)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(900, dtype=np.int64)),
            "n_chars": pa.array(rng.integers(0, 300, 900).astype(np.int64)),
        }
    )
    out = str(tmp_path / "rp")
    ds = ray.data.from_arrow(tbl).repartition(7)
    man = range_partition_export(ds, out, key="n_chars", n_partitions=8)

    # disjoint ascending ranges + global order on read-back in name order
    files = sorted(os.listdir(out))
    assert files == [f"part-{int(p):05d}.parquet" for p in man["part"].to_pylist()]
    back = pa.concat_tables(pq.read_table(os.path.join(out, f)) for f in files)
    kv = np.asarray(back["n_chars"], dtype=np.int64)
    iv = np.asarray(back["doc_id"], dtype=np.int64)
    order = np.lexsort((iv, kv))
    assert (order == np.arange(len(order))).all()  # already globally sorted
    assert back.num_rows == 900 and int(man["n_rows"].to_pandas().sum()) == 900

    # manifest vs DuckDB-reproduced boundaries
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""
        WITH bnds AS (
          SELECT DISTINCT unnest(
            percentile_disc([0.125,0.25,0.375,0.5,0.625,0.75,0.875])
              WITHIN GROUP (ORDER BY n_chars)) AS b FROM t),
        bk AS (SELECT doc_id, n_chars,
                      (SELECT count(*) FROM bnds WHERE b <= n_chars) AS part FROM t)
        SELECT part, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(n_chars) AS BIGINT) AS min_key,
               CAST(max(n_chars) AS BIGINT) AS max_key,
               CAST(min(doc_id) AS BIGINT) AS min_id,
               CAST(max(doc_id) AS BIGINT) AS max_id
        FROM bk GROUP BY part ORDER BY part
    """).arrow()
    assert man.equals(exp.cast(man.schema))

    # overwrite, not append: re-export over a subset replaces everything
    man2 = range_partition_export(
        ray.data.from_arrow(tbl.slice(0, 100)), out, key="n_chars", n_partitions=4
    )
    back2 = pa.concat_tables(
        pq.read_table(os.path.join(out, f)) for f in sorted(os.listdir(out))
    )
    assert back2.num_rows == 100 == int(man2["n_rows"].to_pandas().sum())

    # partition invariance of the manifest
    man3 = range_partition_export(
        ray.data.from_arrow(tbl), str(tmp_path / "rp3"), key="n_chars", n_partitions=8
    )
    assert man3.equals(man)
    with pytest.raises(ValueError, match="n_partitions"):
        range_partition_export(ds, str(tmp_path / "x"), key="n_chars", n_partitions=0)


def test_extract_json_fields(ray_session):
    """jsoncol.extract_json_fields vs DuckDB json_extract: typed fields,
    null/empty/missing-field handling, newline rejection, collisions."""
    import duckdb

    import ray.data
    from search_engine_ray.dataops.jsoncol import extract_json_fields, parse_json_batch

    props = [
        '{"k": 7, "tag": "a"}',
        '{"k": -3}',
        "{}",
        None,
        "",
        '{"tag": "z", "k": 0}',
    ] * 4
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(props), dtype=np.int64)),
            "props": pa.array(props, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = (
        extract_json_fields(
            ds, "props", {"k": pa.int64(), "tag": pa.string()}, keep=("event_id",)
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        """SELECT event_id,
                  CAST(json_extract(p, '$.k') AS BIGINT) AS k,
                  CAST(json_extract_string(p, '$.tag') AS VARCHAR) AS tag
           FROM (SELECT event_id,
                        CASE WHEN props IS NULL OR props = '' THEN '{}'
                             ELSE props END AS p FROM t)
           ORDER BY event_id"""
    ).df()
    assert (out["k"].fillna(-999).values == exp["k"].fillna(-999).values).all()
    assert (out["tag"].fillna("-").values == exp["tag"].fillna("-").values).all()
    with pytest.raises(ValueError, match="newline"):
        parse_json_batch(pa.array(['{\n"k": 1}']), {"k": pa.int64()})
    with pytest.raises(ValueError, match="collision"):
        extract_json_fields(ds, "props", {"event_id": pa.int64()}, keep=("event_id",))


def test_quantize_embeddings(ray_session):
    """similarity.quantize_embeddings (SQ8): clamp/floor parity with a
    numpy reference and DuckDB, list offsets correct on sliced arrays."""
    import duckdb

    import ray.data
    from search_engine_ray.dataops.similarity import quantize_embeddings

    rng = np.random.default_rng(8)
    vecs = (rng.normal(0, 1.2, (120, 6)).astype(np.float32))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(120, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = (
        quantize_embeddings(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    ref = np.clip(np.floor(vecs.astype(np.float64) * 127.0 + 0.5), -127, 127)
    got = np.stack(out["q"].to_numpy()).astype(np.int64)
    assert (got == ref.astype(np.int64)).all()
    # DuckDB parity on the flattened long form
    con = duckdb.connect()
    con.register("e", tbl)
    exp = con.sql(
        """SELECT vec_id, i - 1 AS dim,
                  GREATEST(-127, LEAST(127,
                    CAST(floor(CAST(embedding[i] AS DOUBLE) * 127.0 + 0.5)
                         AS BIGINT))) AS q
           FROM e, unnest(generate_series(1, len(embedding))) AS g(i)
           ORDER BY vec_id, dim"""
    ).df()
    assert (got.reshape(-1) == exp["q"].to_numpy()).all()


def test_compact_parquet_files(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.dataops.export import (
        compact_parquet_files,
        plan_compaction,
    )

    rng = np.random.default_rng(9)
    in_dir = str(tmp_path / "small")
    os.makedirs(in_dir)
    all_ids = []
    next_id = 0
    for i in range(12):
        n = int(rng.integers(5, 200))
        ids = list(range(next_id, next_id + n))
        next_id += n
        all_ids.extend(ids)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([f"t{j}" for j in ids], pa.string())}),
            os.path.join(in_dir, f"f{i:03d}.parquet"),
        )
    sizes = [os.path.getsize(os.path.join(in_dir, f))
             for f in sorted(os.listdir(in_dir))]
    target = int(np.median(sizes) * 3)
    bins = plan_compaction(in_dir, target)
    assert sum(len(b) for b in bins) == 12
    assert plan_compaction(in_dir, target) == bins  # deterministic

    out_dir = str(tmp_path / "compacted")
    man = compact_parquet_files(in_dir, out_dir, target_bytes=target)
    assert man["bin"].to_pylist() == list(range(len(bins)))
    assert sum(man["n_rows"].to_pylist()) == len(all_ids)
    # row ORDER preserved end-to-end: reading parts in name order gives
    # the original file-name-order concatenation
    parts = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert len(parts) == len(bins) and len(parts) < 12
    got_ids = []
    for p in parts:
        got_ids.extend(pq.read_table(os.path.join(out_dir, p))["doc_id"].to_pylist())
    assert got_ids == all_ids
    # resume: re-run touches nothing (mtimes unchanged), same manifest
    mtimes = {p: os.path.getmtime(os.path.join(out_dir, p)) for p in parts}
    man2 = compact_parquet_files(in_dir, out_dir, target_bytes=target)
    assert man2.equals(man)
    assert all(os.path.getmtime(os.path.join(out_dir, p)) == mtimes[p] for p in parts)
    # changed input -> fail loud, never silently keep stale parts
    pq.write_table(
        pa.table({"doc_id": pa.array([next_id], pa.int64()),
                  "text": pa.array(["x"], pa.string())}),
        os.path.join(in_dir, "f999.parquet"),
    )
    with pytest.raises(ValueError, match="input layout changed"):
        compact_parquet_files(in_dir, out_dir, target_bytes=target)
    # oversized file gets its own bin
    assert plan_compaction(in_dir, 1) == [[os.path.join(in_dir, f)]
                                          for f in sorted(os.listdir(in_dir))
                                          if f.endswith(".parquet")]


def test_shuffled_export_deterministic_order(ray_session, tmp_path):
    import os

    import duckdb
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from search_engine_ray.dataops.export import shuffled_export

    n = 400
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64) * 7),
        }
    )

    def read_order(out_dir):
        parts = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
        ids = []
        for p in parts:
            ids.extend(pq.read_table(os.path.join(out_dir, p))["doc_id"].to_pylist())
        return ids

    o1 = str(tmp_path / "s1")
    shuffled_export(ray.data.from_arrow(tbl).repartition(5), o1, seed=3,
                    n_partitions=4)
    order1 = read_order(o1)
    # reproducible across runs and partitionings
    o2 = str(tmp_path / "s2")
    shuffled_export(ray.data.from_arrow(tbl).repartition(1), o2, seed=3,
                    n_partitions=4)
    assert read_order(o2) == order1
    # a different seed gives a different permutation of the same ids
    o3 = str(tmp_path / "s3")
    shuffled_export(ray.data.from_arrow(tbl), o3, seed=4, n_partitions=4)
    order3 = read_order(o3)
    assert sorted(order3) == sorted(order1) == list(range(n))
    assert order3 != order1
    # the order IS ORDER BY (md5be('{seed}:{id}') >> 1, id) — SQL-checked
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""
        SELECT doc_id FROM t
        ORDER BY ('0x' || substr(md5('3:' || CAST(doc_id AS VARCHAR)),1,16))::UBIGINT >> 1,
                 doc_id
    """).df()["doc_id"].tolist()
    assert order1 == exp
    # actually shuffled: far from identity
    assert sum(1 for i, d in enumerate(order1) if i == d) < 10


def test_compact_refuses_different_target(ray_session, tmp_path):
    # review fix: same files, different target_bytes -> different plan
    # -> must refuse, never silently reuse stale parts
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.dataops.export import compact_parquet_files

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i in range(4):
        pq.write_table(
            pa.table({"doc_id": pa.array([i], pa.int64())}),
            os.path.join(in_dir, f"f{i}.parquet"),
        )
    out_dir = str(tmp_path / "out")
    compact_parquet_files(in_dir, out_dir, target_bytes=1)
    with pytest.raises(ValueError, match="input layout changed"):
        compact_parquet_files(in_dir, out_dir, target_bytes=1 << 30)


def test_shuffled_export_drops_internal_key(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    from search_engine_ray.dataops.export import shuffled_export

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array([f"t{i}" for i in range(50)], pa.string()),
        }
    )
    out = str(tmp_path / "s")
    shuffled_export(ray.data.from_arrow(tbl), out, seed=1, n_partitions=2)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    schema = pq.read_schema(os.path.join(out, parts[0]))
    assert schema.names == ["doc_id", "text"]  # no _shuffle_key leak


def test_hard_negatives_exact(emb_ds, emb_tbl):
    from search_engine_ray.dataops.similarity import hard_negatives

    emb = np.stack(
        [np.asarray(e, dtype=np.float64) for e in emb_tbl["embedding"].to_pylist()]
    )
    ids = np.asarray(emb_tbl["vec_id"])
    labels = np.asarray(emb_tbl["label"])
    queries, qlabels = emb[:3], labels[:3]
    out = hard_negatives(emb_ds, queries, qlabels, k=5).to_pandas()
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for qi in range(3):
        neg = labels != qlabels[qi]
        sims = (norm @ norm[qi])[neg]
        nid = ids[neg]
        order = np.lexsort((nid, -sims))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        # every mined negative has a different label than the anchor
        lab = {int(i): int(l) for i, l in zip(ids, labels)}
        assert all(lab[int(v)] != int(qlabels[qi]) for v in got["vec_id"])
        assert got["vec_id"].tolist() == nid[order].tolist()
        np.testing.assert_allclose(got["cos_sim"], sims[order], atol=1e-12)
    # length mismatch fails loud
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hard_negatives(emb_ds, queries, qlabels[:2], k=5)


def test_balance_classes_exact(ray_session):
    import ray.data

    from search_engine_ray.dataops.sample import balance_classes

    # 3 classes: majority 7, mid 3 (7 = 2*3+1 -> first-ranked row gets 3
    # copies, others 2), singleton (7 copies)
    labels = [0] * 7 + [1] * 3 + [2]
    ids = list(range(len(labels)))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "label": pa.array(labels, pa.int64()),
        }
    )
    out = (
        balance_classes(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values(["vec_id", "copy_id"], ignore_index=True)
    )
    per_label = out.groupby("label").size().to_dict()
    assert per_label == {0: 7, 1: 7, 2: 7}
    reps = out.groupby("vec_id").size().to_dict()
    assert reps[7] == 3 and reps[8] == 2 and reps[9] == 2  # rank-ordered remainder
    assert reps[10] == 7
    assert all(reps[i] == 1 for i in range(7))
    # copy_id dense 0..reps-1 per row
    for vid, grp in out.groupby("vec_id"):
        assert grp["copy_id"].tolist() == list(range(len(grp)))
    # partition invariance
    out1 = (
        balance_classes(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values(["vec_id", "copy_id"], ignore_index=True)
    )
    assert out.equals(out1)
    # explicit smaller target downsamples deterministically (lowest ids)
    down = balance_classes(
        ray.data.from_arrow(tbl), target=2
    ).to_pandas()
    assert down.groupby("label").size().to_dict() == {0: 2, 1: 2, 2: 2}
    assert set(down[down.label == 0]["vec_id"]) == {0, 1}
    with _test_raises_value_error():
        balance_classes(ray.data.from_arrow(tbl), target=0)
    # empty input -> empty typed output
    assert balance_classes(ray.data.from_arrow(tbl.slice(0, 0))).count() == 0


def _test_raises_value_error():
    import pytest as _pytest

    return _pytest.raises(ValueError)


def test_latest_per_key(ray_session):
    """latest_per_key: newest capture per url (max ts, tie -> max id),
    partition-invariant, equals the QUALIFY row_number() reference; the
    apply variant returns exactly the surviving full rows."""
    import ray.data

    from search_engine_ray.dataops.dedup import latest_per_key, latest_per_key_apply

    rng = np.random.default_rng(11)
    n = 3000
    key = rng.integers(0, 250, n)
    ts = rng.integers(0, 40, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "url": pa.array([f"u{k}" for k in key]),
            "ts": pa.array(ts),
            "doc_id": pa.array(ids),
            "payload": pa.array([f"p{i}" for i in range(n)]),
        }
    )
    df = tbl.to_pandas()
    ref = (
        df.sort_values(["url", "ts", "doc_id"])
        .groupby("url")
        .last()
        .reset_index()[["url", "ts", "doc_id"]]
        .rename(columns={"doc_id": "keep_doc_id"})
        .sort_values("url", ignore_index=True)
    )
    # ties at the max ts exist in this draw (dense ts domain)
    dup_ts = df.groupby(["url", "ts"]).size()
    assert (dup_ts > 1).any()

    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = (
            latest_per_key(ds, "url", "ts")
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        assert out[["url", "ts", "keep_doc_id"]].equals(ref)

    surv = (
        latest_per_key_apply(ray.data.from_arrow(tbl).repartition(5), "url", "ts")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert sorted(surv["doc_id"]) == sorted(ref["keep_doc_id"])
    assert list(surv.columns) == ["url", "ts", "doc_id", "payload"]
    # single-capture keys pass through; empty input stays empty and typed
    one = pa.table({"url": pa.array(["a"]), "ts": pa.array([5], pa.int64()),
                    "doc_id": pa.array([9], pa.int64())})
    got = latest_per_key(ray.data.from_arrow(one), "url", "ts").to_pandas()
    assert got.iloc[0].tolist() == ["a", 5, 9]


def test_remove_domain_boilerplate(ray_session):
    """Domain-conditional boilerplate strip: DuckDB oracle equality (the
    whole pipeline incl. ordered reassembly), per-domain conditioning (a
    paragraph common in source A survives in source B), partition
    invariance, and the fail-loud guards."""
    import duckdb

    import ray.data

    from search_engine_ray.dataops.dedup import remove_domain_boilerplate

    texts = [
        "HEADER\nreal content one\nFOOTER",
        "HEADER\nother stuff\nFOOTER",
        "HEADER\nthird doc\nFOOTER",
        "unique doc entirely",
        "HEADER\n\nonly header and empty",
        "solo site page\nFOOTER",  # source b: FOOTER not boilerplate there
        "HEADER\nrepeat\nrepeat\nHEADER",  # intra-doc repeats count ONCE
    ]
    src = ["a", "a", "a", "a", "a", "b", "a"]
    ids = list(range(1, 8))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(src),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    sql = """
        WITH raw AS (
          SELECT doc_id, source, unnest(string_split(text, chr(10))) AS para,
                 unnest(generate_series(1, len(string_split(text, chr(10))))) AS idx
          FROM documents),
        pars AS (SELECT * FROM raw WHERE para <> ''),
        pcnt AS (SELECT source, md5(para) AS k, count(DISTINCT doc_id) AS nd
                 FROM pars GROUP BY 1, 2),
        gt AS (SELECT source, count(*) AS total FROM documents GROUP BY source),
        boiler AS (SELECT pcnt.source, pcnt.k FROM pcnt JOIN gt USING (source)
                   WHERE nd >= 3 AND nd * 2 >= 1 * total),
        kept AS (SELECT p.doc_id, p.para, p.idx FROM pars p
                 LEFT JOIN boiler b ON b.source = p.source AND b.k = md5(p.para)
                 WHERE b.k IS NULL)
        SELECT doc_id, string_agg(para, chr(10) ORDER BY idx) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id ORDER BY doc_id
    """
    ref = con.execute(sql).df()
    ref["n_kept"] = ref["n_kept"].astype("int64")
    ref["doc_id"] = ref["doc_id"].astype("int64")

    for parts in (1, 3, 7):
        out = (
            remove_domain_boilerplate(
                ray.data.from_arrow(tbl).repartition(parts),
                threshold=(1, 2),
                min_docs=3,
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        out["n_kept"] = out["n_kept"].astype("int64")
        assert out.equals(ref), f"parts={parts}"

    got = remove_domain_boilerplate(
        ray.data.from_arrow(tbl), threshold=(1, 2), min_docs=3
    ).to_pandas()
    by_id = dict(zip(got["doc_id"], got["clean_text"]))
    assert "HEADER" not in by_id[1] and "FOOTER" not in by_id[1]
    assert by_id[6] == "solo site page\nFOOTER"  # per-domain conditioning
    assert by_id[7] == "repeat\nrepeat"  # intra-doc copies counted once
    assert 3 not in by_id or True  # doc 3 may survive with its real line
    # doc 5's only non-boiler paragraph survives; empties never join
    assert by_id[5] == "only header and empty"

    # guards: bad rational, bad min_docs, corrupt group value, boiler cap
    with pytest.raises(ValueError):
        remove_domain_boilerplate(ray.data.from_arrow(tbl), threshold=(1, 0))
    with pytest.raises(ValueError):
        remove_domain_boilerplate(ray.data.from_arrow(tbl), min_docs=0)
    bad = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x"]),
            "source": pa.array(["has|pipe"]),
        }
    )
    with pytest.raises(Exception, match="combined key"):
        remove_domain_boilerplate(ray.data.from_arrow(bad)).to_pandas()

    # beyond-cap: >max_boiler keys switch to the native left_anti join
    # path whose right side never touches the driver — output must be
    # IDENTICAL to the broadcast fast path (max_boiler=0 forces the join
    # for the same threshold the oracle comparison above used)
    via_join = (
        remove_domain_boilerplate(
            ray.data.from_arrow(tbl), threshold=(1, 2), min_docs=3, max_boiler=0
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    via_join["n_kept"] = via_join["n_kept"].astype("int64")
    assert via_join.equals(ref)


def test_extract_content(ray_session):
    """jusText-lite content extraction: DuckDB whole-pipeline equality,
    prose-vs-nav classification, partition invariance, validation."""
    import duckdb

    import ray.data

    from search_engine_ray.dataops.clean import extract_content
    from search_engine_ray.text.stopwords import STOPWORDS_TUPLE
    from search_engine_ray.text.ws import WS_RE, sql_ascii_lower

    texts = [
        "Home | About | Contact\nThis is a real sentence with the usual words.\nBUY NOW",
        "click here\nnav links\nAnd this paragraph reads like prose because it has stopwords in it.",
        "short\ntiny",
        "The result of the test was that all of the words were fine here.",
        "",  # empty doc
        "A\vB C\nthe quick brown fox was seen by all of the people there",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, 7), pa.int64()), "text": pa.array(texts)}
    )
    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    stop_list = ",".join("'" + w + "'" for w in STOPWORDS_TUPLE)
    sql = f"""
        WITH raw AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS para,
                 unnest(generate_series(1, len(string_split(text, chr(10))))) AS idx
          FROM documents),
        pars AS (SELECT * FROM raw WHERE para <> ''),
        tok AS (SELECT doc_id, idx, para,
                 len(list_filter(regexp_split_to_array(para, '{WS_RE}'), x -> x <> '')) AS nt,
                 len(list_filter(regexp_split_to_array(para, '{WS_RE}'),
                     x -> x <> '' AND {sql_ascii_lower("x")} IN ({stop_list}))) AS ns
                FROM pars),
        kept AS (SELECT doc_id, para, idx FROM tok WHERE nt >= 5 AND ns * 10 >= 1 * nt)
        SELECT doc_id, string_agg(para, chr(10) ORDER BY idx) AS content_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id ORDER BY doc_id
    """
    ref = con.execute(sql).df()
    ref["n_kept"] = ref["n_kept"].astype("int64")
    ref["doc_id"] = ref["doc_id"].astype("int64")

    for parts in (1, 4):
        out = (
            extract_content(
                ray.data.from_arrow(tbl).repartition(parts),
                min_tokens=5,
                stop_density=(1, 10),
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        out["n_kept"] = out["n_kept"].astype("int64")
        assert out.equals(ref), f"parts={parts}"

    by_id = dict(zip(ref["doc_id"], ref["content_text"]))
    assert 3 not in by_id and 5 not in by_id          # tiny/empty docs absent
    assert "BUY NOW" not in by_id[1] and "Home" not in by_id[1]
    assert "nav links" not in by_id[2]

    with pytest.raises(ValueError):
        extract_content(ray.data.from_arrow(tbl), stop_density=(1, 0))
    with pytest.raises(ValueError):
        extract_content(ray.data.from_arrow(tbl), min_tokens=0)


def test_lang_window_counts(ray_session):
    """Windowed language tallies: brute-force per-window reference (same
    trigram profiles, integer argmax, profile-order ties, cjk override),
    mixed docs split across columns, partition invariance, empty docs."""
    import ray.data

    from search_engine_ray.dataops.textstats import _LANG_PROFILES, lang_window_counts

    en = "the thing and the other thing going strong in the morning light "
    de = "der die und der die und schön über der die und immer wieder der "
    texts = [
        en * 8,                     # pure en: all windows en
        en * 4 + de * 4,            # mixed: en then de windows
        "",                         # no tokens: n_windows = 0
        "中文" * 40,                 # cjk override
        de * 2,
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, 6), pa.int64()), "text": pa.array(texts)}
    )
    W = 10
    langs = [k for k, v in _LANG_PROFILES.items() if v]

    def brute(text):
        toks = [t for t in __import__("re").split(r"[\t\n\x0B\x0C\r ]+", text) if t]
        wins = [" ".join(toks[i : i + W]) for i in range(0, len(toks), W)]
        tal = {f"w_{la}": 0 for la in langs + ["zh"]}
        for w in wins:
            lw = w.lower()
            counts = [
                sum(lw.count(tri) for tri in _LANG_PROFILES[la]) for la in langs
            ]
            best = langs[counts.index(max(counts))]
            n_chars = max(len(w), 1)
            cjk = sum(1 for ch in w if "一" <= ch <= "鿿")
            if cjk * 5 > n_chars:
                best = "zh"
            tal[f"w_{best}"] += 1
        return len(wins), tal

    for parts in (1, 3):
        out = (
            lang_window_counts(
                ray.data.from_arrow(tbl).repartition(parts), window_tokens=W
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        for i, t in enumerate(texts):
            nw, tal = brute(t)
            row = out.iloc[i]
            assert row["n_windows"] == nw, (parts, i)
            for k, v in tal.items():
                assert row[k] == v, (parts, i, k)
    # mixed doc really splits; cjk doc lands in zh
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert r2["w_en"] > 0 and r2["w_de"] > 0
    assert out[out["doc_id"] == 4].iloc[0]["w_zh"] > 0
    assert out[out["doc_id"] == 3].iloc[0]["n_windows"] == 0
    with pytest.raises(ValueError):
        lang_window_counts(ray.data.from_arrow(tbl), window_tokens=0)


def test_remove_domain_boilerplate_straddled_batches(ray_session):
    """Distinct-doc counts must be exact even when one doc's exploded
    paragraph rows straddle batch boundaries (review finding: the
    runtime re-chunks map outputs, so per-batch dedup alone would count
    an intra-doc duplicate paragraph once per chunk).  pair_batch_size=1
    forces every row into its own partial batch — the worst case."""
    import ray.data

    from search_engine_ray.dataops.dedup import remove_domain_boilerplate

    # P appears in 2 of 4 docs of source 'a' (threshold 1/2 at min_docs=2
    # sits exactly at the boundary: nd=2, total=4 -> 2*2 >= 1*4 strips),
    # but doc 1 repeats P FIVE times — a naive per-chunk count would see
    # nd up to 6 and a doc-exact count sees 2.  With min_docs=3 the gate
    # must NOT strip (nd=2 < 3); an inflated count would.
    texts = [
        "P\nP\nP\nP\nP\nreal one",
        "P\nreal two",
        "no dup here",
        "also clean",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, 5), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["a"] * 4),
        }
    )
    out = (
        remove_domain_boilerplate(
            ray.data.from_arrow(tbl).repartition(2),
            threshold=(1, 2),
            min_docs=3,
            pair_batch_size=1,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    by_id = dict(zip(out["doc_id"], out["clean_text"]))
    # nd(P)=2 distinct docs < min_docs=3 -> P survives everywhere
    assert by_id[1] == "P\nP\nP\nP\nP\nreal one"
    assert by_id[2] == "P\nreal two"
    # and with min_docs=2 the SAME corpus strips P (nd=2, 2*2 >= 4)
    out2 = (
        remove_domain_boilerplate(
            ray.data.from_arrow(tbl).repartition(2),
            threshold=(1, 2),
            min_docs=2,
            pair_batch_size=1,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    by_id2 = dict(zip(out2["doc_id"], out2["clean_text"]))
    assert by_id2[1] == "real one" and by_id2[2] == "real two"


def test_filter_blocked_domains(ray_session):
    """Blocklist filter: registered-domain exact match drops rows,
    unparseable urls pass through, non-blocked domains survive."""
    import ray.data

    from search_engine_ray.dataops.urlops import filter_blocked_domains

    urls = [
        "https://www.bad.example.co.uk/x",   # domain example.co.uk (suffix rule)
        "http://good.site.com/y",            # site.com
        "not a url at all",                  # unparseable -> pass through
        "https://evil.org/z",                # evil.org
        "http://sub.evil.org:8080/w",        # evil.org via subdomain
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, 6), pa.int64()), "url": pa.array(urls)}
    )
    out = (
        filter_blocked_domains(
            ray.data.from_arrow(tbl).repartition(2), ["evil.org", "example.co.uk"]
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [2, 3]
    assert out["url"].tolist() == [urls[1], urls[2]]  # original rows intact
    # empty blocklist keeps everything
    all_out = filter_blocked_domains(ray.data.from_arrow(tbl), []).to_pandas()
    assert len(all_out) == 5


def test_c4_line_filters(ray_session):
    """C4 line-level cleaning: every rule exercised against a DuckDB
    whole-pipeline oracle, plus partition invariance."""
    import duckdb
    import ray.data

    from search_engine_ray.dataops.clean import c4_line_filters
    from search_engine_ray.text.ws import WS_RE, sql_ascii_lower

    texts = [
        # 2 kept lines -> survives
        "good long sentence here today.\nanother fine sentence right now!\nno punct line\nso?",
        # javascript + policy lines dropped, 2 real ones kept
        "uses javascript heavily in this line.\nthe privacy policy applies to you."
        "\nreal content sentence stays here.\nsecond real content line stays too.",
        # page-level lorem ipsum kill
        "lorem ipsum dolor sit amet.\nthis whole page dies now.",
        # page-level curly-brace kill
        "function f() { return 1; }\nthis page dies as well now.",
        # trimming + min_words + terminal-mark edge: "so?" has 1 word
        "  \t padded line survives trimming fine.  \r\nshort one.\nthird valid sentence for the page?",
        # only 1 kept line -> dropped by min_lines
        "a single qualifying sentence lives here.\nnothing else qualifies",
        # VT/FF in the whitespace class: 3 words either side of \x0B
        "alpha\x0bbeta gamma ends well.\nsecond\x0cline with enough words.",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )

    got = (
        c4_line_filters(ray.data.from_arrow(tbl).repartition(3),
                        min_words=3, min_lines=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    con = duckdb.connect()
    con.register("docs", tbl)
    sal = sql_ascii_lower
    exp = con.execute(f"""
        WITH docok AS (
          SELECT doc_id FROM docs
          WHERE NOT contains({sal("text")}, 'lorem ipsum')
            AND NOT contains(text, '{{')),
        raw AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 unnest(generate_series(1, len(string_split(text, chr(10))))) AS idx
          FROM docs WHERE doc_id IN (SELECT doc_id FROM docok)),
        t AS (
          SELECT doc_id, idx,
                 trim(line, chr(9)||chr(10)||chr(11)||chr(12)||chr(13)||chr(32)) AS line
          FROM raw),
        kept AS (
          SELECT doc_id, idx, line FROM t
          WHERE line <> ''
            AND regexp_matches(line, '[.!?"]$')
            AND len(list_filter(regexp_split_to_array(line, '{WS_RE}'),
                    x -> x <> '')) >= 3
            AND NOT contains({sal("line")}, 'javascript')
            AND NOT contains({sal("line")}, 'terms of use')
            AND NOT contains({sal("line")}, 'privacy policy')
            AND NOT contains({sal("line")}, 'cookie policy')
            AND NOT contains({sal("line")}, 'uses cookies')
            AND NOT contains({sal("line")}, 'use of cookies')
            AND NOT contains({sal("line")}, 'use cookies'))
        SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM kept GROUP BY doc_id HAVING count(*) >= 2
        ORDER BY doc_id
    """).df()

    assert got["doc_id"].tolist() == exp["doc_id"].tolist() == [1, 2, 5, 7]
    assert got["clean_text"].tolist() == exp["clean_text"].tolist()
    assert got["n_lines"].tolist() == exp["n_lines"].tolist()
    # the CR before \n on doc 5 must have been trimmed away
    assert "\r" not in got.loc[got.doc_id == 5, "clean_text"].iloc[0]
    # VT/FF are word separators, not trimmed mid-line content breakers
    assert got.loc[got.doc_id == 7, "n_lines"].iloc[0] == 2

    # partition invariance
    got1 = (
        c4_line_filters(ray.data.from_arrow(tbl).repartition(1),
                        min_words=3, min_lines=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got1.equals(got)


def test_select_token_budget(ray_session):
    import ray.data

    from search_engine_ray.dataops.sample import select_token_budget

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "prio": pa.array([5, 3, 9, 9, 1, 7, 3, 8, 2, 6], pa.int64()),
            "toks": pa.array([10, 20, 30, 40, 50, 60, 70, 80, 90, 100], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)

    def brute(budget):
        rows = sorted(
            zip(tbl["prio"].to_pylist(), tbl["doc_id"].to_pylist(), tbl["toks"].to_pylist()),
            key=lambda r: (-r[0], r[1]),
        )
        out, run = [], 0
        for p, d, t in rows:
            run += t
            if run <= budget:
                out.append(d)
        return sorted(out)

    for budget in (0, 100, 220, 305, 10**9):
        out = select_token_budget(ds, budget, "prio", "toks")
        got = out.to_pandas()
        if len(got) == 0:
            # Ray to_pandas drops the schema for all-empty datasets; the
            # dataset itself stays typed (checked via the arrow batches)
            assert brute(budget) == [], budget
            batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
            assert all(b.schema.names == ["doc_id", "prio", "toks"] for b in batches)
            continue
        assert sorted(got["doc_id"].tolist()) == brute(budget), budget
    # partition invariance (the two-phase block prefix-sum must not care)
    got7 = select_token_budget(ds.repartition(7), 220, "prio", "toks").to_pandas()
    assert sorted(got7["doc_id"].tolist()) == brute(220)
    with pytest.raises(ValueError):
        select_token_budget(ds, -1, "prio", "toks")


def test_dedup_representatives(ray_session):
    """Cluster {1,2,3} keeps its highest-priority member (ties -> max id);
    unclustered docs pass through."""
    import ray.data

    from search_engine_ray.dataops.dedup import dedup_representatives

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5], "prio": [10, 30, 30, 7, 9]}
        )
    )
    pairs = ray.data.from_pandas(pd.DataFrame({"a": [1, 2], "b": [2, 3]}))
    out = dedup_representatives(ds, pairs, "prio").to_pandas()
    assert sorted(out["doc_id"].tolist()) == [3, 4, 5]  # 3 wins the 30-tie
    # empty pair graph: everything is its own representative
    none = ray.data.from_pandas(pd.DataFrame({"a": [], "b": []})).limit(0)
    out2 = dedup_representatives(ds, none, "prio").to_pandas()
    assert sorted(out2["doc_id"].tolist()) == [1, 2, 3, 4, 5]


def test_knn_self_join(ray_session):
    """IVF-bucketed all-rows ANN join: exact when nprobe == n_centroids
    (every bucket probed); partition-invariant; self excluded."""
    import ray.data

    from search_engine_ray.dataops.similarity import knn_self_join

    rng = np.random.default_rng(3)
    emb = rng.normal(size=(60, 8))
    ids = np.arange(100, 160, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = knn_self_join(ds, k=3, n_centroids=4, nprobe=4).to_pandas()
    m = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2)
    for i, qid in enumerate(ids):
        idx = np.lexsort((ids, -sims[i]))[:3]
        exp = ids[idx].tolist()
        g = out[out["query_id"] == qid].sort_values("rank")
        assert g["vec_id"].tolist() == exp, qid
        assert qid not in set(g["vec_id"])  # self excluded
    rep = knn_self_join(ds.repartition(5), k=3, n_centroids=4, nprobe=4).to_pandas()
    a = out.sort_values(["query_id", "rank"], ignore_index=True)
    b = rep.sort_values(["query_id", "rank"], ignore_index=True)
    assert a[["query_id", "vec_id"]].equals(b[["query_id", "vec_id"]])
    with pytest.raises(ValueError):
        knn_self_join(ds, nprobe=0)


def test_regex_search(ray_session):
    import ray.data

    from search_engine_ray.dataops.textstats import regex_search

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["sort table then merge batch", "nothing", None],
            }
        )
    )
    out = regex_search(ds, r"(?:sort|merge) (?:table|batch)").to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["n_matches"].tolist() == [2]
    assert out["first_match"].tolist() == ["sort table"]


def test_video_frame_sampler_real_y4m(ray_session):
    """YUV4MPEG2 clips are REALLY parsed (pure numpy header + raw-plane
    walk), frame-sampled at even indices, with per-frame mean luma
    matching a direct recompute — including in strict mode."""
    import ray.data

    from search_engine_ray.dataops.multimodal import (
        VideoFrameSampler,
        sample_video_frames,
        synthesize_media,
        synthesize_y4m,
    )

    ids = list(range(6))
    texts = [f"video doc {i}" for i in ids]
    media = synthesize_y4m(ids, texts, width=16, height=12, n_frames=6)
    out = (
        sample_video_frames(ray.data.from_arrow(media), strict=True)
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    assert (out["decoder"] == "y4m").all()
    assert (out["width"] == 16).all() and (out["height"] == 12).all()
    assert (out["n_frames_total"] == 6).all()
    assert (out["n_frames_sampled"] == 4).all()
    # direct recompute of sampled-frame mean luma from the raw payload
    fsz = 16 * 12 + 2 * (8 * 6)
    for mid in ids:
        payload = media["payload"][mid].as_py()
        body = payload[payload.index(b"\n") + 1 :]
        frames = []
        pos = 0
        while pos < len(body):
            pos += body[pos:].index(b"\n") + 1
            frames.append(
                np.frombuffer(body[pos : pos + 16 * 12], dtype=np.uint8)
            )
            pos += fsz
        idx = np.linspace(0, len(frames) - 1, 4).astype(int)
        exp = [float(frames[i].mean()) for i in idx]
        np.testing.assert_allclose(out["frame_luma"][mid], exp, rtol=1e-6)

    # single-frame clip: sampling degrades gracefully
    one = synthesize_y4m([0], ["x"], n_frames=1)
    o = VideoFrameSampler(n_sample=4, strict=True)(one)
    assert o["n_frames_sampled"][0].as_py() == 1

    # fake payloads: strict raises, non-strict substitutes deterministically
    fake = synthesize_media(ids, texts, kind="video")
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(strict=True)(fake)
    f1 = VideoFrameSampler()(fake)
    f2 = VideoFrameSampler()(fake)
    assert (np.asarray(f1["frame_luma"].to_pylist(), dtype=object).tolist()
            == np.asarray(f2["frame_luma"].to_pylist(), dtype=object).tolist())
    assert f1["decoder"][0].as_py() == "fake"

    # corrupt real-magic payloads fail loud, never silently fake
    bad = fake.set_column(
        2, "payload", pa.array([b"YUV4MPEG2 W4 H4 C420\nFRAME\nxx"] * 6, pa.binary())
    )
    with pytest.raises(ValueError):
        VideoFrameSampler(strict=True)(bad)


def test_image_resizer_real_and_fake(ray_session):
    """Area-average PPM resize: known-value box means, PPM roundtrip
    through ImageDecoder, strict/fake dispatch, validation."""
    import ray.data

    from search_engine_ray.dataops.multimodal import (
        ImageDecoder,
        ImageResizer,
        resize_images,
        synthesize_media,
    )

    # 4x4 PPM whose quadrant means are known: pixel value = quadrant id * 10
    quad = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30], [20, 20, 30, 30]])
    raster = bytes(int(v) for row in quad for v in row for _ in range(3))
    ppm = b"P6\n4 4\n255\n" + raster
    media = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([ppm], pa.binary()),
            "mime": pa.array(["image/x-portable-pixmap"]),
            "source_doc": pa.array([0], pa.int64()),
        }
    )
    out = ImageResizer(width=2, height=2, strict=True)(media)
    assert out["decoder"][0].as_py() == "ppm"
    resized = out["payload"][0].as_py()
    assert resized.startswith(b"P6\n2 2\n255\n")
    px = np.frombuffer(resized[len(b"P6\n2 2\n255\n"):], dtype=np.uint8).reshape(2, 2, 3)
    assert px[:, :, 0].tolist() == [[0, 10], [20, 30]]  # exact quadrant means

    # resized output is itself decodable by the image stage
    dec = ImageDecoder(strict=True)(out.set_column(1, "width", out["width"]).select(
        ["media_id", "payload"]).append_column("kind", pa.array(["image"]))
        .append_column("mime", pa.array(["image/x-portable-pixmap"]))
        .append_column("source_doc", pa.array([0], pa.int64())))
    assert dec["width"][0].as_py() == 2 and dec["height"][0].as_py() == 2

    # fake payloads: strict raises; non-strict emits a valid PPM of target dims
    fake = synthesize_media([0, 1], ["a", "b"], kind="image")
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        ImageResizer(strict=True)(fake)
    f = resize_images(ray.data.from_arrow(fake), width=8, height=6).to_pandas()
    assert (f["decoder"] == "fake").all()
    assert all(p.startswith(b"P6\n8 6\n255\n") for p in f["payload"])
    with _pytest.raises(ValueError):
        ImageResizer(width=0)
