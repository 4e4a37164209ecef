"""Dedup suite + ANN: exactness checks against brute-force/python ground truth
on the driver testdata tables."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ucuddle_search_engine_spark.operators.ann import cosine_topk_bruteforce, cosine_topk_lsh
from ucuddle_search_engine_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_neardup_pairs,
)
from ucuddle_search_engine_spark.functions.textstats import text_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def pdocs(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def _py_shingles(text, n=3):
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup_counts(docs, pdocs):
    out = {r["content_md5"]: (r["keep_doc_id"], r["n_dups"]) for r in exact_dedup(docs).collect()}
    exp = {}
    for d, t in pdocs.items():
        h = hashlib.md5(t.encode()).hexdigest()
        keep, n = exp.get(h, (d, 0))
        exp[h] = (min(keep, d), n + 1)
    assert out == exp


def test_shingles_match_python(docs, pdocs):
    got = {}
    for r in shingles(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for d, t in pdocs.items():
        exp = _py_shingles(t)
        assert got.get(d, set()) == exp, f"doc {d}"


def test_minhash_matches_python(docs, pdocs):
    sig = minhash_signatures(docs, num_hashes=4).collect()
    got = {(r["doc_id"], r["hash_id"]): r["minhash"] for r in sig}
    for d, t in list(pdocs.items())[:10]:
        sh = _py_shingles(t)
        if not sh:
            continue
        for i in range(4):
            exp = min(hashlib.md5(f"{s}:{i}".encode()).hexdigest() for s in sh)
            assert got[(d, i)] == exp


def test_jaccard_pairs_exact(docs, pdocs):
    thr = 0.8
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, thr).collect()}
    ids = sorted(pdocs)
    exp = {}
    sh = {d: _py_shingles(t) for d, t in pdocs.items()}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sh[a] or not sh[b]:
                continue
            j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if j >= thr:
                exp[(a, b)] = round(j, 6)
    assert set(out) == set(exp)
    for k in out:
        assert abs(out[k] - exp[k]) < 1e-6


def test_lsh_recall_of_high_jaccard(docs, pdocs):
    """LSH candidates must contain every pair with very high true Jaccard
    (16 hashes / 4 bands → ≥1 identical band is near-certain at j≈1)."""
    cands = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    truth = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 0.95).collect()}
    assert truth <= cands


def test_lsh_xx64_fast_path(docs, pdocs):
    """The 64-bit xxhash64 signature fast path keeps the same LSH guarantees:
    identical docs share every band; high-Jaccard truth pairs are recalled;
    output is deterministic across runs."""
    fast = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs, hash_kind="xx64").collect()}
    truth = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, 0.95).collect()}
    assert truth <= fast
    again = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs, hash_kind="xx64").collect()}
    assert fast == again


def test_simhash_bits_and_neardups(docs, pdocs):
    vals = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert set(vals) == set(pdocs)
    assert all(0 <= v < (1 << 60) for v in vals.values())
    pairs = simhash_neardup_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        x = vals[r["doc_a"]] ^ vals[r["doc_b"]]
        assert bin(x).count("1") == r["hamming"] <= 3
    # identical docs (if any) must appear with hamming 0
    by_text = {}
    for d, t in pdocs.items():
        by_text.setdefault(t, []).append(d)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for ds in by_text.values():
        ds = sorted(ds)
        for i in range(len(ds) - 1):
            assert (ds[i], ds[i + 1]) in got


def test_embedding_neardup_pairs(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    thr = 0.95
    out = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in embedding_neardup_pairs(emb, thr).collect()}
    ids = sorted(vecs)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if c >= thr:
                exp[(a, b)] = c
    assert set(out) == set(exp)
    for k, v in out.items():
        assert abs(v - exp[k]) < 1e-5


def test_embedding_neardup_bucketed_recall_and_plan(spark):
    """The 100 TB path: banded-LSH near-dup must (a) reach ≥0.95 recall of the
    all-pairs oracle on planted near-dup clusters, (b) report exact cosines
    for every pair it finds, and (c) plan as a hash join on the bucket key —
    no BroadcastNestedLoopJoin anywhere."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((120, 64))
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # 3 noisy copies per cluster → true cosine ≈ 0.97
            v = b + 0.18 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    thr = 0.9
    truth = {(r["doc_a"], r["doc_b"]): r["cosine"]
             for r in embedding_neardup_pairs(emb, thr).collect()}
    assert len(truth) > 100  # planted clusters actually produce pairs
    bucketed = embedding_neardup_pairs(emb, thr, bucketed=True)
    got = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in bucketed.collect()}

    assert set(got) <= set(truth)  # no false positives (exact verify inside buckets)
    recall = len(got) / len(truth)
    assert recall >= 0.95, f"recall {recall:.3f}"
    for k, v in got.items():
        assert abs(v - truth[k]) < 1e-6

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan


def test_ann_bruteforce_exact(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk_bruteforce(emb, list(q), k=10).collect()]
    sims = sorted(
        ((d, float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))) for d, v in vecs.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in sims]
    for (_, a), (_, b) in zip(got, sims):
        assert abs(a - b) < 1e-5


def test_ann_lsh_recall(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    recalls = []
    for qid in [0, 7, 42]:
        q = list(vecs[qid])
        exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, q, k=10).collect()}
        approx = {r["vec_id"] for r in cosine_topk_lsh(emb, q, k=10, n_planes=4).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe LSH on 64-dim clusters


def test_ann_ivf_recall(spark, emb):
    """IVF: on genuinely clustered data a 2/16-cell probe (12.5% scan) must
    recall ≥0.9 of the brute-force top-k; a full probe equals brute force
    exactly. (The driver test embeddings are near-uniform — recall there just
    tracks scan fraction, so clusters are planted for the pruning assertion.)"""
    from ucuddle_search_engine_spark.operators.ann import IVFIndex

    rng = np.random.RandomState(11)
    base = rng.standard_normal((12, 64)) * 3
    rows = []
    vid = 0
    for b in base:
        for _ in range(40):
            rows.append((vid, [float(x) for x in b + 0.3 * rng.standard_normal(64)]))
            vid += 1
    clustered = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ivf = IVFIndex(clustered, n_centroids=16, n_probe=2)
    vecs = {i: np.array(v) for i, v in rows}
    recalls = []
    for qid in [0, 45, 123, 250, 401]:
        q = list(vecs[qid])
        exact = {r["vec_id"] for r in cosine_topk_bruteforce(clustered, q, k=10).collect()}
        approx = {r["vec_id"] for r in ivf.topk(q, k=10).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    rows2 = emb.collect()
    vecs2 = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows2}
    full = IVFIndex(emb, n_centroids=16, n_probe=16)
    got = [(r["vec_id"], r["cosine"]) for r in full.topk(list(vecs2[0]), k=10).collect()]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk_bruteforce(emb, list(vecs2[0]), k=10).collect()]
    assert got == want


def test_ann_ivf_store_partition_pruning(spark, emb, tmp_path):
    """A written IVF index answers probes with DIRECTORY pruning: the plan
    shows PartitionFilters on _cell, and results equal the in-memory index."""
    from ucuddle_search_engine_spark.operators.ann import IVFIndex

    ivf = IVFIndex(emb, n_centroids=16, n_probe=4)
    path = str(tmp_path / "ivf")
    ivf.write(path)
    loaded = IVFIndex.load(spark, path)
    q = list(emb.filter(emb.vec_id == 7).first()["embedding"])
    got = [(r["vec_id"], r["cosine"]) for r in loaded.topk(q, k=10).collect()]
    want = [(r["vec_id"], r["cosine"]) for r in ivf.topk(q, k=10).collect()]
    assert got == want
    plan = loaded.topk(q, k=10)._sc._jvm.PythonSQLUtils.explainString(
        loaded.topk(q, k=10)._jdf.queryExecution(), "formatted"
    )
    assert any("PartitionFilters" in ln and "_cell" in ln for ln in plan.splitlines()), plan[:1200]


def test_ann_lsh_store_partition_pruning(spark, emb, tmp_path):
    """A written hyperplane-LSH index answers probes with DIRECTORY pruning
    (PartitionFilters on _bucket) — the per-query full-corpus signature scan
    of cosine_topk_lsh becomes an O(probed fraction) read — and results are
    rank-identical to the one-shot path (same planes, probes, scoring)."""
    from ucuddle_search_engine_spark.operators.ann import LSHIndex, cosine_topk_lsh

    dim = len(emb.first()["embedding"])
    idx = LSHIndex(emb, dim=dim, n_planes=4)
    path = str(tmp_path / "lsh")
    idx.write(path)
    loaded = LSHIndex.load(spark, path)
    for qid in [0, 7, 42]:
        q = list(emb.filter(emb.vec_id == qid).first()["embedding"])
        got = [(r["vec_id"], r["cosine"]) for r in loaded.topk(q, k=10).collect()]
        want = [(r["vec_id"], r["cosine"]) for r in
                cosine_topk_lsh(emb, q, k=10, n_planes=4).collect()]
        assert got == want
    q = list(emb.first()["embedding"])
    plan = loaded.topk(q, k=10)._sc._jvm.PythonSQLUtils.explainString(
        loaded.topk(q, k=10)._jdf.queryExecution(), "formatted"
    )
    assert any("PartitionFilters" in ln and "_bucket" in ln for ln in plan.splitlines()), plan[:1200]


def test_text_stats_shapes(docs, pdocs):
    out = {r["doc_id"]: r for r in text_stats(docs).collect()}
    import re

    for d, t in pdocs.items():
        r = out[d]
        assert r["n_tokens"] == len(re.findall(r"[a-z0-9]+", t.lower()))
        assert 0.0 <= r["quality"] <= 1.0
        assert len(r["fingerprint"]) == 32
        assert r["lang_pred"] in {"en", "de", "fr", "es", "und"}


def test_connected_components_and_canonical(spark):
    """Multi-hop chains and separate clusters resolve to min-id components;
    dedup_keep_canonical keeps exactly one doc per cluster + singletons."""
    from ucuddle_search_engine_spark.operators.components import (
        connected_components,
        dedup_keep_canonical,
    )

    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame([(i, f"text{i}") for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]],
                                 "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [1, 10, 20, 99]  # one per cluster + untouched singleton


def test_lsh_hot_bucket_skew(spark):
    """The documented skew point: a boilerplate bucket (1000 identical docs →
    every band collides) must complete via AQE skew splitting and produce
    exactly C(1000,2) candidate pairs, while distinct docs stay unpaired."""
    boiler = [(i, "exact same boilerplate text repeated here for every page") for i in range(1000)]
    distinct = [(10_000 + i, f"unique document number {i} q{i} z{i * 7} w{i * 13}") for i in range(200)]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string")
    pairs = lsh_candidate_pairs(df, hash_kind="xx64")
    n_boiler = pairs.filter("doc_a < 10000 and doc_b < 10000").count()
    assert n_boiler == 1000 * 999 // 2
    assert pairs.filter("doc_a >= 10000 or doc_b >= 10000").count() < 1000  # no mass cross-pairing


def test_jaccard_hot_shingle_cap(spark):
    """max_shingle_df drops boilerplate shingles from the shingle SPACE: the
    hot bucket (a header shared by every doc) contributes zero pairs, and the
    surviving pairs carry the exact Jaccard of the capped representation —
    verified against a brute-force pandas computation of the same space."""
    import itertools

    from ucuddle_search_engine_spark.operators.dedup import (
        DEFAULT_SHINGLE,
        ngram_jaccard_pairs,
        shingles,
    )

    header = "copyright footer boilerplate navigation menu "
    bodies = {
        0: "alpha beta gamma delta epsilon zeta", 1: "alpha beta gamma delta epsilon eta",
        2: "totally different words appear here now", 3: "alpha beta gamma delta epsilon zeta",
    }
    rows = [(i, header + b) for i, b in bodies.items()]
    # plus 60 docs that share ONLY the header (the hot bucket)
    rows += [(100 + i, header + f"unique tail {i} x{i * 3} y{i * 7} z{i * 11}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 10
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, 0.5, max_shingle_df=cap).collect()
    }

    # brute force over the SAME capped shingle space
    sh = shingles(df, "doc_id", "text", DEFAULT_SHINGLE).toPandas()
    dfreq = sh.groupby("shingle")["doc_id"].nunique()
    keep = set(dfreq[dfreq <= cap].index)
    sets = {d: set(g[g.isin(keep)]) for d, g in sh.groupby("doc_id")["shingle"]}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= 0.5:
            want[(a, b)] = round(inter / union, 6)
    assert got == want and (0, 3) in got  # identical bodies still pair
    # and no header-only pair survives
    assert all(a < 100 and b < 100 for a, b in got)


def test_connected_components_star_long_chain(spark):
    """The O(log n) large-star/small-star variant must converge on a graph
    whose DIAMETER far exceeds any reasonable round budget (a 200-node path),
    and 'auto' must fall back to it instead of raising."""
    from ucuddle_search_engine_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]                      # 0-1-2-…-199
    other = [(1000 + i, 1000 + (i + 1) % 5) for i in range(5)]      # small cycle
    edges = spark.createDataFrame(chain + other, "doc_a long, doc_b long")

    got = {r["doc_id"]: r["component"] for r in connected_components_star(edges).collect()}
    assert all(got[i] == 0 for i in range(n))
    assert all(got[1000 + i] == 1000 for i in range(5))
    assert len(got) == n + 5

    # auto: min-label gives up after max_iter and the star variant finishes
    got2 = {r["doc_id"]: r["component"]
            for r in connected_components(edges, max_iter=4, algorithm="auto").collect()}
    assert got2 == got

    # and on a dense random graph both variants agree
    import random
    rng = random.Random(3)
    rnd = [(rng.randrange(50), rng.randrange(50)) for _ in range(80)]
    rnd = [(a, b) for a, b in rnd if a != b]
    redges = spark.createDataFrame(rnd, "doc_a long, doc_b long")
    a = sorted((r["doc_id"], r["component"])
               for r in connected_components(redges, algorithm="minlabel").collect())
    b = sorted((r["doc_id"], r["component"])
               for r in connected_components_star(redges).collect())
    assert a == b


def test_ivf_training_collect_is_bounded(spark):
    """IVFIndex must never collect the corpus for k-means: whatever
    sample_rate the caller passes, the driver-side training sample is capped
    at TRAIN_CAP (hash-sampled, deterministic)."""
    from ucuddle_search_engine_spark.operators.ann import IVFIndex

    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()

    class Tiny(IVFIndex):
        TRAIN_CAP = 64

    ivf = Tiny(emb, n_centroids=4, n_probe=2)  # default sample_rate=1
    assert ivf.train_size_ <= 3 * 64  # expected ≈ n/ceil(n/cap) ≤ cap (hash variance slack)
    assert ivf.train_size_ < n
    assert ivf.train_size_ >= 8  # still enough to train
    # deterministic: same input → same centroids
    ivf2 = Tiny(emb, n_centroids=4, n_probe=2)
    import numpy as np

    assert np.allclose(ivf.centroids, ivf2.centroids)
    # and the index still answers
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    assert len(ivf.topk(list(q), k=5).collect()) == 5
