"""Scale-hardening tests for the training-data extras (r2 verdict items):
simhash pigeonhole recall, ANN multiprobe recall, minhash exact-dup
pre-collapse, and the single-tokenize-pass epoch contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from perlin_spark.extras import dedup, similarity


def test_simhash_near_equals_bruteforce(spark):
    """Pigeonhole blocking (d+1 disjoint blocks) has GUARANTEED recall:
    output must EQUAL the exhaustive hamming self-join (r1's single
    top-16-bit block missed pairs differing inside that prefix)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_pairs(docs, max_hamming=4).collect()
    }
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 4:
                want.add((a, b, h))
    assert got == want
    assert want, "fixture produced no near pairs; test is vacuous"


def test_simhash_arrow_equals_sql(spark):
    """The one-pass Arrow signature path (scale default, no 60x explode)
    must equal the SQL-form oracle-parity reference bit-for-bit — on
    edge cases (empty/whitespace-only text dropped, duplicate texts
    identical, tabs/newlines/case folding) and on the real corpus."""
    rows = [
        (0, "alpha beta beta gamma"),
        (1, "  alpha\tBETA\ngamma  "),
        (2, "sort merge join hash hash hash"),
        (3, "x"),
        (4, ""),
        (5, "   \t  "),
        (6, "alpha beta beta gamma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sql_sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    arw_sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_arrow(docs).collect()}
    assert sql_sigs == arw_sigs
    assert 4 not in arw_sigs and 5 not in arw_sigs
    assert arw_sigs[0] == arw_sigs[6]

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(corpus).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash_arrow(corpus).collect()}
    assert a == b


def test_simhash_blocks_cover_all_bits():
    for d in (1, 3, 7, 12):
        blocks = dedup.simhash_blocks(d)
        assert len(blocks) == d + 1
        covered = sorted(
            (lo + i) for lo, w in blocks for i in range(w)
        )
        assert covered == list(range(dedup.SIMHASH_BITS))


def _clustered_embeddings(n_clusters=20, per_cluster=100, dim=64, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    members = np.repeat(centers, per_cluster, axis=0) + 0.03 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    members /= np.linalg.norm(members, axis=1, keepdims=True)
    return members


def test_ann_lsh_multiprobe_recall(spark, tmp_path):
    """Multiprobe LSH must recall >= 0.9 of the brute-force top-10 on
    clustered vectors (real embedding workloads cluster; the sf* synthetic
    embeddings are isotropic noise, where no sign-LSH can prune AND recall
    — that is a property of the data, asserted separately below)."""
    E = _clustered_embeddings()
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)

    n_planes = similarity.auto_n_planes(len(E))  # 2000/128 -> 4 planes
    recalls = []
    rng = np.random.default_rng(1)
    sims = E @ E.T
    np.fill_diagonal(sims, -1)
    for q in rng.integers(0, len(E), 5):
        brute = set(np.argsort(-sims[q])[:10].tolist())
        got = similarity.lsh_cosine_topk(
            emb, list(E[q]), k=10, exclude_id=int(q),
            n_planes=n_planes, probe_hamming=1,
        ).collect()
        recalls.append(len(brute & {r["vec_id"] for r in got}) / 10)
    assert np.mean(recalls) >= 0.9, recalls

    # the bucketed at-rest layout returns the same result as the inline path
    probe_q = int(rng.integers(0, len(E)))
    similarity.write_lsh_buckets(emb, str(tmp_path / "lsh"), n_planes, dim=64)
    a = similarity.lsh_cosine_topk(
        emb, list(E[probe_q]), k=10, exclude_id=probe_q, n_planes=n_planes
    ).collect()
    b = similarity.lsh_topk_from_buckets(
        spark, str(tmp_path / "lsh"), list(E[probe_q]), k=10,
        exclude_id=probe_q, n_planes=n_planes,
    ).collect()
    assert [(r["vec_id"], r["cos_x1e4"]) for r in a] == [
        (r["vec_id"], r["cos_x1e4"]) for r in b
    ]


def test_auto_n_shards_bounds_scorer_memory():
    """n_shards grows with the corpus so a shard never exceeds the doc
    budget — per-(term, shard) decode stays a few MB at ANY scale, even
    for a term present in every document (the r1 'unbounded scorer
    memory' defect)."""
    import math

    from perlin_spark.build import SHARD_DOC_BUDGET, auto_n_shards

    for n_docs in (1, 10_000, 10**6, 10**9, 10**12):
        shards = auto_n_shards(n_docs)
        assert math.ceil(n_docs / shards) <= SHARD_DOC_BUDGET
        assert shards >= 8
    assert auto_n_shards(10**12) == math.ceil(10**12 / SHARD_DOC_BUDGET)


def test_auto_n_planes_scales_with_corpus():
    assert similarity.auto_n_planes(100) == 4
    assert similarity.auto_n_planes(128 * 2**10) == 10
    assert similarity.auto_n_planes(128 * 2**20) == 20


def test_minhash_megacluster_precollapse(spark):
    """A mega-cluster of IDENTICAL docs must not explode the LSH band
    buckets: exact duplicates are pre-collapsed to one representative and
    re-expanded afterwards, bit-identically to the naive pipeline."""
    n_dup = 60
    rows = [(i, "common boilerplate header license text " * 3) for i in range(n_dup)]
    rows += [(100 + i, f"unique document number {i} with its own words {i*7}")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jacc_x1e4"] for r in pairs}
    # all duplicate pairs present at jaccard exactly 1
    expect_dups = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert expect_dups <= set(got)
    assert all(got[p] == 10000 for p in expect_dups)
    # and the signature stage saw only the distinct texts (6), not 65 docs:
    # the shingle frame feeding LSH is built from representatives only
    reps = docs.join(
        docs.groupBy(F.sha2("text", 256).alias("sha")).agg(
            F.min("doc_id").alias("doc_id")
        ).select("doc_id"),
        "doc_id",
    )
    assert reps.count() == 6


def test_minhash_bucket_cap_drops_and_logs(spark, caplog):
    """bucket_cap bounds near-identical (non-identical) clusters; drops are
    logged, never silent."""
    rows = [(i, f"shared shingle body common tokens everywhere {i % 2}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import logging

    # cap=0 drops every band bucket: candidate generation is fully cut off
    with caplog.at_level(logging.WARNING):
        capped = dedup.minhash_lsh_pairs(docs, threshold=0.9, bucket_cap=0).collect()
    # near-identical pairs (hamming the two texts differ) are dropped by the
    # cap, but exact-duplicate expansion still reports identical pairs
    assert all(r["jacc_x1e4"] == 10000 for r in capped)
    assert any("dropping" in rec.message for rec in caplog.records)


def test_epoch_tokenizes_once(spark, tmp_path, monkeypatch):
    """build_epoch with several bucket batches must tokenize the corpus
    exactly once (staged parquet), not once per batch (r1 defect)."""
    import perlin_spark.epochs as epochs_mod
    from perlin_spark.analysis import FieldSpec
    from perlin_spark import build as build_mod

    calls = {"n": 0}
    real = build_mod.tokenize_corpus_partial

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(epochs_mod, "tokenize_corpus_partial", counting)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} token{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    root = str(tmp_path / "idx")
    epochs_mod.build_epoch(
        spark, docs, [spec], root, n_shards=2, buckets=8, bucket_batches=4
    )
    assert calls["n"] == 1
    # staging is cleaned up at commit
    import os

    assert not os.path.isdir(os.path.join(root, "epoch=0", "staging"))
    # and the committed epoch is queryable
    idx = epochs_mod.load_index(spark, root)
    assert idx.postings.count() > 0


def test_embedding_near_pairs_full_probe_equals_exact(spark):
    """With probe_hamming covering every mask (2 planes, hamming 2) the
    LSH-blocked near-pair join degenerates to the full pair space, so it
    must EQUAL the brute-force baseline — validates the candidate->verify
    machinery independent of recall tuning."""
    E = _clustered_embeddings(n_clusters=5, per_cluster=20)
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)

    exact = similarity.embedding_near_pairs_exact(emb, threshold=0.8).collect()
    lsh = similarity.embedding_near_pairs(
        emb, threshold=0.8, n_planes=2, probe_hamming=2
    ).collect()
    key = lambda rows: sorted((r["vec_a"], r["vec_b"], r["cos_x1e4"]) for r in rows)
    assert len(exact) > 0
    assert key(lsh) == key(exact)

    # blocked candidates are a subset at tighter settings, each pair once
    sub = similarity.embedding_near_pairs(
        emb, threshold=0.8, n_planes=4, probe_hamming=1
    ).collect()
    assert set(key(sub)) <= set(key(exact))
    assert len(key(sub)) == len(set(key(sub)))


def test_probe_masks():
    assert similarity.probe_masks(4, 0) == [0]
    assert sorted(similarity.probe_masks(4, 1)) == [0, 1, 2, 4, 8]
    m2 = similarity.probe_masks(4, 2)
    assert len(m2) == 1 + 4 + 6 and len(set(m2)) == len(m2)
    with pytest.raises(ValueError):
        similarity.probe_masks(4, 3)


def test_ivf_topk_recall_and_at_rest(spark, tmp_path):
    """IVF probe path finds the true neighbors on clustered data (the
    query's cluster is covered by the probed cells), and the written
    partitionBy(cell) layout returns the identical result."""
    E = _clustered_embeddings(n_clusters=10, per_cluster=50)
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)

    sims = E @ E.T
    np.fill_diagonal(sims, -1)
    recalls = []
    rng = np.random.default_rng(3)
    for q in rng.integers(0, len(E), 4):
        brute = set(np.argsort(-sims[q])[:10].tolist())
        got = similarity.ivf_topk(
            emb, list(E[q]), k=10, n_centroids=32, nprobe=8, exclude_id=int(q)
        ).collect()
        recalls.append(len(brute & {r["vec_id"] for r in got}) / 10)
    assert np.mean(recalls) >= 0.9, recalls

    q = int(rng.integers(0, len(E)))
    cents = similarity.write_ivf_cells(emb, str(tmp_path / "ivf"), n_centroids=32)
    a = similarity.ivf_topk(
        emb, list(E[q]), k=10, n_centroids=32, nprobe=8, exclude_id=q
    ).collect()
    b = similarity.ivf_topk_from_cells(
        spark, str(tmp_path / "ivf"), cents, list(E[q]), k=10, nprobe=8, exclude_id=q
    ).collect()
    assert [(r["vec_id"], r["cos_x1e4"]) for r in a] == [
        (r["vec_id"], r["cos_x1e4"]) for r in b
    ]


def test_embedding_near_pairs_bucket_cap(spark, caplog):
    """A mega-cluster of near-identical vectors is dropped (and logged)
    when its bucket exceeds the cap — bounding the O(m^2) candidate join
    the same way minhash_lsh_pairs does."""
    import logging

    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    mega = base + rng.standard_normal((40, 64)) * 1e-3   # one huge cluster
    rest = rng.standard_normal((20, 64))                 # background noise
    E = np.vstack([mega, rest])
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)

    uncapped = similarity.embedding_near_pairs(
        emb, threshold=0.99, n_planes=4, probe_hamming=0
    ).count()
    assert uncapped > 0
    with caplog.at_level(logging.WARNING):
        capped = similarity.embedding_near_pairs(
            emb, threshold=0.99, n_planes=4, probe_hamming=0, bucket_cap=10
        ).count()
    assert capped < uncapped
    assert any("dropping" in r.message for r in caplog.records)


def test_ivf_kmeans_refinement_improves_assignment(spark, tmp_path):
    """Lloyd-refined centroids fit clustered data far better than the
    seeded sample (mean best-cell cosine), and the refined cells work
    through the written partitionBy(cell) layout end-to-end."""
    E = _clustered_embeddings(n_clusters=10, per_cluster=40)
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)

    def mean_best_cos(cs):
        C = np.array([v for _, v in cs])
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
        return float((E @ C.T).max(axis=1).mean())

    sample = similarity._collect_centroids(emb, 10)
    refined = similarity.ivf_kmeans_centroids(emb, 10, iters=3)
    assert mean_best_cos(refined) > mean_best_cos(sample) + 0.1

    cents = similarity.write_ivf_cells(
        emb, str(tmp_path / "ivfk"), centroids=refined
    )
    q = 123
    got = similarity.ivf_topk_from_cells(
        spark, str(tmp_path / "ivfk"), cents, list(E[q]), k=10, nprobe=3,
        exclude_id=q,
    ).collect()
    sims = E @ E[q]
    sims[q] = -1
    brute = set(np.argsort(-sims)[:10].tolist())
    assert len(brute & {r["vec_id"] for r in got}) >= 9


def test_ivf_cell_udf_matches_expr(spark):
    """The Arrow-UDF assignment and the inlined-expression assignment are
    the same function (max cosine, ties to lowest centroid_id)."""
    E = _clustered_embeddings(n_clusters=6, per_cluster=30)
    pdf = pd.DataFrame({"vec_id": np.arange(len(E)), "embedding": E.tolist()})
    emb = spark.createDataFrame(pdf)
    cents = similarity._collect_centroids(emb, 8)
    via_expr = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id", similarity.ivf_cell_expr(cents).alias("cell")
        ).collect()
    }
    via_udf = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id", similarity.ivf_cell_udf(cents)(F.col("embedding")).alias("cell")
        ).collect()
    }
    assert via_udf == via_expr


def test_minhash_collapse_matches_uncollapsed_on_short_texts(spark):
    """The exact-dup pre-collapse claims output identity with the
    uncollapsed pipeline; the suspect edge is identical texts SHORTER than
    the shingle size (including empty).  shingles_df emits the whole token
    sequence as one shingle for n < k docs, so all three pipelines agree —
    pinned here so a shingles_df change cannot silently break the claim."""
    import pandas as pd

    from perlin_spark.extras.dedup import (
        _minhash_lsh_rep_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5, 6],
        "text": ["hi", "hi", "", "", "a b", "a b", "the quick brown fox jumps"],
    }))
    collapsed = sorted(tuple(r) for r in minhash_lsh_pairs(docs, 0.5).collect())
    uncollapsed = sorted(
        tuple(r) for r in _minhash_lsh_rep_pairs(docs, 0.5, 3, None).collect()
    )
    oracle = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, 0.5).collect())
    assert collapsed == uncollapsed == oracle
    assert (0, 1, 10000) in collapsed and (2, 3, 10000) in collapsed


def test_ivf_cells_self_describing_reopen(spark, tmp_path):
    """write_ivf_cells persists its centroids next to the cells, so a
    fresh process can reopen and query the index with NO in-memory
    centroid list (r2 verdict gap: a restarted query service previously
    had to re-derive centroids).  The _centroids side table must also stay
    invisible to the cell scan itself."""
    import numpy as np

    from perlin_spark.extras import similarity

    rng = np.random.default_rng(7)
    E = rng.normal(size=(300, 16)).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in E[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_self")
    cents = similarity.write_ivf_cells(emb, path, n_centroids=8)

    # the side table round-trips exactly
    assert similarity.read_ivf_centroids(spark, path) == [
        (cid, [float(x) for x in vec]) for cid, vec in sorted(cents)
    ]
    # the cell scan does not pick up the _centroids directory
    cells = spark.read.parquet(path)
    assert sorted(cells.columns) == ["cell", "embedding", "vec_id"]
    assert cells.count() == 300

    q = [float(x) for x in E[5]]
    with_list = [
        (r["vec_id"], round(r["cos_x1e6"], 6)) if "cos_x1e6" in r.asDict() else tuple(r)
        for r in similarity.ivf_topk_from_cells(
            spark, path, cents, q, k=10, nprobe=4, exclude_id=5
        ).collect()
    ]
    reopened = [
        (r["vec_id"], round(r["cos_x1e6"], 6)) if "cos_x1e6" in r.asDict() else tuple(r)
        for r in similarity.ivf_topk_from_cells(
            spark, path, None, q, k=10, nprobe=4, exclude_id=5
        ).collect()
    ]
    assert reopened == with_list and len(reopened) == 10


def test_dedup_components_chain_and_canonical(spark):
    """Connected components must propagate transitively (a chain
    0-1-2-3-4 needs multiple label-propagation rounds, not just one
    neighbor hop), handle several components plus singletons, and
    dedup_keep_canonical must keep exactly one doc per component."""
    import pandas as pd

    from perlin_spark.extras.dedup import dedup_components, dedup_keep_canonical

    pairs = spark.createDataFrame(
        pd.DataFrame({
            "doc_a": [0, 1, 2, 3, 10, 20],
            "doc_b": [1, 2, 3, 4, 11, 21],
            "jacc_x1e4": [10000] * 6,
        })
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(5)) + [10, 11, 20, 21, 99],
                      "text": ["x"] * 10})
    )
    comps = {
        r["doc_id"]: r["component"]
        for r in dedup_components(pairs, docs).collect()
    }
    assert comps == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                     10: 10, 11: 10, 20: 20, 21: 20, 99: 99}

    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [0, 10, 20, 99]


def test_pq_topk_recall_persistence_and_adc_parity(spark, tmp_path):
    """Product quantization: (a) k-means codebooks + exact rerank reach
    high recall on clustered vectors; (b) the written codes table is
    self-describing (codebooks side table round-trips and a fresh reopen
    scores identically); (c) the JVM lookup-table ADC score equals the
    numpy ADC computed driver-side."""
    import numpy as np

    from perlin_spark.extras import similarity as S

    # 10 well-separated clusters in 32 dims
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(10, 32)) * 8.0
    X = np.concatenate(
        [centers[i] + rng.normal(size=(40, 32)) for i in range(10)]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in X[7]]
    brute = [r["vec_id"] for r in S.cosine_topk(emb, q, k=10, exclude_id=7).collect()]

    cb = S.pq_kmeans_codebooks(emb, m=8, ks=16, iters=4)
    got = [r["vec_id"] for r in
           S.pq_topk(emb, q, k=10, codebooks=cb, rerank=60, exclude_id=7).collect()]
    recall = len(set(got) & set(brute)) / 10
    assert recall >= 0.9

    # persistence: write codes + codebooks, reopen fresh, identical output
    path = str(tmp_path / "pq")
    S.write_pq_codes(emb, path, codebooks=cb)
    cb2 = S.read_pq_codebooks(spark, path)
    assert np.allclose(cb, cb2)
    coded = spark.read.parquet(path)
    a = S.pq_topk_from_codes(coded, cb, q, k=10, exclude_id=7).collect()
    b = S.pq_topk_from_codes(coded, cb2, q, k=10, exclude_id=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # rerank against a codes-only table must fail with a clear message,
    # not an opaque unresolved-column error
    import pytest

    with pytest.raises(ValueError, match="embedding"):
        S.pq_topk_from_codes(coded, cb, q, k=10, rerank=20)

    # ADC parity: JVM lookup-table aggregate == numpy lookup sum
    rows = (
        emb.withColumn("codes", S.pq_encode_udf(cb)(F.col("embedding")))
        .withColumn("adc", S.pq_adc_score_col(cb, q))
        .select("vec_id", "codes", "adc")
        .collect()
    )
    qn = np.asarray(q) / np.linalg.norm(q)
    m, ks, dsub = cb.shape
    lut = np.stack([cb[i] @ qn[i * dsub : (i + 1) * dsub] for i in range(m)])
    for r in rows[:50]:
        expect = float(sum(lut[i, c] for i, c in enumerate(r["codes"])))
        assert abs(expect - r["adc"]) < 1e-9


def test_ivf_pq_cells_cold_reopen_recall(spark, tmp_path):
    """The composed serving shape: cell-partitioned PQ codes, queried
    cold (no in-memory index state — both side tables loaded from disk),
    partition-pruned ADC + exact rerank must recover the brute-force
    top-k on clustered vectors."""
    import numpy as np

    from perlin_spark.extras import similarity as S

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(8, 32)) * 8.0
    X = np.concatenate([centers[i] + rng.normal(size=(50, 32)) for i in range(8)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivfpq")
    cents = S.ivf_kmeans_centroids(emb, 8, iters=3)
    cb = S.pq_kmeans_codebooks(emb, m=8, ks=16, iters=3)
    S.write_ivf_pq_cells(emb, path, centroids=cents, codebooks=cb)

    q = [float(x) for x in X[123]]
    brute = [r["vec_id"] for r in S.cosine_topk(emb, q, k=10, exclude_id=123).collect()]
    got = [r["vec_id"] for r in S.ivf_pq_topk_from_cells(
        spark, path, q, k=10, nprobe=3, rerank=60, exclude_id=123
    ).collect()]
    recall = len(set(got) & set(brute)) / 10
    assert recall >= 0.8

    # the pruned scan really reads codes, not a full-table pass: cells on
    # disk are partition dirs and only nprobe of them are in the plan
    plan = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "cell" in plan


def test_filtered_ann_predicate_reaches_scan(spark, tmp_path):
    """Filtered vector search: the metadata predicate must reach the
    parquet FileScan as a DataFilter (rows are skipped before ADC, not
    post-filtered), alongside the nprobe cell partition pruning — and
    the result must contain only qualifying rows."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "fivfpq")
    similarity.write_ivf_pq_cells(emb, path, n_centroids=8)
    q = [float(x) for x in X[3]]
    df = similarity.ivf_pq_topk_from_cells(
        spark, path, q, k=10, nprobe=8, rerank=None, exclude_id=3,
        predicate=F.col("vec_id") % 2 == 0,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "DataFilters" in plan and "% 2" in plan
    got = [r["vec_id"] for r in df.collect()]
    assert got and all(v % 2 == 0 for v in got)


def test_build_ann_index_refined_recall(spark, tmp_path):
    """build_ann_index (k-means-refined centroids+codebooks, the
    documented default off the oracle path) must match or beat the
    seeded build's recall on the degenerate case the seeds are bad at:
    low vec_ids all drawn from ONE cluster, so seeded centroids/codebooks
    describe a single mode of the data."""
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(8, 32)) * 10.0
    # vec_ids 0..49 all come from cluster 0 -> degenerate seeds
    X = np.concatenate([centers[i] + rng.normal(size=(50, 32)) for i in range(8)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    queries = [60, 150, 260, 333]  # one per distinct cluster

    def recall(path, build):
        build()
        total = 0.0
        for qid in queries:
            q = [float(x) for x in X[qid]]
            brute = {r["vec_id"]
                     for r in similarity.cosine_topk(emb, q, k=10, exclude_id=qid).collect()}
            got = {r["vec_id"]
                   for r in similarity.ivf_pq_topk_from_cells(
                       spark, path, q, k=10, nprobe=3, rerank=60, exclude_id=qid
                   ).collect()}
            total += len(got & brute) / 10
        return total / len(queries)

    seeded_path = str(tmp_path / "seeded")
    refined_path = str(tmp_path / "refined")
    r_seeded = recall(
        seeded_path,
        lambda: similarity.write_ivf_pq_cells(emb, seeded_path, n_centroids=8),
    )
    r_refined = recall(
        refined_path,
        lambda: similarity.build_ann_index(emb, refined_path, n_centroids=8),
    )
    assert r_refined >= r_seeded
    assert r_refined >= 0.8


def test_incremental_survivors_lsh_equals_exact(spark):
    """Slice-by-slice ingestion dedup: the LSH-paired scale path must
    select the same surviving new docs as exact n-gram pairing, old docs
    are never dropped, and contamination works both ways (a new doc
    near-dup of an old doc is rejected even as its component's lowest
    new id)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    got_lsh = {
        r["doc_id"]
        for r in dedup.incremental_survivors(old, new, threshold=0.12).collect()
    }
    got_exact = {
        r["doc_id"]
        for r in dedup.incremental_survivors(
            old, new, threshold=0.12, use_lsh=False
        ).collect()
    }
    assert got_lsh == got_exact
    n_new = new.count()
    assert 0 < len(got_lsh) < n_new, "no rejection happened; test is vacuous"
    assert all(d >= 250 for d in got_lsh)  # only new docs are returned


def test_incremental_from_bands_equals_direct(spark, tmp_path):
    """The at-rest incremental path (corpus LSH bands persisted once,
    slice band-joined against them, candidates-only exact verify) must
    produce the same surviving new docs as the direct recompute path."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    bands_path = str(tmp_path / "corpus_bands")
    dedup.write_minhash_bands(old, bands_path)
    got = {
        r["doc_id"]
        for r in dedup.incremental_survivors_from_bands(
            spark, bands_path, old, new, threshold=0.12
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in dedup.incremental_survivors(
            old, new, threshold=0.12, use_lsh=False
        ).collect()
    }
    assert got == want
    assert 0 < len(got) < new.count()


def test_incremental_from_bands_exact_dup_collapse(spark, tmp_path):
    """The at-rest path pre-collapses exact dups in the new slice (the
    r1 adversarial case: identical boilerplate must cost one signature,
    not a quadratic band bucket) and rejects cross-slice exact dups:
    identical signatures guarantee the band collision, so the outcome is
    deterministic."""
    rows_old = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six"),
    ]
    boiler = "seven eight nine ten eleven twelve"
    rows_new = [
        (10, boiler), (11, boiler), (12, boiler),        # intra-slice dups
        (13, "alpha beta gamma delta epsilon zeta"),     # exact dup of old 0
        (14, "completely different words entirely unique tokens"),
    ]
    old = spark.createDataFrame(rows_old, "doc_id long, text string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string")
    bands_path = str(tmp_path / "bands")
    dedup.write_minhash_bands(old, bands_path)
    got = {
        r["doc_id"]
        for r in dedup.incremental_survivors_from_bands(
            spark, bands_path, old, new, threshold=0.5
        ).collect()
    }
    assert got == {10, 14}
    want = {
        r["doc_id"]
        for r in dedup.incremental_survivors(
            old, new, threshold=0.5, use_lsh=False
        ).collect()
    }
    assert got == want


def test_dedup_corpus_job(spark, tmp_path):
    """The spark-submit-able end-to-end dedup job (jobs/dedup_corpus.py):
    LSH pairs -> components -> survivors -> surviving-corpus write.  Its
    survivor set must equal dedup_keep_canonical over exact n-gram pairs
    (LSH recalls all qualifying pairs on this corpus), and the lineage
    artifacts must be internally consistent."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import dedup_corpus as job

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "deduped")
    stats = job.run(spark, docs, 0.12, "lsh", None, out)

    want = {
        r["doc_id"]
        for r in dedup.dedup_keep_canonical(
            docs, dedup.ngram_jaccard_pairs(docs, threshold=0.12)
        ).collect()
    }
    corpus = spark.read.parquet(f"{out}/corpus")
    got = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert got == want
    assert stats["n_survivors"] == len(want)
    assert stats["n_docs"] == docs.count()
    assert stats["n_dropped"] == stats["n_docs"] - stats["n_survivors"]
    assert stats["n_dropped"] > 0, "fixture has no near-dups; test is vacuous"

    comps = spark.read.parquet(f"{out}/_components").collect()
    assert sum(r["n_members"] - 1 for r in comps) == stats["n_dropped"]
    assert all(r["survivor_id"] == r["component"] for r in comps)
    summ = spark.read.parquet(f"{out}/_summary").collect()[0]
    assert summ["n_survivors"] == stats["n_survivors"]
    assert summ["n_components"] == stats["n_survivors"]


def test_ann_index_job(spark, tmp_path, capsys):
    """The spark-submit ANN lifecycle job: build (k-means default) then
    cold query, including the filtered variant."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import ann_index as job

    rng = np.random.default_rng(31)
    X = rng.normal(size=(150, 16))
    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    idx = str(tmp_path / "annidx")
    assert job.main(["build", "--input", src, "--output", idx,
                     "--n-centroids", "8"]) == 0
    assert job.main(["query", "--input", src, "--output", idx,
                     "--query-vec-id", "7", "--k", "5", "--nprobe", "8"]) == 0
    out = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(out) == 5 and all(int(l.split("\t")[0]) != 7 for l in out)
    assert job.main(["query", "--input", src, "--output", idx,
                     "--query-vec-id", "7", "--k", "5", "--nprobe", "8",
                     "--filter", "vec_id % 2 = 0"]) == 0
    out2 = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert out2 and all(int(l.split("\t")[0]) % 2 == 0 for l in out2)


def test_deterministic_sample_and_quality_gate(spark):
    """deterministic_sample must be a pure function of the row key:
    identical membership across partitionings, nested across rates,
    everything at rate 1.0.  filter_corpus must enforce each gate."""
    import pandas as pd

    from perlin_spark.extras.textstats import deterministic_sample, filter_corpus

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(400), "text": ["word"] * 400})
    )
    s5 = {r["doc_id"] for r in deterministic_sample(docs, 0.5, seed=3).collect()}
    s5b = {r["doc_id"] for r in
           deterministic_sample(docs.repartition(7), 0.5, seed=3).collect()}
    s8 = {r["doc_id"] for r in deterministic_sample(docs, 0.8, seed=3).collect()}
    assert s5 == s5b                     # partitioning-independent
    assert s5 <= s8                      # rate bands nest
    assert len({r["doc_id"] for r in deterministic_sample(docs, 1.0).collect()}) == 400
    assert 120 <= len(s5) <= 280         # coarse rate sanity
    # different seed -> different split
    o5 = {r["doc_id"] for r in deterministic_sample(docs, 0.5, seed=4).collect()}
    assert o5 != s5

    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "tiny",                                   # under min_tokens
            "the the the the the the the the of of",  # stopword-dense, repetitive
            "alpha beta gamma delta epsilon zeta",    # clean
            " ".join(["dup"] * 50),                   # uniqueness floor
        ],
    }))
    kept = sorted(r["doc_id"] for r in filter_corpus(
        corpus, min_tokens=5, min_uniq_x1e4=3000, max_stop_x1e4=5000
    ).collect())
    assert kept == [2]


def test_dedup_components_long_chain_converges_fast(spark):
    """Pointer jumping: a 64-link chain must resolve to one component in
    O(log d) label rounds, not 64 — pinned by counting Spark jobs (each
    round costs a fixed small number of jobs; the old one-hop loop would
    need 60+ rounds and blow this budget)."""
    import pandas as pd

    from perlin_spark.extras.dedup import dedup_components

    n = 64
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": range(n - 1), "doc_b": range(1, n),
                      "jacc_x1e4": [10000] * (n - 1)})
    )
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None))
    comps = dedup_components(pairs).collect()
    j1 = len(tracker.getJobIdsForGroup(None))
    assert {r["component"] for r in comps} == {0}
    assert len(comps) == n
    # ~log2(64)+3 ≈ 9 rounds at ~8 AQE jobs each; the one-hop loop would
    # need 60+ rounds (~500 jobs) — budget excludes O(d) convergence
    assert (j1 - j0) <= 120


def test_pq_adc_udf_path_matches_inline(spark):
    """Above ADC_INLINE_MAX the scoring column switches from inlined
    literals to an Arrow UDF; both paths must produce identical scores
    on the same codes."""
    import numpy as np

    from perlin_spark.extras import similarity as S

    rng = np.random.default_rng(2)
    X = rng.normal(size=(80, 32))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in X[3]]
    cb = S.pq_codebooks(emb, m=8, ks=16)
    inline = S.pq_topk(emb, q, k=10, codebooks=cb, exclude_id=3).collect()
    old = S.ADC_INLINE_MAX
    try:
        S.ADC_INLINE_MAX = 0  # force the UDF path
        via_udf = S.pq_topk(emb, q, k=10, codebooks=cb, exclude_id=3).collect()
    finally:
        S.ADC_INLINE_MAX = old
    assert [tuple(r) for r in inline] == [tuple(r) for r in via_udf]


def test_sessionize_gap_boundary(spark):
    """The session gap is strict (> gap_s): events exactly gap_s apart
    stay in one session; one second more starts a new one."""
    import datetime as dt

    import pandas as pd

    from perlin_spark.extras.events import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "ts": [t0, t0 + dt.timedelta(seconds=1800),
               t0 + dt.timedelta(seconds=1800 + 1801), t0 + dt.timedelta(days=30)],
        "user_id": [7, 7, 7, 8],
        "event_type": ["view"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["duration_s"])
        for r in sessionize(spark.createDataFrame(rows), gap_s=1800).collect()
    }
    # user 7: events 0,1 in session 0 (exactly 1800s apart); event 2 opens
    # session 1; user 8 is its own session
    assert got == {(7, 0): (2, 1800), (7, 1): (1, 0), (8, 0): (1, 0)}


# ---------------------------------------------------------------- r4 late:
# hybrid RRF fusion + pretraining-pipeline textstats (repetition,
# decontamination, sequence packing, mixture sampling)


def test_rrf_fuse_math_and_missing_docs(spark):
    """RRF score is exactly sum(1/(60+rank)) over the runs a doc appears
    in; missing docs contribute 0 for that run; ties break by doc_id."""
    from perlin_spark.extras import fusion

    bm25 = spark.createDataFrame(
        [(10, 900), (20, 800), (30, 700)], "doc_id long, score_x1e4 long"
    )
    ann = spark.createDataFrame(
        [(20, 95), (40, 90), (10, 85)], "doc_id long, cos_x1e4 long"
    )
    got = {
        r["doc_id"]: r["rrf_x1e6"]
        for r in fusion.rrf_fuse({"bm25": bm25, "ann": ann}, topk=10).collect()
    }

    def x1e6(*ranks):
        import math
        return math.floor(sum(1.0 / (60 + r) for r in ranks) * 1e6 + 0.5)

    # bm25 ranks: 10->1 20->2 30->3; ann ranks: 20->1 40->2 10->3
    assert got == {
        10: x1e6(1, 3),
        20: x1e6(2, 1),
        30: x1e6(3),
        40: x1e6(2),
    }
    # doc in both runs always beats a doc in one run at comparable ranks
    assert got[20] > got[30] and got[10] > got[40]


def test_rrf_fuse_tie_break_and_topk(spark):
    """Identical scores rank by doc_id asc (the repo-wide tie-break), and
    topk truncates after the deterministic (rrf desc, doc_id asc) sort."""
    from perlin_spark.extras import fusion

    run_a = spark.createDataFrame(
        [(3, 50), (1, 50), (2, 50)], "doc_id long, s long"
    )
    run_b = spark.createDataFrame(
        [(2, 9), (3, 9), (1, 9)], "doc_id long, s long"
    )
    rows = fusion.rrf_fuse({"a": run_a, "b": run_b}, topk=2).collect()
    # all-tied scores => both runs rank 1,2,3 by doc_id => doc 1 wins
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["rrf_x1e6"] > rows[1]["rrf_x1e6"]


def test_repetition_stats_known_docs(spark):
    """Hand-checked repetition fractions, including the no-gram and
    empty-text rows that must survive with zeros."""
    from perlin_spark.extras import textstats

    docs = spark.createDataFrame(
        [
            (0, "a a a a a a"),          # 5x "a a" 2-grams, 2x dup 5-grams
            (1, "a b c d e f"),          # all unique
            (2, "x"),                    # too short for any gram
            (3, ""),                     # tokenless
            (4, "go go stop go go stop"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_2grams"], r["top_2gram_x1e4"], r["n_5grams"], r["dup_5gram_x1e4"]
        )
        for r in textstats.repetition_stats(docs).collect()
    }
    assert got[0] == (5, 10000, 2, 10000)
    assert got[1] == (5, 2000, 2, 0)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (0, 0, 0, 0)
    # doc 4 2-grams: go-go x2, go-stop x2, stop-go x1 => top 2/5 = 4000
    assert got[4] == (5, 4000, 2, 0)


def test_contamination_and_decontaminate(spark):
    """A train doc sharing any k-gram with the eval set is flagged with
    its DISTINCT hit-gram count; decontaminate is the exact anti-join.
    Docs shorter than k match as whole documents."""
    from perlin_spark.extras import textstats

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated training text here"),
            (3, "tiny doc"),
            (4, "quick brown fox appears twice quick brown fox appears"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "a quick brown fox story"), (101, "tiny doc")],
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in textstats.contamination_hits(train, eval_docs, k=3).collect()
    }
    # doc 1 shares "quick brown fox"; doc 4 shares it too (distinct => 1);
    # doc 3 is shorter than k and equals eval doc 101 whole-doc
    assert hits == {1: 1, 4: 1, 3: 1}
    kept = sorted(
        r["doc_id"]
        for r in textstats.decontaminate(train, eval_docs, k=3).collect()
    )
    assert kept == [2]


def test_pack_sequences_matches_naive_prefix_sum(spark):
    """The bucketed two-phase prefix sum must equal the naive
    doc_id-ordered cumulative sum, across bucket boundaries, with
    non-contiguous ids and zero-token docs excluded."""
    import random

    from perlin_spark.extras import textstats

    rng = random.Random(7)
    rows = []
    for doc_id in sorted(rng.sample(range(1000), 40)):
        n = rng.choice([0, 1, 3, 7, 12])
        rows.append((doc_id, " ".join(f"t{i}" for i in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_first"], r["seq_last"])
        for r in textstats.pack_sequences(docs, seq_len=8, bucket=4).collect()
    }
    off = 0
    want = {}
    for doc_id, text in rows:
        n = len(text.split())
        if n == 0:
            continue
        want[doc_id] = (n, off, off // 8, (off + n - 1) // 8)
        off += n
    assert got == want
    # the fixture must actually straddle sequences and buckets
    assert any(v[2] != v[3] for v in want.values())
    assert len({d // 4 for d in want}) > 3


def test_mixture_sample_bands_and_consistency(spark):
    """Per-group keep rates honor the band: rate-1.0 groups keep all,
    rate-0 groups keep none, and the kept set at a lower rate is a
    subset of the kept set at a higher rate (same seed) — the property
    that makes re-mixing cheap on an already-sampled corpus."""
    from perlin_spark.extras import textstats

    rows = [(i, f"text {i}", ["books", "web", "junk"][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def kept(rates, default=0.0):
        return {
            r["doc_id"]
            for r in textstats.mixture_sample(
                docs, rates, default_rate=default, seed=3
            ).collect()
        }

    all_books = {i for i, _, s in rows if s == "books"}
    k = kept({"books": 1.0, "web": 0.5, "junk": 0.0})
    assert k & all_books == all_books
    assert not any(i % 3 == 2 for i in k)
    web_lo = kept({"web": 0.25}) ; web_hi = kept({"web": 0.5})
    assert web_lo <= web_hi
    assert 0 < len(web_lo) < len(web_hi) < 100
    # default_rate applies to unlisted groups
    assert kept({}, default=1.0) == {i for i, _, _ in rows}


def test_kmeans_build_exact_at_oracle_settings(spark, tmp_path):
    """Guard for the ann_ivf_pq_kmeans driver oracle: the DEFAULT build
    (build_ann_index) served at the oracle's pinned settings (nprobe=10
    of 16 cells, rerank=200) must return EXACTLY the brute-force cosine
    top-10 on both test corpora — a recall miss there is a real defect,
    not oracle noise."""
    for sf in ("0.001", "0.01"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        path = str(tmp_path / f"km{sf}")
        similarity.build_ann_index(emb, path, n_centroids=16)
        got = [
            (r["vec_id"], r["cos_x1e4"])
            for r in similarity.ivf_pq_topk_from_cells(
                spark, path, qv, k=10, nprobe=10, rerank=200, exclude_id=0
            ).collect()
        ]
        want = [
            (r["vec_id"], r["cos_x1e4"])
            for r in similarity.cosine_topk(emb, qv, k=10, exclude_id=0).collect()
        ]
        assert got == want, sf


def test_chunk_documents_windows(spark):
    """Overlapping token-window chunking: chunk i covers
    [i*stride, i*stride+chunk); the remainder chunk is never empty and
    never duplicated; zero-token docs are dropped; reassembling chunk
    heads (first `stride` tokens) + the last chunk reproduces the doc."""
    from perlin_spark.extras import textstats

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),   # multi-chunk
            (1, " ".join(f"u{i}" for i in range(4))),    # n == chunk
            (2, " ".join(f"v{i}" for i in range(5))),    # n == chunk+1
            (3, " ".join(f"w{i}" for i in range(7))),    # (n-c) % stride == 0
            (4, "solo"),                                  # n < chunk
            (5, "   "),                                   # zero tokens: dropped
        ],
        "doc_id long, text string",
    )
    c, o = 4, 1  # stride 3
    out = textstats.chunk_documents(docs, chunk_tokens=c, overlap=o)
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["tok_start"], r["n_tokens"], r["chunk"])
        for r in out.collect()
    }

    def ref(tokens):
        s = c - o
        import math

        n_chunks = 1 + math.ceil(max(len(tokens) - c, 0) / s)
        return {
            i: (i * s, min(c, len(tokens) - i * s),
                " ".join(tokens[i * s : i * s + c]))
            for i in range(n_chunks)
        }

    for doc_id, text in [(0, [f"t{i}" for i in range(10)]),
                         (1, [f"u{i}" for i in range(4)]),
                         (2, [f"v{i}" for i in range(5)]),
                         (3, [f"w{i}" for i in range(7)]),
                         (4, ["solo"])]:
        want = ref(text)
        got = {cid: rows[(doc_id, cid)] for (d, cid) in rows if d == doc_id}
        assert got == want, doc_id
        # every chunk non-empty; reassembly reproduces the doc exactly
        assert all(v[1] > 0 for v in want.values())
        s = c - o
        last = max(want)
        reassembled = [t for i in range(last) for t in want[i][2].split()[:s]]
        reassembled += want[last][2].split()
        assert reassembled == text
    assert not [k for k in rows if k[0] == 5]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        textstats.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_segment_dedup(spark):
    from perlin_spark.extras import textstats

    docs = spark.createDataFrame(
        [
            (0, "a b c x y z"),
            (1, "a b c q r"),
            (2, "u v w"),
            (3, "a b c"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_segments"], r["n_dropped"])
        for r in textstats.segment_dedup(docs, seg_tokens=3, min_docs=2).collect()
    }
    # "a b c" occurs in docs 0,1,3 -> boilerplate, dropped everywhere
    assert out[0] == ("x y z", 2, 1)
    assert out[1] == ("q r", 2, 1)
    assert out[2] == ("u v w", 1, 0)      # unique content untouched
    assert out[3] == ("", 1, 1)           # all-boiler doc kept, emptied
    assert 4 not in out                   # empty doc has no segments
    # min_docs above the max multiplicity -> nothing dropped
    out3 = {r["doc_id"]: r["n_dropped"]
            for r in textstats.segment_dedup(docs, seg_tokens=3, min_docs=4).collect()}
    assert set(out3.values()) == {0}


def test_redact_pii(spark):
    from perlin_spark.extras import textstats

    docs = spark.createDataFrame(
        [
            (0, "mail me at bob@example.com or visit https://x.io/a?b=c now"),
            (1, "server 10.0.0.1 and 192.168.1.255 up"),
            (2, "see https://a.b/c bob@x.yz 1.2.3.4"),
            (3, "clean text"),
            (4, "url with creds https://u@h.io/p stays one URL"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.redact_pii(docs).collect()}
    assert out[0]["text_redacted"] == "mail me at <EMAIL> or visit <URL> now"
    assert (out[0]["n_url"], out[0]["n_email"], out[0]["n_ipv4"]) == (1, 1, 0)
    assert out[1]["text_redacted"] == "server <IP> and <IP> up"
    assert out[1]["n_ipv4"] == 2
    assert out[2]["text_redacted"] == "see <URL> <EMAIL> <IP>"
    assert tuple(out[3]) == (3, "clean text", 0, 0, 0)
    # the URL stage runs first, so its userinfo never counts as an email
    assert (out[4]["n_url"], out[4]["n_email"]) == (1, 0)


# --- exact-substring (token k-gram) dedup ---------------------------------

def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_spans_basic_and_merge(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _doc_df(spark, [
        f"one two {shared} three four",
        f"{shared} unrelated tail words here now",
        "completely different text with no shared gram at all ok",
    ])
    spans = dedup.duplicate_substring_spans(docs, k=8).orderBy("doc_id").collect()
    # the 8-token shared gram appears once in each of docs 0 and 1
    assert [(r.doc_id, r.start_pos, r.end_pos, r.n_grams) for r in spans] == [
        (0, 2, 10, 1),
        (1, 0, 8, 1),
    ]


def test_substring_spans_overlap_merges_to_one_island(spark):
    # a 10-token shared run => three marked gram sites (k=8) in each doc,
    # consecutive positions, must merge into ONE span covering the run
    run = "a b c d e f g h i j"
    docs = _doc_df(spark, [f"x {run} y", f"{run} z w q r s"])
    spans = dedup.duplicate_substring_spans(docs, k=8).orderBy("doc_id").collect()
    assert [(r.doc_id, r.start_pos, r.end_pos, r.n_grams) for r in spans] == [
        (0, 1, 11, 3),
        (1, 0, 10, 3),
    ]


def test_substring_spans_within_doc_repeat_excluded(spark):
    # the same 8-gram twice in ONE doc is not cross-document duplication
    run = "p q r s t u v w"
    docs = _doc_df(spark, [
        f"{run} mid {run}",
        "nothing in common with the first document at all here",
    ])
    assert dedup.duplicate_substring_spans(docs, k=8).count() == 0


def test_substring_spans_short_docs_skipped(spark):
    docs = _doc_df(spark, ["one two three", "one two three"])
    assert dedup.duplicate_substring_spans(docs, k=8).count() == 0


def test_substring_dup_stats_fraction(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _doc_df(spark, [
        f"{shared} one two",          # 10 tokens, 8 duplicated
        f"pre {shared}",              # 9 tokens, 8 duplicated
        "no overlap here with anything else in this tiny corpus",
    ])
    stats = {r.doc_id: r for r in dedup.substring_dup_stats(docs, k=8).collect()}
    assert stats[0].dup_tokens == 8 and stats[0].n_tokens == 10
    assert abs(stats[0].dup_frac - 0.8) < 1e-9
    assert stats[1].dup_tokens == 8 and stats[1].n_tokens == 9
    assert stats[2].dup_tokens == 0 and stats[2].dup_frac == 0.0


def test_sq_topk_recall_quantizer_and_served_parity(spark, tmp_path):
    """int8 scalar quantization (the third ANN family): (a) the pinned
    quantizer agrees between the Spark column expression and the
    driver-side query twin; (b) int8-dot candidates + exact rerank
    recover brute-force cosine top-k on clustered vectors; (c) the
    written codes layout (write_sq_codes -> sq_topk_from_codes) returns
    byte-identical output to the in-memory path."""
    from perlin_spark.extras import similarity as S

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 24)) * 6.0
    X = np.concatenate(
        [centers[i] + rng.normal(size=(30, 24)) for i in range(8)]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in X[5]]

    scale = S.sq_scale(emb)
    assert scale > 0
    # (a) quantizer parity: column expression vs driver twin, per row
    got_codes = {
        r["vec_id"]: list(r["codes"])
        for r in emb.select(
            "vec_id", S.sq_codes_col(scale).alias("codes")
        ).limit(40).collect()
    }
    for vid, codes in got_codes.items():
        assert codes == S.sq_quantize_query([float(x) for x in X[vid]], scale), vid
        assert max(abs(c) for c in codes) <= 127

    # (b) recall vs exact brute force
    brute = [r["vec_id"] for r in S.cosine_topk(emb, q, k=10, exclude_id=5).collect()]
    got = [r["vec_id"] for r in S.sq_topk(emb, q, k=10, exclude_id=5).collect()]
    recall = len(set(got) & set(brute)) / 10
    assert recall >= 0.9

    # (c) served-from-disk parity (narrow codes scan + rerank join)
    path = str(tmp_path / "sq")
    wrote = S.write_sq_codes(emb, path, scale=scale)
    assert wrote == scale
    served = S.sq_topk_from_codes(spark, path, emb, q, k=10, exclude_id=5).collect()
    inmem = S.sq_topk(emb, q, k=10, exclude_id=5, scale=scale).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in inmem]


def test_fingerprint_min_of_shingle_hashes(spark):
    """fingerprint = min over k-token-shingle md5-60bit hashes; short
    docs (< k tokens) fall back to hashing the whole text as one
    shingle.  Hand-verified against hashlib on both branches."""
    import hashlib

    from perlin_spark.extras import textstats

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"]
           for r in textstats.fingerprint(docs, k=5).collect()}
    toks = "a b c d e f g".split()
    want0 = min(h60(" ".join(toks[i:i + 5])) for i in range(3))
    assert got[0] == want0
    assert got[1] == h60("x y")


def test_date_histogram_calendar_boundaries(spark):
    """Calendar alignment: month buckets split at month boundaries
    (variable length), week buckets start Monday, and the counts/stats
    fold exactly; unknown units refuse loudly."""
    import datetime as dt

    import pytest as _pytest

    from perlin_spark.extras import events as E

    rows = [
        # Jan 31 23:30 and Feb 1 00:30 straddle a month boundary
        (0, dt.datetime(2024, 1, 31, 23, 30), 1, "click", 1.0, "{}"),
        (1, dt.datetime(2024, 2, 1, 0, 30), 1, "click", 2.0, "{}"),
        # Sun Feb 4 / Mon Feb 5 straddle an ISO week boundary
        (2, dt.datetime(2024, 2, 4, 12, 0), 2, "view", 0.5, "{}"),
        (3, dt.datetime(2024, 2, 5, 0, 0), 2, "view", 0.25, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    mon = {(r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"])
           for r in E.date_histogram(ev, "month").collect()}
    assert mon[("2024-01-01 00:00:00", "click")] == (1, 100)
    assert mon[("2024-02-01 00:00:00", "click")] == (1, 200)
    wk = {r["bucket"] for r in E.date_histogram(ev, "week").collect()
          if r["event_type"] == "view"}
    assert wk == {"2024-01-29 00:00:00", "2024-02-05 00:00:00"}
    with _pytest.raises(ValueError, match="unit"):
        E.date_histogram(ev, "fortnight")


def test_date_histogram_epoch_math_equals_date_trunc(spark):
    """r6 pin: the fixed-width epoch-arithmetic buckets (hour/day/week)
    and the format-after-aggregation rewrite must reproduce the naive
    per-row date_trunc+date_format formulation exactly, including
    pre-1970 timestamps (floor division toward -inf)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from perlin_spark.extras import events as E
    from perlin_spark.extras.events import _epoch_s

    rng_rows = []
    base = dt.datetime(1969, 11, 30, 7, 13, 21)
    for i in range(300):
        ts = base + dt.timedelta(hours=17 * i, minutes=(i * 37) % 60)
        rng_rows.append((i, ts, i % 7, "t" + str(i % 3), float(i) / 3.0, "{}"))
    ev = spark.createDataFrame(
        rng_rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    for unit in E.DATE_HISTOGRAM_UNITS:
        ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_interval(
            secs=_epoch_s(ev).cast("double")
        )
        bucket = F.date_format(F.date_trunc(unit, ntz), "yyyy-MM-dd HH:mm:ss")
        naive = (
            ev.groupBy(bucket.alias("bucket"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.floor(F.sum("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("sum_value_x100"),
            )
            .orderBy("bucket", "event_type")
            .collect()
        )
        got = E.date_histogram(ev, unit).collect()
        assert got == naive, unit


def test_verify_pairs_hashed_equals_string(spark):
    """The r6 hashed-key verify (join on xxhash64(shingle) when the hash
    is proven collision-free on the corpus) must return exactly the
    string-join rows — pairs, jaccard values, and the injectivity guard
    itself — on a corpus with short docs, exact dups, and near-dups."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = dedup.shingles_df(docs)
    assert dedup._xxh_injective_on(sh)
    ids = docs.select("doc_id")
    cands = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("doc_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .sample(0.05, seed=11)
    )
    want = {
        (r["doc_a"], r["doc_b"], r["jacc_x1e4"])
        for r in dedup.verify_pairs_exact(cands, sh, sh, 0.05).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["jacc_x1e4"])
        for r in dedup.verify_pairs_exact(cands, sh, sh, 0.05, hashed=True).collect()
    }
    assert got == want
    assert want, "fixture produced no verified pairs; test is vacuous"


def test_contamination_hash_prefilter_equals_direct_join(spark):
    """contamination_hits' r6 hash prefilter (xxhash64 over token-array
    windows, string verify on candidate docs only) must equal the direct
    single-pass string-gram join on every doc — including docs shorter
    than k (whole-doc grams) and empty/whitespace-only texts."""
    from perlin_spark.extras import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = textstats.deterministic_sample(docs, 0.8, seed=3)
    ev = docs.join(train.select("doc_id"), "doc_id", "left_anti")
    edge = spark.createDataFrame(
        [(90001, "tiny"), (90002, ""), (90003, "   \t "), (90004, "a b c d e")],
        "doc_id long, text string",
    )
    train = train.select("doc_id", "text").unionByName(edge)
    for k in (3, 8):
        ev_g = textstats._decon_grams(ev, k).select("g").distinct()
        want = {
            (r["doc_id"], r["n_hit_ngrams"])
            for r in textstats._decon_grams(train, k)
            .join(F.broadcast(ev_g), "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
            .collect()
        }
        got = {
            (r["doc_id"], r["n_hit_ngrams"])
            for r in textstats.contamination_hits(train, ev, k).collect()
        }
        assert got == want, k
        assert want, "fixture produced no contamination; test is vacuous"


def test_dedup_components_no_pairs_all_singletons(spark):
    """The fused first round must keep the empty-edge path intact: with
    no dup pairs every doc is its own singleton component, and the loop
    exits after the free first round (no init-sum job to compare)."""
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (7, "c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long, jacc_x1e4 long")
    got = {
        (r["doc_id"], r["component"])
        for r in dedup.dedup_components(pairs, docs).collect()
    }
    assert got == {(1, 1), (2, 2), (7, 7)}
