"""Text / dedup / similarity function tests + driver-contract smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from em_connected_components_spark.functions import dedup_docs as dd
from em_connected_components_spark.functions import similarity as sim
from em_connected_components_spark.functions import text as tx


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )


def test_token_count_edges(spark):
    df = _docs(spark, ["", "   ", "one", " a  b\tc ", "x y"])
    got = [
        r["n"] for r in df.select(tx.token_count("text").alias("n")).collect()
    ]
    assert got == [0, 0, 1, 3, 2]


def test_fingerprint_is_md5_prefix(spark):
    import hashlib

    df = _docs(spark, ["hello world"])
    got = df.select(tx.fingerprint("text").alias("fp")).collect()[0]["fp"]
    assert got == hashlib.md5(b"hello world").hexdigest()[:16]


def test_exact_dedup(spark):
    df = _docs(spark, ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    groups = dd.exact_duplicate_groups(df).collect()
    assert {(g["n_docs"], g["keeper_id"]) for g in groups} == {(3, 0), (2, 1)}
    kept = dd.exact_dedup(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 3]


def test_collapse_exact_dups_beats_df_cap(spark):
    # a 2000-copy exact-dup cluster pushes every shingle it shares over a
    # max_doc_freq=1000 cap, so the plain path is structurally blind to it
    # (the documented recall bound); collapse_exact_dups=True shingles one
    # representative per text and fans results back out
    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = base.replace("theta", "iota")  # near-dup of the cluster
    other = "totally unrelated words that share no trigram with anything"
    texts = [base] * 2000 + [near, other]
    df = _docs(spark, texts)

    plain = dd.jaccard_near_duplicates(
        df, max_doc_freq=1000, threshold=0.2, collapse_exact_dups=False
    )
    # the cluster's own shingles all have df=2000 > cap; `near` shares only
    # those shingles with the cluster -> zero candidates at all
    assert plain.count() == 0

    collapsed = dd.jaccard_near_duplicates(
        df, max_doc_freq=1000, threshold=0.2, collapse_exact_dups=True
    )
    rows = collapsed.collect()
    # C(2000,2) intra-cluster pairs at jaccard 1.0 + 2000 cross pairs to
    # `near` (doc_id 2000), nothing touching `other` (doc_id 2001)
    intra = [r for r in rows if r["jaccard6"] == 1.0]
    cross = [r for r in rows if r["jaccard6"] < 1.0]
    assert len(intra) == 2000 * 1999 // 2
    assert len(cross) == 2000
    assert all(r["id_b"] == 2000 for r in cross)
    assert all(r["id_a"] != 2001 and r["id_b"] != 2001 for r in rows)
    # exact Jaccard of base-vs-near: 6 word-3-grams each, 5 shared -> 5/7
    expected_j = round(5 / 7, 6)
    assert all(abs(r["jaccard6"] - expected_j) < 1e-9 for r in cross)


def test_collapse_exact_dups_agrees_when_cap_inactive(spark):
    # below the cap, both paths must produce the identical pair set
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different words about spark shuffles and parquet files"
    texts = [base, base, near, other]
    df = _docs(spark, texts)
    a = dd.jaccard_near_duplicates(df, threshold=0.2,
                                   collapse_exact_dups=False)
    b = dd.jaccard_near_duplicates(df, threshold=0.2,
                                   collapse_exact_dups=True)
    sa = {(r["id_a"], r["id_b"], r["jaccard6"]) for r in a.collect()}
    sb = {(r["id_a"], r["id_b"], r["jaccard6"]) for r in b.collect()}
    assert sa == sb


def test_minhash_near_duplicates_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different words about spark shuffles and parquet files"
    df = _docs(spark, [base, near, other])
    pairs = dd.minhash_near_duplicates(df, threshold=0.5, num_hashes=16, bands=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 1)}


def test_shingle_candidate_df_cap_bounds_hot_shingle(spark):
    # 20 docs all share one hot 3-gram; pairs of real near-dups also share
    # rare shingles. With the cap below 20 the hot shingle is excluded from
    # candidate generation: only the rare-shingle pair survives, instead of
    # the full 20*19/2 quadratic candidate set.
    hot = "common header line"
    texts = [f"{hot} unique tail number {i} content {i * 7}" for i in range(20)]
    texts[1] = texts[0].replace("content", "material")  # near-dup of doc 0
    df = _docs(spark, texts)
    sh = dd.shingles(df, n=3)
    uncapped = dd.shingle_candidate_pairs(sh, max_doc_freq=10**9)
    capped = dd.shingle_candidate_pairs(sh, max_doc_freq=10)
    assert uncapped.count() == 20 * 19 // 2
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(0, 1)}  # bounded: only the genuinely-overlapping pair
    # and the surviving pair still carries its full Jaccard (numerator uses
    # ALL shingles including the capped one)
    j = dd.ngram_jaccard_pairs(sh, capped).collect()[0]["jaccard6"]
    assert j > 0.3


def test_simhash_md5_definition_golden(spark):
    # pin the engine-portable simhash definition: pure-Python recomputation
    # of the md5 hi/lo feature halves + per-bit majority votes
    import hashlib

    texts = ["alpha beta gamma", "one two three four five", "alpha alpha beta"]
    df = _docs(spark, texts)
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash(df).collect()}

    def py_simhash(text):
        votes = [0] * 64
        for w in text.strip().split():
            d = hashlib.md5(w.encode()).hexdigest()
            hi, lo = int(d[:8], 16), int(d[8:16], 16)
            for b in range(64):
                bit = (lo >> b) & 1 if b < 32 else (hi >> (b - 32)) & 1
                votes[b] += 1 if bit else -1
        u = sum(1 << b for b in range(64) if votes[b] > 0)
        return u - (1 << 64) if u >= (1 << 63) else u

    assert got == {i: py_simhash(t) for i, t in enumerate(texts)}


def test_simhash_identical_and_near(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [base, base, base + " lambda", "totally unrelated content here now"])
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(df).collect()}
    assert sh[0] == sh[1]

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(sh[0], sh[2]) < hamming(sh[0], sh[3])


def test_language_id(spark):
    df = _docs(
        spark,
        [
            "the cat and the dog went to the house that is big",
            "der hund und die katze sind nicht im haus das ist gut",
            "le chat et la maison est une belle chose dans les arbres",
            "el perro y los gatos es una cosa que pasa en las calles",
        ],
    )
    got = [r["p"] for r in df.select(tx.language_id_expr("text").alias("p")).collect()]
    assert got == ["en", "de", "fr", "es"]
    # pandas-UDF variant agrees on these clear-cut fixtures
    got2 = [r["lang_pred"] for r in tx.language_id_pandas(df).collect()]
    assert got2 == got


def test_quality_score_ordering(spark):
    decent = " ".join(["word"] * 120)
    noisy = "!!! ??? 123 456 %%% ### " * 10
    df = _docs(spark, [decent, noisy])
    rows = {r["doc_id"]: r["quality_score"] for r in tx.quality_score(df).collect()}
    assert rows[0] > rows[1]
    assert 0.0 <= rows[1] <= rows[0] <= 1.0


def _vecs(spark, rows):
    return spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")


def test_knn_bruteforce_planted(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    corpus = [(i, [float(x) for x in rng.randn(8)]) for i in range(50)]
    # vector 100 is a near-copy of vector 3
    near = [x * 1.01 for x in corpus[3][1]]
    corpus.append((100, near))
    df = _vecs(spark, corpus)
    q = df.filter(F.col("vec_id") == 3)
    top = sim.cosine_topk_bruteforce(df, q, k=1)
    row = top.collect()[0]
    assert (row["query_id"], row["neighbor_id"], row["rank"]) == (3, 100, 1)


def test_knn_lsh_buckets_deterministic_and_finds_copy(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    corpus = [(i, [float(x) for x in rng.randn(16)]) for i in range(80)]
    corpus.append((200, list(corpus[5][1])))  # exact copy of id 5
    df = _vecs(spark, corpus)
    b1 = sorted(map(tuple, sim.lsh_bucket(df, dim=16, planes=6).select("vec_id", "bucket").collect()))
    b2 = sorted(map(tuple, sim.lsh_bucket(df, dim=16, planes=6).select("vec_id", "bucket").collect()))
    assert b1 == b2  # deterministic hyperplanes
    q = df.filter(F.col("vec_id") == 5)
    top = sim.cosine_topk_lsh(df, q, dim=16, k=1, planes=6)
    row = top.collect()[0]
    assert (row["neighbor_id"], row["rank"]) == (200, 1)  # same bucket by construction


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 25  # 25 nations -> 25 star components
    assert [f.name for f in df.schema.fields] == ["comp", "size"]
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())

def test_embedding_near_dups_exact_planted(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    corpus = [(i, [float(x) for x in rng.randn(16)]) for i in range(40)]
    corpus.append((100, [x * 2.0 for x in corpus[7][1]]))  # scaled copy, cos=1
    df = _vecs(spark, corpus)
    pairs = sim.embedding_near_duplicates(df, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(7, 100)}
    assert abs(pairs[0]["cos9"] - 1.0) < 1e-6


def test_embedding_near_dups_lsh_finds_copy(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    corpus = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    corpus.append((300, list(corpus[9][1])))  # identical -> same bucket always
    df = _vecs(spark, corpus)
    pairs = sim.embedding_near_duplicates_lsh(
        df, dim=16, threshold=0.95, planes=6
    ).collect()
    assert (9, 300) in {(r["id_a"], r["id_b"]) for r in pairs}
    # candidates restricted to shared buckets: every reported pair passes the
    # exact threshold too (no false positives by construction)
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_duplicates(df, threshold=0.95).collect()
    }
    assert {(r["id_a"], r["id_b"]) for r in pairs} <= exact


def test_ivf_full_probe_equals_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    corpus = [(i, [float(x) for x in rng.randn(12)]) for i in range(90)]
    df = _vecs(spark, corpus)
    q = df.filter(F.col("vec_id") < 5)
    # probing every inverted list == exact brute force
    ivf = sim.cosine_topk_ivf(df, q, k=4, n_lists=8, nprobe=8)
    bf = sim.cosine_topk_bruteforce(df, q, k=4)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_ivf_partial_probe_recall(spark):
    import numpy as np

    rng = np.random.RandomState(17)
    corpus = [(i, [float(x) for x in rng.randn(12)]) for i in range(200)]
    df = _vecs(spark, corpus)
    q = df.filter(F.col("vec_id") < 10)
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk_ivf(df, q, k=5, n_lists=8, nprobe=4).collect()
    }
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk_bruteforce(df, q, k=5).collect()
    }
    # half the lists probed -> decent recall on random data
    assert len(ivf & bf) / len(bf) >= 0.4


def test_ivf_assign_pandas_matches_literal(spark):
    # the two assignment executors (literal expression tree vs Arrow matmul)
    # must pick identical (list_id, probe_rank) per vector
    import numpy as np

    rng = np.random.RandomState(19)
    corpus = [(i, [float(x) for x in rng.randn(12)]) for i in range(200)]
    df = _vecs(spark, corpus)
    cents = sim.train_centroids_sample(df, n_lists=16).persist()

    def rows_of(literal_max):
        out = sim.ivf_assign(df, cents, nprobe=3, literal_max=literal_max)
        return sorted(
            (r["vec_id"], r["list_id"], r["probe_rank"]) for r in out.collect()
        )

    assert rows_of(10**9) == rows_of(0)  # literal path vs pandas path
    cents.unpersist()


def test_ivf_assign_beyond_literal_cap(spark):
    # n_lists >= 2048 (> the 1024 literal_max) auto-dispatches to the matmul
    # path; verify nearest-centroid assignment against a driver-side numpy
    # oracle with the same (cos desc, list_id asc) tie-break
    import numpy as np

    rng = np.random.RandomState(23)
    corpus = [(i, [float(x) for x in rng.randn(8)]) for i in range(3000)]
    df = _vecs(spark, corpus)
    cents = sim.train_centroids_sample(df, n_lists=2048).persist()
    crows = sorted(cents.collect(), key=lambda r: r["list_id"])
    assert len(crows) == 2048

    got = {
        r["vec_id"]: r["list_id"]
        for r in sim.ivf_assign(df, cents, nprobe=1).collect()
    }
    C = np.array([[float(x) for x in r["centroid"]] for r in crows])
    Cn = np.sqrt((C * C).sum(axis=1))
    V = np.array([v for _, v in corpus], dtype=np.float64)
    Vn = np.sqrt((V * V).sum(axis=1))
    cos = (V @ C.T) / (Vn[:, None] * Cn[None, :])
    expected = np.argsort(-cos, axis=1, kind="stable")[:, 0]
    assert len(got) == len(corpus)
    mismatches = [
        i for i, (_, _) in enumerate(corpus)
        if got[i] != int(crows[expected[i]]["list_id"])
    ]
    assert not mismatches
    cents.unpersist()
