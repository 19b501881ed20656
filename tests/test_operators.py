"""Unit tests for the operator library (dedup, similarity, qa, textstats,
skew, multimodal, streaming) on small in-memory frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.embedding import cosine, hash_embed


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines and shuffles"),
        (5, "der schnelle braune fuchs springt über den faulen hund und die daten"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    from aiwhispr_spark.operators.dedup import exact_duplicates

    res = {r["id"]: (r["keep_id"], r["group_size"]) for r in exact_duplicates(docs).collect()}
    assert res[1] == (1, 2) and res[2] == (1, 2)
    assert res[3] == (3, 1)


def test_minhash_lsh_finds_near_dup(spark, docs):
    from aiwhispr_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            docs, shingle_n=2, bands=16, rows_per_band=1, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs  # identical
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup
    assert not any(4 in p for p in pairs)


def test_minhash_md5_matches_python_oracle(spark, docs):
    """The oracle-checkable md5 banding path: every emitted pair's jaccard must
    equal the pure-Python shingle-set jaccard, and the identical/near-dup pairs
    must surface (dense banding: 16 bands × 1 row ⇒ recall ≈ 1 at j ≥ 0.5)."""
    from aiwhispr_spark.operators.dedup import minhash_lsh_pairs_md5

    def shingles(text, n=2):
        toks = text.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_lsh_pairs_md5(
            docs, shingle_n=2, bands=16, rows_per_band=1, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got
    assert not any(4 in p for p in got)
    for (a, b), j in got.items():
        sa, sb = shingles(texts[a]), shingles(texts[b])
        assert j == pytest.approx(len(sa & sb) / len(sa | sb))


def test_simhash_near_dup(spark, docs):
    from aiwhispr_spark.operators.dedup import simhash_pairs

    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert all(h <= 10 for h in pairs.values())


def test_ngram_jaccard_pairs(spark, docs):
    from aiwhispr_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) in pairs


def test_embedding_near_dup_pairs(spark):
    from aiwhispr_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (1, hash_embed("alpha beta gamma")),
        (2, hash_embed("alpha beta gamma")),
        (3, hash_embed("totally unrelated text here")),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, threshold=0.99, n_planes=4).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_cosine_topk_matches_numpy(spark):
    from aiwhispr_spark.operators.topk import cosine_topk

    texts = [f"token{i} alpha beta common words {i}" for i in range(50)]
    rows = [(i, hash_embed(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = hash_embed("alpha beta common words")
    got = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    want = sorted(range(50), key=lambda i: (-cosine(rows[i][1], q), i))[:5]
    assert got == want


def test_ivf_topk_recall(spark):
    from aiwhispr_spark.operators.similarity import ivf_topk, train_centroids
    from aiwhispr_spark.operators.topk import cosine_topk

    rows = [(i, hash_embed(f"doc {i} group {i % 5} filler words")) for i in range(100)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = hash_embed("doc group 3 filler words")
    cents = train_centroids(df, n_centroids=4)
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(df, q, cents, k=10, n_probe=2).collect()}
    # recall need not be 1.0 (it's an ANN), but must be substantial
    assert len(exact & approx) >= 5


def test_knn_join(spark):
    from aiwhispr_spark.operators.similarity import knn_join

    rows = [(i, hash_embed(f"item {i} shared vocabulary")) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "embedding"])
    res = knn_join(df, df, k=3)
    by_left = {}
    for r in res.collect():
        by_left.setdefault(r["lid"], []).append(r)
    assert all(len(v) == 3 for v in by_left.values())
    # nearest neighbor of any item is itself (score 1.0)
    for lid, nbrs in by_left.items():
        best = max(nbrs, key=lambda r: r["score"])
        assert best["rid"] == lid and best["score"] == pytest.approx(1.0)


def test_fulltext_search_modes(spark):
    from aiwhispr_spark.operators.fulltext import build_inverted_index, search_terms

    docs = spark.createDataFrame(
        [
            (1, "spark query engine query planner"),   # query×2
            (2, "fast data and fast query paths"),     # fast×2 query×1 data×1
            (3, "nothing relevant here"),
            (4, "data data data"),                     # data×3
        ],
        ["doc_id", "text"],
    )
    idx = build_inverted_index(docs)
    any_hits = {r["id"]: (r["score"], r["n_terms"]) for r in search_terms(idx, ["data", "query", "fast"]).collect()}
    assert any_hits == {1: (2, 1), 2: (4, 3), 4: (3, 1)}
    all_hits = [r["id"] for r in search_terms(idx, ["data", "query", "fast"], mode="all").collect()]
    assert all_hits == [2]


def test_fulltext_plan_broadcasts_terms(spark):
    from aiwhispr_spark.operators.fulltext import build_inverted_index, search_terms

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    df = search_terms(build_inverted_index(docs), ["a", "b"], k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan  # query terms broadcast, postings never reshuffled
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_assemble_qa_semantics(spark):
    from aiwhispr_spark.operators.qa import assemble_qa

    questions = spark.createDataFrame(
        [(1, "How?"), (2, "Why?"), (3, "Unanswered?")], ["post_id", "body"]
    )
    answers = spark.createDataFrame(
        [(10, 1, "B"), (11, 1, "A"), (12, 2, "C"), (13, 99, "orphan")],
        ["post_id", "parent_id", "body"],
    )
    res = {
        r["post_id"]: r["post_body_for_llm"]
        for r in assemble_qa(questions, answers).collect()
    }
    assert res[1] == "[QUESTION]How?[ANSWER]B[ANSWER]A"  # ordered by answer post_id
    assert res[2] == "[QUESTION]Why?[ANSWER]C"
    assert res[3] == "[QUESTION]Unanswered?"  # left semantics
    assert len(res) == 3  # orphan answer dropped


def test_cc_driver_and_distributed_paths_agree(spark):
    """connected_components: the driver union-find fast path and the
    distributed label-propagation path must produce identical components on
    a random graph (chains + stars + singleton-free shuffle)."""
    import random

    from aiwhispr_spark.operators.canonicalize import connected_components

    rng = random.Random(7)
    edges = [(i, i - (i % 7)) for i in range(200)]  # 7-node stars
    edges += [(rng.randint(0, 199), rng.randint(0, 199)) for _ in range(60)]
    df = spark.createDataFrame(edges, ["a", "b"])
    fast = {r["alias"]: r["component"] for r in connected_components(df).collect()}
    dist = {
        r["alias"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist and fast


def test_salted_repartition_balances_zipf_head(spark):
    """The point of salting: a 90%-hot key must spread across partitions.
    Plain hash repartition puts ~9000 rows in one partition; salted spreads
    the hot key over salt_factor partitions (bound: 3× the even share)."""
    from aiwhispr_spark.operators.skew import salted_repartition

    df = spark.range(10000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'HOT' ELSE concat('k', id) END AS subj", "id"
    )
    P = 16

    def partition_sizes(frame):
        return [
            r["n"]
            for r in frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]

    plain_max = max(partition_sizes(df.repartition(P, F.col("subj"))))
    salted_max = max(partition_sizes(salted_repartition(df, "subj", P, salt_factor=16)))
    assert plain_max >= 9000  # the hot key owns one partition
    assert salted_max <= 3 * 10000 // P, (plain_max, salted_max)


def test_salted_count_matches_plain(spark, docs):
    from aiwhispr_spark.operators.skew import salted_count

    plain = {r["text"]: r["cnt"] for r in docs.groupBy("text").count().withColumnRenamed("count", "cnt").collect()}
    salted = {r["text"]: r["cnt"] for r in salted_count(docs, "text").collect()}
    assert plain == salted


def test_lang_id_expr(spark):
    from aiwhispr_spark.operators.textstats import lang_id_expr

    rows = [
        (1, "the cat and the dog sat in that house"),
        (2, "der hund und die katze ist nicht da"),
        (3, "le chien et la maison est dans les arbres"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r["lang"] for r in df.select("id", lang_id_expr(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "en"}


def test_multimodal_features_and_frames(spark):
    from aiwhispr_spark.operators.multimodal import extract_features, sample_frames

    rows = [("m1", "image", bytearray(b"\x00\x01" * 600)), ("m2", "audio", bytearray(b""))]
    df = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
    feats = {r["media_id"]: r for r in extract_features(df).collect()}
    assert len(feats["m1"]["feature"]) == 16
    assert feats["m1"]["n_bytes"] == 1200
    assert feats["m2"]["feature"] == [0.0] * 16
    frames = sample_frames(df, every_n_bytes=512, max_frames=4).collect()
    m1_frames = [f for f in frames if f["media_id"] == "m1"]
    assert len(m1_frames) == 2  # 1200 bytes / 512 → 2 frames


def test_streaming_ingest(spark, tmp_path):
    import json

    from aiwhispr_spark.streaming.ingest import start_ingest_stream

    src = tmp_path / "src"
    src.mkdir()
    msgs = [
        {"content_site_name": "s", "src_path": "/p", "content_path": f"c{i}",
         "text_chunk": "The data is here. Good text.", "chunk_no": None,
         "last_edit_date": None, "tags": "t", "title": "T"}
        for i in range(5)
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(m) for m in msgs))
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = start_ingest_stream(spark, str(src), sink, chk)
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 5
    row = out.first()
    assert row["chunk_no"] == 1  # default applied
    assert row["last_edit_date"] is not None
    assert len(row["embedding"]) == 64
    # exactly-once on restart: same files, nothing new
    q2 = start_ingest_stream(spark, str(src), sink, chk)
    q2.awaitTermination(60)
    assert spark.read.parquet(sink).count() == 5
    # incremental pickup: a new burst after restart processes ONLY the delta
    more = [
        {"content_site_name": "s", "src_path": "/p", "content_path": f"c{i}",
         "text_chunk": "More data arrived. Still good.", "chunk_no": None,
         "last_edit_date": None, "tags": "t", "title": "T"}
        for i in range(5, 8)
    ]
    (src / "batch2.json").write_text("\n".join(json.dumps(m) for m in more))
    q3 = start_ingest_stream(spark, str(src), sink, chk)
    q3.awaitTermination(60)
    out2 = spark.read.parquet(sink)
    assert out2.count() == 8
    assert out2.select("content_path").distinct().count() == 8


def test_global_row_number_matches_single_window(spark):
    """Range-partitioned rank (operators/ranking.py) must equal the
    single-partition-window rank under the same total order — including
    ties on the leading keys and empty/singleton partitions."""
    from pyspark.sql.window import Window

    from aiwhispr_spark.operators.ranking import global_row_number

    # >100 rows per input partition: RangePartitioner's reservoir sample
    # actually subsamples, so boundary re-sampling across the counts job and
    # the rank job WOULD diverge without the operator's persist (the
    # duplicate-rank bug the r3 self-review reproduced at exactly this size)
    rows = [(i, i % 3, (i * 7) % 5) for i in range(5000)]
    df = spark.createDataFrame(rows, ["id", "grp", "val"]).coalesce(4)
    order = [F.col("grp"), F.col("val").desc(), F.col("id")]
    want = {
        r["id"]: r["rank"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).cast("int").alias("rank")
        ).collect()
    }
    for _ in range(3):
        got = {
            r["id"]: r["rank"]
            for r in global_row_number(df, order, num_partitions=8).collect()
        }
        assert got == want
        assert sorted(got.values()) == list(range(1, 5001))  # no dup/skip
    df.sparkSession.catalog.clearCache()
    # more partitions than rows: offsets over empty partitions still correct
    tiny = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    got3 = {
        r["id"]: r["rank"]
        for r in global_row_number(tiny, [F.col("id")], num_partitions=8).collect()
    }
    assert got3 == {1: 1, 2: 2, 3: 3}


def test_percentile_approx_tolerance(spark):
    """VERDICT r2 #3 gate for the percentile scale path: at production
    accuracy (1000) the GK sketch's p50/p90 must land within the guaranteed
    rank error (n/accuracy ranks) of the exact discrete quantile; at max
    accuracy it must be EXACT (that exactness is what lets
    chars_percentiles_approx hash-match DuckDB's quantile_disc)."""
    import numpy as np

    # a permutation (37 coprime to 5000): distinct values, so value→rank via
    # searchsorted is unambiguous
    vals = [float((i * 37) % 5000) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    s = sorted(vals)
    n = len(s)

    def ranks_of(accuracy):
        row = df.agg(
            F.percentile_approx(F.col("x"), F.lit([0.5, 0.9]), F.lit(accuracy)).alias("p")
        ).first()
        return [np.searchsorted(s, v) for v in row["p"]]

    exact_ranks = [int(np.ceil(q * n)) - 1 for q in (0.5, 0.9)]
    # max accuracy ⇒ exact discrete quantile
    assert ranks_of(2147483647) == exact_ranks
    # production accuracy ⇒ within the documented rank-error bound
    tol = n / 1000 + 1
    for got, want in zip(ranks_of(1000), exact_ranks):
        assert abs(got - want) <= tol


def test_parse_websearch_grammar():
    from aiwhispr_spark.operators.fulltext import parse_websearch

    assert parse_websearch('"table value" scan OR merge -vector') == [
        {"any": ["table value"], "negated": False},
        {"any": ["scan", "merge"], "negated": False},
        {"any": ["vector"], "negated": True},
    ]
    # OR chains fold into one group; negation never joins a disjunction
    assert parse_websearch("a OR b OR c -d OR e") == [
        {"any": ["a", "b", "c"], "negated": False},
        {"any": ["d"], "negated": True},
        {"any": ["e"], "negated": False},
    ]
    # quoted phrases normalize inner whitespace + case; empty items drop
    assert parse_websearch('-"Foo   BAR" "" x') == [
        {"any": ["foo bar"], "negated": True},
        {"any": ["x"], "negated": False},
    ]
    assert parse_websearch("") == []
    assert parse_websearch("OR OR") == []


def test_websearch_match_against_python_reference(spark):
    """Compiled predicate ≡ a direct python evaluator of the same grammar,
    over texts hitting every branch (phrase, OR, negation, empty query)."""
    import re as _re

    from aiwhispr_spark.operators.fulltext import parse_websearch, websearch_match

    texts = [
        (1, "table value scan here"),
        (2, "table value merge there"),
        (3, "table value vector merge"),  # knocked out by -vector
        (4, "scan merge alone"),          # no phrase
        (5, "value table scan"),          # phrase order matters
        (6, "TABLE   Value   MERGE"),     # case + whitespace normalize
        (7, ""),
    ]
    df = spark.createDataFrame(texts, ["id", "text"])

    def py_eval(text, query):
        padded = " " + _re.sub(r"\s+", " ", text.strip().lower()) + " "
        ok = True
        for g in parse_websearch(query):
            hit = any(f" {item} " in padded for item in g["any"])
            ok = ok and (not hit if g["negated"] else hit)
        return ok

    for query in [
        '"table value" scan OR merge -vector',
        "scan OR vector",
        '-"table value"',
        "",
    ]:
        got = {r["id"] for r in df.filter(websearch_match(F.col("text"), query)).collect()}
        want = {i for i, t in texts if py_eval(t, query)}
        assert got == want, (query, got, want)


def test_search_fields_weighted_ranks_title_over_body(spark):
    from aiwhispr_spark.operators.fulltext import search_fields_weighted

    rows = [
        (1, "spark spark spark", "other words"),   # 3 body hits = 3.0
        (2, "nothing here", "spark title"),        # 1 title hit = 4.0
        (3, "spark once", "spark title"),          # 1 + 4 = 5.0
        (4, "none", "none"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "title"])
    got = [
        (r["id"], r["score_i"], r["n_fields"])
        for r in search_fields_weighted(
            df, ["spark"], {"text": 1.0, "title": 4.0}, k=10
        ).collect()
    ]
    # weighted: doc3 (1·1 + 1·4 = 5) > doc2 (4) > doc1 (3); doc4 absent
    assert got == [(3, 50000, 2), (2, 40000, 1), (1, 30000, 1)]


def test_search_phrase_positional(spark):
    from aiwhispr_spark.operators.fulltext import build_positional_index, search_phrase

    rows = [
        (1, "the hash value is a hash value thing"),  # 2 occurrences
        (2, "hash then value apart"),                 # words present, not adjacent
        (3, "value hash reversed"),                   # wrong order
        (4, "prefix hash value"),                     # 1 occurrence at the end
        (5, "data data data"),                        # repeated-word doc
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = build_positional_index(df)

    got = {r["id"]: r["n_occurrences"] for r in search_phrase(idx, "hash value").collect()}
    assert got == {1: 2, 4: 1}

    # repeated word in the phrase: "data data" occurs at starts 0 and 1
    got2 = {r["id"]: r["n_occurrences"] for r in search_phrase(idx, "data data").collect()}
    assert got2 == {5: 2}

    # single-word phrase degenerates to tf
    got3 = {r["id"]: r["n_occurrences"] for r in search_phrase(idx, "hash").collect()}
    assert got3 == {1: 2, 2: 1, 3: 1, 4: 1}

    with pytest.raises(ValueError):
        search_phrase(idx, "   ")


def test_pagerank_matches_reference_recurrence(spark):
    from aiwhispr_spark.operators.graph import pagerank

    # a→b, a→c, b→c, d dangling (in-edge only)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {r["node"]: r["pr"] for r in pagerank(edges, iterations=4).collect()}

    # reference: same synchronous recurrence in plain python
    nodes = ["a", "b", "c", "d"]
    out = {"a": ["b", "c"], "b": ["c"], "c": ["d"], "d": []}
    n, d = len(nodes), 0.85
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(4):
        dm = sum(pr[v] for v in nodes if not out[v])
        contrib = {v: 0.0 for v in nodes}
        for u in nodes:
            for v in out[u]:
                contrib[v] += pr[u] / len(out[u])
        pr = {v: (1 - d) / n + d * (contrib[v] + dm / n) for v in nodes}
    for v in nodes:
        assert got[v] == pytest.approx(pr[v], rel=1e-12)
    # mass conservation (dangling redistribution keeps Σpr = 1)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_ngram_decontaminate_flags_planted_overlap(spark):
    from aiwhispr_spark.operators.decontam import ngram_decontaminate

    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 tail"
    rows = [
        (1, bench_text),                                  # the benchmark doc itself
        (2, "prefix " + " ".join(f"w{i}" for i in range(1, 14)) + " suffix"),  # shares the 13-gram
        (3, "w1 w2 w3 totally different after three"),    # <13 shared tokens
        (4, "short doc"),                                 # <13 tokens → 0 windows
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") == 1)
    rep = {r["id"]: (r["n_grams"], r["n_hit"], r["contaminated"])
           for r in ngram_decontaminate(docs, bench, n=13).collect()}
    assert rep[1] == (2, 2, True)      # 14 tokens → 2 windows, both its own
    assert rep[2][1] >= 1 and rep[2][2] is True
    assert rep[3] == (rep[3][0], 0, False)
    assert rep[4] == (0, 0, False)


def test_bm25_idf_outranks_raw_tf(spark):
    from aiwhispr_spark.operators.fulltext import build_inverted_index, search_terms_bm25

    # 'rare' appears in one doc, 'common' in all: BM25 must rank the rare-term
    # doc first even though tf-sum would tie or prefer doc 1
    rows = [
        (1, "common common common common"),
        (2, "common rare"),
        (3, "common filler words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = build_inverted_index(docs)
    dl = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("double").alias("dl"),
    )
    top = [(r["id"], r["score_i"]) for r in search_terms_bm25(idx, dl, ["common", "rare"]).collect()]
    assert top[0][0] == 2  # the rare-term doc wins
    assert all(s > 0 for _, s in top)


def test_incremental_exact_dedup_equals_full_run(spark):
    from aiwhispr_spark.operators.dedup import exact_duplicates, incremental_exact_dedup

    rows = [
        (1, "alpha"), (2, "beta"), (3, "alpha"),       # batch 1: 3 dups 1
        (4, "gamma"), (5, "beta"), (6, "alpha"), (7, "delta"),  # batch 2 dups into 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    full_keepers = {
        r["id"] for r in exact_duplicates(docs).collect() if r["id"] == r["keep_id"]
    }

    b1 = docs.filter(F.col("doc_id") <= 3)
    b2 = docs.filter(F.col("doc_id") > 3)
    k1, store = incremental_exact_dedup(b1, None)
    k2, store2 = incremental_exact_dedup(b2, store)
    inc_keepers = {r["doc_id"] for r in k1.unionByName(k2).select("doc_id").collect()}
    assert inc_keepers == full_keepers == {1, 2, 4, 7}
    # store accumulates one row per distinct digest
    assert store2.count() == 4
    # a third batch of pure duplicates adds nothing
    b3 = spark.createDataFrame([(8, "alpha"), (9, "delta")], ["doc_id", "text"])
    k3, store3 = incremental_exact_dedup(b3, store2)
    assert k3.count() == 0 and store3.count() == 4


def test_int8_quantization_recall(spark):
    """Quantized cosine top-k must stay close to exact top-k (int8 symmetric
    keeps ~2-3 decimal digits per component); all-zero vectors must not
    divide by zero."""
    from aiwhispr_spark.operators.similarity import quantize_embeddings_int8
    from aiwhispr_spark.operators.topk import cosine_topk

    rows = [(i, hash_embed(f"doc {i} shared words {i % 7}")) for i in range(80)]
    rows.append((99, [0.0] * len(rows[0][1])))  # all-zero guard
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qd = quantize_embeddings_int8(df)
    z = qd.filter(F.col("vec_id") == 99).first()
    assert z["scale"] == 0.0 and set(z["qvec"]) == {0}

    # dequantize and compare top-10 vs exact
    deq = qd.select(
        "vec_id",
        F.transform("qvec", lambda q: q.cast("double") * F.col("scale")).alias("embedding"),
    )
    qv = hash_embed("doc shared words 3")
    exact = [r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()]
    approx = [r["vec_id"] for r in cosine_topk(deq, qv, k=10).collect()]
    assert len(set(exact) & set(approx)) >= 8
