"""Unit pins for the KG analytics tranche: common-neighbor link prediction,
deterministic synchronous label propagation, triple temporal extent, anchor
commonness / disambiguation, quality-aware keeper election.  Each also has a
DuckDB oracle gate in __spark_entry__ (kg_link_prediction, kg_lpa_communities,
kg_triple_extent, anchor_commonness_prior, mention_disambiguation,
dedup_quality_keepers); these tests pin the hand-checkable semantics."""

from collections import Counter

from pyspark.sql import functions as F

from aiwhispr_spark.operators.graph_query import (
    label_propagation_communities,
    link_prediction_scores,
)
from aiwhispr_spark.operators.linkgraph import (
    anchor_commonness,
    disambiguate_by_prior,
)
from aiwhispr_spark.operators.temporal import triple_temporal_extent


def test_link_prediction_square(spark):
    # 4-cycle a-b-c-d-a: the two diagonals are the only non-adjacent pairs;
    # each shares BOTH off-diagonal nodes (deg 2 each) → n_common=2,
    # ra = 2·(10^6 // 2) = 10^6
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    rows = {
        (r["a"], r["b"]): (r["n_common"], r["ra_score_i"])
        for r in link_prediction_scores(edges).collect()
    }
    assert rows == {("a", "c"): (2, 1_000_000), ("b", "d"): (2, 1_000_000)}


def test_link_prediction_excludes_existing_and_needs_common(spark):
    # path a-b-c plus isolated edge x-y: only (a, c) qualifies (via b, deg 2);
    # (a, x) etc. share no neighbor; (a, b) is an edge
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    out = link_prediction_scores(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["n_common"], r["ra_score_i"]) == ("a", "c", 1, 500_000)
    # AA is the float twin: 1/ln(2)
    import math

    assert abs(r["aa_score"] - 1.0 / math.log(2)) < 1e-12


def _brute_lpa(edges, rounds):
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        nxt = {}
        for v in nbrs:
            cnt = Counter(labels[u] for u in nbrs[v])
            best = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == best)
        labels = nxt
    return labels


def test_lpa_matches_brute_force(spark):
    # two triangles bridged by one edge — the classic two-community shape
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("p", "q"), ("q", "r"), ("p", "r"),
        ("c", "p"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    for rounds in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation_communities(df, rounds=rounds).collect()
        }
        assert got == _brute_lpa(edges, rounds), f"rounds={rounds}"


def test_lpa_is_direction_and_dup_insensitive(spark):
    fwd = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    rev = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("b", "a")], "src string, dst string"
    )
    g1 = sorted(map(tuple, label_propagation_communities(fwd, rounds=2).collect()))
    g2 = sorted(map(tuple, label_propagation_communities(rev, rounds=2).collect()))
    assert g1 == g2


def test_triple_temporal_extent(spark):
    obs = spark.createDataFrame(
        [
            ("u1", 100, "E1", "owns", "E2"),
            ("u2", 300, "E1", "owns", "E2"),
            ("u2", 300, "E1", "owns", "E2"),  # same page restates the fact
            ("u3", 50, "E9", "based_in", "Berlin"),
        ],
        "url string, ts long, subj string, pred string, obj string",
    )
    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["first_seen"],
            r["last_seen"],
            r["n_observations"],
            r["n_sources"],
            r["extent"],
        )
        for r in triple_temporal_extent(obs).collect()
    }
    assert got == {
        ("E1", "owns", "E2"): (100, 300, 3, 2, 200),
        ("E9", "based_in", "Berlin"): (50, 50, 1, 1, 0),
    }


def test_anchor_commonness_and_disambiguation(spark):
    aliases = spark.createDataFrame(
        [
            ("acme", "https://a.org", 3),
            ("acme", "https://b.org", 1),
            ("tied", "https://z.org", 2),
            ("tied", "https://y.org", 2),
        ],
        "anchor string, dst_url string, n_mentions long",
    )
    common = anchor_commonness(aliases)
    pri = {(r["anchor"], r["dst_url"]): r["prior_i"] for r in common.collect()}
    assert pri[("acme", "https://a.org")] == 750_000
    assert pri[("acme", "https://b.org")] == 250_000
    assert pri[("tied", "https://y.org")] == 500_000
    top = {r["anchor"]: r["dst_url"] for r in disambiguate_by_prior(common).collect()}
    # argmax by count; ties break to the lexicographically smaller url
    assert top == {"acme": "https://a.org", "tied": "https://y.org"}


def test_elect_keepers_by_quality(spark):
    from aiwhispr_spark.operators.dedup import elect_keepers_by_quality

    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 7)], "id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    scores = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], "id long, score_i long"
    )
    got = {r["id"]: r["keep_id"] for r in elect_keepers_by_quality(ids, pairs, scores).collect()}
    # group {1,2,3}: best score 99 tied between 2 and 3 → min id 2 wins;
    # singleton 7 keeps itself
    assert got == {1: 2, 2: 2, 3: 2, 7: 7}


def test_elect_keepers_null_scores_lose(spark):
    from aiwhispr_spark.operators.dedup import elect_keepers_by_quality

    ids = spark.createDataFrame([(1,), (2,)], "id long")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    scores = spark.createDataFrame([(2, 1)], "id long, score_i long")
    got = {r["id"]: r["keep_id"] for r in elect_keepers_by_quality(ids, pairs, scores).collect()}
    assert got == {1: 2, 2: 2}


def _brute_bpe(word_counts, n_merges):
    """Textbook Sennrich BPE: argmax pair (count desc, pair-key asc), greedy
    left-to-right merge."""
    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best = max(counts.values())
        x, y = min(p for p, c in counts.items() if c == best)
        merges.append((step, x, y, x + y, best))
        nxt = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        state = nxt
    return merges


def test_bpe_train_matches_textbook(spark):
    from aiwhispr_spark.operators.textstats import bpe_train

    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "aaa aaa banana",  # overlap cases: (a,a) on 'aaa', repeats in 'banana'
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words = Counter(w for t in texts for w in t.lower().split())
    expected = _brute_bpe(words, 6)
    got = [
        (r["step"], r["x"], r["y"], r["merged"], r["n"])
        for r in bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == expected
    # the canonical example's first merges involve the 'es'/'est' family
    assert got[0][4] >= 9


def test_bpe_greedy_overlap(spark):
    from aiwhispr_spark.operators.textstats import bpe_train

    # 'aaaa': greedy L2R (a,a) merge gives [aa, aa]; second round merges
    # (aa, aa) — pins that a just-created symbol never re-matches as the
    # LEFT of the same pair within one pass
    docs = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [
        (r["step"], r["x"], r["y"], r["merged"], r["n"])
        for r in bpe_train(docs, n_merges=2).orderBy("step").collect()
    ]
    assert got == [(1, "a", "a", "aa", 9), (2, "aa", "aa", "aaaa", 3)]


def test_resolve_functional_facts(spark):
    from aiwhispr_spark.operators.temporal import resolve_functional_facts

    obs = spark.createDataFrame(
        [
            ("E1", "ceo", "Alice", 100),
            ("E1", "ceo", "Bob", 300),    # latest wins
            ("E1", "ceo", "Alice", 200),
            ("E2", "ceo", "Zed", 50),     # uncontested
            ("E3", "ceo", "B", 10),       # ts tie → obj asc
            ("E3", "ceo", "A", 10),
        ],
        "subj string, pred string, obj string, ts long",
    )
    got = {
        r["subj"]: (
            r["resolved_obj"], r["n_distinct_obj"], r["n_observations"], r["conflicted_i"]
        )
        for r in resolve_functional_facts(obs).collect()
    }
    assert got == {
        "E1": ("Bob", 2, 3, 1),
        "E2": ("Zed", 1, 1, 0),
        "E3": ("A", 2, 2, 1),
    }


def test_source_reliability(spark):
    from aiwhispr_spark.operators.temporal import source_reliability

    obs = spark.createDataFrame(
        [
            # fact (E1, ceo): majority says Alice (2 vs 1)
            ("good.org", "E1", "ceo", "Alice"),
            ("good.org", "E2", "ceo", "Zed"),
            ("ok.org", "E1", "ceo", "Alice"),
            ("bad.org", "E1", "ceo", "Eve"),
            ("bad.org", "E2", "ceo", "Zed"),
        ],
        "host string, subj string, pred string, obj string",
    )
    got = {
        r["host"]: (r["n_assertions"], r["n_majority"], r["reliability_i"])
        for r in source_reliability(obs).collect()
    }
    assert got == {
        "good.org": (2, 2, 1_000_000),
        "ok.org": (1, 1, 1_000_000),
        "bad.org": (2, 1, 500_000),
    }


def test_skipgram_pairs_window(spark):
    from aiwhispr_spark.operators.graph import skipgram_pairs

    # one walk a→b→c→d: window 2 pairs per center, both directions
    walks = spark.createDataFrame(
        [("a", 0, "a"), ("a", 1, "b"), ("a", 2, "c"), ("a", 3, "d")],
        "start string, step long, node string",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    expected_pairs = {
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("b", "d"),
        ("c", "a"), ("c", "b"), ("c", "d"), ("d", "b"), ("d", "c"),
    }
    assert set(got) == expected_pairs
    assert all(v == 1 for v in got.values())
    # revisited nodes accumulate counts: a→b→a walk
    walks2 = spark.createDataFrame(
        [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "a")],
        "start string, step long, node string",
    )
    got2 = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks2, window=2).collect()
    }
    assert got2[("a", "b")] == 2 and got2[("a", "a")] == 2


def test_bigram_lm_handles_empty_and_short_docs(spark):
    from aiwhispr_spark.operators.textstats import bigram_logprob_scores

    docs = spark.createDataFrame(
        [("a", "alpha beta alpha beta"), ("b", ""), ("c", "   "), ("d", "solo")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp_i"])
        for r in bigram_logprob_scores(docs).collect()
    }
    # zero-token and one-token docs score (0, 0) instead of crashing the job
    assert got["b"] == (0, 0) and got["c"] == (0, 0) and got["d"] == (0, 0)
    assert got["a"][0] == 3 and got["a"][1] < 0


def test_bpe_train_scrubs_control_chars(spark):
    from aiwhispr_spark.operators.textstats import bpe_train

    # \x1f is NOT Java-regex whitespace: unscrubbed it would survive as a
    # token char and corrupt the pair-key encoding (driver unpack crash)
    docs = spark.createDataFrame(
        [("ab\x1fab ab\x1eab abab abab",)], "text string"
    )
    got = [
        (r["x"], r["y"], r["merged"]) for r in bpe_train(docs, n_merges=1).collect()
    ]
    assert got == [("a", "b", "ab")]


def test_passage_windows_rejects_gapped_stride(spark):
    import pytest

    from aiwhispr_spark.operators.packing import passage_windows

    docs = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError, match="stride"):
        passage_windows(docs, window=4, stride=5)


def test_bpe_encode_applies_merges_in_order(spark):
    """Encode under a hand-built merge table: 'ab' then 'ab'+'c' — 'abc'
    collapses fully, 'cab' keeps its leading 'c' (greedy L2R, overlap-safe),
    and counts weight by occurrence."""
    from aiwhispr_spark.operators.textstats import bpe_encode

    docs = spark.createDataFrame(
        [(1, "abc cab abc"), (2, "ab")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.token): r.n
        for r in bpe_encode(docs, [("a", "b"), ("ab", "c")]).collect()
    }
    assert got == {
        (1, "abc"): 2,
        (1, "c"): 1,
        (1, "ab"): 1,
        (2, "ab"): 1,
    }


def test_bpe_encode_empty_merge_table_is_char_split(spark):
    from aiwhispr_spark.operators.textstats import bpe_encode

    docs = spark.createDataFrame([(1, "aa b")], "doc_id long, text string")
    got = {(r.doc_id, r.token): r.n for r in bpe_encode(docs, []).collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1}


def test_bpe_encode_roundtrips_train(spark):
    """Encoding the training corpus under its own trained merges must
    reproduce bpe_train's final symbol statistics (join-back identity)."""
    from aiwhispr_spark.operators.textstats import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (i + 1)) for i in range(3)],
        "doc_id long, text string",
    )
    merges = [
        (r["x"], r["y"]) for r in bpe_train(docs, n_merges=4).orderBy("step").collect()
    ]
    enc = bpe_encode(docs, merges)
    # every trained merged symbol that survives in some word appears as a
    # token; total token mass equals the corpus-wide char count of words
    # minus one char per applied merge occurrence — spot-check via doc 0
    toks = {r.token: r.n for r in enc.filter("doc_id = 0").collect()}
    assert sum(len(t) * n for t, n in toks.items()) == len(
        "thecatsatonthemat"
    )


def test_degree_assortativity_star_is_minus_one(spark):
    from aiwhispr_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "src string, dst string"
    )
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_points, r.sx, r.sxy, r.sxx) == (6, 12, 18, 30)
    assert r.r_i == -1_000_000  # a star is perfectly disassortative


def test_degree_assortativity_zero_variance_sentinel(spark):
    from aiwhispr_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert degree_assortativity(edges).collect()[0].r_i == -2_000_000


def test_harmonic_centrality_chain(spark):
    from aiwhispr_spark.operators.graph import harmonic_centrality

    # directed chain a->b->c->d: into d: b@2... wait a@3, b@2, c@1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r.node: (r.harmonic_i, r.n_reach) for r in
           harmonic_centrality(edges, max_hops=6).collect()}
    assert got["d"] == (1_000_000 + 500_000 + 333_333, 3)
    assert got["b"] == (1_000_000, 1)
    assert "a" not in got  # nothing reaches a


def test_harmonic_centrality_hop_bound(spark):
    from aiwhispr_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r.node: r.n_reach for r in harmonic_centrality(edges, max_hops=2).collect()}
    assert got["d"] == 2  # a@3 is beyond the 2-hop bound


def _brute_words(texts):
    # mirror _bpe_word_array exactly: scrub C0 controls to spaces, lower,
    # split on ASCII whitespace (Java \\s+ after the scrub)
    import re as _re

    words = Counter()
    for t in texts:
        for w in _re.split(r"\s+", _re.sub(r"[\x00-\x1f]", " ", t).lower(), flags=_re.ASCII):
            if w:
                words[w] += 1
    return words


def test_bpe_batched_equals_sequential(spark):
    # VERDICT r3 #7: batched merge rounds must emit EXACTLY the sequential
    # merge table.  bpe_train now DELEGATES to batch_m=1, so the independent
    # reference here is _brute_bpe (the textbook python trainer), not
    # bpe_train — comparing against bpe_train would be a tautology.
    from aiwhispr_spark.operators.textstats import bpe_train_batched

    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
        "aaa aaa banana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    expected = _brute_bpe(_brute_words(texts), 8)
    for m in (1, 4, 8):
        got = [
            tuple(r)
            for r in bpe_train_batched(docs, n_merges=8, batch_m=m)
            .orderBy("step")
            .collect()
        ]
        assert got == expected, f"batch_m={m} diverged from textbook sequential"


def test_bpe_batched_equals_sequential_gate_corpus(spark):
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.textstats import bpe_train_batched

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 120)
        .select("text")
    )
    texts = [r["text"] for r in docs.collect()]
    expected = _brute_bpe(_brute_words(texts), 12)
    for m in (1, 8):
        got = [
            tuple(r)
            for r in bpe_train_batched(docs, n_merges=12, batch_m=m)
            .orderBy("step")
            .collect()
        ]
        assert got == expected, f"batch_m={m} diverged from textbook sequential"


def test_bpe_train_survives_many_rounds(spark):
    # regression for the round-4 find: persist+count left the nested
    # aggregate-fold expression chain growing one level per merge round and
    # the driver OOMed during analysis at ~40 rounds (invisible at the
    # gate's n_merges=5).  localCheckpoint per round truncates it.
    from aiwhispr_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame(
        [(f"w{i} w{i} token{i % 7} stem{i % 11} common common word",)
         for i in range(60)],
        "text string",
    )
    table = bpe_train(docs, n_merges=40).collect()
    assert len(table) == 40
