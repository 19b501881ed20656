"""Scale-shape gates for the MinHash/SimHash dedup suite (VERDICT r1 items):

* seed sensitivity — minhash_i must differ across seeds i on a fixed shingle
  set (pins the transform-lambda arity bug: a 2-arg lambda binds its second
  argument to the ELEMENT INDEX, collapsing every seed into one hash fn);
* skinny band shuffle — the band-bucket self-join must move only
  (id, band, bhash) rows; shingle arrays join back only on the
  candidate-sized verify (never ×bands through the blocking exchange);
* no K-way union fan-out — banding is ONE posexplode, not a bands-way union.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_md5,
    minhash_signature,
    simhash_pairs,
)


def _exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_seeds_are_distinct(spark):
    """16 seeds over one fixed shingle set must give (essentially all)
    distinct signature values — identical columns mean the seed is being
    ignored and LSH recall degenerates from 1-(1-j^r)^b to ~j."""
    df = spark.createDataFrame(
        [(["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"],)],
        "sh array<string>",
    )
    row = df.select(*minhash_signature(F.col("sh"), 16)).first()
    vals = [row[f"mh{i}"] for i in range(16)]
    assert len(set(vals)) >= 14, vals
    assert vals[0] != vals[1]


def test_band_join_shuffle_excludes_shingles(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common tokens ride along here every time {i % 3}") for i in range(30)],
        ["doc_id", "text"],
    )
    for pairs_fn in (minhash_lsh_pairs, minhash_lsh_pairs_md5):
        plan = _exec_plan(pairs_fn(docs, "text", "doc_id", bands=4, rows_per_band=2))
        gen_lines = [l for l in plan.splitlines() if "Generate posexplode" in l]
        assert gen_lines, plan  # banding is posexplode, not a union
        import re

        for line in gen_lines:
            # required child output is [id] only — no shingle array rides the
            # band rows into the self-join exchange ("sh#N" attr; negative
            # lookbehind so "bhash#N" doesn't false-positive)
            assert not re.search(r"(?<![a-zA-Z])sh#", line), line
        assert "Union" not in plan
        # the verify re-join on true shingle sets still exists downstream
        assert "array_intersect" in plan


def test_simhash_banding_is_posexplode_not_union(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i % 5}") for i in range(20)], ["doc_id", "text"]
    )
    plan = _exec_plan(simhash_pairs(docs, "text", "doc_id"))
    assert "Generate posexplode" in plan
    assert "Union" not in plan


def test_canonicalize_numeric_stem_veto(spark):
    """entity14 vs entity140 share 6/7 shingles (J=0.857) but carry DIFFERENT
    numeric ids → must stay distinct; same-id surface variants still merge.
    (Regression for the over-merge the seed-binding fix uncovered: working
    LSH surfaces prefix-id pairs the degenerate banding never did.)"""
    from aiwhispr_spark.operators.canonicalize import canonicalize_aliases

    aliases = spark.createDataFrame(
        [("Entity_14",), ("Entity 14",), ("E14 Corp",), ("Entity 140",), ("E140 Corp",)],
        ["alias"],
    )
    out = {r["alias"]: r["entity_id"] for r in canonicalize_aliases(aliases).collect()}
    fam14 = {out["Entity_14"], out["Entity 14"], out["E14 Corp"]}
    fam140 = {out["Entity 140"], out["E140 Corp"]}
    assert len(fam14) == 1 and len(fam140) == 1
    assert fam14 != fam140


def test_canonicalize_blocking_shuffle_excludes_shingles(spark):
    from aiwhispr_spark.operators.canonicalize import candidate_pairs

    aliases = spark.createDataFrame(
        [(f"Entity_{i % 7}",) for i in range(30)] + [(f"E{i % 7} Corp",) for i in range(30)],
        ["alias"],
    )
    pairs = candidate_pairs(aliases)
    plan = _exec_plan(pairs)
    for line in plan.splitlines():
        if "Generate explode" in line:
            assert "shingles#" not in line, line
    assert pairs.count() > 0  # sanity: the skinny path still finds families


def _mini_corpus(spark):
    rows = []
    for i in range(12):
        body = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i}"
        rows.append((i, body))
    # near-dup family: 100/101 share most shingles
    rows.append((100, "same words over and over repeated exactly here today"))
    rows.append((101, "same words over and over repeated exactly here now"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_minhash_matches_full_run(spark):
    """Folding the corpus through 2 batches yields exactly the full-corpus
    pair set: batch1-internal pairs (from batch1's own incremental call) ∪
    delta-involving pairs (batch2's call)."""
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs

    docs = _mini_corpus(spark)
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)

    full, _, _ = incremental_minhash_pairs(docs, None, None, min_matches=6)
    p1, bands1, sigs1 = incremental_minhash_pairs(b1, None, None, min_matches=6)
    p2, bands2, sigs2 = incremental_minhash_pairs(
        b2, bands1, sigs1, min_matches=6
    )

    def pset(df):
        return {(r["a"], r["b"], r["n_match_i"]) for r in df.collect()}

    assert pset(p1) | pset(p2) == pset(full)
    assert pset(p2)  # the near-dup family actually landed in the delta call
    # store growth is append-only union of both batches
    assert bands2.count() == docs.count() * 8  # 8 bands per doc
    assert sigs2.count() == docs.count()


def test_incremental_minhash_signature_agreement_counts(spark):
    """n_match_i is the exact count of equal minhash components (python
    recomputation via the signature expressions themselves)."""
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs, minhash_index

    docs = _mini_corpus(spark).filter(F.col("doc_id").isin(100, 101))
    pairs, _, sigs = incremental_minhash_pairs(docs, None, None, min_matches=0)
    sig_map = {r["id"]: r["sig"] for r in sigs.collect()}
    got = {(r["a"], r["b"]): r["n_match_i"] for r in pairs.collect()}
    if (100, 101) in got:
        exp = sum(1 for x, y in zip(sig_map[100], sig_map[101]) if x == y)
        assert got[(100, 101)] == exp


def test_incremental_minhash_band_store_shuffle_is_skinny(spark):
    """The delta-vs-store join must move (id, band, bhash) rows only —
    shingle arrays and signatures stay out of the band exchange."""
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs

    docs = _mini_corpus(spark)
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)
    _, bands1, sigs1 = incremental_minhash_pairs(b1, None, None)
    pairs, _, _ = incremental_minhash_pairs(b2, bands1, sigs1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the candidate join subtree must not carry the shingle or sig arrays
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        # (?<![a-z]) so 'bhash#NNN' does not false-match 'sh#'
        assert not re.search(r"(?<![a-z])sh#", keys), keys
        assert not re.search(r"(?<![a-z])sig#", keys), keys


def test_incremental_minhash_replay_is_idempotent(spark):
    """Re-submitting an already-indexed doc_id (crash replay / unchanged
    re-crawl) must not duplicate store rows or fan pair output out."""
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs

    docs = _mini_corpus(spark)
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)
    p1, bands1, sigs1 = incremental_minhash_pairs(b1, None, None, min_matches=6)
    p2, bands2, sigs2 = incremental_minhash_pairs(b2, bands1, sigs1, min_matches=6)
    # replay batch2 wholesale against the post-batch2 store
    p3, bands3, sigs3 = incremental_minhash_pairs(b2, bands2, sigs2, min_matches=6)
    assert p3.count() == 0
    assert sigs3.count() == sigs2.count() == docs.count()
    assert bands3.count() == bands2.count() == docs.count() * 8
    # and a future delta still emits each pair exactly once
    extra = spark.createDataFrame(
        [(102, "same words over and over repeated exactly here soon")],
        "doc_id long, text string",
    )
    p4, _, _ = incremental_minhash_pairs(extra, bands3, sigs3, min_matches=6)
    pairs = [(r["a"], r["b"]) for r in p4.collect()]
    assert len(pairs) == len(set(pairs))


def test_incremental_minhash_mismatched_stores_rejected(spark):
    from aiwhispr_spark.operators.dedup import incremental_minhash_pairs

    docs = _mini_corpus(spark)
    _, bands1, _ = incremental_minhash_pairs(docs, None, None)
    with pytest.raises(ValueError):
        incremental_minhash_pairs(docs, bands1, None)


def test_containment_pairs_directional(spark):
    # b wraps a's full text in boilerplate: a contained-in b at 1.0, but b
    # NOT contained in a; c shares nothing.
    from aiwhispr_spark.operators.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "syndicated feed start alpha beta gamma delta epsilon zeta all rights reserved"),
        (3, "totally different words everywhere now friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.contained, r.container, r.containment_i)
        for r in containment_pairs(df, n=3, threshold=0.9).collect()
    ]
    assert got == [(1, 2, 1000000)]


def test_containment_pairs_stop_shingle_cap_blocks_only(spark):
    # every doc shares ONE ultra-common shingle; with the df cap below the
    # corpus size no candidates form from it, so no pairs emit even though
    # the tiny docs are identical on that shingle alone.
    from aiwhispr_spark.operators.dedup import containment_pairs

    rows = [(i, "all rights reserved") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, n=3, threshold=0.5, max_shingle_df=3).count() == 0
    # raising the cap re-admits them (identical docs: both directions at 1.0)
    assert containment_pairs(df, n=3, threshold=0.5, max_shingle_df=10).count() == 20


def test_contrastive_triplets_positive_election_and_negative_exclusion(spark):
    from pyspark.sql import functions as F

    from aiwhispr_spark.operators.dedup import contrastive_triplets

    # pair table: 1's best dup is 2 (J=.9) over 3 (J=.6); 4 is isolated
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.6)], "a long, b long, jaccard double"
    )
    ids = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    got = {r.anchor: r for r in contrastive_triplets(pairs, ids, probe_mod=3).collect()}
    assert set(got) == {1, 2, 3}  # every paired doc anchors; isolated docs don't
    assert got[1].pos_id == 2  # max jaccard wins
    assert got[2].pos_id == 1 and got[3].pos_id == 1
    # negative is never the anchor, its positive, or ANY near-dup partner
    partners = {1: {2, 3}, 2: {1}, 3: {1}}
    for r in got.values():
        assert r.neg_id != r.anchor
        assert r.neg_id not in partners[r.anchor]

    # determinism: content-addressed negatives repeat exactly
    again = {r.anchor: r.neg_id for r in contrastive_triplets(pairs, ids, probe_mod=3).collect()}
    assert again == {k: v.neg_id for k, v in got.items()}
