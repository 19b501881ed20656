"""E5 linker against an EXTERNAL candidate table (FIXTURES.md §2).

The earlier P/R harness derives candidates from the mention stream itself, so
every mention trivially self-links.  Here candidates are an independent
canonical-entity table with near-miss distractors, so the cosine argmax
(reference semantics: Q1 top-k search reused as a linker,
searchService.py:73-97) must genuinely discriminate:

* alias surface forms ("Entity 7", "7 Entity", case variants) must link to the
  right canonical id and NOT to the one-token-off distractor (Entity_8);
* the ``lsh`` blocking strategy must agree with the exhaustive ``broadcast``
  strategy on every linkable mention;
* ``min_score`` must drop junk mentions instead of force-linking them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiwhispr_spark.embedding import hash_embed
from aiwhispr_spark.operators.linking import link_mentions, link_triples

CANONICAL = [
    "Entity_7",
    "Entity_8",
    "Entity_42",
    "Acme Corporation",
    "Ada Byron",
    "Alan Turing",
    "Berlin",
    "Paris",
    "Widget Factory",
    "Data Systems",
]


@pytest.fixture(scope="module")
def candidates(spark):
    rows = [(name, hash_embed(name)) for name in CANONICAL]
    return spark.createDataFrame(rows, "entity string, embedding array<float>")


def _links(df):
    return {r["mention"]: (r["entity"], r["link_score"]) for r in df.collect()}


def test_linker_discriminates_against_distractors(spark, candidates):
    mentions = spark.createDataFrame(
        [("Entity 7",), ("7 Entity",), ("entity 8",), ("ada byron",), ("BERLIN",)],
        "mention string",
    )
    got = _links(link_mentions(mentions, candidates))
    # token-identical aliases score ~1.0 on the exact match, ~0.5 on the
    # shared-"entity"-token distractor — argmax must pick the exact one
    assert got["Entity 7"][0] == "Entity_7"
    assert got["7 Entity"][0] == "Entity_7"  # bag-of-tokens order invariance
    assert got["entity 8"][0] == "Entity_8"
    assert got["ada byron"][0] == "Ada Byron"
    assert got["BERLIN"][0] == "Berlin"
    for m in ("Entity 7", "ada byron", "BERLIN"):
        assert got[m][1] == pytest.approx(1.0, abs=1e-6)


def test_lsh_strategy_matches_broadcast(spark, candidates):
    # collision-free mentions (no two tokens share a 64-d hash slot): the two
    # physical strategies must produce identical links and scores
    mentions = spark.createDataFrame(
        [("Entity 7",), ("entity 8",), ("Berlin",), ("Widget Factory",)],
        "mention string",
    )
    exhaustive = _links(link_mentions(mentions, candidates, strategy="broadcast"))
    blocked = _links(link_mentions(mentions, candidates, strategy="lsh"))
    for m, (ent, score) in exhaustive.items():
        assert m in blocked, f"LSH blocking lost linkable mention {m!r}"
        assert blocked[m][0] == ent
        assert blocked[m][1] == pytest.approx(score, abs=1e-6)


def test_lsh_blocking_excludes_embedding_collisions(spark, candidates):
    # 'acme' and 'berlin' collide at slot 19 of the 64-d stub embedder, so the
    # exhaustive linker scores cos("Acme Corp","Berlin")=0.707 over the true
    # match at 0.5.  LSH blocking is lexical (char-shingles of the normalized
    # alias) — it never pairs Acme with Berlin, and recovers the right link.
    # This pins the DESIGNED divergence between the two strategies.
    mentions = spark.createDataFrame([("Acme Corp",)], "mention string")
    exhaustive = _links(link_mentions(mentions, candidates, strategy="broadcast"))
    blocked = _links(link_mentions(mentions, candidates, strategy="lsh"))
    assert exhaustive["Acme Corp"][0] == "Berlin"  # stub-embedder collision
    assert blocked["Acme Corp"][0] == "Acme Corporation"


def test_min_score_drops_junk(spark, candidates):
    mentions = spark.createDataFrame([("Entity 7",), ("zzz qqq xyzzy",)], "mention string")
    got = _links(link_mentions(mentions, candidates, min_score=0.9))
    assert "Entity 7" in got
    assert "zzz qqq xyzzy" not in got


def test_link_triples_attaches_external_links(spark, candidates):
    triples = spark.createDataFrame(
        [
            ("Entity 7", "acquired", "Widget Factory", "u1", 1),
            ("Ada Byron", "is based in", "Berlin", "u2", 1),
        ],
        "subj string, pred string, obj string, url string, chunk_no int",
    )
    out = link_triples(triples, candidates).collect()
    by_subj = {r["subj"]: r for r in out}
    assert by_subj["Entity 7"]["subj_link"] == "Entity_7"
    assert by_subj["Entity 7"]["obj_link"] == "Widget Factory"
    assert by_subj["Ada Byron"]["subj_link"] == "Ada Byron"
    assert by_subj["Ada Byron"]["obj_link"] == "Berlin"


def test_fellegi_sunter_single_field_ratios(spark):
    # nm=3, ma=2; nu=4, ua=1 -> smoothed agree ratio 18/10, disagree 12/20
    from aiwhispr_spark.operators.linking import fellegi_sunter_scores

    rows = [
        (1, True, True), (2, True, True), (3, False, True),
        (4, True, False), (5, False, False), (6, False, False), (7, False, False),
    ]
    df = spark.createDataFrame(rows, "pid long, agr boolean, lab boolean")
    got = {r.pid: r for r in fellegi_sunter_scores(df, ["agr"], "lab").collect()}
    assert got[1].lr_i == (1_000_000 * 3 * 6) // (5 * 2)      # 1_800_000
    assert got[3].lr_i == (1_000_000 * 2 * 6) // (5 * 4)      # 600_000
    assert got[1].pattern == "1" and got[3].pattern == "0"


def test_fellegi_sunter_field_order_is_the_contract(spark):
    # successive floor division is order-sensitive by design: assert the
    # documented left-to-right order is what's computed.
    from aiwhispr_spark.operators.linking import fellegi_sunter_scores

    rows = [
        (1, True, False, True), (2, False, True, True),
        (3, True, True, False), (4, False, False, False), (5, True, False, False),
    ]
    df = spark.createDataFrame(rows, "pid long, f1 boolean, f2 boolean, lab boolean")
    # counts: nm=2 (pids 1,2), nu=3; f1: ma=1, ua=2; f2: ma=1, ua=1
    def step(x, num, den):
        return (x * num) // den

    exp1 = step(1_000_000, (1 + 1) * (3 + 2), (2 + 2) * (2 + 1))  # f1 agree
    exp1 = step(exp1, (2 + 1 - 1) * (3 + 2), (2 + 2) * (3 + 1 - 1))  # f2 disagree
    got = {r.pid: r.lr_i for r in fellegi_sunter_scores(df, ["f1", "f2"], "lab").collect()}
    assert got[1] == exp1


def test_fellegi_sunter_empty_fields_raises(spark):
    import pytest

    from aiwhispr_spark.operators.linking import fellegi_sunter_scores

    df = spark.createDataFrame([(1, True)], "pid long, lab boolean")
    with pytest.raises(ValueError):
        fellegi_sunter_scores(df, [], "lab")


def test_collective_disambiguation_flip_singleton_identity(spark):
    from aiwhispr_spark.operators.linking import collective_disambiguation

    pri = spark.createDataFrame(
        [
            ("jaguar", "JaguarCar", 6000),
            ("jaguar", "JaguarCat", 5000),
            ("habitat", "Habitat", 9000),
        ],
        "surface string, entity string, prior_i long",
    )
    rel = spark.createDataFrame(
        [("Habitat", "JaguarCat", 9000)],  # a < b lexicographically
        "a string, b string, rel_i long",
    )
    men = spark.createDataFrame(
        [
            ("doc1", 0, "jaguar"), ("doc1", 1, "habitat"),  # context flips to Cat
            ("doc2", 0, "jaguar"),                            # singleton: prior wins
            ("doc3", 0, "habitat"), ("doc3", 1, "habitat"),  # identity bonus
        ],
        "doc string, mention_id int, surface string",
    )
    got = {(r.doc, r.mention_id): (r.entity, r.score_i)
           for r in collective_disambiguation(men, pri, rel).collect()}
    assert got[("doc1", 0)] == ("JaguarCat", 5000 + 9000)  # coherence beats prior
    assert got[("doc2", 0)] == ("JaguarCar", 6000)          # no context -> prior
    assert got[("doc3", 0)] == ("Habitat", 9000 + 10000)    # identity context bonus
