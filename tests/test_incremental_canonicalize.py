"""Delta entity resolution (canonicalize.incremental_canonicalize): new alias
surfaces are assigned against the existing canonical store without a corpus
recompute.  Gates: partition-equivalence with the full batch recompute, the
never-merge-store-entities contract (deferred to compaction), new-entity
minting, and idempotence of the append shape."""

from pyspark.sql import functions as F

from aiwhispr_spark.operators.canonicalize import (
    canonicalize_aliases,
    incremental_canonicalize,
)


def _groups(rows):
    """entity partition structure: set of frozensets of aliases."""
    by_ent = {}
    for alias, ent in rows:
        by_ent.setdefault(ent, set()).add(alias)
    return {frozenset(v) for v in by_ent.values()}


def _adf(spark, surfaces):
    return spark.createDataFrame([(s,) for s in surfaces], "alias string")


def test_incremental_equals_full_recompute_partitions(spark):
    # base: 8 families seen with two surfaces each; delta adds a third
    # surface per family plus 3 brand-new families
    base = [s for i in range(8) for s in (f"Entity_{i}", f"entity{i}")]
    delta = [f"E{i} Corp" for i in range(8)] + [
        s for i in (20, 21, 22) for s in (f"Entity_{i}", f"e{i}")
    ]
    store = canonicalize_aliases(_adf(spark, base))
    inc = incremental_canonicalize(_adf(spark, delta), store)
    merged = [
        (r["alias"], r["entity_id"])
        for r in store.unionByName(inc).collect()
    ]
    full = [
        (r["alias"], r["entity_id"])
        for r in canonicalize_aliases(_adf(spark, base + delta)).collect()
    ]
    assert _groups(merged) == _groups(full)
    # and the delta output is append-shaped: exactly the delta surfaces
    assert {r[0] for r in merged} == set(base + delta)
    assert inc.count() == len(delta)


def test_incremental_adopts_store_entity_id(spark):
    store = spark.createDataFrame(
        [("Entity_7", "Entity_7"), ("entity7", "Entity_7")],
        "alias string, entity_id string",
    )
    inc = incremental_canonicalize(_adf(spark, ["E7 Corp"]), store)
    assert [(r["alias"], r["entity_id"]) for r in inc.collect()] == [
        ("E7 Corp", "Entity_7")
    ]


def test_incremental_never_merges_store_entities(spark):
    # an older compaction assigned the e5 family to two different entities;
    # a bridging delta alias adopts the MIN entity id and the store rows are
    # untouched (the true merge is compaction's job)
    store = spark.createDataFrame(
        [("Entity_5", "ent:B"), ("E5 Corp", "ent:A")],
        "alias string, entity_id string",
    )
    inc = incremental_canonicalize(_adf(spark, ["entity5"]), store)
    assert [(r["alias"], r["entity_id"]) for r in inc.collect()] == [
        ("entity5", "ent:A")
    ]


def test_incremental_skips_known_aliases_and_mints_new(spark):
    store = spark.createDataFrame(
        [("Entity_1", "Entity_1")], "alias string, entity_id string"
    )
    # 'Entity_1' is already assigned → dropped from the delta; the new
    # family mints its smallest member as entity id (batch election rule)
    inc = incremental_canonicalize(
        _adf(spark, ["Entity_1", "Entity_9", "e9"]), store
    )
    got = {(r["alias"], r["entity_id"]) for r in inc.collect()}
    # min("Entity_9", "e9") is "Entity_9" ('E' < 'e' in byte order)
    assert got == {("Entity_9", "Entity_9"), ("e9", "Entity_9")}


def test_incremental_on_empty_store(spark):
    store = spark.createDataFrame([], "alias string, entity_id string")
    surfaces = ["Entity_3", "entity3", "E3 Corp"]
    inc = incremental_canonicalize(_adf(spark, surfaces), store)
    batch = canonicalize_aliases(_adf(spark, surfaces))
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, batch.collect()))
