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


def test_incremental_components_merge_and_new_nodes(spark):
    from aiwhispr_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    base = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31)], "a long, b long"
    )
    old = connected_components(base)
    # delta: merge {10..12} with {20,21}; attach brand-new 5 to 30's comp
    # (5 < 30 -> the OLD component must relabel to 5); intra-component no-op
    delta = spark.createDataFrame([(12, 20), (5, 31), (10, 11)], "a long, b long")
    got = {r.alias: r.component for r in incremental_components(old, delta).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 10, 21: 10, 30: 5, 31: 5, 5: 5}


def test_incremental_components_equals_full_recompute(spark):
    from aiwhispr_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    base_rows = [(i, i + 1) for i in range(0, 40, 2)]           # 20 two-node comps
    delta_rows = [(i, i + 7) for i in range(0, 40, 5)] + [(100, 3), (101, 100)]
    base = spark.createDataFrame(base_rows, "a long, b long")
    delta = spark.createDataFrame(delta_rows, "a long, b long")
    inc = {
        r.alias: r.component
        for r in incremental_components(connected_components(base), delta).collect()
    }
    full = {
        r.alias: r.component
        for r in connected_components(base.unionByName(delta)).collect()
    }
    assert inc == full
