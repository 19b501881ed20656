"""Driver-contract smoke tests: entry() returns rows; every oracle key has a
query; a sample of query/oracle pairs hash-match via DuckDB (the full sweep
lives in tools/check_parity.py)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # SQL-expressible coverage should dominate
    assert len(o) >= 20


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 25
    assert {"vec_id", "score_i", "distance_i", "angle_i", "tier"} == set(df.columns)


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q1_pricing_summary",
        "g1_qa_assembly",
        "t1_clean_html",
        "asof_join_purchase_click",
        "q4_fulltext_rank",
        "simhash_fingerprint",
    ],
)
def test_query_matches_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    sdf = entrymod.queries()[name](spark, SF)
    srows = sorted(
        tuple(str(r[c]) for c in sorted(sdf.columns)) for r in sdf.collect()
    )
    ddf = con.execute(entrymod.oracle_sql()[name]).df()
    drows = sorted(
        tuple(str(rec[c]) for c in sorted(ddf.columns)) for rec in ddf.to_dict("records")
    )
    assert srows == drows
