"""Gates for AMS F2, Gorilla delta-of-delta bits, and KMP periodicity:

* AMS — estimator mean approximates exact F2 within the AMS variance bound
  on a skewed fixture (and z of a 1-item stream is ±count exactly);
* Gorilla — hand-computed bit schedule per arm (header/first-delta/0/9/12/
  16/36), regular streams compress, jittery ones don't;
* periodicity — exact repetitions detected (period, n_units), aperiodic
  strings report period n, truncation cap respected.
"""

from __future__ import annotations

from aiwhispr_spark.operators.layout import gorilla_timestamp_bits
from aiwhispr_spark.operators.sketches import ams_f2_sketch
from aiwhispr_spark.operators.textstats import string_periodicity


def test_ams_single_item_is_exact(spark):
    df = spark.createDataFrame([("x",)] * 7, "item string")
    rows = ams_f2_sketch(df, "item", n_estimators=4).collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r["z"]) == 7 and r["f2_est"] == 49 and r["f2_exact"] == 49


def test_ams_mean_tracks_exact_f2(spark):
    # skewed stream: f = (100, 10, 10, 1×30) -> F2 = 10000+100+100+30
    rows = [("hot",)] * 100 + [("warm1",)] * 10 + [("warm2",)] * 10
    rows += [(f"cold{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "item string")
    out = ams_f2_sketch(df, "item", n_estimators=8).collect()
    exact = out[0]["f2_exact"]
    assert exact == 10230
    mean_est = sum(r["f2_est"] for r in out) / len(out)
    # AMS guarantee is variance <= 2*F2^2 per estimator; an 8-mean on this
    # fixture should land well within 3x either way (deterministic seeds)
    assert exact / 3 <= mean_est <= exact * 3


def test_gorilla_bit_schedule_hand_computed(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # series a: stamps 0,60,120,180 -> bits 64 (header), 36 (first delta),
    # then two dod=0 -> 1+1; total 102
    a = [("a", base + dt.timedelta(seconds=60 * i)) for i in range(4)]
    # series b: 0, 60, 184 -> dod = 124-60... stamps 0,60,184: bits 64,36,
    # dod=(124-60)=64 -> 9-bit arm boundary; total 109
    b = [
        ("b", base),
        ("b", base + dt.timedelta(seconds=60)),
        ("b", base + dt.timedelta(seconds=184)),
    ]
    df = spark.createDataFrame(a + b, "user_id string, ts timestamp")
    got = {r["series"]: r for r in gorilla_timestamp_bits(df).collect()}
    assert got["a"]["gorilla_bits"] == 64 + 36 + 1 + 1
    assert got["a"]["gorilla_bytes"] == 13 and got["a"]["raw_bytes"] == 32
    assert got["b"]["gorilla_bits"] == 64 + 36 + 9
    # one more second pushes dod to 65 -> 9-bit arm still ([-63,64] is
    # asymmetric: 65 > 64 -> 12-bit arm)
    b2 = b[:2] + [("b", base + dt.timedelta(seconds=185))]
    df2 = spark.createDataFrame(a + b2, "user_id string, ts timestamp")
    got2 = {r["series"]: r for r in gorilla_timestamp_bits(df2).collect()}
    assert got2["b"]["gorilla_bits"] == 64 + 36 + 12


def test_periodicity_exact_repetition_and_aperiodic(spark):
    df = spark.createDataFrame(
        [
            (1, "abcabcabc"),  # period 3, 3 units
            (2, "abcabcab"),  # truncated: period 3 but 8 % 3 != 0
            (3, "abcdefgh"),  # aperiodic: period n
            (4, "aaaa"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in string_periodicity(df).collect()}
    assert (got["1"]["period"], got["1"]["n_units"], got["1"]["is_periodic"]) == (3, 3, 1)
    assert (got["2"]["period"], got["2"]["is_periodic"]) == (3, 0)
    assert (got["3"]["period"], got["3"]["is_periodic"]) == (8, 0)
    assert (got["4"]["period"], got["4"]["n_units"], got["4"]["is_periodic"]) == (1, 4, 1)
    assert (got["5"]["n"], got["5"]["period"], got["5"]["is_periodic"]) == (0, 0, 0)


def test_periodicity_truncates_at_max_chars(spark):
    df = spark.createDataFrame([(1, "ab" * 300)], "doc_id long, text string")
    got = string_periodicity(df, max_chars=10).collect()[0]
    assert got["n"] == 10 and got["period"] == 2 and got["n_units"] == 5


def test_periodicity_null_text_is_empty_not_nan(spark):
    # ADVICE r3: NULL text used to reach mapInPandas as str(None)/'nan' and
    # get a real period; now it coalesces to '' (visible, n=0) like the
    # DuckDB twin's coalesce(text, '').
    df = spark.createDataFrame(
        [(1, None), (2, "abab")], "doc_id long, text string"
    )
    got = {r["id"]: r for r in string_periodicity(df).collect()}
    assert (got["1"]["n"], got["1"]["period"], got["1"]["is_periodic"]) == (0, 0, 0)
    assert (got["2"]["period"], got["2"]["n_units"]) == (2, 2)
