"""CSV source (sources/csvsrc.py): RFC 4180 quoting, multi-line fields,
corrupt-row routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiwhispr_spark.sources.csvsrc import read_csv, write_csv_fixture


def test_roundtrip_and_corrupt_row(spark, tmp_path):
    path = write_csv_fixture(str(tmp_path / "docs.csv"), n_docs=12)
    df = read_csv(spark, path)
    bad = df.where(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0].doc_id is None

    good = df.where(F.col("_corrupt_record").isNull()).collect()
    assert len(good) == 12
    by_id = {r.doc_id: r for r in good}
    # embedded comma + doubled quote + newline survive the quoting round-trip
    assert by_id[3].text == 'csv doc 3, says "quoted 21" and\ncontinues on a new line with café 3'
    assert by_id[0].lang == "en" and by_id[1].lang == "de"
