"""NULL-injection twins (VERDICT r4 #5): three rounds of ADVICE findings were
the same class — NULL text/judgment rows silently diverging between the
operator and its oracle (McNemar, string_periodicity, linededup, epoch
allocation).  This harness catches the class structurally: a fixture variant
with NULL text, empty text, whitespace-only text, NULL lang/source, and NULL
numerics runs the riskiest text/eval gates through BOTH engines with the
driver-faithful strict comparator (plain str(), no float rounding).

Found on first run (all fixed, contracts documented at the operator):

- lang_id: NULL text fell through Spark's when-chain to 'en' but DuckDB's
  CASE chain to 'fr' (NULL comparisons are NULL, not false);
- token_counts / doc_fingerprint / quality_features / gopher / readability /
  pii_redact: NULL text poisoned an INT oracle column -> pandas float64 ->
  '150.0' vs '150' (the line_dedup_boilerplate class, reached via data
  instead of HUGEINT);
- declared_lang_mismatch: NULL text nulled Spark's html concat (whole page
  gone) while the oracle built its declared arm from the lang column
  directly.

The documented contract everywhere: NULL text ≡ '' at the operator; gates
with legitimately-NULL numeric outputs coalesce to a sentinel in BOTH
engines (CLAUDE.md gate discipline)."""

from __future__ import annotations

import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tools.check_parity import TABLES, norm_rows

SRC = "/root/testdata/sf0.001"

# the pinned risk list: every query here reads documents.text (or builds a
# page from it) and has a closed-form oracle — the classes where a NULL row
# can diverge silently
PINNED = [
    "lang_id_heuristic",
    "token_counts",
    "doc_fingerprint",
    "quality_features",
    "gopher_quality_filter",
    "readability_scores",
    "pii_redact",
    "declared_lang_mismatch",
    "repetition_signals",
    "string_periodicity",
    "lexical_diversity_panel",
    "rake_keyphrases",
    "corpus_vocab_stats",
    "dedup_exact",
    "simhash_fingerprint",
    "kmv_distinct_sketch",
    "hll_distinct_tokens",
    "cms_heavy_hitters",
    "bigram_lm_scores",
    "chi2_feature_selection",
    "measurement_facts_normalized",
    "vocabulary_drift_jsd",
    "seq_length_buckets",
    "bleu_ngram_precisions",
    "pmi_collocations",
    "autocomplete_prefix_topk",
    "curriculum_order",
    "doremi_domain_weights",
    "dsir_importance_weights",
    "clean_corpus_filter_chain",
    # r5: reads source AND n_chars — the NULL-source rank-order pin
    # (NULLS FIRST both engines) and the coalesce(n_chars, 0) live here
    "gini_source_concentration",
    # r5: NULL/empty/whitespace text must drop at tokenization (no token
    # rows -> absent from the rate spine) identically in both engines
    "burrows_delta_attribution",
]


@pytest.fixture(scope="module")
def inj_dir(tmp_path_factory):
    """sf0.001 with five adversarial document rows appended: NULL text,
    empty text, whitespace-only text, NULL lang/source/n_chars."""
    dst = tmp_path_factory.mktemp("nullinj")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SRC}/{t}.parquet", str(dst / f"{t}.parquet"))
    base = pq.read_table(f"{SRC}/documents.parquet").select(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )
    extra = pa.table(
        {
            "doc_id": pa.array([9001, 9002, 9003, 9004, 9005], pa.int64()),
            "text": pa.array([None, "", "   \n\t  ", "x", None], pa.string()),
            "lang": pa.array(["en", "en", None, "en", None], pa.string()),
            "source": pa.array(["web", None, "web", "web", None], pa.string()),
            "n_chars": pa.array([None, 0, 7, 1, None], pa.int64()),
        }
    )
    pq.write_table(
        pa.concat_tables([base, extra]), str(dst / "documents.parquet")
    )
    return str(dst)


@pytest.fixture(scope="module")
def duck(inj_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{inj_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", PINNED)
def test_null_contract_parity(name, spark, inj_dir, duck):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = queries[name](spark, inj_dir)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    ddf = duck.execute(oracles[name]).df()
    assert sorted(scols) == sorted(ddf.columns), name
    drows = ddf.to_dict("records")
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    a = norm_rows(scols, srows)
    b = norm_rows(list(ddf.columns), drows)
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, (name, diffs)
