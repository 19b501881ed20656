"""Unit tests for the meta-robots compliance filter (operators/robots.py) and
the hashed linear quality classifier (textstats.hashed_linear_scores)."""

import pyspark.sql.functions as F
import pytest

from aiwhispr_spark.operators.robots import (
    filter_indexable,
    meta_robots_flags,
    robots_contents_expr,
)
from aiwhispr_spark.operators.textstats import hashed_linear_scores


def _flags(spark, html):
    df = spark.createDataFrame([(html,)], "html_text string")
    r = meta_robots_flags(df).first()
    return r["noindex_i"], r["nofollow_i"]


class TestMetaRobots:
    def test_plain_noindex(self, spark):
        assert _flags(spark, '<meta name="robots" content="noindex">') == (1, 0)

    def test_comma_list_both(self, spark):
        assert _flags(
            spark, '<head><meta name="robots" content="noindex, nofollow"></head>'
        ) == (1, 1)

    def test_attribute_order_swapped(self, spark):
        assert _flags(spark, '<meta content="noindex" name="robots">') == (1, 0)

    def test_case_and_single_quotes(self, spark):
        assert _flags(spark, "<META NAME='ROBOTS' CONTENT='NOFOLLOW'>") == (0, 1)

    def test_none_means_both(self, spark):
        assert _flags(spark, '<meta name="robots" content="none">') == (1, 1)

    def test_decoy_description_not_a_directive(self, spark):
        assert _flags(
            spark, '<meta name="description" content="how noindex works">'
        ) == (0, 0)

    def test_noindex_substring_not_a_token(self, spark):
        # "noindexing" must not trip the \b-delimited token match
        assert _flags(
            spark, '<meta name="robots" content="noindexing-guide">'
        ) == (0, 0)

    def test_no_tag(self, spark):
        assert _flags(spark, "<html><body>hi</body></html>") == (0, 0)

    def test_unquoted_attributes(self, spark):
        assert _flags(spark, "<meta name=robots content=noindex>") == (1, 0)

    def test_filter_indexable_drops_and_cleans(self, spark):
        df = spark.createDataFrame(
            [
                (1, '<meta name="robots" content="noindex">x'),
                (2, "<p>fine</p>"),
            ],
            "doc_id long, html_text string",
        )
        out = filter_indexable(df)
        assert [r["doc_id"] for r in out.collect()] == [2]
        assert "noindex_i" not in out.columns

    def test_content_value_extraction(self, spark):
        df = spark.createDataFrame(
            [('<meta name="robots" content="noarchive,  noindex">',)],
            "h string",
        )
        v = df.select(robots_contents_expr(F.col("h")).alias("v")).first()["v"]
        assert v == ["noarchive,  noindex"]

    def test_two_tags_union_directives(self, spark):
        # second robots meta must not be shadowed by the first
        assert _flags(
            spark,
            '<meta name="robots" content="nofollow">'
            '<meta name="robots" content="noindex">',
        ) == (1, 1)


class TestHashedLinearClassifier:
    def test_deterministic_and_integer(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox")],
            "doc_id long, text string",
        )
        rows = hashed_linear_scores(df).orderBy("doc_id").collect()
        assert rows[0]["score_i"] == rows[1]["score_i"]
        assert rows[0]["n_tokens"] == 4
        assert isinstance(rows[0]["score_i"], int)
        assert -1000 * 4 <= rows[0]["score_i"] <= 1000 * 4

    def test_empty_and_whitespace_text(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in hashed_linear_scores(df).collect()}
        assert rows[1]["n_tokens"] == 0 and rows[1]["score_i"] == 0
        assert rows[2]["n_tokens"] == 0 and rows[2]["score_i"] == 0
        # NULL text propagates NULL (upstream extraction failure stays visible)
        assert rows[3]["n_tokens"] is None

    def test_keep_flag_threshold_cross_multiply(self, spark):
        df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        r = hashed_linear_scores(df, threshold_i=10**9).first()
        assert r["keep_i"] == 0  # impossible threshold drops everything
        r2 = hashed_linear_scores(df, threshold_i=-(10**9)).first()
        assert r2["keep_i"] == 1

    def test_score_is_sum_of_token_weights(self, spark):
        # cross-check the expression chain against a python recomputation
        import hashlib

        text = "alpha beta gamma alpha"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = hashed_linear_scores(df).first()
        exp = 0
        for tok in text.lower().split():
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 4096
            exp += (b * 2654435761) % 2001 - 1000
        assert r["score_i"] == exp

    def test_zero_shuffle_zero_python_plan(self, spark):
        df = spark.range(10).selectExpr("id as doc_id", "'x y z' as text")
        plan = hashed_linear_scores(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestCompressionRatios:
    """Value gate for textstats.compression_ratios — no SQL engine has zlib,
    so the golden is a direct python recomputation (same contract the
    queries() entry documents as its rows-only reason)."""

    def test_golden_against_zlib_reference(self, spark):
        import zlib

        from aiwhispr_spark.operators.textstats import compression_ratios

        texts = [
            (1, "abc " * 500),            # highly repetitive -> low ratio
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, ""),                       # empty -> ratio_i 0 by contract
            (4, "café über naïve 東京 " * 40),  # multibyte utf-8
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        rows = {r["doc_id"]: r for r in compression_ratios(df).collect()}
        for doc_id, text in texts:
            raw = text.encode("utf-8")
            comp = zlib.compress(raw, 6)
            r = rows[doc_id]
            assert r["n_bytes"] == len(raw)
            assert r["n_compressed"] == len(comp)
            exp = int(round(10000.0 * len(comp) / len(raw))) if raw else 0
            assert r["ratio_i"] == exp
        # the repetitive doc must compress far better than natural text
        assert rows[1]["ratio_i"] < rows[2]["ratio_i"]

    def test_null_text_treated_as_empty(self, spark):
        from aiwhispr_spark.operators.textstats import compression_ratios

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        r = compression_ratios(df).first()
        assert (r["n_bytes"], r["n_compressed"], r["ratio_i"])[0] == 0
        assert r["ratio_i"] == 0

    def test_narrow_plan_no_shuffle(self, spark):
        from aiwhispr_spark.operators.textstats import compression_ratios

        df = spark.range(10).selectExpr("id as doc_id", "'x y z' as text")
        plan = (
            compression_ratios(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # scan -> mapInPandas, no shuffle


class TestRobotsTxtEngine:
    """RFC 9309 subset: group parsing + most-specific-agent selection +
    longest-prefix matching (operators/robots.py).  The driver gate
    (`robots_txt_fetch_policy`) re-derives the whole spec in DuckDB SQL;
    these pin the tricky single cases."""

    def _apply(self, spark, robots_rows, url_rows, agent="aiwhisprbot"):
        from aiwhispr_spark.operators.robots import (
            apply_robots_rules,
            parse_robots_rules,
        )

        robots = spark.createDataFrame(
            robots_rows, "host string, robots_txt string"
        )
        urls = spark.createDataFrame([(u,) for u in url_rows], "url string")
        rules = parse_robots_rules(robots)
        return {
            r["url"]: (r["allowed_i"], r["match_prefix"])
            for r in apply_robots_rules(urls, rules, agent=agent).collect()
        }

    def test_longest_prefix_allow_override(self, spark):
        got = self._apply(
            spark,
            [("a.org", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n")],
            [
                "https://a.org/private/secret",
                "https://a.org/private/okpage",
                "https://a.org/pub",
            ],
        )
        assert got["https://a.org/private/secret"] == (0, "/private/")
        assert got["https://a.org/private/okpage"] == (1, "/private/ok")
        assert got["https://a.org/pub"] == (1, None)

    def test_equal_length_tie_allow_wins(self, spark):
        got = self._apply(
            spark,
            [("a.org", "User-agent: *\nDisallow: /s/\nAllow: /s/\n")],
            ["https://a.org/s/x"],
        )
        assert got["https://a.org/s/x"][0] == 1

    def test_specific_agent_shadows_star(self, spark):
        txt = "User-agent: aiwhisprbot\nDisallow: /bot/\n\nUser-agent: *\nDisallow: /all/\n"
        got = self._apply(
            spark,
            [("b.org", txt)],
            ["https://b.org/bot/x", "https://b.org/all/y"],
        )
        # star group's /all/ rule is IGNORED for the named agent
        assert got["https://b.org/bot/x"] == (0, "/bot/")
        assert got["https://b.org/all/y"] == (1, None)
        other = self._apply(
            spark, [("b.org", txt)], ["https://b.org/all/y"], agent="otherbot"
        )
        assert other["https://b.org/all/y"] == (0, "/all/")

    def test_consecutive_ua_lines_share_rules(self, spark):
        got = self._apply(
            spark,
            [("c.org", "User-agent: *\nUser-agent: aiwhisprbot\nDisallow: /sh/\n")],
            ["https://c.org/sh/d"],
        )
        assert got["https://c.org/sh/d"][0] == 0

    def test_trailing_empty_specific_group_allows_all(self, spark):
        # RFC 9309: the EOF group claims the agent even with zero rules
        txt = "User-agent: *\nDisallow: /\nUser-agent: aiwhisprbot\n"
        got = self._apply(spark, [("d.org", txt)], ["https://d.org/any"])
        assert got["https://d.org/any"] == (1, None)
        star = self._apply(
            spark, [("d.org", txt)], ["https://d.org/any"], agent="stranger"
        )
        assert star["https://d.org/any"] == (0, "/")

    def test_orphan_rules_comments_empty_and_wildcards_dropped(self, spark):
        txt = (
            "Disallow: /orphan/\n#only a comment\nUser-agent: *\n"
            "Disallow:\nDisallow: /wi*ld\nDisallow: /x/ # inline comment\n"
        )
        got = self._apply(
            spark,
            [("e.org", txt)],
            [
                "https://e.org/orphan/p",
                "https://e.org/wi-ld",
                "https://e.org/x/q",
            ],
        )
        assert got["https://e.org/orphan/p"] == (1, None)
        assert got["https://e.org/wi-ld"] == (1, None)
        assert got["https://e.org/x/q"] == (0, "/x/")

    def test_no_robots_host_allows_everything(self, spark):
        got = self._apply(
            spark,
            [("a.org", "User-agent: *\nDisallow: /\n")],
            ["https://unknown.org/p"],
        )
        assert got["https://unknown.org/p"] == (1, None)

    def test_root_url_and_query_fragment_stripped(self, spark):
        got = self._apply(
            spark,
            [("a.org", "User-agent: *\nDisallow: /p/\n")],
            ["https://a.org", "https://a.org/p/page?x=1#frag"],
        )
        assert got["https://a.org"] == (1, None)   # path '' -> '/'
        assert got["https://a.org/p/page?x=1#frag"][0] == 0
