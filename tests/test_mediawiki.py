"""MediaWiki dump source (sources/mediawiki.py): lineSep-splittable scan,
XML unescape order, infobox/param/link parsing contract.  The sf-scale value
gates are `wikitext_infobox_triples` / `wiki_internal_links`."""

import os

from aiwhispr_spark.sources.mediawiki import (
    infobox_triples,
    internal_links,
    read_mediawiki_pages,
    write_mediawiki_dump,
)


def _dump(tmp_path, body, title="T"):
    xml = (
        '<mediawiki version="0.10">\n  <siteinfo><sitename>x</sitename></siteinfo>\n'
        f"  <page>\n    <title>{title}</title>\n    <revision>\n"
        f'      <text xml:space="preserve">{body}</text>\n'
        "    </revision>\n  </page>\n</mediawiki>\n"
    )
    p = os.path.join(str(tmp_path), "d.xml")
    with open(p, "w", encoding="utf-8") as f:
        f.write(xml)
    return p


def test_scan_is_splittable_and_complete(spark, tmp_path):
    p = os.path.join(str(tmp_path), "dump.xml")
    write_mediawiki_dump(p, n_pages=30)
    pages = read_mediawiki_pages(spark, p)
    assert pages.count() == 30
    # force MANY small file splits via the session conf (a reader .option
    # would be silently ignored) and assert the SPLIT read recovers every
    # page — the no-page-straddles-a-split property, actually exercised
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "2048")
        split_pages = read_mediawiki_pages(spark, p)
        assert split_pages.rdd.getNumPartitions() > 1
        titles = {r.title for r in split_pages.collect()}
    finally:
        spark.conf.set(key, old)
    assert titles == {f"Article {i}" for i in range(30)}


def test_unescape_order_amp_last(spark, tmp_path):
    p = _dump(tmp_path, "{{Infobox x\n| a = 1 &amp;lt; 2\n}}\n", title="A &amp; B")
    pages = read_mediawiki_pages(spark, p)
    row = pages.collect()[0]
    # &amp;lt; must decode to the literal '&lt;' (NOT '<'): amp decodes last
    assert row.title == "A & B"
    t = {(r.pred, r.obj) for r in infobox_triples(pages).collect()}
    assert ("infobox:a", "1 &lt; 2") in t


def test_infobox_params_and_empty_values(spark, tmp_path):
    p = _dump(
        tmp_path,
        "{{Infobox Settlement\n| name = X town \n| empty = \n| pop = 5\n}}\nafter",
    )
    got = {(r.pred, r.obj) for r in infobox_triples(read_mediawiki_pages(spark, p)).collect()}
    assert got == {
        ("wiki:type", "settlement"),
        ("infobox:name", "X town"),   # outer whitespace trimmed
        ("infobox:pop", "5"),         # empty param dropped
    }


def test_no_infobox_page_yields_no_triples(spark, tmp_path):
    p = _dump(tmp_path, "just prose with [[A Link|label]] and [[B#Section]]")
    pages = read_mediawiki_pages(spark, p)
    assert infobox_triples(pages).count() == 0
    links = {r.dst_title for r in internal_links(pages).collect()}
    assert links == {"A Link", "B"}  # label and anchor stripped
