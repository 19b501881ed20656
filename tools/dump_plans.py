"""Regenerate PLANS.md: formatted physical plans of representative queries,
each with (a) one line calling out the property the plan must exhibit and
(b) MEASURED shuffle volume (write/read bytes summed over the query's
completed stages, via the Spark UI REST API) — so a regression that fattens
an exchange (e.g. payload columns riding a band join) shows up as a number,
not a plan-diff someone has to notice.
Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from aiwhispr_spark.session import get_spark  # noqa: E402

SHOWN = [
    ("flagship_semantic_search", "top-k compiles to TakeOrderedAndProject; no shuffle of the table"),
    ("f5_meta_projection", "PushedFilters reach the parquet scan; ReadSchema prunes columns"),
    ("tpch_q3_top_revenue", "small dims broadcast (BroadcastHashJoin); top-k TakeOrderedAndProject"),
    ("q4_fulltext_rank", "query terms broadcast onto posting lists; partial agg before the top-k"),
    ("asof_join_purchase_click", "union+window: ONE hash exchange, zero join operators"),
    ("range_join_purchase_clicks", "bucket trick → equi-join, no BroadcastNestedLoopJoin"),
    ("lang_id_heuristic", "pure JVM expressions: no python stage, no exchange"),
    ("minhash_pairs_md5", "band self-join exchanges carry (id, band, bhash) only — shingle arrays re-join candidate-sized, so shuffle bytes stay ~independent of band count"),
    ("hybrid_search_two_arm", "both arms stay single-arm-optimal; found counts broadcast onto a ≤45-row result"),
    ("global_sort_rank", "NO single-partition WindowExec: range Exchange on the sort key, window partitioned by __range_pid, offsets from a bounded per-partition-count collect"),
    ("fulltext_multifield_rank", "ONE scan + ONE explode chain for all 3 fields (struct array, not a K-way corpus union); terms broadcast; TakeOrderedAndProject"),
    ("websearch_parse_filter", "pure-JVM predicate inside WholeStageCodegen: no python stage, no exchange, no explode"),
    ("bm25_rank", "df/idf aggregate over TERM postings only (post broadcast-join); 1-row stats cross-joined broadcast; one corpus-sized shuffle (per-doc score sum)"),
    ("decontaminate_ngrams", "sliding 13-gram window is pure JVM (transform+slice, no python stage); benchmark gram set broadcast"),
    ("pii_redact", "three-regex redaction chain fused in WholeStageCodegen: no python stage, no exchange"),
    ("main_content_extract", "block split + density decision are pure JVM array expressions: no python stage, no exchange"),
    ("link_extract_canonical", "extract→resolve→canonicalize is ONE narrow projection: no shuffle of the corpus"),
    ("host_graph_edges", "the host-pair aggregate is the ONLY exchange (partial_count map-side); extraction stays narrow"),
    ("line_dedup_boilerplate", "counting shuffle carries (xxhash64 line_key, doc_id) only — line TEXT never rides an exchange; reassembly groups by doc_id"),
    ("semantic_dedup_pairs", "centroid table broadcast (assignment narrow, ONE exchange for the argmax groupBy); pair join keys on cid"),
    ("unigram_lm_scores", "vocab-count subtree appears twice (total + logp) but the exchange REUSES at runtime (verified: 1 ReusedExchange in the executed plan); 1-row corpus total broadcast; per-doc agg partial map-side"),
    ("temperature_mix_sample", "per-source rates broadcast back; keep-filter is a narrow projection; one count shuffle total"),
    ("quality_classifier_hashed", "tokenize→hash→weight→sum is ONE expression chain: no python stage, no exchange — classifier at scan speed"),
    ("robots_noindex_filter", "meta-robots regex flags fused in WholeStageCodegen: no python stage, no exchange"),
    ("bloom_prefilter_dedup", "bloom probe is a narrow expression on the store scan (positions array is a literal); the only join keys on the 32-char digest"),
    ("duplicate_ngram_spans", "counting shuffle carries (xxhash64 gram_key, id) only — gram TEXT never rides an exchange (linededup discipline)"),
    ("bpe_pair_stats", "corpus collapses to VOCAB first (one word-keyed exchange); pair agg map-side combines into ≤alphabet² keys; top-k is TakeOrderedAndProject"),
    ("kg_transe_score", "48 md5 component terms fold into one JVM projection: no python stage; distinct is the only exchange"),
    ("robots_txt_fetch_policy", "per-host windows over tiny robots files; |hosts|-sized rules table broadcast onto page-scale URLs (BroadcastHashJoin)"),
    ("cdx_fetch_list", "line regex + from_json stay narrow JVM (no python); digest dedupe is the ONLY exchange, struct-min map-side combined"),
    ("dsir_importance_weights", "≤4096-row bucket log-ratio table broadcast onto the token stream; token-keyed aggs partial map-side; no corpus re-scan"),
    ("minhash_incremental_delta", "delta bands join the band store on fixed-width (band, bhash) keys; signatures re-join candidate-sized; historical text never read"),
    ("kg_link_prediction", "wedge join keyed on the shared neighbor z (fan-out Σdeg², the triangle bound); exchanges carry (z, u, deg) rows only; existing-edge removal is one anti-join"),
    ("kg_triple_extent", "ONE map-side-combinable aggregate keyed on the triple (partial min/max/count before the exchange); no window, no sort"),
    ("mention_disambiguation", "anchor-keyed totals join + anchor-PARTITIONED row_number (never a global window)"),
    ("kg_fact_resolution", "fact-keyed aggregate + fact-partitioned window; observation stream shuffles once"),
    ("kg_source_reliability", "majority argmax runs over DISTINCT (fact, obj) counts, not the observation stream; host rollup map-side combines into |hosts| rows"),
    ("passage_windows_overlap", "one split + sequence/slice expansion inside codegen (tokens bound once): no python stage, no exchange"),
    ("frontier_politeness_budget", "host-partitioned row_number over the frontier — never a global window"),
    ("deepwalk_skipgram_pairs", "walk-keyed self-join (per-walk fan-out ≤ length×2w); co-occurrence aggregate map-side combines into the pair vocabulary"),
    ("jsonld_triples", "script-block regex + from_json + struct emission are ONE narrow JVM projection: no python stage, no exchange"),
    ("structured_entity_stats", "JSON-LD ∪ infobox are two projections of the SAME page scan; the per-entity aggregate is the only exchange (map-side combined)"),
    ("kg_transe_eval", "energies are pure-JVM md5 folds; one exchange groups the ≤8 negatives per triple, per-pred agg map-side combines into |relations| keys"),
    ("bpe_encode_corpus", "merge folds run once per DISTINCT word (vocab exchange); the token join keys on the word; per-doc agg map-side combines"),
    ("rss_atom_entries", "entry blocks + field extraction are pure JVM regex/array expressions: no python stage, no exchange"),
    ("quantity_facts", "three regex projections concat into one array before the explode; decimal math in codegen: no python stage, no exchange"),
    ("geo_nearby_pairs", "cell-blocked self-join: exchanges carry (id, lat, lon, cell) rows only (9x points, never a cross product); verify is a JVM filter"),
    ("redirect_resolution", "pointer halving: log2(max_chain) self-join rounds on fixed-width (node, ptr, dist) state — never per-hop walks"),
    ("hearst_hypernyms", "two regex projections concat into one array before the explode: no python stage, no shuffle"),
    ("entity_salience", "mention rollup keyed on (doc, surface) + doc-PARTITIONED rank window (never global)"),
    ("hreflang_clusters", "per-attribute regex over extracted link tags stays narrow; components run on the |alternate-links|-sized edge set, not the corpus"),
    ("microdata_triples", "scope/property regex + array transforms are ONE narrow JVM projection: no python stage, no exchange"),
    ("kg_predicate_paraphrases", "candidates from the (subj, obj)-keyed self-join (wedge fan-out); sizes join |preds|-scale — never a predicate cross product"),
    ("crosslingual_aliases", "url-keyed members join, then a (cluster, pred, obj)-keyed self-join; language-variant objects never match so the fan-out stays per-fact"),
    ("url_template_mining", "host/template classification is narrow JVM; the (host, template) aggregate is the ONLY exchange (map-side combined, route-sized keys)"),
    ("readability_scores", "word/sentence/syllable counts + both scores are ONE pure-JVM expression stage: no python stage, no exchange"),
    ("ccnet_perplexity_buckets", "per-language tercile thresholds (|langs| rows) broadcast back; bucket CASE is a narrow projection — no per-language sort window"),
    ("kg_extraction_eval", "distinct + tp semi-join share the triple key; per-predicate aggregates map-side combine into |relations| keys"),
    ("kg_attribute_merge", "stop-facts (df > max_df) dropped BEFORE the (pred, obj)-keyed wedge join — fan-out bounded by max_df²; sizes re-join subject-keyed"),
    ("html_list_triples", "two same-pattern regexp_extract_all zipped by index: ONE narrow JVM projection, no python stage, no exchange"),
    ("mention_bursts", "ONE map-side-combinable (entity, day) aggregate + entity-PARTITIONED RANGE window — never a global window"),
    ("kg_literal_datatypes", "narrow JVM regex classification + ONE groupBy onto |preds × 7| keys; per-pred windows over ≤7 rows each"),
    ("appositive_isa", "one regex projection over the chunk scan: no python stage, no shuffle"),
    ("homograph_spoof_pairs", "skeleton translate is narrow; the self-join keys on the skeleton with homograph-family-sized fan-out"),
    ("host_cocitation_pairs", "hub sources dropped BEFORE the src-keyed wedge join; degrees re-join item-keyed; aggregates map-side combine"),
    ("kg_scc_bounded", "bounded BFS closure + ONE transpose semi-join on (src, dst); min/count aggregate map-side combines per node"),
    ("kg_entity_timeline", "distinct facts + ONE subj-keyed groupBy with sorted-struct arrays — no window, payload bounded by biography length"),
    ("soft404_detect", "title pull + tag strip + marker rlike fused in WholeStageCodegen: no python stage, no exchange"),
    ("according_to_claims", "one zipped regexp_extract_all pair: no python stage, no exchange"),
    ("entity_authority", "|hosts|-sized rank table broadcast onto the mention stream; ONE map-side-combinable entity aggregate"),
    ("anchor_typed_edges", "subject carried through the anchor explode as a scalar (carry=) — no self-join, no page-scale broadcast; pattern CASE pure JVM"),
    ("domain_rollup", "domain extraction narrow; ONE map-side-combinable groupBy onto |domains| keys carrying url digests, never pages"),
    ("declared_lang_mismatch", "attr pull + tag strip + stopword vote are one narrow JVM stage: no python, no exchange"),
    ("kg_ktruss", "per-round support from triangle-explode + map-side count; localCheckpoint lineage cuts (3-way join grows the plan ~3^round under persist)"),
    ("kg_ego_subgraph", "frontier BFS with per-hop localCheckpoint; visited stays (node, hops); induced join keys each endpoint"),
    ("kg_void_stats", "ONE ROLLUP aggregate onto |preds|+1 keys over distinct triples — no second scan, no window"),
    ("sitemap_index_expand", "ONE regexp_extract_all narrow projection: no python stage, no exchange"),
    ("kg_fact_confidence", "|hosts|-sized reliability table broadcast onto distinct (host, fact) votes; per-fact rollup map-side combines"),
    ("node2vec_walks", "per step: state joins the neighbor table twice (node-keyed); weight expansion multiplies a neighbor LIST, never the corpus; localCheckpoint per step"),
    ("host_trustrank_seeded", "seeded teleport rides the node frame (no per-step extra join); localCheckpoint per round — same shape as plain pagerank"),
    ("containment_syndication_pairs", "candidate self-join carries (id, 8-byte xxhash64 fp) only; full shingle arrays re-join candidate-sized"),
    ("kg_truthfinder_facts", "per round: |hosts| trust frame broadcast onto votes + two fact-keyed map-side-combinable aggs"),
    ("fellegi_sunter_linkage", "ONE 1-row m/u count aggregate broadcast back; likelihood scoring is pure JVM expressions on the pair stream"),
    ("kg_term_dictionary", "dense global ids via range exchange + per-partition offsets — no single-partition window"),
    ("wikitext_infobox_triples", "lineSep='</page>' splittable dump scan; extraction is one narrow JVM regex projection"),
    ("host_harmonic_centrality", "per hop: one relax join + one min-agg on the host-graph-sized dist frame; localCheckpoint frontier"),
    ("length_outliers_mad", "two t-digest percentile aggregates + two broadcast |groups| joins; the row stream never shuffles"),
    ("layout_template_census", "fingerprint is one flat codegen'd expression (60 unrolled bit votes); census aggregate map-side combines"),
    ("kg_modularity", "labels broadcast onto the canonical edge set twice; all aggregates label-keyed and map-side combinable; zero float math"),
    ("host_spam_mass", "ONE persisted host edge set feeds both rank recurrences; pr/tr aligned by a single host-graph-sized join; one IEEE division step"),
    ("kg_bgp_minus", "each MINUS group is one left-anti join whose build side is the DISTINCT shared-var projection (AQE broadcasts it)"),
    ("kg_allen_relations", "ONE subject-keyed self-join; the 13-way CASE is pure JVM — quadratic only inside a subject's interval set"),
    ("web_bowtie_structure", "SCC closure localCheckpoints before the 4-way fan-out; reachability closures stay one-column node SETS; class flags are broadcast-sized semi-join markers"),
    ("colist_expansion", "seed list literal-broadcast; both aggregates map-side combine on the item; the LIST stays the join key — no item×item blow-up"),
    ("snapshot_line_diff", "ONE url-keyed exchange with map-side min/max struct combine; line-set diff is JVM array ops on the two endpoint texts only"),
    ("host_eccentricity", "closure per-hop localCheckpoint; final max/count aggregate map-side combines per source"),
    ("host_stress_centrality", "σ DP one level join per hop (localCheckpoint); through-v join keys on v with |reach|² fan-out on the CONTRACTED graph; pure BIGINT"),
    ("host_anf_hyperball", "one node-keyed exchange of fixed-width (node, HLL sketch) rows per round + hll_union_agg map-side combine"),
    ("ngram_novelty_curve", "election shuffle carries (xxhash64 gram, ts, id) — gram text never rides an exchange; min-struct and both rollups map-side combine"),
    ("kg_condensation", "two label joins contract edges; level relaxation runs on the COMPONENT graph with localCheckpoint + fixpoint early-exit"),
    ("snm_candidate_pairs", "global sort via range-Exchange rank (no single-partition window); neighborhood join is ONE rank+d equi-join carrying (id, rank) only"),
    ("image_dhash_near_dup", "dHash band join carries (id, dhash, band, bhash) fixed-width rows off ONE posexplode; verify is JVM xor+bit_count — no python past the decode stage"),
    ("training_mix_pipeline", "benchmark grams + source rates broadcast; corpus exchanges = digest keeper election + shard packing groupBy; python sees (shard,id,n_tokens) only"),
    ("mobile_variant_clusters", "key + variant flag are narrow JVM regex; ONE exchange with map-side count/min-struct combine"),
    ("wand_topk_pruned", "UB pass over term postings + (id, dl) norms; θ and bound tables 1-row/|q|-row broadcasts; full scoring runs on SURVIVORS only; top-k is TakeOrderedAndProject"),
    ("kg_scd2_history", "every Window is DELTA-sized and key-partitioned (lag/lead on the batch); the store appears only in key joins — closed history never moves"),
    ("video_frame_stats", "ONE mapInPandas decode stage, explode AFTER decode (binary deserialized once per clip); no exchange"),
    ("host_simrank_3", "per round: two edge equi-joins + ONE pair-keyed map-side-combinable aggregate; identity∪update localCheckpointed (lineage cut) — pair frame holds co-in-neighbor pairs only, never n²"),
    ("ir_ranking_eval", "one (query, doc) equi-join; the ideal window runs over qrels only; all aggregates map-side combine into |queries| keys; discount weights are a literal array (no float at runtime)"),
    ("kg_construct_derived", "template instantiation is ONE explode of a 3-struct array (no K-way union fan-out); the final DISTINCT is the only added exchange after the most-bound-first BGP joins"),
    ("entity_relatedness_mw", "hub-capped wedge exchanges carry (key, item) only; N is a 1-row broadcast; the WLM ln step is a narrow projection over four exact ints"),
    ("tpch_q5_local_supplier", "region→nation→supplier collapse into ONE broadcast dim; lineitem⋈orders is the only big shuffle; same-nation predicate rides the customer equi-join"),
    ("tpch_q18_big_orders", "HAVING pre-aggregate keys on l_orderkey (map-side partial sum); the tiny survivor set broadcasts to both back-joins; top-100 is TakeOrderedAndProject"),
    ("spell_correct_terms", "levenshtein runs against the DISTINCT VOCABULARY with the |lenΔ| prefilter (broadcast nested loop of the tiny term list); per-term argmin is a window over candidates only"),
    ("prf_query_expansion", "feedback-doc ids (≤ k_docs rows) broadcast back onto the postings; expansion aggregates feedback postings only, never the corpus"),
    ("copula_isa_polarity", "one regexp_extract_all projection + in-row zip/explode: no python stage, no shuffle"),
    ("xml_native_roundtrip", "V2 XML scan with an EXPLICIT schema — no inference pre-scan pass; typed attribute projection"),
    ("rrf_fusion_topk", "fusion aggregates ONLY the two ≤20-row arm outputs (each arm keeps its own broadcast-term plan); rank windows run on already-limited frames"),
    ("epoch_budget_waterfill", "single-partition ordering window is REGISTRY-sized by construction (sources, not corpus); the two stats frames broadcast"),
    ("span_corruption_t5", "ONE F.aggregate fold inside the projection: zero shuffle, zero python — corruption at scan speed"),
    ("collective_entity_linking", "context join is doc-keyed (per-page quadratic only); relatedness joins on the unordered pair key; argmax is a mention-partitioned window"),
    ("fim_transform_psm", "mode coin + two md5 cuts + three array slices in ONE codegen projection: zero shuffle, zero python — FIM at scan speed"),
    ("kg_inverse_predicates", "reversed self-join exchanges key on the ARGUMENT pair (one side pre-swapped); sizes join back broadcast-sized; never a predicate cross product"),
    ("preference_pairs_crawl", "ONE url-keyed hash exchange feeds the lag window; no global sort, no second shuffle"),
    ("pq_adc_topk", "codebook + LUT broadcast (BroadcastNestedLoopJoin over ≤16 rows); per-(vector,subspace) argmin via WindowGroupLimit partial bottom-1; top-k is TakeOrderedAndProject; final rank window is k-rows by construction"),
    ("classifier_calibration_bins", "one exchange onto ≤ n_bins keys (map-side combine); the ECE total aggregates the 10-row bin frame"),
    ("click_model_pbm", "ONE (query, doc)-keyed map-side-combinable aggregate; examination mass folds into the same exchange (lcm div pos is a narrow projection)"),
    ("kg_rdf_lists", "bounded breadth-parallel chain walk: per-round joins reuse the persisted first/rest maps, frontier localCheckpointed (linear lineage); rounds = max list length"),
    ("dawid_skene_round1", "two map-side-combinable exchanges ((item,label) votes, annotator agreement); accuracy table broadcast back; elections are windows over ≤|labels| rows"),
]


def _stage_totals(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over completed stages."""
    app_id = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n} B"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        "plans",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    queries = entrymod.queries()
    out = [
        "# PLANS — formatted physical plans (auto-generated by tools/dump_plans.py)",
        "",
        f"Source scale: `{sf_dir}`.  Regenerate after plan-affecting changes.",
        "Measured shuffle volume = Σ shuffleWrite/Read bytes over the query's",
        "completed stages (REST API), one execution, noop sink — a fattened",
        "exchange regresses this number even when the plan shape looks the same.",
        "",
    ]
    for name, claim in SHOWN:
        # construct ONCE, before the measurement window: some builders run
        # driver-side jobs (e.g. fetching the query vector), whose stages
        # must not leak into the measured delta
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        w0, r0 = _stage_totals(spark)
        df.write.format("noop").mode("overwrite").save()
        time.sleep(2.0)  # let the listener flush stage metrics
        w1, r1 = _stage_totals(spark)
        out.append(f"## {name}")
        out.append(f"**Expected property:** {claim}")
        out.append(
            f"**Measured shuffle:** write {_fmt_bytes(w1 - w0)}, read {_fmt_bytes(r1 - r0)}"
        )
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWN)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
