"""KG query layer over the materialized triple store: basic-graph-pattern
matching, bounded transitive closure, triangle enumeration, entity typing.

These are NEW first-class operators (the reference stops at vector/fulltext
retrieval over chunks — `python/aiwhisprQueryServices.py` — and has no triple
store); they are the canonical downstream consumers of the (subj, pred, obj)
table this engine materializes, i.e. what a user actually runs against a KG.

Spark-first shapes, chosen per operator for the 100 TB triple table:

* **BGP match** — each triple pattern compiles to a filtered/projected scan of
  the SAME triples DataFrame (constant terms → pushed-down predicates; Catalyst
  prunes to the 3 columns).  Patterns join most-selective-first (bound-term
  count); the join keys are the shared variables, so each step is one
  hash-join keyed on entity ids.  At scale the bound-predicate scans are tiny
  fractions of the table (predicate pushdown into parquet row groups) and AQE
  converts the small sides to broadcast at runtime — no size guessing here.
* **Transitive closure** — frontier BFS: per hop, ONE shuffle (frontier ⋈
  edges on the hop key) plus an anti-join against the visited set, which also
  makes the per-pair hop count the MINIMUM by construction.  Each hop is
  localCheckpoint-ed: persist alone truncates recompute but the LOGICAL plan
  still nests ~3× per hop and explain-string generation OOMs at 6+ hops.
  Early-stops on an empty frontier.  Visited set stays (src, dst) pairs —
  never widens with payload columns.
* **Triangles** — canonical undirected edge set (least, greatest) built once,
  then the standard ordered 3-join (a<b<c enumerates each triangle exactly
  once).  Join fan-out is bounded by degree^2 of the hub nodes; for a skewed
  100 TB graph, pre-filter hubs by degree cap or salt (operators/skew.py) —
  the edge build keys the joins so AQE's skew-join split applies.
* **Entity typing** — pure relational: one groupBy over the mention position
  flags (place/person evidence from predicate positions, org/person evidence
  from the surface form), then a CASE precedence.  No python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Match a basic graph pattern (conjunctive triple patterns, SPARQL-BGP
    style) against a (subj, pred, obj) DataFrame.

    ``patterns`` terms starting with ``?`` are variables; anything else is a
    constant.  Returns one column per distinct variable (name without the
    ``?``), DISTINCT over the variable bindings.

    Join order: patterns with more bound constants first (cheapest scans
    drive the probe side); ties keep the author's order.  Patterns sharing no
    variable with the accumulated bindings fall back to a cross join (rare,
    and semantically required).
    """
    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")
    cols = (subj_col, pred_col, obj_col)

    def compile_one(pat: tuple[str, str, str]) -> tuple[DataFrame, set[str]]:
        df = triples
        variables: dict[str, str] = {}  # var name -> first column bound to it
        for term, col in zip(pat, cols):
            if _is_var(term):
                name = term[1:]
                if name in variables:
                    # repeated variable inside one pattern: equality filter
                    df = df.filter(F.col(col) == F.col(variables[name]))
                else:
                    variables[name] = col
            else:
                df = df.filter(F.col(col) == F.lit(term))
        out = df.select([F.col(c).alias(v) for v, c in variables.items()])
        return out, set(variables)

    # most-bound-first, stable
    order = sorted(
        range(len(patterns)),
        key=lambda i: (-sum(0 if _is_var(t) else 1 for t in patterns[i]), i),
    )
    acc: DataFrame | None = None
    bound: set[str] = set()
    for i in order:
        df, vs = compile_one(patterns[i])
        if acc is None:
            acc, bound = df, vs
            continue
        shared = sorted(bound & vs)
        if shared:
            acc = acc.join(df, on=shared, how="inner")
        else:
            acc = acc.crossJoin(df)
        bound |= vs
    assert acc is not None
    return acc.distinct()


def bgp_aggregate(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_vars: list[str],
    counts: dict[str, str],
    having_min: int | None = None,
) -> DataFrame:
    """SPARQL 1.1 aggregate query over a basic graph pattern: GROUP BY
    ``group_vars`` over the :func:`bgp_match` bindings with COUNT(DISTINCT
    ?v) aggregates (``counts``: output column → variable name), and an
    optional HAVING floor on the FIRST aggregate — the `SELECT ?city
    (COUNT(DISTINCT ?x) AS ?n) … GROUP BY ?city HAVING (?n ≥ k)` analytics
    surface on top of the pattern matcher.

    Scale shape: the BGP join plan is bgp_match's (most-bound-first);
    the aggregate adds ONE map-side-combinable exchange keyed on the group
    variables — distinct-counts partial-aggregate per map side."""
    if not group_vars:
        raise ValueError("bgp_aggregate needs at least one group variable")
    if not counts:
        raise ValueError("bgp_aggregate needs at least one aggregate")
    m = bgp_match(triples, patterns)
    aggs = [
        F.countDistinct(var).cast("long").alias(out) for out, var in counts.items()
    ]
    out = m.groupBy(*group_vars).agg(*aggs)
    if having_min is not None:
        out = out.filter(F.col(next(iter(counts))) >= having_min)
    return out


def bgp_match_optional(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    optionals: list[list[tuple[str, str, str]]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL OPTIONAL semantics over :func:`bgp_match` — documented subset:
    the required ``patterns`` bind as usual, then each optional group
    left-joins on the variables it shares with the REQUIRED bindings; rows
    without an optional match survive with NULL optional columns.

    Each optional group must share ≥1 variable with the required patterns
    and must NOT share variables with a previous optional group: SPARQL's
    left-to-right compatible-mapping semantics treat an unbound variable as
    compatible with anything, while a Spark NULL join key never matches —
    chained optionals keyed on optional-bound variables would silently
    diverge, so they raise instead.

    100 TB shape: same as bgp_match (bound-constant scans, AQE broadcast),
    plus one left hash-join per optional group keyed on the shared entity
    variables."""
    base = bgp_match(triples, patterns, subj_col, pred_col, obj_col)
    required_vars = set(base.columns)
    for group in optionals:
        opt = bgp_match(triples, group, subj_col, pred_col, obj_col)
        opt_only = (set(base.columns) - required_vars) & set(opt.columns)
        if opt_only:
            raise ValueError(
                "optional group re-binds variables of a previous optional "
                f"({sorted(opt_only)}) — outside the documented subset "
                "(NULL join keys diverge from SPARQL compatible mappings)"
            )
        shared = sorted(required_vars & set(opt.columns))
        if not shared:
            raise ValueError(
                "optional group shares no variable with the required pattern"
            )
        base = base.join(opt, on=shared, how="left")
    return base


def bgp_match_minus(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    minus: list[list[tuple[str, str, str]]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL MINUS over :func:`bgp_match` — documented subset: the required
    ``patterns`` bind as usual, then each MINUS group removes bindings
    compatible with any of its solutions.  Every group must share ≥1
    variable with the required patterns: SPARQL defines MINUS with disjoint
    domains as a silent no-op (nothing is removed), which in a data pipeline
    is invariably an authoring bug, so it raises instead.

    bgp_match bindings are never NULL, so SPARQL's compatible-mapping test
    degenerates to equality on the shared variables — exactly one left-anti
    hash-join per MINUS group (in this subset MINUS and FILTER NOT EXISTS
    coincide).

    100 TB shape: same bound-constant scans as bgp_match; each group adds
    one anti-join keyed on entity variables, its build side pre-shrunk to
    the DISTINCT shared-variable projection (AQE broadcasts small groups)."""
    base = bgp_match(triples, patterns, subj_col, pred_col, obj_col)
    required_vars = set(base.columns)
    for group in minus:
        m = bgp_match(triples, group, subj_col, pred_col, obj_col)
        shared = sorted(required_vars & set(m.columns))
        if not shared:
            raise ValueError(
                "MINUS group shares no variable with the required pattern — "
                "SPARQL's disjoint-domain MINUS removes nothing; refuse the "
                "silent no-op"
            )
        base = base.join(m.select(*shared).distinct(), on=shared, how="left_anti")
    return base


def property_path(
    triples: DataFrame,
    path: str,
    max_hops: int = 4,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL property-path evaluation (documented subset) over the triple
    store: ``path`` is ``/``-separated steps, each step one of

    * ``pred``            — follow the predicate forward
    * ``pred1|pred2``     — alternation (either predicate)
    * ``^pred``           — inverse (object → subject)
    * ``pred+`` (or ``(p1|p2)+``, ``^(p1|p2)+``) — one-or-more, bounded by
      ``max_hops`` (the scale-honest form of SPARQL's unbounded ``+``;
      cycle-induced self-pairs are KEPT, matching :func:`transitive_closure`)

    Returns DISTINCT (src, dst) pairs connected by the whole path.

    100 TB shape: each step is a predicate-pushed scan of the triple table
    joined on the entity id (AQE broadcasts small steps); ``+`` steps reuse
    the frontier-BFS closure with per-hop lineage cuts."""
    steps = [s for s in path.split("/") if s]
    if not steps:
        raise ValueError("property_path needs at least one step")
    cur: DataFrame | None = None
    for step in steps:
        plus = step.endswith("+")
        name = step[:-1] if plus else step
        # '^' strips BEFORE the paren strip so '^(p1|p2)' parses; inverse of
        # a closure equals closure of the inverse, so the order is sound for
        # '^(p1|p2)+' too.
        inv = name.startswith("^")
        if inv:
            name = name[1:]
        if name.startswith("(") and name.endswith(")"):
            name = name[1:-1]
        alts = [a for a in name.split("|") if a]
        if not alts or any(set("()^+|") & set(a) for a in alts):
            raise ValueError(f"unsupported step in property path: {step!r}")
        base = triples.filter(F.col(pred_col).isin(alts))
        if inv:
            e = base.select(
                F.col(obj_col).alias("src"), F.col(subj_col).alias("dst")
            )
        else:
            e = base.select(
                F.col(subj_col).alias("src"), F.col(obj_col).alias("dst")
            )
        if plus:
            e = transitive_closure(e, max_hops).select("src", "dst")
        if cur is None:
            cur = e.distinct()
        else:
            cur = (
                cur.alias("l")
                .join(e.alias("r"), F.col("l.dst") == F.col("r.src"))
                .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
                .distinct()
            )
    assert cur is not None
    return cur


def transitive_closure(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, dst, hops) for every pair reachable in ≤ ``max_hops`` directed
    steps, where ``hops`` is the MINIMUM path length (BFS order + anti-join
    against the visited set guarantee it).  Self-pairs appear only if a cycle
    returns to the start within the bound.  Deterministic for a given edge
    set.  Intermediates are unpersisted before return."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    # localCheckpoint per hop, NOT persist+count: persist truncates the
    # physical recompute but the LOGICAL plan still nests ~3× per hop
    # (frontier⋈e anti-joined against the growing union), and at 6+ hops
    # the explain-string generation alone OOMs the driver — the hits()
    # 3^round lesson applies to the closure too
    frontier = e.withColumn("hops", F.lit(1)).localCheckpoint()
    result = frontier
    for k in range(2, max_hops + 1):
        nxt = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .join(result.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("hops", F.lit(k))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return result.select("src", "dst", "hops")


def triangle_enumerate(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Every undirected triangle (a, b, c) with a < b < c, each exactly once.

    Direction and multiplicity of the input are erased first (canonical
    least/greatest + distinct); self-loops dropped.  ``assume_canonical``
    skips that normalization when the caller guarantees a<b, loop-free,
    distinct input — iterative callers (k_truss) would otherwise pay a
    no-op exchange+dedup of the full edge set EVERY round."""
    if assume_canonical:
        ee = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    else:
        ee = (
            edges.select(
                F.least(F.col(src_col), F.col(dst_col)).alias("a"),
                F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    e1 = ee.alias("e1")
    e2 = ee.alias("e2")
    e3 = ee.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )


def local_clustering_coefficient(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, deg, n_tri, lcc_i) over the canonical undirected edge set:
    local clustering coefficient ``lcc = 2·tri(v) / (deg(v)·(deg(v)−1))``
    as the EXACT integer ``lcc_i = ⌊scale·2·tri / (deg·(deg−1))⌋`` (deg<2 →
    0) — how close each entity's neighborhood is to a clique, the standard
    structure signal for hub-vs-clique disambiguation and ER-blocking
    diagnostics on the KG.

    Composition of :func:`triangle_enumerate` (triangles explode to their 3
    corners, one map-side-combinable count) with the degree aggregate —
    both keyed on node, pure integer math end-to-end.  Scale cost is the
    triangle join itself (the standard bound |E|^1.5); everything after is
    node-cardinality."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        ee.select(F.col("a").alias("node"))
        .unionByName(ee.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri_corners = (
        triangle_enumerate(ee, "a", "b", assume_canonical=True)
        .select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.join(tri_corners, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    f"CAST(({2 * int(scale)} * coalesce(n_tri, 0))"
                    " div (deg * (deg - 1)) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_i"),
        )
    )


def community_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-community modularity decomposition of a node→label partition over
    the canonical undirected edge set: (label, n_nodes, e_in, d_sum, m,
    q_num) where ``q_num = 4·m·e_in − d_sum²`` — community c's EXACT-integer
    numerator of the Newman modularity term ``e_c/m − (d_c/2m)²`` over the
    common denominator ``4m²``, so ``Q = Σ q_num / (4m²)`` with zero float
    math in either engine (the quality gate for LPA/Louvain-style community
    output: Q ≈ 0 means the partition explains nothing).

    ``labels`` is any (node, label) frame — typically
    :func:`label_propagation_communities`.  Nodes missing from ``labels``
    are dropped from d_sum and their edges from e_in (partial partitions
    score only what they cover).  Scale shape: two label joins keyed on
    node (broadcastable — the label table is node-cardinality), then
    label-keyed map-side-combinable aggregates; the 1-row m frame rides as
    a broadcast cross join, never a driver collect."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    m = ee.agg(F.count(F.lit(1)).cast("long").alias("m"))
    lab = labels.select(F.col("node"), F.col("label")).distinct()
    deg = (
        ee.select(F.col("a").alias("node"))
        .unionByName(ee.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    comm = (
        lab.join(deg, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("d_sum"),
        )
    )
    ein = (
        ee.join(lab.select(F.col("node").alias("a"), F.col("label").alias("la")), "a")
        .join(lab.select(F.col("node").alias("b"), F.col("label").alias("lb")), "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    out = (
        comm.join(ein, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d_sum",
            "m",
            (
                4 * F.col("m") * F.coalesce("e_in", F.lit(0))
                - F.col("d_sum") * F.col("d_sum")
            )
            .cast("long")
            .alias("q_num"),
        )
    )
    out = out.localCheckpoint()  # release ee's cache before returning
    ee.unpersist()
    return out


# surface-form org suffixes (shared with canonicalization's corp-suffix notion)
_ORG_SUFFIX_RE = r"\b(Corp|Corporation|Inc|Ltd|LLC|GmbH|Co|Company)$"
# "Ada Byron"-shaped: exactly two capitalized alpha words, no digits
_PERSON_NAME_RE = r"^[A-Z][a-z]+ [A-Z][a-z]+$"
_PLACE_PREDS = ("based_in", "located_in")
_PERSON_OBJ_PREDS = ("founded_by", "works_for")


def type_entities(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Rule-based (entity, etype) over every distinct mention surface in the
    triple store, combining RELATIONAL evidence (which predicate positions the
    mention occupies) with SURFACE evidence (corp suffix, person-name shape).

    Precedence (first match wins; mirrors the SQL oracle exactly):
      1. place  — ever the object of based_in / located_in
      2. person — ever the object of founded_by / works_for
      3. org    — surface ends with a corporate suffix
      4. person — surface is two capitalized alpha words
      5. other
    """
    subj = triples.select(
        F.col(subj_col).alias("entity"),
        F.lit(False).alias("pl"),
        F.lit(False).alias("pe"),
    )
    obj = triples.select(
        F.col(obj_col).alias("entity"),
        F.col(pred_col).isin(*_PLACE_PREDS).alias("pl"),
        F.col(pred_col).isin(*_PERSON_OBJ_PREDS).alias("pe"),
    )
    flags = (
        subj.unionByName(obj)
        .groupBy("entity")
        .agg(F.max("pl").alias("is_place"), F.max("pe").alias("is_person_rel"))
    )
    etype = (
        F.when(F.col("is_place"), F.lit("place"))
        .when(F.col("is_person_rel"), F.lit("person"))
        .when(F.col("entity").rlike(_ORG_SUFFIX_RE), F.lit("org"))
        .when(F.col("entity").rlike(_PERSON_NAME_RE), F.lit("person"))
        .otherwise(F.lit("other"))
    )
    return flags.select("entity", etype.alias("etype"))


def predicate_profile(
    triples: DataFrame,
    types: DataFrame | None = None,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Schema/ontology induction over the triple store:
    (pred, subj_type, obj_type, n_triples, n_subj, n_obj) — the observed
    domain/range signature of every predicate, the table a KG curator reads
    to find extraction noise (a `based_in` edge whose object types as
    `person` is a wrong triple, not a new ontology fact).

    ``types`` defaults to :func:`type_entities` over the same store; pass a
    curated (entity, etype) table to profile against a fixed ontology.

    100 TB shape: the type table is entity-cardinality (orders smaller than
    the triple stream) — broadcast when small, else two hash joins keyed on
    the uniform entity id; the final aggregate is map-side combinable on a
    ~|preds|·|types|² key space."""
    if types is None:
        types = type_entities(triples, subj_col, pred_col, obj_col)
    t = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    st = types.select(F.col("entity").alias("subj"), F.col("etype").alias("subj_type"))
    ot = types.select(F.col("entity").alias("obj"), F.col("etype").alias("obj_type"))
    return (
        t.join(st, "subj")
        .join(ot, "obj")
        .groupBy("pred", "subj_type", "obj_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.countDistinct("subj").cast("long").alias("n_subj"),
            F.countDistinct("obj").cast("long").alias("n_obj"),
        )
    )


def link_prediction_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Common-neighbor link prediction over the undirected entity graph:
    for every NON-adjacent pair (a < b) sharing at least one neighbor,

      n_common   = |Γ(a) ∩ Γ(b)|
      ra_score_i = Σ_z floor(scale / deg(z))      (Resource Allocation index)
      aa_score   = Σ_z 1 / ln(deg(z))             (Adamic-Adar, informational)

    The RA sum is INTEGER-EXACT (each term floors before summing), so it is
    reproducible bit-for-bit in any engine regardless of float summation
    order — the same scaled-int discipline as the rest of the gates; AA is
    the classic float twin, monotone-comparable but not hash-gateable.
    Wedge z needs deg(z) ≥ 2, so neither divisor is ever 0 (ln(1) cannot
    appear).

    Scale shape: candidates come from the WEDGE join (neighbor lists
    self-joined on the common neighbor z), never a pair cross-product — the
    exchange is keyed on z and its fan-out is Σ deg(z)², the same bound as
    triangle counting; skewed hubs take the degree-cap/salting treatment
    (operators/skew.py).  Existing edges drop with one anti-join."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = ee.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        ee.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # wedge: z's neighbor list joined to itself → (u < w) share neighbor z
    zn = nbrs.select(F.col("node").alias("z"), F.col("nbr").alias("u")).join(
        deg.withColumnRenamed("node", "z"), "z"
    )
    wedges = (
        zn.alias("l")
        .join(zn.alias("r"), (F.col("l.z") == F.col("r.z")) & (F.col("l.u") < F.col("r.u")))
        .select(
            F.col("l.u").alias("a"),
            F.col("r.u").alias("b"),
            F.col("l.deg").alias("zdeg"),
        )
    )
    # `div` = true integer division (float '/'+floor can misround at exact
    # quotients; DuckDB twin uses '//')
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum(F.expr(f"{int(scale)} div zdeg")).cast("long").alias("ra_score_i"),
        F.sum(F.lit(1.0) / F.log(F.col("zdeg"))).alias("aa_score"),
    )
    return scored.join(ee, ["a", "b"], "left_anti")


def label_propagation_communities(
    edges: DataFrame,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic SYNCHRONOUS label propagation (community detection, NOT
    the connected-components variant in operators/canonicalize.py): every
    node starts with its own id as label; each round every node adopts the
    most frequent label among its NEIGHBORS, ties broken by the smaller
    label; isolated behavior is undefined here because every node in an edge
    list has ≥1 neighbor.  Fixed round count + deterministic tie-break make
    the output engine-reproducible (a DuckDB twin unrolls the same rounds as
    chained CTEs) — the usual async/random-order LPA is not.

    Scale shape per round: one exchange keyed on node for the neighbor-label
    count, one row_number window per node (partitioned — never global).
    State is (node, label) only; the neighbor list is re-derived from the
    edge frame each round rather than carried as an array payload."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = ee.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        ee.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    ).persist()
    labels = nbrs.select("node").distinct().withColumn("label", F.col("node"))
    from pyspark.sql.window import Window

    prev = None
    for _ in range(rounds):
        counted = (
            nbrs.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        labels = (
            counted.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            .persist()
        )
        labels.count()  # cut lineage per round (iterative-plan discipline)
        if prev is not None:
            prev.unpersist()
        prev = labels
    # self-contained copy so the final round's cache (and nbrs) can be
    # released instead of leaking one persisted frame per call
    out = labels.localCheckpoint()
    labels.unpersist()
    nbrs.unpersist()
    return out


def strongly_connected_components(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-diameter SCC: nodes a, b share a component iff each reaches
    the other within ``max_hops`` directed steps — mutual membership in the
    :func:`transitive_closure` (redirect rings, mirror farms and template
    link loops all have tiny diameters; the bound is a query parameter with
    the same contract as the closure's).  Component id = the component's
    MINIMUM node, so output is deterministic: (node, scc_id, scc_size) for
    EVERY node of the edge list (non-cyclic nodes are singleton components
    of themselves — reported, not dropped: "not in a loop" is the common
    healthy answer).

    Correctness note: mutual reachability is transitive on ITS OWN pairs
    (if a↔b and b↔c then a↔c via paths ≤ 2·max_hops — within the bound only
    when the component's diameter is; hence the documented bound contract),
    so min-over-mutual-neighbors is a valid component id without an extra
    CC pass: every member of an in-bound SCC mutually reaches the min node
    directly.

    100 TB shape: one bounded BFS closure (per-hop exchanges keyed on the
    frontier dst), ONE self-join of the closure against its transpose on the
    (src, dst) key, and a map-side-combinable min/count aggregate keyed on
    node.  No python, no collect.
    """
    reach = transitive_closure(edges, max_hops, src_col, dst_col).select(
        "src", "dst"
    )
    mutual = reach.join(
        reach.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    # every node is mutual with itself; union the self-pair so singletons
    # and component minima fall out of one aggregate
    member = (
        mutual.select(F.col("src").alias("node"), F.col("dst").alias("peer"))
        .unionByName(nodes.select("node", F.col("node").alias("peer")))
        # a cycle node's closure already holds its (a, a) self-pair — the
        # union would double-count it without this distinct
        .distinct()
    )
    return member.groupBy("node").agg(
        F.min("peer").alias("scc_id"),
        F.count(F.lit(1)).cast("long").alias("scc_size"),
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """k-truss decomposition (Cohen 2008): iteratively drop every edge whose
    SUPPORT (triangles containing it) falls below k-2 until fixpoint — the
    edge-level cohesion core that k-core (kcore_peel) can't give: a k-core
    keeps hub-and-spoke stars, a k-truss keeps only triangle-dense cores
    (the mirror-farm / tight-community detector on the host graph).

    Returns surviving undirected edges (a, b, support) with a < b and
    support = the edge's triangle count within the final truss.  The
    pendant-triangle cascade is real peeling: dropping outer edges strips
    the support of inner ones round by round (pinned in tests).

    100 TB shape per round: per-edge support comes from exploding each
    enumerated triangle into its 3 edges and one map-side-combinable count
    (triangle_enumerate's 2-join wedge bound) — no per-edge neighbor-set
    intersection materializes; per-round persist + count cuts lineage
    (iterative-plan discipline), early stop on a stable edge count.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    cur = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n = cur.count()

    def _support_of(frame: DataFrame) -> DataFrame:
        # cur is canonical by construction — skip triangle_enumerate's
        # per-round no-op canonicalize+distinct exchange
        tris = triangle_enumerate(
            frame, src_col="a", dst_col="b", assume_canonical=True
        )
        tri_edges = (
            tris.select(F.col("a").alias("x"), F.col("b").alias("y"))
            .unionByName(tris.select(F.col("a").alias("x"), F.col("c").alias("y")))
            .unionByName(tris.select(F.col("b").alias("x"), F.col("c").alias("y")))
        )
        support = tri_edges.groupBy("x", "y").agg(
            F.count(F.lit(1)).cast("long").alias("support")
        )
        return frame.join(
            support,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        ).select(
            "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
        )

    for _ in range(max_rounds):
        supported = _support_of(cur)
        # localCheckpoint, not persist: cur feeds the 3-way triangle join,
        # so the LOGICAL plan grows ~3^round under persist alone (the
        # graph.py::hits failure mode — analysis itself OOMs)
        nxt = supported.filter(F.col("support") >= k - 2).select("a", "b").localCheckpoint()
        m = nxt.count()
        cur = nxt
        if m == n:
            # nothing dropped this round: `supported` already IS the final
            # support view — no re-derivation pass needed on the common exit
            return supported.localCheckpoint()
        n = m
    # max_rounds exhausted mid-peel: re-derive supports over the final set
    return _support_of(cur).localCheckpoint()


def ego_subgraph(
    edges: DataFrame,
    seeds: list[str],
    radius: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Ego-network extraction — the induced subgraph within ``radius``
    UNDIRECTED hops of a seed entity set: what an entity page renders, what
    an analyst exports, the neighborhood a GNN samples.  Returns the induced
    edge list ``(a, b, a_hops, b_hops)`` (canonical a < b) where ``*_hops``
    is each endpoint's MINIMUM distance from the nearest seed (seeds = 0).
    An edge survives only when BOTH endpoints are in range — true induced
    semantics, no dangling frontier stubs.

    100 TB shape: frontier BFS with per-hop lineage cuts (localCheckpoint —
    the iterative-plan discipline); the visited set stays (node, hops); the
    final induced join keys the edge list on each endpoint.  Seeds enter as
    a literal list (entity-page requests are small by nature); a seed FRAME
    variant is the same code with the first frontier swapped in.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    nbrs = ee.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        ee.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(s, 0) for s in sorted(set(seeds))], "node string, hops int"
    ).localCheckpoint()
    frontier = visited
    for h in range(1, radius + 1):
        nxt = (
            frontier.join(nbrs, "node")
            .select(F.col("nbr").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    va = visited.select(F.col("node").alias("a"), F.col("hops").alias("a_hops"))
    vb = visited.select(F.col("node").alias("b"), F.col("hops").alias("b_hops"))
    return ee.join(va, "a").join(vb, "b").select("a", "b", "a_hops", "b_hops")


def propagate_labels_from_seeds(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """SEEDED label propagation (semi-supervised node classification, the
    Zhu/Ghahramani clamped variant): ``seeds`` is a (node, label) frame of
    known assignments — entity types from type_entities, domain categories,
    spam verdicts — and every UNLABELED node adopts, each synchronous
    round, the most frequent label among its labeled neighbors (min-label
    ties).  Seeds are CLAMPED (never change), which is what separates this
    from label_propagation_communities above: that one discovers structure,
    this one spreads ground truth.  Nodes still unreached after ``rounds``
    are reported with NULL label (visible, not dropped).

    Output: (node, label, is_seed_i).

    100 TB shape per round: one exchange keyed on node for the labeled-
    neighbor vote + a node-partitioned row_number (never global); the
    labeled set only grows, and the vote re-derives adjacency from the edge
    frame (state stays (node, label)).  localCheckpoint per round.
    """
    from pyspark.sql.window import Window

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbrs = ee.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        ee.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    ).localCheckpoint()
    seed = seeds.select(F.col("node"), F.col("label")).distinct()
    # an edge-less seed has no neighbors but is still ground truth — the
    # node universe must include it or the output silently drops it
    nodes = nbrs.select("node").unionByName(seed.select("node")).distinct()
    labeled = seed.localCheckpoint()
    for _ in range(rounds):
        votes = (
            nbrs.join(labeled.select(F.col("node").alias("nbr"), "label"), "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        adopted = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            # seeds and already-adopted nodes are clamped
            .join(labeled.select("node"), "node", "left_anti")
        )
        labeled = labeled.unionByName(adopted).localCheckpoint()
    out = (
        nodes.join(labeled, "node", "left")
        .join(
            seed.select("node", F.lit(1).alias("_s")), "node", "left"
        )
        .select(
            "node",
            "label",
            F.coalesce("_s", F.lit(0)).cast("int").alias("is_seed_i"),
        )
    )
    return out


def _reach_from(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """DISTINCT nodes reachable from the ``seeds`` node set in ≤ ``max_hops``
    directed steps (seeds included at hop 0).  Frontier BFS: one hash-join +
    anti-join per hop, localCheckpoint per round (iterative-plan
    discipline), early-stop on an exhausted frontier."""
    visited = seeds.select("node").distinct().localCheckpoint()
    frontier = visited
    for _ in range(max_hops):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def bowtie_structure(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bowtie decomposition of a directed graph (Broder et al. 2000, "Graph
    structure in the Web"): classify every node relative to the LARGEST
    strongly connected component —

    * ``CORE`` — member of the largest SCC (ties broken by minimum scc_id)
    * ``OUT``  — reachable FROM the core, not in it
    * ``IN``   — reaches the core, not in it and not already OUT
    * ``TENDRIL`` — weakly connected to the core, none of the above
      (includes Broder's tubes and both tendril kinds)
    * ``DISCONNECTED`` — everything else

    The precedence (CORE > OUT > IN > TENDRIL) is part of the contract:
    under a finite hop bound a node could appear in both the forward and
    backward bounded closures without having been merged into the core SCC
    (its round-trip exceeds the bound); the deterministic tie goes to OUT.

    All reachability shares the :func:`transitive_closure` hop-bound
    contract (``max_hops`` ≥ the weak diameter of the core's component for
    exact classes).  Returns (node, cls) for every endpoint.

    100 TB shape: the SCC pass is :func:`strongly_connected_components`;
    the three set-reachability passes are frontier BFS (per-hop exchange
    keyed on the frontier, visited set stays one string column); the final
    classification is four broadcast-sized semi-join flags over the node
    list — the closures collapse to node SETS, never pair tables."""
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    # localCheckpoint cuts the SCC closure's lineage BEFORE it fans out into
    # four consumers (core flag + three reachability seeds) — composing the
    # full closure plan four ways blows up plan-tree generation (the hits()
    # 3^round lesson), and checkpointing also evaluates the SCC pass once
    scc = strongly_connected_components(e, max_hops).localCheckpoint()
    core_id = (
        scc.select("scc_id", "scc_size")
        .distinct()
        .orderBy(F.desc("scc_size"), F.asc("scc_id"))
        .limit(1)
        .select("scc_id")
    )
    core = scc.join(F.broadcast(core_id), "scc_id").select("node").localCheckpoint()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = _reach_from(e, core, max_hops)
    bwd = _reach_from(rev, core, max_hops)
    weak = _reach_from(e.unionByName(rev).distinct(), core, max_hops)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("node", F.lit(1).alias(name))

    marked = (
        nodes.join(flag(core, "is_core"), "node", "left")
        .join(flag(fwd, "in_fwd"), "node", "left")
        .join(flag(bwd, "in_bwd"), "node", "left")
        .join(flag(weak, "in_weak"), "node", "left")
    )
    cls = (
        F.when(F.col("is_core").isNotNull(), F.lit("CORE"))
        .when(F.col("in_fwd").isNotNull(), F.lit("OUT"))
        .when(F.col("in_bwd").isNotNull(), F.lit("IN"))
        .when(F.col("in_weak").isNotNull(), F.lit("TENDRIL"))
        .otherwise(F.lit("DISCONNECTED"))
    )
    out = marked.select("node", cls.alias("cls"))
    e.unpersist()
    return out


def eccentricity_profile(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded out-eccentricity per node: (node, ecc, n_reach) where ``ecc``
    is the MAXIMUM min-hop distance to any node reached within ``max_hops``
    and ``n_reach`` the count of reached nodes (self excluded — a cycle's
    return pair doesn't inflate the radius).  diameter = max(ecc), radius =
    min(ecc) over the nodes that reach the whole component — the
    small-world panel for the contracted host graph.  Nodes reaching
    nothing don't appear (sinks have no out-eccentricity).

    Shares :func:`transitive_closure`'s hop-bound contract; one
    map-side-combinable aggregate over the closure pairs."""
    reach = transitive_closure(edges, max_hops, src_col, dst_col)
    return (
        reach.filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.max("hops").cast("long").alias("ecc"),
            F.count(F.lit(1)).cast("long").alias("n_reach"),
        )
    )


def stress_centrality(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Stress centrality (Shimbel 1953), bounded: for every node v, the
    EXACT number of shortest paths (≤ ``max_hops``) that pass THROUGH v —
    Σ over s≠v≠t of σ_st(v), where σ_st(v) = σ(s,v)·σ(v,t) when
    d(s,v)+d(v,t) = d(s,t).  The integer-exact sibling of betweenness
    (betweenness divides by σ_st, dragging float sums into the plan; stress
    ranks the same broker nodes with pure BIGINT arithmetic — the repo-wide
    exactness discipline).

    σ is counted by hop-synchronous DP: level h extends level h−1 along
    edges and keeps only pairs whose bounded min distance is exactly h, so
    closed walks never leak in (an extension from a cycle's (s,s,c) entry
    lands on a distance-1 neighbor and fails the d = c+1 check).  One
    localCheckpoint per level (iterative-plan discipline).

    100 TB shape: meant for the CONTRACTED host/entity graph like the other
    all-pairs operators (closure pairs are |V|·reach); the through-v join
    is two σ-table self-joins keyed on v plus one (s,t) dist probe — all
    map-side-combinable aggregates, no python, no floats."""
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    dist = transitive_closure(e, max_hops).localCheckpoint()
    # σ DP: level 1 = the edges themselves (every edge is a shortest path
    # of length 1), each with σ = 1
    level = (
        e.join(dist.filter(F.col("hops") == 1), ["src", "dst"], "left_semi")
        .select("src", "dst", F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint()
    )
    sigma = level.withColumn("d", F.lit(1).cast("long"))
    for h in range(2, max_hops + 1):
        dh = dist.filter(F.col("hops") == h).select("src", "dst")
        level = (
            level.alias("p")
            .join(e.alias("e"), F.col("p.dst") == F.col("e.src"))
            .select(
                F.col("p.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.col("p.sigma").alias("sigma"),
            )
            .join(dh, ["src", "dst"], "left_semi")
            .groupBy("src", "dst")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .localCheckpoint()
        )
        if level.isEmpty():
            break
        sigma = sigma.unionByName(
            level.withColumn("d", F.lit(h).cast("long"))
        ).localCheckpoint()
    sv = sigma.select(
        F.col("src").alias("s"),
        F.col("dst").alias("v"),
        F.col("sigma").alias("sigma_sv"),
        F.col("d").alias("d_sv"),
    )
    vt = sigma.select(
        F.col("src").alias("v"),
        F.col("dst").alias("t"),
        F.col("sigma").alias("sigma_vt"),
        F.col("d").alias("d_vt"),
    )
    st = dist.select(
        F.col("src").alias("s"), F.col("dst").alias("t"), F.col("hops").alias("d_st")
    )
    through = (
        sv.join(vt, "v")
        .filter((F.col("s") != F.col("t")) & (F.col("s") != F.col("v")) & (F.col("t") != F.col("v")))
        .join(st, ["s", "t"])
        .filter(F.col("d_sv") + F.col("d_vt") == F.col("d_st"))
    )
    out = through.groupBy(F.col("v").alias("node")).agg(
        F.sum(F.col("sigma_sv") * F.col("sigma_vt")).cast("long").alias("stress")
    )
    e.unpersist()
    return out


def condensation_dag(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Condensation of a directed graph: contract every bounded SCC
    (:func:`strongly_connected_components`) to its component id, drop the
    intra-component edges, and layer the resulting DAG by LONGEST-path
    level (level 0 = components with no incoming condensation edge;
    level(v) = 1 + max level over predecessors).  The level is the
    topological depth a staged web-graph computation (e.g. incremental
    rank propagation, cascade scheduling) processes components in.

    Returns (scc_id, n_members, level) for every component.  Levels are
    exact when the DAG's depth ≤ ``max_hops`` (the same bound contract as
    the SCC pass — the condensation of in-bound SCCs is acyclic, so the
    relaxation converges within depth rounds).

    100 TB shape: two label joins contract the edge list; the level
    relaxation runs on the COMPONENT graph (orders of magnitude smaller
    than the node graph), one max-agg exchange per round with
    localCheckpoint lineage cuts."""
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    scc = strongly_connected_components(e, max_hops).localCheckpoint()
    lbl = scc.select("node", "scc_id")
    ce = (
        e.join(lbl.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("scc_id", "s_id")
        .join(lbl.withColumnRenamed("node", "dst"), "dst")
        .withColumnRenamed("scc_id", "d_id")
        .select("s_id", "d_id")
        .filter(F.col("s_id") != F.col("d_id"))
        .distinct()
        .localCheckpoint()
    )
    comps = scc.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    lvl = comps.select(
        F.col("scc_id").alias("cid"), F.lit(0).cast("long").alias("level")
    ).localCheckpoint()
    for _ in range(max_hops):
        relaxed = (
            lvl.join(ce, lvl["cid"] == ce["s_id"])
            .select(F.col("d_id").alias("cid"), (F.col("level") + 1).alias("level"))
        )
        nxt = (
            lvl.unionByName(relaxed)
            .groupBy("cid")
            .agg(F.max("level").cast("long").alias("level"))
            .localCheckpoint()
        )
        # fixpoint: the relaxation is monotone and bounded by DAG depth
        if nxt.exceptAll(lvl).isEmpty():
            lvl = nxt
            break
        lvl = nxt
    e.unpersist()
    return comps.join(
        lvl.withColumnRenamed("cid", "scc_id"), "scc_id"
    ).select("scc_id", "n_members", "level")


def bgp_construct(
    triples: DataFrame,
    where: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL 1.1 CONSTRUCT: solve the WHERE basic graph pattern, then
    instantiate every ``template`` triple per solution and return the
    resulting graph as DISTINCT (subj, pred, obj) rows — set semantics per
    the spec (a CONSTRUCT result is an RDF graph, not a bag).  This is the
    rule-application primitive of KG construction: derived relations
    ("controls", "colleague_of", …) materialize as first-class triples the
    rest of the engine (canonicalize, confidence, export) consumes
    unchanged.

    Template variables must be bound by the WHERE clause (raises otherwise
    — SPARQL would silently skip the triple, which hides typos).

    100 TB shape: bindings come from ``bgp_match``'s most-bound-first join
    plan; the K template rows instantiate via ONE explode of a K-struct
    array (never a K-way union — the map-stage fan-out trap), and the final
    DISTINCT is the only additional exchange.
    """
    if not template:
        raise ValueError("bgp_construct needs at least one template triple")
    bindings = bgp_match(triples, where, subj_col, pred_col, obj_col)
    bound = set(bindings.columns)

    def term(t: str):
        if _is_var(t):
            name = t[1:]
            if name not in bound:
                raise ValueError(f"template variable ?{name} is not bound by WHERE")
            return F.col(name)
        return F.lit(t)

    structs = [
        F.struct(term(s).alias("subj"), term(p).alias("pred"), term(o).alias("obj"))
        for (s, p, o) in template
    ]
    return (
        bindings.select(F.explode(F.array(*structs)).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
        .distinct()
    )


def community_conductance(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(label, n_nodes, vol, internal_edges, cut_edges, conductance_mi) —
    per-community conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C)), the
    partition-quality metric that decides whether an LPA/Louvain community
    is a real cluster or a propagation artifact (low φ = tight community;
    the modularity twin `community_modularity` scores the PARTITION, this
    scores each community against its own boundary).

    All-integer: vol = Σ degree over members, cut = boundary edge count
    (counted once per side), 2m from one scalar agg; ``conductance_mi =
    cut·1e6 div min(vol, 2m−vol)``, −1 sentinel when the min is 0 (the
    whole-graph or empty-side community — φ undefined).

    100 TB shape: two node-keyed label joins onto the (already DISTINCT,
    canonical) edge list, then everything map-side combines onto |labels|
    keys; the 1-row 2m aggregate broadcasts.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("src"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()  # canonical undirected edge set — degrees/cuts count once
    )
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("_la"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("_lb"))
    tagged = e.join(la, "src").join(lb, "dst")
    internal = (
        tagged.filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    cut = (
        tagged.filter(F.col("_la") != F.col("_lb"))
        .select(F.col("_la").alias("label"))
        .unionByName(
            tagged.filter(F.col("_la") != F.col("_lb")).select(F.col("_lb").alias("label"))
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("cut_edges"))
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_deg"))
    )
    vol = (
        labels.join(deg, "node", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum("_deg"), F.lit(0)).cast("long").alias("vol"),
        )
    )
    two_m = e.agg((F.count(F.lit(1)) * 2).cast("long").alias("_2m"))
    return (
        vol.join(internal, "label", "left")
        .join(cut, "label", "left")
        .crossJoin(F.broadcast(two_m))
        .select(
            "label",
            "n_nodes",
            "vol",
            F.coalesce("internal_edges", F.lit(0)).cast("long").alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
            F.when(
                F.least(F.col("vol"), F.col("_2m") - F.col("vol")) > 0,
                F.expr(
                    "(coalesce(cut_edges, 0) * 1000000)"
                    " div least(vol, _2m - vol)"
                ),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("conductance_mi"),
        )
    )


def cliques_k4(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(a, b, c, d) with a<b<c<d — every 4-clique exactly once, the next
    rung above triangle_enumerate on the cohesion ladder (k-truss bounds
    edges, k-core bounds nodes; cliques are the exact dense-subgraph
    certificate ER blocking and community seeding want).

    Composition: triangles (a<b<c) extend by a 4th node d>c adjacent to
    all three — the canonical-order join means each clique materializes
    exactly once, no post-hoc dedup.

    100 TB shape: three joins keyed on node ids over the canonical edge
    set; cost is the standard output-bound clique bound (arboricity²·|E|),
    and the a<b<c<d constraint prunes each join's build side.  A hub cap
    upstream (degree filter) is the skew guard, same contract as
    _overlap_pairs."""
    ee = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("x"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    tri = triangle_enumerate(ee, "x", "y", assume_canonical=True)
    e1, e2, e3 = ee.alias("x1"), ee.alias("x2"), ee.alias("x3")
    return (
        tri.join(e1, (F.col("x1.x") == tri.a) & (F.col("x1.y") > tri.c))
        .join(e2, (F.col("x2.x") == tri.b) & (F.col("x2.y") == F.col("x1.y")))
        .join(e3, (F.col("x3.x") == tri.c) & (F.col("x3.y") == F.col("x1.y")))
        .select(tri.a, tri.b, tri.c, F.col("x1.y").alias("d"))
    )


def ppr_push_bounded(
    edges: DataFrame,
    seed: str,
    rounds: int = 4,
    eps_i: int = 100_000,
    scale: int = 100_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Approximate personalized PageRank by SYNCHRONOUS residual push
    (Andersen–Chung–Lang 2006 local clustering, batched: every round pushes
    ALL nodes whose residual exceeds the degree-proportional threshold —
    the distributed form of the sequential push loop).  Distinct from the
    power-iteration PPR (host_trustrank_seeded): push touches only the
    seed's neighborhood, never materializes a rank for every node, and its
    residual vector bounds the approximation error pointwise.

    Integer contract (α = 15/100): active iff ``r > deg·eps_i``; an active
    node moves ``(15·r) div 100`` into its estimate p, sends
    ``((85·r) div 100) div deg`` along each out-edge, and KEEPS both floor
    remainders in its residual — total mass is conserved exactly, so both
    engines see identical BIGINT states every round.  Dangling nodes
    (out-degree 0) are never active and hold their residual — the directed-
    graph caveat, documented.  Bounded ``rounds`` is the kg_scc_bounded
    contract: the output is the exact state after N pushes, not a claimed
    fixpoint.

    100 TB shape: per round one join of the ACTIVE frontier against edges
    (frontier-sized, not graph-sized) + one receive-side aggregate;
    localCheckpoint per round caps the 3-frame lineage.

    Returns (node, p_i, r_i), rows with any mass only."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    spark = edges.sparkSession
    state = spark.createDataFrame(
        [(seed, 0, int(scale))], "node string, p long, r long"
    )
    for _ in range(rounds):
        a = state.join(deg, state.node == deg.src, "left").select(
            "node",
            "p",
            "r",
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
        )
        a = a.withColumn(
            "act",
            ((F.col("d") > 0) & (F.col("r") > F.col("d") * F.lit(int(eps_i)))).cast("int"),
        ).localCheckpoint()
        upd = a.select(
            "node",
            F.when(F.col("act") == 1, F.expr("p + (15 * r) div 100"))
            .otherwise(F.col("p"))
            .cast("long")
            .alias("p"),
            F.when(
                F.col("act") == 1,
                F.expr("r - (15 * r) div 100 - (((85 * r) div 100) div d) * d"),
            )
            .otherwise(F.col("r"))
            .cast("long")
            .alias("r"),
        )
        sent = (
            a.filter(F.col("act") == 1)
            .join(e, a.node == e.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("((85 * r) div 100) div d").cast("long").alias("add_r"),
            )
            .groupBy("node")
            .agg(F.sum("add_r").cast("long").alias("add_r"))
        )
        state = (
            upd.join(sent, "node", "full")
            .select(
                "node",
                F.coalesce("p", F.lit(0)).cast("long").alias("p"),
                (F.coalesce("r", F.lit(0)) + F.coalesce("add_r", F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return state.filter((F.col("p") > 0) | (F.col("r") > 0)).select(
        "node", F.col("p").alias("p_i"), F.col("r").alias("r_i")
    )


def densest_subgraph_peel(
    edges: DataFrame,
    rounds: int = 6,
    eps_num: int = 11,
    eps_den: int = 10,
    scale: int = 10_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Batched greedy densest-subgraph peeling (Charikar 2000 via the
    MapReduce batching of Bahmani/Kumar/Vassilvitskii 2012): each round
    removes EVERY node whose degree ≤ (1+ε)·2·|E|/|V| at once — O(log n)
    rounds instead of |V| sequential peels, the distributed form of the
    2(1+ε)-approximation.  The densest snapshot across rounds is the
    community core (spam farms, mirror clusters, boilerplate hubs all
    surface as dense subgraphs of the host/entity graph).

    Exact integer threshold: keep node v iff ``deg(v)·|V|·eps_den >
    2·|E|·eps_num`` (cross-multiplied — no float ratio); density_mi =
    |E|·scale div |V| per round snapshot; ``is_best`` marks the max
    (ties: earliest round).  Bounded ``rounds`` is the exact-state
    contract (kg_scc_bounded); a round that removes nothing emits the
    same snapshot and the loop short-circuits nothing — rounds after
    stabilization repeat the fixpoint row (visible, deterministic).

    100 TB shape: per round one degree aggregate + one broadcast-able
    scalar pair (|V|, |E|) + one semi-join; the edge frame only shrinks;
    localCheckpoint per round caps lineage.

    Returns one row per round: (round, n_nodes, n_edges, density_mi,
    is_best)."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    snaps = []
    for rnd in range(1, rounds + 1):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        tot = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            # empty graph → SUM is NULL: coalesce so the snapshot row stays
            # all-BIGINT (the NULL-stringification trap)
            F.coalesce((F.sum("deg") / 2).cast("long"), F.lit(0)).alias("n_edges"),
        )
        snaps.append(
            tot.select(
                F.lit(rnd).cast("long").alias("round"),
                "n_nodes",
                "n_edges",
                F.expr(
                    f"CAST(CASE WHEN n_nodes = 0 THEN 0 "
                    f"ELSE ({int(scale)} * n_edges) div n_nodes END AS BIGINT)"
                ).alias("density_mi"),
            ).localCheckpoint()
        )
        if rnd == rounds:
            break  # the last snapshot is taken; peeling again is dead work
        keep = (
            deg.crossJoin(F.broadcast(tot))
            .filter(
                F.col("deg") * F.col("n_nodes") * F.lit(int(eps_den))
                > F.lit(2 * int(eps_num)) * F.col("n_edges")
            )
            .select("node")
        )
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
    allr = snaps[0]
    for sn in snaps[1:]:
        allr = allr.unionByName(sn)
    best = allr.agg(
        F.max(F.struct(F.col("density_mi"), (-F.col("round")).alias("nr"))).alias("m")
    ).select(F.col("m.density_mi").alias("bd"), (-F.col("m.nr")).cast("long").alias("br"))
    return allr.crossJoin(F.broadcast(best)).select(
        "round",
        "n_nodes",
        "n_edges",
        "density_mi",
        ((F.col("density_mi") == F.col("bd")) & (F.col("round") == F.col("br")))
        .cast("long")
        .alias("is_best"),
    )


def lt_cascade_bounded(
    edges: DataFrame,
    seeds: list[str],
    rounds: int = 4,
    theta_num: int = 1,
    theta_den: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Deterministic linear-threshold cascade (Kempe/Kleinberg/Tardos 2003
    with a FIXED uniform threshold θ instead of the randomized one — the
    deterministic variant used for reproducible influence audits): a node
    activates when the weight from already-active in-neighbors reaches
    θ · (its total in-weight), synchronously per round; activation is
    monotone.  Use: how far does a label/spam/trust signal spread from a
    seed set along the weighted host/entity graph.

    Exact integers: activate iff ``active_w · theta_den ≥ total_w ·
    theta_num``.  Bounded rounds = exact-state contract; nodes never
    reached stay absent (visible by absence); seeds report round 0.
    Parallel edges pre-sum into one weight per (src, dst).

    100 TB shape: per round ONE semi-join of edges against the cumulative
    active set + one dst-keyed aggregate + one anti-join; state is
    node-keyed, never edge-keyed; localCheckpoint per round.  (The
    incremental form — aggregate only the NEWLY-active frontier's edges
    into a running active-weight state — halves the join input at scale;
    the recompute form is kept for the exact-state gate's simplicity.)

    Returns (node, activated_round)."""
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("w"))
        .localCheckpoint()
    )
    total_in = e.groupBy("dst").agg(F.sum("w").cast("long").alias("total_w"))
    spark = edges.sparkSession
    active = spark.createDataFrame(
        [(s_, 0) for s_ in sorted(set(seeds))], "node string, activated_round long"
    ).localCheckpoint()
    for rnd in range(1, rounds + 1):
        active_w = (
            e.join(active.select(F.col("node").alias("src")), "src")
            .groupBy("dst")
            .agg(F.sum("w").cast("long").alias("aw"))
        )
        newly = (
            active_w.join(total_in, "dst")
            .filter(
                F.col("aw") * F.lit(int(theta_den))
                >= F.col("total_w") * F.lit(int(theta_num))
            )
            .select(F.col("dst").alias("node"))
            .join(active.select("node"), "node", "left_anti")
            .select("node", F.lit(rnd).cast("long").alias("activated_round"))
        )
        active = active.unionByName(newly).localCheckpoint()
    return active
