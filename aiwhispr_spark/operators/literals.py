"""Quantity-literal normalization: numeric facts mined from prose with the
surface form ("$3.5 billion", "12,000 people", "7.5%") normalized to an
EXACT scaled integer + unit — the literal-canonicalization stage every web
KG needs before numeric facts are comparable or aggregable.

The reference's extraction tier (`python/textprocessor` in
prasaar/aiwhispr) emits objects as raw strings; "$3.5 billion" and
"$3,500 million" would be two different facts.  Production KGs normalize
quantities at extraction time.  Floats would drift between engines, so the
normalized value is ``value_i = quantity × 10^4`` computed in DECIMAL
arithmetic end-to-end (the repo-wide scaled-BIGINT gate discipline).

Contract (unit-pinned, oracle-mirrored):
* revenue arm:   ``<Subj> reported revenue of $<n> thousand|million|billion``
  → pred=revenue, unit=usd;
* headcount arm: ``<Subj> employs <n> people`` → pred=employees, unit=count
  (comma group separators stripped);
* margin arm:    ``<Subj> margin was <n>%`` → pred=margin, unit=pct;
* <n> is digits with optional commas and one optional decimal point; a
  sentence matching no arm emits nothing.

100 TB shape: three regex projections over the SAME chunk scan concat into
one array before the explode — a single narrow JVM stage, zero shuffle,
zero python, decimal math inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SUBJ = r"([A-Z][A-Za-z0-9_]*)"
_NUM = r"([0-9][0-9,]*(?:\.[0-9]+)?)"
_REVENUE_RE = rf"{_SUBJ} reported revenue of \${_NUM} (thousand|million|billion)"
_EMPLOYS_RE = rf"{_SUBJ} employs {_NUM} people"
_MARGIN_RE = rf"{_SUBJ} margin was {_NUM}%"

_SCALE = {"thousand": 1_000, "million": 1_000_000, "billion": 1_000_000_000}


def _value_i(num: Column, scale: Column) -> Column:
    """quantity × 10^4 as BIGINT: comma-stripped DECIMAL(38,10) × integer
    scale × 10^4, rounded HALF_UP at the integer boundary — no float ever
    enters the plan.  Exact for ≤10 fractional digits (beyond that the
    parse cast rounds, same HALF_UP); a bare bigint cast would FLOOR
    sub-10^-4 fractions ('7.00005%' → 70000 instead of 70001)."""
    dec = F.regexp_replace(num, ",", "").cast("decimal(38,10)")
    prod = dec * scale.cast("decimal(20,0)") * F.lit(10_000)
    return F.round(prod, 0).cast("bigint")


def extract_quantity_facts(
    chunks: DataFrame,
    text_col: str = "text_chunk",
    id_col: str = "url",
) -> DataFrame:
    """(url, subj, pred, value_i, unit) — one row per normalized quantity
    fact (see module contract); value_i = quantity × 10^4, exact."""
    text = F.col(text_col)

    def _arm(pattern: str, pred: str, unit: str, scale_grp: int | None):
        subs = F.regexp_extract_all(text, F.lit(pattern), F.lit(1))
        nums = F.regexp_extract_all(text, F.lit(pattern), F.lit(2))
        if scale_grp is None:
            scales = F.transform(nums, lambda _: F.lit("one"))
        else:
            scales = F.regexp_extract_all(text, F.lit(pattern), F.lit(scale_grp))
        zipped = F.arrays_zip(
            subs.alias("subj"), nums.alias("num"), scales.alias("scale")
        )
        return F.transform(
            zipped,
            lambda s: F.struct(
                s["subj"].alias("subj"),
                s["num"].alias("num"),
                s["scale"].alias("scale"),
                F.lit(pred).alias("pred"),
                F.lit(unit).alias("unit"),
            ),
        )

    arms = F.concat(
        _arm(_REVENUE_RE, "revenue", "usd", 3),
        _arm(_EMPLOYS_RE, "employees", "count", None),
        _arm(_MARGIN_RE, "margin", "pct", None),
    )
    scale_num = (
        F.when(F.col("m.scale") == "thousand", F.lit(_SCALE["thousand"]))
        .when(F.col("m.scale") == "million", F.lit(_SCALE["million"]))
        .when(F.col("m.scale") == "billion", F.lit(_SCALE["billion"]))
        .otherwise(F.lit(1))
    )
    return chunks.select(
        F.col(id_col).alias("url"), F.explode(arms).alias("m")
    ).select(
        "url",
        F.col("m.subj").alias("subj"),
        F.col("m.pred").alias("pred"),
        _value_i(F.col("m.num"), scale_num).alias("value_i"),
        F.col("m.unit").alias("unit"),
    )


_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def extract_normalize_dates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Multi-format textual date extraction → ISO normalization with REAL
    calendar validation.  Formats (the separator disambiguates the
    day/month convention — the standard heuristic):

    * ``yyyy-mm-dd``      (ISO)
    * ``mm/dd/yyyy``      (slash ⇒ US month-first)
    * ``dd.mm.yyyy``      (dot ⇒ European day-first)
    * ``March 5, 1999`` / ``5 March 1999``   (month names)

    Emits (id, raw, iso, valid_i) one row per match; ``valid_i`` applies
    the real days-in-month rule including Gregorian leap years
    (y%4=0 ∧ y%100≠0) ∨ y%400=0 — '1999-02-29' extracts but flags 0.

    All five patterns are JVM regexes gathered in ONE projection (arms
    concatenated BEFORE the explode — a single text scan, no union
    fan-out), parsing and validation pure expressions; zero python."""
    t = F.col(text_col)
    mon_rx = "|".join(_MONTHS)
    mon_arr = F.array(*[F.lit(m) for m in _MONTHS])

    def arm(rx: str, kind: str):
        return F.transform(
            F.regexp_extract_all(t, F.lit(rx), F.lit(0)),
            lambda raw: F.struct(raw.alias("raw"), F.lit(kind).alias("kind")),
        )

    arms = F.concat(
        arm(r"\d{4}-\d{2}-\d{2}", "iso"),
        arm(r"\d{1,2}/\d{1,2}/\d{4}", "us"),
        arm(r"\d{1,2}\.\d{1,2}\.\d{4}", "eu"),
        arm(rf"(?:{mon_rx}) \d{{1,2}}, \d{{4}}", "name_mdy"),
        arm(rf"\d{{1,2}} (?:{mon_rx}) \d{{4}}", "name_dmy"),
    )
    rows = df.select(F.col(id_col).alias("id"), F.explode(arms).alias("m")).select(
        "id", F.col("m.raw").alias("raw"), F.col("m.kind").alias("kind")
    )
    g = lambda rx, i: F.regexp_extract(F.col("raw"), rx, i)  # noqa: E731
    mon_of = lambda name: F.array_position(mon_arr, name)  # noqa: E731
    y = (
        F.when(F.col("kind") == "iso", g(r"^(\d{4})", 1))
        .when(F.col("kind") == "us", g(r"/(\d{4})$", 1))
        .when(F.col("kind") == "eu", g(r"\.(\d{4})$", 1))
        .otherwise(g(r"(\d{4})$", 1))
        .cast("int")
    )
    m = (
        F.when(F.col("kind") == "iso", g(r"-(\d{2})-", 1).cast("int"))
        .when(F.col("kind") == "us", g(r"^(\d{1,2})/", 1).cast("int"))
        .when(F.col("kind") == "eu", g(r"\.(\d{1,2})\.", 1).cast("int"))
        .when(F.col("kind") == "name_mdy", mon_of(g(r"^([A-Za-z]+)", 1)))
        .otherwise(mon_of(g(r"^\d{1,2} ([A-Za-z]+)", 1)))
        .cast("int")
    )
    d = (
        F.when(F.col("kind") == "iso", g(r"-(\d{2})$", 1))
        .when(F.col("kind") == "us", g(r"/(\d{1,2})/", 1))
        .when(F.col("kind") == "eu", g(r"^(\d{1,2})\.", 1))
        .when(F.col("kind") == "name_mdy", g(r" (\d{1,2}),", 1))
        .otherwise(g(r"^(\d{1,2})", 1))
        .cast("int")
    )
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = F.element_at(
        F.array(*[F.lit(n) for n in [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]]),
        m,
    ) + F.when((m == 2) & leap, 1).otherwise(0)
    valid = (
        (m >= 1) & (m <= 12) & (d >= 1) & (d <= dim)
    )
    iso = F.concat_ws(
        "-",
        F.lpad(y.cast("string"), 4, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(d.cast("string"), 2, "0"),
    )
    return rows.select(
        "id",
        "raw",
        iso.alias("iso"),
        valid.cast("long").alias("valid_i"),
    )


# exact rational factors to the dimension's canonical unit (num, den):
# 1 mi = 1609.344 m and 1 lb = 453.59237 g are exact by definition
UNIT_CONVERSIONS: dict[str, tuple[str, str, int, int]] = {
    "m": ("length", "m", 1, 1),
    "km": ("length", "m", 1000, 1),
    "cm": ("length", "m", 1, 100),
    "mi": ("length", "m", 1609344, 1000),
    "g": ("mass", "g", 1, 1),
    "kg": ("mass", "g", 1000, 1),
    "lb": ("mass", "g", 45359237, 100000),
    "oz": ("mass", "g", 45359237, 1600000),
}


def normalize_units(
    df: DataFrame, value_col: str = "value_i", unit_col: str = "unit"
) -> DataFrame:
    """Normalize scaled-int measurements to each dimension's canonical unit
    via a broadcast conversion table of EXACT rational factors —
    ``norm_value_i = value_i·num div den`` (one floor div, documented; no
    float factor ever touches the value).  Units absent from the table stay
    VISIBLE with dimension 'unknown' and the −1 sentinel (a dropped row
    reads as "normalized corpus" when it isn't — the linededup-NULL-doc
    lesson).  Input rows keep their other columns.

    100 TB shape: the conversion table is unit-cardinality-sized and
    broadcast; the join adds no exchange to the fact stream."""
    spark = df.sparkSession
    conv = spark.createDataFrame(
        [(u, d, c, n, dn) for u, (d, c, n, dn) in sorted(UNIT_CONVERSIONS.items())],
        f"{unit_col} string, dimension string, canonical_unit string, num long, den long",
    )
    joined = df.join(F.broadcast(conv), unit_col, "left")
    return joined.select(
        *[c for c in df.columns],
        F.coalesce("dimension", F.lit("unknown")).alias("dimension"),
        F.coalesce("canonical_unit", F.lit("?")).alias("canonical_unit"),
        F.when(
            F.col("num").isNotNull(),
            F.expr(f"CAST(({value_col} * num) div den AS BIGINT)"),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("norm_value_i"),
    )


def benford_first_digit_audit(
    df: DataFrame, value_col: str, scale: int = 1_000_000
) -> DataFrame:
    """Benford's-law first-significant-digit audit over a positive BIGINT
    value column (Benford 1938; the classic fabricated-data screen for
    extracted quantity facts).  Expected proportions ``log10(1 + 1/d)``
    enter as a 9-row INTEGER LITERAL TABLE computed driver-side (the NDCG
    discount-table pattern) — no runtime float.  Every digit 1-9 stays
    VISIBLE even at zero observations (spine + left join, count coalesced).

    Output: (digit, n_obs, obs_mi, exp_mi, abs_dev_mi) with obs_mi =
    n_obs·scale div N.  One map-side-combinable 9-key aggregate."""
    import math

    spark = df.sparkSession
    exp_rows = [(d, int(round(scale * math.log10(1.0 + 1.0 / d)))) for d in range(1, 10)]
    spine = spark.createDataFrame(exp_rows, "digit long, exp_mi long")
    digits = (
        df.filter(F.col(value_col) > 0)
        .select(
            F.substring(F.col(value_col).cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    total = digits.agg(F.sum("n_obs").cast("long").alias("n_total"))
    out = (
        spine.join(digits, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            # empty input → n_total NULL: emit 0, not NULL (the NULL-BIGINT
            # stringification trap); n_obs is 0 for every digit then anyway
            F.expr(
                f"CAST(CASE WHEN coalesce(n_total, 0) = 0 THEN 0 "
                f"ELSE (coalesce(n_obs, 0) * {int(scale)}) div n_total END AS BIGINT)"
            ).alias("obs_mi"),
            "exp_mi",
        )
        .withColumn("abs_dev_mi", F.abs(F.col("obs_mi") - F.col("exp_mi")).cast("long"))
    )
    return out


_MEASURE_RE = r"([A-Za-z][A-Za-z0-9_]*) (?:weighs|measures|spans) ([0-9]+(?:\.[0-9]+)?) (km|cm|mi|kg|lb|oz|m|g)\b"


def extract_measurements(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, subj, value_i, unit) — one row per ``<subj> weighs|measures|
    spans <number> <unit>`` mention; value_i = round(number·10⁴) (one
    string→double parse then one round — the established float discipline;
    both engines parse decimal literals identically).  Alternation order in
    the unit group lists longer units first (km before m, kg before g) —
    regex alternation is first-match, not longest-match, so `km` must not
    stop at `m`.  Pure JVM regexp_extract_all; composes with
    :func:`normalize_units` for the extraction→canonicalization gate."""
    text = F.col(text_col)
    subs = F.regexp_extract_all(text, F.lit(_MEASURE_RE), F.lit(1))
    nums = F.regexp_extract_all(text, F.lit(_MEASURE_RE), F.lit(2))
    units = F.regexp_extract_all(text, F.lit(_MEASURE_RE), F.lit(3))
    zipped = F.arrays_zip(subs.alias("subj"), nums.alias("num"), units.alias("unit"))
    return df.select(F.col(id_col).alias("id"), F.explode(zipped).alias("m")).select(
        "id",
        F.col("m.subj").alias("subj"),
        F.round(F.col("m.num").cast("double") * 10000).cast("long").alias("value_i"),
        F.col("m.unit").alias("unit"),
    )
