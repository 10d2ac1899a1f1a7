"""The reference's shipped query/report suite as DataFrame plans.

Each function mirrors one .rq file (reference: octofludb/data/*.rq)
plus its python post-processing (recipes.py / formatting.py).  All
aggregation is hash aggregation with map-side partials; OPTIONALs are
left joins; NOT EXISTS / MINUS are left_anti joins; the segment<->
strain patterns are self-equi-joins of the predicate views.  Multi-
valued GROUP_CONCAT cells are sort_array'd for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octofludb_spark.plans.views import GraphViews, group_concat


# --------------------------------------------------------------------------
# segments.rq + formatting.write_constellations (A7)
# --------------------------------------------------------------------------

# formatting.py:72: segment slot order
_CONST_SLOTS = ["PB2", "PB1", "PA", "NP", "M", "NS"]
# formatting.py:74-76: exact clade -> letter
_CLADE_LETTER = {"pdm": "P", "LAIV": "V", "TRIG": "T",
                 "humanSeasonal": "H", "classicalSwine": "C", "avian": "A"}


def segments_query(v: GraphViews) -> DataFrame:
    """segments.rq: swine strains' internal-segment clades."""
    swine = v.value("host", "swine", s="sid")
    strain = v.pred("strain_name", s="sid", o="strain")
    hs = v.pred("has_segment", s="sid", o="gid")
    segname = v.pred("segment_name", s="gid", o="segment").where(
        ~F.col("segment").isin("HA", "NA")
    )
    clade = v.pred("clade", s="gid", o="clade")
    return (
        swine.join(strain, "sid").join(hs, "sid")
        .join(segname, "gid").join(clade, "gid")
        .select("strain", "segment", "clade").distinct()
    )


def _clade_letter_col(clade: str = "clade"):
    """_make_constellations letter logic (formatting.py:92-112):
    exact lookup, then '-like' -> X, then case-insensitive substring
    in dict order, else X."""
    c = F.col(clade)
    expr = None
    flex = F.lit("X")
    for key, letter in reversed(list(_CLADE_LETTER.items())):
        flex = F.when(F.lower(c).contains(key.lower()), letter).otherwise(flex)
    expr = (
        F.when(c.isin(*_CLADE_LETTER.keys()),
               F.element_at(F.create_map(*[F.lit(x) for kv in
                                           _CLADE_LETTER.items() for x in kv]), c))
        .when(F.lower(c).contains("-like"), F.lit("X"))
        .otherwise(flex)
    )
    return expr


def constellation_from_rows(rows: DataFrame) -> DataFrame:
    """(strain, segment, clade) rows -> (strain, constellation):
    6-slot string, per-slot conflicts -> M -> whole string 'mixed'
    (formatting.py:70-125).  A strain whose rows ALL have
    out-of-lookup segments still reports '------': the reference
    creates the slot list BEFORE the segment lookup that skips the
    row (formatting.py:83-92)."""
    rows = rows.withColumn(
        "segment", F.when(F.col("segment") == "MP", "M").otherwise(F.col("segment"))
    ).withColumn("letter", _clade_letter_col())
    universe = rows.select("strain").distinct()
    slots = (
        rows.where(F.col("segment").isin(_CONST_SLOTS))
        .groupBy("strain")
        .agg(
            *[
                F.collect_set(
                    F.when(F.col("segment") == seg, F.col("letter"))
                ).alias(f"_{seg}")
                for seg in _CONST_SLOTS
            ]
        )
    )
    def slot(seg):
        arr = F.col(f"_{seg}")
        return (
            F.when(arr.isNull() | (F.size(arr) == 0), "-")
            .when(F.size(arr) == 1, F.element_at(arr, 1))
            .otherwise("M")
        )
    strung = universe.join(slots, "strain", "left").select(
        "strain",
        F.concat(*[slot(seg) for seg in _CONST_SLOTS]).alias("raw"),
    )
    return strung.select(
        "strain",
        F.when(F.col("raw").contains("M"), "mixed")
        .otherwise(F.col("raw")).alias("constellation"),
    )


def constellations(v: GraphViews) -> DataFrame:
    """(strain, constellation) over the segments query."""
    return constellation_from_rows(segments_query(v))


# --------------------------------------------------------------------------
# subtypes.rq + mk_subtypes (A6)
# --------------------------------------------------------------------------

def subtypes_query(v: GraphViews) -> DataFrame:
    """subtypes.rq: HA/NA segment info for strains lacking an HxNy
    subtype annotation (FILTER NOT EXISTS -> left_anti)."""
    strain = v.pred("strain_name", s="sid", o="strain_name")
    hs = v.pred("has_segment", s="sid", o="gid")
    segname = v.pred("segment_name", s="gid", o="segment_name").where(
        F.col("segment_name").isin("HA", "NA")
    )
    typed = v.pred("subtype", s="sid", o="st").where(
        F.col("st").rlike("H.N.")
    ).select("sid").distinct()
    base = strain.join(hs, "sid").join(segname, "gid").join(
        typed, "sid", "left_anti"
    )
    iso = v.pred("isolate_id", s="sid", o="isolate")
    segsub = v.pred("segment_subtype", s="gid", o="segment_subtype")
    serotype = v.path2("has_feature", "serotype", s="gid", o="genbank_subtype")
    gsub = v.pred("gisaid_subtype", s="sid", o="gisaid_subtype")
    out = (
        base.join(iso, "sid", "left")
        .join(segsub, "gid", "left")
        .join(serotype, "gid", "left")
        .join(gsub, "sid", "left")
    )
    return out.groupBy("strain_name", "segment_name").agg(
        group_concat("isolate", "isolates"),
        group_concat("segment_subtype", "segment_subtypes"),
        group_concat("gisaid_subtype", "gisaid_subtypes"),
        group_concat("genbank_subtype", "genbank_subtypes"),
    )


def resolve_subtype(has, nas, gisaid_subtypes, genbank_subtypes):
    """_get_subtype priority lattice (recipes.py:291-335) as plain
    python — the unit-testable specification the Spark expression in
    subtypes_report must match (octoFLU > genbank > gisaid,
    conflicts -> 'mixed')."""
    import re as _re

    def ustr(s):
        return s.upper().strip()

    def clean(s):
        m = _re.search(r".*(H\d+).*(N\d+).*", ustr(s))
        return (m.group(1) + m.group(2)) if m else ""

    gis = list({clean(s) for s in gisaid_subtypes if len(s) > 0})
    gb = list({clean(s) for s in genbank_subtypes if len(s) > 0})
    has = list({ustr(h) for h in has if len(h) > 0})
    nas = list({ustr(n) for n in nas if len(n) > 0})
    if len(nas) == 1 and len(has) == 1:
        return has[0] + nas[0]
    if len(gis) > 1 or len(gb) > 1 or len(nas) > 1 or len(has) > 1:
        return "mixed"
    if len(gb) == 1:
        return gb[0]
    if len(gis) == 1:
        return gis[0]
    return None


def _clean_subtype_col(c):
    """_clean_subtype (recipes.py:279-288): upper, extract H\\d+ and
    N\\d+, concat (empty string when either missing)."""
    up = F.upper(F.trim(c))
    ha = F.regexp_extract(up, r".*(H\d+).*(N\d+).*", 1)
    na = F.regexp_extract(up, r".*(H\d+).*(N\d+).*", 2)
    return F.concat(ha, na)


def subtypes_report(v: GraphViews) -> DataFrame:
    """mk_subtypes (recipes.py:338-387): per strain, resolve the
    subtype by the octoFLU > genbank > gisaid priority lattice
    (_get_subtype, recipes.py:291-335).  -> (strain_name, subtype)."""
    return subtypes_report_from_query(subtypes_query(v))


def subtypes_report_from_query(q: DataFrame) -> DataFrame:
    """The per-strain resolution over the subtypes query result —
    separated so the reference's mk_subtypes can be differential-
    tested on synthetic query rows."""
    per_strain = (
        q.withColumn("sub1",
                     F.when(~F.col("segment_subtypes").contains("+"),
                            F.col("segment_subtypes")))
        .groupBy("strain_name")
        .agg(
            F.flatten(F.collect_list(F.split("isolates", r"\+"))).alias("_iso"),
            # \z (Java absolute end), not $: re.fullmatch semantics —
            # 'H1\n' must not vote (same class as the \Z recognizer fix)
            F.collect_set(F.when(F.col("sub1").rlike(r"^H\d+\z"), F.col("sub1")))
            .alias("_ha_raw"),
            F.collect_set(F.when(F.col("sub1").rlike(r"^N\d+\z"), F.col("sub1")))
            .alias("_na_raw"),
            F.flatten(F.collect_set(F.split("gisaid_subtypes", r"\+")))
            .alias("_gis_raw"),
            F.flatten(F.collect_set(F.split("genbank_subtypes", r"\+")))
            .alias("_gb_raw"),
        )
    )
    def distinct_clean(col, cleaner):
        """{clean(s) for s in col if len(s) > 0} — the reference KEEPS
        empty-string CLEAN results in the set (recipes.py:299-308),
        so only the raw empties are filtered."""
        return F.array_distinct(
            F.transform(
                F.filter(col, lambda x: x.isNotNull() & (x != "")),
                cleaner,
            )
        )
    per_strain = (
        per_strain
        .withColumn("has", distinct_clean(F.col("_ha_raw"),
                                          lambda x: F.upper(F.trim(x))))
        .withColumn("nas", distinct_clean(F.col("_na_raw"),
                                          lambda x: F.upper(F.trim(x))))
        .withColumn("gis", distinct_clean(F.col("_gis_raw"), _clean_subtype_col))
        .withColumn("gb", distinct_clean(F.col("_gb_raw"), _clean_subtype_col))
    )
    subtype = (
        F.when((F.size("has") == 1) & (F.size("nas") == 1),
               F.concat(F.element_at("has", 1), F.element_at("nas", 1)))
        .when((F.size("gis") > 1) | (F.size("gb") > 1)
              | (F.size("has") > 1) | (F.size("nas") > 1), F.lit("mixed"))
        .when(F.size("gb") == 1, F.element_at("gb", 1))
        .when(F.size("gis") == 1, F.element_at("gis", 1))
    )
    out = per_strain.withColumn("subtype", subtype)
    strains = out.where(F.col("subtype").isNotNull()).select(
        "strain_name", "subtype",
        F.array_distinct(F.filter(F.col("_iso"), lambda x: x != ""))
        .alias("isolates"),
    )
    return strains


# --------------------------------------------------------------------------
# masterlist.rq + mk_masterlist (A8)
# --------------------------------------------------------------------------

def masterlist_query(v: GraphViews) -> DataFrame:
    """masterlist.rq:4-51 — per (barcode, genbank_id, segment) grouped
    row over USA swine surveillance strains."""
    strain = v.pred("strain_name", s="sid", o="strain").where(
        F.col("strain").rlike("A/swine/.*/A0")
    )
    swine = v.value("host", "swine", s="sid")
    usa = v.path2("country", "code", s="sid", o="_code").where(
        F.col("_code") == "USA"
    ).select("sid").distinct()
    barcode = v.pred("barcode", s="sid", o="barcode")
    date = v.pred("date", s="sid", o="date")
    state = v.path2("state", "abbr", s="sid", o="state")
    const = v.pred("constellation", s="sid", o="const")
    subtype = v.pred("subtype", s="sid", o="subtype")
    hs = v.pred("has_segment", s="sid", o="gid")
    segname = v.pred("segment_name", s="gid", o="segment")
    segsub = v.pred("segment_subtype", s="gid", o="segment_subtype")
    gb = v.pred("genbank_id", s="gid", o="genbank_id", expand=False)
    us_clade = v.pred("clade", s="gid", o="us_clade")
    gl_clade = v.pred("gl_clade", s="gid", o="gl_clade")

    core = (
        strain.join(swine, "sid").join(usa, "sid")
        .join(barcode, "sid").join(date, "sid")
        .join(hs, "sid").join(segname, "gid").join(gb, "gid")
    )
    opt = (
        core.join(state, "sid", "left")
        .join(const, "sid", "left")
        .join(subtype, "sid", "left")
        .join(segsub, "gid", "left")
        .join(us_clade, "gid", "left")
        .join(gl_clade, "gid", "left")
    )
    motif_cols = []
    for m in ("h3_motif", "sa_motif", "sb_motif", "ca1_motif", "ca2_motif",
              "cb_motif"):
        opt = opt.join(v.pred(m, s="gid", o=m, expand=False), "gid", "left")
        motif_cols.append(m)
    return opt.groupBy("barcode", "genbank_id", "segment").agg(
        group_concat("segment_subtype", "segment_subtypes"),
        group_concat("subtype", "subtypes"),
        F.min("date").alias("earliest_date"),
        group_concat("state", "states"),
        group_concat("strain", "strains"),
        group_concat("us_clade", "us_clades"),
        group_concat("gl_clade", "gl_clades"),
        group_concat("const", "consts"),
        *[group_concat(m, m + "s") for m in motif_cols],
    )


def masterlist_query_fast(v: GraphViews) -> DataFrame:
    """masterlist.rq as a ONE-SHUFFLE-PER-ENTITY plan: instead of ~15
    predicate-view self-joins (each an exchange), pivot all strain
    attributes and all segment attributes in one groupBy each, join
    once through has_segment, and evaluate every SPARQL pattern as an
    array predicate.  Output is row-identical to masterlist_query
    (equivalence-tested); this is the plan shape that survives a
    100TB store."""
    strain_attrs = v.entity_attrs(
        ["strain_name", "host", "barcode", "date", "state",
         "constellation", "subtype", "country"], s="sid")
    seg_attrs = v.entity_attrs(
        ["segment_name", "segment_subtype", "genbank_id", "clade",
         "gl_clade", "h3_motif", "sa_motif", "sb_motif", "ca1_motif",
         "ca2_motif", "cb_motif"], s="gid")
    from octofludb_spark.functions.uri import NCOUNTRY, NUSA

    strains = (
        strain_attrs
        .withColumn("strain_f",
                    F.filter("strain_name",
                             lambda x: x.rlike("A/swine/.*/A0")))
        .where(F.size("strain_f") > 0)
        .where(F.array_contains("host", "swine"))
        .where(F.array_contains("country", NCOUNTRY + "USA"))
        .where(F.size("date") > 0)
        .withColumn("state_abbr",
                    F.transform("state",
                                lambda u: F.substring(u, len(NUSA) + 1, 2)))
        .withColumn("barcode", F.explode("barcode"))
    )
    segs = (
        seg_attrs
        .withColumn("segment", F.explode("segment_name"))
        .withColumn("genbank_id", F.explode("genbank_id"))
    )
    hs = v.pred("has_segment", s="sid", o="gid")
    rows = strains.join(hs, "sid").join(segs, "gid")

    def gc(col, alias):
        return F.concat_ws(
            "+",
            F.sort_array(F.array_distinct(F.flatten(F.collect_set(col)))),
        ).alias(alias)

    return rows.groupBy("barcode", "genbank_id", "segment").agg(
        gc("segment_subtype", "segment_subtypes"),
        gc("subtype", "subtypes"),
        F.min(F.array_min("date")).alias("earliest_date"),
        gc("state_abbr", "states"),
        gc("strain_f", "strains"),
        gc("clade", "us_clades"),
        gc("gl_clade", "gl_clades"),
        gc("constellation", "consts"),
        gc("h3_motif", "h3_motifs"),
        gc("sa_motif", "sa_motifs"),
        gc("sb_motif", "sb_motifs"),
        gc("ca1_motif", "ca1_motifs"),
        gc("ca2_motif", "ca2_motifs"),
        gc("cb_motif", "cb_motifs"),
    )


MASTERLIST_HEADER = [
    "Barcode", "Date", "Collection_Q", "State", "Subtype", "H_Genbank",
    "N_Genbank", "PB2_Genbank", "PB1_Genbank", "PA_Genbank", "NP_Genbank",
    "M_Genbank", "NS_Genbank", "Strain", "US_Clade", "GL_Clade", "H1", "H3",
    "N1", "N2", "PB2", "PB1", "PA", "NP", "M", "NS", "Constellation",
    "Motif", "Sa_Motif", "Sb_Motif", "Ca1_Motif", "Ca2_Motif", "Cb_Motif",
]


def masterlist_report(v: GraphViews) -> DataFrame:
    """mk_masterlist (recipes.py:427-507): the 33-column wide report,
    one row per barcode; list cells comma-joined, sorted for
    determinism.  Quarter = ceil(month/3) calendar (recipes.py:261-272).
    Uses the one-shuffle entity-pivot plan (row-identical to the
    literal translation, tests/test_masterlist_fast.py)."""
    return masterlist_report_from_query(masterlist_query_fast(v))


def masterlist_report_from_query(q: DataFrame) -> DataFrame:
    """The wide pivot over the masterlist query result — separated so
    the reference's mk_masterlist can be differential-tested on
    synthetic query rows."""

    def split_nonempty(col):
        return F.filter(F.split(col, r"\+"), lambda x: x != "")

    # quarter_from_date (recipes.py:261-272): split on '-', take the
    # first two parts verbatim — a single-digit month ('2020-1-5')
    # still yields 2020Q1; int() failure -> ''.  Python int() also
    # trims whitespace and allows digit-group underscores ('1_0' ->
    # 10); only unbounded/non-ASCII-digit months diverge (-> '').
    _parts = F.split("earliest_date", "-")
    _month = F.regexp_replace(
        F.regexp_extract(F.trim(F.try_element_at(_parts, F.lit(2))),
                         r"^([+-]?\d+(?:_\d+)*)\z", 1),
        "_", "",
    ).try_cast("long")
    quarter = F.when(
        (F.size(_parts) >= 2) & _month.isNotNull(),
        F.concat(
            F.element_at(_parts, 1),
            F.lit("Q"),
            F.ceil(_month / 3).cast("int").cast("string"),
        ),
    ).otherwise("")
    first_sub = F.element_at(F.split("subtypes", r"\+"), 1)
    seg = F.col("segment")
    segsub1 = F.element_at(F.split("segment_subtypes", r"\+"), 1)
    us = split_nonempty(F.col("us_clades"))
    enriched = q.select(
        "barcode", "genbank_id", "segment",
        F.col("earliest_date").alias("date"), quarter.alias("cq"),
        split_nonempty("states").alias("state"),
        first_sub.alias("subtype"),
        split_nonempty("strains").alias("strain"),
        us.alias("us"),
        split_nonempty("gl_clades").alias("gl"),
        split_nonempty("consts").alias("const"),
        segsub1.alias("segsub"),
        *[split_nonempty(m + "s").alias(m) for m in
          ("h3_motif", "sa_motif", "sb_motif", "ca1_motif", "ca2_motif",
           "cb_motif")],
    )

    def when_seg(cond, col):
        return F.when(cond, col)

    agg = enriched.groupBy("barcode").agg(
        F.sort_array(F.collect_set("date")).alias("Date_l"),
        F.sort_array(F.collect_set("cq")).alias("CQ_l"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("state")))).alias("State_l"),
        F.sort_array(F.collect_set("subtype")).alias("Subtype_l"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("strain")))).alias("Strain_l"),
        F.sort_array(F.collect_set(when_seg(seg == "HA", F.col("genbank_id")))).alias("H_Genbank_l"),
        F.sort_array(F.collect_set(when_seg(seg == "NA", F.col("genbank_id")))).alias("N_Genbank_l"),
        *[
            F.sort_array(F.collect_set(
                when_seg(seg == s, F.col("genbank_id")))).alias(f"{s}_Genbank_l")
            for s in ("PB2", "PB1", "PA", "NP", "M", "NS")
        ],
        F.sort_array(F.array_distinct(F.flatten(F.collect_list(
            F.when(seg == "HA", F.col("us")))))).alias("US_Clade_l"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list(
            F.when(seg == "HA", F.col("gl")))))).alias("GL_Clade_l"),
        *[
            F.sort_array(F.array_distinct(F.flatten(F.collect_list(
                F.when(F.col("segsub") == ss, F.col("us"))))))
            .alias(f"{ss}_l")
            for ss in ("H1", "H3", "N1", "N2")
        ],
        *[
            F.sort_array(F.array_distinct(F.flatten(F.collect_list(
                F.when(seg == s, F.col("us")))))).alias(f"{s}_seg_l")
            for s in ("PB2", "PB1", "PA", "NP", "M", "NS")
        ],
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("const")))).alias("Const_l"),
        *[
            F.sort_array(F.array_distinct(F.flatten(F.collect_list(m))))
            .alias(f"{m}_l")
            for m in ("h3_motif", "sa_motif", "sb_motif", "ca1_motif",
                      "ca2_motif", "cb_motif")
        ],
    )
    j = lambda c: F.concat_ws(",", F.col(c))  # noqa: E731
    return agg.select(
        F.col("barcode").alias("Barcode"),
        j("Date_l").alias("Date"), j("CQ_l").alias("Collection_Q"),
        j("State_l").alias("State"), j("Subtype_l").alias("Subtype"),
        j("H_Genbank_l").alias("H_Genbank"), j("N_Genbank_l").alias("N_Genbank"),
        *[j(f"{s}_Genbank_l").alias(f"{s}_Genbank")
          for s in ("PB2", "PB1", "PA", "NP", "M", "NS")],
        j("Strain_l").alias("Strain"),
        j("US_Clade_l").alias("US_Clade"), j("GL_Clade_l").alias("GL_Clade"),
        *[j(f"{ss}_l").alias(ss) for ss in ("H1", "H3", "N1", "N2")],
        *[j(f"{s}_seg_l").alias(s) for s in ("PB2", "PB1", "PA", "NP", "M", "NS")],
        j("Const_l").alias("Constellation"),
        j("h3_motif_l").alias("Motif"), j("sa_motif_l").alias("Sa_Motif"),
        j("sb_motif_l").alias("Sb_Motif"), j("ca1_motif_l").alias("Ca1_Motif"),
        j("ca2_motif_l").alias("Ca2_Motif"), j("cb_motif_l").alias("Cb_Motif"),
    )


# --------------------------------------------------------------------------
# wgs.rq — quarterly WGS selection report (macro params __YEAR__/__MONTH__)
# --------------------------------------------------------------------------

def wgs_report(v: GraphViews, year: int, month: int) -> DataFrame:
    """wgs.rq: USA swine A0 strains with HA+NA genbank ids collected in
    (year, month); grouped per (strain, host, year, month).  The
    SPARQL BIND(YEAR/MONTH/DAY) on typed dates maps to substring
    extraction on full xsd:date lexicals (FILTER BOUND drops partial
    dates, exactly like MONTH() on a gYear is unbound)."""
    strain = v.pred("strain_name", s="sid", o="strain").where(
        F.col("strain").rlike("A/.wine/.*/A0")
    )
    swine = v.value("host", "swine", s="sid").withColumn("host", F.lit("swine"))
    country = v.path2("country", "code", s="sid", o="country").where(
        F.col("country") == "USA"
    )
    # full dates only (BOUND(month) && BOUND(day))
    date = v.pred_typed("date", s="sid", o="date").where(
        F.col("dt") == "xsd:date"
    ).select(
        "sid", "date",
        F.substring("date", 1, 4).cast("int").alias("year"),
        F.substring("date", 6, 2).cast("int").alias("month"),
        # DAY(?date) is an INTEGER in SPARQL: '3', never '03'
        F.substring("date", 9, 2).cast("int").cast("string").alias("day"),
    ).where((F.col("year") == year) & (F.col("month") == month))
    barcode = v.pred("barcode", s="sid", o="barcode")
    state = v.path2("state", "name", s="sid", o="state")
    hs = v.pred("has_segment", s="sid", o="gid")
    hagid = hs.join(v.value("segment_name", "HA", s="gid"), "gid")
    nagid = hs.join(v.value("segment_name", "NA", s="gid"), "gid")
    gb = v.pred("genbank_id", s="gid", o="gb", expand=False)
    h_gb = hagid.join(gb, "gid").select("sid", F.col("gb").alias("h_genbank"))
    n_gb = nagid.join(gb, "gid").select("sid", F.col("gb").alias("n_genbank"))
    ha_clade = hagid.join(v.pred("clade", s="gid", o="ha_clade"), "gid") \
        .select("sid", "ha_clade")
    na_clade = nagid.join(v.pred("clade", s="gid", o="na_clade"), "gid") \
        .select("sid", "na_clade")
    ha_gl = hagid.join(v.pred("gl_clade", s="gid", o="ha_gl_clade"), "gid") \
        .select("sid", "ha_gl_clade")
    source = hagid.join(
        v.path2("has_feature", "isolation_source", s="gid", o="source"), "gid"
    ).select("sid", "source")
    const = v.pred("constellation", s="sid", o="const")
    subtype = v.pred("subtype", s="sid", o="subtype")

    core = (
        strain.join(swine, "sid").join(country.select("sid").distinct(), "sid")
        .join(date, "sid").join(h_gb, "sid").join(n_gb, "sid")
    )
    opt = (
        core.join(barcode, "sid", "left").join(state, "sid", "left")
        .join(source, "sid", "left").join(const, "sid", "left")
        .join(subtype, "sid", "left").join(ha_clade, "sid", "left")
        .join(na_clade, "sid", "left").join(ha_gl, "sid", "left")
        .join(country, "sid", "left")
    )
    return opt.groupBy("strain", "host", "year", "month").agg(
        group_concat("barcode", "barcode"),
        group_concat("subtype", "subtype"),
        group_concat("day", "day"),
        group_concat("country", "country"),
        group_concat("state", "state"),
        group_concat("source", "source"),
        group_concat("h_genbank", "h_genbank"),
        group_concat("n_genbank", "n_genbank"),
        group_concat("const", "const"),
        group_concat("ha_clade", "ha_clade"),
        group_concat("na_clade", "na_clade"),
        group_concat("ha_gl_clade", "ha_gl_clade"),
    )


def monthly_context(v: GraphViews, min_date: str, max_date: str) -> DataFrame:
    """monthly-context.rq: sequences for recent A0 swine USA strains
    (collection date in [min_date, max_date]) or older strains with a
    full [PVT]{6} constellation after 2015; per (strain, segment,
    seq).

    Only xsd:date-typed (full) dates qualify: the reference FILTER
    compares ?date against xsd:date literals and applies YEAR(?date)
    (monthly-context.rq:28-30) — both type-error on gYear/gYearMonth
    partials, excluding the row (SPARQL error || error = error)."""
    barcode = v.pred("barcode", s="sid", o="barcode").where(
        F.col("barcode").rlike("^A0")
    )
    strain = v.pred("strain_name", s="sid", o="strain")
    swine = v.value("host", "swine", s="sid")
    usa = v.path2("country", "code", s="sid", o="_c").where(
        F.col("_c") == "USA").select("sid").distinct()
    date = v.pred_typed("date", s="sid", o="date").where(
        F.col("dt") == "xsd:date").select("sid", "date")
    subtype = v.pred("subtype", s="sid", o="subtype")
    const = v.pred("constellation", s="sid", o="const")
    hs = v.pred("has_segment", s="sid", o="gid")
    hagid = hs.join(v.value("segment_name", "HA", s="gid"), "gid") \
        .select("sid").distinct()
    nagid = hs.join(v.value("segment_name", "NA", s="gid"), "gid") \
        .select("sid").distinct()
    segname = v.pred("segment_name", s="gid", o="segment")
    seq = v.pred("dnaseq", s="gid", o="seq")
    ha_clade = (
        hs.join(v.value("segment_name", "HA", s="gid"), "gid")
        .join(v.pred("clade", s="gid", o="ha_clade"), "gid")
        .select("sid", "ha_clade")
    )
    na_clade = (
        hs.join(v.value("segment_name", "NA", s="gid"), "gid")
        .join(v.pred("clade", s="gid", o="na_clade"), "gid")
        .select("sid", "na_clade")
    )
    wgs_tag = (
        v.pred("tag", s="sid", o="_t")
        .join(v.pred("name", s="_t", o="_n", expand=False)
              .where(F.col("_n") == "wgs"), "_t")
        .select("sid", F.lit("wgs").alias("wgs"))
        .distinct()
    )
    core = (
        barcode.select("sid").distinct().join(strain, "sid").join(swine, "sid")
        .join(usa, "sid").join(date, "sid").join(subtype, "sid")
        .join(hagid, "sid").join(nagid, "sid")
        .join(const, "sid", "left").join(wgs_tag, "sid", "left")
    )
    year = F.substring("date", 1, 4).cast("int")
    keep = (
        ((F.col("date") > min_date) & (F.col("date") < max_date))
        | ((year > 2015) & F.col("const").isNotNull()
           & F.col("const").rlike("[PVT]{6}"))
    )
    core = core.where(keep)
    rows = (
        core.join(hs, "sid").join(segname, "gid").join(seq, "gid")
        .join(ha_clade, "sid").join(na_clade, "sid")
    )
    return rows.groupBy("strain", "segment", "seq").agg(
        group_concat("subtype", "subtypes"),
        F.min("date").alias("earliest_date"),
        group_concat("wgs", "wgss"),
        group_concat("const", "consts"),
        group_concat("ha_clade", "ha_clades"),
        group_concat("na_clade", "na_clades"),
    )


# --------------------------------------------------------------------------
# other shipped queries
# --------------------------------------------------------------------------

def unclassified_swine(v: GraphViews) -> DataFrame:
    """fetch-unclassified-swine.rq: swine segment sequences with no
    clade+segment_subtype classification (MINUS -> left_anti)."""
    swine = v.value("host", "swine", s="sid")
    hs = v.pred("has_segment", s="sid", o="gid")
    seqid = v.pred("seqid", s="gid", o="seqid")       # subproperty closure
    seq = v.pred("dnaseq", s="gid", o="seq")
    classified = (
        v.pred("clade", s="gid", o="_c")
        .join(v.pred("segment_subtype", s="gid", o="_ss"), "gid")
        .select("gid").distinct()
    )
    return (
        swine.join(hs, "sid").join(seqid, "gid").join(seq, "gid")
        .join(classified, "gid", "left_anti")
        .select("seqid", "seq").distinct()
    )


def h_swine_sequences(v: GraphViews, ha: str = "H1") -> DataFrame:
    """get-h1-swine.rq / get-h3-swine.rq: swine Hx segments missing
    motif annotations (FILTER NOT EXISTS over 5 motif patterns)."""
    swine = v.value("host", "swine", s="sid")
    hs = v.pred("has_segment", s="sid", o="gid")
    gb = v.pred("genbank_id", s="gid", o="gb", expand=False)
    hsub = v.value("segment_subtype", ha, s="gid")
    seq = v.pred("dnaseq", s="gid", o="seq")
    has_motifs = (
        v.pred("sa_motif", s="gid", o="_1", expand=False)
        .join(v.pred("sb_motif", s="gid", o="_2", expand=False), "gid")
        .join(v.pred("cb_motif", s="gid", o="_3", expand=False), "gid")
        .join(v.pred("ca1_motif", s="gid", o="_4", expand=False), "gid")
        .join(v.pred("ca2_motif", s="gid", o="_5", expand=False), "gid")
        .select("gid").distinct()
    )
    return (
        swine.join(hs, "sid").join(gb, "gid").join(hsub, "gid")
        .join(seq, "gid").join(has_motifs, "gid", "left_anti")
        .select("gb", "seq").distinct()
    )


def _tag_matched_sids(v: GraphViews) -> DataFrame:
    """The get-tagged-*.rq 4-branch UNION: subjects whose strain_name /
    isolate_name / barcode / segment seqid equals any query-tag value."""
    tags = v.pred("query_tag", s="_tid", o="tag").select("tag").distinct()
    by_strain = v.pred("strain_name", s="sid", o="tag")
    by_isolate = v.pred("isolate_name", s="sid", o="tag")
    by_barcode = v.pred("barcode", s="sid", o="tag")
    by_seqid = (
        v.pred("has_segment", s="sid", o="gid")
        .join(v.pred("seqid", s="gid", o="tag"), "gid")
        .select("sid", "tag")
    )
    return (
        by_strain.unionByName(by_isolate).unionByName(by_barcode)
        .unionByName(by_seqid)
        .join(F.broadcast(tags), "tag")
        .select("sid").distinct()
    )


def _tag_matched_sid_gids(v: GraphViews) -> DataFrame:
    """(sid, gid) pairs for get-tagged-segment/-sequence.rq: the
    seqid-tag branch binds the SAME ?gid as the query body's
    ``?sid f:has_segment ?gid . ?gid f:seqid ?seqid`` pattern, so a
    seqid match restricts the report to THAT segment — while the
    strain_name / isolate_name / barcode branches leave ?gid free
    (every segment of the matched subject)."""
    tags = v.pred("query_tag", s="_tid", o="tag").select("tag").distinct()
    hs = v.pred("has_segment", s="sid", o="gid")
    by_attr = (
        v.pred("strain_name", s="sid", o="tag")
        .unionByName(v.pred("isolate_name", s="sid", o="tag"))
        .unionByName(v.pred("barcode", s="sid", o="tag"))
        .join(F.broadcast(tags), "tag")
        .select("sid").distinct()
    )
    attr_pairs = by_attr.join(hs, "sid").select("sid", "gid")
    seqid_pairs = (
        hs.join(v.pred("seqid", s="gid", o="tag"), "gid")
        .join(F.broadcast(tags), "tag")
        .select("sid", "gid")
    )
    return attr_pairs.unionByName(seqid_pairs).distinct()


def _ha_clades(v: GraphViews, s: str = "sid") -> DataFrame:
    """The nested-OPTIONAL HA block shared by get-tagged-strain/
    -sequence/-isolate.rq: ``?hagid f:gl_clade ?gl_clade`` is REQUIRED
    inside the OPTIONAL and ``?hagid f:clade ?haclade`` is optional
    INSIDE it — so haclade may only bind on an HA segment that also
    carries gl_clade."""
    hs = v.pred("has_segment", s=s, o="gid")
    hagid = v.value("segment_name", "HA", s="gid")
    return (
        hs.join(hagid, "gid")
        .join(v.pred("gl_clade", s="gid", o="gl_clade"), "gid")
        .join(v.pred("clade", s="gid", o="haclade"), "gid", "left")
        .select(s, "gl_clade", "haclade")
    )


def tagged_strains(v: GraphViews) -> DataFrame:
    """get-tagged-strain.rq: 4-branch UNION matching query-tag values
    against strain_name / isolate_name / barcode / segment seqid, then
    per-strain aggregation.

    Reference-faithful quirks: the query SELECTs
    GROUP_CONCAT(?constellation) and GROUP_CONCAT(?country) but binds
    ?const and never binds ?country (get-tagged-strain.rq:15-16,40) —
    both columns are constitutively empty; and ?haclade is nested
    inside the gl_clade OPTIONAL (get-tagged-strain.rq:49-53)."""
    matched = _tag_matched_sids(v)
    strain = v.pred("strain_name", s="sid", o="strain")
    date = v.pred("date", s="sid", o="date")
    base = matched.join(strain, "sid").join(date, "sid")
    iso = v.pred("isolate_id", s="sid", o="isolate")
    host = v.pred("host", s="sid", o="host")
    subtype = v.pred("subtype", s="sid", o="subtype")
    nagid = v.value("segment_name", "NA", s="gid")
    hs = v.pred("has_segment", s="sid", o="gid")
    ha = _ha_clades(v, s="sid")
    na_clade = hs.join(nagid, "gid").join(
        v.pred("clade", s="gid", o="naclade"), "gid").select("sid", "naclade")
    out = (
        base.join(iso, "sid", "left").join(host, "sid", "left")
        .join(subtype, "sid", "left")
        .join(ha, "sid", "left").join(na_clade, "sid", "left")
    )
    return out.groupBy("strain").agg(
        group_concat("isolate", "isolates"),
        group_concat("host", "hosts"),
        group_concat("subtype", "subtypes"),
        group_concat("naclade", "naclades"),
        group_concat("haclade", "haclades"),
        group_concat("gl_clade", "gl_clades"),
        F.lit("").alias("constellations"),
        F.lit("").alias("countries"),
        F.min("date").alias("earliest_date"),
    )


_MAX_REPORT_SEGS = ["HA", "NA", "PB2", "PB1", "PA", "NP", "M", "NS"]


def tagged_max_report(v: GraphViews) -> DataFrame:
    """get-tagged.rq as INTENDED: the per-isolate "maximum" report with
    one seqid column per segment.

    The shipped reference query is broken and can never return rows —
    get-tagged.rq:76-79 binds ?msgid (undefined, typo for ?nsgid) and
    matches segment_name "MS" (no such segment; should be "NS") — so
    there is no golden to diff against.  This implements the evident
    intent: tagged isolates (the 4-branch tag match) with strain
    attributes, HA/NA clades, and per-segment seqids, using ONE
    conditional-aggregation pass over the segment relation instead of
    eight OPTIONAL self-joins (the plan shape that survives scale)."""
    matched = _tag_matched_sids(v)
    iso = v.pred("isolate_id", s="sid", o="isolate")
    strain = v.pred("strain_name", s="sid", o="strain")
    host = v.pred("host", s="sid", o="host")
    subtype = v.pred("subtype", s="sid", o="subtype")
    const = v.pred("constellation", s="sid", o="constellation")
    country = v.path2("country", "code", s="sid", o="country")
    date = v.pred("date", s="sid", o="date")

    hs = v.pred("has_segment", s="sid", o="gid")
    segname = v.pred("segment_name", s="gid", o="segment")
    seqid = v.pred("seqid", s="gid", o="seqid")
    clade = v.pred("clade", s="gid", o="clade")
    seg_rows = (
        hs.join(segname, "gid").join(seqid, "gid", "left")
        .join(clade, "gid", "left")
    )
    seg = F.col("segment")
    seg_wide = seg_rows.groupBy("sid").agg(
        *[
            F.concat_ws("+", F.sort_array(F.collect_set(
                F.when(seg == s, F.col("seqid"))))).alias(s)
            for s in _MAX_REPORT_SEGS
        ],
        F.concat_ws("+", F.sort_array(F.collect_set(
            F.when(seg == "HA", F.col("clade"))))).alias("haclade"),
        F.concat_ws("+", F.sort_array(F.collect_set(
            F.when(seg == "NA", F.col("clade"))))).alias("naclade"),
    )
    gl = (
        hs.join(v.value("segment_name", "HA", s="gid"), "gid")
        .join(v.pred("gl_clade", s="gid", o="gl_clade"), "gid")
        .select("sid", "gl_clade")
    )
    out = (
        matched.join(iso, "sid").join(strain, "sid")
        .join(host, "sid", "left").join(subtype, "sid", "left")
        .join(const, "sid", "left").join(country, "sid", "left")
        .join(date, "sid", "left").join(gl, "sid", "left")
        .join(seg_wide, "sid", "left")
    )
    return out.groupBy("isolate", "strain").agg(
        group_concat("host", "host"),
        group_concat("subtype", "subtype"),
        group_concat("naclade", "naclade"),
        group_concat("haclade", "haclade"),
        group_concat("gl_clade", "gl_clade"),
        group_concat("constellation", "constellation"),
        group_concat("country", "country"),
        F.min("date").alias("date"),
        *[group_concat(s, s) for s in _MAX_REPORT_SEGS],
    )


def all_accessions(v: GraphViews) -> DataFrame:
    """all-acc.rq: accessions with full genbank data (sequence +
    definition) stored."""
    gb = v.pred("genbank_id", s="gid", o="acc", expand=False)
    seq = v.pred("dnaseq", s="gid", o="_seq").select("gid").distinct()
    d = v.pred("definition", s="gid", o="_def").select("gid").distinct()
    return gb.join(seq, "gid").join(d, "gid").select("acc").distinct()


def h_sequences(v: GraphViews, subtype_prefix: str = "H1N") -> DataFrame:
    """get-h1-sequences.rq / get-h3-sequences.rq: HA segment sequences
    of strains whose subtype matches the prefix."""
    typed = v.pred("subtype", s="sid", o="_st").where(
        F.col("_st").rlike(subtype_prefix)
    ).select("sid").distinct()
    hs = v.pred("has_segment", s="sid", o="gid")
    ha = v.value("segment_name", "HA", s="gid")
    gb = v.pred("genbank_id", s="gid", o="seqid", expand=False)
    seq = v.pred("dnaseq", s="gid", o="seq")
    return (
        typed.join(hs, "sid").join(ha, "gid").join(gb, "gid").join(seq, "gid")
        .select("seqid", "seq").distinct()
    )


def tagged_segments(v: GraphViews) -> DataFrame:
    """get-tagged-segment.rq: per (dna_hash, strain) segment-level
    report for tag-matched subjects.  A seqid-tag match restricts to
    the matching segment (shared ?gid, get-tagged-segment.rq:26-32);
    the other branches cover every segment of the subject."""
    matched = _tag_matched_sid_gids(v)
    strain = v.pred("strain_name", s="sid", o="strain")
    seqid = v.pred("seqid", s="gid", o="_seqid").select("gid").distinct()
    segname = v.pred("segment_name", s="gid", o="segment_name")
    chks = v.pred("chksum", s="gid", o="dna_hash")
    base = (
        matched.join(strain, "sid")
        .join(seqid, "gid").join(segname, "gid").join(chks, "gid")
    )
    gb = v.pred("genbank_id", s="gid", o="gb", expand=False)
    epi = v.pred("epi_id", s="gid", o="epi", expand=False)
    clade = v.pred("clade", s="gid", o="clade")
    iso = v.pred("isolate_id", s="sid", o="isolate")
    out = (
        base.join(gb, "gid", "left").join(epi, "gid", "left")
        .join(clade, "gid", "left").join(iso, "sid", "left")
    )
    return out.groupBy("dna_hash", "strain").agg(
        group_concat("isolate", "epiflu_isolate_id"),
        group_concat("gb", "genbank_id"),
        group_concat("epi", "epiflu_id"),
        group_concat("segment_name", "segment_name"),
        group_concat("clade", "us_clade"),
    )


def tagged_sequences(v: GraphViews) -> DataFrame:
    """get-tagged-sequence.rq: per (strain, segment_name, seq) with
    strain-level concats, for tag-matched subjects with sequences.

    Reference-faithful quirks (get-tagged-sequence.rq): a seqid-tag
    match restricts to the matching segment (shared ?gid); ?haclade is
    nested inside the gl_clade OPTIONAL; the SELECT concats unbound
    ?constellation/?country (binds ?const, never ?country) so both
    columns are constitutively empty."""
    matched = _tag_matched_sid_gids(v)
    strain = v.pred("strain_name", s="sid", o="strain")
    seqid = v.pred("seqid", s="gid", o="_sq").select("gid").distinct()
    seq = v.pred("dnaseq", s="gid", o="seq")
    segname = v.pred("segment_name", s="gid", o="segment_name")
    date = v.pred("date", s="sid", o="date")
    core = (
        matched.join(strain, "sid").join(seqid, "gid")
        .join(seq, "gid").join(segname, "gid").join(date, "sid")
    )
    iso = v.pred("isolate_id", s="sid", o="isolate")
    host = v.pred("host", s="sid", o="host")
    subtype = v.pred("subtype", s="sid", o="subtype")
    nagid = v.value("segment_name", "NA", s="gid")
    hs2 = v.pred("has_segment", s="sid", o="gid")
    ha = _ha_clades(v, s="sid")
    na_clade = hs2.join(nagid, "gid").join(
        v.pred("clade", s="gid", o="naclade"), "gid").select("sid", "naclade")
    out = (
        core.join(iso, "sid", "left").join(host, "sid", "left")
        .join(subtype, "sid", "left")
        .join(ha, "sid", "left").join(na_clade, "sid", "left")
    )
    return out.groupBy("strain", "segment_name", "seq").agg(
        group_concat("isolate", "isolates"),
        group_concat("host", "hosts"),
        group_concat("subtype", "subtypes"),
        group_concat("naclade", "naclades"),
        group_concat("haclade", "haclades"),
        group_concat("gl_clade", "gl_clades"),
        F.lit("").alias("constellations"),
        F.lit("").alias("countries"),
        F.min("date").alias("earliest_date"),
    )


def tagged_isolates(v: GraphViews) -> DataFrame:
    """get-tagged-isolate.rq: isolate-level view.  Its UNION differs
    from the other variants: tags match ?sid strain_name / barcode OR
    ?lid isolate_id / segment-seqid (get-tagged-isolate.rq:21-30), and
    the two entity roles join through the shared strain NAME — a
    strain/barcode match reaches the isolate via that join.  Quirks as
    in the other variants: nested haclade OPTIONAL; SELECT concats the
    never-bound ?constellation/?country, so both columns are
    constitutively empty."""
    tags = v.pred("query_tag", s="_tid", o="tag").select("tag").distinct()
    # sid-side branches -> the set of matched strain NAMES
    m_sid = (
        v.pred("strain_name", s="sid", o="tag")
        .unionByName(v.pred("barcode", s="sid", o="tag"))
        .join(F.broadcast(tags), "tag").select("sid").distinct()
    )
    m_strains = m_sid.join(
        v.pred("strain_name", s="sid", o="strain"), "sid"
    ).select("strain").distinct()
    # lid-side branches -> matched isolate entities directly
    hs = v.pred("has_segment", s="lid", o="gid")
    m_lid = (
        v.pred("isolate_id", s="lid", o="tag")
        .unionByName(hs.join(v.pred("seqid", s="gid", o="tag"), "gid")
                     .select("lid", "tag"))
        .join(F.broadcast(tags), "tag").select("lid").distinct()
    )
    iso = v.pred("isolate_id", s="lid", o="isolate")
    strain_l = v.pred("strain_name", s="lid", o="strain")
    date = v.pred("date", s="lid", o="date")
    lids_all = iso.join(strain_l, "lid").join(date, "lid")
    lids = (
        lids_all.join(m_lid, "lid")
        .unionByName(lids_all.join(F.broadcast(m_strains), "strain"))
        .distinct()
    )
    host = v.pred("host", s="lid", o="host")
    # ?sid f:strain_name ?strain ranges over EVERY entity sharing the
    # strain name; subtype is OPTIONAL per such sid
    subtype = (
        v.pred("strain_name", s="sid2", o="strain")
        .join(v.pred("subtype", s="sid2", o="subtype"), "sid2")
        .select("strain", "subtype").distinct()
    )
    nagid = v.value("segment_name", "NA", s="gid")
    ha = _ha_clades(v, s="lid")
    na_clade = hs.join(nagid, "gid").join(
        v.pred("clade", s="gid", o="naclade"), "gid").select("lid", "naclade")
    out = (
        lids.join(host, "lid", "left").join(subtype, "strain", "left")
        .join(ha, "lid", "left").join(na_clade, "lid", "left")
    )
    return out.groupBy("isolate").agg(
        group_concat("strain", "strains"),
        group_concat("host", "hosts"),
        group_concat("subtype", "subtypes"),
        group_concat("naclade", "naclades"),
        group_concat("haclade", "haclades"),
        group_concat("gl_clade", "gl_clades"),
        F.lit("").alias("constellations"),
        F.lit("").alias("countries"),
        F.min("date").alias("earliest_date"),
    )
