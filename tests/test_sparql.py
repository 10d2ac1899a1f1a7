"""SPARQL-subset compiler (plans/sparql.py): parse smoke over every
shipped reference .rq file, unit semantics on a tiny graph, and
differential equivalence against the hand-built named plans on a real
built store — compiled reference queries must produce the same rows
as the plans that were validated against the reference pipeline."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from octofludb_spark.plans.sparql import (
    SparqlError,
    compile_sparql,
    parse_sparql,
)

RQ_DIR = "/root/reference/octofludb/data"
NT = "https://flu-crew.org/term/"
FID = "https://flu-crew.org/id/"


def _t(spark, rows):
    return spark.createDataFrame(
        [(s, NT + p if "://" not in p else p, o, dt)
         for (s, p, o, dt) in rows],
        "subject string, predicate string, object_lex string, "
        "object_dtype string",
    )


def _run(spark, triples, text, macros=None):
    ast = parse_sparql(text, macros=macros)
    return compile_sparql(ast, triples)


# -------------------------------------------------------------------------
# parse smoke: every shipped SELECT query parses
# -------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(RQ_DIR), reason="reference not present")
def test_parse_all_shipped_select_queries():
    parsed = 0
    for path in sorted(glob.glob(os.path.join(RQ_DIR, "*.rq"))):
        if path.endswith("get-tagged.rq"):
            continue  # genuinely invalid SPARQL (bare `?haid as HA`
            # projections, get-tagged.rq:16-23) — the reference ships
            # it broken; the intended report is `query tagged-max`
        text = open(path).read()
        if "SELECT" not in text.upper():
            continue  # delete-*.rq / clear-query-tags.rq are updates
        macros = {"__YEAR__": "2018", "__MONTH__": "3",
                  "__MIN_DATE__": "2017-01-01", "__MAX_DATE__": "2019-01-01"}
        ast = parse_sparql(text, macros=macros)
        assert ast["projections"], path
        parsed += 1
    assert parsed >= 15  # 16 SELECT files ship with the reference


# -------------------------------------------------------------------------
# unit semantics on a tiny graph
# -------------------------------------------------------------------------

TINY = [
    ("s1", "strain_name", "A/swine/Iowa/A01", ""),
    ("s1", "host", "swine", ""),
    ("s1", "date", "2018-03-05", "xsd:date"),
    ("s1", "has_segment", "g1", "uri"),
    ("s2", "strain_name", "A/duck/Texas/77", ""),
    ("s2", "host", "duck", ""),
    ("s2", "date", "2016", "xsd:gYear"),
    ("s2", "has_segment", "g2", "uri"),
    ("g1", "segment_name", "HA", ""),
    ("g1", "clade", "1A.1", ""),
    ("g2", "segment_name", "NA", ""),
    ("s1", "subtype", "H1N1", ""),
]

PFX = f"PREFIX f: <{NT}>\n"


def test_bgp_join_and_literal_object(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain WHERE {
          ?sid f:host "swine" .
          ?sid f:strain_name ?strain .
        }""")
    assert [r.strain for r in df.collect()] == ["A/swine/Iowa/A01"]


def test_optional_yields_null(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain ?clade WHERE {
          ?sid f:strain_name ?strain .
          ?sid f:has_segment ?gid .
          OPTIONAL { ?gid f:clade ?clade . }
        }""")
    got = {(r.strain, r.clade) for r in df.collect()}
    assert got == {("A/swine/Iowa/A01", "1A.1"), ("A/duck/Texas/77", None)}


def test_union_branches(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT DISTINCT ?sid WHERE {
          { ?sid f:host "duck" . } UNION { ?sid f:subtype ?st . }
        }""")
    assert {r.sid for r in df.collect()} == {"s1", "s2"}


def test_filter_regex_and_not_exists(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain WHERE {
          ?sid f:strain_name ?strain .
          FILTER REGEX(?strain, "^A/") .
          FILTER NOT EXISTS { ?sid f:subtype ?st . }
        }""")
    assert [r.strain for r in df.collect()] == ["A/duck/Texas/77"]


def test_property_path_and_group_concat(spark):
    rows = TINY + [("s1", "state", "st_ia", "uri"), ("st_ia", "abbr", "IA", "")]
    df = _run(spark, _t(spark, rows), PFX + """
        SELECT ?strain
               (GROUP_CONCAT(DISTINCT ?abbr; separator="+") as ?states)
        WHERE {
          ?sid f:strain_name ?strain .
          ?sid f:state/f:abbr ?abbr .
        } GROUP BY ?strain""")
    assert [(r.strain, r.states) for r in df.collect()] == \
        [("A/swine/Iowa/A01", "IA")]


def test_bind_year_month_and_typed_date_guard(spark):
    # s2's date is a gYear: YEAR() of it is null => BOUND filter drops;
    # the xsd:date-typed comparison also drops it (SPARQL type error)
    df = _run(spark, _t(spark, TINY), PFX + """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?strain ?year WHERE {
          ?sid f:strain_name ?strain .
          ?sid f:date ?date .
          BIND(YEAR(?date) as ?year) .
          FILTER BOUND(?year) .
          FILTER (?date > "2017-01-01"^^xsd:date) .
        }""")
    assert [(r.strain, r.year) for r in df.collect()] == \
        [("A/swine/Iowa/A01", 2018)]


def test_filter_before_optional_sees_later_binding(spark):
    # monthly-context.rq shape: the FILTER references ?clade which only
    # binds in a LATER OPTIONAL — group-end filter semantics
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain WHERE {
          ?sid f:strain_name ?strain .
          FILTER (BOUND(?clade) || REGEX(?strain, "duck")) .
          ?sid f:has_segment ?gid .
          OPTIONAL { ?gid f:clade ?clade . }
        }""")
    assert {r.strain for r in df.collect()} == \
        {"A/swine/Iowa/A01", "A/duck/Texas/77"}


def test_minus_shared_var(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid WHERE {
          ?sid f:has_segment ?gid .
          MINUS { ?sid f:subtype ?st . }
        }""")
    assert [r.sid for r in df.collect()] == ["s2"]


def test_subproperty_closure_expansion(spark):
    # f:seqid expands to genbank_id/epi_id (schema.ttl subPropertyOf)
    rows = TINY + [("g1", "genbank_id", "KX12345", "")]
    df = _run(spark, _t(spark, rows), PFX + """
        SELECT ?acc WHERE { ?gid f:seqid ?acc . }""")
    assert [r.acc for r in df.collect()] == ["KX12345"]


def test_union_partial_var_then_join_compat(spark):
    # get-tagged-segment.rq shape: one UNION branch binds ?gid, others
    # leave it unbound; a later pattern joins ?gid — unbound must stay
    # compatible (match anything), not null-key-drop
    rows = TINY + [("s1", "barcode", "A01", "")]
    df = _run(spark, _t(spark, rows), PFX + """
        SELECT DISTINCT ?sid ?seg WHERE {
          { ?sid f:barcode "A01" . }
          UNION
          { ?sid f:has_segment ?gid . ?gid f:segment_name "NA" . }
          ?sid f:has_segment ?gid .
          ?gid f:segment_name ?seg .
        }""")
    got = {(r.sid, r.seg) for r in df.collect()}
    assert got == {("s1", "HA"), ("s2", "NA")}


def test_unbound_filter_var_raises(spark):
    with pytest.raises(SparqlError, match="unbound var"):
        _run(spark, _t(spark, TINY), PFX + """
            SELECT ?s WHERE { ?s f:host ?h . FILTER (?nope = "x") . }""")


# -------------------------------------------------------------------------
# differential: compiled reference .rq == hand-built named plan
# -------------------------------------------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from octofludb_spark.build import build_graph
    from octofludb_spark.plans.views import GraphViews
    from octofludb_spark.sources.synth import source_table

    from octofludb_spark.plans.enrich import (
        enrich_classifications,
        enrich_constellations,
        enrich_subtypes,
    )

    root = str(tmp_path_factory.mktemp("sparql") / "store")
    # 600 docs: enough corpus density that some strain passes monthly-
    # context.rq's full gauntlet (barcode+swine+USA+date+subtype+HA+NA
    # with clades on both)
    store = build_graph(spark, source_table(spark, 600, partitions=8),
                        root, run_ts="t")
    # the pull DAG's enrichment rounds add clades/constellations/
    # subtypes — monthly-context.rq REQUIRES ha/na clades (inner join)
    enrich_classifications(spark, store)
    enrich_constellations(spark, store)
    enrich_subtypes(spark, store)
    raw = store.read(spark, "triples")
    return store, raw, GraphViews(raw)


def _rq(name):
    return open(os.path.join(RQ_DIR, name)).read()


def _rows(df):
    return {tuple("" if v is None else str(v) for v in r) for r in df.collect()}


needs_ref = pytest.mark.skipif(not os.path.isdir(RQ_DIR),
                               reason="reference not present")


@needs_ref
def test_rq_all_acc_matches_plan(spark, built):
    from octofludb_spark.plans.reports import all_accessions

    _store, raw, v = built
    got = _run(spark, raw, _rq("all-acc.rq"))
    want = all_accessions(v)
    assert _rows(got), "fixture produced no accessions"
    assert _rows(got) == _rows(want.select(*want.columns))


@needs_ref
def test_rq_segments_matches_plan(spark, built):
    from octofludb_spark.plans.reports import segments_query

    _store, raw, v = built
    got = _run(spark, raw, _rq("segments.rq"))
    want = segments_query(v).select("strain", "segment", "clade")
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_subtypes_matches_plan(spark, built):
    from octofludb_spark.plans.reports import subtypes_query

    _store, raw, v = built
    got = _run(spark, raw, _rq("subtypes.rq")).select(
        "strain_name", "segment_name", "isolates", "segment_subtypes",
        "gisaid_subtypes", "genbank_subtypes")
    want = subtypes_query(v).select(
        "strain_name", "segment_name", "isolates", "segment_subtypes",
        "gisaid_subtypes", "genbank_subtypes")
    assert _rows(got), "fixture produced no subtype rows"
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_h1_sequences_matches_plan(spark, built):
    from octofludb_spark.plans.reports import h_sequences

    _store, raw, v = built
    got = _run(spark, raw, _rq("get-h1-sequences.rq"))
    want = h_sequences(v, "H1N").select("seqid", "seq")
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_unclassified_swine_matches_plan(spark, built):
    from octofludb_spark.plans.reports import unclassified_swine

    _store, raw, v = built
    got = _run(spark, raw, _rq("fetch-unclassified-swine.rq"))
    want = unclassified_swine(v).select("seqid", "seq")
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_masterlist_matches_plan(spark, built):
    from octofludb_spark.plans.reports import masterlist_query

    _store, raw, v = built
    want = masterlist_query(v)
    got = _run(spark, raw, _rq("masterlist.rq")).select(*want.columns)
    assert _rows(got), "fixture produced no masterlist rows"
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_wgs_matches_plan(spark, built):
    from octofludb_spark.plans.reports import wgs_report

    _store, raw, v = built
    # pick a (year, month) that exists in the fixture
    y_m = (
        v.pred_typed("date", s="sid", o="d")
        .where(F.col("dt") == "xsd:date")
        .select(F.substring("d", 1, 4).cast("int").alias("y"),
                F.substring("d", 6, 2).cast("int").alias("m"))
        .groupBy("y", "m").count().orderBy(F.desc("count")).first()
    )
    year, month = int(y_m.y), int(y_m.m)
    want = wgs_report(v, year, month)
    got = _run(spark, raw, _rq("wgs.rq"),
               macros={"__YEAR__": year, "__MONTH__": month})
    got = got.select(*want.columns)
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_monthly_context_matches_plan(spark, built):
    from octofludb_spark.plans.reports import monthly_context

    _store, raw, v = built
    lo, hi = "2000-01-01", "2100-01-01"
    want = monthly_context(v, lo, hi)
    got = _run(spark, raw, _rq("monthly-context.rq"),
               macros={"__MIN_DATE__": lo, "__MAX_DATE__": hi})
    got = got.select(*want.columns)
    assert _rows(got), "fixture produced no monthly-context rows"
    assert _rows(got) == _rows(want)


@pytest.fixture(scope="module")
def tagged(spark, built):
    """Tag two strain names and one segment seqid (hits 3 of the 4
    UNION branches) and return the re-read store view."""
    from octofludb_spark.plans import maintenance as M
    from octofludb_spark.plans.views import GraphViews

    store, raw, v = built
    # tag strains whose segments carry a chksum+seqid (the segment
    # report requires both), plus one raw genbank accession
    chk = (
        v.pred("strain_name", s="sid", o="strain")
        .join(v.pred("has_segment", s="sid", o="gid"), "sid")
        .join(v.pred("chksum", s="gid", o="_c"), "gid")
        .join(v.pred("seqid", s="gid", o="acc"), "gid")
    )
    strains = [r.strain for r in
               chk.select("strain").distinct().limit(2).collect()]
    gb = [r.acc for r in chk.select("acc").distinct().limit(1).collect()]
    ids = strains + gb
    assert len(ids) >= 2
    store.merge_triples(spark, M.query_tag_triples(spark, ids))
    raw2 = store.read(spark, "triples")
    return raw2, GraphViews(raw2)


@needs_ref
def test_rq_tagged_segment_matches_plan(spark, tagged):
    from octofludb_spark.plans.reports import tagged_segments

    raw2, v2 = tagged
    want = tagged_segments(v2)
    got = _run(spark, raw2, _rq("get-tagged-segment.rq")).select(*want.columns)
    assert _rows(got), "no tag-matched segments in fixture"
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_tagged_strain_matches_plan(spark, tagged):
    from octofludb_spark.plans.reports import tagged_strains

    raw2, v2 = tagged
    want = tagged_strains(v2)
    got = _run(spark, raw2, _rq("get-tagged-strain.rq")).select(*want.columns)
    assert _rows(got), "no tag-matched strains in fixture"
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_tagged_isolate_matches_plan(spark, tagged):
    from octofludb_spark.plans.reports import tagged_isolates

    raw2, v2 = tagged
    want = tagged_isolates(v2)
    got = _run(spark, raw2, _rq("get-tagged-isolate.rq")).select(*want.columns)
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_tagged_sequence_matches_plan(spark, tagged):
    from octofludb_spark.plans.reports import tagged_sequences

    raw2, v2 = tagged
    want = tagged_sequences(v2)
    got = _run(spark, raw2, _rq("get-tagged-sequence.rq")).select(*want.columns)
    assert _rows(got), "no tag-matched sequences in fixture"
    assert _rows(got) == _rows(want)


@needs_ref
def test_rq_h3_sequences_matches_plan(spark, built):
    from octofludb_spark.plans.reports import h_sequences

    _store, raw, v = built
    got = _run(spark, raw, _rq("get-h3-sequences.rq"))
    want = h_sequences(v, "H3N").select("seqid", "seq")
    assert _rows(got), "fixture produced no H3N sequences"
    assert _rows(got) == _rows(want)


@needs_ref
@pytest.mark.parametrize("rq,ha", [("get-h1-swine.rq", "H1"),
                                   ("get-h3-swine.rq", "H3")])
def test_rq_h_swine_matches_plan(spark, built, rq, ha):
    from octofludb_spark.plans.reports import h_swine_sequences

    _store, raw, v = built
    got = _run(spark, raw, _rq(rq))
    want = h_swine_sequences(v, ha).select("gb", "seq")
    assert _rows(got), f"fixture produced no {ha} swine sequences"
    assert _rows(got) == _rows(want)


def test_cli_query_rq_file(spark, built, tmp_path, capsys):
    """`query <store> file.rq` end-to-end through the CLI."""
    from octofludb_spark import cli

    store, _raw, _v = built
    rq = str(tmp_path / "acc.rq")
    with open(rq, "w") as f:
        f.write(
            "PREFIX f: <https://flu-crew.org/term/>\n"
            "PREFIX onto: <http://www.ontotext.com/>\n"
            "SELECT DISTINCT ?acc FROM onto:disable-sameAs WHERE {\n"
            "  ?gid f:genbank_id ?acc . ?gid f:dnaseq ?seq .\n"
            "}\n")
    assert cli.main(["query", store.root, rq]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "acc"
    assert len(out) > 1


# -------------------------------------------------------------------------
# SPARQL UPDATE (DELETE/WHERE): the reference's update FILE.rq surface
# -------------------------------------------------------------------------

@needs_ref
def test_sparql_update_delete_files(spark, tmp_path):
    """Run the shipped delete-*.rq / clear-query-tags.rq files through
    sparql_update on a real store: exact template semantics, canonical
    mirror kept in sync."""
    import pandas as pd

    from octofludb_spark.build import build_graph
    from octofludb_spark.plans import maintenance as M
    from octofludb_spark.plans.sparql import sparql_update
    from octofludb_spark.sources.synth import source_table

    FT = "https://flu-crew.org/term/"
    store = build_graph(spark, source_table(spark, 60, partitions=4),
                        str(tmp_path / "st"), run_ts="t")
    extra = spark.createDataFrame(pd.DataFrame({
        "subject": ["g_m", "g_m", "g_m", "s_x"],
        "predicate": [FT + "genbank_id", FT + "h3_motif",
                      FT + "description", FT + "subtype"],
        "object_lex": ["KX999", "MOTIFVAL", "MOTIFVAL", "H9N9"],
        "object_dtype": ["", "", "", ""],
    }))
    store.merge_triples(spark, extra)
    raw = store.read(spark, "triples")

    # delete-motifs.rq: DELETE { ?s ?p ?motif } — removes the motif
    # triple AND the same-valued description triple (the reference
    # query's any-predicate template), but NOT the genbank_id
    n = sparql_update(spark, store,
                      open(os.path.join(RQ_DIR, "delete-motifs.rq")).read())
    assert n == 2
    after = store.read(spark, "triples").where(F.col("subject") == "g_m")
    assert {r.predicate for r in after.collect()} == {FT + "genbank_id"}

    # delete-subtypes.rq: every f:subtype triple goes, raw + canonical
    assert store.read(spark, "triples").where(
        F.col("predicate") == FT + "subtype").count() > 0
    sparql_update(spark, store,
                  open(os.path.join(RQ_DIR, "delete-subtypes.rq")).read())
    for table in ("triples", "triples_canonical"):
        assert store.read(spark, table).where(
            F.col("predicate") == FT + "subtype").count() == 0

    # clear-query-tags.rq round-trip
    store.merge_triples(spark, M.query_tag_triples(spark, ["KX999"]))
    qt = F.col("predicate") == FT + "query_tag"
    assert store.read(spark, "triples").where(qt).count() == 1
    n = sparql_update(spark, store,
                      open(os.path.join(RQ_DIR,
                                        "clear-query-tags.rq")).read())
    assert n == 1
    assert store.read(spark, "triples").where(qt).count() == 0


@needs_ref
def test_cli_update_rq_file(spark, tmp_path, capsys):
    from octofludb_spark import cli
    from octofludb_spark.build import build_graph
    from octofludb_spark.sources.synth import source_table

    store = build_graph(spark, source_table(spark, 40, partitions=2),
                        str(tmp_path / "st"), run_ts="t")
    rq = os.path.join(RQ_DIR, "delete-constellations.rq")
    assert cli.main(["update", store.root, rq]) == 0
    assert "deleted" in capsys.readouterr().err


def test_update_insert_rejected(spark):
    from octofludb_spark.plans.sparql import parse_sparql_update

    with pytest.raises(SparqlError, match="INSERT"):
        parse_sparql_update(
            "INSERT { ?s <urn:p> 1 . } WHERE { ?s <urn:q> ?o . }")


# -------------------------------------------------------------------------
# CONSTRUCT
# -------------------------------------------------------------------------

def test_construct_produces_triples(spark):
    from octofludb_spark.plans.sparql import (
        compile_construct,
        parse_sparql_construct,
    )

    ast = parse_sparql_construct(PFX + """
        CONSTRUCT { ?sid f:derived_clade ?clade . }
        WHERE {
          ?sid f:has_segment ?gid .
          ?gid f:clade ?clade .
        }""")
    out = compile_construct(ast, _t(spark, TINY))
    rows = {(r.subject, r.predicate, r.object_lex, r.object_dtype)
            for r in out.collect()}
    assert rows == {("s1", NT + "derived_clade", "1A.1", "")}


def test_construct_uri_object_dtype(spark):
    # the object var binds subjects elsewhere in WHERE => emitted as uri
    from octofludb_spark.plans.sparql import (
        compile_construct,
        parse_sparql_construct,
    )

    ast = parse_sparql_construct(PFX + """
        CONSTRUCT { ?gid f:part_of ?sid . }
        WHERE { ?sid f:has_segment ?gid . ?gid f:segment_name "HA" . }""")
    out = compile_construct(ast, _t(spark, TINY))
    rows = {(r.subject, r.object_lex, r.object_dtype) for r in out.collect()}
    assert rows == {("g1", "s1", "uri")}


def test_cli_construct_rq_file(spark, tmp_path, capsys):
    from octofludb_spark import cli
    from octofludb_spark.build import build_graph
    from octofludb_spark.sources.synth import source_table

    store = build_graph(spark, source_table(spark, 40, partitions=2),
                        str(tmp_path / "st"), run_ts="t")
    rq = str(tmp_path / "c.rq")
    with open(rq, "w") as f:
        f.write(
            "PREFIX f: <https://flu-crew.org/term/>\n"
            "CONSTRUCT { ?sid f:is_strain \"yes\" . }\n"
            "WHERE { ?sid f:strain_name ?n . }\n")
    assert cli.main(["construct", store.root, rq]) == 0
    out = capsys.readouterr().out
    assert 'f:is_strain "yes"' in out


# -------------------------------------------------------------------------
# physical-plan audit: compiled queries must stay hash-joinable
# -------------------------------------------------------------------------

@needs_ref
def test_compiled_plans_have_no_nested_loop_joins(spark, built):
    """The unbound-compatibility residual must ride on equi hash keys,
    never degrade to BroadcastNestedLoopJoin/CartesianProduct — at
    100 TB a nested-loop self-join of the triple relation is fatal."""
    _store, raw, _v = built
    for name in ("get-tagged-segment.rq", "masterlist.rq",
                 "get-tagged-strain.rq", "subtypes.rq"):
        df = _run(spark, raw, _rq(name))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


@needs_ref
def test_compiled_scan_pushes_predicate_filter(spark, built):
    """Each triple-pattern scan filters on `predicate` at the parquet
    source (PushedFilters), so a pattern reads one predicate's rows,
    not the whole relation."""
    _store, raw, _v = built
    df = _run(spark, raw, PFX + """
        SELECT ?s ?o WHERE { ?s f:strain_name ?o . }""")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "predicate" in plan


# -------------------------------------------------------------------------
# star-pivot rewrite: fires only when provably multiplicity-safe
# -------------------------------------------------------------------------

def _rewrite_vars(text):
    from octofludb_spark.plans.sparql import _star_pivot_rewrite

    _w, arr = _star_pivot_rewrite(parse_sparql(text))
    return arr


STAR_Q = PFX + """
    SELECT ?strain
           (GROUP_CONCAT(DISTINCT ?host; separator="+") as ?hosts)
           (MIN(?date) as ?earliest)
    WHERE {
      ?sid f:strain_name ?strain .
      ?sid f:host ?host .
      ?sid f:date ?date .
    } GROUP BY ?strain"""


def test_pivot_rewrite_fires_on_star():
    assert _rewrite_vars(STAR_Q) == {"host", "date"}


def test_pivot_rewrite_blocked_by_dup_sensitive_agg():
    q = STAR_Q.replace("GROUP_CONCAT(DISTINCT ?host", "GROUP_CONCAT(?host")
    assert _rewrite_vars(q) == set()


def test_pivot_rewrite_blocked_by_filter_use():
    q = STAR_Q.replace("} GROUP BY",
                       'FILTER (?host = "swine") . } GROUP BY')
    # ?host is used in a FILTER -> not collapsible; ?date alone is a
    # single-pattern group -> no pivot either
    assert _rewrite_vars(q) == set()


def test_pivot_rewrite_same_answer(spark):
    """Rewritten and unrewritten plans agree (the TINY graph has a
    subject with multiple hosts/dates shapes)."""
    from octofludb_spark.plans import sparql as S

    rows = TINY + [("s1", "host", "human", ""),  # second host value
                   ("s1", "date", "2018-03-05", "xsd:date")]  # dup triple... dedup'd upstream
    t = _t(spark, rows)
    with_rw = _run(spark, t, STAR_Q)
    got = {tuple(r) for r in with_rw.collect()}
    # force the unrewritten path by faking a dup-sensitive agg check
    ast = S.parse_sparql(STAR_Q)
    df_plain, _ = S._compile_group(ast["where"], t)
    from pyspark.sql import functions as F2
    want = {tuple(r) for r in (
        df_plain.groupBy("strain").agg(
            F2.concat_ws("+", F2.sort_array(F2.collect_set("host")))
            .alias("hosts"),
            F2.min("date").alias("earliest"))
        .select("strain", "hosts", "earliest").collect())}
    assert got == want and got


# -------------------------------------------------------------------------
# VALUES + n-ary builtins
# -------------------------------------------------------------------------

def test_values_single_var(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid ?host WHERE {
          VALUES ?host { "swine" "duck" }
          ?sid f:host ?host .
        }""")
    assert {(r.sid, r.host) for r in df.collect()} == \
        {("s1", "swine"), ("s2", "duck")}


def test_values_multi_var_with_undef(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid ?host ?seg WHERE {
          ?sid f:host ?host .
          ?sid f:has_segment ?gid .
          ?gid f:segment_name ?seg .
          VALUES (?host ?seg) { ("swine" "HA") ("duck" UNDEF) }
        }""")
    assert {(r.sid, r.host, r.seg) for r in df.collect()} == \
        {("s1", "swine", "HA"), ("s2", "duck", "NA")}


def test_nary_builtins(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid ?tag ?after WHERE {
          ?sid f:strain_name ?n .
          FILTER STRSTARTS(?n, "A/swine") .
          BIND(CONCAT("strain:", ?n) as ?tag) .
          BIND(STRAFTER(?n, "A/swine/") as ?after) .
        }""")
    rows = [(r.sid, r.tag, r.after) for r in df.collect()]
    assert rows == [("s1", "strain:A/swine/Iowa/A01", "Iowa/A01")]


def test_substr_and_strbefore(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?y ?state WHERE {
          ?sid f:date ?d .
          FILTER CONTAINS(?d, "-") .
          BIND(SUBSTR(?d, 1, 4) as ?y) .
          BIND(STRBEFORE(?d, "-") as ?state) .
        }""")
    assert [(r.y, r.state) for r in df.collect()] == [("2018", "2018")]


def test_order_limit_offset(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain WHERE { ?sid f:strain_name ?strain . }
        ORDER BY ?strain LIMIT 1 OFFSET 1""")
    assert [r.strain for r in df.collect()] == ["A/swine/Iowa/A01"]


# -------------------------------------------------------------------------
# query forms: ASK / DESCRIBE / SELECT * ; decorated property paths
# -------------------------------------------------------------------------

def test_ask_true_and_false(spark):
    t = _t(spark, TINY)
    yes = _run(spark, t, PFX + 'ASK { ?sid f:host "swine" . }')
    assert [r.ask for r in yes.collect()] == [True]
    no = _run(spark, t, PFX + 'ASK WHERE { ?sid f:host "emu" . }')
    assert [r.ask for r in no.collect()] == [False]


def test_ask_with_filter(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        ASK { ?sid f:date ?d . FILTER (YEAR(?d) > 2017) . }""")
    assert [r.ask for r in df.collect()] == [True]


def test_describe_iri_and_var(spark):
    t = _t(spark, TINY)
    by_iri = _run(spark, t, f"DESCRIBE <g1>")
    assert {(r.subject, r.predicate.split("/")[-1], r.object_lex)
            for r in by_iri.collect()} == {
        ("g1", "segment_name", "HA"), ("g1", "clade", "1A.1")}
    by_var = _run(spark, t, PFX + """
        DESCRIBE ?gid WHERE { ?sid f:host "duck" .
                              ?sid f:has_segment ?gid . }""")
    assert {(r.subject, r.object_lex) for r in by_var.collect()} == {
        ("g2", "NA")}


def test_describe_var_without_where_rejected():
    with pytest.raises(SparqlError):
        parse_sparql("DESCRIBE ?x")


def test_select_star(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT * WHERE {
          ?sid f:host "swine" . ?sid f:strain_name ?strain . }""")
    assert sorted(df.columns) == ["sid", "strain"]
    assert [(r.sid, r.strain) for r in df.collect()] == [
        ("s1", "A/swine/Iowa/A01")]


def test_path_inverse_and_alternation(spark):
    t = _t(spark, TINY)
    inv = _run(spark, t, PFX + """
        SELECT ?sid WHERE { ?gid ^f:has_segment ?sid .
                            ?gid f:segment_name "HA" . }""")
    assert [r.sid for r in inv.collect()] == ["s1"]
    alt = _run(spark, t, PFX + """
        SELECT DISTINCT ?v WHERE { ?sid (f:host|f:subtype) ?v . }""")
    assert {r.v for r in alt.collect()} == {"swine", "duck", "H1N1"}


def test_path_transitive_closure(spark):
    chain = _t(spark, [
        ("a", "locatedIn", "b", "uri"),
        ("b", "locatedIn", "c", "uri"),
        ("c", "locatedIn", "d", "uri"),
        ("x", "name", "X", ""),
    ])
    plus = _run(spark, chain, PFX + """
        SELECT ?o WHERE { <a> f:locatedIn+ ?o . }""")
    assert {r.o for r in plus.collect()} == {"b", "c", "d"}
    opt = _run(spark, chain, PFX + """
        SELECT ?o WHERE { <a> f:locatedIn? ?o . }""")
    assert {r.o for r in opt.collect()} == {"a", "b"}


def test_negated_property_set(spark):
    t = _t(spark, TINY)
    simple = _run(spark, t, PFX + """
        SELECT DISTINCT ?v WHERE { <s1> !f:has_segment ?v . }""")
    assert {r.v for r in simple.collect()} == {
        "A/swine/Iowa/A01", "swine", "2018-03-05", "H1N1"}
    grouped = _run(spark, t, PFX + """
        SELECT DISTINCT ?v WHERE {
          <s1> !(f:has_segment|f:strain_name|f:date) ?v . }""")
    assert {r.v for r in grouped.collect()} == {"swine", "H1N1"}
    reverse = _run(spark, t, PFX + """
        SELECT DISTINCT ?s WHERE { <g1> !(f:clade|^f:has_segment) ?s . }""")
    # forward: g1's non-clade edges (segment_name->HA); reverse: none
    # besides has_segment which is excluded
    assert {r.s for r in reverse.collect()} == {"HA"}


def test_having_count(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid (COUNT(?v) as ?n) WHERE { ?sid !f:none ?v . }
        GROUP BY ?sid HAVING (COUNT(?v) > 2)""")
    got = {(r.sid, r.n) for r in df.collect()}
    assert got == {("s1", 5), ("s2", 4)}


def test_having_min_and_key_ref(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid (MIN(?v) as ?m) WHERE { ?sid f:host ?v . }
        GROUP BY ?sid HAVING (MIN(?v) = "duck")""")
    assert [(r.sid, r.m) for r in df.collect()] == [("s2", "duck")]


def test_subquery_join(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?strain ?seg WHERE {
          ?sid f:strain_name ?strain .
          { SELECT ?sid (MIN(?sn) as ?seg) WHERE {
              ?sid f:has_segment ?gid . ?gid f:segment_name ?sn . }
            GROUP BY ?sid }
        }""")
    got = {(r.strain, r.seg) for r in df.collect()}
    assert got == {("A/swine/Iowa/A01", "HA"), ("A/duck/Texas/77", "NA")}


def test_subquery_scoping_shadows_inner_var(spark):
    # inner ?v is local to the subquery; the outer ?v binds host only
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT DISTINCT ?v WHERE {
          ?sid f:host ?v .
          { SELECT ?sid WHERE { ?sid f:subtype ?v . } }
        }""")
    assert {r.v for r in df.collect()} == {"swine"}


def test_arithmetic_and_in(spark):
    t = _t(spark, TINY)
    df = _run(spark, t, PFX + """
        SELECT ?sid ?y2 WHERE {
          ?sid f:date ?d . FILTER (YEAR(?d) + 1 > 2018) .
          BIND(YEAR(?d) * 2 as ?y2) .
        }""")
    assert [(r.sid, r.y2) for r in df.collect()] == [("s1", 4036.0)]
    inq = _run(spark, t, PFX + """
        SELECT ?sid WHERE {
          ?sid f:host ?h . FILTER (?h IN ("swine", "emu")) . }""")
    assert [r.sid for r in inq.collect()] == ["s1"]
    notin = _run(spark, t, PFX + """
        SELECT ?sid WHERE {
          ?sid f:host ?h . FILTER (?h NOT IN ("swine", "emu")) . }""")
    assert [r.sid for r in notin.collect()] == ["s2"]


def test_arithmetic_division_by_zero_drops(spark):
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid WHERE {
          ?sid f:date ?d .
          FILTER (YEAR(?d) / (YEAR(?d) - YEAR(?d)) > 0) . }""")
    assert df.count() == 0


def test_signed_number_glue(spark):
    # '?x-1' tokenizes as ?x, -1 — implicit addition per the grammar
    df = _run(spark, _t(spark, TINY), PFX + """
        SELECT ?sid WHERE {
          ?sid f:date ?d . FILTER (YEAR(?d)-3 = 2015) . }""")
    assert [r.sid for r in df.collect()] == ["s1"]


def test_numeric_hash_replace_builtins(spark):
    """ABS/CEIL/FLOOR/ROUND (SPARQL tie rule: toward +inf), MD5/SHA256,
    REPLACE — pinned values, plus type-error-drops for non-numerics."""
    import hashlib

    rows = [
        ("s1", "val", "-2.5", ""),
        ("s2", "val", "2.3", ""),
        ("s3", "val", "duck", ""),  # non-numeric: numeric builtins drop
    ]
    df = _run(spark, _t(spark, rows), PFX + """
SELECT ?x ?r ?c ?f ?a WHERE {
  ?x f:val ?v .
  BIND(ROUND(?v) as ?r) .
  BIND(CEIL(?v) as ?c) .
  BIND(FLOOR(?v) as ?f) .
  BIND(ABS(?v) as ?a) .
  FILTER BOUND(?r) .
}""")
    got = {r.x: (r.r, r.c, r.f, r.a) for r in df.collect()}
    assert got == {
        "s1": (-2.0, -2.0, -3.0, 2.5),  # ROUND(-2.5) = -2, not -3
        "s2": (2.0, 3.0, 2.0, 2.3),
    }

    df2 = _run(spark, _t(spark, rows), PFX + """
SELECT ?x ?h ?s ?p WHERE {
  ?x f:val ?v .
  BIND(MD5(?v) as ?h) .
  BIND(SHA256(?v) as ?s) .
  BIND(REPLACE(?v, "[0-9]", "#") as ?p) .
}""")
    got2 = {r.x: (r.h, r.s, r.p) for r in df2.collect()}
    assert got2["s3"] == (hashlib.md5(b"duck").hexdigest(),
                          hashlib.sha256(b"duck").hexdigest(), "duck")
    assert got2["s2"][2] == "#.#"


def test_replace_literal_dollar_and_backslash(spark):
    """REPLACE's replacement is LITERAL: '$1' must not perform group
    substitution and a trailing '$' / lone '\\' must not throw a raw
    Java IllegalArgumentException (Matcher.quoteReplacement
    semantics)."""
    rows = [("s1", "val", "ab12", "")]
    df = _run(spark, _t(spark, rows), PFX + """
SELECT ?x ?g ?d ?b WHERE {
  ?x f:val ?v .
  BIND(REPLACE(?v, "([0-9]+)", "$1") as ?g) .
  BIND(REPLACE(?v, "[0-9]+", "$") as ?d) .
  BIND(REPLACE(?v, "[0-9]+", "a\\b") as ?b) .
}""")
    r = df.collect()[0]
    assert r.g == "ab$1"      # literal, NOT the captured group
    assert r.d == "ab$"       # no dangling-$ exception
    # SPARQL '\\' decodes to one backslash; it must come through
    # literally, not as a Java escape
    assert r.b == "ab" + "a" + "\\" + "b"


def test_optional_chain_join_has_no_nested_loop(spark):
    """A join of two OPTIONAL-bearing groups shares a maybe-null var;
    the compat join must PARTITION by null-pattern into equi branches
    (anchored on the never-null ?x) — 0 BroadcastNestedLoopJoin, 0
    CartesianProduct — instead of an OR-isNull condition join."""
    rows = [
        ("s1", "a", "1", ""), ("s1", "b", "2", ""),
        ("s2", "a", "3", ""), ("s2", "c", "4", ""),
        ("s3", "a", "5", ""), ("s3", "b", "6", ""), ("s3", "c", "7", ""),
    ]
    qtext = PFX + """
SELECT ?x ?v ?w WHERE {
  ?x f:a ?y .
  OPTIONAL { ?x f:b ?v . }
  { ?x f:a ?z . OPTIONAL { ?x f:c ?v . }
    OPTIONAL { ?x f:b ?w . } }
}"""
    df = _run(spark, _t(spark, rows), qtext)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # and the semantics survive the rewrite: s1 binds v only via f:b,
    # s2 only via f:c, s3 both sides must AGREE on ?v (compat join
    # drops the s3 row where 2 != 7... none: b=6, c=7 conflict)
    got = {(r.x, r.v, r.w) for r in df.collect()}
    assert got == {("s1", "2", "2"), ("s2", "4", None)}


def test_four_tolerant_var_join_has_no_nested_loop(spark):
    """Two groups sharing FOUR maybe-null vars: the old compiler fell
    back to the OR-isNull condition join (BroadcastNestedLoopJoin)
    above 3 tolerant vars; the rewrite now runs to 5 — the plan must
    stay all-equi (81 disjoint branches, each anchored on never-null
    ?x) and the compat semantics must survive."""
    rows = [
        # s1: a agrees across sides, b bound right-only
        ("s1", "k", "1", ""), ("s1", "la", "A", ""),
        ("s1", "ra", "A", ""), ("s1", "rb", "B", ""),
        # s2: b conflicts (B2 vs C2) -> row drops entirely
        ("s2", "k", "1", ""), ("s2", "lb", "B2", ""), ("s2", "rb", "C2", ""),
        # s3: c,d bound left-only
        ("s3", "k", "1", ""), ("s3", "lc", "C3", ""), ("s3", "ld", "D3", ""),
        # s4: nothing optional bound
        ("s4", "k", "1", ""),
    ]
    qtext = PFX + """
SELECT ?x ?a ?b ?c ?d WHERE {
  { ?x f:k ?k1 .
    OPTIONAL { ?x f:la ?a . } OPTIONAL { ?x f:lb ?b . }
    OPTIONAL { ?x f:lc ?c . } OPTIONAL { ?x f:ld ?d . } }
  { ?x f:k ?k2 .
    OPTIONAL { ?x f:ra ?a . } OPTIONAL { ?x f:rb ?b . }
    OPTIONAL { ?x f:rc ?c . } OPTIONAL { ?x f:rd ?d . } }
}"""
    df = _run(spark, _t(spark, rows), qtext)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    got = {(r.x, r.a, r.b, r.c, r.d) for r in df.collect()}
    assert got == {
        ("s1", "A", "B", None, None),
        ("s3", None, None, "C3", "D3"),
        ("s4", None, None, None, None),
    }


def test_compat_join_beyond_cap_raises_not_nlj(spark):
    """Six shared maybe-null vars exceeds _COMPAT_MAX_TOL: the
    compiler must raise a SparqlError suggesting a rewrite instead of
    silently planning a quadratic nested-loop join."""
    rows = [("s1", "k", "1", "")]
    opt_l = " ".join("OPTIONAL { ?x f:l%d ?o%d . }" % (i, i)
                     for i in range(6))
    opt_r = " ".join("OPTIONAL { ?x f:r%d ?o%d . }" % (i, i)
                     for i in range(6))
    qtext = PFX + ("SELECT ?x WHERE { { ?x f:k ?k1 . %s } "
                   "{ ?x f:k ?k2 . %s } }" % (opt_l, opt_r))
    with pytest.raises(SparqlError, match="maybe-null"):
        _run(spark, _t(spark, rows), qtext)
