"""RDFS entailment + SHACL-lite validation (plans/validation.py).

Trust model: hand-built micro-graphs where the entailed closure and
every violation row can be stated by inspection; the full-corpus
cross-engine check is the kg_rdfs_entailment / kg_shacl_report DuckDB
gates (recursive-CTE restatement over identical staged bytes).
"""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.plans import validation as V

pytestmark = [pytest.mark.spark, pytest.mark.core]

NT = V.NT


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object_lex string, "
              "object_dtype string")


def test_transitive_closure_chain_and_diamond():
    assert V._transitive_closure([("a", "b"), ("b", "c"), ("c", "d")]) == [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d")]
    # diamond: both paths found once
    got = V._transitive_closure([("x", "l"), ("x", "r"),
                                 ("l", "t"), ("r", "t")])
    assert ("x", "t") in got and len(got) == 5
    assert V._transitive_closure([]) == []


def test_entailment_rules_micro_graph(spark):
    t = _triples(spark, [
        # schema: p1 < p2 < p3; C1 < C2; p1 domain C1; p3 range CR
        ("p1", V.SUB_PROP, "p2", "uri"),
        ("p2", V.SUB_PROP, "p3", "uri"),
        ("C1", V.SUB_CLASS, "C2", "uri"),
        ("p1", V.DOMAIN, "C1", "uri"),
        ("p3", V.RANGE, "CR", "uri"),
        # data
        ("s", "p1", "o", "uri"),
        ("lit_s", "p1", "five", ""),          # literal object: no range type
        ("x", V.RDF_TYPE, "C1", "uri"),       # asserted type propagates
    ])
    ent = {tuple(r) for r in V.rdfs_entail(t).collect()}
    # rdfs7 through the CLOSED lattice: p2 AND p3
    assert ("s", "p2", "o", "uri") in ent
    assert ("s", "p3", "o", "uri") in ent
    # rdfs2 on the base predicate, rdfs3 on the DERIVED p3 triple
    assert ("s", V.RDF_TYPE, "C1", "uri") in ent
    assert ("o", V.RDF_TYPE, "CR", "uri") in ent
    # literal object never typed by range
    assert ("five", V.RDF_TYPE, "CR", "uri") not in ent
    # rdfs9/11: asserted AND derived types propagate up subClassOf
    assert ("x", V.RDF_TYPE, "C2", "uri") in ent
    assert ("s", V.RDF_TYPE, "C2", "uri") in ent
    # base triples survive; result is distinct
    assert ("s", "p1", "o", "uri") in ent
    df = V.rdfs_entail(t)
    assert df.count() == df.distinct().count()


def test_schema_lattice_cap():
    assert V.MAX_SCHEMA_ROWS == 100_000  # documented bound


def test_shacl_every_kind_fires_on_poisoned_graph(spark):
    hs, sn, cd = (NT + "has_segment", NT + "segment_number",
                  NT + "collection_date")
    t = _triples(spark, [
        # schema needed for typing
        (NT + "strain_name", V.DOMAIN, NT + "Strain", "uri"),
        (NT + "segment_name", V.DOMAIN, NT + "Segment", "uri"),
        (hs, V.RANGE, NT + "Segment", "uri"),
        # strain A: fine (1 segment, full date)
        ("A", NT + "strain_name", "a", ""),
        ("A", hs, "segA", "uri"),
        ("segA", NT + "segment_name", "HA", ""),
        ("A", cd, "2026-01-01", "xsd:date"),
        # strain B: year-only date (datatype), no segment (minCount)
        ("B", NT + "strain_name", "b", ""),
        ("B", cd, "2026", "xsd:gYear"),
        # strain C: 9 segments (maxCount) incl. a LITERAL one (nodeKind)
        ("C", NT + "strain_name", "c", ""),
        *[("C", hs, f"seg{i}", "uri") for i in range(8)],
        ("C", hs, "not-an-iri", ""),
        # orphan segment: typed via its own name, referenced by nobody
        ("segX", NT + "segment_name", "NA", ""),
        # bad segment number (pattern)
        ("segA", sn, "9", ""),
    ])
    rep = V.shacl_validate(t)
    got = {(r["shape_id"], r["focus"]) for r in rep.collect()}
    assert ("CollectionDateIsFullDate", "B") in got
    assert ("StrainHasASegment", "B") in got
    assert ("StrainAtMost8Segments", "C") in got
    assert ("HasSegmentIsIRI", "C") in got
    assert ("SegmentNumberInRange", "segA") in got
    assert ("SegmentIsReferenced", "segX") in got
    # the range axiom types every IRI object, so the class shape stays
    # silent under entailment (documented circularity)...
    assert not any(s == "HasSegmentTargetsSegment" for s, _ in got)
    # conforming strain A appears in no violation
    assert not any(f == "A" for _, f in got)


def test_severity_split_gates_only_hard_violations(spark):
    # ADVICE r4: partial dates / >8-segment hubs fire on HEALTHY
    # reference-shaped corpora -> sh:Warning, never build-fatal
    hs, cd = NT + "has_segment", NT + "collection_date"
    healthyish = _triples(spark, [
        (NT + "strain_name", V.DOMAIN, NT + "Strain", "uri"),
        (hs, V.RANGE, NT + "Segment", "uri"),
        ("A", NT + "strain_name", "a", ""),
        ("A", hs, "segA", "uri"),
        ("A", cd, "2026", "xsd:gYear"),      # warn: partial date
        ("B", NT + "strain_name", "b", ""),
        *[("B", hs, f"s{i}", "uri") for i in range(9)],  # warn: 9 segs
    ])
    n_hard, n_warn = V.violation_counts(V.shacl_validate(healthyish))
    assert n_hard == 0 and n_warn == 2
    poisoned = _triples(spark, [
        (NT + "strain_name", V.DOMAIN, NT + "Strain", "uri"),
        (hs, V.RANGE, NT + "Segment", "uri"),
        ("A", NT + "strain_name", "a", ""),
        ("A", hs, "segA", "uri"),
        ("segA", NT + "segment_number", "9", ""),  # hard: bad range
    ])
    n_hard2, n_warn2 = V.violation_counts(V.shacl_validate(poisoned))
    assert n_hard2 == 1 and n_warn2 == 0
    assert V.severity_of("CollectionDateIsFullDate") == "Warning"
    assert V.severity_of("SegmentNumberInRange") == "Violation"


def test_shacl_class_shape_fires_without_range_axiom(spark):
    hs = NT + "has_segment"
    t = _triples(spark, [
        # no range axiom: Segment membership only via segment_name
        (NT + "segment_name", V.DOMAIN, NT + "Segment", "uri"),
        ("A", hs, "segKnown", "uri"),
        ("segKnown", NT + "segment_name", "HA", ""),
        ("A", hs, "segMystery", "uri"),       # object of unknown class
    ])
    rep = V.shacl_validate(t).where(
        F.col("shape_id") == "HasSegmentTargetsSegment").collect()
    assert [(r["focus"], r["value"]) for r in rep] == [
        ("A", "segMystery")]


def test_shacl_unknown_kind_raises(spark):
    t = _triples(spark, [("s", "p", "o", "")])
    with pytest.raises(ValueError, match="unknown shape kind"):
        V.shacl_validate(t, shapes=[{"shape_id": "x", "kind": "nope",
                                     "pred": "p"}])


@pytest.fixture()
def entail_store(spark, tmp_path):
    """A tiny store with schema + data, entailment materialized."""
    from octofludb_spark.sources.store import TripleStore

    store = TripleStore(str(tmp_path / "store"))
    base = _triples(spark, [
        ("p_date", V.SUB_PROP, "p_any", "uri"),
        ("ClsA", V.SUB_CLASS, "ClsB", "uri"),
        ("p_date", V.DOMAIN, "ClsA", "uri"),
        ("s1", "p_date", "2020-01-01", "xsd:date"),
    ])
    store.write(base, "triples")
    V.entailment_materialize(spark, store)
    return store


def _ent_set(spark, store):
    return {tuple(r) for r in store.read(spark, V.ENTAILED_TABLE)
            .select("subject", "predicate", "object_lex",
                    "object_dtype").collect()}


def test_incremental_entailment_equals_full(spark, entail_store):
    """Insert-only delta refresh must equal a from-scratch recompute."""
    delta = _triples(spark, [
        ("s2", "p_date", "2021-02-02", "xsd:date"),
        ("s3", V.RDF_TYPE, "ClsA", "uri"),
    ])
    entail_store.append_rows(delta, "triples")
    res = V.entailment_refresh(spark, entail_store)
    assert res["mode"] == "incremental" and res["rows_appended"] > 0
    got = _ent_set(spark, entail_store)
    full = {tuple(r) for r in V.rdfs_entail(
        entail_store.read(spark, "triples")
        .select("subject", "predicate", "object_lex", "object_dtype"))
        .collect()}
    assert got == full
    # s2 derivations landed: p_any expansion + domain typing + subclass
    assert ("s2", "p_any", "2021-02-02", "xsd:date") in got
    assert ("s2", V.RDF_TYPE, "ClsB", "uri") in got
    assert ("s3", V.RDF_TYPE, "ClsB", "uri") in got
    # second refresh with nothing new is a noop
    assert V.entailment_refresh(spark, entail_store)["mode"] == "noop"


def test_refresh_downgrades_on_delete(spark, entail_store):
    entail_store.delete_where(
        spark, F.col("subject") == "s1", table="triples")
    res = V.entailment_refresh(spark, entail_store)
    assert res["mode"] == "full"
    got = _ent_set(spark, entail_store)
    assert not any(s == "s1" for s, _, _, _ in got)


def test_refresh_downgrades_on_schema_change(spark, entail_store):
    entail_store.append_rows(_triples(spark, [
        ("ClsB", V.SUB_CLASS, "ClsC", "uri"),
        ("s9", "p_date", "2022-03-03", "xsd:date"),
    ]), "triples")
    res = V.entailment_refresh(spark, entail_store)
    assert res["mode"] == "full"
    got = _ent_set(spark, entail_store)
    # the new lattice edge re-types EXISTING entities — only a full
    # pass can do that, which is why the downgrade exists
    assert ("s1", V.RDF_TYPE, "ClsC", "uri") in got
    assert ("s9", V.RDF_TYPE, "ClsC", "uri") in got
