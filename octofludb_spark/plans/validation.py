"""RDFS entailment + SHACL-lite validation over the triple table.

Reference scope note: octofludb ships an RDFS schema (schema.ttl:73-106
— the subPropertyOf lattice over motif/date/HA/NA properties plus
domain/range declarations) and uploads it into GraphDB at pull time
(ui.py:396-402), relying on the STORE's reasoner to answer queries
like `?s f:date ?d` when the data says f:collection_date.  This module
re-expresses that entailment regime as explicit DataFrame algebra so
the Spark engine answers the same queries without a reasoner.  The
SHACL-lite validator has no reference counterpart: it is the
pre-publish quality gate a production KG build runs (first-class
extension, same standing as the dedup/quality suite).

Entailment rules implemented (the RDFS fixpoint for this rule set):
  rdfs5/7  subPropertyOf transitive closure, then (s p o) & (p sub q)
           -> (s q o)
  rdfs2/3  (s p o) & (p domain C) -> (s rdf:type C);
           (s p o) & (p range C) & o is IRI -> (o rdf:type C)
  rdfs9/11 subClassOf transitive closure, then type propagation
The schema lattice feeds no rule back into itself (property axioms are
not data subjects of lattice predicates), so one ordered pass —
subproperty expansion, then domain/range typing over the expanded
graph, then subclass propagation over all type triples — IS the
fixpoint; no iteration needed.

Scale shape: the lattice is a schema-sized dimension (octofludb's is
68 edges; any real ontology is <10^5), so closures are computed
driver-side over the collected lattice rows — bounded by an explicit
cap that raises rather than silently collecting a data-scale table —
and applied to the 100 TB fact table as broadcast hash joins.  The
fact side never shuffles for entailment; validation shapes add only
keyed aggregations on their target predicates.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NT = "https://flu-crew.org/term/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUB_PROP = RDFS + "subPropertyOf"
SUB_CLASS = RDFS + "subClassOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"

# A lattice bigger than this is not a schema; refuse to collect it.
MAX_SCHEMA_ROWS = 100_000


def _transitive_closure(edges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Strict transitive closure of a tiny DAG/lattice, driver-side."""
    from collections import defaultdict

    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    out: set[tuple[str, str]] = set()
    for a in list(adj):
        seen: set[str] = set()
        stack = list(adj[a])
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj.get(x, ()))
        out.update((a, x) for x in seen)
    return sorted(out)


def schema_lattice(triples: DataFrame) -> dict[str, list[tuple[str, str]]]:
    """Pull the RDFS schema rows out of the triple table (the store
    holds schema.ttl alongside the data, mirroring the reference's
    upload step) and close the subPropertyOf / subClassOf lattices.
    Collect is guarded: schema is a dimension, not data."""
    lat = (triples
           .where(F.col("predicate").isin(SUB_PROP, SUB_CLASS,
                                          DOMAIN, RANGE)
                  & (F.col("object_dtype") == "uri"))
           .select("predicate", "subject", "object_lex")
           .distinct())
    rows = lat.limit(MAX_SCHEMA_ROWS + 1).collect()
    if len(rows) > MAX_SCHEMA_ROWS:
        raise ValueError(
            f"schema lattice exceeds {MAX_SCHEMA_ROWS} rows — "
            "refusing a data-scale collect; stage the ontology "
            "separately")
    by_pred: dict[str, list[tuple[str, str]]] = {
        SUB_PROP: [], SUB_CLASS: [], DOMAIN: [], RANGE: []}
    for r in rows:
        by_pred[r["predicate"]].append((r["subject"], r["object_lex"]))
    return {
        "subprop_closure": _transitive_closure(by_pred[SUB_PROP]),
        "subclass_closure": _transitive_closure(by_pred[SUB_CLASS]),
        "domain": sorted(set(by_pred[DOMAIN])),
        "range": sorted(set(by_pred[RANGE])),
    }


def _pairs_df(spark: SparkSession, pairs: list[tuple[str, str]],
              a: str, b: str) -> DataFrame:
    if not pairs:
        return spark.createDataFrame([], f"{a} string, {b} string")
    return spark.createDataFrame(pairs, [a, b])


def rdfs_entail(triples: DataFrame,
                lattice: Optional[dict] = None) -> DataFrame:
    """The RDFS-entailed graph: base triples plus every derivation of
    rules rdfs5/7 (subproperty), rdfs2/3 (domain/range typing) and
    rdfs9/11 (subclass propagation), distinct.  Same 4 columns out.

    Plan: three broadcast hash joins against closed schema
    dimensions + one distinct — the fact table is scanned once per
    rule family and never shuffled except for the final distinct's
    hash-agg (map-side partials make that cheap on a mostly-unique
    graph)."""
    spark = triples.sparkSession
    lat = lattice or schema_lattice(triples)
    spc = _pairs_df(spark, lat["subprop_closure"], "p_sub", "p_sup")
    scc = _pairs_df(spark, lat["subclass_closure"], "c_sub", "c_sup")
    dom = _pairs_df(spark, lat["domain"], "d_pred", "d_cls")
    rng = _pairs_df(spark, lat["range"], "r_pred", "r_cls")
    cols = ["subject", "predicate", "object_lex", "object_dtype"]

    # rdfs7: expand through the subproperty closure
    d_sub = (triples
             .join(F.broadcast(spc),
                   triples["predicate"] == spc["p_sub"])
             .select("subject", F.col("p_sup").alias("predicate"),
                     "object_lex", "object_dtype"))
    expanded = triples.select(cols).unionByName(d_sub)

    # rdfs2/3: domain/range typing over the EXPANDED graph
    t_dom = (expanded
             .join(F.broadcast(dom),
                   expanded["predicate"] == dom["d_pred"])
             .select("subject", F.col("d_cls").alias("cls")))
    t_rng = (expanded
             .where(F.col("object_dtype") == "uri")
             .join(F.broadcast(rng),
                   expanded["predicate"] == rng["r_pred"])
             .select(F.col("object_lex").alias("subject"),
                     F.col("r_cls").alias("cls")))
    t_base = (triples
              .where(F.col("predicate") == RDF_TYPE)
              .select("subject", F.col("object_lex").alias("cls")))
    types = t_base.unionByName(t_dom).unionByName(t_rng)

    # rdfs9/11: propagate types up the subclass closure
    t_up = (types
            .join(F.broadcast(scc), types["cls"] == scc["c_sub"])
            .select("subject", F.col("c_sup").alias("cls")))
    all_types = (types.unionByName(t_up)
                 .select("subject", F.lit(RDF_TYPE).alias("predicate"),
                         F.col("cls").alias("object_lex"),
                         F.lit("uri").alias("object_dtype")))

    return expanded.unionByName(all_types).distinct()


# ----------------------------------------------------------------------
# SHACL-lite validation
# ----------------------------------------------------------------------

# The flu-KG default shape set: real constraints over the reference's
# vocabulary, a mix of naturally-violated (mixed date precisions) and
# naturally-conforming (segment numbers are 1..8) so a green report
# proves both directions.
DEFAULT_SHAPES: list[dict] = [
    {"shape_id": "CollectionDateIsFullDate", "kind": "datatype",
     "pred": NT + "collection_date", "param": "xsd:date"},
    {"shape_id": "SegmentNumberInRange", "kind": "pattern",
     "pred": NT + "segment_number", "param": "^[1-8]$"},
    {"shape_id": "HasSegmentIsIRI", "kind": "nodeKind",
     "pred": NT + "has_segment", "param": "uri"},
    # NOTE deliberately circular under RDFS (the range axiom types
    # every has_segment object Segment, so this can only fire on a
    # graph validated WITHOUT entailment) — kept as the conformance
    # face; the orphan check below is the non-circular class shape.
    {"shape_id": "HasSegmentTargetsSegment", "kind": "class",
     "pred": NT + "has_segment", "param": NT + "Segment"},
    # every Segment must be REFERENCED by some strain's has_segment
    # (SHACL inversePath minCount 1): segments typed only through
    # their own attributes (rdfs:domain of segment_name / dnaseq) but
    # linked to no strain are orphans — a real assembly defect.
    {"shape_id": "SegmentIsReferenced", "kind": "inverseMinCount",
     "target_class": NT + "Segment", "pred": NT + "has_segment",
     "param": 1},
    {"shape_id": "StrainHasASegment", "kind": "minCount",
     "target_class": NT + "Strain", "pred": NT + "has_segment",
     "param": 1},
    {"shape_id": "StrainAtMost8Segments", "kind": "maxCount",
     "target_class": NT + "Strain", "pred": NT + "has_segment",
     "param": 8},
]


# SHACL severity split (ADVICE r4): two default shapes fire NATURALLY
# on healthy reference-shaped corpora — partial collection dates
# (year/month-only precision is legitimate surveillance metadata) and
# >8-segment hub strains (sameAs unification can merge re-submissions)
# — so they carry sh:Warning severity: always REPORTED, never fatal to
# the build gate.  Everything else is sh:Violation and fails
# `build --validate` (cli.py); `--strict-validate` escalates warnings.
WARN_SHAPE_IDS = {"CollectionDateIsFullDate", "StrainAtMost8Segments"}


def severity_of(shape_id: str) -> str:
    """sh:Violation / sh:Warning for a default-set shape id."""
    return "Warning" if shape_id in WARN_SHAPE_IDS else "Violation"


def violation_counts(report: DataFrame) -> tuple[int, int]:
    """(n_hard, n_warn) severity rollup of a shacl_validate report —
    the numbers the build gate's exit code is decided on."""
    by_shape = {r["shape_id"]: r["n"] for r in
                report.groupBy("shape_id")
                .agg(F.count("*").alias("n")).collect()}
    n_warn = sum(n for s, n in by_shape.items() if s in WARN_SHAPE_IDS)
    return sum(by_shape.values()) - n_warn, n_warn


def shacl_validate(triples: DataFrame,
                   shapes: Optional[list[dict]] = None,
                   entailed: Optional[DataFrame] = None) -> DataFrame:
    """SHACL-lite validation report: one row per constraint violation
    (shape_id, constraint, focus, pred, value).  Shapes target either
    a predicate directly (datatype / pattern / nodeKind / class) or a
    class via the ENTAILED rdf:type graph (minCount / maxCount), so
    validation composes with rdfs_entail — a strain typed only through
    rdfs:domain still answers for its cardinality shapes.

    Plan per shape: value shapes are single-scan filters; class checks
    one left_anti keyed join; cardinality shapes one subject-keyed agg
    + one keyed join against the (small) per-class focus set.  The
    shape list is a constant, so the driver loop composes a fixed
    union plan — no data-driven iteration."""
    shapes = DEFAULT_SHAPES if shapes is None else shapes
    ent = entailed if entailed is not None else rdfs_entail(triples)
    types = (ent.where(F.col("predicate") == RDF_TYPE)
             .select(F.col("subject").alias("focus"),
                     F.col("object_lex").alias("cls")))
    out_cols = ["shape_id", "constraint", "focus", "pred", "value"]
    parts: list[DataFrame] = []
    for sh in shapes:
        sid, kind, pred = sh["shape_id"], sh["kind"], sh["pred"]
        rows = ent.where(F.col("predicate") == pred)
        tag = [F.lit(sid).alias("shape_id"),
               F.lit(kind).alias("constraint")]
        if kind == "datatype":
            v = (rows.where(F.col("object_dtype") != sh["param"])
                 .select(*tag, F.col("subject").alias("focus"),
                         F.lit(pred).alias("pred"),
                         F.col("object_lex").alias("value")))
        elif kind == "pattern":
            v = (rows.where(~F.col("object_lex").rlike(sh["param"]))
                 .select(*tag, F.col("subject").alias("focus"),
                         F.lit(pred).alias("pred"),
                         F.col("object_lex").alias("value")))
        elif kind == "nodeKind":
            v = (rows.where(F.col("object_dtype") != "uri")
                 .select(*tag, F.col("subject").alias("focus"),
                         F.lit(pred).alias("pred"),
                         F.col("object_lex").alias("value")))
        elif kind == "class":
            member = (types.where(F.col("cls") == sh["param"])
                      .select(F.col("focus").alias("object_lex")))
            v = (rows.where(F.col("object_dtype") == "uri")
                 .join(member, "object_lex", "left_anti")
                 .select(*tag, F.col("subject").alias("focus"),
                         F.lit(pred).alias("pred"),
                         F.col("object_lex").alias("value")))
        elif kind == "inverseMinCount":
            focus = (types.where(F.col("cls") == sh["target_class"])
                     .select("focus").distinct())
            referenced = (rows.where(F.col("object_dtype") == "uri")
                          .select(F.col("object_lex").alias("focus"))
                          .distinct())
            v = (focus.join(referenced, "focus", "left_anti")
                 .select(*tag, "focus", F.lit(pred).alias("pred"),
                         F.lit(None).cast("string").alias("value")))
        elif kind in ("minCount", "maxCount"):
            focus = (types.where(F.col("cls") == sh["target_class"])
                     .select("focus").distinct())
            counts = (rows.groupBy(F.col("subject").alias("focus"))
                      .agg(F.count(F.lit(1)).alias("n")))
            if kind == "minCount":
                # min=1 is the only cardinality the vocabulary needs;
                # an anti join states it without counting
                if sh["param"] != 1:
                    having = (counts
                              .where(F.col("n") >= sh["param"])
                              .select("focus"))
                else:
                    having = rows.select(
                        F.col("subject").alias("focus")).distinct()
                v = (focus.join(having, "focus", "left_anti")
                     .select(*tag, "focus", F.lit(pred).alias("pred"),
                             F.lit(None).cast("string").alias("value")))
            else:
                v = (counts.where(F.col("n") > sh["param"])
                     .join(focus, "focus", "left_semi")
                     .select(*tag, "focus", F.lit(pred).alias("pred"),
                             F.col("n").cast("string").alias("value")))
        else:
            raise ValueError(f"unknown shape kind {kind!r}")
        parts.append(v.select(out_cols))
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report


# ----------------------------------------------------------------------
# incremental entailment maintenance (store-changelog wired, the
# masterlist_refresh / sketch-refresh discipline)
# ----------------------------------------------------------------------

ENTAILED_TABLE = "triples_entailed"
SCHEMA_PREDS = (SUB_PROP, SUB_CLASS, DOMAIN, RANGE)


def entailment_materialize(spark: SparkSession, store,
                           table: str = "triples") -> int:
    """Full-build the RDFS-entailed graph into the store as
    ``triples_entailed`` and record the base manifest seq.  Returns
    the row count."""
    from octofludb_spark.plans.incremental_sketches import (
        _write_base_seq)

    triples = store.read(spark, table).select(
        "subject", "predicate", "object_lex", "object_dtype")
    seq = store.manifest().get("seq", 0)
    ent = rdfs_entail(triples)
    store.write(ent, ENTAILED_TABLE)
    _write_base_seq(store, seq, ENTAILED_TABLE)
    return store.read(spark, ENTAILED_TABLE).count()


def entailment_refresh(spark: SparkSession, store,
                       table: str = "triples") -> dict:
    """Fold triple-table changes since the materialized base into the
    entailed graph at O(changes).  Returns {"mode", "rows_appended"}.

    Why insert-only maintenance is EXACT here: every rule in this
    RDFS subset has exactly ONE data-triple premise (all other
    premises are schema-lattice rows), so entail(T + D) =
    entail(T) + entail(D) whenever the schema is unchanged — the new
    derivations are entail(D) minus what the table already holds, one
    anti join.  Two cases honestly DOWNGRADE to a logged full
    rematerialize instead of being papered over:

      * deletes — a derived triple can have multiple derivations, so
        removal needs over-delete/re-derive (DRed); recompute is the
        honest small-code answer (same stance as the HLL sketch's
        delete path);
      * schema-lattice changes — a new subClassOf edge re-types
        EXISTING entities, which is not expressible as entail(D).

    Scale shape: the delta entailment is the same broadcast-joins
    plan as rdfs_entail over O(changes) rows; the anti join against
    the entailed table is the one table-scale touch (keyed, and
    bucket-prunable where the store buckets by subject hash)."""
    import logging

    from octofludb_spark.plans.incremental_sketches import (
        _read_base_seq, _write_base_seq)

    log = logging.getLogger(__name__)
    cols = ["subject", "predicate", "object_lex", "object_dtype"]
    base = _read_base_seq(store, ENTAILED_TABLE)
    if base is None:
        n = entailment_materialize(spark, store, table=table)
        return {"mode": "full", "rows_appended": n}
    next_base = store.manifest().get("seq", 0)
    try:
        changes = store.read_changelog(spark, table, since=base)
    except ValueError:
        log.info("entailment_refresh: changelog broken since base — "
                 "full rematerialize")
        n = entailment_materialize(spark, store, table=table)
        return {"mode": "full", "rows_appended": n}
    if changes is None:
        return {"mode": "noop", "rows_appended": 0}
    has_delete = bool(changes.where(
        F.col("_change_type") == "delete").limit(1).count())
    touches_schema = bool(changes.where(
        F.col("predicate").isin(*SCHEMA_PREDS)).limit(1).count())
    if has_delete or touches_schema:
        why = "deletes" if has_delete else "schema-lattice change"
        log.info("entailment_refresh: %s in changelog — full "
                 "rematerialize", why)
        n = entailment_materialize(spark, store, table=table)
        return {"mode": "full", "rows_appended": n}
    lattice = schema_lattice(
        store.read(spark, table).select(cols))
    delta_ent = rdfs_entail(changes.select(cols), lattice=lattice)
    existing = store.read(spark, ENTAILED_TABLE).select(cols)
    new_rows = delta_ent.join(existing, cols, "left_anti").persist()
    n = new_rows.count()
    if n:
        store.append_rows(new_rows, ENTAILED_TABLE)
    new_rows.unpersist()
    _write_base_seq(store, next_base, ENTAILED_TABLE)
    return {"mode": "incremental", "rows_appended": n}
