"""Static schema/geography triples — the analog of the reference's
schema.ttl + geography.ttl upload step (ui.py:396-402): the reference
uploads BOTH files into the store at pull time, so geography hierarchy
queries (f:locatedIn, a transitive property, geography.ttl:7-10) and
schema introspection (rdfs:domain/range/subPropertyOf,
schema.ttl:73-106) have data to bind against.

Data files (octofludb_spark/data/):
  geography_triples.json — all 943 geography triples derived from the
    reference's geography.ttl: usa:XX f:name/f:abbr, world:CODE
    f:code/f:name, and the full f:locatedIn hierarchy
    (state -> usa:RegionN -> world:USA; country -> subregion ->
    continent -> world:Earth).
  schema_triples.json — all 103 schema triples from schema.ttl
    (subPropertyOf lattice, domain/range, comments, examples).

The transitive closure of f:locatedIn is computed eagerly in plain
python: the hierarchy is a tiny static dimension (<1000 edges, depth
<= 4), so the scale-correct plan is to materialize the closure once
and broadcast it into joins — never to iterate DataFrame joins over a
dimension this small.
"""

from __future__ import annotations

import json
from importlib import resources

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_COLS = ["subject", "predicate", "object_lex", "object_dtype"]

NT = "https://flu-crew.org/term/"
LOCATED_IN = NT + "locatedIn"

_DT = {"plain": "", "uri": "uri", "xsd:date": "xsd:date"}


def _load(name: str) -> pd.DataFrame:
    # importlib.resources (not __file__ paths) so the package also
    # works from a spark-submit --py-files zip
    with resources.files("octofludb_spark.data").joinpath(name).open() as f:
        rows = json.load(f)
    df = pd.DataFrame(rows, columns=["subject", "predicate", "object_lex",
                                     "_dt"])
    df["object_dtype"] = df["_dt"].map(lambda d: _DT.get(d, d))
    return df[_COLS]


def geography_triples_pandas() -> pd.DataFrame:
    """All geography triples (reference geography.ttl, 943 rows):
    names, abbrs, ISO codes AND the locatedIn hierarchy."""
    return _load("geography_triples.json")


def schema_triples_pandas() -> pd.DataFrame:
    """All schema triples (reference schema.ttl, 103 rows)."""
    return _load("schema_triples.json")


def located_in_closure_pandas() -> pd.DataFrame:
    """Transitive closure of f:locatedIn as extra triples
    (f:locatedIn is owl:TransitiveProperty, geography.ttl:7 — GraphDB
    materializes this under owl-horst; we materialize it statically).
    Includes the direct edges."""
    geo = geography_triples_pandas()
    edges = geo[geo["predicate"] == LOCATED_IN]
    parent: dict[str, set[str]] = {}
    for s, o in zip(edges["subject"], edges["object_lex"]):
        parent.setdefault(s, set()).add(o)
    def reach(node: str) -> set[str]:
        # Iterative BFS: correct even if the edge data ever contains a
        # cycle (a memoized recursive walk would cache a partial set
        # for cycle members and silently truncate the closure).
        out: set[str] = set()
        frontier = list(parent.get(node, ()))
        while frontier:
            p = frontier.pop()
            if p not in out:
                out.add(p)
                frontier.extend(parent.get(p, ()))
        return out

    rows = [(s, LOCATED_IN, o, "uri")
            for s in parent for o in sorted(reach(s))]
    return pd.DataFrame(rows, columns=_COLS)


def static_graph_pandas(with_closure: bool = True) -> pd.DataFrame:
    """The full static upload: geography + schema (+ locatedIn
    closure), deduplicated."""
    frames = [geography_triples_pandas(), schema_triples_pandas()]
    if with_closure:
        frames.append(located_in_closure_pandas())
    return (pd.concat(frames, ignore_index=True)
            .drop_duplicates(ignore_index=True))


def geography_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(geography_triples_pandas())


def static_graph(spark: SparkSession, with_closure: bool = True) -> DataFrame:
    """Distributed view of the static graph — a broadcast-sized
    dimension that unions into the triple store at build time
    (build.py), mirroring ui.py:396-402."""
    return spark.createDataFrame(static_graph_pandas(with_closure))
