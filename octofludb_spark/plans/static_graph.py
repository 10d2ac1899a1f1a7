"""Static schema/geography triples, the analog of the reference's
schema.ttl + geography.ttl upload step (ui.py:396-402).

Generated from octofludb_spark/data/geography.json:
  usa:XX  f:name "Full Name" ; f:abbr "XX" .
  world:CODE f:code "CODE" ; f:name "name" .
(reference geography.ttl:15-…; f:code usage in masterlist.rq:29).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from octofludb_spark.functions.geography import _tables
from octofludb_spark.functions.uri import DT_PLAIN, NCOUNTRY, NT, NUSA


def geography_triples_pandas() -> pd.DataFrame:
    t = _tables()
    rows = []
    for name, abbr in t["states"].items():
        full = name.replace("_", " ").title()
        rows.append((NUSA + abbr, NT + "name", full, DT_PLAIN))
        rows.append((NUSA + abbr, NT + "abbr", abbr, DT_PLAIN))
    seen = set()
    for name, code in t["countries"].items():
        if code is None:
            continue  # reference maps some regions to no ISO code
        if code not in seen:
            seen.add(code)
            rows.append((NCOUNTRY + code, NT + "code", code, DT_PLAIN))
        rows.append((NCOUNTRY + code, NT + "name", name.replace("_", " "),
                     DT_PLAIN))
    return pd.DataFrame(
        rows, columns=["subject", "predicate", "object_lex", "object_dtype"]
    )


def geography_triples(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(geography_triples_pandas())
