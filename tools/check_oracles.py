"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, sorted-column schema, and order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or v != v:
        return ""
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "\x1f".join(norm_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(sf_dir: str, only: list[str] | None = None):
    import __spark_entry__ as E
    from octofludb_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = E.queries()
    oracles = E.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            results.append((name, "SPARK-ERROR", str(ex)[:200]))
            continue
        if name not in oracles:
            results.append((name, f"rows-only n={len(sdf)}",
                            f"{time.time()-t0:.1f}s"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            results.append((name, "ORACLE-ERROR", str(ex)[:200]))
            continue
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            status.append(f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        if not status and frame_hash(sdf) != frame_hash(odf):
            status.append("VALUE-HASH MISMATCH")
            merged = sdf.merge(odf, how="outer", indicator=True,
                               on=list(sdf.columns)) if list(sdf.columns) == list(odf.columns) else None
            if merged is not None:
                diff = merged[merged["_merge"] != "both"]
                status.append(f"diff rows: {len(diff)}; sample:\n"
                              + diff.head(4).to_string())
        results.append((name, "OK" if not status else "; ".join(status),
                        f"n={len(sdf)} {time.time()-t0:.1f}s"))
    print()
    nok = 0
    for name, status, extra in results:
        flag = "PASS" if status == "OK" or status.startswith("rows-only") else "FAIL"
        if flag == "FAIL":
            nok += 1
        print(f"{flag:4s} {name:28s} {status}  [{extra}]")
    print(f"\n{len(results)-nok}/{len(results)} pass")
    return nok


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
