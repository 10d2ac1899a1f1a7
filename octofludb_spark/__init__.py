"""octofludb_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
flu-crew/octofludb.

The engine reproduces the reference's recognizer-to-triple semantics
(see /root/reference, cited per-module as file:line) over an
Iceberg-shaped source-record table ``(repo, path, commit, lang,
content)`` using idiomatic Spark: DataFrame plans, vectorized
pandas/Arrow UDFs, explicit partitioning, and a checkpointed
manifest-swap triple store.

Physical triple relation::

    triples(subject string, predicate string, object_lex string,
            object_dtype string)  -- '' | 'uri' | 'xsd:integer' | ...

plus lineage columns (src_repo, src_path, src_commit, content_sha256)
on the extraction output.
"""

__version__ = "0.1.0"
