"""gomysql2pg_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference tool
iverycd/gomysql2pg (a Go MySQL→PostgreSQL migration pump), re-expressed
Spark-first:

- the relational query semantics the reference *generates as SQL*
  (SURVEY.md §2.B) become native DataFrame programs
  (`operators.relational`),
- the row-pump / paging / type-map / DDL / validation machinery it
  implements in Go (SURVEY.md §2.A) becomes `plans.pagination`,
  `functions.typemap`, `functions.transforms`, `ddl`, `validate`,
  `sources.jdbc`, `sinks.jdbc`,
- plus the large-scale training-data-pipeline operators (SURVEY.md §2.D):
  dedup, similarity search, text analysis, multimodal columns,
  structured streaming.

Everything is DataFrame/Catalyst-native; Python UDFs appear only where
built-in expressions genuinely cannot express the semantics (and then as
Arrow-batched Pandas UDFs).
"""

__version__ = "0.1.0"
