"""test_dataengineer2026_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the capability surface of the
reference repo ``osangaal/Test_DataEngineer2026`` (a data-engineering
capability spec over mining technical-report documents — see
``/root/reference/TEST_TECNICO_INGENIERO_DATOS.md``), widened with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) and designed for 100 TB scale.

Layout:
    session.py      SparkSession factory (AQE, Arrow, UTC, tuned shuffles)
    tables.py       loaders for the harness star schema parquet tables
    registry.py     query registry: name -> (Spark callable, DuckDB oracle)
    queries/        one oracle-checked query per SURVEY.md §2 operator
    operators/      reusable operator implementations (dedup, similarity,
                    as-of join, text analysis, top-k, ...)
    functions/      scalar/vector/text column-expression helpers
    sources/        readers (parquet/csv/json/text/binaryFile) and sinks
    streaming/      Structured Streaming jobs over the events surface
    extraction/     the reference spec's document-extraction pipeline
    multimodal/     binary-column (image/audio/video) plumbing
"""

__version__ = "0.1.0"
