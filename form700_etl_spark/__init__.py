"""form700_etl_spark — a PySpark-native analytics engine.

A ground-up rebuild of the data-processing capabilities of the
DataSF/form700_ETL reference (a single-file pandas ETL; see SURVEY.md)
as idiomatic Spark DataFrame/SQL operators, extended with the general
relational surface (joins, aggregations, windows, set ops) and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
streaming), every operator designed for 100 TB scale.

Layout:
    session     SparkSession factory tuned for the local harness
    io          test-table loaders / temp-view registration
    registry    Query registry (name -> spark fn + DuckDB oracle SQL)
    functions/  reusable Column-expression builders (cleaning, nested)
    operators/  composite operators (dedup, similarity, text, asof)
    sources/    paginated-REST-style source (reference S1-S5)
    sinks/      chunked retrying sink (reference K1-K5)
    plans/      the reference's end-to-end pipeline re-expressed
    streaming/  Structured Streaming variants over the events table
    queries/    oracle-checked query definitions (the driver surface)
"""

__version__ = "0.1.0"
