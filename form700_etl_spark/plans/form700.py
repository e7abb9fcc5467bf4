"""The reference's whole ETL (EP1, /root/reference/Form700.py:667-687)
re-expressed as one lazy Spark dataflow.

Reference pipeline:  extract cover + schedules → left-join filer info
onto every schedule row (J1, :346-352) → clean: route list-columns to
stringify/explode (N2/E1, :325-344), project to schema (P1, :253),
strip newlines (C7, :296-298), cast per declared type (C1/C2, :259-289)
→ load (chunked sink, here sinks/chunked.py) — all eager pandas, one
thread.  Here the same dataflow is a single Catalyst plan: the explode
is linear (not the reference's O(n²) loop), the enrichment join
broadcasts the cover side, and the cast/clean pass folds into one
projected select inside whole-stage codegen.

``synthesize_filings`` builds a deterministic nested filings table from
the TPC-H fixtures (orders = filings, customers = filers, lineitems =
schedule items) shaped like FIXTURES.md §F1, so the full pipeline is
DuckDB-oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    cast_fields,
    schema_projection,
    snake_case_columns,
    strip_newlines,
)
from ..functions.nested import explode_outer_flat, stringify_structs
from ..io import table

# The flat schedule output contract lives in the schema registry
# (resources/form700_scheduleA1_schema.csv) — external fixed schemas,
# exactly like the reference's schema CSV directory (SURVEY §1.3).


def synthesize_filings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nested row per filing: cover fields + ``offices``
    array<struct> + ``scheduleA1`` array<struct> (FIXTURES.md §F1)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    l = table(spark, sf_dir, "lineitem")

    items = l.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("id"),
                    # dirty number string exercising the C2 cast:
                    # '12', '12k' (letter->0), '12%' (%->0)
                    F.concat(
                        F.col("l_quantity").cast("long").cast("string"),
                        F.when(F.col("l_linenumber") % 3 == 0, "k").otherwise(""),
                        F.when(F.col("l_returnflag") == "R", "%").otherwise(""),
                    ).alias("fairMarketValue"),
                    F.col("l_returnflag").alias("natureOfInvestment"),
                )
            )
        ).alias("scheduleA1")
    )
    cover = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select(
            F.col("o_orderkey").alias("filingId"),
            F.col("o_custkey").alias("filerId"),
            F.coalesce(F.col("c_name"), F.lit("")).alias("filerName"),
            F.coalesce(F.col("c_mktsegment"), F.lit("")).alias("departmentName"),
            F.date_format("o_orderdate", "yyyyMMdd").alias("filingDate"),
            F.when(F.col("o_orderstatus") == "P", True).alias("isAmendment"),  # NULL unless P
            F.array(
                F.struct(
                    F.concat(F.lit("Office-"), F.col("o_orderpriority")).alias("office"),
                    F.col("o_orderstatus").alias("position"),
                )
            ).alias("offices"),
        )
    )
    return cover.join(items, cover.filingId == items.l_orderkey, "left").drop("l_orderkey")


def run_form700_pipeline(filings: DataFrame) -> dict[str, DataFrame]:
    """EP1: filings → {'cover': df, 'scheduleA1': df} flat clean tables."""
    # N2: offices array<struct> -> delimited string (list-column routing N3)
    cover = filings.withColumn(
        "officesStr", stringify_structs("offices", ["office", "position"])
    ).drop("offices")

    # schedule child table: E1 explode_outer + E2 prefix rename
    schedule = explode_outer_flat(
        cover.select("filingId", "scheduleA1"), "scheduleA1", prefix="item"
    )

    # J1: broadcast left enrichment join of filer info onto every child row
    filer_info = cover.select(
        "filingId", "filerName", "departmentName", "officesStr", "filingDate", "isAmendment"
    )
    enriched = schedule.join(F.broadcast(filer_info), "filingId", "left")

    # P1 projection -> C7 newline strip -> C1 schema-driven casts, all
    # driven by the external schema CSV (S6/S7)
    from ..schema_registry import load_schema

    schema = load_schema("scheduleA1")
    projected = schema_projection(enriched, list(schema.fields))
    stripped = projected.select(
        *[
            strip_newlines(F.col(name)).alias(name)
            if schema.type_map[name] == "text"
            else F.col(name)
            for name in projected.columns
        ]
    )
    clean = cast_fields(stripped, schema.type_map, date_compat=True)

    # C9: snake_case on the way to the sink (Form700.py:464-468)
    cover_out = snake_case_columns(cover.drop("scheduleA1"))
    schedule_out = snake_case_columns(clean)
    return {"cover": cover_out, "scheduleA1": schedule_out}


def run_dual(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """O2 dual-run (Form700.py:716-718): the same pipeline twice, once
    private and once redacted, redacted datasets keyed ``*_redacted``.
    Redaction is a source-side flag in the reference (the API redacts;
    the ETL has no redaction logic) — modeled here as a source filter
    so the run parameterization matches the reference's shape."""
    out: dict[str, DataFrame] = {}
    for redacted in (False, True):
        filings = synthesize_filings(spark, sf_dir)
        if redacted:
            # source-side redaction stand-in: the public feed masks filer names
            filings = filings.withColumn("filerName", F.lit("[REDACTED]"))
        tables = run_form700_pipeline(filings)
        suffix = "_redacted" if redacted else ""
        for name, df in tables.items():
            out[f"{name}{suffix}"] = df
    return out
