"""Laws for content-defined chunking (operators/cdc.py): boundaries
reassemble losslessly, realign within one gear window of an edit, and
don't depend on partitioning."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from form700_etl_spark.operators.cdc import (
    _WINDOW,
    cdc_chunk_table,
    chunk_bounds,
)


def test_bounds_reassemble_and_are_deterministic():
    data = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    b1 = chunk_bounds(data)
    b2 = chunk_bounds(data)
    assert b1 == b2
    assert b1[-1] == len(data)
    assert all(0 < e <= len(data) for e in b1)
    assert b1 == sorted(set(b1))
    # chunks cover the data exactly
    prev, joined = 0, b""
    for e in b1:
        joined += data[prev:e]
        prev = e
    assert joined == data


def test_shift_locality_law():
    """Prepending a prefix must only disturb boundaries within one
    gear window past the prefix — every later boundary shifts by
    exactly len(prefix) and every later chunk hashes identically."""
    base = ("content defined chunking realigns after edits " * 60).encode()
    prefix = b"INSERTED-EDIT-REGION-"
    b0 = chunk_bounds(base)
    b1 = chunk_bounds(prefix + base)
    horizon = len(prefix) + _WINDOW
    stable0 = [e for e in b0 if e > horizon]
    stable1 = [e - len(prefix) for e in b1 if e > horizon + len(prefix)]
    assert stable0 == stable1
    # chunk payloads between stable boundaries are identical
    def chunks_after(data, bounds, skip_to):
        keep = [e for e in bounds if e >= skip_to]
        out, prev = [], keep[0]
        for e in keep[1:]:
            out.append(hashlib.md5(data[prev:e]).hexdigest())
            prev = e
        return out

    assert chunks_after(base, b0, stable0[0]) == chunks_after(
        prefix + base, b1, stable1[0] + len(prefix)
    )


def test_empty_and_tiny_inputs():
    assert chunk_bounds(b"") == []
    assert chunk_bounds(b"a") == [1]


def test_chunk_table_partitioning_invariance(spark, sf_dir):
    from form700_etl_spark.io import table

    d = table(spark, sf_dir, "documents").limit(50)
    a = cdc_chunk_table(d).orderBy("doc_id", "chunk_idx").collect()
    b = (
        cdc_chunk_table(d.repartition(7))
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    assert a == b
    # reassembly through the table: per-doc byte sums match the source
    lens = (
        cdc_chunk_table(d)
        .groupBy("doc_id")
        .agg(F.sum("chunk_len").alias("n"))
        .collect()
    )
    src = {
        r["doc_id"]: len(r["text"].encode("utf-8"))
        for r in d.select("doc_id", "text").collect()
    }
    assert {r["doc_id"]: r["n"] for r in lens} == src


def test_dedup_cdc_chunks_query(spark, sf_dir):
    from form700_etl_spark.registry import all_queries

    row = all_queries()["dedup_cdc_chunks"].fn(spark, sf_dir).collect()[0]
    assert row["n_chunks"] >= row["n_unique_chunks"] > 0
    assert row["total_bytes"] >= row["unique_bytes"] > 0
    # fixture has injected exact dups -> some chunk-level dedup exists
    assert row["dedup_ratio"] > 0
