"""Oracle-checked query definitions — the driver-facing operator surface.

Modules register into :mod:`form700_etl_spark.registry` at import time:

    relational   scans, filters, joins, aggregates, set ops (SURVEY §2.2/§2.3/§2.6, M1/M3)
    windows      window functions, top-k, sessionization (M3)
    refparity    reference-parity transforms (SURVEY §2.4/§2.5, M2)
    events       JSON extraction, time windows, as-of/range joins (M3/M5)
    dedup        exact + near-duplicate detection (M5)
    similarity   embedding similarity search (M5)
    textops      text analysis: tokens, quality, language-id, fingerprints (M5)
    pipeline_ops training-data pipeline: hash sampling/splits, sequence
                 packing, quality gate, redaction, contamination screen (M5)
"""
