"""Paginated REST scan as a real Spark Python DataSource (V2 API).

The mapInPandas fetcher in ``rest.py`` is the workhorse; this module
exposes the same scan through Spark 4's ``pyspark.sql.datasource``
API so it composes with the normal reader surface:

    spark.dataSource.register(PaginatedRestDataSource)
    df = (spark.read.format("paginated_rest")
          .schema(schema_ddl)
          .option("transport", "form700_etl_spark.sources.fake:fake_fetch_page")
          .option("url", "fake://filings")
          .option("key_to_pluck", "filings")
          .load())

Planning mirrors the reference's dynamic page-count discovery
(/root/reference/Form700.py:129-144): ``partitions()`` probes page 1
on the driver, then emits ONE InputPartition PER PAGE, so Spark
schedules page fetches exactly like file splits — parallel, retryable
per-task, locality-free.  Options travel as strings (the V2 contract),
so the transport is named as ``module:function`` and imported inside
the executor.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .rest import RestSourceConfig


def _load_transport(spec: str):
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class PaginatedRestReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.options = options
        self.config = RestSourceConfig(
            url=options.get("url", ""),
            agency_prefix=options.get("agency_prefix", ""),
            page_size=int(options.get("page_size", "1000")),
            is_redacted=options.get("is_redacted", "false").lower() == "true",
        )
        self.transport_spec = options["transport"]
        self.key_to_pluck = options.get("key_to_pluck")

    def partitions(self):
        fetch = _load_transport(self.transport_spec)
        first = fetch(self.config, 1)
        total = int(first.get("totalMatchingPages", 1))
        return [_PagePartition(p) for p in range(1, total + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetch = _load_transport(self.transport_spec)
        body = fetch(self.config, partition.page)
        payload = body.get(self.key_to_pluck) if self.key_to_pluck else body.get("items", body)
        if not isinstance(payload, list):
            payload = [payload]
        field_names = [f.name for f in self.schema.fields]
        for rec in payload:
            yield tuple(_coerce(rec.get(name)) for name in field_names)


def _coerce(value):
    # nested dict/list values pass through as Rows via Spark's converter;
    # plain dicts need tuple-ization only for struct fields — the Python
    # DataSource accepts dicts/lists natively, so pass as-is.
    return value


class PaginatedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self):
        raise NotImplementedError(
            "paginated_rest requires an explicit .schema(...) — the engine "
            "never infers schemas from remote payloads (SURVEY §1.3)."
        )

    def reader(self, schema) -> PaginatedRestReader:
        return PaginatedRestReader(schema, self.options)


def register_rest_datasource(spark) -> None:
    spark.dataSource.register(PaginatedRestDataSource)
