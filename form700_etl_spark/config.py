"""S8/O4 YAML config bootstrap (SURVEY §2.1 S8, §2.9 O4).

The reference wires its whole job from ``fieldConfig.yaml``
(/root/reference/Form700.py:39-46, 692-706; keys ``schema_dir``,
``authUrl``, ``url_cover``, ``url_schedule``, ``agency_prefix``,
``job_name``, ``log_dir``, credentials, ``fieldConfig.yaml:1-12``).
This module loads the same file shape into the engine's typed configs,
so a user of the reference can point their existing YAML at this repo
and run: ``load_job_config(path)`` → REST source configs (cover +
schedule endpoints), chunked-sink policy, and the schema/table-registry
directory that drives the per-dataset clean pass.

Extra keys are preserved in ``raw`` (the reference's ConfigItems is an
open dict — :39-46), so downstream code can read custom entries without
a schema change here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .sinks.chunked import ChunkedSinkConfig
from .sources.rest import RestSourceConfig


@dataclass(frozen=True)
class JobConfig:
    job_name: str
    schema_dir: str | None
    cover_source: RestSourceConfig
    schedule_source: RestSourceConfig
    sink: ChunkedSinkConfig
    log_dir: str | None = None
    dataset_base_url: str | None = None
    raw: dict = field(default_factory=dict)

    def source(self, endpoint: str, is_redacted: bool = False) -> RestSourceConfig:
        """The O2 dual-run parameterization (Form700.py:716-718): same
        endpoint config with the redaction flag flipped."""
        base = self.cover_source if endpoint == "cover" else self.schedule_source
        from dataclasses import replace

        return replace(base, is_redacted=is_redacted)


def load_job_config(path: str) -> JobConfig:
    """``yaml.safe_load`` the fieldConfig.yaml-shaped file into typed
    configs (Form700.py:692-706's main-block wiring, minus the Socrata/
    email side files which stay injectable clients here)."""
    import yaml

    with open(path) as fh:
        cfg = yaml.safe_load(fh) or {}

    def rest(url_key: str) -> RestSourceConfig:
        return RestSourceConfig(
            url=cfg.get(url_key, ""),
            agency_prefix=cfg.get("agency_prefix", ""),
            page_size=int(cfg.get("page_size", 1000)),
            auth_url=cfg.get("authUrl"),
            username=cfg.get("form700_username"),
            password=cfg.get("form700_password"),
        )

    return JobConfig(
        job_name=cfg.get("job_name", "form700"),
        schema_dir=cfg.get("schema_dir"),
        cover_source=rest("url_cover"),
        schedule_source=rest("url_schedule"),
        sink=ChunkedSinkConfig(
            chunk_size=int(cfg.get("chunk_size", 1000)),
            throttle_s=float(cfg.get("throttle_s", 0.25)),
        ),
        log_dir=cfg.get("log_dir"),
        dataset_base_url=cfg.get("dataset_base_url"),
        raw=cfg,
    )
