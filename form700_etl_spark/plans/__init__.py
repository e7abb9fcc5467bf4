"""End-to-end pipeline plans (reference SURVEY §3)."""

from .form700 import run_form700_pipeline, synthesize_filings  # noqa: F401
