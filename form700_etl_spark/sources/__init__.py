"""Source connectors (reference SURVEY §2.1)."""

from .rest import PaginatedRestSource, RestSourceConfig  # noqa: F401
