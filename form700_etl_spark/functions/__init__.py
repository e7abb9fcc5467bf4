"""Reusable Column-expression builders (the engine's scalar-function
library).  Everything here is built-in-function composition — JVM-side,
whole-stage-codegen'd, no Python in the hot path."""

from .money import cents, cents_sql, money, money_sql  # noqa: F401
from .cleaning import (  # noqa: F401
    checkbox_cast,
    date_cast_yyyymmdd,
    number_cast,
    snake_case,
    strip_newlines,
    text_cast,
)
from .nested import explode_outer_flat, prefix_rename, stringify_structs  # noqa: F401
