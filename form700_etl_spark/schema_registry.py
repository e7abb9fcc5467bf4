"""Schema registry — the reference's external fixed schemas (S6/S7).

The reference drives its projection/cast pass from per-dataset schema
CSVs with columns ``dataTypeName,fieldName,name`` and a table registry
CSV (/root/reference/Form700.py:249-253, 416-423; SURVEY §1.3): the
column list is inferred once, the types are hand-curated, and the
schema is fixed forever — projection FAILS on missing columns (an
implicit runtime schema test).

This registry reproduces that contract for the engine: CSVs under
``resources/`` (authored for this repo's pipeline shape, same 4-type
vocabulary: text / number / checkbox / date) load into (ordered field
list, field->type map, Spark StructType).  ``plans/form700`` consumes
it for the P1 projection and C1 cast pass, so the schema file is the
single source of truth exactly as in the reference.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

from pyspark.sql import types as T

RESOURCE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "resources")

_SPARK_TYPES = {
    "text": T.StringType(),
    "number": T.DoubleType(),
    "checkbox": T.BooleanType(),
    "date": T.DateType(),
}


@dataclass(frozen=True)
class DatasetSchema:
    name: str
    fields: tuple  # ordered fieldNames (P1 projection order)
    type_map: dict  # fieldName -> declared type (C1 dispatch)
    display_names: dict  # fieldName -> human name (C10 metadata)

    def struct_type(self, date_compat: bool = False) -> T.StructType:
        out = []
        for f in self.fields:
            decl = self.type_map[f]
            if decl == "date" and date_compat:
                spark_t: T.DataType = T.StringType()
            else:
                spark_t = _SPARK_TYPES[decl]
            out.append(T.StructField(f, spark_t, True))
        return T.StructType(out)


def load_schema(dataset: str, resource_dir: str = RESOURCE_DIR) -> DatasetSchema:
    path = os.path.join(resource_dir, f"form700_{dataset}_schema.csv")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no schema CSV for dataset {dataset!r} at {path}")
    fields, type_map, display = [], {}, {}
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            decl = row["dataTypeName"].strip()
            if decl not in _SPARK_TYPES:
                raise ValueError(f"{dataset}: unknown declared type {decl!r} for {row['fieldName']!r}")
            fields.append(row["fieldName"])
            type_map[row["fieldName"]] = decl
            display[row["fieldName"]] = row["name"]
    return DatasetSchema(dataset, tuple(fields), type_map, display)


def available_datasets(resource_dir: str = RESOURCE_DIR) -> list[str]:
    out = []
    for f in sorted(os.listdir(resource_dir)):
        if f.startswith("form700_") and f.endswith("_schema.csv"):
            out.append(f[len("form700_"):-len("_schema.csv")])
    return out
