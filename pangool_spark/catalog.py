"""Named-schema catalog, persisted as JSON beside tuple files.

Ergonomics layer over ``Schema`` (ROADMAP item): the reference ships
schemas inside every job's serialized config (``P/io/Schema.java:736-772``
JSON form, distributed via the DistributedCache); a long-lived engine wants
them named, versioned, and discoverable instead. ``Catalog`` keeps named
schemas (enum domains, defaults, aliases, codec metadata all survive the
JSON round-trip) and the tuple-file helpers write/read a ``_SCHEMA.json``
sidecar so a dataset carries its declared schema — including the parts
parquet cannot express (enum domains, aliases, per-field codecs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from pangool_spark.schema import Schema, SchemaError

SIDECAR = "_SCHEMA.json"


class Catalog:
    """Named schema registry with JSON persistence."""

    def __init__(self, schemas: dict[str, Schema] | None = None):
        self._schemas: dict[str, Schema] = dict(schemas or {})

    def register(self, schema: Schema, replace: bool = False) -> "Catalog":
        if schema.name in self._schemas and not replace:
            raise SchemaError(
                f"schema {schema.name!r} already registered (replace=True to overwrite)"
            )
        self._schemas[schema.name] = schema
        return self

    def get(self, name: str) -> Schema:
        try:
            return self._schemas[name]
        except KeyError:
            raise SchemaError(
                f"unknown schema {name!r}; registered: {sorted(self._schemas)}"
            ) from None

    def remove(self, name: str) -> None:
        self._schemas.pop(name, None)

    def names(self) -> list[str]:
        return sorted(self._schemas)

    def __contains__(self, name: str) -> bool:
        return name in self._schemas

    def __len__(self) -> int:
        return len(self._schemas)

    # -- persistence -------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {name: json.loads(s.to_json()) for name, s in sorted(self._schemas.items())}
        )

    @staticmethod
    def from_json(payload: str) -> "Catalog":
        data = json.loads(payload)
        return Catalog(
            {name: Schema.from_json(json.dumps(sd)) for name, sd in data.items()}
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def load(path: str) -> "Catalog":
        with open(path) as f:
            return Catalog.from_json(f.read())


# -- tuple-file sidecar ------------------------------------------------------

def write_tuples_catalogued(
    df: DataFrame,
    path: str,
    schema: Schema,
    check_enums: bool = True,
    **write_kwargs,
) -> None:
    """``write_tuples`` + a ``_SCHEMA.json`` sidecar carrying the declared
    schema (enum domains enforced on the way in when ``check_enums``).

    The sidecar is one small driver-side file (like parquet's _SUCCESS);
    on an object store, route through the same filesystem layer the
    committer uses."""
    from pangool_spark.sources.tuplefile import write_tuples

    conformed = schema.conform(df)
    if check_enums:
        conformed = schema.check_enums(conformed)
    write_tuples(conformed, path, **write_kwargs)
    with open(os.path.join(path, SIDECAR), "w") as f:
        f.write(schema.to_json())


def read_tuples_catalogued(
    spark: SparkSession, path: str, target_schema: Schema | None = None
) -> tuple[DataFrame, Schema | None]:
    """``read_tuples`` that honors the dataset's ``_SCHEMA.json`` sidecar:
    the declared schema (not just parquet's physical one) drives conform /
    evolution. Returns (df, declared_schema)."""
    from pangool_spark.sources.tuplefile import read_tuples

    declared: Schema | None = None
    sidecar = os.path.join(path, SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            declared = Schema.from_json(f.read())
    df = read_tuples(spark, path, target_schema=target_schema or declared)
    return df, declared
