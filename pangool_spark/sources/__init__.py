"""Sources & sinks (SURVEY §2.1/§2.2)."""

from pangool_spark.sources.csv import read_csv, write_csv, read_fixed_width
from pangool_spark.sources.tuplefile import read_tuples, write_tuples
from pangool_spark.sources.avro import read_avro, write_avro
from pangool_spark.sources.jsonl import read_jsonl, write_jsonl
from pangool_spark.sources.cascading import read_cascading_tuples

__all__ = [
    "read_cascading_tuples",
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
    "read_fixed_width",
    "read_tuples",
    "write_tuples",
    "read_avro",
    "write_avro",
]
