"""pangool_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of datasalt/Pangool (the "Tuple MapReduce"
framework), re-expressed Spark-first.

The reference (read-only at /root/reference) is a Java dataflow API on Hadoop
MapReduce: schema-ful tuples, group-by with secondary sort, reduce-side
co-group joins over heterogeneous schemas, rollup with open/close callbacks,
multiple inputs/outputs. This package maps every one of those capabilities
onto the DataFrame/SQL API so Catalyst + Tungsten do the physical planning:

- ``pangool_spark.schema``    — Schema / Fields.parse DSL  (ref: P/io/Schema.java, P/io/Fields.java)
- ``pangool_spark.orderby``   — OrderBy DSL incl. null order (ref: P/tuplemr/OrderBy.java, Criteria.java)
- ``pangool_spark.plans``     — TupleMRBuilder / MapOnlyJobBuilder equivalents
- ``pangool_spark.operators`` — grouping, joins, rollup, windows/top-k, dedup,
                                similarity search, text analysis, multimodal
- ``pangool_spark.sources``   — CSV (full TupleTextInputFormat option parity),
                                fixed-width, tuple files (parquet), Avro
- ``pangool_spark.streaming`` — Structured Streaming over the same operators

Paths in docstrings abbreviate
``/root/reference/core/src/main/java/com/datasalt/pangool/`` as ``P/`` and
``/root/reference/examples/src/main/java/com/datasalt/pangool/examples/`` as
``EX/``.
"""

from pangool_spark.schema import Field, Fields, Schema
from pangool_spark.orderby import Order, OrderBy
from pangool_spark.session import get_spark
from pangool_spark.codecs import register_codec, get_codec, decode_col, encode_col

__version__ = "0.1.0"

__all__ = [
    "Field",
    "Fields",
    "Schema",
    "Order",
    "OrderBy",
    "get_spark",
    "register_codec",
    "get_codec",
    "decode_col",
    "encode_col",
    "__version__",
]
