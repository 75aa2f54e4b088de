"""THE canonical text normalization, defined once.

Every digest/shingle consumer — exact/incremental/stream dedup, shingle
generation, contamination probes, TF-IDF, LM perplexity — and every DuckDB
oracle (``queries._NORM_SQL``) must agree byte-for-byte on normalization,
or digest parity silently forks. One definition here; a missed copy was
exactly the failure mode a 7-site inline duplication invited.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: str | Column) -> Column:
    """lowercase → collapse runs of whitespace to one space → trim.
    SQL mirror: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def normalized_tokens(col: str | Column) -> Column:
    """Normalized text split on single spaces, empty tokens dropped."""
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != "")


def content_digest(col: str | Column) -> Column:
    """16-byte md5 of the normalized text — the exact-dedup identity."""
    return F.md5(normalized_text(col))
