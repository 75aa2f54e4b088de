"""Property sweep for the NaiveBayes tokenizer-parity claim (r07 verdict
item 9): the naive_bayes_docs oracle replicates the Spark tokenization

    split-on-\\s+  →  strip ASCII punct  →  lowercase  (''-tokens KEPT)

in DuckDB SQL, and the driver hash-compares the downstream counts, so
the two tokenizations must agree on the MULTISET of emitted tokens for
arbitrary text — not just the fixture corpus. Sweeps random strings over
a mixed alphabet (ASCII letters/digits/punct, common whitespace, accented
and non-Latin letters) through both engines.

Known, deliberately excluded divergence: Java's \\s matches vertical tab
(\\x0B) but DuckDB's RE2 \\s does not — documents containing \\x0B would
tokenize differently. The fixture corpus (and any sane text corpus after
normalization) has none; the alphabet below therefore omits \\x0B, and
this docstring is the documented boundary of the parity contract.
"""

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

# mixed alphabet: ASCII letters/digits, the full ASCII punct block the
# tokenizer strips, realistic whitespace, and a spread of non-ASCII
# letters (accented Latin, sharp s, Cyrillic, Greek, CJK) that exercise
# lower() and \s+ outside ASCII
_ALPHABET = (
    "abcXYZ09"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    " \t\n\r"
    "éÉßçÇøØАБвгλΛ漢字ñÑ"
)

_TOKEN_SQL = r"""
SELECT id, lower(regexp_replace(t.tok, '[!-/:-@\[-`{-~]', '', 'g')) AS word
FROM docs,
     unnest(list_filter(string_split_regex(trim(text), '\s+'),
                        x -> x <> '')) AS t(tok)
"""


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet=_ALPHABET, min_size=0, max_size=40),
        min_size=1,
        max_size=25,
    )
)
def test_tokenizer_multiset_matches_duckdb(spark, texts):
    from collections import Counter

    from pangool_spark.operators.ml import _norm_tokens

    rows = list(enumerate(texts))
    sdf = spark.createDataFrame(rows, "id LONG, text STRING").select(
        "id", F.explode(_norm_tokens("text")).alias("word")
    )
    got = Counter((r.id, r.word) for r in sdf.collect())

    con = duckdb.connect()
    con.register(
        "docs",
        __import__("pandas").DataFrame(rows, columns=["id", "text"]),
    )
    want = Counter((r[0], r[1]) for r in con.execute(_TOKEN_SQL).fetchall())
    assert got == want, {
        "spark_only": got - want,
        "duck_only": want - got,
    }
