"""Hypothesis property tests for the determinism-critical column functions.

The cross-engine oracles rest on three contracts: Spark tokenization ==
the Python model (used by the Arrow paths) == the DuckDB regexp twin, the
shingle edge rules, and lossless JSON envelope transport. Hypothesis
hunts the edges example-based tests miss (empty strings, all-separator
strings, quotes/backslashes/control chars in JSON).

Each example ships a LIST of strings through one Spark job (per-example
jobs would be prohibitively slow), with max_examples kept small.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_voting_system_spark.functions.text import (
    TOKEN_SPLIT_RE,
    tokens,
    word_ngrams,
)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
SPLIT = re.compile(TOKEN_SPLIT_RE)

HSET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in SPLIT.split(text.lower()) if t]


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = _py_tokens(text)
    if not toks:
        return [""]
    return [
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
    ]


@HSET
@given(st.lists(ascii_text, min_size=1, max_size=40))
def test_tokens_match_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {
        r.id: list(r.t)
        for r in df.select("id", tokens(F.col("text")).alias("t")).collect()
    }
    assert got == {i: _py_tokens(t) for i, t in enumerate(texts)}


@HSET
@given(st.lists(ascii_text, min_size=1, max_size=40))
def test_word_ngrams_match_python_model(spark, texts):
    """Incl. the edge rules every shingle consumer mirrors: <n tokens →
    one truncated shingle; zero tokens → [""]."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    toked = df.select("id", tokens(F.col("text")).alias("toks"))
    got = {
        r.id: list(r.s)
        for r in toked.select(
            "id", word_ngrams(F.col("toks"), 3).alias("s")
        ).collect()
    }
    assert got == {i: _py_shingles(t) for i, t in enumerate(texts)}


@HSET
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=1, max_codepoint=0x2FF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_envelope_roundtrip_arbitrary_strings(spark, texts):
    """JSON envelope must survive quotes, backslashes, control chars, and
    non-ASCII — the serializer is to_json/from_json, but the CONTRACT
    (lossless key+payload transport) is ours to pin."""
    from realtime_voting_system_spark.streaming.envelope import (
        parse_envelope,
        to_envelope,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    back = parse_envelope(to_envelope(df, "doc_id"), df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
