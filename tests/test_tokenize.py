"""Arrow tokenize helper (pipelines/queries.py:_tokens_with_doc) edge
semantics: must match DuckDB string_split(text, ' ') exactly — '' yields
one empty token, adjacent separators yield empty tokens, nulls behave as
'' — because four oracle-checked queries (tfidf, top-terms, bigrams,
postings) build on it."""

import duckdb
import numpy as np
import pyarrow as pa

from datax_ray.pipelines.queries import _tokens_with_doc

CASES = ["", "a", "a b", "a  b", " a", "b ", "  ", "x y z", "join merge"]


def _duck_tokens(texts):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, unnest(string_split(t, ' ')) FROM "
        "(SELECT UNNEST(range(len($1))) AS i, UNNEST($1) AS t) ORDER BY i",
        [texts],
    ).fetchall()
    return [r[1] for r in rows], [r[0] for r in rows]


def test_matches_duckdb_string_split():
    t = pa.table(
        {"doc_id": pa.array(range(len(CASES)), pa.int64()),
         "text": pa.array(CASES, pa.string())}
    )
    flat, ids = _tokens_with_doc(t, "doc_id")
    want_tok, want_ids = _duck_tokens(CASES)
    assert flat.to_pylist() == want_tok
    assert ids.to_pylist() == want_ids


def test_null_text_behaves_as_empty():
    t = pa.table(
        {"doc_id": pa.array([7], pa.int64()),
         "text": pa.array([None], pa.string())}
    )
    flat, ids = _tokens_with_doc(t, "doc_id")
    assert flat.to_pylist() == [""]
    assert ids.to_pylist() == [7]


def test_without_ids_and_chunked_input():
    chunked = pa.table(
        {"doc_id": pa.chunked_array([[1, 2], [3]]),
         "text": pa.chunked_array([["a b", "c"], ["d e f"]])}
    )
    flat, ids = _tokens_with_doc(chunked, "doc_id")
    assert flat.to_pylist() == ["a", "b", "c", "d", "e", "f"]
    assert ids.to_pylist() == [1, 1, 2, 3, 3, 3]
    flat2, none = _tokens_with_doc(chunked)
    assert none is None and flat2.to_pylist() == flat.to_pylist()


def test_empty_table():
    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    flat, ids = _tokens_with_doc(t, "doc_id")
    assert len(flat) == 0 and len(ids) == 0
