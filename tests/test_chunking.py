"""Sliding-window document chunking — randomized DuckDB replay plus
boundary cases (stride==size tiling, oversize stride, empty docs)."""

import numpy as np
import pandas as pd
import pytest

from beats_ray.dataops.sampling import chunk_documents


def _sql_replay(df: pd.DataFrame, size: int, stride: int) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(rf"""
        WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(coalesce(text, ''),
                        '\s+'), x -> x <> '') AS ws
          FROM documents
        ), n AS (
          SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0
        ), s AS (
          SELECT doc_id, ws, n, unnest(range(0, n, {stride})) AS st FROM n
        )
        SELECT doc_id, CAST(st // {stride} AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(ws, st + 1,
                                          LEAST(st + {size}, n)), ' ')
                 AS chunk_text,
               CAST(LEAST(st + {size}, n) - st AS BIGINT) AS n_tokens
        FROM s ORDER BY doc_id, chunk_idx""").fetchdf()


def _mk_docs(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = ["Apple", "b", "CC", "dd-dd", "e9", "ff"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 40)))
             for _ in range(n)]
    texts[0] = ""
    texts[1] = "solo"
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


@pytest.mark.parametrize("size,stride", [(8, 8), (8, 5), (8, 13), (1, 1)])
def test_chunking_vs_sql(ray_session, size, stride):
    import ray.data as rd

    df = _mk_docs(7, 80)
    got = (chunk_documents(rd.from_pandas(df).repartition(4),
                           size=size, stride=stride)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    want = _sql_replay(df, size, stride)
    pd.testing.assert_frame_equal(
        got.astype({"chunk_idx": "int64", "n_tokens": "int64"}),
        want.astype({"chunk_idx": "int64", "n_tokens": "int64"}),
    )


def test_chunking_tiles_and_overlaps(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0], "text": ["a b c d e"]})
    tiled = chunk_documents(rd.from_pandas(df), size=2, stride=2).to_pandas()
    assert list(tiled["chunk_text"]) == ["a b", "c d", "e"]
    over = (chunk_documents(rd.from_pandas(df), size=3, stride=2)
            .to_pandas().sort_values("chunk_idx"))
    assert list(over["chunk_text"]) == ["a b c", "c d e", "e"]
    assert list(over["n_tokens"]) == [3, 3, 1]
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), size=0)
