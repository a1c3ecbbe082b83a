"""Mixed-script oracle parity for the byte-space substring family.

The driver's correctness gate runs on an ASCII corpus, so it cannot see
whether the byte-space substring pass and its DuckDB mirrors agree on
non-ASCII text (rounds 1-3 excluded such docs on BOTH sides, so green
rows proved nothing there). This suite replays the driver's
compare-oracle protocol on a deliberately mixed-script corpus — Latin,
Cyrillic (2-byte), CJK (3-byte) — with planted cross-doc substrings,
asserting exact row/value equality between the Spark queries and the
hex-mirror DuckDB SQL for every substring-family query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

duckdb = pytest.importorskip("duckdb")

SUB_QUERIES = [
    "substring_anchors",
    "substring_spans",
    "dnd_moving_average",
    "span_scores",
    "substring_best_match",
    "interval_marks",
]


def _mixed_corpus() -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(1234))
    alphabets = (
        [chr(97 + i) for i in range(26)]
        + [chr(0x0430 + i) for i in range(48)]
        + [chr(0x4E00 + i) for i in range(48)]
    )

    def txt(n: int) -> str:
        return "".join(alphabets[c] for c in rng.integers(0, len(alphabets), size=n))

    shared1 = txt(90)   # mixed-script shared span
    shared2 = txt(70)
    docs = [
        txt(200) + shared1 + txt(150),          # 0: pairs with 1
        txt(60) + shared1 + txt(260),           # 1
        shared2 + txt(300),                     # 2: pairs with 3 at its 5' edge
        txt(40) + shared2 + txt(30),            # 3: mostly shared2
        txt(280),                               # 4: no pair
        "café " * 60,                           # 5/6: heavy internal repeats
        "café " * 55 + txt(50),                 # 6
        txt(180),                               # 7
    ]
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "text": docs,
            "lang": ["xx"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(d) for d in docs],
        }
    )


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixed_sf")
    _mixed_corpus().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = str(pdf[c].dtype)
        if dt.startswith(("int", "uint", "Int", "UInt")):
            pdf[c] = pdf[c].astype("int64")
        elif dt.startswith(("float", "Float")):
            pdf[c] = pdf[c].astype("float64").round(6)
        else:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUB_QUERIES)
def test_mixed_script_parity(spark, sf_dir, name):
    from dedup_spark import entry_queries as eq

    spec = eq.QUERIES[name]
    got = _normalize(spec.spark_fn(spark, sf_dir).toPandas())

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = _normalize(con.sql(spec.sql).df())

    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: the corpus actually exercises the non-ASCII path — at
    # least one anchor/span row involves a multibyte doc
    if name == "substring_anchors":
        assert len(got) > 0
