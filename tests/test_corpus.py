"""Corpus generator invariants (FIXTURES.md §2)."""

import pandas as pd

from dedup_spark.corpus import CorpusSpec, generate_corpus


def test_determinism():
    a = generate_corpus(CorpusSpec(n_convs=80))
    b = generate_corpus(CorpusSpec(n_convs=80))
    for x, y in zip(a, b):
        pd.testing.assert_frame_equal(x, y)


def test_schema_and_invariants():
    turns, pairs, clusters = generate_corpus(CorpusSpec(n_convs=120))
    assert list(turns.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert turns["turn_idx"].dtype == "int32"
    # dense unique turn_idx per conv, ts monotone within conv
    for _, g in turns.groupby("conv_id"):
        idx = g.sort_values("turn_idx")["turn_idx"].tolist()
        assert idx == list(range(len(idx)))
        assert g.sort_values("turn_idx")["ts"].is_monotonic_increasing
    # canonical pair order
    assert (pairs["conv_a"] < pairs["conv_b"]).all()
    assert set(pairs["kind"]) <= {"exact_dup", "near_dup", "substring_dup", "chain"}
    # every conv has a cluster; cluster_id is the min member
    assert set(clusters["conv_id"]) == set(turns["conv_id"])
    assert (
        clusters.groupby("cluster_id")["conv_id"].min()
        == clusters.groupby("cluster_id")["cluster_id"].first()
    ).all()


def test_exact_dups_are_verbatim():
    turns, pairs, _ = generate_corpus(CorpusSpec(n_convs=100))
    byconv = {c: g.sort_values("turn_idx")["text"].tolist() for c, g in turns.groupby("conv_id")}
    ex = pairs[pairs["kind"] == "exact_dup"]
    assert len(ex) > 0
    for _, r in ex.iterrows():
        assert byconv[r.conv_a] == byconv[r.conv_b]


def test_chain_groups_present():
    _, pairs, clusters = generate_corpus(CorpusSpec(n_convs=400))
    chains = pairs[pairs["kind"] == "chain"]
    assert len(chains) >= 3  # at least one A-B-C-D chain
    # chain members share one oracle cluster
    members = set(chains["conv_a"]) | set(chains["conv_b"])
    cl = clusters.set_index("conv_id")["cluster_id"]
    first_chain = sorted(members)[:4]
    assert len({cl[m] for m in first_chain}) == 1


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    """Winnowing guarantee (Schleimer et al.): two docs sharing a
    substring of length >= k + w - 1 share at least one fingerprint;
    winnowed sets are ~1/w the density of full shingling."""
    import numpy as np
    import dedup_spark.entry_queries as eq

    rng = np.random.Generator(np.random.PCG64(99))

    def txt(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

    shared = txt(eq._WIN_K + eq._WIN_W - 1 + 30)
    docs = [(0, txt(120) + shared + txt(90)), (1, txt(40) + shared + txt(200)),
            (2, txt(260))]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = eq._read
    eq._read = lambda s_, d_, t_: df
    try:
        rows = eq._q_winnow_fingerprints(spark, "unused").collect()
    finally:
        eq._read = orig
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    # density: winnowed set well below the full gram count
    n_grams_0 = len(docs[0][1]) - eq._WIN_K + 1
    assert len(fps[0]) < 0.6 * n_grams_0
