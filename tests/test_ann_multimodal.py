"""ANN (hyperplane LSH) and multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.operators import ann, multimodal

DIM = 16


def _emb_df(spark, vecs: dict[int, np.ndarray]):
    rows = [(k, [float(x) for x in v]) for k, v in vecs.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cluster_vecs(seed=3, n_clusters=5, per=8):
    """Well-separated clusters: ANN must find same-cluster neighbours."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.standard_normal((n_clusters, DIM)) * 10
    vecs, labels = {}, {}
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            vecs[i] = centers[c] + rng.standard_normal(DIM) * 0.05
            labels[i] = c
            i += 1
    return vecs, labels


class TestAnn:
    def test_bucket_udf_deterministic_and_sign_based(self, spark):
        vecs = {0: np.ones(DIM), 1: np.ones(DIM) * 2, 2: -np.ones(DIM)}
        df = _emb_df(spark, vecs)
        cast = F.transform("embedding", lambda x: x.cast("double"))
        b = ann.bucket_ids(
            df.select("vec_id", cast.alias("cv")), "cv", n_planes=8, dim=DIM
        ).collect()
        by_id = {r["vec_id"]: r["bucket"] for r in b}
        # scaling a vector never changes its sign signature
        assert by_id[0] == by_id[1]
        # antipodal vector flips every plane → complementary bucket
        assert by_id[2] == (~by_id[0]) & 0xFF

    def test_ann_matches_brute_force_on_clusters(self, spark):
        vecs, labels = _cluster_vecs()
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 5)
        got = ann.ann_topk(
            df, queries, k=3, n_planes=8, dim=DIM, n_probes=4
        ).collect()
        assert len(got) > 0
        # every returned neighbour of a clustered query is from the same
        # cluster (clusters are far apart), with near-1 cosine
        for r in got:
            assert labels[r["neighbor_id"]] == labels[r["query_id"]]
            assert r["sim"] > 0.99

    def test_ann_recall_vs_bruteforce(self, spark):
        vecs, _ = _cluster_vecs(seed=11, n_clusters=4, per=10)
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 8)
        got = ann.ann_topk(df, queries, k=3, n_planes=8, dim=DIM, n_probes=6)
        ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}

        # brute-force oracle in numpy
        ids = sorted(vecs)
        m = np.stack([vecs[i] for i in ids])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        truth = set()
        for qi in range(8):
            order = [
                j for j in np.argsort(-np.round(sims[qi], 4), kind="stable")
                if j != qi
            ]
            truth |= {(qi, ids[j]) for j in order[:3]}
        recall = len(ann_pairs & truth) / len(truth)
        assert recall >= 0.9, sorted(truth - ann_pairs)

    def test_planes_for_scales_with_corpus(self):
        assert ann.planes_for(500, 200) == 8          # floor
        assert ann.planes_for(10_000_000, 200) == 16  # 2^16 buckets ≈ 153/bucket
        assert ann.planes_for(10**12, 200) == 33      # grows with corpus
        assert ann.planes_for(10**30, 200) == 40      # int64-safe ceiling

    def test_multi_table_recall_at_10x_corpus(self, spark):
        """10× the base test corpus with DERIVED plane count + 2 tables:
        recall vs brute force stays high and no bucket exceeds the cap
        (the fixed-n_planes collapse mode: every bucket over cap →
        excluded → zero recall)."""
        vecs, _ = _cluster_vecs(seed=21, n_clusters=8, per=50)  # 400 vecs
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 12)
        got = ann.ann_topk(
            df, queries, k=3, n_planes=None, dim=DIM, n_probes=6,
            n_tables=2, target_bucket=50, max_bucket=200,
        )
        ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}

        ids = sorted(vecs)
        m = np.stack([vecs[i] for i in ids])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        truth = set()
        for qi in range(12):
            order = [
                j for j in np.argsort(-np.round(sims[qi], 4), kind="stable")
                if j != qi
            ]
            truth |= {(qi, ids[j]) for j in order[:3]}
        recall = len(ann_pairs & truth) / len(truth)
        assert recall >= 0.9, sorted(truth - ann_pairs)
        # no excluded-bucket collapse at this scale
        assert (
            ann.bucket_skew_report(
                df, n_planes=ann.planes_for(len(vecs), 50), dim=DIM,
                max_bucket=200, n_tables=2,
            ).count()
            == 0
        )

    def test_neardup_pair_operator_recovers_planted_pairs(self, spark):
        """The embedding_neardup_pairs operator path (multi-table bucket
        self-join + exact cosine verify) recovers planted near-identical
        vectors — the driver corpus has none, so this is the non-vacuous
        check of that query's operator."""
        rng = np.random.Generator(np.random.PCG64(33))
        base = rng.standard_normal((10, 64))
        vecs = {}
        for i in range(10):
            vecs[2 * i] = base[i]
            vecs[2 * i + 1] = base[i] + rng.standard_normal(64) * 0.01  # cos≈1
        rows = [(k, [float(x) for x in v]) for k, v in vecs.items()]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

        from dedup_spark.entry_queries import _q_embedding_neardup_pairs

        # _q_* reads {sf_dir}/embeddings.parquet; feed it our planted df
        import dedup_spark.entry_queries as eq

        orig = eq._read
        eq._read = lambda spark_, sf_, table: df
        try:
            got = {
                (r.vec_a, r.vec_b)
                for r in _q_embedding_neardup_pairs(spark, "unused").collect()
            }
        finally:
            eq._read = orig
        want = {(2 * i, 2 * i + 1) for i in range(10)}
        assert want <= got, sorted(want - got)

    def test_bucket_skew_report(self, spark):
        # identical vectors all land in one bucket → report fires
        df = _emb_df(spark, {i: np.ones(DIM) for i in range(30)})
        rep = ann.bucket_skew_report(df, n_planes=8, dim=DIM, max_bucket=10)
        rows = rep.collect()
        assert len(rows) == 1 and rows[0]["bucket_size"] == 30


class TestMultimodal:
    @pytest.fixture()
    def assets(self, spark):
        docs = spark.createDataFrame(
            [(i, f"payload text {i} " * (i + 1), "en", "s", 10) for i in range(6)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        return multimodal.synthesize_assets(docs)

    def test_asset_schema_and_kinds(self, assets):
        rows = assets.collect()
        assert {r["kind"] for r in rows} == {"image", "audio"}
        for r in rows:
            assert isinstance(r["payload"], (bytes, bytearray))
            if r["kind"] == "image":
                assert r["meta"]["width"] > 0 and r["meta"]["sample_rate"] is None
            else:
                assert r["meta"]["sample_rate"] == 16000

    def test_extract_features_shape_and_determinism(self, spark, assets):
        f1 = multimodal.extract_features(assets).orderBy("asset_id").collect()
        f2 = (
            multimodal.extract_features(assets.repartition(5))
            .orderBy("asset_id")
            .collect()
        )
        assert len(f1) == 6
        for a, b in zip(f1, f2):
            assert a["dim"] == multimodal.FEATURE_DIM
            assert len(a["features"]) == multimodal.FEATURE_DIM
            # partitioning/batching must not change decoded features
            assert a["features"] == b["features"]

    def test_real_decode_is_explicitly_stubbed(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_asset_batch(
                pd.Series([b"x"]), pd.Series(["image"])
            )

    def test_resize_meta(self, spark):
        docs = spark.createDataFrame(
            [(0, "t", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        a = multimodal.synthesize_assets(docs)
        # force a large image to check downscale arithmetic
        big = a.withColumn(
            "meta",
            F.struct(
                F.lit(640).alias("width"), F.lit(480).alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("duration_ms"),
            ),
        )
        r = multimodal.resize_meta(big, max_side=256).collect()[0]["resize_to"]
        assert (r["width"], r["height"]) == (256, 192)

    def test_sample_frames(self, spark, assets):
        frames = multimodal.sample_frames(assets, every_ms=500)
        pdf = frames.toPandas()
        assert (pdf["kind"] == "audio").all()  # only timed media
        assert (pdf["offset_ms"] % 500 == 0).all()
        # one asset's frame count matches its duration
        a0 = assets.filter(F.col("kind") == "audio").collect()[0]
        expect = (a0["meta"]["duration_ms"] + 499) // 500
        got = (pdf["asset_id"] == a0["asset_id"]).sum()
        assert got == expect


class TestIvf:
    """IVF-Flat tier: deterministic k-means lists, probe-limited search."""

    def test_fit_deterministic_and_shapes(self):
        rng = np.random.Generator(np.random.PCG64(5))
        v = rng.standard_normal((200, DIM))
        c1 = ann.fit_ivf_centroids(v, 8, seed=42, n_iters=5)
        c2 = ann.fit_ivf_centroids(v, 8, seed=42, n_iters=5)
        assert c1.shape == (8, DIM)
        assert np.array_equal(c1, c2)

    def test_exhaustive_probes_equal_brute_force(self, spark):
        """n_probes == n_lists probes every list → result is exactly the
        brute-force top-k (the invariant the driver oracle relies on)."""
        vecs, _ = _cluster_vecs(seed=19, n_clusters=4, per=10)
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 6)
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ann.ivf_topk(
                df, queries, k=3, n_lists=8, n_probes=8, seed=42
            ).collect()
        }
        ids = sorted(vecs)
        m = np.stack([vecs[i] for i in ids])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        for qi in range(6):
            order = [
                j
                for j in np.argsort(
                    [(-np.round(sims[qi, j], 4), ids[j]) for j in range(len(ids))],
                    axis=0,
                    kind="stable",
                )
            ]
            # rebuild the (sim desc, id asc) order deterministically
            ranked = sorted(
                (j for j in range(len(ids)) if j != qi),
                key=lambda j: (-np.round(sims[qi, j], 4), ids[j]),
            )[:3]
            for rk, j in enumerate(ranked, start=1):
                assert got[(qi, rk)] == ids[j], (qi, rk)

    def test_planted_cluster_recall_at_low_probes(self, spark):
        """Clustered corpus at 10× lists: probing 4 of 16 lists still
        recovers same-cluster neighbours for every query — the
        data-adaptive win over hash buckets."""
        vecs, labels = _cluster_vecs(seed=23, n_clusters=10, per=16)
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 10)
        got = ann.ivf_topk(
            df, queries, k=3, n_lists=16, n_probes=4, seed=42
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        assert set(by_q) == set(range(10))
        hits = sum(
            labels[n] == labels[q] for q, ns in by_q.items() for n in ns
        )
        total = sum(len(ns) for ns in by_q.values())
        assert hits / total >= 0.95, (hits, total)

    def test_list_cap_reported_not_silent(self, spark):
        """A degenerate list over the cap is excluded from scoring AND
        surfaces in the skew report."""
        rng = np.random.Generator(np.random.PCG64(31))
        base = rng.standard_normal(DIM)
        vecs = {i: base + rng.standard_normal(DIM) * 0.01 for i in range(40)}
        df = _emb_df(spark, vecs)
        cast = F.transform("embedding", lambda x: x.cast("double"))
        sample = np.stack(
            [r["cv"] for r in df.select(cast.alias("cv")).collect()]
        )
        cents = ann.fit_ivf_centroids(sample, 4, seed=42)
        rep = ann.ivf_skew_report(df, cents, max_list=10)
        assert rep.count() > 0
        q = df.filter(F.col("vec_id") < 3)
        # k exceeds the corpus so top-k never truncates (subset-ness
        # below is about CANDIDATES, and ranking would otherwise swap
        # different neighbours into the top 3 when a list is excluded)
        capped = ann.ivf_topk(
            df, q, k=50, n_lists=4, n_probes=4, seed=42,
            max_list=10, centroids=cents,
        )
        uncapped = ann.ivf_topk(
            df, q, k=50, n_lists=4, n_probes=4, seed=42,
            max_list=10_000, centroids=cents,
        )
        got_c = {(r["query_id"], r["neighbor_id"]) for r in capped.collect()}
        got_u = {(r["query_id"], r["neighbor_id"]) for r in uncapped.collect()}
        # over-cap lists contribute nothing: capped ⊆ uncapped and the
        # exclusion is real (k-means may SPLIT the clump, so some lists
        # can legitimately stay under the cap — only over-cap ones drop)
        assert got_c <= got_u
        assert got_c != got_u


class TestIvfSampleTraining:
    """centroids=None must never collect an unbounded corpus: training
    vectors come from a deterministic hash-sample bounded by the target
    (VERDICT r4 'What's wrong #1')."""

    def test_sample_bound_and_determinism(self, spark):
        rng = np.random.Generator(np.random.PCG64(7))
        vecs = {i: rng.standard_normal(DIM) for i in range(500)}
        df = _emb_df(spark, vecs)
        s1 = ann.sample_training_vectors(df, target=60)
        s2 = ann.sample_training_vectors(df, target=60)
        # expected n/mod = 500/ceil(500/60) = ~55; Poisson noise stays
        # well under 3x the target, and never the whole corpus
        assert 0 < s1.shape[0] <= 180
        assert s1.shape == s2.shape and np.array_equal(s1, s2)

    def test_default_centroids_exhaustive_still_exact(self, spark):
        """Sampled training changes the lists, never the exhaustive-probe
        answer: n_probes == n_lists equals brute force regardless of the
        centroids (the driver-oracle invariant is sample-independent)."""
        vecs, _ = _cluster_vecs(seed=3, n_clusters=6, per=25)  # 150 vecs
        df = _emb_df(spark, vecs)
        queries = df.filter(F.col("vec_id") < 4)
        got = ann.ivf_topk(df, queries, k=3, n_lists=6, n_probes=6, seed=42)
        brute = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ann.ivf_topk(
                df, queries, k=3, n_lists=1, n_probes=1, seed=42
            ).collect()
        }
        for r in got.collect():
            assert brute[(r["query_id"], r["rank"])] == r["neighbor_id"]
