"""Incremental append-only dedup: exact equality with a full recompute.

The contract under test (dedup_spark/incremental.py): bootstrap on an
old corpus slice + append(new slice) must produce IDENTICAL
verified_pairs, cluster assignments, and surviving turns to a fresh
DedupPipeline run over the whole corpus — including the df-drift cases
(a new conv pushing an old shingle into or out of the informative band
forces old conversations to re-sign).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.corpus import CorpusSpec, generate_corpus
from dedup_spark.incremental import IncrementalDedup
from dedup_spark.pipeline import DedupPipeline


def _pairs(df):
    return {(r.conv_a, r.conv_b) for r in df.select("conv_a", "conv_b").collect()}


def _clusters(df):
    return {r.conv_id: r.cluster_id for r in df.collect()}


def _turn_keys(df):
    return {(r.conv_id, r.turn_idx) for r in df.select("conv_id", "turn_idx").collect()}


class TestIncrementalEqualsFull:
    @pytest.fixture(scope="class")
    def split_corpus(self, spark):
        """Planted-duplicate corpus split so dup families straddle the
        old/new boundary (the interesting incremental case)."""
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=120))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        # deterministic interleaved split: every 4th conv arrives "late",
        # so near-dup families span the boundary
        new_ids = set(convs[::4])
        old = all_turns.filter(~F.col("conv_id").isin(list(new_ids)))
        new = all_turns.filter(F.col("conv_id").isin(list(new_ids)))
        return all_turns, old, new

    @pytest.fixture(scope="class")
    def results(self, spark, split_corpus, tmp_path_factory):
        all_turns, old, new = split_corpus
        cfg = DedupConfig()
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_full"))
        ).run(all_turns)
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_inc"))
        )
        inc.bootstrap(old)
        res = inc.append(new)
        return full, res

    def test_verified_pairs_identical(self, results):
        full, res = results
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)

    def test_clusters_identical(self, results):
        full, res = results
        assert _clusters(res.clusters) == _clusters(full.clusters)

    def test_survivors_identical(self, results):
        full, res = results
        assert _turn_keys(res.deduped_turns) == _turn_keys(full.deduped_turns)

    def test_append_only_guard(self, spark, split_corpus, tmp_path_factory):
        _, old, _ = split_corpus
        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_guard"))
        )
        inc.bootstrap(old)
        with pytest.raises(ValueError, match="append-only"):
            inc.append(old.limit(5))

    def test_requires_manual_band(self, spark, tmp_path_factory):
        with pytest.raises(ValueError, match="manual"):
            IncrementalDedup(
                spark,
                DedupConfig(df_band_mode="tail"),
                str(tmp_path_factory.mktemp("wh_band")),
            )


class TestDfDriftResign:
    """Hand-built fixture forcing BOTH flip directions: the append takes
    one shingle family from df=1→2 (enters the band: two old convs that
    previously shared nothing verifiable become a dup pair via... ) and
    another from df=4→5 (leaves the band: the old quad family loses its
    informative overlap). Equality with a fresh run proves the affected
    old conversations really re-signed."""

    def _turns(self, spark, convs: dict[str, list[str]]):
        rows = [
            (cid, i, "user", txt, None)
            for cid, ts in convs.items()
            for i, txt in enumerate(ts)
        ]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string"
        )

    def test_flips_force_resign_and_equality(self, spark, tmp_path_factory):
        rng = np.random.Generator(np.random.PCG64(55))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        sA, sB, sC = seg(300), seg(300), seg(300)
        old = {
            # quad family at df=4 (in band) sharing sA
            **{f"q{i}": [sA, seg(60)] for i in range(4)},
            # pair sharing sB (df=2, in band)
            "p0": [sB, seg(60)],
            "p1": [sB, seg(70)],
            # lone conv holding sC at df=1 (below band)
            "lone": [sC, seg(80)],
        }
        # the append pushes sA to df=5 (LEAVES band) and sC to df=2
        # (ENTERS band, making lone↔fresh a verifiable pair)
        new = {
            "zq_new": [sA, seg(65)],
            "zc_new": [sC, seg(75)],
        }
        old_t = self._turns(spark, old)
        new_t = self._turns(spark, new)
        all_t = old_t.unionByName(new_t)

        cfg = DedupConfig()
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_f2"))
        ).run(all_t)
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_i2"))
        )
        inc.bootstrap(old_t)
        res = inc.append(new_t)

        # both flip directions touched old convs → they re-signed
        assert res.n_affected_old >= 5  # 4×quad + lone (p0/p1 untouched)
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)
        # the entering flip creates the lone↔zc_new pair in BOTH paths
        assert ("lone", "zc_new") in _pairs(res.verified_pairs)


class TestChainedAppends:
    """Two consecutive appends exercise the state-folding path (the
    second append reads the rewritten state tables): the chain must
    still equal one full recompute."""

    def test_two_appends_equal_full(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=90))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        s1 = set(convs[: len(convs) // 2])
        s2 = set(convs[len(convs) // 2 : 3 * len(convs) // 4])
        t1 = all_turns.filter(F.col("conv_id").isin(list(s1)))
        t2 = all_turns.filter(F.col("conv_id").isin(list(s2)))
        t3 = all_turns.filter(~F.col("conv_id").isin(list(s1 | s2)))

        cfg = DedupConfig()
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_fc"))
        ).run(all_turns)
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_ic"))
        )
        inc.bootstrap(t1)
        inc.append(t2)
        res = inc.append(t3)

        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)
        assert _turn_keys(res.deduped_turns) == _turn_keys(full.deduped_turns)


class TestPostAppendBatchRun:
    """After append() the warehouse must be SAFE for a subsequent batch
    run: folded tables (sets/signatures/verified/clusters) are
    full-corpus-correct and get reused; un-folded batch stages were
    invalidated (data drift is invisible to the config fingerprint) and
    recompute. The combined run must equal a fresh full run."""

    def test_batch_run_on_appended_warehouse(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=80))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        new_ids = set(convs[::5])
        old = all_turns.filter(~F.col("conv_id").isin(list(new_ids)))
        new = all_turns.filter(F.col("conv_id").isin(list(new_ids)))

        cfg = DedupConfig()
        wh = str(tmp_path_factory.mktemp("wh_pab"))
        inc = IncrementalDedup(spark, cfg, wh)
        inc.bootstrap(old)
        inc.append(new)

        # batch run on the SAME warehouse over the merged corpus
        mixed = DedupPipeline(spark, cfg, wh).run(all_turns)
        fresh = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_fresh"))
        ).run(all_turns)

        assert _pairs(mixed.verified_pairs) == _pairs(fresh.verified_pairs)
        assert _clusters(mixed.clusters) == _clusters(fresh.clusters)
        assert _turn_keys(mixed.deduped_turns) == _turn_keys(fresh.deduped_turns)
        # substring branch (recomputed from invalidated stages) agrees too
        assert _pairs(mixed.substring_spans) == _pairs(fresh.substring_spans)


class TestReviewHardening:
    """Guards + the bucket-tier-crossing exactness case surfaced by code
    review: candidacy is a function of GLOBAL bucket size, so a bucket
    the append pushes across the drop threshold must re-evaluate the
    unchanged convs inside it."""

    def test_prefix_source_rejected(self, spark, tmp_path_factory):
        with pytest.raises(ValueError, match="banding"):
            IncrementalDedup(
                spark,
                DedupConfig(candidate_source="prefix", use_simhash_filter=False),
                str(tmp_path_factory.mktemp("wh_pref")),
            )

    def test_df_lo_1_rejected(self, spark, tmp_path_factory):
        with pytest.raises(ValueError, match="df_lo"):
            IncrementalDedup(
                spark,
                DedupConfig(df_lo=1),
                str(tmp_path_factory.mktemp("wh_lo")),
            )

    def test_stale_fingerprint_state_rejected(self, spark, tmp_path_factory):
        """State written under one config must not silently feed an
        append under another (different shingle_k = different hash
        space)."""
        wh = str(tmp_path_factory.mktemp("wh_fp"))
        turns = spark.createDataFrame(
            [("c", 0, "user", "x" * 40, None), ("d", 0, "user", "y" * 40, None)],
            "conv_id string, turn_idx int, role string, text string, tool string",
        )
        IncrementalDedup(spark, DedupConfig(shingle_k=17), wh).bootstrap(turns)
        other = IncrementalDedup(spark, DedupConfig(shingle_k=13), wh)
        new = spark.createDataFrame(
            [("e", 0, "user", "z" * 40, None)],
            "conv_id string, turn_idx int, role string, text string, tool string",
        )
        with pytest.raises(RuntimeError, match="fingerprint"):
            other.append(new)

    def test_drop_tier_crossing_reevaluates_unchanged_pairs(
        self, spark, tmp_path_factory
    ):
        """3 identical old convs share every band bucket (size 3 = the
        salted tier → all 3 pairs verified at bootstrap). Appending a
        4th identical conv pushes every bucket over max_salted_bucket=3
        WITHOUT any df flip (3→4 stays inside the [2,4] band) — a fresh
        run drops the buckets and verifies nothing, and the incremental
        path must agree (the old pairs may NOT survive via kept_old)."""

        def turns_df(convs):
            rows = [
                (cid, i, "user", txt, None)
                for cid, ts in convs.items()
                for i, txt in enumerate(ts)
            ]
            return spark.createDataFrame(
                rows,
                "conv_id string, turn_idx int, role string, text string, tool string",
            )

        doc = "the quick brown fox jumps over the lazy dog " * 4
        old = {f"c{i}": [doc] for i in range(3)}
        new = {"c3": [doc]}
        cfg = DedupConfig(max_band_bucket=2, max_salted_bucket=3)

        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_tc_f"))
        ).run(turns_df({**old, **new}))
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_tc_i"))
        )
        boot = inc.bootstrap(turns_df(old))
        assert _pairs(boot.verified_pairs) == {
            ("c0", "c1"), ("c0", "c2"), ("c1", "c2")
        }
        res = inc.append(turns_df(new))

        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs) == set()
        assert _clusters(res.clusters) == _clusters(full.clusters)
        # the drop is REPORTED, never silent
        assert res.skew_report.count() > 0
