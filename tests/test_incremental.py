"""Incremental dedup (appends, deletes, edits): exact equality with a
full recompute.

The contract under test (dedup_spark/incremental.py): bootstrap on a
corpus slice + apply(delta) must produce IDENTICAL verified_pairs,
cluster assignments, and surviving turns to a fresh DedupPipeline run
over the post-change corpus — including the df-drift cases (a delta
pushing an old shingle into or out of the informative band forces old
conversations to re-sign), drop-tier bucket crossings in both
directions, segmented-state chaining/compaction, and torn-fold refusal.
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
    run: every batch stage was invalidated at the fold (data drift is
    invisible to the config fingerprint, and state now lives in
    incremental-owned segments), so the batch run recomputes from its
    own inputs and must equal a fresh full run."""

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


def _turns_df(spark, convs: dict):
    rows = [
        (cid, i, "user", txt, None)
        for cid, ts in convs.items()
        for i, txt in enumerate(ts)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


class TestPrefixIncremental:
    """candidate_source='prefix' incremental (VERDICT r4 next-round #2):
    two chained appends under the exact prefix filter must equal one
    full prefix-configured recompute — including a small⊂large planted
    pair (tiny Jaccard) that banding provably tends to miss."""

    CFG = DedupConfig(candidate_source="prefix", use_simhash_filter=False)

    def test_two_appends_equal_full_prefix(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=90))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        s1 = set(convs[: len(convs) // 2])
        s2 = set(convs[len(convs) // 2 : 3 * len(convs) // 4])
        t1 = all_turns.filter(F.col("conv_id").isin(list(s1)))
        t2 = all_turns.filter(F.col("conv_id").isin(list(s2)))
        t3 = all_turns.filter(~F.col("conv_id").isin(list(s1 | s2)))

        full = DedupPipeline(
            spark, self.CFG, str(tmp_path_factory.mktemp("wh_pf"))
        ).run(all_turns)
        inc = IncrementalDedup(
            spark, self.CFG, str(tmp_path_factory.mktemp("wh_pi"))
        )
        inc.bootstrap(t1)
        inc.append(t2)
        res = inc.append(t3)

        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)
        assert _turn_keys(res.deduped_turns) == _turn_keys(full.deduped_turns)

    def test_small_in_large_pair_found_across_boundary(
        self, spark, tmp_path_factory
    ):
        """The appended SMALL doc is contained in an OLD large doc: the
        asymmetric-containment case the prefix family exists for — and
        the new doc is smaller than every bootstrap doc, exercising the
        effective-min-stratum probe extension."""
        rng = np.random.Generator(np.random.PCG64(77))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        core = seg(80)
        big = core + seg(2000)
        old = {
            "big0": [big, seg(120)],
            "big1": [big[: len(big) // 2], seg(500)],  # shares shingles: df>=2
            **{f"fill{i}": [seg(400)] for i in range(4)},
        }
        new = {"tiny": [core]}  # contained in big0/big1's shared prefix
        full = DedupPipeline(
            spark, self.CFG, str(tmp_path_factory.mktemp("wh_sf"))
        ).run(_turns_df(spark, {**old, **new}))
        inc = IncrementalDedup(
            spark, self.CFG, str(tmp_path_factory.mktemp("wh_si"))
        )
        inc.bootstrap(_turns_df(spark, old))
        res = inc.append(_turns_df(spark, new))
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert any("tiny" in p for p in _pairs(res.verified_pairs))
        assert _clusters(res.clusters) == _clusters(full.clusters)


class TestRemoveAndEdit:
    """Deletes/edits (VERDICT r4 next-round #5): removal folds must equal
    a fresh run on (corpus − removed), including removals that flip a
    shingle's df across the band boundary in BOTH directions."""

    def test_remove_equals_fresh_run(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=100))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        gone = set(convs[::5])
        kept = all_turns.filter(~F.col("conv_id").isin(list(gone)))

        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_rm"))
        )
        inc.bootstrap(all_turns)
        res = inc.remove(sorted(gone))
        fresh = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_rf"))
        ).run(kept)

        assert res.n_removed_convs == len(gone)
        assert _pairs(res.verified_pairs) == _pairs(fresh.verified_pairs)
        assert _clusters(res.clusters) == _clusters(fresh.clusters)
        assert _turn_keys(res.deduped_turns) == _turn_keys(fresh.deduped_turns)

    def test_removal_df_flips_both_directions(self, spark, tmp_path_factory):
        """Removing convs pushes one shared shingle family 5→4 (ENTERS
        the [2,4] band: the remaining quad becomes verifiable) and
        another 2→1 (LEAVES: its pair loses the informative overlap)."""
        rng = np.random.Generator(np.random.PCG64(91))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        sA, sC = seg(300), seg(300)
        corpus = {
            **{f"q{i}": [sA, seg(60)] for i in range(5)},  # df(sA)=5 (out)
            "p0": [sC, seg(60)],
            "p1": [sC, seg(70)],                            # df(sC)=2 (in)
            "lone": [seg(80)],
        }
        removed = ["q4", "p1"]  # sA→4 enters band; sC→1 leaves band
        kept = {k: v for k, v in corpus.items() if k not in removed}

        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_rb"))
        )
        inc.bootstrap(_turns_df(spark, corpus))
        res = inc.remove(removed)
        fresh = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_rb_f"))
        ).run(_turns_df(spark, kept))

        assert res.n_affected_old >= 5  # q0-q3 re-signed + p0
        got = _pairs(res.verified_pairs)
        assert got == _pairs(fresh.verified_pairs)
        assert ("q0", "q1") in got        # entering flip created the family
        assert not any("p0" in p for p in got)  # leaving flip dissolved it
        assert _clusters(res.clusters) == _clusters(fresh.clusters)

    def test_edit_equals_fresh_run(self, spark, tmp_path_factory):
        """An edit = remove + re-add of the same conv_id in one apply."""
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=60))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        victim = convs[7]
        # same turn structure/schema, rewritten text — a realistic edit
        edited = all_turns.filter(F.col("conv_id") == victim).withColumn(
            "text", F.concat(F.lit("entirely new text. "), F.col("text"))
        )
        post = all_turns.filter(F.col("conv_id") != victim).unionByName(edited)

        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_ed"))
        )
        inc.bootstrap(all_turns)
        res = inc.apply(new_turns=edited, remove_conv_ids=[victim])
        fresh = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_ed_f"))
        ).run(post)

        assert _pairs(res.verified_pairs) == _pairs(fresh.verified_pairs)
        assert _clusters(res.clusters) == _clusters(fresh.clusters)
        assert _turn_keys(res.deduped_turns) == _turn_keys(fresh.deduped_turns)

    def test_remove_unknown_conv_rejected(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=20))
        inc = IncrementalDedup(
            spark, DedupConfig(), str(tmp_path_factory.mktemp("wh_ru"))
        )
        inc.bootstrap(spark.createDataFrame(turns_pdf))
        with pytest.raises(ValueError, match="do not exist"):
            inc.remove(["no_such_conv"])


class TestFoldAtomicity:
    """ADVICE r4 (medium): a crash mid-fold must leave a LOUDLY-refused
    warehouse, never a silently-torn one — wholesale state sidecars
    carry the fold epoch and the manifest (committed last, atomically)
    is the single commit point."""

    def test_crash_between_rewrites_detected(self, spark, tmp_path_factory):
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=40))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        new_ids = set(convs[::4])
        old = all_turns.filter(~F.col("conv_id").isin(list(new_ids)))
        new = all_turns.filter(F.col("conv_id").isin(list(new_ids)))

        inc = IncrementalDedup(
            spark, DedupConfig(), str(tmp_path_factory.mktemp("wh_tear"))
        )
        inc.bootstrap(old)

        real_write = inc.cat.write

        def crashing_write(name, df, meta=None):
            if name == "inc_clusters":
                raise RuntimeError("simulated crash mid-fold")
            return real_write(name, df, meta=meta)

        inc.cat.write = crashing_write
        with pytest.raises(RuntimeError, match="simulated crash"):
            inc.append(new)
        inc.cat.write = real_write

        # inc_verified was rewritten at epoch 1, manifest still says 0 —
        # any further state read must refuse loudly
        with pytest.raises(RuntimeError, match="torn"):
            inc.append(new)

    def test_orphan_segments_from_crash_are_harmless(
        self, spark, tmp_path_factory
    ):
        """A crash BEFORE the wholesale rewrites leaves only orphan
        segments the manifest never lists: the retried apply overwrites
        them and the chain still equals a full recompute."""
        turns_pdf, _, _ = generate_corpus(CorpusSpec(n_convs=40))
        all_turns = spark.createDataFrame(turns_pdf).cache()
        convs = sorted({r.conv_id for r in all_turns.select("conv_id").collect()})
        new_ids = set(convs[::4])
        old = all_turns.filter(~F.col("conv_id").isin(list(new_ids)))
        new = all_turns.filter(F.col("conv_id").isin(list(new_ids)))

        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_orph"))
        )
        inc.bootstrap(old)

        real_write = inc.cat.write

        def crashing_write(name, df, meta=None):
            if name == "inc_retired_sets":  # first wholesale rewrite
                raise RuntimeError("simulated crash pre-wholesale")
            return real_write(name, df, meta=meta)

        inc.cat.write = crashing_write
        with pytest.raises(RuntimeError, match="simulated crash"):
            inc.append(new)
        inc.cat.write = real_write

        res = inc.append(new)  # clean retry succeeds
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_orph_f"))
        ).run(all_turns)
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)


class TestCompaction:
    """Segment compaction is exactness-neutral and bounds state reads."""

    def test_compaction_mid_chain_equality(self, spark, tmp_path_factory):
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
            spark, cfg, str(tmp_path_factory.mktemp("wh_cf"))
        ).run(all_turns)
        # auto_compact_segments=1 → compaction runs after EVERY apply
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_ci")),
            auto_compact_segments=1,
        )
        inc.bootstrap(t1)
        inc.append(t2)
        res = inc.append(t3)

        # compaction collapsed each table to one segment
        man = inc._read_manifest()
        assert all(len(v) == 1 for v in man["segments"].values())
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)
        assert _turn_keys(res.deduped_turns) == _turn_keys(full.deduped_turns)


class TestDeltaProportionalReport:
    """The run report must expose non-UDF stage input sizes so a user
    can SEE that apply cost tracks (new ∪ affected), not the corpus."""

    def test_report_fields_delta_sized(self, spark, tmp_path_factory):
        # low-overlap fixture: unique random text per conv, so the
        # append's df drift is confined to its own (df=1) shingles and
        # NO old conv is affected — the pure-delta regime. (The shared-
        # vocabulary synthetic corpus is the documented worst case where
        # df drift legitimately re-signs the whole corpus.)
        rng = np.random.Generator(np.random.PCG64(17))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        old = _turns_df(spark, {f"o{i}": [seg(300)] for i in range(50)})
        new = _turns_df(spark, {f"n{i}": [seg(300)] for i in range(3)})

        inc = IncrementalDedup(
            spark, DedupConfig(), str(tmp_path_factory.mktemp("wh_rep"))
        )
        inc.bootstrap(old)
        res = inc.append(new)
        rpt = res.report
        for k in ("n_touched_shingles", "n_flipped_shingles",
                  "n_affected_old", "n_resigned", "n_changed_convs",
                  "n_touched_buckets", "n_changed_buckets",
                  "n_candidate_pairs"):
            assert k in rpt, k
        # delta-proportionality on a low-overlap corpus: nothing old is
        # touched, the changed set IS the appended batch
        assert rpt["n_affected_old"] == 0
        assert rpt["n_flipped_shingles"] == 0
        assert rpt["n_changed_convs"] <= 3
        assert rpt["n_resigned"] <= rpt["n_affected_old"] + rpt["n_new_convs"]

    def test_chained_apply_after_skipped_segments(self, spark, tmp_path_factory):
        """An append that signs nothing (all-unique text) skips the
        sigs/bands/sizes segment writes; the NEXT apply must resolve
        state correctly and still equal a full recompute."""
        rng = np.random.Generator(np.random.PCG64(23))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        old = {f"o{i}": [seg(300)] for i in range(20)}
        a1 = {f"p{i}": [seg(300)] for i in range(2)}       # signs nothing
        dup_src = old["o3"][0]
        a2 = {"q0": [dup_src], "q1": [seg(300)]}           # q0 dups o3

        cfg = DedupConfig()
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_skip"))
        )
        inc.bootstrap(_turns_df(spark, old))
        r1 = inc.append(_turns_df(spark, a1))
        assert r1.n_resigned == 0  # the skipped-segment epoch
        res = inc.append(_turns_df(spark, a2))
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_skip_f"))
        ).run(_turns_df(spark, {**old, **a1, **a2}))
        assert ("o3", "q0") in _pairs(res.verified_pairs)
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)


class TestFullDfProbeRegime:
    """The corpus-drift df-probe branch (df_probe_regime='full', the
    auto choice when most of the corpus re-signs) must be exactly equal
    to the restricted branch — same fixture as TestDfDriftResign."""

    def test_full_probe_equality(self, spark, tmp_path_factory):
        rng = np.random.Generator(np.random.PCG64(55))

        def seg(n):
            return "".join(chr(97 + c) for c in rng.integers(0, 26, size=n))

        sA, sC = seg(300), seg(300)
        old = {
            **{f"q{i}": [sA, seg(60)] for i in range(4)},
            "lone": [sC, seg(80)],
        }
        new = {"zq_new": [sA, seg(65)], "zc_new": [sC, seg(75)]}
        cfg = DedupConfig()
        full = DedupPipeline(
            spark, cfg, str(tmp_path_factory.mktemp("wh_fp_f"))
        ).run(_turns_df(spark, {**old, **new}))
        inc = IncrementalDedup(
            spark, cfg, str(tmp_path_factory.mktemp("wh_fp_i"))
        )
        inc.df_probe_regime = "full"
        inc.bootstrap(_turns_df(spark, old))
        res = inc.append(_turns_df(spark, new))
        assert _pairs(res.verified_pairs) == _pairs(full.verified_pairs)
        assert _clusters(res.clusters) == _clusters(full.clusters)
        assert ("lone", "zc_new") in _pairs(res.verified_pairs)
