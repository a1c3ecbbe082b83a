"""Incremental (append-only) whole-conversation dedup.

A production 100-TB corpus grows daily; re-running the full pipeline
re-pays the shingle/signature UDF cost for every existing conversation
just to process the appended slice. This module maintains the batch
pipeline's checkpointed state and updates it for a batch of NEW
conversations at cost proportional to (new data + affected old convs),
with an EXACT-equality contract: the updated ``verified_pairs`` /
``clusters`` / ``deduped_turns`` equal what a full
:class:`~dedup_spark.pipeline.DedupPipeline` run over (old ∪ new) turns
would produce (asserted end-to-end in tests/test_incremental.py).

Why exactness is non-trivial — corpus document frequencies DRIFT: a new
conversation can push an old shingle's df from 1→2 (it ENTERS the
informative band: old convs containing it gain an informative shingle)
or from hi→hi+1 (it LEAVES: they lose one). Affected old conversations
must be re-signed or their candidate/verify behaviour silently diverges
from a fresh run. The update therefore:

1. shingles ONLY the new conversations (the UDF cost — proportional to
   new characters);
2. merges the durable ``(shingle, df)`` state (kept for ALL dfs
   including 1 — the slim in_band pipeline checkpoint cannot answer
   "was this df 1 or out-of-band", so incremental state keeps the real
   count) with the new occurrence counts;
3. computes the BAND-FLIPPED shingle set (df crossed the [lo, hi]
   boundary in either direction) and semi-joins the old per-conv
   shingle arrays to find the affected old conversations;
4. rebuilds informative sets + signatures for (affected ∪ new) convs
   only — unchanged convs keep their bit-identical signatures, so every
   unchanged×unchanged candidate pair and verification verdict is
   unchanged by construction;
5. regenerates candidates with the SAME three-tier band logic as the
   batch path via a ONE-SIDED band join (left side restricted to
   changed convs, tier decisions from global bucket sizes — pair volume
   ∝ changed-conv bucket membership, not Σ bucket²), re-verifies those,
   and splices them with the retained old verified edges. Candidacy is
   a GLOBAL property: a bucket the append pushes across the drop
   threshold changes outcomes for unchanged convs inside it, so every
   member of a drop-tier-crossing bucket is promoted into the changed
   set first;
6. re-runs connected components over the merged edge set (cheap —
   edges, not corpus) and re-emits survivors.

Scope: branch A (whole-conversation dedup) + emit. The substring branch
and the stats sink remain full-run features; ``df_band_mode`` must be
"manual" (auto band selection re-fits on the whole corpus by design —
an append can legitimately move the fitted band, which invalidates
every signature; that IS a full rerun), ``df_lo`` must be ≥ 2 (batch
parity), and ``candidate_source`` must be "banding" (the prefix path
would need its own changed-pair restriction). All state reads are
fingerprint-gated like batch stage resume.

No reference analog — the reference is a one-shot CLI
(/root/reference/dedup/dedup.py:648-677); this is part of the
beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from dedup_spark.catalog import StageCatalog
from dedup_spark.config import DedupConfig
from dedup_spark.operators import lsh, shingling, verify
from dedup_spark.operators.connected_components import connected_components
from dedup_spark.operators.transcripts import assemble_transcripts
from dedup_spark.pipeline import DedupPipeline
from dedup_spark.util import eager_ckpt

#: durable state tables (StageCatalog names) the incremental path owns
STATE_DF = "shingle_df_state"
STATE_TURNS = "turns_state"


@dataclass
class IncrementalResult:
    verified_pairs: DataFrame
    clusters: DataFrame
    deduped_turns: DataFrame
    skew_report: DataFrame
    n_new_convs: int
    n_affected_old: int
    n_resigned: int


def _require_supported_config(cfg: DedupConfig) -> None:
    if cfg.df_band_mode != "manual" or cfg.auto_df_band:
        raise ValueError(
            "incremental dedup requires df_band_mode='manual': auto band "
            "selection re-fits on the whole corpus, so an append can move "
            "the band and invalidate every signature — that is a full rerun"
        )
    if cfg.df_lo < 2:
        raise ValueError(
            "incremental dedup requires df_lo >= 2: the batch path "
            "pre-filters df >= 2 before band membership, and with df_lo=1 "
            "a 1→2 df move is invisible to band-flip detection (both sides "
            "in band) while changing the fresh-run informative sets"
        )
    if cfg.candidate_source != "banding":
        raise ValueError(
            "incremental dedup currently supports candidate_source="
            "'banding' only: the prefix-filter path would need its own "
            "changed-pair restriction to keep the exact-equality contract "
            "— run the full pipeline for prefix-configured dedup"
        )


class IncrementalDedup:
    """Stateful incremental wrapper around the batch pipeline.

    ``bootstrap(turns)`` runs the full pipeline once and derives the
    durable df state; each subsequent ``append(new_turns)`` folds a
    batch of NEW conversations in. State lives in the same warehouse /
    StageCatalog as the batch stages (same fingerprint gating)."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig, warehouse: str):
        _require_supported_config(cfg)
        self.spark = spark
        self.cfg = cfg
        self.pipeline = DedupPipeline(spark, cfg, warehouse)
        self.cat: StageCatalog = self.pipeline.catalog

    def _read_state(self, name: str) -> DataFrame:
        """Fingerprint-GATED state read: a bare cat.read would silently
        accept tables written under a different config (e.g. another
        shingle_k), merging incompatible hash spaces — exists() checks
        the sidecar fingerprint the way batch stage resume does."""
        if not self.cat.exists(name):
            raise RuntimeError(
                f"incremental state table '{name}' is missing or was "
                "written under a different config fingerprint — bootstrap "
                "this warehouse with the current config first"
            )
        return self.cat.read(name)

    # ------------------------------------------------------------ bootstrap

    def bootstrap(self, turns: DataFrame):
        """Full batch run + derive the incremental state tables."""
        res = self.pipeline.run(turns)
        cat = self.cat
        sets_df = cat.read("shingle_sets")
        cat.write(
            STATE_DF,
            shingling.shingle_document_frequency(
                shingling.exploded_shingles(sets_df)
            ),
        )
        cat.write(STATE_TURNS, turns)
        return res

    # --------------------------------------------------------------- append

    def append(self, new_turns: DataFrame) -> IncrementalResult:
        cfg, cat, spark = self.cfg, self.cat, self.spark
        lo, hi = cfg.df_lo, cfg.df_hi

        old_sets = self._read_state("shingle_sets")
        old_sigs = self._read_state("signatures")
        old_verified = self._read_state("verified_pairs")
        old_turns = self._read_state(STATE_TURNS)
        df_state = self._read_state(STATE_DF)

        # loud guard: append-only contract (an edited conversation would
        # need its OLD occurrences subtracted from the df state, which
        # this path does not do)
        t_new = eager_ckpt(assemble_transcripts(new_turns))
        overlap = (
            t_new.select("conv_id")
            .join(old_sets.select("conv_id"), "conv_id", "left_semi")
            .count()
        )
        if overlap:
            raise ValueError(
                f"{overlap} conv_ids in the append batch already exist in "
                "state — incremental dedup is append-only (re-run the full "
                "pipeline for edits/deletes)"
            )

        # 1. UDF cost proportional to NEW characters only
        sets_new = eager_ckpt(shingling.shingle_sets(t_new, cfg))
        df_new = shingling.shingle_document_frequency(
            shingling.exploded_shingles(sets_new)
        )

        # 2. exact df merge (full outer: brand-new shingles enter at
        # their new count, untouched old shingles keep theirs)
        merged_df = eager_ckpt(
            df_state.withColumnRenamed("df", "df_old")
            .join(
                df_new.withColumnRenamed("df", "df_add"), "shingle", "full_outer"
            )
            .select(
                "shingle",
                (
                    F.coalesce("df_old", F.lit(0)) + F.coalesce("df_add", F.lit(0))
                ).alias("df"),
                F.coalesce("df_old", F.lit(0)).alias("df_old"),
            )
        )

        # 3. band flips → affected OLD conversations. A shingle flips
        # when its [lo, hi] membership changes; only shingles the append
        # actually touched can flip (df_add > 0 ⇔ df != df_old).
        in_band = lambda c: F.col(c).between(F.lit(lo), F.lit(hi))
        flipped = merged_df.filter(
            (F.col("df") != F.col("df_old"))
            & (in_band("df") != in_band("df_old"))
        ).select("shingle")
        affected_old = eager_ckpt(
            shingling.exploded_shingles(old_sets)
            .join(flipped, "shingle", "left_semi")
            .select("conv_id")
            .dropDuplicates()
        )
        n_affected = affected_old.count()

        # 4. re-sign (affected ∪ new): informative set = the conv's
        # distinct shingles whose MERGED df is in band, sorted — the
        # SAME construction as the batch path (shared helper)
        resign_sets = old_sets.join(affected_old, "conv_id", "left_semi").select(
            "conv_id", "shingles"
        ).unionByName(sets_new.select("conv_id", "shingles"))
        resign_informative = shingling.informative_shingle_sets(
            resign_sets.select("conv_id", F.explode("shingles").alias("shingle")),
            merged_df.select("shingle", "df"),
            lo,
            hi,
        )
        resigned = eager_ckpt(lsh.compute_signatures(resign_informative, cfg))
        n_resigned = resigned.count()

        sigs_all = eager_ckpt(
            old_sigs.join(affected_old, "conv_id", "left_anti").unionByName(
                resigned.select(*old_sigs.columns)
            )
        )

        # 5. candidates. Correctness subtlety: candidacy is a function
        # of GLOBAL bucket size, not just the two signatures — a bucket
        # the append pushes across the drop threshold
        # (max_salted_bucket) changes the candidate set of UNCHANGED
        # conv pairs inside it (a fresh run drops/salvages them
        # differently). So "changed" convs = (df-flip affected ∪ new) ∪
        # every member of a bucket whose DROP-tier membership differs
        # between the old and the spliced signatures. Plain↔salted
        # crossings produce identical pair sets (salting loses nothing),
        # and 1↔2-size crossings only involve changed members, so the
        # drop boundary is the only one that matters.
        bands_old = lsh.explode_bands(old_sigs)
        sizes_old = lsh.band_bucket_sizes(bands_old)
        bands_all = lsh.explode_bands(sigs_all)
        sizes_all = eager_ckpt(lsh.band_bucket_sizes(bands_all))
        drop = cfg.max_salted_bucket
        tier_changed_buckets = (
            sizes_old.withColumnRenamed("bucket_size", "sz_old")
            .join(
                sizes_all.withColumnRenamed("bucket_size", "sz_new"),
                ["band_id", "band_hash"],
                "full_outer",
            )
            .filter(
                (F.coalesce("sz_old", F.lit(0)) > drop)
                != (F.coalesce("sz_new", F.lit(0)) > drop)
            )
            .select("band_id", "band_hash")
        )
        tier_changed_convs = (
            bands_old.unionByName(bands_all)
            .join(tier_changed_buckets, ["band_id", "band_hash"], "left_semi")
            .select("conv_id")
            .dropDuplicates()
        )
        changed = eager_ckpt(
            affected_old.unionByName(t_new.select("conv_id"))
            .unionByName(tier_changed_convs)
            .dropDuplicates()
        )
        # one-sided three-tier join: volume ∝ changed convs' bucket
        # membership, tier decisions from the GLOBAL sizes — exactly the
        # changed-touching subset of a fresh run's candidate set
        cand_changed = lsh.candidate_pairs(
            bands_all, sizes_all, cfg, left_convs=changed
        )

        verified_new = verify.verify_pairs(cand_changed, sigs_all, cfg)
        kept_old = old_verified.join(
            changed.select(F.col("conv_id").alias("conv_a")), "conv_a", "left_anti"
        ).join(
            changed.select(F.col("conv_id").alias("conv_b")), "conv_b", "left_anti"
        )
        verified_all = eager_ckpt(
            kept_old.unionByName(verified_new).dropDuplicates(
                ["conv_a", "conv_b"]
            )
        )
        # dropped-bucket observability for THIS append ("dropped, never
        # silently" policy): freshened below after the stale-stage sweep
        skew = eager_ckpt(lsh.skew_report(sizes_all, cfg))

        # 6. clusters + emit over the merged corpus
        turns_all = old_turns.unionByName(new_turns)
        nodes = old_sets.select("conv_id").unionByName(
            t_new.select("conv_id")
        ).dropDuplicates()
        clusters = eager_ckpt(
            connected_components(
                nodes, verified_all.select("conv_a", "conv_b"), cfg.cc_max_iters
            )
        )
        # MATERIALIZE everything that still references a state path
        # before the folds below replace those files: the parquet-backed
        # lazy plans (old_sets / old_turns unions, the emit anti-join)
        # would otherwise read deleted files on a later action.
        # (Production refinement: the Iceberg backend appends snapshots
        # instead of rewriting state wholesale.)
        deduped = eager_ckpt(DedupPipeline._emit(turns_all, clusters))
        new_sets_state = eager_ckpt(old_sets.unionByName(sets_new))
        new_turns_state = eager_ckpt(turns_all)
        df_state_out = eager_ckpt(merged_df.select("shingle", "df"))

        # fold the new state in (durable: next append sees it).
        # invalidate first: cat.stage's live-checkpoint map must not
        # serve a stale pre-append DataFrame for a rewritten stage.
        for name, df_out in (
            ("shingle_sets", new_sets_state),
            ("signatures", sigs_all),
            ("verified_pairs", verified_all),
            (STATE_DF, df_state_out),
            (STATE_TURNS, new_turns_state),
            ("clusters", clusters),
        ):
            cat.invalidate(name)
            cat.write(name, df_out)
        # Batch stages NOT folded above are now stale w.r.t. the merged
        # corpus; the config fingerprint cannot see data drift, so a
        # later batch run on this warehouse would silently resume them
        # against the folded tables. Invalidate them: a subsequent
        # DedupPipeline.run(old ∪ new) recomputes exactly those (and
        # cheaply REUSES the folded sets/signatures/verified/clusters,
        # which are already full-corpus-correct — regression-tested in
        # tests/test_incremental.py).
        for stale in (
            "transcripts", "shingle_ann", "informative_sets",
            "bucket_sizes", "skew_report", "candidate_pairs",
            "deduped_turns", "stats", "key_occ_repeated", "anchor_skew",
            "substring_chains", "position_classes", "substring_spans",
            "interval_marks", "trimmed_turns",
        ):
            cat.invalidate(stale)
        # fresh dropped-bucket report for the spliced corpus (never
        # silent: the stale bootstrap-era report was just invalidated)
        cat.write("skew_report", skew)

        return IncrementalResult(
            verified_pairs=verified_all,
            clusters=clusters,
            deduped_turns=deduped,
            skew_report=skew,
            n_new_convs=t_new.count(),
            n_affected_old=n_affected,
            n_resigned=n_resigned,
        )
