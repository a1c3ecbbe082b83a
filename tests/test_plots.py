"""Plot-data exports (S9 analog): aggregates computed Spark-side,
CSV written; PNG only when matplotlib exists (not in this sandbox)."""

import os

from dedup_spark import plots


def test_export_df_spectrum(spark, tmp_path):
    sdf = spark.createDataFrame(
        [("s1", 1), ("s2", 1), ("s3", 2), ("s4", 2), ("s5", 5)],
        "shingle string, df int",
    )
    hist = plots.export_df_spectrum(sdf, str(tmp_path))
    assert os.path.isfile(tmp_path / "df_spectrum.csv")
    got = {int(r.df): int(r.n_shingles) for _, r in hist.iterrows()}
    assert got == {1: 2, 2: 2, 5: 1}


def test_export_dnd_profile(spark, tmp_path):
    poscls = spark.createDataFrame(
        [("c", p, 1 if p <= 100 else -1) for p in range(1, 201)],
        "conv_id string, pos int, cls int",
    )
    prof = plots.export_dnd_profile(poscls, str(tmp_path), window=100)
    assert os.path.isfile(tmp_path / "dnd_profile.csv")
    by_win = {int(r.win_id): r.mean_dnd for _, r in prof.iterrows()}
    assert by_win[0] == 1.0 and by_win[1] == -1.0
