"""Driver JVM option composition (ADVICE r4): appending the default GC
selection after a caller-supplied collector flag makes the JVM refuse
to start ('Multiple garbage collectors selected')."""

from dedup_spark.session import compose_driver_jvm_opts


def test_no_user_opts_gets_default_gc():
    assert compose_driver_jvm_opts(None, "-XX:+UseParallelGC") == "-XX:+UseParallelGC"
    assert compose_driver_jvm_opts("", "-XX:+UseParallelGC") == "-XX:+UseParallelGC"


def test_non_gc_user_opts_compose():
    got = compose_driver_jvm_opts("-Xss16m -XX:MaxGCPauseMillis=200", "-XX:+UseParallelGC")
    assert got == "-Xss16m -XX:MaxGCPauseMillis=200 -XX:+UseParallelGC"


def test_user_gc_selection_wins_unchallenged():
    for user in ("-XX:+UseG1GC", "-Xss16m -XX:+UseZGC -verbose:gc",
                 "-XX:+UseConcMarkSweepGC", "-XX:+UseShenandoahGC"):
        got = compose_driver_jvm_opts(user, "-XX:+UseParallelGC")
        assert got == user
        assert got.count("-XX:+Use") == user.count("-XX:+Use")
