"""vocab_drift_report unit semantics: the no-drift fixed point, the
fully-disjoint extreme, and threshold flag behavior (the oracle pins the
sf0.01 values; these pin the CONTRACT on constructed corpora)."""

from data_wrangle_openstreetmaps_data_1_spark.operators.vocab import (
    DL_RATIO_HI_FP,
    OOV_WARN_FP,
    vocab_drift_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_batch_is_zero_drift(spark):
    base = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta"), (3, "gamma delta")])
    r = vocab_drift_report(base, base, "text").collect()[0]
    assert r["new_terms"] == 0
    assert r["oov_rate_fp"] == 0
    assert r["dl_ratio_fp"] == 1000  # same avgdl, per mille
    assert r["l1_fp"] == 0  # identical relative frequencies
    assert not r["drift_flag"]
    assert r["base_terms"] == r["batch_terms"] == 4


def test_disjoint_batch_is_total_drift(spark):
    base = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta")])
    batch = _docs(spark, [(10, "zeta eta theta"), (11, "zeta eta")])
    r = vocab_drift_report(base, batch, "text").collect()[0]
    assert r["new_terms"] == r["batch_terms"] == 3
    assert r["oov_rate_fp"] == 1_000_000  # every batch token is OOV
    assert r["oov_rate_fp"] > OOV_WARN_FP
    # disjoint distributions: L1 = sum(base freqs) + sum(batch freqs)
    # = ~2e6 fp (minus per-term integer-division remainders)
    assert r["l1_fp"] > 1_900_000
    assert r["drift_flag"]


def test_length_shift_alone_trips_flag(spark):
    base = _docs(spark, [(1, "alpha beta"), (2, "alpha beta")])
    # same vocabulary, but docs 3x longer: dl_ratio 3000 > the 1250 ceiling
    batch = _docs(spark, [(10, "alpha beta alpha beta alpha beta")])
    r = vocab_drift_report(base, batch, "text").collect()[0]
    assert r["new_terms"] == 0
    assert r["oov_rate_fp"] == 0
    assert r["dl_ratio_fp"] == 3000
    assert r["dl_ratio_fp"] > DL_RATIO_HI_FP
    assert r["drift_flag"]
