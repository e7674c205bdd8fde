"""Alternate source formats: JSON/ORC copies must be lossless (covered by
the oracle queries); corrupt JSON rows must fail loudly in FAILFAST and
be quarantined — not silently nulled — in PERMISSIVE."""

from __future__ import annotations

import pytest


def test_json_corrupt_row_failfast_raises(spark, tmp_path):
    p = tmp_path / "ev.jsonl"
    p.write_text(
        '{"event_id": 1, "value": 1.5}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "value": 2.5}\n'
    )
    df = (
        spark.read.schema("event_id bigint, value double")
        .option("mode", "FAILFAST")
        .json(str(p))
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_json_corrupt_row_permissive_quarantines(spark, tmp_path):
    p = tmp_path / "ev.jsonl"
    p.write_text(
        '{"event_id": 1, "value": 1.5}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "value": 2.5}\n'
    )
    df = (
        spark.read.schema(
            "event_id bigint, value double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "THIS IS NOT JSON"
    assert sorted(r.event_id for r in good) == [1, 2]


def test_orc_copy_row_identical_to_parquet(spark):
    from emails_to_vector_db_spark.sources.formats import read_events_orc
    from emails_to_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orc = read_events_orc(spark, SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    par = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert orc.exceptAll(par).count() == 0
    assert par.exceptAll(orc).count() == 0


def test_resample_linear_hand_computed():
    """Linear resample ground truth: halving the rate of a ramp keeps
    every other sample exactly; identity rate is a no-op; length floors."""
    import numpy as np

    from emails_to_vector_db_spark.sources.multimodal import resample_linear

    ramp = np.arange(0, 1000, 10, dtype=np.int16)  # 100 samples
    half = resample_linear(ramp, 8000, 4000)
    np.testing.assert_array_equal(half, ramp[::2])
    same = resample_linear(ramp, 8000, 8000)
    np.testing.assert_array_equal(same, ramp)
    third = resample_linear(ramp, 9000, 3000)
    assert len(third) == len(ramp) // 3
    # interpolated midpoints on an upsample are exact averages
    up = resample_linear(np.array([0, 10], dtype=np.int16), 1, 2)
    np.testing.assert_array_equal(up, np.array([0, 5, 10, 10], dtype=np.int16))
