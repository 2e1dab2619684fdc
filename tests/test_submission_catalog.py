"""Python DataSource API: the submission-catalog source."""

from __future__ import annotations

from pathlib import Path

from hubverse_transform_spark.sources.submission_catalog import register


def test_submission_catalog_lists_and_parses(spark, tmp_path: Path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "2024-06-01-acme-model.csv").write_text("a,b\n1,2\n")
    (raw / "2024-06-08_team_two.parquet").write_bytes(b"PAR1fake")
    (raw / "notes.txt").write_text("not a submission")
    (raw / "2024-06-15.csv").write_text("a\n")  # no model id -> invalid

    register(spark)
    df = spark.read.format("hubverse_submissions").load(str(raw))
    rows = {r.file_name: r for r in df.collect()}
    assert len(rows) == 4

    ok = rows["2024-06-01-acme-model.csv"]
    assert (ok.round_id, ok.model_id, ok.valid) == ("2024-06-01", "acme-model", True)
    assert ok.size_bytes == len("a,b\n1,2\n")

    pq = rows["2024-06-08_team_two.parquet"]
    assert (pq.round_id, pq.model_id, pq.valid) == ("2024-06-08", "team_two", True)

    assert rows["notes.txt"].valid is False
    assert rows["notes.txt"].round_id is None
    assert rows["2024-06-15.csv"].valid is False
    assert rows["2024-06-15.csv"].model_id is None


def test_submission_catalog_joins_with_pipeline(spark, tmp_path: Path):
    # the catalog drives selection: only valid files feed the content reader
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "2024-06-01-m1.csv").write_text("x\n1\n")
    (raw / "junk.log").write_text("no")
    register(spark)
    cat = spark.read.format("hubverse_submissions").load(str(raw))
    valid_paths = [r.path for r in cat.filter("valid").collect()]
    assert valid_paths == [str(raw / "2024-06-01-m1.csv")]
