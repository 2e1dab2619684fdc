"""Golden parity tests for the Layer-A pipeline, mirroring the reference's
unit + integration assertions (SURVEY.md §5; ref test_model_output.py,
test_model_output_integration.py)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from hubverse_transform_spark.transform import ModelOutputPipeline


def make_pipeline(spark, hub_dir: Path, file_path: Path) -> ModelOutputPipeline:
    return ModelOutputPipeline(
        spark, str(hub_dir), f"raw/{file_path.name}", str(hub_dir / "out")
    )


# --- CSV read semantics (A1) -------------------------------------------------


def test_csv_null_tokens_and_string_passthrough(spark, hub_dir, csv_numeric_file):
    """ref test_model_output.py:277-301: null tokens nulled in every column;
    CSV text passes through verbatim for string-typed columns ("0.0", "02")."""
    mo = make_pipeline(spark, hub_dir, csv_numeric_file)
    rows = mo.read_file().collect()
    assert len(rows) == 6
    assert [r["location"] for r in rows] == [None, "02", "02", None, "string location", "27"]
    assert [r["output_type_id"] for r in rows] == ["0.99", None, None, "0.0", None, "111"]


def test_csv_mixed_8_of_12_null(spark, hub_dir, csv_mixed_file):
    """ref test_model_output_integration.py:59-72: quoted ""/" " also null."""
    mo = make_pipeline(spark, hub_dir, csv_mixed_file)
    df = mo.add_columns(mo.read_file())
    assert df.count() == 12
    assert df.filter(F.col("output_type_id").isNull()).count() == 8


# --- Parquet cast-on-read (A2) ----------------------------------------------


def test_parquet_cast_numeric_to_string(spark, hub_dir, parquet_numeric_file):
    """ref test_model_output.py:314-339: int64 location 2 -> "2" (no leading
    zero); double output_type_id 0.0 -> "0", 0.99 -> "0.99", 111.0 -> "111"."""
    mo = make_pipeline(spark, hub_dir, parquet_numeric_file)
    rows = mo.read_file().collect()
    assert [r["location"] for r in rows] == ["2", "2", "2", "2", "2", "27"]
    assert [r["output_type_id"] for r in rows] == ["0.99", None, None, "0", None, "111"]


def test_parquet_no_null_normalization(spark, hub_dir, parquet_empty_string_file):
    """ref test_model_output.py:202-213: "" survives a Parquet read."""
    mo = make_pipeline(spark, hub_dir, parquet_empty_string_file)
    rows = mo.read_file().collect()
    assert [r["location"] for r in rows] == ["", "02"]
    assert [r["output_type_id"] for r in rows] == ["", "0.99"]


# --- add_columns (A5) --------------------------------------------------------


def test_add_columns_appends_provenance(spark, hub_dir, csv_numeric_file):
    """ref test_model_output.py:159-185: appended at the end when absent."""
    mo = make_pipeline(spark, hub_dir, csv_numeric_file)
    df = mo.add_columns(mo.read_file())
    assert df.columns[-2:] == ["round_id", "model_id"]
    vals = df.select("round_id", "model_id").distinct().collect()
    assert len(vals) == 1
    assert vals[0]["round_id"] == "2024-07-07"
    assert vals[0]["model_id"] == "teamabc-output_type_ids_numeric"


def test_add_columns_overwrites_in_place(spark, hub_dir):
    """ref model_output.py:298-308 dict-merge semantics: existing columns are
    replaced in position, not duplicated (F3's pre-existing round_id/model_id)."""
    csv = hub_dir / "raw" / "2024-05-04-teamabc.csv"
    csv.write_text(
        "origin_date,target,horizon,location,output_type,output_type_id,value,round_id,model_id\n"
        "2022-10-08,wk inc flu hosp,1,02,quantile,0.5,1.5,2022-10-08,oldteam\n"
    )
    mo = make_pipeline(spark, hub_dir, csv)
    df = mo.add_columns(mo.read_file())
    assert df.columns.count("round_id") == 1
    assert df.columns[-2:] == ["round_id", "model_id"]
    row = df.collect()[0]
    assert row["round_id"] == "2024-05-04"      # parsed from file name, not data
    assert row["model_id"] == "teamabc"
    assert df.schema["round_id"].dataType == StringType()


# --- end-to-end write / delete (A6-A8) ---------------------------------------


def test_add_model_output_roundtrip(spark, hub_dir, csv_mixed_file):
    """ref test_model_output_integration.py:43-122: single parquet object with
    deterministic name; read-back matches schema + values."""
    mo = make_pipeline(spark, hub_dir, csv_mixed_file)
    out_uri = mo.add_model_output()
    out_path = Path(out_uri)
    assert out_path.name == "2024-07-07-teamabc-output_type_ids_mixed.parquet"
    assert out_path.is_file()

    back = spark.read.parquet(str(out_path))
    assert back.count() == 12
    assert back.filter(F.col("output_type_id").isNull()).count() == 8
    assert back.columns[-2:] == ["round_id", "model_id"]

    # idempotent overwrite (re-upload replaces)
    out_uri2 = mo.add_model_output()
    assert out_uri2 == out_uri
    assert spark.read.parquet(str(out_path)).count() == 12


def test_delete_model_output(spark, hub_dir, csv_numeric_file):
    """ref test_model_output_integration.py:125-152."""
    mo = make_pipeline(spark, hub_dir, csv_numeric_file)
    out_uri = mo.add_model_output()
    assert Path(out_uri).is_file()
    mo.delete_model_output()
    assert not Path(out_uri).exists()
    with pytest.raises(UserWarning):
        mo.delete_model_output()


def test_missing_tasks_json_is_fatal(spark, tmp_path):
    """ref model_output.py:105-106."""
    (tmp_path / "raw").mkdir()
    f = tmp_path / "raw" / "2024-01-01-team.csv"
    f.write_text("a\n1\n")
    with pytest.raises(FileNotFoundError):
        ModelOutputPipeline(spark, str(tmp_path), "raw/2024-01-01-team.csv", str(tmp_path))


def test_unsupported_extension_warns(spark, hub_dir):
    (hub_dir / "raw" / "2024-01-01-team.txt").write_text("x")
    with pytest.raises(UserWarning):
        ModelOutputPipeline(spark, str(hub_dir), "raw/2024-01-01-team.txt", str(hub_dir / "out"))


def test_csv_quarantine_isolates_malformed_rows(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from hubverse_transform_spark.sources.model_output import read_csv_with_quarantine

    p = tmp_path / "mixed.csv"
    p.write_text(
        "location,horizon,value\n"
        "US,1,3.5\n"
        "CA,notanint,9.9\n"      # horizon fails the long type -> quarantined
        "MX,2,7.25\n"
    )
    schema = StructType(
        [
            StructField("location", StringType()),
            StructField("horizon", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    clean, quarantined = read_csv_with_quarantine(spark, str(p), schema)
    assert sorted(r.location for r in clean.collect()) == ["MX", "US"]
    bad = quarantined.collect()
    assert len(bad) == 1
    assert bad[0]["_corrupt_record"] == "CA,notanint,9.9"


def test_ensemble_operators_on_model_output_shape(spark):
    from hubverse_transform_spark.operators.ensemble import (
        mean_ensemble,
        median_ensemble,
        task_cell_cols,
    )

    rows = [
        # (round_id, model_id, location, output_type, output_type_id, value)
        ("2024-06-01", "m1", "US", "quantile", "0.5", 10.0),
        ("2024-06-01", "m2", "US", "quantile", "0.5", 20.0),
        ("2024-06-01", "m3", "US", "quantile", "0.5", 90.0),
        ("2024-06-01", "m1", "US", "quantile", "0.9", 30.0),
        ("2024-06-01", "m2", "US", "quantile", "0.9", 50.0),
    ]
    df = spark.createDataFrame(
        rows,
        "round_id string, model_id string, location string, "
        "output_type string, output_type_id string, value double",
    )
    assert task_cell_cols(df) == ["round_id", "location", "output_type", "output_type_id"]

    mean = {(r.output_type_id): r for r in mean_ensemble(df).collect()}
    assert mean["0.5"].value == 40.0 and mean["0.5"].n_models == 3
    assert mean["0.9"].value == 40.0 and mean["0.9"].n_models == 2

    med = {(r.output_type_id): r for r in median_ensemble(df).collect()}
    assert med["0.5"].value == 20.0  # robust to m3's outlier

    weighted = {r.output_type_id: r for r in mean_ensemble(df, {"m1": 3.0, "m2": 1.0}).collect()}
    # m3 unlisted -> excluded; (10*3 + 20*1) / 4 = 12.5
    assert weighted["0.5"].value == 12.5 and weighted["0.5"].n_models == 2
    # ensemble output is lake-shaped: task cells + value (+ n_models)
    assert set(mean_ensemble(df).columns) == {
        "round_id", "location", "output_type", "output_type_id", "value", "n_models",
    }


def test_ensemble_zero_weight_cells_and_negative_weights(spark):
    """All-zero-weight task cells have no defined mean (0/0) and are dropped;
    negative weights are rejected up front."""
    import pytest

    from hubverse_transform_spark.operators.ensemble import mean_ensemble

    rows = [
        ("2024-06-01", "m1", "US", "quantile", "0.5", 10.0),
        ("2024-06-01", "m2", "US", "quantile", "0.9", 30.0),
    ]
    df = spark.createDataFrame(
        rows,
        "round_id string, model_id string, location string, "
        "output_type string, output_type_id string, value double",
    )
    # the 0.5 cell's only listed model has weight 0 -> dropped, not null
    out = {r.output_type_id: r for r in mean_ensemble(df, {"m1": 0.0, "m2": 2.0}).collect()}
    assert set(out) == {"0.9"}
    assert out["0.9"].value == 30.0

    with pytest.raises(ValueError, match="non-negative"):
        mean_ensemble(df, {"m1": -1.0})


def test_write_observation_metrics(spark, hub_dir, csv_numeric_file):
    """write_parquet surfaces row/null metrics from the Observation attached
    to the sink action — one scan, no second pass."""
    from hubverse_transform_spark.transform import ModelOutputPipeline

    mo = ModelOutputPipeline(
        spark,
        str(hub_dir),
        f"raw/{csv_numeric_file.name}",
        str(hub_dir / "out"),
    )
    mo.add_model_output()
    m = mo.last_write_metrics
    assert m["n_rows"] == 6
    # rows 2 (empty), 3 (NA), 5 (null) -> 3 null output_type_ids
    assert m["n_null_output_type_id"] == 3
    assert m["n_null_value"] == 0
