"""Property-based tests (hypothesis) for the pure driver-side logic: filename
parsing, S3 routing, and the tasks.json -> StructType compiler. These run
without a SparkSession, so hypothesis can afford hundreds of examples."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql.types import DateType, LongType, StringType

from hubverse_transform_spark.paths import (
    file_stem,
    file_suffix,
    parse_file,
    route_s3_key,
    sanitize_uri,
)
from hubverse_transform_spark.schema import hub_schema, output_schema

# --- filename parsing -------------------------------------------------------

iso_dates = st.dates(dt.date(1990, 1, 1), dt.date(2099, 12, 31)).map(str)

# model ids: start alphanumeric (leading -/_ are consumed as separators),
# no whitespace at the edges (stripped), must not embed another date-like run
model_ids = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-\.]{0,30}", fullmatch=True).filter(
    lambda s: s == s.strip()
)


@given(iso_dates, model_ids, st.sampled_from(["-", "_", "-_", "__"]))
def test_parse_file_roundtrip(date, model, sep):
    out = parse_file(f"{date}{sep}{model}")
    assert out["round_id"] == date
    assert out["model_id"] == model


@given(iso_dates)
def test_parse_file_without_model_raises(date):
    with pytest.raises(ValueError):
        parse_file(date)


@given(model_ids)
def test_parse_file_without_date_raises(model):
    with pytest.raises(ValueError):
        parse_file(model)


@given(iso_dates, model_ids, st.sampled_from(["csv", "parquet", "pqt"]))
def test_stem_suffix_partition(date, model, ext):
    name = f"{date}-{model}.{ext}"
    assert file_stem(name) + file_suffix(name) == name
    assert file_suffix(name) == f".{ext}"


# --- URI sanitization -------------------------------------------------------


@given(model_ids, st.text(alphabet=" \t", max_size=3), st.text(alphabet=" \t", max_size=3))
def test_sanitize_strips_stem_whitespace(stem, lead, trail):
    out = sanitize_uri(f"dir/{lead}{stem}{trail}.csv")
    assert out == f"dir/{stem}.csv"


@given(model_ids)
def test_sanitize_percent_encodes_spaces(stem):
    out = sanitize_uri(f"s3://bucket/some dir/{stem}.csv")
    assert " " not in out and out.startswith("s3://bucket/some%20dir/")


# --- S3 routing -------------------------------------------------------------

path_segs = st.lists(
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9_\-]{0,10}", fullmatch=True), min_size=0, max_size=4
)


@given(path_segs, model_ids)
def test_route_s3_key_strips_prefix_and_filename(segs, fname):
    key = "/".join(["raw", *segs, f"{fname}.csv"])
    route = route_s3_key("bkt", key)
    assert route.hub_path == "s3://bkt"
    assert route.mo_path == key
    expect_dir = "/".join(segs) if segs else "."
    assert route.output_path == f"s3://bkt/{expect_dir}"


@given(path_segs, model_ids)
def test_route_s3_key_rejects_foreign_prefix(segs, fname):
    key = "/".join(["cooked", *segs, f"{fname}.csv"])
    with pytest.raises(ValueError):
        route_s3_key("bkt", key)


# --- schema compiler --------------------------------------------------------


def _tasks(task_ids: dict, value_type: str = "double", from_variable: str | None = None):
    rnd = {
        "round_id_from_variable": from_variable is not None,
        "round_id": from_variable,
        "model_tasks": [
            {
                "task_ids": task_ids,
                "output_type": {
                    "mean": {"output_type_id": {"required": None}, "value": {"type": value_type}}
                },
            }
        ],
    }
    return {"rounds": [rnd], "output_type_id_datatype": "auto"}


domain_values = st.one_of(
    st.lists(iso_dates, min_size=1, max_size=5),
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=5),
    st.lists(st.from_regex(r"[A-Za-z][A-Za-z0-9 ]{0,10}", fullmatch=True), min_size=1, max_size=5),
)


@given(domain_values)
def test_location_always_string(vals):
    schema = hub_schema(_tasks({"location": {"required": vals, "optional": None}}))
    assert schema["location"].dataType == StringType()


@given(st.lists(iso_dates, min_size=1, max_size=5))
def test_all_iso_dates_type_as_date(vals):
    schema = hub_schema(_tasks({"origin_date": {"required": vals, "optional": None}}))
    assert schema["origin_date"].dataType == DateType()


@given(st.lists(st.integers(-10, 10), min_size=1, max_size=5))
def test_all_ints_type_as_long(vals):
    schema = hub_schema(_tasks({"horizon": {"required": vals, "optional": None}}))
    assert schema["horizon"].dataType == LongType()


@given(domain_values, st.sampled_from(["double", "integer", "character"]))
def test_schema_invariants(vals, vtype):
    tasks = _tasks(
        {"origin_date": {"required": vals, "optional": None}}, value_type=vtype,
        from_variable="origin_date",
    )
    schema = hub_schema(tasks)
    names = [f.name for f in schema.fields]
    # fixed tail ordering and provenance always present
    assert names[-2:] == ["round_id", "model_id"]
    assert {"output_type", "output_type_id", "value"} <= set(names)
    # round_id typed like its source variable; output schema forces it string
    assert schema["round_id"].dataType == schema["origin_date"].dataType
    out = output_schema(schema)
    assert out["round_id"].dataType == StringType()
    assert out["model_id"].dataType == StringType()
    assert [f.name for f in out.fields] == names
