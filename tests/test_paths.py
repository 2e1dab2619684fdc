"""Filename-parse / routing tests mirroring the reference corpus (F7,
ref test/unit/test_model_output.py:26-156)."""

import pytest

from hubverse_transform_spark.paths import (
    file_stem,
    parse_file,
    route_s3_key,
    sanitize_uri,
    validate_extension,
)


@pytest.mark.parametrize(
    ("name", "round_id", "model_id"),
    [
        ("2420-01-01-team-model", "2420-01-01", "team-model"),
        ("2420-01-01-----team-model", "2420-01-01", "team-model"),
        ("2420-01-01____teammodelallonestring", "2420-01-01", "teammodelallonestring"),
        ("2420-01-01-team-model ", "2420-01-01", "team-model"),
        ("2420-01-01-team.model", "2420-01-01", "team.model"),
        ("2420-01-01-team model with spaces", "2420-01-01", "team model with spaces"),
        ("2420-01-01-ensemble-θ", "2420-01-01", "ensemble-θ"),
    ],
)
def test_parse_file_valid(name, round_id, model_id):
    parts = parse_file(name)
    assert parts["round_id"] == round_id
    assert parts["model_id"] == model_id


@pytest.mark.parametrize(
    "name",
    ["2420-01-01", "round_id-team-model", "01-02-2440-team-model", ""],
)
def test_parse_file_invalid(name):
    with pytest.raises(ValueError):
        parse_file(name)


def test_route_s3_key_nested():
    r = route_s3_key("hub-bucket", "raw/model-output/team/2024-01-01-team-model.csv")
    assert r.hub_path == "s3://hub-bucket"
    assert r.output_path == "s3://hub-bucket/model-output/team"


def test_route_s3_key_bare():
    r = route_s3_key("hub-bucket", "raw/2024-01-01-team-model.csv")
    assert r.output_path == "s3://hub-bucket/."


def test_route_s3_key_bad_prefix():
    with pytest.raises(ValueError):
        route_s3_key("hub-bucket", "cooked/2024-01-01-team-model.csv")


def test_sanitize_uri_strips_and_quotes():
    # trailing space in stem removed; inner spaces percent-encoded
    assert sanitize_uri("/a/b/2024-01-01-my model .csv") == "/a/b/2024-01-01-my%20model.csv"
    assert sanitize_uri("s3://bucket/key with space.csv").startswith("s3://bucket/key%20with")


def test_validate_extension():
    validate_extension("/a/2024-01-01-m.csv")
    validate_extension("/a/2024-01-01-m.parquet")
    validate_extension("/a/2024-01-01-m.pqt")
    with pytest.raises(UserWarning):
        validate_extension("/a/no_extension_dir")
    with pytest.raises(UserWarning):
        validate_extension("/a/2024-01-01-m.txt")


def test_file_stem():
    assert file_stem("/a/b/2024-01-01-m.snappy.parquet") == "2024-01-01-m.snappy"
    assert file_stem("plain") == "plain"
