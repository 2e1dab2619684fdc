"""tasks.json -> StructType compiler (Layer A, SURVEY.md §1.3).

The reference derives its read schema from hub configuration via the external
``hubdata.create_hub_schema`` (ref: model_output.py:11, 282-288). We reimplement
the observable typing policy here as a pure driver-side compiler — the config is
KB-sized JSON, so there is no reason to distribute this step:

- task-id columns are typed from their enumerated domain values (union of
  ``required`` + ``optional`` across every round / model_task):
  all ISO-date strings -> DateType, all ints -> LongType, else StringType;
- ``location`` and ``output_type_id`` are forced to StringType when
  ``output_type_id_datatype`` is "auto" (the default), so heterogeneous values
  (quantile level 0.25 vs pmf category "large_increase") and leading-zero FIPS
  codes ("02") survive;
- ``output_type`` is StringType; ``value`` is typed from the union of
  ``output_type.*.value.type`` specs (double dominates int);
- provenance columns ``round_id`` (typed like its source variable when
  ``round_id_from_variable`` else string) and ``model_id`` (string) come last.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")

# value-spec type names from the hubverse tasks schema -> Spark types
_VALUE_TYPES: dict[str, DataType] = {
    "double": DoubleType(),
    "integer": LongType(),
    "character": StringType(),
}

# columns forced to string regardless of enumerated values (ref §1.3:
# hubdata types these as string under output_type_id_datatype == "auto")
_FORCED_STRING = {"location", "output_type_id"}

# tasks.json top-level ``output_type_id_datatype`` values -> Spark types
# (the hubdata contract the reference delegates to at ref model_output.py:282-288;
# example config at ref test/integration/data/flu-metrocast/hub-config/tasks.json:160).
# "auto" means infer — which for output_type_id collapses to string so that
# heterogeneous values (0.25 vs "large_increase") survive in one column.
_OUTPUT_TYPE_ID_DATATYPES: dict[str, DataType] = {
    "character": StringType(),
    "double": DoubleType(),
    "integer": LongType(),
    "logical": BooleanType(),
    "Date": DateType(),
}


def _output_type_id_type(tasks: dict) -> DataType | None:
    """The pinned output_type_id type, or None when "auto"/absent (caller
    falls back to the forced-string inference policy)."""
    pinned = tasks.get("output_type_id_datatype", "auto")
    if pinned == "auto":
        return None
    try:
        return _OUTPUT_TYPE_ID_DATATYPES[pinned]
    except KeyError:
        raise ValueError(
            f"unsupported output_type_id_datatype {pinned!r}; expected one of "
            f"'auto', {sorted(_OUTPUT_TYPE_ID_DATATYPES)}"
        ) from None


def _infer_domain_type(values: list[Any]) -> DataType:
    """Type a task-id column from its enumerated domain values."""
    non_null = [v for v in values if v is not None]
    if not non_null:
        return StringType()
    if all(isinstance(v, bool) for v in non_null):
        return StringType()  # booleans are serialized as strings in hub data
    if all(isinstance(v, int) and not isinstance(v, bool) for v in non_null):
        return LongType()
    if all(isinstance(v, str) and _ISO_DATE_RE.match(v) for v in non_null):
        return DateType()
    return StringType()


def _task_id_domains(tasks: dict) -> dict[str, list[Any]]:
    """Union each task-id column's required+optional values across all
    rounds and model_tasks, preserving first-seen column order."""
    domains: dict[str, list[Any]] = {}
    for rnd in tasks.get("rounds", []):
        for mt in rnd.get("model_tasks", []):
            for col, spec in (mt.get("task_ids") or {}).items():
                vals = domains.setdefault(col, [])
                for key in ("required", "optional"):
                    vs = (spec or {}).get(key)
                    if vs:
                        vals.extend(vs)
    return domains


def _value_type(tasks: dict) -> DataType:
    """Union of output_type.*.value.type specs; double dominates integer."""
    seen: set[str] = set()
    for rnd in tasks.get("rounds", []):
        for mt in rnd.get("model_tasks", []):
            for spec in (mt.get("output_type") or {}).values():
                t = ((spec or {}).get("value") or {}).get("type")
                if t:
                    seen.add(t)
    if not seen:
        return DoubleType()
    if "character" in seen:
        return StringType()
    if "double" in seen:
        return DoubleType()
    if len(seen) == 1:
        return _VALUE_TYPES.get(next(iter(seen)), DoubleType())
    return DoubleType()


def _round_id_type(tasks: dict, domains: dict[str, DataType]) -> DataType:
    """round_id is typed like its source variable when round_id_from_variable
    (e.g. DateType when derived from reference_date — ref conftest.py:152),
    else StringType."""
    for rnd in tasks.get("rounds", []):
        if rnd.get("round_id_from_variable") and rnd.get("round_id") in domains:
            return domains[rnd.get("round_id")]
    return StringType()


def hub_schema(tasks: dict) -> StructType:
    """Compile a parsed tasks.json dict into the hub's read StructType.

    Column order: task-id columns (config order), then output_type /
    output_type_id / value, then round_id / model_id (ref conftest.py:127-155
    fixed fixture order; integration golden schema at
    test_model_output_integration.py:26-40).
    """
    raw_domains = _task_id_domains(tasks)
    domain_types = {c: _infer_domain_type(v) for c, v in raw_domains.items()}
    otid_pinned = _output_type_id_type(tasks)

    fields: list[StructField] = []
    for col in raw_domains:
        if col == "output_type_id" and otid_pinned is not None:
            t = otid_pinned
        else:
            t = StringType() if col in _FORCED_STRING else domain_types[col]
        fields.append(StructField(col, t, nullable=True))
    fields.append(StructField("output_type", StringType(), True))
    if "output_type_id" not in raw_domains:
        fields.append(
            StructField("output_type_id", otid_pinned or StringType(), True)
        )
    fields.append(StructField("value", _value_type(tasks), True))
    fields.append(StructField("round_id", _round_id_type(tasks, domain_types), True))
    fields.append(StructField("model_id", StringType(), True))
    return StructType(fields)


def output_schema(read_schema: StructType) -> StructType:
    """The transformed-output schema: same as the read schema but provenance
    columns (round_id/model_id) are always StringType — the reference's
    expected output has string round_id even when the read schema types it as
    date32 (ref test_model_output_integration.py:26-40 vs conftest.py:151)."""
    fields = []
    for f in read_schema.fields:
        if f.name in ("round_id", "model_id"):
            fields.append(StructField(f.name, StringType(), True))
        else:
            fields.append(f)
    names = {f.name for f in fields}
    for prov in ("round_id", "model_id"):
        if prov not in names:
            fields.append(StructField(prov, StringType(), True))
    return StructType(fields)
