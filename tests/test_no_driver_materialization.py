"""Data-plane discipline guard: the library must not collect datasets to the
driver. Every ``.collect()`` / ``.toPandas()`` in ``hubverse_transform_spark``
must be on the explicit allowlist below, each with a bounded-size
justification — new entries are a design decision, not a convenience.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "hubverse_transform_spark"

#: (file, function) -> why collecting there is bounded and correct
ALLOWED = {
    ("streaming/ingest.py", "stream_model_outputs"): "file-name list per micro-batch",
    ("streaming/matview.py", "upsert"): "touched day-partition keys only",
    ("operators/similarity.py", "ivf_cosine_topk"): "n_centroids rows (<=16)",
    ("operators/similarity.py", "_exact_cosine_pairs_blocked"):
        "documented bounded variant: broadcast matrix must fit an executor",
    ("operators/similarity.py", "spherical_kmeans_centroids"):
        "k seed rows + k*dim aggregated component sums per Lloyd step",
    ("operators/similarity.py", "ivf_list_stats"):
        "n_centroids seed rows only (same bounded quantizer load as ivf_cosine_topk)",
    ("sinks.py", "write_zorder_layout"): "4 scalar min/max bounds",
    ("operators/scd.py", "apply_changeset"):
        "limit(5) sample of duplicate keys for the MERGE-precondition error",
}


def _offenders():
    out = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text())
        # map line -> enclosing function name
        funcs: list[tuple[int, int, str]] = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                funcs.append((node.lineno, max(node.lineno, node.end_lineno or 0), node.name))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Attribute)
                and node.attr in ("collect", "toPandas")
                and isinstance(getattr(node, "ctx", None), ast.Load)
            ):
                fn = next(
                    (name for lo, hi, name in funcs if lo <= node.lineno <= hi),
                    "<module>",
                )
                if (rel, fn) not in ALLOWED:
                    out.append(f"{rel}:{node.lineno} in {fn}()")
    return out


def test_collect_only_on_the_allowlist():
    offenders = _offenders()
    assert not offenders, (
        "unapproved driver-side materialization (add to ALLOWED only with a "
        "bounded-size justification):\n" + "\n".join(offenders)
    )
