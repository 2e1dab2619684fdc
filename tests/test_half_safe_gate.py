"""Machine gate for the `# half-safe:` rounding-waiver convention
(round-13 verdict item 1).

``tests/test_round_lint.py`` gates FIRST-order shapes (round OF an
aggregate). This gate closes the SECOND-order class — a value rounded to a
1e-d grid but kept float that then flows INTO an aggregate — which is
exactly how q131 diverged (ultra seed 909192): its waiver said "continuous
float, measure-zero", but avg() over grid-rounded floats is an exact
rational with reachable boundaries. Until round 13 the ~30 `# half-safe:`
waivers were human comments nothing machine-checked; VERIFY_r12 §10's
static audit of the second-order family was prose. This test IS that audit,
re-run on every pytest invocation:

- every rounded-float column binding that later feeds an avg/sum/var
  aggregate (AST dataflow scan, `tools/audit_second_order.py`) must carry a
  non-empty `# half-safe:` justification in reach, or be in the
  exact-integer family (int-cast / _cents / _intval / _fixed — aggregating
  exact integers is the FIX pattern);
- every half-safe TAG must still have a rounding site in reach (stale
  waivers fail — a justification whose site was refactored away looks
  load-bearing while guarding nothing);
- the audited-site registry is pinned by name so a scanner regression or a
  refactor that silently removes coverage fails loudly instead of passing
  vacuously.

The seeded self-tests prove the scanner fires on the exact q131 shape and
honors the exact-integer exemption.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from audit_second_order import (  # noqa: E402
    Report,
    _scan_function,
    scan,
    stale_tags,
)


def test_second_order_sites_all_justified():
    rep = scan()
    bad = [
        f"{s.file}:{s.binding.line} {s.func}.{s.binding.name} -> agg@{s.agg_line}"
        for s in rep.sites
        if not s.justified
    ]
    assert not bad, (
        "rounded-float column flows into an aggregate without a "
        "'# half-safe: <why>' justification (the q131 divergence class). "
        "Either quantize to exact integers before aggregating "
        "(floor(x*1e<d>+0.5).cast('long'), the q131 fix pattern) or tag "
        "the binding with an honest justification. Offenders:\n  "
        + "\n  ".join(bad)
    )


def test_no_stale_half_safe_tags():
    rep = scan()
    stale = stale_tags(rep)
    assert not stale, (
        "half-safe waiver with no rounding site in reach — the site was "
        "refactored away but the justification remains (worse than no tag: "
        "it reads as load-bearing). Remove or re-anchor:\n  "
        + "\n  ".join(stale)
    )


#: the audited second-order registry as of round 13 — (file, function,
#: bound column) with the number of aggregate consumptions the scanner
#: must find. Update ONLY alongside a conscious re-adjudication of the
#: site (that review is the point); a silent drop here means the scanner
#: stopped seeing a known site.
SECOND_ORDER_REGISTRY = {
    ("__spark_entry__.py", "q308_l_diversity_audit", "_h"): 1,
    ("__spark_entry__.py", "q332_t_closeness_audit", "_tvd"): 2,
    ("__spark_entry__.py", "q348_seasonality_strength", "_rev"): 6,
    ("__spark_entry__.py", "q361_kendall_tau_daily", "_y"): 1,
    ("__spark_entry__.py", "q368_ljung_box_residuals", "_rev"): 1,
    (
        "hubverse_transform_spark/operators/similarity.py",
        "pq_adc_topk",
        "_ld",
    ): 1,
}


def test_registry_pinned():
    rep = scan()
    found: dict[tuple, int] = {}
    for s in rep.sites:
        k = (s.file, s.func, s.binding.name)
        found[k] = found.get(k, 0) + 1
    assert found == SECOND_ORDER_REGISTRY, (
        "second-order site registry drifted. New sites need adjudication "
        "(tag or exact-integer fix) + a registry entry; removed sites need "
        "the entry consciously deleted alongside the code change.\n"
        f"found:    {sorted(found.items())}\n"
        f"expected: {sorted(SECOND_ORDER_REGISTRY.items())}"
    )
    # scanner-health floors: a parse regression that silently sees nothing
    # would otherwise make every assertion above vacuously true
    n_round = sum(len(v) for v in rep.rounding_lines.values())
    n_tags = sum(len(v) for v in rep.tag_lines.values())
    assert n_round >= 450, f"rounding-site census collapsed: {n_round}"
    assert n_tags >= 30, f"half-safe tag census collapsed: {n_tags}"


def _scan_src(src: str) -> Report:
    rep = Report()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            _scan_function(node.name, "fake.py", node, src.splitlines(), rep)
    return rep


def test_scanner_fires_on_the_q131_shape():
    """Grid-rounded float avg'd without a tag — the exact bug class."""
    src = (
        "def q(df):\n"
        '    d = df.select(F.round(sq_dist, 6).alias("_e"))\n'
        '    return d.groupBy("g").agg(F.avg("_e").alias("m"))\n'
    )
    rep = _scan_src(src)
    assert len(rep.sites) == 1 and not rep.sites[0].justified
    # withColumn binding and weighted-sum consumption also match
    src_w = (
        "def q(df):\n"
        '    d = df.withColumn("_e", half_up(F.col("x"), 6))\n'
        '    return d.agg(F.sum(F.col("_e") * F.col("w")).alias("m"))\n'
    )
    rep_w = _scan_src(src_w)
    assert len(rep_w.sites) == 1 and not rep_w.sites[0].justified
    # floor(x + 0.5) spelled inline matches too
    src_f = (
        "def q(df):\n"
        '    d = df.select((F.floor(F.col("x") * 1e6 + 0.5) / 1e6).alias("_e"))\n'
        '    return d.agg(F.mean("_e"))\n'
    )
    assert len(_scan_src(src_f).sites) == 1


def test_scanner_honors_the_exemptions():
    # exact-integer family: round immediately cast to long (the fix shape)
    src_cast = (
        "def q(df):\n"
        '    d = df.select(F.floor(x * 1e6 + 0.5).cast("long").alias("_k"))\n'
        '    return d.agg(F.sum("_k"))\n'
    )
    assert not _scan_src(src_cast).sites
    # exact-int helper consumption INSIDE the aggregate (q378's shape)
    src_fixed = (
        "def q(df):\n"
        '    d = df.select(F.round(F.col("x"), 2).alias("_v"))\n'
        '    return d.agg(F.sum(_fixed("_v", 100)))\n'
    )
    assert not _scan_src(src_fixed).sites
    # a justified site passes, an empty justification does not
    src_tag = (
        "def q(df):\n"
        "    # half-safe: irrational source, boundary has measure zero\n"
        '    d = df.select(F.round(ent, 9).alias("_h"))\n'
        '    return d.agg(F.avg("_h"))\n'
    )
    rep = _scan_src(src_tag)
    assert len(rep.sites) == 1 and rep.sites[0].justified
    src_empty = (
        "def q(df):\n"
        "    # half-safe:\n"
        '    d = df.select(F.round(ent, 9).alias("_h"))\n'
        '    return d.agg(F.avg("_h"))\n'
    )
    rep_e = _scan_src(src_empty)
    assert len(rep_e.sites) == 1 and not rep_e.sites[0].justified
    # display-only rounding (no aggregate downstream) is not a site
    src_disp = (
        "def q(df):\n"
        '    return df.select(F.round(F.col("x"), 2).alias("v"))\n'
    )
    assert not _scan_src(src_disp).sites


def test_scanner_fires_on_the_sql_shape():
    """round(...) AS x ... avg(x) inside a SQL string — invisible to the
    AST dataflow, caught by the SQL sub-scan; CAST-to-int exempt."""
    src = (
        "def q(spark):\n"
        '    return spark.sql("""\n'
        "        WITH d AS (SELECT round(sum(price), 2) AS rev FROM t GROUP BY day)\n"
        "        SELECT avg(rev) AS m FROM d\n"
        '    """)\n'
    )
    rep = _scan_src(src)
    assert len(rep.sites) == 1 and not rep.sites[0].justified
    # in-SQL `-- half-safe:` tag justifies it
    src_tag = src.replace(
        "WITH d AS", "-- half-safe: grid re-snap, bit-identical\n        WITH d AS"
    )
    rep_t = _scan_src(src_tag)
    assert len(rep_t.sites) == 1 and rep_t.sites[0].justified
    # exact-integer SQL form is exempt
    src_cast = (
        "def q(spark):\n"
        '    return spark.sql("""\n'
        "        WITH d AS (SELECT CAST(round(sum(price) * 100) AS BIGINT) AS c FROM t GROUP BY day)\n"
        "        SELECT sum(c) AS m FROM d\n"
        '    """)\n'
    )
    assert not _scan_src(src_cast).sites


def test_stale_detection_fires_on_orphaned_tag(tmp_path, monkeypatch):
    """A half-safe tag with no rounding site below it must be reported."""
    import audit_second_order as mod

    rep = Report()
    rep.tag_lines["fake.py"] = {2: "some justification"}
    fake = tmp_path / "fake.py"
    fake.write_text("x = 1\n# half-safe: some justification\ny = 2\nz = 3\n")
    monkeypatch.setattr(mod, "PACKAGE_FILES", [fake])
    monkeypatch.setattr(mod, "REPO", tmp_path)
    # entry read still happens; point it at a file with no tags
    entry = tmp_path / "__spark_entry__.py"
    entry.write_text("pass\n")
    monkeypatch.setattr(mod, "ENTRY", entry)
    stale = mod.stale_tags(rep)
    assert len(stale) == 1 and "stale waiver" in stale[0]
    # and a tag WITH a site in reach is not stale
    fake.write_text("x = 1\n# half-safe: some justification\ny = F.round(a, 2)\n")
    assert not mod.stale_tags(rep)
