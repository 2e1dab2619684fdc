"""Static second-order-rounding audit (round-13: VERIFY_r12 §10 made
machine-checkable).

The q131 divergence class: a value ROUNDED to a 1e-d grid but kept as a
FLOAT that then flows into an aggregate (avg/sum/weighted arithmetic) is an
exact rational with reachable d-digit half boundaries — the "continuous
float, measure-zero" waiver is void one aggregation level up. VERIFY_r12
§10 audited this by hand (15 ``F.round`` sites traced, one second-order
site found and justified); this tool is that audit as code, so the next
wrong waiver fails a test instead of waiting for an ultra-sparse seed.

What it finds, per function (every ``queries()`` entry in
``__spark_entry__.py`` plus every top-level function in the operator /
functions packages):

- **rounded float bindings**: a column name bound (via ``.alias("name")``
  or ``.withColumn("name", ...)``) to an expression containing
  ``F.round(...)``, ``half_up(...)`` / ``_half_up(...)``, or
  ``F.floor(... + 0.5 ...)`` — UNLESS the rounding result is immediately
  cast to an integer type (``.cast("long"/"bigint"/"int")``), which is the
  exact-integer family (``_cents``/``_intval``/``_fixed`` and the micro-unit
  quantizations): aggregating exact integers is the FIX pattern, not the
  bug.
- **aggregate consumption**: a later ``F.avg/F.sum/F.mean/F.var_*/
  F.stddev*`` call in the same function whose argument expression mentions
  that bound name (bare string, ``F.col("name")``, or arithmetic over it —
  the weighted case).

Each (binding, aggregate) pair is a SECOND-ORDER SITE and must carry a
``# half-safe:`` justification (non-empty text) within ``WINDOW`` lines
above either end, or the gate in tests/test_half_safe_gate.py fails. The
same scan over SQL string constants catches the shape spelled in SQL
(``round(x, d) AS name`` ... ``avg(name)``), which the Python AST cannot
see — oracle_sql() is excluded, as it legitimately mirrors justified Spark
sites verbatim.

Run standalone for the audit report::

    python tools/audit_second_order.py
"""

from __future__ import annotations

import ast
import re
import sys
from dataclasses import dataclass, field
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

#: files whose top-level functions are scanned (operator + function packages)
PACKAGE_FILES = sorted(
    p
    for p in (REPO / "hubverse_transform_spark").rglob("*.py")
    if p.name != "__init__.py"
)

ENTRY = REPO / "__spark_entry__.py"

#: lines of context above a site in which a `# half-safe:` tag counts
#: (10, not test_round_lint's 8: the anchor here is the rounding CALL
#: line, which can sit several lines into a select/agg chain below the
#: comment block)
WINDOW = 10

AGG_FNS = {
    "avg",
    "mean",
    "sum",
    "var_samp",
    "var_pop",
    "variance",
    "stddev",
    "stddev_samp",
    "stddev_pop",
}

INT_CASTS = {"long", "bigint", "int", "integer", "short", "smallint"}

#: helpers that already return exact integers (round+cast inside)
EXACT_INT_HELPERS = {"_cents", "_intval", "_fixed"}


def _call_name(node: ast.Call) -> str | None:
    """'F.round' -> 'round' for F.<fn>(...); bare name for half_up(...)."""
    f = node.func
    if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name) and f.value.id == "F":
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def _contains_half_add(node: ast.AST) -> bool:
    """True if the expression tree contains `... + 0.5` (either side)."""
    for n in ast.walk(node):
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Add):
            for side in (n.left, n.right):
                if isinstance(side, ast.Constant) and side.value == 0.5:
                    return True
    return False


def _is_rounding_call(node: ast.Call) -> bool:
    name = _call_name(node)
    if name == "round":
        return True
    if name in ("half_up", "_half_up"):
        return True
    if name == "floor" and any(_contains_half_add(a) for a in node.args):
        return True
    return False


def _int_cast_parents(tree: ast.AST) -> set[int]:
    """ids of call nodes X such that X appears as `<X>.cast("<int type>")`
    or somewhere inside the casted expression — the exact-integer exemption.
    We mark every node under the cast argument: `F.round(c*100).cast("long")`
    exempts the round; so does floor(...)+0.5 chains ending in a long cast."""
    exempt: set[int] = set()
    for n in ast.walk(tree):
        if (
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr == "cast"
            and n.args
            and isinstance(n.args[0], ast.Constant)
            and isinstance(n.args[0].value, str)
            and n.args[0].value.lower() in INT_CASTS
        ):
            for sub in ast.walk(n.func.value):
                exempt.add(id(sub))
    return exempt


@dataclass
class Binding:
    name: str  # bound column name
    line: int  # 1-based line of the rounding call
    kind: str  # 'alias' | 'withColumn'


@dataclass
class Site:
    func: str
    file: str
    binding: Binding
    agg_line: int
    agg_src: str
    justified: bool = False
    justification: str = ""


def _enclosing_bindings(tree: ast.AST) -> list[Binding]:
    """Rounded-float column bindings: rounding call inside an .alias("x")
    argument chain or a withColumn("x", <expr>) value, not int-cast."""
    exempt = _int_cast_parents(tree)
    out: list[Binding] = []

    def scan_expr(bind_name: str, expr: ast.AST, kind: str) -> None:
        for n in ast.walk(expr):
            if isinstance(n, ast.Call) and _is_rounding_call(n) and id(n) not in exempt:
                helper = _call_name(n)
                if helper in EXACT_INT_HELPERS:
                    continue
                out.append(Binding(bind_name, n.lineno, kind))
                return

    for n in ast.walk(tree):
        if not isinstance(n, ast.Call):
            continue
        f = n.func
        # <expr>.alias("name")  — scan <expr>
        if (
            isinstance(f, ast.Attribute)
            and f.attr == "alias"
            and n.args
            and isinstance(n.args[0], ast.Constant)
            and isinstance(n.args[0].value, str)
        ):
            scan_expr(n.args[0].value, f.value, "alias")
        # df.withColumn("name", <expr>)
        if (
            isinstance(f, ast.Attribute)
            and f.attr == "withColumn"
            and len(n.args) >= 2
            and isinstance(n.args[0], ast.Constant)
            and isinstance(n.args[0].value, str)
        ):
            scan_expr(n.args[0].value, n.args[1], "withColumn")
    return out


def _mentions_name(expr: ast.AST, name: str) -> bool:
    """Does the aggregate argument reference the bound column? Covers the
    bare string form F.avg("x"), F.col("x") / col("x"), and any arithmetic
    containing either (the weighted-sum case). Occurrences that sit INSIDE
    an exact-integer conversion (`_fixed("x", ...)`, `_cents`, `_intval`,
    or an int `.cast`) are exempt: quantize-then-aggregate over exact
    integers is the FIX pattern (q131), not the bug."""
    exempt: set[int] = _int_cast_parents(expr)
    for n in ast.walk(expr):
        if (
            isinstance(n, ast.Call)
            and _call_name(n) in EXACT_INT_HELPERS
        ):
            for sub in ast.walk(n):
                exempt.add(id(sub))
    for n in ast.walk(expr):
        if isinstance(n, ast.Constant) and n.value == name and id(n) not in exempt:
            return True
    return False


def _agg_consumptions(tree: ast.AST, names: set[str]) -> list[tuple[str, int, str]]:
    out = []
    for n in ast.walk(tree):
        if isinstance(n, ast.Call) and _call_name(n) in AGG_FNS:
            for nm in names:
                if any(_mentions_name(a, nm) for a in n.args):
                    out.append((nm, n.lineno, ast.unparse(n)[:90]))
    return out


# --- SQL-string shape: round(...) AS x ... avg(x)/sum(...x...) -------------

SQL_ROUND_ALIAS = re.compile(r"\bround\s*\(", re.I)


def _sql_round_aliases(sql: str) -> dict[str, int]:
    """column names aliased to a round(...) expression: `round(<bal>) AS x`.
    Balanced-paren walk so nested calls resolve; offset = char position."""
    out: dict[str, int] = {}
    for m in SQL_ROUND_ALIAS.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            continue
        tail = sql[i:]
        am = re.match(r"\s*(?:::\w+\s*)?AS\s+(\w+)", tail, re.I)
        if am:
            out[am.group(1)] = m.start()
    return out


def _sql_second_order(sql: str) -> list[tuple[str, int]]:
    """(name, offset-of-aggregate) pairs where a round-aliased column is
    later consumed by avg(/sum(/var_/stddev( in the same SQL text. CAST of
    the rounded value to BIGINT/INT before aggregation is the exact-integer
    family — handled by checking the round( is NOT wrapped in such a cast."""
    aliases = _sql_round_aliases(sql)
    out = []
    for name, off in aliases.items():
        # exact-integer exemption: `CAST(round(...` with an int target
        pre = sql[max(0, off - 24) : off]
        if re.search(r"cast\s*\(\s*$", pre, re.I):
            seg = sql[off:]
            mm = re.search(r"as\s+(bigint|int|integer|hugeint|smallint)\s*\)", seg[:400], re.I)
            if mm:
                continue
        for am in re.finditer(r"\b(avg|sum|var_samp|var_pop|variance|stddev\w*|mean)\s*\(", sql, re.I):
            depth, i = 1, am.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            arg = sql[am.end() : i - 1]
            if re.search(rf"\b{re.escape(name)}\b", arg):
                out.append((name, am.start()))
                break
    return out


# --- tag parsing ------------------------------------------------------------

TAG = re.compile(r"^\s*(#|--)\s*half-safe:\s*(.*)$")


def _tags_by_line(lines: list[str]) -> dict[int, str]:
    """1-based line -> justification text for every half-safe TAG line (a
    comment that STARTS with the tag; prose that merely mentions the token
    does not count)."""
    out = {}
    for i, ln in enumerate(lines, 1):
        m = TAG.match(ln)
        if m:
            out[i] = m.group(2).strip()
        else:
            # tag embedded after code on the same line: `x = ...  # half-safe: why`
            cm = re.search(r"#\s*half-safe:\s*(.*)$", ln)
            if cm and not ln.lstrip().startswith("#"):
                out[i] = cm.group(1).strip()
    return out


def _justify(site: Site, tags: dict[int, str]) -> None:
    for anchor in (site.binding.line, site.agg_line):
        for ln in range(anchor - WINDOW, anchor + 1):
            if ln in tags:
                site.justified = bool(tags[ln])
                site.justification = tags[ln]
                return


# --- per-function scan ------------------------------------------------------


@dataclass
class Report:
    sites: list[Site] = field(default_factory=list)
    rounding_lines: dict[str, set[int]] = field(default_factory=dict)  # file -> lines
    tag_lines: dict[str, dict[int, str]] = field(default_factory=dict)  # file -> {line: text}


def _scan_function(fname: str, fpath: str, node: ast.FunctionDef, lines: list[str], rep: Report) -> None:
    bindings = _enclosing_bindings(node)
    tags = _tags_by_line(lines)
    rep.tag_lines.setdefault(fpath, {}).update(tags)
    for n in ast.walk(node):
        if isinstance(n, ast.Call) and _is_rounding_call(n):
            rep.rounding_lines.setdefault(fpath, set()).add(n.lineno)
    if bindings:
        by_name = {b.name: b for b in bindings}
        for nm, agg_line, agg_src in _agg_consumptions(node, set(by_name)):
            site = Site(fname, fpath, by_name[nm], agg_line, agg_src)
            _justify(site, tags)
            rep.sites.append(site)
    # SQL strings inside the function (spark.sql / F.expr bodies)
    for n in ast.walk(node):
        if isinstance(n, ast.Constant) and isinstance(n.value, str) and len(n.value) > 40:
            sql = n.value
            if not SQL_ROUND_ALIAS.search(sql):
                continue
            for nm, agg_off in _sql_second_order(sql):
                line = n.lineno + sql[:agg_off].count("\n")
                site = Site(fname, fpath, Binding(nm, n.lineno, "sql"), line, f"SQL avg/sum over {nm}")
                # SQL sites may carry the tag inside the SQL (`-- half-safe:`)
                # or as a Python comment above the string
                if re.search(r"--\s*half-safe:\s*\S", sql):
                    site.justified = True
                    site.justification = "(in-SQL tag)"
                else:
                    _justify(site, tags)
                rep.sites.append(site)


def scan() -> Report:
    rep = Report()
    # entry module: only the query region (before `def oracle_sql`) — the
    # oracle region mirrors justified Spark sites verbatim by convention
    src = ENTRY.read_text()
    cut = src.find("\ndef oracle_sql(")
    region = src[:cut] if cut != -1 else src
    lines = region.splitlines()
    tree = ast.parse(region)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            _scan_function(node.name, "__spark_entry__.py", node, lines, rep)
    for f in PACKAGE_FILES:
        fsrc = f.read_text()
        flines = fsrc.splitlines()
        ftree = ast.parse(fsrc)
        for node in ftree.body:
            if isinstance(node, ast.FunctionDef):
                _scan_function(node.name, str(f.relative_to(REPO)), node, flines, rep)
    return rep


# --- stale-tag detection ----------------------------------------------------

#: any line containing one of these tokens counts as a rounding site a tag
#: can legitimately annotate (text-level, so SQL-string shapes count too)
SITE_TOKEN = re.compile(r"F\.round\(|\bround\s*\(|_?half_up\(|floor\s*\(", re.I)


def stale_tags(rep: Report) -> list[str]:
    """half-safe TAGS with no rounding site on the tag line or within
    WINDOW+4 lines BELOW it (a justification whose site was refactored away
    — q131's bug was a wrong waiver; a stale one is worse, it looks
    load-bearing while guarding nothing). The +4 slack mirrors comment
    blocks that continue past the tag line before the code starts."""
    out = []
    file_lines: dict[str, list[str]] = {}
    src = ENTRY.read_text()
    cut = src.find("\ndef oracle_sql(")
    file_lines["__spark_entry__.py"] = (src[:cut] if cut != -1 else src).splitlines()
    for f in PACKAGE_FILES:
        file_lines[str(f.relative_to(REPO))] = f.read_text().splitlines()
    for fpath, tags in rep.tag_lines.items():
        lines = file_lines.get(fpath, [])
        for ln in sorted(tags):
            lo, hi = ln - 1, min(len(lines), ln + WINDOW + 4)
            if not any(SITE_TOKEN.search(lines[i]) for i in range(lo, hi)):
                out.append(f"{fpath}:{ln}: '# half-safe: {tags[ln][:50]}' has no "
                           "rounding site within reach — stale waiver?")
    return out


def main() -> int:
    rep = scan()
    unjustified = [s for s in rep.sites if not s.justified]
    print(f"second-order sites: {len(rep.sites)} "
          f"({len(rep.sites) - len(unjustified)} justified, {len(unjustified)} NOT)")
    for s in sorted(rep.sites, key=lambda s: (s.file, s.binding.line)):
        mark = "ok " if s.justified else "FAIL"
        print(f"  [{mark}] {s.file}:{s.binding.line} {s.func}.{s.binding.name} "
              f"-> agg@{s.agg_line}: {s.agg_src}"
              + (f"  # {s.justification[:60]}" if s.justified else ""))
    n_tags = sum(len(v) for v in rep.tag_lines.values())
    print(f"half-safe tags: {n_tags}; rounding sites: "
          f"{sum(len(v) for v in rep.rounding_lines.values())}")
    stale = stale_tags(rep)
    for s in stale:
        print(f"  [STALE] {s}")
    return len(unjustified) + len(stale)


if __name__ == "__main__":
    sys.exit(main())
