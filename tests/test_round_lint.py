"""Lint gate for the engine-divergent rounding class (round-9 closure).

``round(double, d)`` of a value that is an exact integer ratio C/n (money
averages, count averages, indicator rates, fixed-grid means) can sit exactly
on a half boundary, where Spark (BigDecimal over the shortest decimal repr)
and DuckDB (scaled-binary) round the SAME double differently — the class the
multi-seed differential kept finding one site at a time (q148 commit 5af76d2,
q129/q183/q99 before it).

Round 9 swept every ``F.round(F.avg(...))``-shaped site: integer-ratio
sources were converted to the exact half-up form (``_half_up`` /
``floor(C * 10^d / n + 0.5)``, which evaluates the identical IEEE sequence
on both engines), and irrational/heterogeneous-rational sources carry a
``# half-safe:`` comment stating why their value cannot sit on a half
boundary. This test freezes that invariant: any NEW round-of-avg site must
either use the exact pattern (and thus not match the shape) or carry the
justification within the preceding comment block.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
FILES = [
    REPO / "__spark_entry__.py",
    *sorted((REPO / "hubverse_transform_spark").rglob("*.py")),
]

# the risky shapes: a direct round() of a float average OR variance
# (whitespace/newlines between the tokens included) — both aggregates have
# engine- and order-dependent streaming merges, so grid-valued inputs need
# the exact-moment + floor-half-up conversion (round-9 variance sweep:
# q41/q258/q282/q329). stddev is excluded: sqrt output is irrational, so a
# d-boundary hit has measure zero. The exact conversions use
# _half_up/half_up over explicit moments and therefore never match.
PAT = re.compile(r"F\.round\(\s*F\.(?:avg|var_samp|var_pop)\(")

# the SAME shape spelled in SQL text (spark.sql / F.expr strings) — the
# Python pattern cannot see it, which is exactly how q59/q73's money
# averages survived the round-9 sweep until the sparse-seed campaign bit
# them (seed 577215: 1034.725 -> 1034.73 vs 1034.72). Scanned only in the
# QUERY region of __spark_entry__.py (before `def oracle_sql`): the oracle
# region legitimately contains round(avg(...)) as the verbatim mirror of
# half-safe Spark sites, and both engines then round the same double.
SQL_PAT = re.compile(r"round\s*\(\s*avg\s*\(|round\s*\(\s*var_samp\s*\(|round\s*\(\s*var_pop\s*\(", re.I)

# a justification must sit on the match line or within this many lines above
WINDOW = 8

# SQL-text sites inside comments/strings in the SQL itself can't carry a
# Python comment; the SQL comment form `-- half-safe:` also counts
JUSTIFIERS = ("# half-safe:", "-- half-safe:")


def _query_region(src: str, path) -> str:
    """For __spark_entry__.py, the part before oracle_sql() (see SQL_PAT
    note); other files are scanned whole."""
    if path.name == "__spark_entry__.py":
        cut = src.find("\ndef oracle_sql(")
        if cut != -1:
            return src[:cut]
    return src


def _offenders() -> list[str]:
    out = []
    for f in FILES:
        full = f.read_text()
        region = _query_region(full, f)
        lines = region.splitlines()
        for pat in (PAT, SQL_PAT):
            for m in pat.finditer(region):
                ln = region.count("\n", 0, m.start())  # 0-based
                ctx = "\n".join(lines[max(0, ln - WINDOW) : ln + 1])
                if not any(j in ctx for j in JUSTIFIERS):
                    out.append(f"{f.relative_to(REPO)}:{ln + 1}")
    return sorted(set(out))


def test_round_of_avg_sites_are_exact_or_justified():
    offenders = _offenders()
    assert not offenders, (
        "F.round(F.avg(...)) without a '# half-safe:' justification. "
        "If the averaged value is an exact integer ratio (money cents, "
        "counts, indicators, fixed-grid values), convert to the "
        "engine-stable half-up pattern (_half_up in __spark_entry__.py, "
        "mirrored as floor(CAST(C AS DOUBLE) * 1e<d> / n + 0.5) / 1e<d> in "
        "the oracle SQL). Otherwise add a '# half-safe: <why no half "
        "boundary is reachable>' comment directly above the site. "
        "Offenders: " + ", ".join(offenders)
    )


def test_lint_catches_an_unjustified_site(tmp_path):
    """The gate itself must fire on the shape it guards (no silent pass)."""
    sample = 'x = F.round(F.avg("col"), 6).alias("a")\n'
    assert PAT.search(sample) is not None
    annotated = '# half-safe: irrational source\nx = F.round(\n    F.avg("col"), 6)\n'
    m = PAT.search(annotated)
    assert m is not None  # multi-line shape still matches the pattern
    lines = annotated.splitlines()
    ln = annotated.count("\n", 0, m.start())
    ctx = "\n".join(lines[max(0, ln - WINDOW) : ln + 1])
    assert "# half-safe:" in ctx


def test_lint_catches_the_sql_text_shape():
    """The round-10 extension: round(avg(...)) spelled inside SQL strings
    (how q59/q73 escaped the Python-shape sweep) must match, with either
    comment dialect accepted as justification, and the oracle region of
    __spark_entry__.py excluded."""
    assert SQL_PAT.search("SELECT round(avg(p_retailprice), 2) FROM part")
    assert SQL_PAT.search("ROUND( VAR_POP( x ), 6)")
    assert not SQL_PAT.search("floor(CAST(sum(c) AS DOUBLE) * 1e2 / n + 0.5)")
    sql_annotated = "-- half-safe: irrational source\nround(avg(x), 6)"
    assert any(j in sql_annotated for j in JUSTIFIERS)
    # region cut: text after `def oracle_sql(` is not scanned
    import pathlib

    fake = "round(avg(a),2)\ndef oracle_sql():\n    round(avg(b),2)\n"
    region = _query_region(fake, pathlib.Path("__spark_entry__.py"))
    assert "avg(a)" in region and "avg(b)" not in region
