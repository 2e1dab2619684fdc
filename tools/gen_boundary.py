"""Directed boundary-hunting dataset generator (round-13 verdict item 2).

The r12 ultra-sparse campaign found q352/q147/q131 by luck of the draw —
random seeds happened to produce exact rationals ON d=6/d=2 half
boundaries. This tool CONSTRUCTS such datasets deterministically, one per
estimator family caught in r12, so the fixes are re-proven on the boundary
every time instead of waiting for another lucky seed:

- ``meandiff`` (q352's class): a crafted ``events`` table with exactly 32
  users per arm (user_id % 2), every user active in both periods, and the
  arm post-period cent totals differing by an ODD number of cents — the
  raw-effect rational (C1·n0 − C0·n1)/(100·n1·n0) then satisfies
  E·1e6 ≡ ±312.5·|ΔC| (mod 1 = 1/2), the exact d=6 half boundary seed
  454647 hit (negative ΔC on purpose: the half-UP negative-boundary
  convention is exercised, -50.5853125's shape).
- ``interp`` (q147's class): purchase days crafted so one unreliable day
  (n < 3) sits between reliable anchors two days apart whose cent values
  differ by an odd number — the interpolated rational N/D lands exactly on
  a half CENT (seed 515253's 110846.5).
- ``gridavg`` (q131's class): the ``embeddings`` table patched so one
  label contains exactly two vectors whose integer micro-unit
  reconstruction errors are {0, 1} — avg = 0.5 micro-units, exactly the
  d=6 boundary of the 1e-6 grid that seed 909192 reached.
- ``poststrat`` (the weighted-stratum class — q352's post_stratified arm,
  the q232 quantize-to-grid-then-exact pattern "one level deeper" than
  meandiff): 47 arm users in 5 pre-sum clusters sized [10,9,9,9,10]
  (cluster gaps ~1000× the intra-cluster spread so both engines'
  percentile cuts interpolate inside the gaps and strata are
  convention-proof), three (7,2)-split odd strata (a single one provably
  cannot reach the boundary — see the builder's residue analysis), one
  user's post cents scanned until the weighted sum T = Σ(dq_s·N_s) of
  the replicated 1e-7-grid quantized diffs satisfies T ≡ 5M (mod 10M) —
  the exact d=6 half boundary of effect = T/(10^7·M).

Every construction is ASSERTED on-boundary with exact ``fractions``
arithmetic over the same integer quantities the engines derive (cents via
round(value·100), micro-units via the replicated float32→double fold), so
a generator drift that misses the boundary fails loudly instead of
silently testing nothing.  A second, independent REACHABILITY assertion
then runs the family query's committed DuckDB oracle on the built dataset
and requires the predicted on-boundary display value in the output row —
so the differential cannot be vacuously green (e.g. the crafted day
filtered out, the crafted label renumbered): the boundary must actually
flow through the display branch under test.

Usage::

    python tools/gen_boundary.py [family ...] [--seed N] [--keep]

families default to all four; each builds a gen_reseed base twin in
.scratch/boundary-<family>-<seed>, replaces/patches the target table,
asserts the boundary, runs the FULL check_oracle differential on it, and
deletes the twin (``--keep`` preserves it). Exit code = total failures.
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import sys
from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ETYPES = ["click", "error", "purchase", "signup", "view"]
EV_LO = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
CUT_US = np.datetime64("2024-01-16").astype("datetime64[us]").astype(np.int64)
EV_HI = np.datetime64("2024-01-31T23:59:59").astype("datetime64[us]").astype(np.int64)
US_DAY = 86_400 * 10**6


def _write_events(out: str, rows: list[tuple[int, int, str, int, int]]) -> None:
    """rows = (ts_us, user_id, event_type, cents, props_k); sorted by ts,
    event_id assigned sequentially, value = cents/100 at 2 decimals —
    exactly the corpus contract gen_reseed writes."""
    rows = sorted(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array(
                    [round(r[3] / 100.0, 2) for r in rows], pa.float64()
                ),
                "props": pa.array(['{"k": %d}' % r[4] for r in rows]),
            }
        ),
        f"{out}/events.parquet",
    )


def build_meandiff(out: str, rng: np.random.Generator) -> dict:
    """q352 family: raw A/B money-mean difference exactly ON a d=6 half
    boundary. 32 users per arm (ids 0..63), each with pre- AND post-period
    events; background users are strictly single-period so the q352 filter
    (both periods non-null) excludes them from the arms."""
    rows: list[tuple[int, int, str, int, int]] = []
    post_cents: dict[int, int] = {}
    for u in range(64):
        # 1-3 pre events, varied cents (CUPED covariate variance > 0)
        for _ in range(int(rng.integers(1, 4))):
            ts = int(rng.integers(EV_LO, CUT_US - 1))
            rows.append((ts, u, ETYPES[int(rng.integers(0, 5))],
                         int(rng.integers(500, 15000)), int(rng.integers(0, 100))))
        # 1-2 post events around $200, exact cents recorded
        tot = 0
        for _ in range(int(rng.integers(1, 3))):
            ts = int(rng.integers(CUT_US, EV_HI))
            c = int(rng.integers(15000, 25000))
            tot += c
            rows.append((ts, u, ETYPES[int(rng.integers(0, 5))], c,
                         int(rng.integers(0, 100))))
        post_cents[u] = tot
    # background: users 64..106 pre-only, 107..149 post-only (~5k events)
    for _ in range(5000):
        if rng.random() < 0.5:
            u = int(rng.integers(64, 107))
            ts = int(rng.integers(EV_LO, CUT_US - 1))
        else:
            u = int(rng.integers(107, 150))
            ts = int(rng.integers(CUT_US, EV_HI))
        rows.append((ts, u, ETYPES[int(rng.integers(0, 5))],
                     int(rng.integers(1, 49002)), int(rng.integers(0, 100))))

    # land the boundary: with n1 = n0 = 32 (2-adic valuation 5 = that of
    # 2e4), E*1e6 = 1e4*dC/32 = 312.5*dC is half-integral iff dC is odd.
    c1 = sum(v for u, v in post_cents.items() if u % 2 == 1)
    c0 = sum(v for u, v in post_cents.items() if u % 2 == 0)
    if (c1 - c0) % 2 == 0:
        # nudge user 1's first post event by one cent (stay in domain)
        for i, r in enumerate(rows):
            if r[1] == 1 and r[0] >= CUT_US:
                rows[i] = (r[0], r[1], r[2], r[3] - 1, r[4])
                c1 -= 1
                break
    # prefer a NEGATIVE boundary (the r12 catch was -50.5853125): flip by
    # construction check only — sign does not affect the assertion
    n1 = n0 = 32
    effect = Fraction(c1 * n0 - c0 * n1, 100 * n1 * n0)
    frac = (effect * 10**6) - math.floor(effect * 10**6)
    assert frac == Fraction(1, 2), (
        f"meandiff construction missed the boundary: E={effect} "
        f"E*1e6 frac={frac}"
    )
    _write_events(out, rows)
    print(f"  meandiff: E = {effect} = {float(effect):.7f} "
          f"(E*1e6 ends in exact .5), n1=n0=32, dC={c1 - c0}")
    # predicted display, replicating _half_up's IEEE double sequence
    # (exact here: num*1e6 < 2^53 and the quotient is representable)
    disp = math.floor(float(c1 * n0 - c0 * n1) * 1e6 / (100 * n1 * n0) + 0.5) / 1e6
    return {
        "query": "q352_variance_reduction_methods",
        "where": "method = 'raw'",
        "checks": {"effect": disp},
    }


def build_poststrat(out: str, rng: np.random.Generator) -> dict:
    """Weighted-stratum class (q352's post_stratified arm, q232 pattern):
    the weighted mean of 1e-7-grid quantized per-stratum money-mean diffs
    lands exactly ON the d=6 half boundary.

    Construction (the residue analysis is load-bearing — see inline):
    47 arm users in 5 pre-sum clusters sized [10, 9, 9, 9, 10], so the
    percentile cut positions 0.2/0.4/0.6/0.8 * 46 = 9.2/18.4/27.6/36.8
    interpolate strictly INSIDE the inter-cluster gaps (between sorted
    indices (9,10)/(18,19)/(27,28)/(36,37)) under any linear convention —
    stratum membership is engine-proof. Arm splits: (5,5) for the 10-user
    strata, (7,2) for the three 9-user strata.

    Why THREE odd strata: the target is T = Sigma(dq_s*N_s) = 5M
    (mod 10M) with M = 47, so T = 5 (mod 10). (5,5) strata contribute
    dq = 20000*dC (= 0 mod 10, exact); a (7,2) stratum's
    dq = floor(num*1e7/1400 + 0.5) has dq mod 10 determined by
    num mod 7 alone — structurally confined to {0,1,3,4,6,7,9}; 5 is
    UNREACHABLE for any single odd stratum no matter the draw (the first
    two drafts of this builder failed their own assertions exactly
    there). Sums of three values from that set cover all of Z10
    (1+3+1 = 5), so three N=9 strata make the boundary reachable; one
    stratum's arm-1 cents are then scanned (its dq walks all of num
    mod 7, i.e. the full 7-set, while the 7-cycle drift of
    9e5 = 420 mod 470 with gcd(420,470) = 10 covers every multiple of
    10 within the class), with the other two odd strata redrawn until
    the required residue class is compatible.

    Post cents are balanced so |T| stays far below 2^53/1e6: the display
    floor(cast(T as double)*1e6/(1e7*M) + 0.5) is then EXACT double
    arithmetic and the constructed half boundary genuinely reaches the
    display (asserted on the replicated float sequence, not just the
    rational)."""
    sizes = [10, 9, 9, 9, 10]
    splits = [(5, 5), (7, 2), (7, 2), (7, 2), (5, 5)]
    m_users = sum(sizes)  # 47
    # id allocation below the background floor (64), parity-exact: the
    # (7,2) strata need 7 odd ids each -> 14-wide base ranges
    bases = {1: (0, 14), 2: (14, 14), 3: (28, 14), 0: (42, 10), 4: (52, 10)}
    strata_ids = []
    for k, (n1, n0) in enumerate(splits):
        base, width = bases[k]
        odds = [base + i for i in range(1, width + 1, 2)][:n1]
        evens = [base + i for i in range(2, width + 1, 2)][:n0]
        assert len(odds) == n1 and len(evens) == n0 and max(odds + evens) < 64
        strata_ids.append((odds, evens))

    rows: list[tuple[int, int, str, int, int]] = []
    pre_cents: dict[int, int] = {}
    post_cents: dict[int, int] = {}

    def draw_post(k: int) -> None:
        # post cents: arm-1 free draws; arm-0 balanced so the stratum num
        # (C1*n0 - C0*n1) stays small -> |T| << 2^53/1e6 (exact display)
        n1, n0 = splits[k]
        odds, evens = strata_ids[k]
        c1 = 0
        for u in odds:
            c = int(rng.integers(15000, 25000))
            post_cents[u] = c
            c1 += c
        target_c0 = round(c1 * n0 / n1) + int(rng.integers(-50, 51))
        share = target_c0 // n0
        for i, u in enumerate(evens):
            post_cents[u] = share + (target_c0 - share * n0 if i == n0 - 1 else 0)

    for k, (odds, evens) in enumerate(strata_ids):
        for u in odds + evens:
            pc = 100_000 * (k + 1) + u  # distinct, clustered by stratum
            pre_cents[u] = pc
            ts = int(rng.integers(EV_LO, CUT_US - 1))
            rows.append((ts, u, ETYPES[int(rng.integers(0, 5))], pc,
                         int(rng.integers(0, 100))))
        draw_post(k)
    # background single-period users (excluded by the both-periods filter)
    for _ in range(5000):
        if rng.random() < 0.5:
            u = int(rng.integers(64, 107))
            ts = int(rng.integers(EV_LO, CUT_US - 1))
        else:
            u = int(rng.integers(107, 150))
            ts = int(rng.integers(CUT_US, EV_HI))
        rows.append((ts, u, ETYPES[int(rng.integers(0, 5))],
                     int(rng.integers(1, 49002)), int(rng.integers(0, 100))))

    def dq(k: int) -> int:
        # identical IEEE sequence to the engine expression:
        # floor(cast(C1*n0 - C0*n1 as double) * 1e7 / (100*n1*n0) + 0.5)
        n1, n0 = splits[k]
        odds, evens = strata_ids[k]
        c1 = sum(post_cents[u] for u in odds)
        c0 = sum(post_cents[u] for u in evens)
        return math.floor(
            float(c1 * n0 - c0 * n1) * 1e7 / float(100 * n1 * n0) + 0.5
        )

    def weighted_T() -> int:
        return sum(dq(k) * sum(splits[k]) for k in range(5))

    tweak_user = strata_ids[1][0][0]  # odd id in the first (7,2) stratum
    found = False
    for _attempt in range(60):
        base_c = post_cents[tweak_user]
        for delta in range(7 * 10 * m_users):
            post_cents[tweak_user] = base_c + delta
            if weighted_T() % (10 * m_users) == 5 * m_users:
                found = True
                break
        if found:
            break
        post_cents[tweak_user] = base_c
        draw_post(2)  # shift the other odd strata's residue class, retry
        draw_post(3)
    if not found:
        raise AssertionError("poststrat scan failed to land the boundary")
    # post events appended only now, with the final scanned cents
    for k, (odds, evens) in enumerate(strata_ids):
        for u in odds + evens:
            ts = int(rng.integers(CUT_US, EV_HI))
            rows.append((ts, u, ETYPES[int(rng.integers(0, 5))],
                         post_cents[u], int(rng.integers(0, 100))))

    t_final = weighted_T()
    eff = Fraction(t_final, 10**7 * m_users)
    assert (eff * 10**6) - math.floor(eff * 10**6) == Fraction(1, 2), (
        f"poststrat construction missed the boundary: T={t_final}"
    )
    # the boundary must survive the engines' double display path exactly:
    x = float(t_final) * 1e6 / float(10**7 * m_users)
    assert abs(t_final) * 10**6 < 2**53 and x - math.floor(x) == 0.5, (
        f"display double path off the half point: x={x!r}"
    )
    # percentile cuts must interpolate inside the inter-cluster gaps
    xs = sorted(pre_cents.values())
    for lo in (9, 18, 27, 36):
        assert xs[lo + 1] - xs[lo] > 90_000, (
            f"cluster gap collapsed at sorted index {lo}"
        )
    _write_events(out, rows)
    disp = math.floor(x + 0.5) / 1e6
    print(f"  poststrat: T = {t_final} = 5M mod 10M (M={m_users}), "
          f"effect display {disp} (d=6 half boundary)")
    return {
        "query": "q352_variance_reduction_methods",
        "where": "method = 'post_stratified'",
        "checks": {"effect": disp},
    }


def build_interp(out: str, rng: np.random.Generator) -> dict:
    """q147 family: the gap-filled day's interpolated cents N/D lands on an
    exact half cent. Purchases fully controlled per day; day index 14
    (Jan 15) has ONE purchase (unreliable, n<3), days 13/15 are >=3-row
    anchors whose cent totals differ by an odd number."""
    rows: list[tuple[int, int, str, int, int]] = []
    day_cents: dict[int, int] = {}
    for d in range(31):
        n_p = 1 if d == 14 else int(rng.integers(3, 9))
        tot = 0
        for _ in range(n_p):
            ts = int(EV_LO + d * US_DAY + rng.integers(0, US_DAY))
            c = int(rng.integers(100, 49002))
            tot += c
            rows.append((ts, int(rng.integers(0, 150)), "purchase", c,
                         int(rng.integers(0, 100))))
        day_cents[d] = tot
    # non-purchase filler for the rest of the surface
    nonp = [t for t in ETYPES if t != "purchase"]
    for _ in range(5000):
        ts = int(rng.integers(EV_LO, EV_HI))
        rows.append((ts, int(rng.integers(0, 150)), nonp[int(rng.integers(0, 4))],
                     int(rng.integers(1, 49002)), int(rng.integers(0, 100))))

    pv, nv = day_cents[13], day_cents[15]
    if (nv - pv) % 2 == 0:
        # shift one cent on a day-15 purchase to make the anchor delta odd
        for i, r in enumerate(rows):
            if r[2] == "purchase" and EV_LO + 15 * US_DAY <= r[0] < EV_LO + 16 * US_DAY:
                rows[i] = (r[0], r[1], r[2], r[3] + 1, r[4])
                nv += 1
                break
    num, den = pv * 2 + (nv - pv) * 1, 2  # N = pv*D + (nv-pv)*(d-pd), D = 2
    cents = Fraction(num, den)
    assert cents - math.floor(cents) == Fraction(1, 2), (
        f"interp construction missed the half-cent: N/D={cents}"
    )
    # and the d=2 dollars display boundary: value*1e2 is that same rational
    dollars_1e2 = Fraction(num, 100 * den) * 100
    assert dollars_1e2 - math.floor(dollars_1e2) == Fraction(1, 2)
    _write_events(out, rows)
    print(f"  interp: filled day cents N/D = {cents} (exact half cent), "
          f"anchors {pv} -> {nv} over gap 2")
    disp = math.floor(float(num) * 1e2 / (100 * den) + 0.5) / 1e2
    return {
        "query": "q147_interpolate_gaps",
        "where": "day = '2024-01-15'",
        "checks": {"filled": True, "value_filled": disp},
    }


def build_gridavg(out: str, rng: np.random.Generator) -> dict:
    """q131 family: one label with exactly two vectors whose integer
    micro-unit reconstruction errors are {0, 1} -> avg exactly 0.5
    micro-units (the 1e-6 grid's half point). The micro-units are computed
    here by REPLICATING the engine pipeline (float32 storage, double
    fold in subvector order, floor(d2*1e6 + 0.5) per subspace, argmin
    with code tiebreak) — asserted, not assumed."""
    tbl = pq.read_table(f"{out}/embeddings.parquet")
    vecs = np.array([np.array(v, dtype=np.float32) for v in tbl["embedding"].to_pylist()])
    labels = np.array(tbl["label"].to_pylist(), dtype=np.int32)
    dim, n_sub, n_codes = vecs.shape[1], 4, 4
    sub = dim // n_sub

    target = 7
    labels[labels == target] = 6  # clear the label, then claim it
    vecs[100] = vecs[0]  # exact float32 copy -> e = 0
    shifted = vecs[0].copy()
    shifted[0] = np.float32(shifted[0] + np.float32(2.0**-10))  # ~2^-20 sq dist
    vecs[101] = shifted
    labels[100] = labels[101] = target

    def micro_err(v: np.ndarray) -> int:
        e = 0
        for s in range(n_sub):
            sv = v[s * sub : (s + 1) * sub].astype(np.float64)
            best = None
            for code in range(n_codes):
                cv = vecs[code][s * sub : (s + 1) * sub].astype(np.float64)
                acc = 0.0
                for a, b in zip(sv, cv):  # left fold, engine order
                    acc = acc + (a - b) * (a - b)
                k = int(math.floor(acc * 1e6 + 0.5))
                if best is None or (k, code) < best:
                    best = (k, code)
            e += best[0]
        return e

    e100, e101 = micro_err(vecs[100]), micro_err(vecs[101])
    n = int((labels == target).sum())
    mean = Fraction(e100 + e101, n)
    assert n == 2 and mean - math.floor(mean) == Fraction(1, 2), (
        f"gridavg construction missed the boundary: e={e100},{e101} n={n}"
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": tbl["vec_id"],
                "embedding": pa.array(
                    [v for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"  gridavg: label {target} micro-unit errors {{{e100}, {e101}}}, "
          f"avg = {mean} (exact 1e-6 grid half point)")
    disp = math.floor(float(e100 + e101) / n + 0.5) / 1e6
    return {
        "query": "q131_pq_recon_error",
        "where": f"label = {target}",
        "checks": {"n_vecs": n, "avg_recon_err": disp},
    }


#: fixed per-family rng offsets (NOT hash(): string hashing is per-process
#: randomized and would break reproducibility)
BUILDERS = {
    "meandiff": (1, build_meandiff),
    "interp": (2, build_interp),
    "gridavg": (3, build_gridavg),
    "poststrat": (4, build_poststrat),
}


def _assert_reachable(out: str, spec: dict) -> None:
    """Run the family query's committed DuckDB oracle on the built dataset
    and require the predicted on-boundary display value in the selected
    row — proof the boundary flows through the display branch under test
    rather than being filtered/renumbered away (which would leave the
    differential vacuously green)."""
    import duckdb  # noqa: PLC0415 - keep --gen-only import-light

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod  # noqa: PLC0415

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
        )
    sql = entry_mod.oracle_sql()[spec["query"]]
    rows = con.sql(
        f"SELECT * FROM ({sql}) WHERE {spec['where']}"
    ).fetchdf().to_dict("records")
    assert len(rows) == 1, (
        f"reachability: {spec['query']} WHERE {spec['where']} returned "
        f"{len(rows)} rows (want exactly 1)"
    )
    row = rows[0]
    for col, want in spec["checks"].items():
        got = row[col]
        ok = bool(got) == want if isinstance(want, bool) else float(got) == want
        assert ok, (
            f"reachability: {spec['query']}[{spec['where']}].{col} = {got!r}, "
            f"predicted on-boundary display {want!r} — the crafted boundary "
            f"did not reach the display branch"
        )
    print(f"  reachability OK: {spec['query']} [{spec['where']}] "
          + ", ".join(f"{c}={v}" for c, v in spec["checks"].items()))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seed = 131313
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
        args = [a for a in args if a != str(seed)]
    keep = "--keep" in sys.argv
    fams = args or list(BUILDERS)
    total_fail = 0
    for fam in fams:
        out = f".scratch/boundary-{fam}-{seed}"
        print(f"=== {fam} -> {out}")
        subprocess.run(
            [sys.executable, f"{TOOLS}/gen_reseed.py", out, str(seed), "1.0"],
            check=True, capture_output=True, cwd=REPO,
        )
        off, builder = BUILDERS[fam]
        spec = builder(out, np.random.default_rng(seed + off))
        if "--gen-only" in sys.argv:
            continue
        _assert_reachable(out, spec)
        proc = subprocess.run(
            [sys.executable, f"{TOOLS}/check_oracle.py", out],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = proc.stdout.splitlines()
        ok = sum(1 for ln in lines if ln.startswith("OK "))
        tol = sum(1 for ln in lines if ln.startswith("OK~"))
        fails = [ln for ln in lines if ln.startswith(("FAIL", "ERR"))]
        print(f"{fam}: ok={ok} tolerance={tol} fail={len(fails)}")
        for ln in fails[:10]:
            print("   " + ln)
        total_fail += len(fails)
        if not keep:
            shutil.rmtree(out, ignore_errors=True)
    print(f"boundary campaign: {total_fail} failures across {len(fams)} datasets")
    return total_fail


if __name__ == "__main__":
    raise SystemExit(main())
