"""Unit coverage for tools/gen_boundary.py — the directed boundary-dataset
generator (r12 verdict item 2). The full campaign (gen → reachability →
full differential) is a round-close tool; these tests pin the cheap parts
so generator bit-rot fails here instead of mid-campaign:

- each builder's construction really lands ON its half boundary (the
  builders assert this themselves — the tests prove the assertion is
  reachable and seed-robust, not just true for the canonical seed),
- the events tables keep the corpus contract (columns, value = cents/100
  at 2 decimals, event_id dense over ts order),
- the nudge branches (even→odd cent adjustments) actually fire on seeds
  where the raw draw misses the boundary.
"""

from __future__ import annotations

import sys
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import gen_boundary as gb  # noqa: E402


def _events_contract(path: pathlib.Path) -> pa.Table:
    t = pq.read_table(path)
    assert t.column_names == ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ids = t["event_id"].to_numpy()
    assert (ids == np.arange(len(ids))).all(), "event_id must be dense in ts order"
    ts = t["ts"].to_numpy()
    assert (ts[:-1] <= ts[1:]).all(), "rows must be ts-sorted"
    vals = t["value"].to_numpy()
    assert np.allclose(vals, np.round(vals, 2)), "value must be 2-decimal money"
    return t


@pytest.mark.parametrize("seed", [131314, 131315, 131316, 900001])
def test_meandiff_boundary_across_seeds(tmp_path, seed):
    spec = gb.build_meandiff(str(tmp_path), np.random.default_rng(seed))
    _events_contract(tmp_path / "events.parquet")
    assert spec["query"] == "q352_variance_reduction_methods"
    # the predicted display is a d=6 half-up of an exact .5 boundary:
    # its last (6th) decimal digit must be odd+? — concretely, disp*1e6
    # is an integer that is floor(X.5)+1 = X+1 for integer X
    assert spec["checks"]["effect"] == round(spec["checks"]["effect"], 6)


@pytest.mark.parametrize("seed", [131314, 131315, 900001])
def test_interp_boundary_across_seeds(tmp_path, seed):
    spec = gb.build_interp(str(tmp_path), np.random.default_rng(seed))
    t = _events_contract(tmp_path / "events.parquet")
    assert spec["query"] == "q147_interpolate_gaps"
    assert spec["checks"]["filled"] is True
    # the crafted unreliable day (Jan 15) must hold exactly ONE purchase
    day15_lo = gb.EV_LO + 14 * gb.US_DAY
    ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    et = np.array(t["event_type"].to_pylist())
    n15 = int(((ts >= day15_lo) & (ts < day15_lo + gb.US_DAY) & (et == "purchase")).sum())
    assert n15 == 1


def test_gridavg_boundary_on_synthetic_embeddings(tmp_path):
    # synthesize an embeddings table in the corpus shape (float32 vectors,
    # int32 labels) — the builder patches it in place and must land the
    # exact 0.5-micro-unit average on label 7 with exactly two vectors
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(120), pa.int64()),
                "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, 120), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    spec = gb.build_gridavg(str(tmp_path), np.random.default_rng(3))
    assert spec["query"] == "q131_pq_recon_error"
    assert spec["checks"]["n_vecs"] == 2
    assert spec["checks"]["avg_recon_err"] == 1e-6  # floor(0.5+0.5)/1e6
    out = pq.read_table(tmp_path / "embeddings.parquet")
    labels = np.array(out["label"].to_pylist())
    assert (labels == 7).sum() == 2
    emb = out["embedding"].to_pylist()
    assert np.array_equal(np.array(emb[100], np.float32), np.array(emb[0], np.float32))


@pytest.mark.parametrize("seed", [131317, 131318, 900002])
def test_poststrat_boundary_across_seeds(tmp_path, seed):
    spec = gb.build_poststrat(str(tmp_path), np.random.default_rng(seed))
    t = _events_contract(tmp_path / "events.parquet")
    assert spec["query"] == "q352_variance_reduction_methods"
    assert spec["where"] == "method = 'post_stratified'"
    # the predicted display must sit at an exact .5-of-1e-6 rounding: the
    # builder asserts the double path internally; re-derive the invariant
    # from the spec alone — effect*1e6 must be an integer (the half-up of
    # an exact half boundary)
    eff = spec["checks"]["effect"]
    assert eff == round(eff, 6)
    # arm users: 47 ids below 64, strata clusters intact in the data
    users = sorted(set(u for u in t["user_id"].to_pylist() if u < 64))
    assert len(users) == 47


def test_meandiff_nudge_branch_fires(tmp_path):
    """At least one seed in a small scan must need the even→odd cent
    nudge, proving the fallback path is live (a dead nudge branch would
    mean half of all seeds silently miss the boundary)."""
    fired = 0
    for seed in range(131314, 131334):
        out = tmp_path / str(seed)
        out.mkdir()
        rng = np.random.default_rng(seed)
        gb.build_meandiff(str(out), rng)
        # reconstruct whether the draw itself was even (nudge fired):
        # replay the draw with the same rng sequence
        rng2 = np.random.default_rng(seed)
        post = {}
        for u in range(64):
            for _ in range(int(rng2.integers(1, 4))):
                rng2.integers(gb.EV_LO, gb.CUT_US - 1)
                rng2.integers(0, 5)
                rng2.integers(500, 15000)
                rng2.integers(0, 100)
            tot = 0
            for _ in range(int(rng2.integers(1, 3))):
                rng2.integers(gb.CUT_US, gb.EV_HI)
                tot += int(rng2.integers(15000, 25000))
                rng2.integers(0, 5)
                rng2.integers(0, 100)
            post[u] = tot
        c1 = sum(v for u, v in post.items() if u % 2 == 1)
        c0 = sum(v for u, v in post.items() if u % 2 == 0)
        if (c1 - c0) % 2 == 0:
            fired += 1
    assert fired > 0, "no seed in the scan exercised the nudge branch"
