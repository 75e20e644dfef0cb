"""r13 continuation-wave queries: brute-force equivalence for the
spatial radius join, closure checks for the triangle census, SCD2
history invariants, and hand-computable interpolation cases."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from codex_africanus_spark.queries import registry
from codex_africanus_spark.sources import tpch_ms


def test_uv_radius_join_equals_brute_force(spark, sf_dir):
    """The grid + 3x3 neighbor-cell method must equal the O(n^2)
    definition exactly — pair set AND quantized distances. This is the
    method-independence check the oracle (a grid replay) cannot
    provide."""
    from codex_africanus_spark.queries.msops import (
        _UVR_MOD,
        _UVR_R2Q,
    )

    got = {
        (r.id_a, r.id_b): r.dist2_q
        for r in registry()["uv_radius_neighbor_pairs"].fn(spark, sf_dir).collect()
    }
    pts = (
        tpch_ms.vis_table(spark, sf_dir)
        .filter(F.col("row_id") % _UVR_MOD == 0)
        .select("row_id", "u", "v")
        .toPandas()
    )
    want = {}
    arr = pts.to_numpy()
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            a, b = arr[i], arr[j]
            lo, hi = (a, b) if a[0] < b[0] else (b, a)
            d2q = round(((a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2) * 100)
            if d2q <= _UVR_R2Q:
                want[(int(lo[0]), int(hi[0]))] = int(d2q)
    assert got == want and len(got) > 0


def test_triangle_census_closure_brute_force(spark, sf_dir):
    """Histogram must match a set-based recomputation from the same
    edge list: triangles = wedges whose closing edge exists."""
    from codex_africanus_spark.operators import similarity as sim
    from codex_africanus_spark.sources.tables import load

    emb = load(spark, "embeddings", sf_dir)
    edges = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs(emb, threshold=0.35)
        .select("id_a", "id_b")
        .collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_count = dict.fromkeys(adj, 0)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c canonical
                for v in (a, b, c):
                    tri_count[v] += 1
    want = {}
    for v, t in tri_count.items():
        want[t] = want.get(t, 0) + 1
    got = {
        r.n_tri: r.n_nodes
        for r in registry()["near_dup_triangle_census"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_scd2_history_invariants(spark, sf_dir):
    """Per user: versions are 1..K contiguous, effective ranges are
    adjacent and non-overlapping (to_day = next from_day - 1; last
    to_day = user's last active day), consecutive versions change
    status, and event counts reconcile with the raw stream."""
    out = (
        registry()["user_status_scd2_history"].fn(spark, sf_dir).toPandas()
    )
    assert len(out) > 0
    ev = (
        tpch_ms.events_table(spark, sf_dir)
        .filter(F.col("user_id") % 10 == 0)
        .toPandas()
    )
    raw_counts = ev.groupby("user_id").size()
    for uid, grp in out.groupby("user_id"):
        grp = grp.sort_values("version").reset_index(drop=True)
        assert list(grp.version) == list(range(1, len(grp) + 1)), uid
        assert (grp.to_day >= grp.from_day).all(), uid
        for i in range(len(grp) - 1):
            assert grp.to_day[i] == grp.from_day[i + 1] - 1, uid
            assert grp.status[i] != grp.status[i + 1], uid
        assert grp.n_events.sum() == raw_counts[uid], uid
        last_day = int(ev[ev.user_id == uid].ts_us.max() // 86_400_000_000)
        assert int(grp.to_day.iloc[-1]) == last_day, uid


def test_interp_resample_hand_case(spark):
    """Crafted corpus: type 'a' has hours 0 (100c) and 4 (500c) with a
    3-hour gap — interpolants 200/300/400c, sum 900; negative slope
    checks the truncate-toward-zero DIV on both engines via the
    registered oracle's own idiom (value follows type 'b': 500c at h0,
    100c at h3 -> interpolants 367, 234 by truncation)."""
    import duckdb

    H = 3_600_000_000
    rows = [
        (1, 0 * H + 5, 10, "a", 1.00),
        (2, 4 * H + 5, 10, "a", 5.00),
        (3, 0 * H + 5, 11, "b", 5.00),
        (4, 3 * H + 5, 11, "b", 1.00),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "value"]
    )
    # drive the registered query's ORACLE on the crafted corpus (the
    # engine side's equality to the oracle is covered by the four-scale
    # rehearsal; this pins the shared semantics to hand-computed values)
    con = duckdb.connect()
    con.register("events_pdf", pdf)
    con.execute(
        "CREATE VIEW events AS SELECT event_id, "
        "make_timestamp(ts_us) AS ts, user_id, event_type, value "
        "FROM events_pdf"
    )
    want = con.execute(
        registry()["events_hourly_interp_resample"].oracle
    ).fetchdf()
    by = want.set_index("event_type")
    assert int(by.loc["a", "n_interp_hours"]) == 3
    assert int(by.loc["a", "val_c_interp"]) == 200 + 300 + 400
    assert int(by.loc["b", "n_interp_hours"]) == 2
    # negative slope: 500 + (-400*1) DIV 3 = 500-133 = 367, then 234
    assert int(by.loc["b", "val_c_interp"]) == 367 + 234
