"""Snapshot-sink concurrency race suite (VERDICT r10 item 3).

The CAS primitive under test is `_publish` (hard-link manifest
publication): every writer stages to a temp file and links into the
version slot, losing atomically on EEXIST. These tests hammer that
primitive from MULTIPLE PROCESSES (not threads — the GIL would
serialize the window) and assert linearizable outcomes:

- N concurrent committers: the log is a contiguous 1..head history,
  every commit lands exactly once, no version is double-assigned, and
  the final snapshot's file set is the exact union of all commits.
- committer vs vacuum: with the `min_age_secs` in-flight guard, vacuum
  never reaps a transaction directory that a concurrent committer is
  about to publish — every file referenced by the final log exists.
- concurrent merge_ff of two branches off the same base: exactly one
  fast-forward wins; the loser gets SnapshotConflictError and the
  winner's files are intact (no lost update, no torn manifest).

Workers are pure-filesystem (pyarrow parquet + the manifest layer), so
the suite runs without per-process SparkSessions; Spark is only used to
read back the final table.
"""

import json
import multiprocessing as mp
import os
import time
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from codex_africanus_spark.sources import snapshot as snap

_SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "who", "type": "string", "nullable": True, "metadata": {}},
    ],
})


def _write_txn(root: str, who: str, j: int) -> list[str]:
    """Write one tiny parquet file into a fresh transaction dir and
    return its relative file list — `commit()`'s data step without a
    SparkSession."""
    txn = f"txn-{uuid.uuid4().hex}"
    d = Path(root) / "data" / txn
    d.mkdir(parents=True)
    tbl = pa.table({"k": [j], "who": [who]})
    pq.write_table(tbl, d / "part-0.parquet")
    return [f"data/{txn}/part-0.parquet"]


def _commit_retry(root: str, files: list[str], mode: str = "append",
                  max_retries: int = 200) -> int:
    """commit()'s optimistic retry loop over the manifest CAS."""
    for _ in range(max_retries):
        try:
            return snap._commit_manifest(root, mode, files, _SCHEMA_JSON)
        except snap.SnapshotConflictError:
            continue
    raise AssertionError("lost 200 straight CAS races")


def _committer_worker(root: str, who: str, n_commits: int, out_q) -> None:
    got = []
    for j in range(n_commits):
        files = _write_txn(root, who, j)
        got.append((_commit_retry(root, files), files[0]))
    out_q.put((who, got))


def _slow_committer_worker(root: str, who: str, n_commits: int,
                           delay: float, out_q) -> None:
    """Widens the in-flight window: data dir lands, then `delay`
    seconds pass before the manifest publishes — the exact window a
    concurrent vacuum would reap without the min-age guard."""
    got = []
    for j in range(n_commits):
        files = _write_txn(root, who, j)
        time.sleep(delay)
        got.append((_commit_retry(root, files), files[0]))
    out_q.put((who, got))


def _vacuum_worker(root: str, stop_path: str, out_q) -> None:
    reaped = []
    while not os.path.exists(stop_path):
        head = snap.latest_version(root) or 1
        # retain only the newest 3 versions; 1h min-age guards in-flight
        reaped.extend(snap.vacuum(root, head - 2, min_age_secs=3600.0))
        time.sleep(0.01)
    out_q.put(reaped)


def _merge_worker(branch_root: str, root: str, out_q) -> None:
    try:
        out_q.put(("ok", snap.merge_ff(branch_root, root)))
    except snap.SnapshotConflictError as e:
        out_q.put(("conflict", str(e)))


def _run_procs(targets):
    ctx = mp.get_context("fork")  # workers are pure-filesystem
    q = ctx.Queue()
    procs = [ctx.Process(target=t, args=a + (q,)) for t, a in targets]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    return results


def test_concurrent_committers_linearizable(spark, tmp_path):
    root = str(tmp_path / "t")
    snap._commit_manifest(root, "overwrite", _write_txn(root, "seed", 0),
                          _SCHEMA_JSON)
    N, M = 8, 20
    results = _run_procs([
        (_committer_worker, (root, f"p{i}", M)) for i in range(N)
    ])

    head = snap.latest_version(root)
    assert head == 1 + N * M
    # contiguous history — every version slot filled exactly once
    for v in range(1, head + 1):
        assert snap._manifest_path(root, v).exists()
    # no version double-assigned across workers
    all_versions = [v for _, got in results for v, _ in got]
    assert len(all_versions) == len(set(all_versions)) == N * M
    # the final snapshot is the exact union of every commit's files
    expect = {f for _, got in results for _, f in got}
    final = set(snap.snapshot_files(root, head))
    assert expect <= final and len(final) == 1 + N * M
    # and Spark reads exactly one row per commit
    assert snap.read_snapshot(spark, root).count() == 1 + N * M


def test_committer_vs_vacuum_never_loses_data(spark, tmp_path):
    root = str(tmp_path / "t")
    snap._commit_manifest(root, "overwrite", _write_txn(root, "seed", 0),
                          _SCHEMA_JSON)
    stop = str(tmp_path / "stop")

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    vac = ctx.Process(target=_vacuum_worker, args=(root, stop, q))
    vac.start()
    committers = [
        ctx.Process(target=_slow_committer_worker,
                    args=(root, f"p{i}", 8, 0.03, q))
        for i in range(4)
    ]
    for p in committers:
        p.start()
    results = [q.get(timeout=120) for _ in committers]
    Path(stop).touch()
    reaped = q.get(timeout=120)
    for p in committers + [vac]:
        p.join(timeout=120)
        assert p.exitcode == 0

    head = snap.latest_version(root)
    assert head == 1 + 4 * 8
    # the guard kept every in-flight txn alive: every file referenced by
    # ANY version still exists (nothing young was reaped)
    assert reaped == []
    for v in range(1, head + 1):
        for f in snap.snapshot_files(root, v):
            assert (Path(root) / f).exists(), f"vacuum reaped live {f} (v{v})"
    assert snap.read_snapshot(spark, root).count() == 1 + 4 * 8
    assert len(results) == 4


def test_concurrent_ff_merges_exactly_one_wins(spark, tmp_path):
    root = str(tmp_path / "t")
    snap._commit_manifest(root, "overwrite", _write_txn(root, "seed", 0),
                          _SCHEMA_JSON)
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    snap.create_branch(root, b1)
    snap.create_branch(root, b2)
    snap._commit_manifest(b1, "append", _write_txn(root, "b1", 1),
                          _SCHEMA_JSON)
    snap._commit_manifest(b2, "append", _write_txn(root, "b2", 1),
                          _SCHEMA_JSON)

    outcomes = _run_procs([
        (_merge_worker, (b1, root)), (_merge_worker, (b2, root)),
    ])
    kinds = sorted(k for k, _ in outcomes)
    assert kinds == ["conflict", "ok"], outcomes
    # the winner's commit is intact and readable; the log is contiguous
    head = snap.latest_version(root)
    assert head == 2
    assert snap.read_snapshot(spark, root).count() == 2
    # both branch logs are untouched (own head still base+1) — the
    # loser can rebase and retry
    assert snap.latest_version(b1) == 2 and snap.latest_version(b2) == 2


def test_commit_cas_pinned_version_conflicts(spark, tmp_path):
    """expected_version pins still hold under the new read-through
    latest_version (regression guard for the r11 branch rework)."""
    root = str(tmp_path / "t")
    snap._commit_manifest(root, "overwrite", _write_txn(root, "seed", 0),
                          _SCHEMA_JSON)
    snap._commit_manifest(root, "append", _write_txn(root, "a", 1),
                          _SCHEMA_JSON, expected_version=1)
    with pytest.raises(snap.SnapshotConflictError):
        snap._commit_manifest(root, "append", _write_txn(root, "b", 2),
                              _SCHEMA_JSON, expected_version=1)


# ---------------------------------------------------------------------------
# r11: merge_3way concurrency — two branches with DISJOINT key ranges
# racing a three-way merge onto the same advanced source head. The CAS
# at the head means exactly one lands per attempt; a retrying loser
# must re-run the conflict check against the new head (which now
# contains the winner's files) and still land, because the ranges are
# disjoint. Outcome: both merges eventually commit, each branch's file
# exactly once, contiguous history.
# ---------------------------------------------------------------------------


def _merge3_retry_worker(branch_root: str, root: str, out_q) -> None:
    for _ in range(50):
        try:
            out_q.put(("ok", snap.merge_3way(branch_root, root, key="k")))
            return
        except snap.SnapshotConflictError as e:
            if getattr(e, "conflicts", None):
                out_q.put(("real-conflict", str(e)))  # ranges overlapped —
                return                                # must NOT happen here
            continue  # lost the head CAS — re-check against the new head
    out_q.put(("gave-up", None))


def _stats_for(root: str, files: list[str], lo: int, hi: int) -> dict:
    return {f: {"k": [lo, hi]} for f in files}


def test_concurrent_merge_3way_disjoint_both_land(spark, tmp_path):
    root = str(tmp_path / "t")
    brs = [str(tmp_path / f"b{i}") for i in (0, 1)]
    base_files = _write_txn(root, "base", 0)
    snap._commit_manifest(root, "overwrite", base_files, _SCHEMA_JSON,
                          stats=_stats_for(root, base_files, 0, 9))
    for i, br in enumerate(brs):
        snap.create_branch(root, br)
        bf = _write_txn(root, f"br{i}", 100 + i)
        lo = 1000 + i * 100
        snap._commit_manifest(br, "append", bf, _SCHEMA_JSON,
                              stats=_stats_for(br, bf, lo, lo + 9))
    # source advances past both bases with its own disjoint append
    sf = _write_txn(root, "src", 7)
    snap._commit_manifest(root, "append", sf, _SCHEMA_JSON,
                          stats=_stats_for(root, sf, 500, 509))

    results = _run_procs(
        [(_merge3_retry_worker, (br, root)) for br in brs]
    )
    assert sorted(r[0] for r in results) == ["ok", "ok"], results
    head = snap.latest_version(root)
    assert head == 4  # base + src + two merges
    final = set(snap.snapshot_files(root))
    for i, br in enumerate(brs):
        m = snap._read_manifest(br, 2)
        assert set(m["files"]) <= final  # each branch landed exactly once
    # merged files keep their stats through the racing commits
    stats = snap._all_stats(root, None)
    assert all("k" in s for s in stats.values())
