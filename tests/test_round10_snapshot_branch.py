"""Snapshot branches + fast-forward merge (r10): isolation, the FF
conflict contract, time travel across the merge, and branch-aware
vacuum over the shared data pool."""

import pytest

from codex_africanus_spark.sources import snapshot as snap


def _df(spark, tag, n=4):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


def test_branch_isolation_and_ff_merge(spark, tmp_path):
    main = str(tmp_path / "main")
    dev = str(tmp_path / "dev")
    snap.commit(_df(spark, "a"), main, mode="overwrite")
    base = snap.create_branch(main, dev)
    assert base == 1
    snap.commit(_df(spark, "b"), dev, mode="append")
    # isolation both ways
    assert snap.read_snapshot(spark, main).count() == 4
    assert snap.read_snapshot(spark, dev).count() == 8
    v = snap.merge_ff(dev, main)
    assert v == 2
    post = snap.read_snapshot(spark, main)
    assert post.count() == 8
    assert set(r.tag for r in post.select("tag").distinct().collect()) == {
        "a", "b"
    }
    # time travel: pre-merge main still reads the branch-free content
    assert snap.read_snapshot(spark, main, version=1).count() == 4


def test_merge_ff_refuses_diverged_source(spark, tmp_path):
    main = str(tmp_path / "main")
    dev = str(tmp_path / "dev")
    snap.commit(_df(spark, "a"), main, mode="overwrite")
    snap.create_branch(main, dev)
    snap.commit(_df(spark, "b"), dev, mode="append")
    snap.commit(_df(spark, "c"), main, mode="append")  # source diverges
    with pytest.raises(snap.SnapshotConflictError):
        snap.merge_ff(dev, main)


def test_merge_ff_nothing_to_merge(spark, tmp_path):
    main = str(tmp_path / "main")
    dev = str(tmp_path / "dev")
    snap.commit(_df(spark, "a"), main, mode="overwrite")
    snap.create_branch(main, dev)
    assert snap.merge_ff(dev, main) == 1  # no-op keeps the head


def test_branch_overwrite_merges_as_overwrite(spark, tmp_path):
    main = str(tmp_path / "main")
    dev = str(tmp_path / "dev")
    snap.commit(_df(spark, "a"), main, mode="overwrite")
    snap.create_branch(main, dev)
    snap.commit(_df(spark, "b", n=3), dev, mode="overwrite")
    snap.merge_ff(dev, main)
    post = snap.read_snapshot(spark, main)
    assert post.count() == 3
    assert set(r.tag for r in post.select("tag").distinct().collect()) == {"b"}


def test_vacuum_branch_aware(spark, tmp_path):
    main = str(tmp_path / "main")
    dev = str(tmp_path / "dev")
    snap.commit(_df(spark, "a"), main, mode="overwrite")
    snap.create_branch(main, dev)
    snap.commit(_df(spark, "b"), dev, mode="append")   # branch-only txn
    snap.commit(_df(spark, "c"), main, mode="overwrite")  # orphans 'a' in main
    # branch-unaware vacuum WOULD reclaim the branch's txn; the
    # branch-aware call keeps it
    removed = snap.vacuum(main, 2, extra_live_roots=(dev,))
    assert snap.read_snapshot(spark, dev).count() == 8  # branch intact
    # 'a' is still live through the branch's history, so only nothing or
    # main-only orphans were removed — reclaiming must never have
    # touched a branch-reachable dir
    for d in removed:
        for v in range(1, (snap.latest_version(dev) or 0) + 1):
            assert all(d not in f for f in snap.snapshot_files(dev, v))
