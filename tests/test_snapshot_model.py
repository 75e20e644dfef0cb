"""Model-based check of snapshot-log replay: a random action sequence
(append/overwrite, with and without checkpoints) must resolve to the
same file set as a trivial in-memory model, at EVERY historical version.

Manifests are fabricated directly (no Spark writes) so hypothesis can
explore hundreds of log shapes quickly — this targets the replay +
checkpoint interaction, which is the part of the protocol with actual
logic in it.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from codex_africanus_spark.sources import snapshot as snap

ACTIONS = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite"]),
        st.integers(min_value=0, max_value=3),  # files added by the commit
    ),
    min_size=1,
    max_size=25,
)


def _fabricate(root, actions):
    """Write a manifest log for the action list; returns the model's
    per-version expected file lists."""
    log = snap._log_dir(str(root))
    log.mkdir(parents=True, exist_ok=True)
    model: list[list[str]] = []
    current: list[str] = []
    for v, (action, n_files) in enumerate(actions, start=1):
        files = [f"data/txn-{v:04d}/part-{i}.parquet" for i in range(n_files)]
        if action == "overwrite":
            current = list(files)
        else:
            current = current + files
        model.append(list(current))
        snap._manifest_path(str(root), v).write_text(
            json.dumps(
                {"version": v, "action": action, "files": files, "schema": "{}"}
            )
        )
        if v % snap.CHECKPOINT_EVERY == 0:
            snap._checkpoint_path(str(root), v).write_text(
                json.dumps({"version": v, "files": list(current)})
            )
    return model


@settings(max_examples=200, deadline=None)
@given(actions=ACTIONS)
def test_replay_matches_model_at_every_version(tmp_path_factory, actions):
    root = tmp_path_factory.mktemp("snaplog")
    model = _fabricate(root, actions)
    assert snap.latest_version(str(root)) == len(actions)
    for v, expected in enumerate(model, start=1):
        assert snap.snapshot_files(str(root), v) == expected, (v, actions)
    # the default (latest) read equals the last model state
    assert snap.snapshot_files(str(root)) == model[-1]
