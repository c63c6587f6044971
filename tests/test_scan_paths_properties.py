"""Hypothesis soundness for snapshots._scan_paths: whatever mix of
managed batch dirs, external dirs, intruder files, and dotfiles is on
disk, EXPANDING the returned paths (dirs → their Spark-visible
parquet files) must yield EXACTLY the live set — never an intruder
(correctness), never a missing live file (completeness). Pure
filesystem, no Spark session."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from indexr_spark.sources.snapshots import _scan_paths

# a table layout: per batch dir — managed-looking name or not, live
# files, optional intruder, optional invisible dotfile
batch = st.fixed_dictionaries(
    {
        "managed_name": st.booleans(),
        "n_live": st.integers(min_value=1, max_value=4),
        "intruder": st.booleans(),
        "dotfile": st.booleans(),
    }
)


def _expand(p: str) -> set[str]:
    """What Spark's listing would read from a returned path."""
    if os.path.isdir(p):
        return {
            os.path.join(p, n)
            for n in os.listdir(p)
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        }
    return {p}


@settings(max_examples=60, deadline=None)
@given(batches=st.lists(batch, min_size=1, max_size=5), data=st.data())
def test_scan_paths_expand_to_exactly_the_live_set(tmp_path_factory, batches, data):
    root = str(tmp_path_factory.mktemp("t"))
    live: list[str] = []
    intruders: set[str] = set()
    for i, b in enumerate(batches):
        name = f"{i:012x}" if b["managed_name"] else f"ext{i}"
        d = os.path.join(root, "data", name)
        os.makedirs(d, exist_ok=True)
        for j in range(b["n_live"]):
            rel = os.path.join("data", name, f"f{j}.parquet")
            open(os.path.join(root, rel), "w").write("x")
            live.append(rel)
        if b["intruder"]:
            p = os.path.join(d, "intruder.parquet")
            open(p, "w").write("x")
            intruders.add(p)
        if b["dotfile"]:
            open(os.path.join(d, "_SUCCESS"), "w").close()

    out = _scan_paths(root, live)
    expanded = set().union(*map(_expand, out))
    expected = {os.path.join(root, f) for f in live}
    assert expanded == expected, (
        f"collapse changed the read set:\n extra={expanded - expected}\n"
        f" missing={expected - expanded}"
    )
    assert not (expanded & intruders)
    # external-named dirs must never be handed over as directories
    for p in out:
        if os.path.isdir(p):
            assert os.path.basename(p) != "data"
            seg = os.path.basename(p)
            assert len(seg) == 12 and all(c in "0123456789abcdef" for c in seg)
