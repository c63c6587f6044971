"""Manifest-based snapshots — atomic commits, time travel, vacuum.

The reference swaps whole segment directories on rewrite (and its
tools rewrite offline) — atomic for NEW readers but fatal to a scan
already in flight. The rewrite tools (`tools.update_column` /
`upsert_segments` / `optimize_segments`) therefore commit through
this module: the lakehouse answer at file grain, in miniature.
Data files are immutable and
uniquely-named, and a tiny JSON manifest names the file set of each
version. Readers pin a manifest (snapshot isolation — a concurrent
commit can't change the files under them); a commit is one small
O_EXCL file create + pointer bump (atomic at 100 TB because the data
move is metadata-only); old versions stay readable (time travel)
until `vacuum` drops their unreferenced files. Concurrent committers
cannot overwrite each other's manifests (the loser re-commits at the
next version); note that racing APPENDS still base on the same parent
version — run one writer per table, as the reference does.

Layout:
    <table>/data/<uuid>-part-*.parquet   immutable data files
    <table>/_manifests/v<N>.json        {"version": N, "files": [...]}
    <table>/_manifests/LATEST           "N" (pointer CACHE — see below)

Commit protocol / object-store portability
------------------------------------------
The committed state of the table is the SET OF MANIFEST FILES, and a
commit IS the successful create-if-absent of v(N+1).json: exactly one
committer can create a given version file, so version allocation needs
no coordination service. Everything else is advisory:

* `LATEST` is a monotonic cache of max(vN) so readers avoid a listing;
  `latest_version` falls back to listing the manifest directory, so a
  committer that crashes between manifest create and pointer bump
  delays nobody and loses nothing.
* The `.commit.lock` file only serializes LOCAL committers to avoid
  wasted work (losers re-attempt at the next version); correctness
  never depends on it — the concurrent-committer test runs with the
  lock disabled.

On a real 100 TB warehouse the same protocol maps onto each store's
conditional primitive: HDFS `create()` without overwrite, S3
`If-None-Match: *` conditional PUT, GCS `ifGenerationMatch=0`, ABFS
conditional create. (Stores with no conditional write at all need a
catalog service for the arbiter — Hive/Glue/Nessie — which is exactly
the Delta/Iceberg requirement; the reference used ZooKeeper for the
same coordination, HybridTable.java:64-82.)

Concurrent appends are retry-rebase safe: an append's commit attempt
recomputes its file list from the CURRENT latest manifest, so the
loser of a version race re-unions the winner's files with its own and
re-attempts — both appends land (the optimistic-concurrency loop
Delta/Iceberg use; the reference serialized the same transition
through ZooKeeper). Concurrent full `write_snapshot` replacements
keep last-committed-wins semantics, with every version time-travel
readable.

Delta manifests (round 5 — the O(files)-per-commit fix)
-------------------------------------------------------
A full-file-list manifest per commit is O(live files) driver work per
APPEND — at 100 TB (10^5-10^6 files) that's megabytes of JSON written
per streaming epoch, and the retry-rebase loop re-read it per attempt.
Appends therefore commit a DELTA manifest instead:

    {"version": N, "base": N-1, "depth": d, "add": [...]}

The live set of a version resolves by walking base links down to the
nearest FULL manifest ("files" key) and unioning the adds — Iceberg's
manifest-list indirection, one level deep. Commit cost for an append
is O(new files) regardless of table size, and a retry after a lost
version race just re-targets the new parent (the delta itself IS the
rebase — the union happens at read time, so no file list is re-read
inside the loop). Every FULL_REWRITE_EVERY-th append materializes a
full manifest, bounding chain length (read cost) and amortizing the
O(files) write to 1/32 per commit. Replace-style commits
(write_snapshot / upsert) stay full — their semantics ARE the file
list. vacuum() materializes the oldest KEPT version as full before
retiring expired manifests, so no live chain dangles past the
horizon; time travel below the horizon still fails loudly.

The pruning sidecar (the OTHER O(files)-per-commit term — measured
3.3 s/commit at 100k files vs 0.09 s for the manifest) refreshes only
on FULL-manifest commits, i.e. 1/FULL_REWRITE_EVERY of appends.
Correctness never depends on its freshness: Catalog.prune reconciles
the sidecar against the live manifest set — live files it doesn't
cover yet are scanned unpruned (SOME), dead entries it still carries
are dropped — so a lagging sidecar only costs pruning coverage of the
newest files. scripts/bench_snapshots.py measures both layers at 100k
files.
"""

from __future__ import annotations

import bisect
import contextlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"

# Commit critical-section lock (local-FS grade). On an object store
# this would be a catalog-service lock (Hive/Glue/Nessie), exactly as
# Delta/Iceberg require there; O_EXCL-create is the correct primitive
# for the posix filesystems this repo runs on.
_LOCK_WAIT_S = 60.0  # give up acquiring after this long
_LOCK_STALE_S = 300.0  # a lock this old belongs to a dead committer


@contextlib.contextmanager
def _commit_lock(path: str):
    """Serialize the commit critical section (version allocation →
    sidecar refresh → LATEST bump). Without it, two committers can
    interleave so the loser's LATEST check or sidecar write lands
    *after* the winner's, leaving LATEST or the pruning sidecar
    describing a superseded version."""
    lock = os.path.join(_manifest_dir(path), ".commit.lock")
    deadline = time.monotonic() + _LOCK_WAIT_S
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                continue  # holder released between create-fail and stat
            if age > _LOCK_STALE_S:
                with contextlib.suppress(OSError):
                    os.remove(lock)  # dead holder; reclaim
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"snapshot commit lock busy for >{_LOCK_WAIT_S}s: {lock}"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.remove(lock)


def _manifest_dir(path: str) -> str:
    return os.path.join(path, MANIFEST_DIR)


def _manifest_versions(path: str) -> list[int]:
    """Version numbers of every manifest file present, tolerating stray
    non-numeric v*.json names (the one place this parse lives — every
    enumerator shares the same ValueError posture)."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            with contextlib.suppress(ValueError):
                out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(path: str) -> int:
    """Current committed version, or 0 if the table has none.

    The LATEST pointer is a cache; the manifest file set is the truth.
    A committer that crashed after creating v(N).json but before the
    pointer bump must not hide its (fully valid) commit, so the scan
    takes the max of both. The scan is one metadata listing of a tiny
    directory — on an object store, one LIST call."""
    cached = 0
    ptr = os.path.join(_manifest_dir(path), "LATEST")
    if os.path.exists(ptr):
        # the pointer is advisory: damage falls through to the scan
        with contextlib.suppress(ValueError, OSError), open(ptr) as f:
            cached = int(f.read().strip())
    versions = _manifest_versions(path)
    return max(cached, versions[-1] if versions else 0)


FULL_REWRITE_EVERY = 32  # max delta-chain depth before materializing


def _load_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def _depth(manifest: dict) -> int:
    """Delta-chain depth: 0 for a full manifest ("files" present —
    includes every pre-round-5 manifest), else the stored depth."""
    return 0 if "files" in manifest else manifest["depth"]


def files_of(path: str, version: int) -> list[str]:
    """Resolve a version's live file set: walk base links down to the
    nearest full manifest, union the adds on the way back up. Chain
    length is bounded by FULL_REWRITE_EVERY; a chain crossing the
    vacuum horizon raises FileNotFoundError (fails loudly — vacuum
    materializes the oldest kept version precisely so live versions
    never do).

    Vacuum-race tolerant: a concurrent vacuum can load this walk's
    next base manifest out from under it — the reader picks up a kept
    version in its DELTA form just before vacuum's atomic
    materialization, then hits the expired base manifests vacuum
    retires a moment later. The walk therefore retries from the top on
    FileNotFoundError: the re-walk finds the just-materialized full
    manifest at (or above) the kept horizon and terminates there. Only
    a version genuinely below the horizon still raises after the
    retries (the fail-loudly contract). Two retries cover a vacuum
    landing during the first re-walk; vacuums themselves are
    serialized by the commit lock."""
    last_exc: FileNotFoundError | None = None
    for _attempt in range(3):
        try:
            adds: list[list[str]] = []
            v = version
            while True:
                m = _load_manifest(path, v)
                if "files" in m:
                    live = set(m["files"])
                    break
                adds.append(m["add"])
                v = m["base"]
            for a in adds:
                live.update(a)
            return sorted(live)
        except FileNotFoundError as exc:
            last_exc = exc
    raise last_exc


class ConcurrentSnapshotConflict(RuntimeError):
    """Raised when a commit that computed its contents FROM a specific
    base version (copy-on-write MERGE) finds the table advanced past
    that base — committing would silently drop the interleaved
    writer's changes. Callers re-read and retry the whole operation
    (the Delta/Iceberg write-conflict contract)."""


def _commit(
    path: str,
    files: list[str],
    meta: dict | None = None,
    rebase=None,
    expect_parent: int | None = None,
    delta: bool = False,
) -> int:
    """Write manifest v(N+1) then bump LATEST — the only mutation a
    reader can observe, and it's a single tiny file. The table-root
    stats sidecar is refreshed to the committed file set first
    (incremental: only new files' footers are read), so rough-check
    pruning always describes the version LATEST points at.

    `rebase(parent_version)`: optional callable re-evaluated at the top
    of EVERY commit attempt — it must return the file list to commit
    given that parent version (append commits union the parent's files
    with their own, so a racing append's files are never dropped). The
    attempt only ever targets parent+1: versions are created gap-free
    (a committer targets N+1 only after observing N), so a successful
    create-if-absent of parent+1 PROVES parent was the latest committed
    version at link time — i.e. the rebase read the true predecessor.
    Rebasing only after a FileExistsError would be unsound: a loser's
    first attempt can land at parent+1 where parent advanced after its
    file list was computed, silently dropping the racer's files with no
    error raised (caught by the concurrent-append test). Without
    `rebase`, the loser retries with its original file list
    (full-replace semantics: last committed version wins).

    `expect_parent`: optimistic conflict detection for commits whose
    CONTENTS were derived from a specific base version (copy-on-write
    MERGE): if the table's parent at commit time differs, raise
    ConcurrentSnapshotConflict instead of silently replacing away an
    interleaved writer's commit.

    `delta`: `files` are NEW files to ADD to the parent's live set;
    the manifest written is a base+add delta (O(new files) per commit,
    any table size) unless the chain depth would reach
    FULL_REWRITE_EVERY — then this commit materializes a full
    manifest. A delta needs no `rebase`: a retried attempt re-targets
    the advanced parent and the union happens at resolve time, so the
    loser of a version race never re-reads any file list (same
    soundness argument as rebase — creating parent+1 proves parent was
    latest, hence base links never skip a committed version)."""
    from indexr_spark.sources.segments import write_sidecar

    os.makedirs(_manifest_dir(path), exist_ok=True)
    with _commit_lock(path):
        while True:
            parent = latest_version(path)
            if expect_parent is not None and parent != expect_parent:
                raise ConcurrentSnapshotConflict(
                    f"table {path} advanced v{expect_parent} -> v{parent} "
                    "since this rewrite read its base; re-read and retry"
                )
            if rebase is not None:
                files = rebase(parent)
            version = parent + 1
            if delta and parent:
                pdepth = _depth(_load_manifest(path, parent))
                if pdepth + 1 >= FULL_REWRITE_EVERY:
                    # periodic materialization: the amortized O(files)
                    # write that keeps every chain short
                    manifest = {
                        "version": version,
                        "files": sorted(set(files_of(path, parent)) | set(files)),
                        **(meta or {}),
                    }
                else:
                    manifest = {
                        "version": version,
                        "base": parent,
                        "depth": pdepth + 1,
                        "add": sorted(files),
                        **(meta or {}),
                    }
            else:
                manifest = {
                    "version": version,
                    "files": sorted(files),
                    **(meta or {}),
                }
            mpath = os.path.join(_manifest_dir(path), f"v{version}.json")
            # Atomic conditional create: the manifest content is fully
            # written to a private temp file, then hard-LINKED to the
            # version name — link() fails if the name exists (exactly
            # one committer wins the version; a loser advances rather
            # than overwriting the winner) and the manifest appears
            # complete-or-not-at-all (a committer dying mid-write
            # leaves only the invisible temp, never a truncated
            # v<N>.json that latest_version's scan would surface as
            # committed truth). Object stores get both properties from
            # a single conditional PUT.
            tmp = os.path.join(
                _manifest_dir(path), f".v{version}.{uuid.uuid4().hex[:8]}.tmp"
            )
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            try:
                os.link(tmp, mpath)
            except FileExistsError:
                # lost the version race: loop — the next attempt
                # re-reads the (advanced) parent and re-rebases
                continue
            finally:
                with contextlib.suppress(OSError):
                    os.remove(tmp)
            break
        # Sidecar refresh is amortized to FULL-manifest commits (the
        # measured remaining O(files) term: 3.3 s/commit at 100k files
        # vs 0.09 s for the delta manifest itself — bench_snapshots).
        # Safe to lag: Catalog.prune reconciles the sidecar against
        # the live manifest set, so not-yet-covered files are scanned
        # unpruned (SOME) and dead entries are dropped — a stale
        # sidecar costs pruning coverage of the newest files, never
        # correctness.
        if "files" in manifest:
            write_sidecar(path, files_rel=manifest["files"])
        tmp = os.path.join(
            _manifest_dir(path), f".LATEST.{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w") as f:
            f.write(str(version))
        latest = os.path.join(_manifest_dir(path), "LATEST")
        # Bump the pointer CACHE monotonically (compare against the
        # cached value, not latest_version() — that scan would see the
        # manifest this very commit just created). A lost race here is
        # harmless: the pointer is advisory and latest_version()'s
        # manifest scan remains the truth.
        cached = 0
        if os.path.exists(latest):
            with open(latest) as f:
                with contextlib.suppress(ValueError):
                    cached = int(f.read().strip())
        if cached < version:
            os.replace(tmp, latest)  # atomic bump
        else:
            os.remove(tmp)
    return version


def _is_metadata_path(path: str, root: str) -> bool:
    """True for paths under underscore/dot-prefixed directories —
    Spark's own file-listing convention for non-data paths (the term
    index, manifests, streaming _spark_metadata all live there).
    Snapshot adoption and vacuum must never treat those as table data:
    adopting postings as data rows corrupts every later read, and
    vacuuming them (they appear in no manifest) destroys the index."""
    rel = os.path.relpath(path, root)
    return any(p.startswith(("_", ".")) for p in rel.split(os.sep) if p != ".")


def ensure_snapshot(path: str) -> int:
    """Adopt a plain segment directory as snapshot v1 — the manifest
    simply lists the parquet files already in place; no data moves.
    Returns the current version (existing or newly bootstrapped)."""
    v = latest_version(path)
    if v:
        return v
    files = [
        os.path.relpath(os.path.join(root, name), path)
        for root, dirs, names in os.walk(path)
        if not _is_metadata_path(root, path)
        for name in sorted(names)
        if name.endswith(".parquet") and not name.startswith(("_", "."))
    ]
    return _commit(path, files)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read `path` at its latest snapshot version, or as a plain
    parquet directory if it was never snapshotted — the one entry
    point the rewrite tools and their readers share."""
    if latest_version(path):
        return read_snapshot(spark, path)
    return spark.read.parquet(path)


# In-flight write protocol: _write_data_files drops a dot-named
# marker NEXT TO the batch dir (inside it, Spark's overwrite would
# wipe it) before any data lands; the commit paths clear it after the
# manifest commits. vacuum treats any un-manifested file whose batch
# still carries a marker as a commit in progress — regardless of file
# age, closing the "write outlives the min_age_s grace" hole — until
# the MARKER itself goes stale (a dead writer), at which point the
# batch is orphan-swept and the marker removed.
INFLIGHT_PREFIX = ".inflight."
INFLIGHT_STALE_S = 3600.0


def _inflight_marker(path: str, batch_rel: str) -> str:
    return os.path.join(path, "data", INFLIGHT_PREFIX + os.path.basename(batch_rel))


def _clear_inflight(path: str, new_files: list[str]) -> None:
    """Remove the in-flight markers for the batch dirs of just-
    committed files. Called AFTER the manifest commit; a commit that
    raises leaves its marker, and vacuum honors it until
    INFLIGHT_STALE_S, then sweeps the dead writer's batch."""
    batches = set()
    for f in new_files:
        d = os.path.dirname(f)
        while os.path.dirname(d) not in ("", "."):
            parent = os.path.dirname(d)
            if parent == "data":
                batches.add(d)
                break
            d = parent
    for b in batches:
        with contextlib.suppress(OSError):
            os.remove(_inflight_marker(path, b))


def _write_data_files(
    df: DataFrame,
    path: str,
    sort_by: list[str] | None,
    num_segments: int | None = None,
) -> list[str]:
    """Write a new immutable batch of data files; return their paths
    relative to the table root. The in-flight marker lands before the
    first data byte (see the protocol note above)."""
    from indexr_spark.sources.segments import write_segments

    batch_name = uuid.uuid4().hex[:12]
    batch = os.path.join(path, "data", batch_name)
    os.makedirs(os.path.dirname(batch), exist_ok=True)
    marker = _inflight_marker(path, batch_name)
    with open(marker, "w") as f:
        f.write(str(os.getpid()))
    write_segments(df, batch, sort_by=sort_by, num_segments=num_segments)
    return [
        os.path.relpath(os.path.join(root, name), path)
        for root, _dirs, names in os.walk(batch)
        for name in sorted(names)
        if name.endswith(".parquet")
    ]


def write_snapshot(
    df: DataFrame,
    path: str,
    sort_by: list[str] | None = None,
    num_segments: int | None = None,
    expect_parent: int | None = None,
) -> int:
    """Commit `df` as the table's new full contents (version N+1).
    Prior versions' files are untouched — still readable via
    read_snapshot(version=...). Pass `expect_parent` when `df` was
    DERIVED from a specific version (copy-on-write rewrites): the
    commit then refuses with ConcurrentSnapshotConflict if the table
    advanced past that base, instead of replacing away an interleaved
    writer's commit."""
    files = _write_data_files(df, path, sort_by, num_segments)
    try:
        v = _commit(path, files, expect_parent=expect_parent)
    except BaseException:
        # commit failed for THIS batch (e.g. ConcurrentSnapshotConflict
        # — the caller rewrites against the new parent, never re-commits
        # these files): the write is provably dead, so clear the marker
        # and let the orphan age out under the normal grace instead of
        # shielding it for the full stale window
        _clear_inflight(path, files)
        raise
    _clear_inflight(path, files)
    return v


def append_snapshot(
    df: DataFrame,
    path: str,
    sort_by: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Commit `df` appended to the current version's file set — the
    streaming/batch append path: new files + a manifest that lists
    old ∪ new. `meta` keys land in the manifest (e.g. the streaming
    epoch id for exactly-once).

    Commits a DELTA manifest — O(new files) driver work however large
    the table (the module docstring's round-5 scaling fix; every
    FULL_REWRITE_EVERY-th append materializes full to bound chains).

    Concurrent-append safe: a loser of the version race re-attempts
    against the advanced parent and the union happens at RESOLVE time
    (base links + adds), so neither writer's files are dropped and no
    file list is re-read in the retry loop. This is the
    optimistic-concurrency loop Delta/Iceberg appends use; the
    reference serialized the same transition through ZooKeeper
    (HybridTable.java:64-82)."""
    new = _write_data_files(df, path, sort_by)
    try:
        v = _commit(path, new, meta, delta=True)
    except BaseException:
        _clear_inflight(path, new)  # dead write: see write_snapshot
        raise
    _clear_inflight(path, new)
    return v


_WATERMARK_NAME = "META_WATERMARKS"

# Manifest keys that are snapshot STRUCTURE, not user meta. The
# watermark fold must never absorb them (folding a retired DELTA's
# "add" file list into the watermark would embed it there forever and
# make max_committed_meta(path, "add") report a file list as
# "committed meta"), and asking max_committed_meta for one is a
# category error, not a question with an answer.
_STRUCTURAL_KEYS = ("version", "files", "base", "depth", "add")


def _meta_watermarks(path: str) -> dict:
    """The {meta_key: max_value} carried forward by vacuum when it
    retires manifests (see max_committed_meta)."""
    wpath = os.path.join(_manifest_dir(path), _WATERMARK_NAME)
    with contextlib.suppress(OSError, json.JSONDecodeError):
        with open(wpath) as f:
            return json.load(f)
    return {}


def _fold_meta_watermarks(path: str, metas: list[dict]) -> None:
    """Merge the max of each custom meta key from `metas` into the
    watermark file (atomic replace; monotone per key)."""
    wm = _meta_watermarks(path)
    for m in metas:
        for k, v in m.items():
            if k in _STRUCTURAL_KEYS or v is None:
                continue
            if k not in wm or v > wm[k]:
                wm[k] = v
    tmp = os.path.join(
        _manifest_dir(path), f".{_WATERMARK_NAME}.{uuid.uuid4().hex[:8]}"
    )
    with open(tmp, "w") as f:
        json.dump(wm, f)
    os.replace(tmp, os.path.join(_manifest_dir(path), _WATERMARK_NAME))


def max_committed_meta(path: str, key: str):
    """Max value of `key` across all live manifests AND the vacuum
    watermark, or None — how the streaming sink asks "did this epoch
    already commit?". A latest-manifest-only check is wrong for that
    question now that concurrent appends are supported: a racing
    non-streaming append can land AFTER the epoch's commit, burying
    the epoch key one manifest down and tricking a replayed epoch into
    re-appending its rows. And the manifest scan alone is wrong across
    a vacuum: retiring an expired manifest must not erase the epoch
    evidence, so vacuum folds the max of every custom meta key into a
    watermark file BEFORE deleting (the exactly-once guard survives
    arbitrary vacuums). Scanning the live manifests is one LIST + a
    few tiny JSON reads; vacuum bounds their count."""
    if key in _STRUCTURAL_KEYS:
        raise ValueError(
            f"{key!r} is snapshot structure, not committed meta; "
            "query manifests/files_of directly"
        )
    best = _meta_watermarks(path).get(key)
    for v in _manifest_versions(path):
        with contextlib.suppress(OSError, json.JSONDecodeError):
            val = _load_manifest(path, v).get(key)
            if val is not None and (best is None or val > best):
                best = val
    return best


def _update_key_ranges(updates: DataFrame, key_cols: list[str]) -> dict:
    """{key col: (min, max)} over the updates — one tiny agg job whose
    result is a single driver row however large the update set."""
    from pyspark.sql import functions as F

    aggs = []
    for k in key_cols:
        aggs += [F.min(k).alias(f"__mn_{k}"), F.max(k).alias(f"__mx_{k}")]
    row = updates.agg(*aggs).collect()[0]
    return {k: (row[f"__mn_{k}"], row[f"__mx_{k}"]) for k in key_cols}


def _update_key_values(
    updates: DataFrame, key_cols: list[str], cap: int = 100_000
) -> dict:
    """{key col: sorted distinct non-null values} when the column's
    distinct count fits `cap` driver-side, else {col: None} (range-only
    scoping). The point (measured by scripts/bench_snapshots.py
    decontam): a [min,max] over the update SET is useless when the
    keys are hash-like — five md5 hashes span essentially the whole
    hex space, so every file's range "overlaps" and the range check
    degenerates to a full rewrite (298 of 300 files for 5 keys).
    Per-file membership against the sorted value list is exact. The
    cap bounds driver memory; a decontamination key set is
    census-sized-per-multi-hash (tiny next to the corpus), and past
    the cap the scoping soundly widens back to ranges."""
    out = {}
    for k in key_cols:
        vals = updates.select(k).distinct().limit(cap + 1).collect()
        if len(vals) > cap:
            out[k] = None
        else:
            out[k] = sorted(r[0] for r in vals if r[0] is not None)
    return out


def _overlapping_files(
    path: str, live: list[str], ranges: dict, values: dict | None = None
) -> list[str]:
    """The live files whose sidecar key-column stats MAY contain a key
    in `ranges` — the copy-on-write rewrite set. Sound, not tight: a
    file escapes the rewrite only when some key column's [min,max] is
    provably disjoint from the updates' [min,max]; a file the
    (possibly delta-lagging) sidecar doesn't cover, a column it has no
    stats for, an unknown update range, or an uncomparable type pair
    all mean "may match" and the file is rewritten. Null keys never
    join-match, so a disjoint-range file holding nulls is still safely
    skipped — as is a zero-row file (no stats to compare, but nothing
    to match either).

    `values` (from _update_key_values) refines the check per column:
    a file is also disjoint when NO update value for that column lies
    inside the file's [min,max] (binary search over the sorted list) —
    the refinement that keeps hash-keyed deletes scoped to the files
    actually holding a deleted key. Equality on ALL key columns is
    what a match needs, so disjointness on ANY column suffices, same
    as the range rule.

    Files the TABLE sidecar doesn't cover fall back to their batch
    dir's own sidecar (write_segments writes one per append batch, so
    it always exists for managed files): the table sidecar refreshes
    only on full-manifest commits (1 in FULL_REWRITE_EVERY appends —
    the round-5 commit-cost design), which would otherwise leave a
    streaming table's newest ~31 batches permanently "may match" and
    was measured degrading a 5-key decontamination to a 294-of-300
    file rewrite. Reading one tiny JSON per uncovered batch dir keeps
    the scoping tight at any sidecar lag."""
    from indexr_spark.sources.segments import SIDECAR_NAME, load_sidecar

    try:
        stats = load_sidecar(path)
        with open(os.path.join(path, SIDECAR_NAME)) as f:
            num_rows = {e["path"]: e.get("num_rows") for e in json.load(f)["files"]}
    except (OSError, ValueError, KeyError):
        stats, num_rows = {}, {}  # lag-only: batch sidecars still scope

    batch_cache: dict[str, tuple[dict, dict]] = {}

    def _stats_for(rel: str):
        """(ColStats-by-col or None, num_rows or None) for a live file,
        preferring the table sidecar, falling back to its batch dir's."""
        ab = os.path.join(path, rel)
        st = stats.get(ab)
        if st is not None or rel in num_rows:
            return st, num_rows.get(rel)
        bdir = os.path.dirname(ab)
        if bdir not in batch_cache:
            try:
                bstats = load_sidecar(bdir)
                with open(os.path.join(bdir, SIDECAR_NAME)) as f:
                    bnum = {
                        os.path.join(bdir, e["path"]): e.get("num_rows")
                        for e in json.load(f)["files"]
                    }
                batch_cache[bdir] = (bstats, bnum)
            except (OSError, ValueError, KeyError):
                batch_cache[bdir] = ({}, {})
        bstats, bnum = batch_cache[bdir]
        return bstats.get(ab), bnum.get(ab)

    touched = []
    for rel in live:
        st, nr = _stats_for(rel)
        if nr == 0:
            continue  # empty file: provably no matching row
        disjoint = False
        if st is not None:
            for k, (mn, mx) in ranges.items():
                cs = st.get(k)
                if cs is None or mn is None:
                    continue  # unknown stats/range: can't prove disjoint
                with contextlib.suppress(TypeError):
                    if cs.max < mn or cs.min > mx:
                        disjoint = True
                        break
                    vals = (values or {}).get(k)
                    if vals is not None:
                        i = bisect.bisect_left(vals, cs.min)
                        if i >= len(vals) or vals[i] > cs.max:
                            disjoint = True  # no key value in range
                            break
        if not disjoint:
            touched.append(rel)
    return touched


_PROBE_MIN_FILES = 8


def _scoped_touched_files(
    spark: SparkSession,
    path: str,
    live: list[str],
    updates: DataFrame,
    key_cols: list[str],
    ranges: dict,
) -> list[str]:
    """The full copy-on-write scoping cascade, cheapest test first:
    (1) range-only sidecar scoping — pure driver-side metadata, no
    jobs; (2) per-file membership of the collected distinct key sets
    (_update_key_values — one distinct+limit job per key column) over
    the ALREADY-NARROWED candidates, then the exact touched-file probe
    job (_probe_touched_files).

    Stage 2 is skipped when range scoping was SELECTIVE — candidates
    below _PROBE_MIN_FILES *and* below the live count — the
    well-clustered integer-keyed case, where a small delete/merge then
    pays zero extra jobs (the r8 ADVICE fixed-latency finding). The
    both-conditions guard matters: hash-like keys overlap every file's
    range, so a SMALL table's candidates can sit under the probe
    threshold while range scoping proved nothing (candidates == live);
    there value scoping still halves-or-better the rewrite set
    (pinned: 4 files → 2 in the spread-key tests), and its cost — one
    driver-bounded collect over the small updates frame — is noise
    next to a file rewrite. Value scoping over the range-narrowed
    subset equals scoping over `live`: the value test only ever
    removes files the range test kept."""
    touched = _overlapping_files(path, live, ranges)
    if len(touched) < _PROBE_MIN_FILES and len(touched) < len(live):
        return touched
    touched = _overlapping_files(
        path, touched, ranges, _update_key_values(updates, key_cols)
    )
    return _probe_touched_files(spark, path, touched, updates, key_cols)


def _probe_touched_files(
    spark: SparkSession,
    path: str,
    candidates: list[str],
    keys_df: DataFrame,
    key_cols: list[str],
) -> list[str]:
    """EXACT copy-on-write scoping: of the sidecar candidates, the
    files that actually hold a key from `keys_df` — one job that scans
    ONLY the candidates and ONLY the key columns (column pruning makes
    this a thin read), semi-joins the distinct update keys, and
    collects the distinct matching file names (driver-bounded by
    len(candidates)).

    Why this exists: per-file [min,max] membership cannot beat
    ~1 file per APPEND per key on an epoch-fragmented table — every
    hash-sorted append tiles the whole key space, so a hash key lands
    inside one file's range per epoch and the sidecar bound is
    keys x epochs (measured: 120 of 300 files rewritten for 5 keys at
    30 epochs — scripts/bench_snapshots.py upsert_spread). Reading the
    candidates' key column costs a fraction of REWRITING them: the
    probe pins the rewrite to the files a key actually lives in
    (keys x 1, measured 2 files for the same 5+1 keys), which at
    100 TB is the difference between touching a handful of files and
    rewriting one file per historical epoch.

    Exactness is sound both ways: equality on ALL key columns is what
    a MERGE/DELETE match needs, the probe joins on exactly that, and
    null keys never equality-match — identical to the rewrite join's
    own semantics, so a probed-out file provably contributes no
    matched row. Skipped below _PROBE_MIN_FILES candidates, where the
    probe job costs more than it can save."""
    if len(candidates) < _PROBE_MIN_FILES:
        return candidates
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    cand = spark.read.parquet(*_scan_paths(path, candidates)).select(
        F.input_file_name().alias("__probe_file"), *key_cols
    )
    hits = (
        cand.join(keys_df.select(*key_cols).distinct(), key_cols, "leftsemi")
        .select("__probe_file")
        .distinct()
        .collect()
    )
    root = os.path.abspath(path)
    rels = set()
    for r in hits:
        p = unquote(urlparse(r["__probe_file"]).path)
        rels.add(os.path.relpath(os.path.abspath(p), root))
    # paranoia: the probe must only ever NARROW the candidate set; an
    # unexpected path mapping falls back to the sound sidecar answer
    out = [rel for rel in candidates if rel in rels]
    return out if len(rels) == len(out) else candidates


def upsert_snapshot(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    sort_by: list[str] | None = None,
) -> int:
    """Copy-on-write MERGE as a snapshot commit, scoped by the stats
    sidecar: only files whose key-column ranges may overlap the
    updates are read and rewritten; every other live file carries into
    the new manifest untouched (the Delta/Iceberg copy-on-write shape
    — rewrite cost is proportional to files TOUCHED, not table size,
    which is the difference between a merge and a table rewrite at
    100 TB). Old files remain on disk for time-travel readers; vacuum
    retires the replaced ones once their versions expire, which also
    restores those batch dirs to directory-collapse eligibility in
    _scan_paths.

    Conflict-checked: the merge's contents derive from the base
    version it read, so a concurrent commit landing in between makes
    the rewrite stale — committing anyway would silently drop the
    interleaved changes (the lost-update the retry-rebase append fix
    cannot cover, because a MERGE's files depend on the DATA of its
    base, not just the file list). Raises ConcurrentSnapshotConflict;
    callers re-run the merge against the new version."""
    base = latest_version(path)
    if base == 0:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    target, merged, untouched = scoped_merge_plan(spark, path, updates, key_cols, base)
    new_files = _write_data_files(merged, path, sort_by)
    try:
        v = _commit(path, untouched + new_files, expect_parent=base)
    except BaseException:
        _clear_inflight(path, new_files)  # dead write: see write_snapshot
        raise
    _clear_inflight(path, new_files)
    return v


def delete_matching(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: list[str],
    sort_by: list[str] | None = None,
) -> int:
    """Copy-on-write DELETE of every row whose `key_cols` match a row
    in `keys` — upsert_snapshot's scoping with anti-join-only output:
    files whose sidecar key ranges are provably disjoint from the
    delete set carry into the new manifest untouched; only possibly-
    matching files are read and rewritten without the matches. When
    no live file can hold a match the table version does not even
    advance (a delete of nothing is a no-op, not an empty commit).

    Scale posture: rewrite cost ∝ files provably holding a deleted
    key — per-file membership of the sorted distinct key set against
    the sidecar ranges (_update_key_values), NOT the delete set's
    global [min,max], which hash-like keys stretch over the whole
    space (measured: 5 md5 keys range-"overlapped" 298 of 300 files;
    value scoping touches only the ~1-per-epoch files actually
    holding one). Tables clustered on the key (sort_by at write — the
    cleaning sink sorts each batch by its canonical hash for exactly
    this reason) localize the rewrite; an unclustered table degrades
    soundly to a full rewrite, never to a wrong answer. Same
    ConcurrentSnapshotConflict contract as upsert_snapshot: the
    survivors derive from the base version's DATA, so an interleaved
    commit makes them stale and the commit refuses."""
    base = latest_version(path)
    if base == 0:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    live = files_of(path, base)
    ranges = _update_key_ranges(keys, key_cols)
    # an all-null (or empty) delete set can never equality-match a row
    # — _overlapping_files reads an unknown range as "may match" (right
    # for upserts, which still insert), but a delete of nothing is a
    # no-op, not a full-table rewrite
    if any(mn is None for mn, _ in ranges.values()):
        return base
    # hash-like delete keys (canonical hashes) span the whole key
    # space, so the set's [min,max] alone cannot scope anything; the
    # cascade escalates to key-set membership + the exact probe only
    # when range scoping leaves a large candidate set
    touched = _scoped_touched_files(spark, path, live, keys, key_cols, ranges)
    if not touched:
        return base
    untouched = sorted(set(live) - set(touched))
    target = spark.read.parquet(*_scan_paths(path, touched))
    # plain equality, NOT eqNullSafe: _overlapping_files' file-skip
    # proof relies on null keys never join-matching (a skipped
    # disjoint-range file may still hold null-keyed rows)
    cond = [target[k] == keys[k] for k in key_cols]
    survivors = target.join(keys, cond, "left_anti")
    new_files = _write_data_files(survivors, path, sort_by)
    try:
        v = _commit(path, untouched + new_files, expect_parent=base)
    except BaseException:
        _clear_inflight(path, new_files)  # dead write: see write_snapshot
        raise
    _clear_inflight(path, new_files)
    return v


def scoped_merge_plan(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    base: int,
) -> tuple[DataFrame | None, DataFrame, list[str]]:
    """The sidecar-scoped MERGE plan against version `base`:
    (touched-files DataFrame or None, merged rewrite DataFrame,
    untouched live files to carry into the new manifest). Shared by
    upsert_snapshot and tools.upsert_segments (which also needs the
    touched subset for its updated/inserted counts).

    Scoped by per-file key-set membership, not just the updates'
    global [min,max] — same reasoning as delete_matching: a MERGE
    keyed on hashes (e.g. a fingerprint store) has updates spanning
    the whole key space, and range-only scoping degenerates to a
    full-table rewrite. A file value-scoped out provably holds no
    update key, so carrying it unchanged is exactly MERGE semantics;
    the inserts ride the rewrite (or the pure-insert branch) either
    way. The key-set collects (one distinct+limit driver-bounded job
    per key column) and the exact touched-file probe run only when
    range scoping leaves >= _PROBE_MIN_FILES candidates
    (_scoped_touched_files) — small well-clustered merges pay zero
    extra jobs, which is also why append_snapshot (the per-epoch
    streaming path) has no scoping at all."""
    live = files_of(path, base)
    touched = _scoped_touched_files(
        spark, path, live, updates, key_cols, _update_key_ranges(updates, key_cols)
    )
    untouched = sorted(set(live) - set(touched))
    if touched:
        target = spark.read.parquet(*_scan_paths(path, touched))
        cond = [target[k] == updates[k] for k in key_cols]
        survivors = target.join(updates, cond, "left_anti")
        return target, survivors.unionByName(updates.select(*target.columns)), untouched
    # no live file can hold a matching key: pure insert, in the
    # table's column order. ONE file's footer supplies the column
    # list — planning over all live paths just to read .columns would
    # pay the full 100k-leaf listing cost this scoped path exists to
    # avoid (every live file shares the table schema by construction).
    cols = (
        spark.read.parquet(os.path.join(path, live[0])).columns
        if live
        else updates.columns
    )
    return None, updates.select(*cols), untouched


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (default: latest). The returned
    DataFrame's file list is fixed at call time — concurrent commits
    cannot change what this scan reads."""
    v = version if version is not None else latest_version(path)
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    files = files_of(path, v)
    return spark.read.parquet(*_scan_paths(path, files))


def _scan_paths(path: str, files: list[str]) -> list[str]:
    """Collapse the live file list to directory roots where safe.

    Handing Spark 100k explicit leaf paths costs one per-file status
    call at planning (measured 36.6 s at 100k files — bench_snapshots);
    handing it a DIRECTORY costs one LIST. A directory may stand in
    for its files only when its on-disk contents are EXACTLY the live
    files under it (append-only batch dirs, the common case): any
    extra entry — an uncommitted writer's temp, a replaced version's
    file awaiting vacuum, a subdirectory — disqualifies the dir, and
    its files are passed explicitly. Entries are plain files with no
    '=' in the name, so directory-handoff cannot trigger hive
    partition-column inference and the scan schema is identical
    either way. The local listdir check is one LIST per candidate
    dir — the same call Spark would make, paid once driver-side.

    The listdir check is check-then-use: Spark re-lists the directory
    at scan planning, so a file landing between the two listings would
    silently enter a pinned-version read. That cannot happen for dirs
    under the managed `data/` namespace — this module is the only
    writer there and every data file it creates is committed-or-temp-
    named — so collapse is RESTRICTED to `data/` and its batch
    subdirs. Dirs of ensure_snapshot-adopted external layouts (whose
    original writers may still exist) always go as explicit leaf
    paths: a post-adoption external write can then never leak into a
    snapshot read, only sit ignored on disk."""
    by_dir: dict[str, list[str]] = {}
    for f in files:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    out: list[str] = []

    def _managed(d: str) -> bool:
        # The managed convention is structural, not just the name
        # prefix: _write_data_files creates data/<12-hex>/ batch dirs
        # and NOTHING else — files sitting directly at data/ can only
        # be an adopted external layout's (this module never puts one
        # there), and an adopted layout's writer may still exist, so
        # handing Spark such a directory re-opens the check-then-use
        # race. Only a 12-hex second segment qualifies (sub-dirs below
        # a managed batch — partitioned segment writes — inherit it).
        parts = d.split(os.sep)
        if len(parts) < 2 or parts[0] != "data":
            return False
        seg = parts[1]
        return len(seg) == 12 and all(c in "0123456789abcdef" for c in seg)

    for d, members in by_dir.items():
        absdir = os.path.join(path, d)
        names = {os.path.basename(f) for f in members}
        try:
            # underscore/dot entries (_SUCCESS, .crc) are invisible to
            # Spark's file listing, so they don't disqualify the dir
            visible = [
                n for n in os.listdir(absdir) if not n.startswith(("_", "."))
            ]
        except OSError:
            visible = None
        safe = (
            _managed(d)
            and visible is not None
            and set(visible) == names
            and all("=" not in n for n in names)
        )
        if safe:
            out.append(absdir)
        else:
            out.extend(os.path.join(path, f) for f in members)
    return sorted(out)


def snapshot_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per live version: (version, n_files, is_latest) — the
    audit surface for time travel."""
    latest = latest_version(path)
    versions = _manifest_versions(path)
    # resolve in NUMERIC order with a memo: version v's live set is
    # its base's set + adds, so the walk is linear in versions
    resolved: dict[int, set[str]] = {}
    rows = []
    for v in versions:
        m = _load_manifest(path, v)
        if "files" in m:
            resolved[v] = set(m["files"])
        elif m["base"] in resolved:
            resolved[v] = resolved[m["base"]] | set(m["add"])
        else:  # pragma: no cover — base gap (shouldn't happen live)
            resolved[v] = set(files_of(path, v))
        rows.append((v, len(resolved[v]), v == latest))
    return spark.createDataFrame(rows, "version int, n_files int, is_latest boolean")


def vacuum(
    path: str, keep_versions: int = 2, min_age_s: float = 600.0
) -> list[str]:
    """Drop data files referenced only by expired versions (older than
    the newest `keep_versions`). Returns the deleted files. Metadata
    of expired versions is removed too, so time travel past the
    horizon fails loudly rather than reading half a version.

    Runs under the commit lock: the keep-set is computed from
    latest_version, so a commit landing mid-vacuum would otherwise be
    newer than `latest`, outside `keep`, and retired+deleted as
    "expired" — destroying a just-committed version. The lock also
    serializes vacuums with each other, which bounds the files_of
    retry loop (at most one materialize-then-retire window can move
    under a reader's walk at a time). Readers never take the lock;
    their protection is the materialize-before-retire order plus the
    files_of retry.

    `min_age_s` is the in-flight-writer grace (Delta's file-retention
    idea, scaled to this repo): a concurrent appender writes its data
    files BEFORE it takes the commit lock, so an un-manifested file is
    either an orphan from a dead writer or a commit that hasn't
    happened YET — and mtime is the only signal separating them.
    Files younger than the grace are left alone (they'll be someone's
    commit, or the next vacuum's orphans); pass 0 only when no writer
    can be concurrent (tests, offline maintenance)."""
    if not os.path.isdir(_manifest_dir(path)):
        return []  # not a snapshot table: no-op
    with _commit_lock(path):
        return _vacuum_locked(path, keep_versions, min_age_s)


def _vacuum_locked(
    path: str, keep_versions: int, min_age_s: float = 0.0
) -> list[str]:
    latest = latest_version(path)
    if latest == 0:
        return []  # nothing committed: no-op
    keep = set(range(max(1, latest - keep_versions + 1), latest + 1))
    live: set[str] = set()
    for v in keep:
        live.update(files_of(path, v))
    # Materialize the oldest KEPT version as a full manifest BEFORE
    # retiring anything below it: kept delta chains may pass through
    # expired versions, and deleting those would leave every kept
    # version unreadable. All later kept versions' chains stop at (or
    # above) this full manifest, so one materialization suffices. The
    # rewrite is a semantic no-op (same resolved file set, custom meta
    # preserved) and atomic, so a concurrent reader sees either form.
    oldest = min(keep)
    om = _load_manifest(path, oldest)
    if "files" not in om:
        om_full = {
            k: v for k, v in om.items() if k not in ("base", "depth", "add")
        }
        om_full["files"] = files_of(path, oldest)
        tmp = os.path.join(
            _manifest_dir(path), f".v{oldest}.mat.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w") as f:
            json.dump(om_full, f, indent=1)
        os.replace(tmp, os.path.join(_manifest_dir(path), f"v{oldest}.json"))
    deleted = []
    # walk the whole table (not just data/): a bootstrapped v1 lists
    # files at the table root, which must also age out. Metadata dirs
    # (term index, manifests, _spark_metadata) are never table data —
    # their files appear in no manifest and must not be deleted.
    # The walk can outlast _LOCK_STALE_S on a big table; refresh the
    # lock's mtime as we go or a waiting committer reclaims it as
    # stale mid-walk and commits a version this vacuum then destroys.
    lock = os.path.join(_manifest_dir(path), ".commit.lock")
    now = time.time()
    examined = 0
    # per-batch memos: one marker stat + at most one content walk per
    # batch dir, not per file (100k files -> ~100 stats, not 100k)
    _batch_freshness: dict[tuple[str, str], float] = {}
    _marker_age: dict[tuple[str, str], float | None] = {}
    for root, dirs, names in os.walk(path):
        if _is_metadata_path(root, path):
            continue
        for name in names:
            examined += 1
            if examined % 1000 == 0:
                with contextlib.suppress(OSError):
                    os.utime(lock)
            fpath = os.path.join(root, name)
            rel = os.path.relpath(fpath, path)
            if (
                name.endswith(".parquet")
                and not name.startswith(("_", "."))
                and rel not in live
            ):
                # a live in-flight marker protects its whole batch
                # REGARDLESS of file age (a large pre-commit write can
                # outlive any fixed grace); a stale marker is a dead
                # writer and its batch is orphan-swept. Liveness is
                # max(marker mtime, the batch's NEWEST file mtime): a
                # write longer than INFLIGHT_STALE_S keeps producing
                # files (Spark task commits land progressively), so an
                # actively-written batch stays fresh however long the
                # whole write takes — only a batch nothing has touched
                # for the stale window is a dead writer's.
                parts = rel.split(os.sep)
                if len(parts) >= 3 and parts[0] == "data":
                    batch_key = (parts[0], parts[1])
                    if batch_key in _marker_age:
                        m_age = _marker_age[batch_key]
                    else:
                        marker = _inflight_marker(path, parts[1])
                        try:
                            m_age = now - os.path.getmtime(marker)
                        except OSError:
                            m_age = None  # no marker: pre-protocol batch
                        _marker_age[batch_key] = m_age
                    if m_age is not None:
                        fresh = _batch_freshness.get(batch_key)
                        if fresh is None:
                            bdir = os.path.join(path, parts[0], parts[1])
                            newest = 0.0
                            for r2, _d2, n2 in os.walk(bdir):
                                for nm in n2:
                                    with contextlib.suppress(OSError):
                                        newest = max(
                                            newest,
                                            os.path.getmtime(
                                                os.path.join(r2, nm)
                                            ),
                                        )
                            fresh = now - newest if newest else m_age
                            _batch_freshness[batch_key] = fresh
                        if min(m_age, fresh) < INFLIGHT_STALE_S:
                            continue  # commit in progress
                if min_age_s > 0:
                    try:
                        age = now - os.path.getmtime(fpath)
                    except OSError:
                        continue  # vanished under us — nothing to delete
                    if age < min_age_s:
                        continue  # possibly a not-yet-committed write
                os.remove(fpath)
                deleted.append(rel)
    # retire stale in-flight markers (dead writers): their batches
    # were orphan-swept above (or never received a byte). Staleness
    # uses the same liveness rule as the sweep — marker OR batch
    # content recently touched means the writer may still be alive,
    # and stripping a live writer's marker would expose its files to
    # the next vacuum's age gate mid-write.
    data_dir = os.path.join(path, "data")
    if os.path.isdir(data_dir):
        for n in os.listdir(data_dir):
            if n.startswith(INFLIGHT_PREFIX):
                m = os.path.join(data_dir, n)
                with contextlib.suppress(OSError):
                    if now - os.path.getmtime(m) < INFLIGHT_STALE_S:
                        continue
                    bdir = os.path.join(data_dir, n[len(INFLIGHT_PREFIX):])
                    newest = 0.0
                    for r2, _d2, n2 in os.walk(bdir):
                        for nm in n2:
                            with contextlib.suppress(OSError):
                                newest = max(
                                    newest,
                                    os.path.getmtime(os.path.join(r2, nm)),
                                )
                    if newest and now - newest < INFLIGHT_STALE_S:
                        continue
                    os.remove(m)
    # fold custom meta keys (e.g. the streaming epoch) into the
    # watermark BEFORE deleting expired manifests: retiring a manifest
    # must not erase the exactly-once evidence max_committed_meta
    # relies on (a replayed epoch after a routine vacuum would
    # otherwise double-append)
    expired_metas = []
    expired_names = []
    for v in _manifest_versions(path):
        if v not in keep:
            with contextlib.suppress(OSError, json.JSONDecodeError):
                expired_metas.append(_load_manifest(path, v))
            expired_names.append(f"v{v}.json")
    if expired_metas:
        _fold_meta_watermarks(path, expired_metas)
    for mname in expired_names:
        os.remove(os.path.join(_manifest_dir(path), mname))
    return sorted(deleted)
