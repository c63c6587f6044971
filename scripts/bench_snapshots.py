#!/usr/bin/env python
"""Snapshot-layer scale spot-runs (COVERAGE.md "Snapshot manifest
scale" section) — puts measured numbers behind the round-5 delta
manifest design and the retry-rebase protocol at realistic file and
epoch counts.

    python scripts/bench_snapshots.py manifest   # 100k-file table
    python scripts/bench_snapshots.py epochs     # 1k-epoch compact + racing append
    python scripts/bench_snapshots.py replace    # scoped upsert + post-replace planning
    python scripts/bench_snapshots.py decontam   # sidecar-scoped retro decontamination
    python scripts/bench_snapshots.py upsert_spread  # value-scoped MERGE on hash keys

manifest — builds a table to 100k live files via 100 x 1000-file
delta appends (file payloads are hardlinks of one tiny parquet: the
benchmark measures METADATA cost, which is the layer under test),
printing per-commit time (manifest vs sidecar share) as the table
grows; then at 100k files: a 10-file delta append (the headline — it
must be flat), what a FULL manifest commit would cost at that size
(the pre-round-5 per-append cost), resolve/latest_version reads, an
8-way contended append, and read_table planning+count over all 100k
files.

epochs — 1000 committed rt micro-batch dirs (the streaming sink's
layout), then times compact() merging them into a snapshot-adopted
historical table WHILE a concurrent append_snapshot races it, and
asserts both commits landed with snapshot history intact.

replace — the round-6 seam measurements: a 100k-file table spread
over 100 batch dirs (the _write_data_files layout), sidecar key
ranges distinct per file, then (a) a sidecar-scoped upsert touching
1 file and one touching 100 files — wall time must track files
TOUCHED, not table size; (b) read planning immediately AFTER the
replace, when the touched batch dir holds not-yet-vacuumed replaced
files and falls back to explicit leaf paths while every clean dir
still collapses; (c) read planning after vacuum retires the replaced
files and the dir collapses again (vacuum IS the post-replace
planning cleanup).

decontam — the round-7/8 seam: decontaminate_table's sidecar-scoped
rewrite on a realistically built pipeline table — ~1k REAL parquet
files from hash-SORTED appends (the cleaning sink's write posture:
each epoch's files carry narrow canonical-hash ranges), a census
where a handful of hashes turn multi-source, then (a) the retro
delete must rewrite only the files whose range provably overlaps a
contaminated hash (bound: n_contam x n_epochs, nowhere near the
table); (b) a SECOND pass with fresh contaminated hashes must stay
equally scoped — this is the r8 ADVICE fix's evidence: the survivor
rewrite passes sort_by=[CANON_COL], so pass 1's output files keep
narrow ranges instead of degrading every later pass toward a full
rewrite.

Numbers are only comparable at similar single-thread spins (this box
throttles in phases; see bench.py).
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

FILES_PER_COMMIT = 1000
N_COMMITS = 100


def _spin() -> float:
    t0 = time.time()
    x = 0
    while x < 20_000_000:
        x += 1
    return round(time.time() - t0, 2)


def _seed_parquet(dest: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"k": [1], "v": [1.0]}), dest)


def manifest_bench(work: str) -> None:
    from indexr_spark.sources import segments, snapshots as S

    path = os.path.join(work, "t")
    os.makedirs(os.path.join(path, "data"))
    # one seed per 1000 links: filesystems cap hardlinks per inode (~65k)
    seeds: dict[int, str] = {}

    def seed_for(file_id: int) -> str:
        s = seeds.get(file_id // 1000)
        if s is None:
            s = os.path.join(work, f"seed{file_id // 1000}.parquet")
            _seed_parquet(s)
            seeds[file_id // 1000] = s
        return s

    # instrument the sidecar share of each commit
    sidecar_t = {"s": 0.0}
    real_write_sidecar = segments.write_sidecar

    def timed_sidecar(*a, **k):
        t0 = time.time()
        try:
            return real_write_sidecar(*a, **k)
        finally:
            sidecar_t["s"] += time.time() - t0

    # _commit imports write_sidecar from segments at call time, so the
    # segments module attribute is the patch point
    segments.write_sidecar = timed_sidecar  # type: ignore[assignment]

    print(f"building {N_COMMITS * FILES_PER_COMMIT} files via "
          f"{N_COMMITS} x {FILES_PER_COMMIT}-file delta appends", flush=True)
    next_id = 0
    batch_no = 0

    def new_batch() -> str:
        # managed-convention batch dirs (data/<12-hex>): _scan_paths'
        # structural collapse check (review fix) only collapses these
        nonlocal batch_no
        d = f"{batch_no:012x}"
        batch_no += 1
        os.makedirs(os.path.join(path, "data", d), exist_ok=True)
        return d

    # 33/65/97 are the FULL_REWRITE_EVERY=32 materialization commits —
    # the amortized O(files) sidecar+full-manifest writes
    report_at = {1, 10, 33, 50, 65, 97, N_COMMITS}
    for c in range(1, N_COMMITS + 1):
        rels = []
        bd = new_batch()
        for _ in range(FILES_PER_COMMIT):
            rel = os.path.join("data", bd, f"f{next_id:06d}.parquet")
            os.link(seed_for(next_id), os.path.join(path, rel))
            rels.append(rel)
            next_id += 1
        sidecar_t["s"] = 0.0
        t0 = time.time()
        S._commit(path, rels, delta=True)
        dt = time.time() - t0
        if c in report_at:
            print(
                f"commit#{c:3d}  live={next_id:6d}  {dt:.2f}s total "
                f"(sidecar {sidecar_t['s']:.2f}s, manifest {dt - sidecar_t['s']:.2f}s)",
                flush=True,
            )
    top = S.latest_version(path)
    live = S.files_of(path, top)
    assert len(live) == N_COMMITS * FILES_PER_COMMIT, len(live)

    # headline: a small append at 100k live files must be flat
    rels = []
    bd = new_batch()
    for _ in range(10):
        rel = os.path.join("data", bd, f"f{next_id:06d}.parquet")
        os.link(seed_for(next_id), os.path.join(path, rel))
        rels.append(rel)
        next_id += 1
    sidecar_t["s"] = 0.0
    t0 = time.time()
    S._commit(path, rels, delta=True)
    dt = time.time() - t0
    print(f"10-file DELTA append at 100k files: {dt:.2f}s "
          f"(sidecar {sidecar_t['s']:.2f}s, manifest {dt - sidecar_t['s']:.2f}s)  "
          f"spin={_spin()}", flush=True)

    # the pre-round-5 cost: a FULL manifest commit at the same size
    sidecar_t["s"] = 0.0
    t0 = time.time()
    S._commit(path, S.files_of(path, S.latest_version(path)))
    dt = time.time() - t0
    print(f"FULL-manifest commit at 100k files (pre-r5 append cost): "
          f"{dt:.2f}s (sidecar {sidecar_t['s']:.2f}s)", flush=True)

    for label, fn in (
        ("latest_version", lambda: S.latest_version(path)),
        ("files_of(latest)", lambda: S.files_of(path, S.latest_version(path))),
    ):
        t0 = time.time()
        fn()
        print(f"{label}: {time.time() - t0:.3f}s", flush=True)

    # contended appends: 8 threads race 10-file deltas through the
    # retry-rebase protocol (local lock ON — the deployment posture)
    rel_sets = []
    for _ in range(8):
        rels = []
        bd = new_batch()
        for _ in range(10):
            rel = os.path.join("data", bd, f"f{next_id:06d}.parquet")
            os.link(seed_for(next_id), os.path.join(path, rel))
            rels.append(rel)
            next_id += 1
        rel_sets.append(rels)
    before = S.latest_version(path)
    errors: list[Exception] = []
    barrier = threading.Barrier(8)

    def commit_one(rels):
        try:
            barrier.wait()
            S._commit(path, rels, delta=True)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=commit_one, args=(r,)) for r in rel_sets]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    assert not errors, errors
    final = set(S.files_of(path, S.latest_version(path)))
    assert all(r in final for rels in rel_sets for r in rels)
    assert S.latest_version(path) == before + 8
    print(f"8-way contended 10-file appends at 100k files: {dt:.2f}s "
          f"wall, all landed, no conflicts  spin={_spin()}", flush=True)

    # read planning + count over the 100k-file snapshot
    from indexr_spark.session import get_spark

    spark = get_spark(app_name="bench-snapshots",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    live = S.files_of(path, S.latest_version(path))
    spaths = S._scan_paths(path, live)
    t0 = time.time()
    df = S.read_snapshot(spark, path)
    plan_dt = time.time() - t0
    t0 = time.time()
    n = df.count()
    print(f"read_snapshot at 100k files: plan {plan_dt:.1f}s "
          f"({len(live)} files collapsed to {len(spaths)} scan paths), "
          f"count()={n} in {time.time() - t0:.1f}s  spin={_spin()}", flush=True)
    spark.stop()


def replace_bench(work: str) -> None:
    import json

    from indexr_spark.sources import snapshots as S
    from indexr_spark.sources.segments import SIDECAR_NAME

    path = os.path.join(work, "t")
    os.makedirs(os.path.join(path, "data"))
    seeds: dict[int, str] = {}

    def seed_for(file_id: int) -> str:
        s = seeds.get(file_id // 1000)
        if s is None:
            s = os.path.join(work, f"seed{file_id // 1000}.parquet")
            _seed_parquet(s)
            seeds[file_id // 1000] = s
        return s

    print("building 100k files across 100 batch dirs "
          "(100 x 1000-file delta appends)", flush=True)
    next_id = 0
    t0 = time.time()
    for c in range(N_COMMITS):
        # 12-hex batch-dir names: _scan_paths' directory collapse is
        # now STRUCTURAL (only _write_data_files' data/<12-hex>
        # convention collapses — review fix for adopted layouts), so
        # the synthetic dirs must follow the managed convention or
        # the read-planning rows here would silently measure the
        # explicit-leaf-path fallback instead
        d = f"{c:012x}"
        os.makedirs(os.path.join(path, "data", d))
        rels = []
        for _ in range(FILES_PER_COMMIT):
            rel = os.path.join("data", d, f"f{next_id:06d}.parquet")
            os.link(seed_for(next_id), os.path.join(path, rel))
            rels.append(rel)
            next_id += 1
        S._commit(path, rels, delta=True)
    # a full commit refreshes the sidecar over all live files
    S._commit(path, S.files_of(path, S.latest_version(path)))
    print(f"built in {time.time() - t0:.1f}s  spin={_spin()}", flush=True)

    # The build hardlinks ONE payload (this is a metadata bench), so
    # every real footer says k=1. The scoped upsert's input is the
    # SIDECAR, so give it the ranges a real table would have: file i
    # holds k=i. The one file each update targets is then provable
    # from stats alone, exactly as on a production table.
    scpath = os.path.join(path, SIDECAR_NAME)
    with open(scpath) as f:
        sc = json.load(f)
    for e in sc["files"]:
        i = int(e["path"].rsplit("f", 1)[1][:6])
        e["columns"]["k"] = {"min": i, "max": i, "null_count": 0, "type": "int"}
    with open(scpath, "w") as f:
        json.dump(sc, f)

    from indexr_spark.session import get_spark

    spark = get_spark(app_name="bench-replace",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.range(100).count()

    live0 = S.files_of(path, S.latest_version(path))

    # (a) scoped upsert cost vs files touched — 1 file, then ~100
    # (file i holds k=i per the sidecar, so keys pick files directly)
    for n_touch, lo in ((1, 42), (100, 10_000)):
        keys = list(range(lo, lo + n_touch))
        upd = spark.createDataFrame([(k, float(k)) for k in keys],
                                    "k long, v double")
        t0 = time.time()
        v = S.upsert_snapshot(spark, path, upd, ["k"])
        dt = time.time() - t0
        after = set(S.files_of(path, v))
        touched = sum(1 for f in live0 if f not in after)
        print(f"scoped upsert touching {n_touch} keys at 100k files: "
              f"{dt:.2f}s (rewrote {touched} files)  spin={_spin()}",
              flush=True)
        live0 = S.files_of(path, v)

    # (b) read planning immediately after the replace: the touched
    # dirs hold replaced files awaiting vacuum -> explicit leaf paths
    # for THOSE dirs only; clean dirs still collapse
    live = S.files_of(path, S.latest_version(path))
    spaths = S._scan_paths(path, live)
    n_dirs = sum(1 for p in spaths if os.path.isdir(p))
    t0 = time.time()
    df = S.read_snapshot(spark, path)
    plan_dt = time.time() - t0
    t0 = time.time()
    n = df.count()
    print(f"post-replace read at 100k files: plan {plan_dt:.1f}s "
          f"({len(live)} files -> {len(spaths)} scan paths, {n_dirs} dirs + "
          f"{len(spaths) - n_dirs} leaves), count()={n} in "
          f"{time.time() - t0:.1f}s  spin={_spin()}", flush=True)

    # (c) vacuum retires the replaced files; dirty dirs collapse again
    t0 = time.time()
    deleted = S.vacuum(path, keep_versions=1, min_age_s=0)
    vac_dt = time.time() - t0
    live = S.files_of(path, S.latest_version(path))
    spaths = S._scan_paths(path, live)
    n_dirs = sum(1 for p in spaths if os.path.isdir(p))
    t0 = time.time()
    df = S.read_snapshot(spark, path)
    plan_dt = time.time() - t0
    print(f"after vacuum ({len(deleted)} files retired in {vac_dt:.1f}s): "
          f"plan {plan_dt:.1f}s ({len(live)} files -> {len(spaths)} scan "
          f"paths, {n_dirs} dirs + {len(spaths) - n_dirs} leaves)  "
          f"spin={_spin()}", flush=True)
    spark.stop()




def decontam_bench(work: str) -> None:
    """decontaminate_table at ~1k files (see module docstring)."""
    import hashlib

    from indexr_spark.session import get_spark
    from indexr_spark.sources import snapshots as S
    from indexr_spark.streaming.pipeline import CANON_COL, decontaminate_table

    spark = get_spark(app_name="bench-decontam",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.range(100).count()

    table = os.path.join(work, "clean")
    cdir = os.path.join(work, "clean_census")
    n_epochs, rows_per_epoch = 30, 20_000

    def canon(i: int) -> str:
        return hashlib.md5(str(i).encode()).hexdigest()

    print(f"building {n_epochs} hash-sorted epochs x {rows_per_epoch} rows "
          "(the cleaning sink's append posture)", flush=True)
    t0 = time.time()
    for ep in range(n_epochs):
        lo = ep * rows_per_epoch
        rows = [(lo + i, canon(lo + i), "s0") for i in range(rows_per_epoch)]
        df = spark.createDataFrame(
            rows, f"doc_id long, {CANON_COL} string, source string"
        )
        S.append_snapshot(df, table, sort_by=[CANON_COL],
                          meta={"epoch_bench": ep})
        S.append_snapshot(df.select(CANON_COL, "source"), cdir,
                          sort_by=[CANON_COL], meta={"epoch_bench": ep})
    live0 = S.files_of(table, S.latest_version(table))
    print(f"built {len(live0)} files in {time.time() - t0:.1f}s  "
          f"spin={_spin()}", flush=True)

    def contaminate(doc_ids: list[int]) -> None:
        rows = [(canon(i), "s1") for i in doc_ids]
        S.append_snapshot(
            spark.createDataFrame(rows, f"{CANON_COL} string, source string"),
            cdir, sort_by=[CANON_COL],
        )

    n_contam = 5
    for pass_no, lo in ((1, 17), (2, 300_017)):
        ids = [lo + 7 * j for j in range(n_contam)]
        contaminate(ids)
        live_before = set(S.files_of(table, S.latest_version(table)))
        rows_before = S.read_snapshot(spark, table).count()
        t0 = time.time()
        v = decontaminate_table(spark, table, census_dir=cdir)
        dt = time.time() - t0
        after = set(S.files_of(table, v))
        rewritten = sum(1 for f in live_before if f not in after)
        rows_after = S.read_snapshot(spark, table).count()
        bound = n_contam * n_epochs
        print(f"pass {pass_no}: decontaminate {n_contam} hashes at "
              f"{len(live_before)} files: {dt:.1f}s, rewrote {rewritten} "
              f"files (bound {bound}), rows {rows_before} -> {rows_after}  "
              f"spin={_spin()}", flush=True)
        assert rows_after == rows_before - n_contam, (rows_before, rows_after)
        assert rewritten <= bound, (
            f"rewrite not scoped: {rewritten} files > bound {bound} — "
            "survivor files lost their hash clustering?"
        )
    # the pass-2 assertion above IS the sort_by regression gate: if
    # decontaminate_table's survivor rewrite dropped the hash sort,
    # pass 1's output files would span the whole hash range and pass 2
    # would rewrite them all (>> bound).
    spark.stop()


def upsert_spread_bench(work: str) -> None:
    """The MERGE twin of decontam: upsert_snapshot keyed on hash-like
    keys at ~1k-file scale. The updates' global [min,max] spans
    essentially the whole hex space, so range-only scoping (the
    pre-r8 behavior, reproduced here by monkeypatching away the value
    list) must degenerate toward a full-table rewrite, while the
    shipped per-file key-set membership rewrites only the files
    actually holding the updated keys."""
    import hashlib

    from indexr_spark.session import get_spark
    from indexr_spark.sources import snapshots as S

    spark = get_spark(app_name="bench-upsert-spread",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.range(100).count()

    table = os.path.join(work, "store")
    n_epochs, rows_per_epoch = 30, 20_000

    def canon(i: int) -> str:
        return hashlib.md5(str(i).encode()).hexdigest()

    print(f"building {n_epochs} hash-sorted epochs x {rows_per_epoch} "
          "rows (the fingerprint-store append posture)", flush=True)
    t0 = time.time()
    for ep in range(n_epochs):
        lo = ep * rows_per_epoch
        rows = [(lo + i, canon(lo + i), 0) for i in range(rows_per_epoch)]
        df = spark.createDataFrame(rows, "doc_id long, h string, v int")
        S.append_snapshot(df, table, sort_by=["h"], meta={"epoch_bench": ep})
    live0 = S.files_of(table, S.latest_version(table))
    print(f"built {len(live0)} files in {time.time() - t0:.1f}s  "
          f"spin={_spin()}", flush=True)

    n_keys = 5
    real_values = S._update_key_values
    real_probe = S._probe_touched_files

    def merge_pass(pass_no: int, lo: int, mode: str, bound: int) -> None:
        upd = [(lo + 7 * j, canon(lo + 7 * j), pass_no)
               for j in range(n_keys)]
        upd += [(10**9 + pass_no, f"zzzz_new_{pass_no}", pass_no)]
        live = set(S.files_of(table, S.latest_version(table)))
        n_rows = S.read_snapshot(spark, table).count()
        if mode == "range-only":
            S._update_key_values = lambda u, k, cap=0: {c: None for c in k}
        if mode in ("range-only", "sidecar-values"):
            S._probe_touched_files = lambda sp, p, cand, *a: cand
        try:
            t0 = time.time()
            v = S.upsert_snapshot(
                spark, table,
                spark.createDataFrame(upd, "doc_id long, h string, v int"),
                ["h"], sort_by=["h"],
            )
            dt = time.time() - t0
        finally:
            S._update_key_values = real_values
            S._probe_touched_files = real_probe
        after = set(S.files_of(table, v))
        rewritten = sum(1 for f in live if f not in after)
        print(f"pass {pass_no} ({mode}): upsert {n_keys}+1 spread "
              f"keys at {len(live)} files: {dt:.1f}s, rewrote {rewritten} "
              f"files (bound {bound})  spin={_spin()}", flush=True)
        rows = {r.h: r.v for r in S.read_snapshot(spark, table)
                .filter(f"v = {pass_no}").collect()}
        assert set(rows) == {h for _, h, _ in upd}, sorted(rows)[:8]
        assert S.read_snapshot(spark, table).count() == n_rows + 1
        assert rewritten <= bound, (mode, rewritten, bound)
        if mode == "range-only":
            assert rewritten > len(live) // 2, (
                f"range-only unexpectedly scoped: {rewritten}")

    # The scoping tiers on an epoch-fragmented layout (each epoch's
    # files tile the WHOLE hex space):
    #   range-only          — the updates' global [min,max] overlaps
    #                         every file: full-table rewrite.
    #   sidecar-values      — per-file [min,max] membership of each
    #                         key: ~1 file per key per EPOCH
    #                         (bound keys x epochs — the decontam
    #                         bench's bound).
    #   shipped (+ probe)   — _probe_touched_files reads ONLY the
    #                         candidates' key column and pins the
    #                         rewrite to files actually holding a
    #                         key: keys x 1, independent of epochs.
    merge_pass(1, 17, "sidecar-values", bound=n_keys * n_epochs)
    merge_pass(2, 300_017, "shipped", bound=n_keys + 1)
    merge_pass(3, 500_017, "shipped", bound=n_keys + 1)

    # A sort-compact re-tiles the table into disjoint narrow ranges
    # (the maintenance posture for any hash-keyed store — same job as
    # census compaction): the sidecar alone then scopes to keys x 1
    # and the probe's candidate set is already minimal.
    base = S.latest_version(table)
    t0 = time.time()
    S.write_snapshot(S.read_snapshot(spark, table), table,
                     sort_by=["h"], expect_parent=base)
    n_files = len(S.files_of(table, S.latest_version(table)))
    print(f"sort-compact to {n_files} disjoint-range files: "
          f"{time.time() - t0:.1f}s  spin={_spin()}", flush=True)
    merge_pass(4, 400_017, "shipped", bound=n_keys + 1)

    # the degenerate baseline LAST (it rewrites the whole table)
    merge_pass(5, 150_017, "range-only", bound=10**9)
    spark.stop()


def epochs_bench(work: str) -> None:
    from indexr_spark.session import get_spark
    from indexr_spark.sources import snapshots as S
    from indexr_spark.sources.catalog import Catalog, ColumnSpec, TableSpec
    from indexr_spark.streaming.ingest import compact

    import pyarrow as pa
    import pyarrow.parquet as pq

    cat = Catalog(os.path.join(work, "cat"))
    spec = TableSpec(
        name="metrics",
        columns=[ColumnSpec("k", "int"), ColumnSpec("v", "double")],
        sort_by=["k"],
    )
    cat.save(spec)

    # 1000 committed rt micro-batch dirs (the streaming sink layout)
    rt = cat.rt_dir("metrics")
    print("writing 1000 rt epoch dirs...", flush=True)
    for e in range(1000):
        d = os.path.join(rt, f"batch={e}")
        os.makedirs(d)
        pq.write_table(
            pa.table({"k": [e, e + 1], "v": [float(e), float(e) + 0.5]}),
            os.path.join(d, "part-0.parquet"),
        )
        open(os.path.join(d, "_SUCCESS"), "w").close()

    # snapshot-adopted historical table (compact must APPEND through
    # the manifest)
    tdir = cat.table_dir("metrics")
    os.makedirs(tdir, exist_ok=True)
    pq.write_table(pa.table({"k": [-1], "v": [-1.0]}), os.path.join(tdir, "h0.parquet"))
    S.ensure_snapshot(tdir)

    spark = get_spark(app_name="bench-epochs",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.range(100).count()

    # racing append_snapshot while compact() runs — both must land
    result: dict = {}
    errors: list[Exception] = []

    def racer():
        try:
            df = spark.createDataFrame([(10**6, 6.0)], "k int, v double")
            time.sleep(0.5)  # land mid-compaction
            result["append_v"] = S.append_snapshot(df, tdir)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    th = threading.Thread(target=racer)
    t0 = time.time()
    th.start()
    moved = compact(spark, cat, "metrics")
    dt = time.time() - t0
    th.join()
    assert not errors, errors
    print(f"compact() of 1000 epochs: {moved} rows in {dt:.1f}s "
          f"with a racing append (landed as v{result['append_v']})  "
          f"spin={_spin()}", flush=True)

    hist = S.snapshot_history(spark, tdir).collect()
    versions = sorted(r.version for r in hist)
    assert versions == list(range(1, len(versions) + 1)), versions
    total = S.read_snapshot(spark, tdir).count()
    # 1000 epochs x 2 rows + historical seed + the racer's row
    assert total == 2000 + 1 + 1, total
    print(f"history intact: versions {versions}, rows={total}", flush=True)
    spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "manifest"
    work = f"/tmp/bench_snapshots_{which}"
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    print(f"workdir {work}  spin={_spin()}", flush=True)
    {"manifest": manifest_bench, "epochs": epochs_bench,
     "replace": replace_bench, "decontam": decontam_bench,
     "upsert_spread": upsert_spread_bench}[which](work)
