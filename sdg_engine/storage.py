"""Physical table layout (SURVEY.md §4 "Physical-layout decisions",
hard part 5): Iceberg-compatible partitioning on local parquet.

Design scale (10^12 rows): the images table is written partitioned by
``bucket(cell_id at BUCKET_LEVEL)`` and SORTED by ``cell_id`` within
files, so that (a) per-cell work prunes partitions at scan time and
(b) parquet min/max row-group stats skip within files — the stand-in
for Iceberg's bucket partition transform + sort order.  The real
Iceberg catalog path is config-gated (`format="iceberg"`) and needs
the runtime jars a cluster would ship; this sandbox has none
(SURVEY.md §0), so local tests run the parquet layout and assert the
pruning behavior that carries over 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_LEVEL = 7
N_BUCKETS = 16


def write_images_layout(
    images_geo: DataFrame, path: str, n_buckets: int = N_BUCKETS,
    fmt: str = "parquet",
) -> None:
    """Write partitioned-by-cell-bucket, sorted-by-cell layout."""
    from .ops.spatial import with_point_cell

    df = with_point_cell(images_geo, BUCKET_LEVEL, "lon", "lat", "cell_l7")
    df = df.withColumn(
        "cell_bucket", F.pmod(F.xxhash64("cell_l7"), F.lit(n_buckets)).cast("int")
    )
    (
        df.repartition("cell_bucket")
        .sortWithinPartitions("cell_l7")
        .write.mode("overwrite")
        .partitionBy("cell_bucket")
        .format(fmt)
        .save(path)
    )


def read_images_layout(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def xxhash64_long(values, seed: int = 42):
    """Numpy twin of Spark's ``xxhash64(bigint)`` (XXH64 single-long path,
    default seed 42) — lets the DRIVER compute bucket assignments without
    a Spark job.  Verified bit-equal against F.xxhash64 in tests.

    Returns signed int64, like the Spark expression."""
    import numpy as np

    v = np.asarray(values, dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = np.uint64((seed + _P5 + 8) & _M64)
        k1 = v * np.uint64(_P2)
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))  # rotl 31
        k1 = k1 * np.uint64(_P1)
        h = h ^ k1
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * np.uint64(_P1) + np.uint64(_P4)
        h ^= h >> np.uint64(33)
        h = h * np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h = h * np.uint64(_P3)
        h ^= h >> np.uint64(32)
    return h.astype(np.int64)


def cells_to_buckets(cells, n_buckets: int = N_BUCKETS):
    """Driver-side helper: which partitions can contain these cells —
    the pruning predicate a query pushes into the partitioned scan
    (``F.col("cell_bucket").isin(cells_to_buckets(cover_cells))``).

    Matches the write side's ``pmod(xxhash64(cell), n_buckets)``."""
    import numpy as np

    h = xxhash64_long(cells)
    return sorted({int(b) for b in np.mod(h, n_buckets)})  # np.mod = pmod


def read_images_for_cells(
    spark: SparkSession, path: str, cells, n_buckets: int = N_BUCKETS,
    fmt: str = "parquet",
) -> DataFrame:
    """Partition-pruned read of the bucketed images layout for a cell
    set (e.g. a country's compacted cover uncompacted to BUCKET_LEVEL):
    the DRIVER computes the bucket set via the xxhash64 twin — no Spark
    job — and the filter prunes partitions at scan time
    (PartitionFilters; pinned in test_plans).  The residual exact
    cell-membership test stays on the query (buckets are a superset)."""
    buckets = cells_to_buckets(cells, n_buckets)
    df = read_images_layout(spark, path, fmt)
    return df.filter(F.col("cell_bucket").isin(buckets))


def write_bucketed_table(
    df: DataFrame, table: str, key: str, n_buckets: int = 64,
    sort: bool = True, fmt: str = "parquet",
) -> None:
    """Spark-native bucketed table (Iceberg ``bucket(N, key)`` stand-in):
    both sides of a cell equi-join written with the SAME (key, N) join
    WITHOUT any exchange — the shuffle is paid once at write time, then
    every subsequent join/aggregation on the key is co-located by
    layout.  This is the flagship's scale path when the road cover
    exceeds the broadcast threshold (a planet-scale road network cannot
    build-side-broadcast)."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale managed-table directory (from a previous session whose
    # catalog is gone) blocks saveAsTable with LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if loc and os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# Snapshot commits + time travel (Iceberg metadata shape on local parquet;
# r04).  The real catalog path stays config-gated (module docstring) —
# this is the metadata PROTOCOL: immutable data directories + an atomic
# manifest commit per snapshot, so readers get time travel and writers
# get safe concurrent commits, without any table service.
# ---------------------------------------------------------------------------


def _manifest_dir(path: str) -> str:
    """Pure path helper — READS must not create directories as a side
    effect (r04 review: read_snapshot on a typo'd path used to mkdir
    it before raising)."""
    import os

    return os.path.join(path, "manifests")


def snapshot_history(path: str) -> list[int]:
    """Committed snapshot ids, ascending (empty for a fresh table)."""
    import os

    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _read_manifest(path: str, snap_id: int) -> dict:
    import json
    import os

    with open(os.path.join(_manifest_dir(path), f"{snap_id}.json")) as f:
        return json.load(f)


def _merge_schema(parent_json: dict | None, new_schema) -> dict:
    """Iceberg-style ADD-COLUMN schema evolution (r05): the committed
    table schema is the parent's fields (in their original order) plus
    any fields the new snapshot introduces, appended.  A name collision
    with a DIFFERENT type is a real evolution conflict and raises —
    silent type widening is how tables rot.  Returns schema JSON for
    the manifest."""
    from pyspark.sql.types import StructType

    if parent_json is None:
        return new_schema.jsonValue()
    parent = StructType.fromJson(parent_json)
    have = {f.name: f for f in parent.fields}
    out = list(parent.fields)
    for f in new_schema.fields:
        if f.name in have:
            if have[f.name].dataType != f.dataType:
                raise ValueError(
                    f"schema evolution conflict on {f.name!r}: "
                    f"{have[f.name].dataType} vs {f.dataType}"
                )
        else:
            out.append(f)
    return StructType(out).jsonValue()


def _file_stats(data_dir: str, cols: list[str]) -> list[dict]:
    """Per-data-file column min/max ZONE MAPS from the parquet footers
    (file-level metadata only — exactly what an Iceberg manifest's
    lower_bounds/upper_bounds carry).  Driver-side by design: the
    commit path already owns the file listing, and footer reads are
    O(files), not O(rows).  A column missing stats in any row group is
    simply not recorded for that file (⇒ the file is never pruned —
    fail-open, the only safe direction for data skipping)."""
    import os

    import pyarrow.parquet as pq

    names = []
    for root, _dirs, files in os.walk(data_dir):
        rel = os.path.relpath(root, data_dir)
        for f in files:
            if f.endswith(".parquet"):
                names.append(f if rel == "." else os.path.join(rel, f))
    out = []
    for name in sorted(names):
        # hive-layout partition values ride the manifest too: the
        # identity-partition half of Iceberg pruning (dir-name k=v
        # segments), alongside the zone-map half (footer min/max)
        parts = dict(
            seg.split("=", 1)
            for seg in name.split(os.sep)[:-1]
            if "=" in seg
        )
        md = pq.ParquetFile(os.path.join(data_dir, name)).metadata
        stats: dict = {}
        complete: dict = {}
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                nm = col.path_in_schema
                if nm not in cols:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max or isinstance(st.min, bytes):
                    complete[nm] = False
                    continue
                complete.setdefault(nm, True)
                cur = stats.get(nm)
                if cur is None:
                    stats[nm] = [st.min, st.max]
                else:
                    stats[nm] = [min(cur[0], st.min), max(cur[1], st.max)]
        out.append({
            "file": name,
            "rows": md.num_rows,
            "parts": parts,
            "stats": {k: v for k, v in stats.items() if complete.get(k)},
        })
    return out


def read_snapshot_pruned(spark: SparkSession, path: str, col: str,
                         lo, hi, as_of: int | None = None):
    """ZONE-MAP data skipping: read snapshot ``as_of`` touching only
    the data files whose [min, max] for ``col`` intersects [lo, hi]
    (closed interval) — the manifest-level file pruning a real Iceberg
    reader does before the scan ever starts.  Files without committed
    stats for ``col`` are always read (fail-open).  Returns
    ``(df, files_scanned, files_total)``; the caller still applies the
    row-level residual predicate (zone maps prune FILES, not rows).
    """
    import os

    hist = snapshot_history(path)
    if not hist:
        raise ValueError(f"no snapshots at {path}")
    snap_id = hist[-1] if as_of is None else as_of
    m = _read_manifest(path, snap_id)
    files_map = m.get("files") or {}
    keep: list[str] = []
    total = 0
    for d in m["dirs"]:
        entries = files_map.get(d)
        if entries is None:
            raise ValueError(
                f"snapshot {snap_id} has no zone-map stats for {d} "
                f"(commit with write_snapshot(..., stats_cols=[...]))"
            )
        for e in entries:
            total += 1
            s = (e.get("stats") or {}).get(col)
            if s is None or not (s[1] < lo or s[0] > hi):
                keep.append(os.path.join(d, e["file"]))
    df = spark.read.parquet(*keep)
    return df, len(keep), total


def write_snapshot(df: DataFrame, path: str, mode: str = "append",
                   stats_cols: list[str] | None = None,
                   partition_by: list[str] | None = None) -> int:
    """Commit ``df`` as a new snapshot of the table at ``path``.

    Data files land in an immutable per-snapshot directory
    (``data/snap-<uuid>``); the snapshot is COMMITTED by hard-linking a
    manifest JSON into ``manifests/<id>.json`` — link(2) fails with
    EEXIST if another writer took the id, and the loser retries against
    the newer parent (optimistic concurrency, the Iceberg commit
    protocol in miniature).  ``append`` snapshots reference the
    parent's data dirs + the new one; ``overwrite`` references only the
    new one.  Returns the committed snapshot id (1-based)."""
    import json
    import os
    import uuid

    assert mode in ("append", "overwrite")
    data_dir = os.path.join(path, "data", f"snap-{uuid.uuid4().hex[:12]}")
    if partition_by:
        df.write.mode("error").partitionBy(*partition_by).parquet(data_dir)
    else:
        df.write.mode("error").parquet(data_dir)
    new_stats = (
        _file_stats(data_dir, stats_cols or [])
        if (stats_cols or partition_by) else None
    )
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)  # writes may create; reads never do
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:12]}")
    try:
        while True:
            hist = snapshot_history(path)
            snap_id = (hist[-1] + 1) if hist else 1
            dirs = [data_dir]
            schema_json = df.schema.jsonValue()
            if mode == "append" and hist:
                parent_m = _read_manifest(path, hist[-1])
                dirs = parent_m["dirs"] + dirs
                # add-column evolution: appends commit the MERGED schema
                # so every snapshot's manifest is self-describing (r05)
                schema_json = _merge_schema(
                    parent_m.get("schema"), df.schema
                )
            # zone maps ride the manifest: new dir's footer stats plus
            # every parent dir's stats carried forward (append keeps
            # old files prunable without re-reading their footers)
            files_json: dict = {}
            if mode == "append" and hist:
                files_json.update(parent_m.get("files") or {})
            if new_stats is not None:
                files_json[data_dir] = new_stats
            with open(tmp, "w") as f:
                json.dump({"snapshot_id": snap_id,
                           "parent": hist[-1] if hist else None,
                           "mode": mode, "dirs": dirs,
                           "files": files_json,
                           "schema": schema_json}, f)
            try:
                os.link(tmp, os.path.join(mdir, f"{snap_id}.json"))
                return snap_id
            except FileExistsError:
                continue  # lost the race — recompute against the new head
    finally:
        if os.path.exists(tmp):  # never leave a .tmp behind (review)
            os.remove(tmp)


def read_snapshot_partitioned(spark: SparkSession, path: str, eq: dict,
                              as_of: int | None = None):
    """IDENTITY-PARTITION pruning (the other half of Iceberg data
    skipping, next to ``read_snapshot_pruned``'s zone maps): keep only
    the data files whose hive-layout partition values match every
    ``eq`` key — the manifest carries the dir-name ``k=v`` segments, so
    pruning happens before Spark plans the scan.  Values compare as
    their hive dir-name strings; files with no recorded value for a key
    are always read (fail-open).  Reads set ``basePath`` per data dir
    so Spark still derives the partition columns from the kept leaf
    files.  Returns ``(df, files_scanned, files_total)``.
    """
    import os
    from functools import reduce

    hist = snapshot_history(path)
    if not hist:
        raise ValueError(f"no snapshots at {path}")
    snap_id = hist[-1] if as_of is None else as_of
    m = _read_manifest(path, snap_id)
    files_map = m.get("files") or {}
    keep_by_dir: dict[str, list[str]] = {}
    total = 0
    for d in m["dirs"]:
        entries = files_map.get(d)
        if entries is None:
            raise ValueError(
                f"snapshot {snap_id} has no file manifest for {d} "
                f"(commit with write_snapshot(..., partition_by=[...]))"
            )
        for e in entries:
            total += 1
            parts = e.get("parts") or {}
            if all(parts.get(k, str(v)) == str(v) for k, v in eq.items()):
                keep_by_dir.setdefault(d, []).append(
                    os.path.join(d, e["file"])
                )
    if not keep_by_dir:
        raise ValueError(f"no files match partitions {eq} at {path}")
    dfs = [
        spark.read.option("basePath", d).parquet(*fl)
        for d, fl in sorted(keep_by_dir.items())
    ]
    df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    n_scan = sum(len(v) for v in keep_by_dir.values())
    return df, n_scan, total


def read_snapshot(spark: SparkSession, path: str,
                  as_of: int | None = None,
                  schema_as_of: int | None = None) -> DataFrame:
    """Time-travel read: the table AS OF snapshot ``as_of`` (default:
    current head).  Reads exactly the data directories the manifest
    committed — later snapshots never touch them (immutability is what
    makes the old read reproducible).

    ``schema_as_of`` (r05): read ``as_of``'s DATA under a different
    snapshot's committed schema — Iceberg's 'old snapshot, current
    schema' read; columns added after ``as_of`` come back NULL."""
    hist = snapshot_history(path)
    if not hist:
        raise ValueError(f"no snapshots committed at {path!r}")
    snap_id = hist[-1] if as_of is None else as_of
    if snap_id not in hist:
        raise ValueError(f"snapshot {snap_id} not in history {hist}")
    m = _read_manifest(path, snap_id)
    if schema_as_of is not None:
        if schema_as_of not in hist:
            raise ValueError(f"snapshot {schema_as_of} not in history {hist}")
        m["schema"] = _read_manifest(path, schema_as_of).get("schema")
    if m.get("schema") is not None:
        # read under the manifest's (evolution-merged) schema: files
        # from pre-evolution snapshots simply lack the added columns
        # and the parquet reader fills them with NULL — no mergeSchema
        # footer sweep (which scans EVERY file's footer; at 10^6 data
        # files that is its own job), the manifest already knows.
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        return spark.read.schema(schema).parquet(*m["dirs"])
    return spark.read.parquet(*m["dirs"])  # pre-r05 manifest


def merge_snapshot(spark: SparkSession, path: str, updates: DataFrame,
                   key: str) -> int:
    """MERGE INTO (upsert) on the snapshot table (r05): rows matched by
    ``key`` are replaced by their update row, unmatched update rows are
    inserted, everything else carries over — committed atomically as
    one new snapshot (copy-on-write, the Iceberg COW merge shape).

    Execution: current ⟕anti updates on the key (drops every matched
    row) ∪ updates.  The anti join is broadcast when the update batch
    is small — the common CDC case — so the rewrite is one pass over
    the current data with no fact-table shuffle; the commit inherits
    the manifest protocol's optimistic concurrency.  Schema evolution
    composes: an update batch with added columns merges schemas and the
    carried-over rows read NULL-filled under the merged schema."""
    cur = read_snapshot(spark, path)
    add_cols = [c for c in updates.columns if c not in cur.columns]
    survivors = cur.join(updates.select(key), key, "left_anti")
    for c in add_cols:
        survivors = survivors.withColumn(
            c, F.lit(None).cast(dict(updates.dtypes)[c])
        )
    merged = survivors.unionByName(updates)
    return write_snapshot(merged, path, mode="overwrite")


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Snapshot EXPIRY + VACUUM (r05): drop all but the newest
    ``keep_last`` manifests, then delete data directories no surviving
    manifest references (the Iceberg expire_snapshots + orphan-file
    cleanup pair).  Readers of surviving snapshots are unaffected —
    their manifests still pin every directory they need; expired as-of
    reads fail loudly ('not in history').  Returns counts for audit."""
    import os
    import shutil

    hist = snapshot_history(path)
    keep = hist[-keep_last:] if keep_last > 0 else []
    drop = [s for s in hist if s not in keep]
    live: set[str] = set()
    for s in keep:
        live.update(_read_manifest(path, s)["dirs"])
    for s in drop:
        os.remove(os.path.join(_manifest_dir(path), f"{s}.json"))
    removed_dirs = 0
    droot = os.path.join(path, "data")
    if os.path.isdir(droot):
        for name in sorted(os.listdir(droot)):
            full = os.path.join(droot, name)
            if full not in live:
                shutil.rmtree(full, ignore_errors=True)
                removed_dirs += 1
    return {"expired": len(drop), "kept": len(keep),
            "orphan_dirs_removed": removed_dirs}


def count_data_files(path: str, snap_id: int) -> int:
    """Number of parquet data files referenced by a snapshot's manifest
    — the metric compaction improves (driver-side listing of the
    manifest's dirs only; never a full-table scan)."""
    import os

    m = _read_manifest(path, snap_id)
    n = 0
    for d in m["dirs"]:
        n += sum(1 for f in os.listdir(d)
                 if f.endswith(".parquet") and not f.startswith("."))
    return n


def compact_snapshot(spark: SparkSession, path: str,
                     target_partitions: int = 2) -> int:
    """OPTIMIZE / rewrite_data_files analogue: read the current
    snapshot, rewrite it as ``target_partitions`` files, and commit the
    rewrite as a NEW overwrite snapshot — content identical, file count
    collapsed, every prior snapshot still time-travel readable (the
    rewrite never touches old data dirs; expire_snapshots reclaims
    them later).  At scale the rewrite is one repartition shuffle
    sized by target file size; per-partition lineage applies as to any
    other write."""
    df = read_snapshot(spark, path)
    return write_snapshot(df.repartition(target_partitions), path,
                          mode="overwrite")
