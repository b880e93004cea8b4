"""SnapshotTable — Iceberg-semantics table commits over parquet.

The north_star stores the frontier / url_seen / images tables in Iceberg with
per-partition lineage in snapshot properties. The sandbox has no Iceberg
runtime jars, so this module provides the same *semantics* behind a thin
interface (SURVEY.md §7 M4 "graceful parquet+manifest fallback"):

  * atomic snapshot commits (manifest JSON + atomic pointer swap via rename);
  * append / MERGE-not-matched (idempotent writes, reference analog: the
    skip-if-exists sinks, contract_crawler.py:242-248, :274-287, :378-379);
  * time travel (read any snapshot id — Iceberg ``VERSION AS OF``);
  * lineage properties per snapshot (frontier offsets, bloom segment
    versions, fetch counters — the resumability contract).

On a cluster with Iceberg jars, every call here maps 1:1 to
``df.writeTo(tbl).append()`` / ``MERGE INTO`` / snapshot properties; the
engine only touches this interface.

Crash safety: data files are written first, the manifest next, and the
``_current`` pointer last via ``os.replace`` (atomic on POSIX). A crash
between phases leaves orphan data files but never a live snapshot that
references missing data — identical to Iceberg's commit protocol.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _parquet_rows(d: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(d, f)).num_rows
    return total


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._snap_dir = os.path.join(path, "snapshots")
        self._data_dir = os.path.join(path, "data")
        self._current_file = os.path.join(path, "_current")

    # ---------- metadata ----------
    def exists(self) -> bool:
        return os.path.exists(self._current_file)

    def current_snapshot_id(self) -> int:
        with open(self._current_file) as f:
            return int(f.read().strip())

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self._snap_dir, f"s{sid:08d}.json")

    def manifest(self, version: int | None = None) -> dict:
        sid = self.current_snapshot_id() if version is None else version
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    def lineage(self, version: int | None = None) -> dict:
        return self.manifest(version).get("lineage", {})

    def row_count(self, version: int | None = None) -> int:
        """Live row count from parquet footers — driver-side metadata only
        (the Iceberg analog reads it from snapshot summaries). Used for
        cost-based plan choices (e.g. dedup store-vs-join) without a job."""
        return sum(_parquet_rows(d) for d in self.manifest(version)["data_dirs"])

    def snapshot_ids(self) -> list[int]:
        if not os.path.isdir(self._snap_dir):
            return []
        return sorted(int(f[1:9]) for f in os.listdir(self._snap_dir) if f.endswith(".json"))

    # ---------- commits ----------
    def create(self, schema_ddl: str) -> None:
        """Create an empty table (snapshot 0) with a pinned schema."""
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        self._commit(0, parent=None, dirs=[], schema_ddl=schema_ddl, lineage={}, op="create")

    def _commit(self, sid, parent, dirs, schema_ddl, lineage, op, dir_epochs=None) -> int:
        manifest = {
            "snapshot_id": sid,
            "parent": parent,
            "data_dirs": dirs,  # cumulative list -> O(1) reads
            "schema_ddl": schema_ddl,
            "lineage": lineage,
            "op": op,
            # per-data-dir commit epoch (Iceberg snapshot-summary analog):
            # lets the engine's mid-epoch replay guard find ALL dirs a
            # crash-replayed epoch already landed, not just the last one —
            # two crashes in the images-commit -> url_seen-append window
            # would otherwise re-land the first replay's payloads. Pruned to
            # live dirs so compaction/overwrite don't accrete stale entries.
            "dir_epochs": {
                d: e for d, e in (dir_epochs or {}).items() if d in dirs
            },
        }
        tmp = self._manifest_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(sid))
        tmp2 = self._current_file + ".tmp"
        with open(tmp2, "w") as f:
            f.write(str(sid))
        os.replace(tmp2, self._current_file)
        return sid

    def _write_data(self, df: DataFrame, sid: int) -> tuple[str, int]:
        """Write a snapshot's data dir; row count comes from parquet footers
        (driver-side metadata scan — avoids a separate Spark count job)."""
        d = os.path.join(self._data_dir, f"s{sid:08d}")
        df.write.mode("overwrite").parquet(d)
        return d, _parquet_rows(d)

    @staticmethod
    def _stamp_dir_epochs(prev: dict, new_dirs: list[str], lineage: dict | None) -> dict:
        de = dict(prev.get("dir_epochs", {}))
        ep = (lineage or {}).get("epoch")
        if ep is not None:
            for d in new_dirs:
                de[d] = ep
        return de

    def stage_append(
        self, df: DataFrame, lineage: dict | None = None
    ) -> tuple[int, str, int]:
        """Write an append's data dir WITHOUT committing the manifest.

        ``lineage`` is accepted for interface parity with the WAP-based
        Iceberg backend (where the snapshot summary must be stamped at
        write time) and ignored here — this backend applies lineage in
        ``commit_append``. Either way lineage becomes VISIBLE only at
        commit, so the engine's happens-after ordering holds on both.

        Lets the engine overlap this table's data write with other tables'
        jobs while still ordering the (cheap, driver-side) manifest commits
        for crash consistency — e.g. url_seen's commit must happen-after the
        dead-letter merge so a crash between them replays the epoch instead
        of silently dropping its dead letters. An uncommitted staged dir is
        invisible to readers and reclaimed by ``gc_orphans`` on restart.

        The staged dir gets a UNIQUE suffix (manifests reference arbitrary
        paths, so no rename is needed at commit): writing to the
        predictable ``s{sid}`` path would let a racing append() on the same
        table overwrite staged bytes BEFORE the stale-sid guard in
        ``commit_append`` could notice. Returns (snapshot_id, data_dir,
        rows).
        """
        import uuid

        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        d = os.path.join(self._data_dir, f"s{sid:08d}w{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(d)
        return sid, d, _parquet_rows(d)

    def commit_append(self, sid: int, d: str, lineage: dict | None = None) -> int:
        prev = self.manifest()
        if sid != prev["snapshot_id"] + 1:  # concurrent commit on this table
            raise RuntimeError(
                f"stale staged append: sid {sid} vs current {prev['snapshot_id']}"
            )
        merged_lineage = {**prev.get("lineage", {}), **(lineage or {})}
        return self._commit(
            sid, prev["snapshot_id"], prev["data_dirs"] + [d], prev["schema_ddl"],
            merged_lineage, "append", self._stamp_dir_epochs(prev, [d], lineage),
        )

    def append(self, df: DataFrame, lineage: dict | None = None) -> int:
        sid, d, _ = self.stage_append(df)
        return self.commit_append(sid, d, lineage)

    def merge_not_matched(
        self, df: DataFrame, keys: list[str], lineage: dict | None = None
    ) -> tuple[int, int]:
        """``MERGE INTO t USING df WHEN NOT MATCHED THEN INSERT`` on ``keys``.

        Idempotent — re-running the same epoch inserts nothing new (the
        resumability guarantee). Returns (snapshot_id, rows_inserted).
        """
        spark = df.sparkSession
        incoming = df.dropDuplicates(keys)
        existing = self.read(spark).select(*keys)
        new_rows = incoming.join(existing, on=keys, how="left_anti")
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        # single job: write, then count from parquet footers (no cache needed)
        d, n = self._write_data(new_rows, sid)
        merged_lineage = {**prev.get("lineage", {}), **(lineage or {})}
        if n == 0:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
            return (
                self._commit(
                    sid, prev["snapshot_id"], prev["data_dirs"], prev["schema_ddl"],
                    merged_lineage, "merge-noop", prev.get("dir_epochs"),
                ),
                0,
            )
        return (
            self._commit(
                sid, prev["snapshot_id"], prev["data_dirs"] + [d], prev["schema_ddl"],
                merged_lineage, "merge", self._stamp_dir_epochs(prev, [d], lineage),
            ),
            n,
        )

    def overwrite(self, df: DataFrame, lineage: dict | None = None) -> int:
        """K7 — snapshot rewrite (Iceberg ``overwritePartitions`` analog,
        reference: fix-imports rewrites a file only when lines changed,
        fix-imports-solidity.py:50-58). The new snapshot's live data is
        ``df`` alone; prior snapshots stay readable via time travel."""
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        d, _ = self._write_data(df, sid)
        merged_lineage = {**prev.get("lineage", {}), **(lineage or {})}
        return self._commit(
            sid, prev["snapshot_id"], [d], prev["schema_ddl"], merged_lineage, "overwrite",
            self._stamp_dir_epochs(prev, [d], lineage),
        )

    def staging_raw_dir(self) -> tuple[int, str]:
        """Reserve the next snapshot's raw landing dir for a job-side write.

        The engine's fetch job writes full result rows here with
        ``write.partitionBy("valid")``; the ``valid=true`` subdir is then
        committed with ``commit_staged`` AS the snapshot's data dir — the
        classic job-committer split: one pass over the heavy bytes, no second
        copy, no driver round-trip. Extra (meta) columns in the staged files
        are invisible to readers because ``read`` always applies the table
        schema (parquet column pruning). On replay after a crash the write's
        overwrite mode replaces the dir, never duplicating rows.
        """
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        return sid, os.path.join(self._data_dir, f"s{sid:08d}.raw")

    def commit_staged(self, sid: int, staged_dir: str, lineage: dict | None = None) -> tuple[int, int]:
        """Commit a dir populated by a job-side write (see staging_raw_dir).
        Returns (snapshot_id, n_rows). Missing/empty dir -> metadata-only
        commit (an epoch can legitimately land zero valid payloads)."""
        prev = self.manifest()
        assert sid == prev["snapshot_id"] + 1, "stale staging dir"
        n = _parquet_rows(staged_dir) if os.path.isdir(staged_dir) else 0
        merged_lineage = {**prev.get("lineage", {}), **(lineage or {})}
        dirs = prev["data_dirs"] + ([staged_dir] if n else [])
        return (
            self._commit(sid, prev["snapshot_id"], dirs, prev["schema_ddl"], merged_lineage,
                         "append-staged" if n else "append-staged-empty",
                         self._stamp_dir_epochs(prev, [staged_dir] if n else [], lineage)),
            n,
        )

    # ---------- maintenance ----------
    def compact(self, spark: SparkSession, lineage: dict | None = None) -> int:
        """Iceberg ``rewrite_data_files`` analog: rewrite the live rows into a
        single data dir so reads stop touching one dir per epoch (r1 VERDICT
        #3 — after 10^4 epochs a read would touch 10^4 dirs). The commit is a
        normal snapshot (op="compact"): prior snapshots stay readable via
        time travel until ``expire_snapshots`` drops them."""
        prev = self.manifest()
        sid = prev["snapshot_id"] + 1
        d, _ = self._write_data(self.read(spark), sid)
        merged_lineage = {**prev.get("lineage", {}), **(lineage or {})}
        return self._commit(
            sid, prev["snapshot_id"], [d], prev["schema_ddl"], merged_lineage, "compact",
            self._stamp_dir_epochs(prev, [d], lineage),
        )

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Iceberg ``expire_snapshots`` analog: drop all but the newest
        ``keep_last`` manifests (the current snapshot is always kept), then
        GC data dirs no retained manifest references. Bounds metadata and
        reclaims dirs obsoleted by compaction. Returns expired snapshot ids."""
        ids = self.snapshot_ids()
        current = self.current_snapshot_id()
        keep = set(ids[-keep_last:]) | {current}
        expired = [sid for sid in ids if sid not in keep]
        for sid in expired:
            os.remove(self._manifest_path(sid))
        self.gc_orphans()
        return expired

    def gc_orphans(self) -> list[str]:
        """Remove data-dir entries no manifest references — crash leftovers
        (.raw staging dirs whose epoch never committed) and dirs stranded by
        expire_snapshots. Also prunes the valid=false partition inside
        committed .raw landing dirs (failed-fetch payload bytes are only
        needed until the dead-letter merge). Single-writer safe: the engine
        calls this at startup / maintenance points, never mid-commit."""
        import shutil

        if not os.path.isdir(self._data_dir):
            return []
        referenced: set[str] = set()
        for sid in self.snapshot_ids():
            for d in self.manifest(sid)["data_dirs"]:
                rel = os.path.relpath(d, self._data_dir)
                referenced.add(rel.split(os.sep)[0])
        removed = []
        for entry in sorted(os.listdir(self._data_dir)):
            p = os.path.join(self._data_dir, entry)
            if entry not in referenced:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(entry)
            elif entry.endswith(".raw"):
                stale = os.path.join(p, "valid=false")
                if os.path.isdir(stale):
                    shutil.rmtree(stale, ignore_errors=True)
                    removed.append(os.path.join(entry, "valid=false"))
        return removed

    # ---------- reads ----------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if not m["data_dirs"]:
            return spark.createDataFrame([], m["schema_ddl"])
        return spark.read.schema(m["schema_ddl"]).parquet(*m["data_dirs"])
