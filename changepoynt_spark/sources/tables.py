"""Iceberg-style table layout: parquet data files + JSON snapshot manifests.

No Iceberg runtime jar exists in this environment (checked $SPARK_HOME/jars;
no network), so the engine implements the *structure* of an Iceberg table —
immutable data files, JSON manifest/snapshot metadata, snapshot lineage,
hidden partitioning, time travel — in a layout it controls:

    <root>/data/snap-<n>/...parquet       (files added by snapshot n)
    <root>/metadata/snapshot-<n>.json     (schema, spec, manifest entries,
                                           parent pointer, summary)
    <root>/metadata/version-hint.txt      (current snapshot number)

Each manifest entry carries per-partition lineage + metrics (input
fingerprint, row count, rollup watermark) which is what makes jobs resumable
(see changepoynt_spark.plans.checkpoint).  The writer is behind this one
class, so a real ``iceberg-spark-runtime`` catalog can be dropped in later
without touching callers.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class IcebergishTable:

    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, 'data')
        self.meta_dir = os.path.join(root, 'metadata')

    # -- snapshot bookkeeping ------------------------------------------------

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, 'version-hint.txt')

    def current_snapshot_id(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def snapshot(self, snapshot_id: int = None) -> Optional[dict]:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid < 0:
            return None
        with open(os.path.join(self.meta_dir, f'snapshot-{sid}.json')) as f:
            return json.load(f)

    def history(self) -> list:
        """Snapshot lineage, oldest first."""
        out = []
        sid = self.current_snapshot_id()
        while sid >= 0:
            snap = self.snapshot(sid)
            out.append(snap)
            sid = snap.get('parent', -1)
        return out[::-1]

    # -- write / read ----------------------------------------------------------

    def append(self, df: DataFrame, partition_by=('source',), properties: dict = None,
               invalidates=()) -> dict:
        """Append df as a new snapshot; returns the snapshot dict.

        ``properties`` lands in the manifest entry — callers put lineage /
        watermark metrics there (bucket id, input fingerprint, max rollup
        ts).  Hidden partitioning: callers pass derived columns (e.g.
        doc_bucket) that readers never need to know about.

        ``invalidates``: snapshot ids whose data files this snapshot
        logically replaces (overwrite-partition semantics — readers of this
        or later snapshots skip them)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        parent = self.current_snapshot_id()
        sid = parent + 1
        snap_dir = os.path.join(self.data_dir, f'snap-{sid}')
        writer = df.write.mode('error')
        if partition_by:
            writer = writer.partitionBy(*list(partition_by))
        writer.parquet(snap_dir)
        n_rows = df.sparkSession.read.parquet(snap_dir).count()
        files = []
        for dirpath, _, names in os.walk(snap_dir):
            for name in names:
                if name.endswith('.parquet'):
                    p = os.path.join(dirpath, name)
                    files.append({'path': os.path.relpath(p, self.root),
                                  'bytes': os.path.getsize(p)})
        snap = {
            'snapshot_id': sid,
            'parent': parent,
            'invalidates': sorted(int(i) for i in invalidates),
            'timestamp_ms': int(time.time() * 1000),
            'schema': df.schema.jsonValue(),
            'partition_spec': list(partition_by or []),
            'manifest': {
                'entries': files,
                'row_count': n_rows,
                'properties': dict(properties or {}),
            },
        }
        tmp = os.path.join(self.meta_dir, f'.snapshot-{sid}.json.tmp')
        with open(tmp, 'w') as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, os.path.join(self.meta_dir, f'snapshot-{sid}.json'))
        # version hint last: a crash before this line leaves the table at the
        # previous snapshot (the new files are unreachable -> atomic commit)
        tmp_hint = self._hint_path() + '.tmp'
        with open(tmp_hint, 'w') as f:
            f.write(str(sid))
        os.replace(tmp_hint, self._hint_path())
        return snap

    def read(self, spark: SparkSession, snapshot_id: int = None) -> DataFrame:
        """Read the table at a snapshot (default: current). Time travel =
        union of data files of the snapshot's full lineage."""
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        assert sid >= 0, f'table {self.root} has no snapshots'
        dead = set()
        chain = []
        cur = sid
        while cur >= 0:
            snap = self.snapshot(cur)
            chain.append(cur)
            dead.update(snap.get('invalidates', []))
            cur = snap.get('parent', -1)
        dirs = [os.path.join(self.data_dir, f'snap-{c}') for c in chain if c not in dead]
        existing = [d for d in dirs if os.path.isdir(d)]
        assert existing, f'no live data files at snapshot {sid}'
        # one read per snapshot dir (each with its own partition discovery),
        # unioned by name — the snap-N level is not a partition column
        out = None
        for d in existing:
            part = spark.read.parquet(d)
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
        return out

    def _live_snapshots(self, snapshot_id: int) -> list:
        """Snapshot ids whose data files are visible at ``snapshot_id``
        (lineage minus everything the lineage invalidates)."""
        dead, chain = set(), []
        cur = snapshot_id
        while cur >= 0:
            snap = self.snapshot(cur)
            chain.append(cur)
            dead.update(snap.get('invalidates', []))
            cur = snap.get('parent', -1)
        return [c for c in chain if c not in dead]

    def read_delta(self, spark: SparkSession, from_snapshot_id: int,
                   to_snapshot_id: int = None) -> Optional[DataFrame]:
        """Rows visible at ``to`` but not at ``from`` — the incremental-scan
        unit a continuous aggregate refreshes from (Iceberg's incremental
        append scan).  Returns None when the delta is empty.

        Only valid for APPEND-ONLY history between the two snapshots: if any
        file live at ``from`` is gone at ``to`` (a compaction or overwrite
        crossed the range), an additive refresh would double- or
        under-count, so this raises and the caller must fall back to a full
        recompute.  A compaction committed BEFORE ``from`` is fine — its
        invalidations are already part of the ``from`` view."""
        to_sid = self.current_snapshot_id() if to_snapshot_id is None else to_snapshot_id
        assert to_sid >= 0, f'table {self.root} has no snapshots'
        live_to = set(self._live_snapshots(to_sid))
        live_from = set(self._live_snapshots(from_snapshot_id)) \
            if from_snapshot_id >= 0 else set()
        removed = live_from - live_to
        if removed:
            raise ValueError(
                f'history {from_snapshot_id}..{to_sid} is not append-only '
                f'(snapshots {sorted(removed)} were invalidated in-range); '
                f'incremental refresh is invalid — recompute from scratch')
        delta = sorted(live_to - live_from)
        dirs = [os.path.join(self.data_dir, f'snap-{c}') for c in delta]
        existing = [d for d in dirs if os.path.isdir(d)]
        out = None
        for d in existing:
            part = spark.read.parquet(d)
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
        return out

    def properties_by_snapshot(self) -> dict:
        return {s['snapshot_id']: s['manifest']['properties'] for s in self.history()}

    def vacuum(self) -> list:
        """Physically delete data files of snapshots invalidated by the
        current lineage (logical deletes become physical).  Returns the
        removed snapshot ids.  Metadata is kept (history stays auditable);
        time travel to a vacuumed snapshot raises on read."""
        import shutil
        dead = set()
        cur = self.current_snapshot_id()
        while cur >= 0:
            snap = self.snapshot(cur)
            dead.update(snap.get('invalidates', []))
            cur = snap.get('parent', -1)
        removed = []
        for sid in sorted(dead):
            d = os.path.join(self.data_dir, f'snap-{sid}')
            if os.path.isdir(d):
                shutil.rmtree(d)
                removed.append(sid)
        return removed

    def compact(self, spark: SparkSession, target_file_bytes: int = 128 * 1024 * 1024,
                partition_by=None) -> dict:
        """Rewrite every live data file into one new snapshot with ~target-
        sized files (Iceberg's ``rewrite_data_files`` small-file compaction).

        A rollup pipeline appends a snapshot per micro-batch/bucket, so the
        live file count grows linearly with commits while file sizes stay
        tiny — the classic small-files problem: at 10^12-sequence scale the
        scan's task count (and the driver's split planning) is dominated by
        file count, not bytes.  Compaction reads the live lineage once,
        repartitions to ceil(live_bytes / target_file_bytes) output files,
        and commits the rewrite as a snapshot that ``invalidates`` every
        prior live snapshot — readers atomically switch to the packed
        files, time travel to the old snapshots still works until
        :meth:`vacuum` reclaims them.
        """
        import math
        cur = self.current_snapshot_id()
        assert cur >= 0, f'table {self.root} has no snapshots to compact'
        dead, chain = set(), []
        sid = cur
        while sid >= 0:
            snap = self.snapshot(sid)
            chain.append(sid)
            dead.update(snap.get('invalidates', []))
            sid = snap.get('parent', -1)
        live = [c for c in chain if c not in dead]
        live_bytes = 0
        n_files = 0
        for c in live:
            entries = self.snapshot(c)['manifest']['entries']
            live_bytes += sum(e['bytes'] for e in entries)
            n_files += len(entries)
        spec = partition_by if partition_by is not None \
            else self.snapshot(cur).get('partition_spec', [])
        df = self.read(spark).repartition(
            max(1, math.ceil(live_bytes / target_file_bytes)))
        return self.append(
            df, partition_by=spec, invalidates=live,
            properties={'operation': 'compact',
                        'replaced_snapshots': len(live),
                        'replaced_files': n_files,
                        'replaced_bytes': live_bytes,
                        'target_file_bytes': int(target_file_bytes)})
