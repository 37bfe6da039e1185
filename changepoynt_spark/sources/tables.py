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

# manifest column-stat bounds for strings are truncated to this many chars
# (Iceberg's write.metadata.metrics truncate(16) default): manifests must
# stay tiny relative to data or the scan-planning read becomes its own
# full-table scan at 10^12-sequence scale
_STR_STAT_LEN = 16


def _norm_stat(v):
    """Manifest-safe canonical form of a parquet footer min/max: numbers as
    numbers, timestamps as epoch MICROSECONDS (ints compare correctly and
    survive JSON), strings as-is (truncation handled separately), anything
    else (bytes, nested) dropped."""
    import datetime
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return int((v - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    if isinstance(v, (int, float, str)):
        return v
    return None


def _truncate_upper(s: str, n: int):
    """A valid UPPER bound for a truncated string stat: truncate to n chars
    and increment the last code point (Iceberg's truncateStringMax).  A
    plain prefix would be LOWER than some values it bounds ('abcz' > 'abc'),
    silently pruning files that match.  Returns None (no bound) when every
    char is U+10FFFF and cannot be incremented."""
    if len(s) <= n:
        return s
    t = list(s[:n])
    for i in range(n - 1, -1, -1):
        cp = ord(t[i])
        if cp < 0x10FFFF:
            return ''.join(t[:i]) + chr(cp + 1)
    return None


def _file_column_stats(path: str) -> dict:
    """Per-file min/max/null-count from the parquet footer (what an Iceberg
    writer records in the manifest at write time — here read back from the
    footer, which is metadata-only, never a data scan)."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    out = {}
    out_rows = int(md.num_rows)
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            st = col.statistics
            name = col.path_in_schema
            if st is None or not st.has_min_max or '.' in name:
                out[name] = None            # poison: some group lacks stats
                continue
            lo, hi = _norm_stat(st.min), _norm_stat(st.max)
            if lo is None or hi is None:
                out[name] = None
                continue
            nulls = int(st.null_count) if st.has_null_count else 0
            prev = out.get(name)
            if name in out:
                if prev is None:
                    continue
                lo = min(lo, prev['min'])
                hi = max(hi, prev['max'])
                nulls += prev['nulls']
            out[name] = {'min': lo, 'max': hi, 'nulls': nulls}
    stats = {}
    for name, s in out.items():
        if s is None:
            continue
        lo, hi = s['min'], s['max']
        if isinstance(lo, str):
            lo = lo[:_STR_STAT_LEN]
            hi = _truncate_upper(hi, _STR_STAT_LEN)
            if hi is None:
                continue
        stats[name] = {'min': lo, 'max': hi, 'nulls': s['nulls']}
    return out_rows, stats


def _path_partition_values(relpath: str) -> dict:
    """Hive-style key=value segments of a data file path (the hidden
    partition values a reader prunes on without knowing the layout)."""
    out = {}
    for seg in relpath.split(os.sep):
        if '=' in seg and not seg.endswith('.parquet'):
            k, _, v = seg.partition('=')
            out[k] = v
    return out


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
               invalidates=(), cluster_by=None, n_files: int = None) -> dict:
        """Append df as a new snapshot; returns the snapshot dict.

        ``properties`` lands in the manifest entry — callers put lineage /
        watermark metrics there (bucket id, input fingerprint, max rollup
        ts).  Hidden partitioning: callers pass derived columns (e.g.
        doc_bucket) that readers never need to know about.

        ``invalidates``: snapshot ids whose data files this snapshot
        logically replaces (overwrite-partition semantics — readers of this
        or later snapshots skip them).

        ``cluster_by``: range-partition + sort the write on these columns
        (Iceberg's ``write.distribution-mode=range``): each data file then
        covers a DISJOINT value range, which is what makes the manifest
        min/max stats (:meth:`plan_files`) selective — without clustering
        every file spans most of the domain and a point predicate keeps
        everything.  One extra shuffle at write time buys metadata-bound
        scan planning on every later read; ``n_files`` bounds the file
        count (default: the session's shuffle parallelism)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        parent = self.current_snapshot_id()
        sid = parent + 1
        snap_dir = os.path.join(self.data_dir, f'snap-{sid}')
        if cluster_by:
            cols = list(cluster_by)
            df = (df.repartitionByRange(n_files, *cols) if n_files
                  else df.repartitionByRange(*cols)).sortWithinPartitions(*cols)
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
                    rel = os.path.relpath(p, self.root)
                    f_rows, f_stats = _file_column_stats(p)
                    files.append({'path': rel,
                                  'bytes': os.path.getsize(p),
                                  'rows': f_rows,
                                  'partition': _path_partition_values(rel),
                                  'stats': f_stats})
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
                   to_snapshot_id: int = None, tolerate_ops=()) -> Optional[DataFrame]:
        """Rows visible at ``to`` but not at ``from`` — the incremental-scan
        unit a continuous aggregate refreshes from (Iceberg's incremental
        append scan).  Returns None when the delta is empty.

        Only valid for APPEND-ONLY history between the two snapshots: if any
        file live at ``from`` is gone at ``to`` (a compaction or overwrite
        crossed the range), an additive refresh would double- or
        under-count, so this raises and the caller must fall back to a full
        recompute.  A compaction committed BEFORE ``from`` is fine — its
        invalidations are already part of the ``from`` view.

        ``tolerate_ops`` (e.g. ``('expire', 'compact')``): maintenance
        snapshots whose ``operation`` property is listed are NOT new data —
        they rewrite or retire rows the ``from`` view already contained.
        Such a snapshot is EXCLUDED from the delta, and the invalidations it
        caused are tolerated, iff EVERYTHING it invalidates was live at
        ``from`` (fully-reflected content; TimescaleDB's "retention and
        reorder don't re-trigger a continuous aggregate").  A maintenance
        snapshot that folded in any unreflected snapshot still raises —
        excluding it would lose that data, including it would double-count
        the reflected part."""
        to_sid = self.current_snapshot_id() if to_snapshot_id is None else to_snapshot_id
        assert to_sid >= 0, f'table {self.root} has no snapshots'
        live_to = set(self._live_snapshots(to_sid))
        live_from = set(self._live_snapshots(from_snapshot_id)) \
            if from_snapshot_id >= 0 else set()
        new = sorted(live_to - live_from)
        excluded, blamed = set(), set()
        if tolerate_ops:
            for c in new:
                snap = self.snapshot(c)
                inv = set(snap.get('invalidates', []))
                op = snap['manifest']['properties'].get('operation')
                if op in tolerate_ops and inv and inv <= live_from:
                    excluded.add(c)
                    blamed |= inv
        removed = live_from - live_to
        unexplained = removed - blamed
        if unexplained:
            raise ValueError(
                f'history {from_snapshot_id}..{to_sid} is not append-only '
                f'(snapshots {sorted(unexplained)} were invalidated in-range '
                f'by non-maintenance or partially-unreflected commits); '
                f'incremental refresh is invalid — recompute from scratch')
        delta = [c for c in new if c not in excluded]
        dirs = [os.path.join(self.data_dir, f'snap-{c}') for c in delta]
        existing = [d for d in dirs if os.path.isdir(d)]
        out = None
        for d in existing:
            part = spark.read.parquet(d)
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
        return out

    # -- stats-pruned scan planning -----------------------------------------

    @staticmethod
    def _entry_matches(entry: dict, predicates) -> bool:
        """May this data file contain rows satisfying ALL predicates?
        Conservative: a column with no partition value and no footer stats
        (older manifests, all-null groups, unsupported types) never prunes.
        Predicates are null-rejecting comparisons, so null counts are
        irrelevant to the keep/prune decision."""
        part = entry.get('partition', {})
        stats = entry.get('stats', {})
        for col, op, val in predicates:
            if col in part:
                # hidden-partition values are path strings; only equality is
                # type-safe on the string form (ranges on e.g. int-valued
                # partitions would compare lexically) — other ops fall
                # through to footer stats, which partitioned files also have
                if op == '=' and part[col] != str(val):
                    return False
                if op == '=':
                    continue
            s = stats.get(col)
            nval = _norm_stat(val)
            if not s or nval is None:
                continue
            lo, hi = s['min'], s['max']
            if isinstance(nval, str) != isinstance(lo, str):
                continue                      # type mismatch: never prune
            if ((op == '=' and (nval < lo or hi < nval))
                    or (op == '<' and lo >= nval)
                    or (op == '<=' and lo > nval)
                    or (op == '>' and hi <= nval)
                    or (op == '>=' and hi < nval)):
                return False
        return True

    def plan_files(self, predicates, snapshot_id: int = None) -> dict:
        """Manifest-only scan planning: which live data files can contain
        rows matching the conjunctive ``predicates``
        (``[(col, op, value)]``, op in ``= < <= > >=``; timestamp values as
        ``datetime``).  Pure metadata — no parquet data is read.  Returns
        ``{'kept': {snap_dir: [abs paths]}, 'n_kept', 'n_total'}``.

        This is the Iceberg scan-planning step that makes a 10^12-sequence
        table queryable: for a time- or source-bounded query the driver
        plans splits for the matching files only, instead of one task per
        file of 100 TB.  File-level min/max subsumes partition pruning and
        also prunes WITHIN a partition (e.g. append-ordered ts)."""
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        assert sid >= 0, f'table {self.root} has no snapshots'
        preds = list(predicates)
        kept, n_kept, n_total = {}, 0, 0
        for c in self._live_snapshots(sid):
            snap_dir = os.path.join(self.data_dir, f'snap-{c}')
            for entry in self.snapshot(c)['manifest']['entries']:
                if entry.get('rows') == 0:
                    continue                 # empty file: nothing to match
                n_total += 1
                if self._entry_matches(entry, preds):
                    kept.setdefault(snap_dir, []).append(
                        os.path.join(self.root, entry['path']))
                    n_kept += 1
        return {'kept': kept, 'n_kept': n_kept, 'n_total': n_total}

    @staticmethod
    def _predicate_expr(predicates):
        from pyspark.sql import functions as F
        ops = {'=': lambda c, v: c == v, '<': lambda c, v: c < v,
               '<=': lambda c, v: c <= v, '>': lambda c, v: c > v,
               '>=': lambda c, v: c >= v}
        expr = F.lit(True)
        for col, op, val in predicates:
            expr = expr & ops[op](F.col(col), F.lit(val))
        return expr

    def scan(self, spark: SparkSession, predicates, snapshot_id: int = None,
             with_residual: bool = True) -> DataFrame:
        """Predicate-pruned read: :meth:`plan_files` picks the files, Spark
        reads only those (``basePath`` per snapshot dir so hidden-partition
        columns survive), and the exact predicate is re-applied as a
        residual filter (file pruning is necessarily approximate —
        min/max keeps any file whose RANGE intersects)."""
        plan = self.plan_files(predicates, snapshot_id)
        expr = self._predicate_expr(predicates)
        if not plan['kept']:
            return self.read(spark, snapshot_id).filter(expr).limit(0)
        out = None
        for snap_dir, paths in sorted(plan['kept'].items()):
            part = spark.read.option('basePath', snap_dir).parquet(*sorted(paths))
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
        return out.filter(expr) if with_residual else out

    def _commit_metadata_snapshot(self, invalidates, properties: dict) -> dict:
        """Commit a DATA-LESS snapshot (entries=[], no snap dir): pure
        manifest surgery, e.g. retiring expired snapshots.  Readers skip it
        (read() unions only existing dirs)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        parent = self.current_snapshot_id()
        sid = parent + 1
        prev = self.snapshot(parent) if parent >= 0 else None
        snap = {
            'snapshot_id': sid,
            'parent': parent,
            'invalidates': sorted(int(i) for i in invalidates),
            'timestamp_ms': int(time.time() * 1000),
            'schema': prev['schema'] if prev else None,
            'partition_spec': prev.get('partition_spec', []) if prev else [],
            'manifest': {'entries': [], 'row_count': 0,
                         'properties': dict(properties or {})},
        }
        tmp = os.path.join(self.meta_dir, f'.snapshot-{sid}.json.tmp')
        with open(tmp, 'w') as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, os.path.join(self.meta_dir, f'snapshot-{sid}.json'))
        tmp_hint = self._hint_path() + '.tmp'
        with open(tmp_hint, 'w') as f:
            f.write(str(sid))
        os.replace(tmp_hint, self._hint_path())
        return snap

    def expire_before(self, spark: SparkSession, cutoff, ts_col: str = 'ts') -> dict:
        """Retention expiry by MANIFEST STATS: logically drop every live
        snapshot whose files' max(``ts_col``) all predate ``cutoff`` —
        metadata-only, the expired 100 TB is never read — and rewrite only
        the snapshots that STRADDLE the cutoff (filtered to surviving
        rows).  With time-ordered arrival (the rollup pipeline's natural
        append order) at most one snapshot straddles, so expiry cost is
        O(boundary), not O(history).  Snapshots lacking stats for
        ``ts_col`` are conservatively treated as straddling (rewritten via
        the exact filter — never silently dropped).  Committed as ONE
        atomic snapshot invalidating the expired + rewritten set;
        :meth:`vacuum` reclaims the bytes."""
        cut = _norm_stat(cutoff)
        assert cut is not None, f'unsupported cutoff type {type(cutoff)}'
        cur = self.current_snapshot_id()
        assert cur >= 0, f'table {self.root} has no snapshots'
        drop_whole, straddle = [], []
        dropped_bytes = rewritten_bytes = 0
        for c in self._live_snapshots(cur):
            # empty files (0 footer rows) carry no stats and no data: they
            # must not force a rewritten snapshot back into 'straddling'
            entries = [e for e in self.snapshot(c)['manifest']['entries']
                       if e.get('rows') != 0]
            if not entries:
                continue                     # row-less snapshot: untouched
            stats = [e.get('stats', {}).get(ts_col) for e in entries]
            nbytes = sum(e['bytes'] for e in entries)
            if entries and all(s and s['max'] < cut for s in stats):
                drop_whole.append(c)
                dropped_bytes += nbytes
            elif entries and all(s and s['min'] >= cut for s in stats):
                continue                                  # untouched
            else:
                straddle.append(c)
                rewritten_bytes += nbytes
        if not drop_whole and not straddle:
            return {'dropped_snapshots': [], 'rewritten_snapshots': [],
                    'dropped_bytes': 0, 'rewritten_bytes': 0}
        props = {'operation': 'expire', 'cutoff': cut, 'ts_col': ts_col,
                 'dropped_snapshots': len(drop_whole),
                 'rewritten_snapshots': len(straddle)}
        if straddle:
            from pyspark.sql import functions as F
            surv = None
            for c in straddle:
                part = spark.read.parquet(os.path.join(self.data_dir, f'snap-{c}'))
                surv = part if surv is None else surv.unionByName(
                    part, allowMissingColumns=True)
            surv = surv.filter(F.col(ts_col) >= F.lit(cutoff))
            spec = self.snapshot(cur).get('partition_spec', [])
            self.append(surv, partition_by=spec,
                        invalidates=drop_whole + straddle, properties=props)
        else:
            self._commit_metadata_snapshot(drop_whole, props)
        return {'dropped_snapshots': sorted(drop_whole),
                'rewritten_snapshots': sorted(straddle),
                'dropped_bytes': dropped_bytes, 'rewritten_bytes': rewritten_bytes}

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
