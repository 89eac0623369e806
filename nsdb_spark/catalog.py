"""Warehouse catalog: db / namespace / metric layout + schema registry.

Layout (SURVEY.md §1.6):  <root>/<db>/<namespace>/<metric>/
    schema.json   — union-merged MetricSchema (Schema.scala parity)
    meta.json     — shardInterval ms + retention ms (MetricInfo.scala:30)
    data/shard_start=<n>/*.parquet — natural-time partitions
      (shard_start = floor(timestamp / interval) * interval,
       MetadataCoordinator.scala:89-91)

The partition listing doubles as NSDb's "locations" metadata: temporal
queries derive bucket bounds from it without touching data
(ReadCoordinator.scala:210-214 analogue).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import threading

from .model import DEFAULT_SHARD_INTERVAL_MS, MetricSchema, SchemaError


class MetricNotFound(Exception):
    pass


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # schema updates are read-modify-write; concurrent inserts from
        # the threaded HTTP server adding DIFFERENT new fields must not
        # lose one side's registration (data already written under the
        # lost field would read as NULL forever)
        self._schema_lock = threading.Lock()
        # rollup registrations are the same read-modify-write pattern over
        # their meta JSONs: two concurrent materializations (different
        # grains/fields for one metric) must not lose one side's entry —
        # the loser's rollup data would sit on disk never routed to
        self._rollup_meta_lock = threading.Lock()

    # -- paths ----------------------------------------------------------
    #: filesystem-safe identifier: no separators, no traversal, no dot
    #: prefix. SQL-parsed names are already regex-constrained; this guards
    #: the HTTP/API surfaces, where db/namespace/metric arrive as raw
    #: client strings and are joined straight into warehouse paths —
    #: "../../tmp/x" must be an error, not a write outside the root.
    _NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.\-]*$")

    @classmethod
    def _safe(cls, name: str) -> str:
        # the regex alone is sufficient: no path separators can appear, so
        # an interior ".." (e.g. "a..b") is just a funny directory name,
        # not traversal — and the whole-string "..", "." cases fail the
        # leading-character class anyway
        if not cls._NAME_RE.match(name):
            raise ValueError(f"invalid identifier {name!r}")
        return name

    def metric_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(
            self.root, self._safe(db), self._safe(ns), self._safe(metric)
        )

    def data_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "data")

    # -- listing ---------------------------------------------------------
    def databases(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def namespaces(self, db: str) -> list[str]:
        p = os.path.join(self.root, self._safe(db))
        if not os.path.isdir(p):
            return []
        return sorted(d for d in os.listdir(p) if os.path.isdir(os.path.join(p, d)))

    def metrics(self, db: str, ns: str) -> list[str]:
        p = os.path.join(self.root, self._safe(db), self._safe(ns))
        if not os.path.isdir(p):
            return []
        return sorted(d for d in os.listdir(p) if os.path.isdir(os.path.join(p, d)))

    def exists(self, db: str, ns: str, metric: str) -> bool:
        return os.path.isfile(os.path.join(self.metric_path(db, ns, metric), "schema.json"))

    # -- schema registry --------------------------------------------------
    def get_schema(self, db: str, ns: str, metric: str) -> MetricSchema:
        p = os.path.join(self.metric_path(db, ns, metric), "schema.json")
        if not os.path.isfile(p):
            raise MetricNotFound(f"{db}.{ns}.{metric}")
        with open(p) as fh:
            return MetricSchema.from_json(fh.read())

    def update_schema(self, db: str, ns: str, metric: str, incoming: MetricSchema) -> MetricSchema:
        """Union-merge the registry schema with an incoming one; rejects
        type conflicts (Schema.union parity, Schema.scala:116-129). Atomic
        via write-then-rename."""
        mp = self.metric_path(db, ns, metric)
        os.makedirs(mp, exist_ok=True)
        p = os.path.join(mp, "schema.json")
        with self._schema_lock:
            if os.path.isfile(p):
                with open(p) as fh:
                    merged = MetricSchema.from_json(fh.read()).union(incoming)
            else:
                merged = incoming
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(merged.to_json())
            os.replace(tmp, p)
        return merged

    # -- metric info (INIT METRIC parity: init.proto:22-41) ----------------
    def get_info(self, db: str, ns: str, metric: str) -> dict:
        p = os.path.join(self.metric_path(db, ns, metric), "meta.json")
        if os.path.isfile(p):
            with open(p) as fh:
                return json.load(fh)
        return {"shardInterval": DEFAULT_SHARD_INTERVAL_MS, "retention": 0}

    def init_metric(
        self, db: str, ns: str, metric: str,
        shard_interval_ms: int = DEFAULT_SHARD_INTERVAL_MS, retention_ms: int = 0,
    ) -> None:
        mp = self.metric_path(db, ns, metric)
        os.makedirs(mp, exist_ok=True)
        with open(os.path.join(mp, "meta.json"), "w") as fh:
            json.dump({"shardInterval": shard_interval_ms, "retention": retention_ms}, fh)

    # -- locations (shard partition listing) -------------------------------
    _SHARD_RE = re.compile(r"^shard_start=(-?\d+)$")

    def locations(self, db: str, ns: str, metric: str) -> list[int]:
        """shard_start values present on disk — the pruning metadata."""
        dp = self.data_path(db, ns, metric)
        if not os.path.isdir(dp):
            return []
        out = []
        for d in os.listdir(dp):
            m = self._SHARD_RE.match(d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def shard_stats(self, db: str, ns: str, metric: str) -> list[dict]:
        """Per-shard location descriptors — the Location(metric, node,
        from, to) listing of the reference's GetLiveLocations
        (nsdb-core/src/main/scala/io/radicalbit/nsdb/model/Location.scala:32,
        served over HTTP by CommandApi.scala's /locations route), enriched
        with the physical stats the Parquet layout gives for free: file
        count, byte size, and exact row count from the parquet FOOTERS
        (pyarrow metadata read — no data pages touched, so this stays
        cheap on a 100 TB metric: O(files) footer reads, zero scans)."""
        if not self.exists(db, ns, metric):
            raise MetricNotFound(f"{db}.{ns}.{metric}")
        import pyarrow.parquet as pq

        interval = self.get_info(db, ns, metric)["shardInterval"]
        dp = self.data_path(db, ns, metric)
        out = []
        for start in self.locations(db, ns, metric):
            sd = os.path.join(dp, f"shard_start={start}")
            files = [
                os.path.join(sd, f)
                for f in os.listdir(sd)
                if f.endswith(".parquet")
            ]
            rows = 0
            size = 0
            for f in files:
                rows += pq.ParquetFile(f).metadata.num_rows
                size += os.path.getsize(f)
            out.append(
                {
                    "shard_start": start,
                    "from": start,
                    "to": start + interval - 1,
                    "n_files": len(files),
                    "bytes": size,
                    "rows": rows,
                }
            )
        return out

    # -- rollup registry ----------------------------------------------------
    # Materialized temporal rollups (operators/rollup.py). rollups.json
    # maps fine_ms -> {lower, upper} (the pinned bucket-axis bounds the
    # rollup was built against). ANY write to the metric invalidates all
    # of its rollups — the engine falls back to the raw path until a
    # re-materialization (or incremental merge) runs.
    def rollup_path(self, db: str, ns: str, metric: str, fine_ms: int) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "rollups", str(fine_ms))

    def _rollup_meta_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "rollups", "rollups.json")

    def register_rollup(
        self, db: str, ns: str, metric: str, fine_ms: int, bounds: tuple[int, int]
    ) -> None:
        with self._rollup_meta_lock:
            meta = self.rollups(db, ns, metric)
            meta[fine_ms] = bounds
            p = self._rollup_meta_path(db, ns, metric)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({str(k): list(v) for k, v in meta.items()}, fh)
            os.replace(tmp, p)

    def rollups(self, db: str, ns: str, metric: str) -> dict[int, tuple[int, int]]:
        p = self._rollup_meta_path(db, ns, metric)
        if not os.path.isfile(p):
            return {}
        with open(p) as fh:
            raw = json.load(fh)
        return {int(k): (v[0], v[1]) for k, v in raw.items()}

    # group rollups: per-group mergeable partials keyed by group field.
    # Tracked in a separate meta file (group_rollups.json) in the same
    # rollups dir, so invalidate_rollups drops both kinds at once.
    def group_rollup_path(self, db: str, ns: str, metric: str, field: str) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "rollups", f"group_{field}")

    def _group_rollup_meta_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "rollups", "group_rollups.json")

    def register_group_rollup(self, db: str, ns: str, metric: str, field: str) -> None:
        with self._rollup_meta_lock:
            fields = self.group_rollups(db, ns, metric)
            fields.add(field)
            p = self._group_rollup_meta_path(db, ns, metric)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(sorted(fields), fh)
            os.replace(tmp, p)

    def group_rollups(self, db: str, ns: str, metric: str) -> set[str]:
        p = self._group_rollup_meta_path(db, ns, metric)
        if not os.path.isfile(p):
            return set()
        with open(p) as fh:
            return set(json.load(fh))

    # quantile rollups: mergeable fixed-grid sketch partials
    # (operators/rollup.build_quantile_rollup). quantile_rollups.json maps
    # fine_ms -> {bounds, value_range, nbins} — the pinned grids; lives in
    # the same rollups dir so invalidate_rollups drops all kinds at once.
    # distinct (HLL) rollups: never-saturating count-distinct registers
    # keyed by (field, fine grain). Same rollups dir → one invalidation.
    def distinct_rollup_path(
        self, db: str, ns: str, metric: str, field: str, fine_ms: int
    ) -> str:
        return os.path.join(
            self.metric_path(db, ns, metric), "rollups", f"hll_{field}_{fine_ms}"
        )

    def _distinct_rollup_meta_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(
            self.metric_path(db, ns, metric), "rollups", "distinct_rollups.json"
        )

    def register_distinct_rollup(
        self,
        db: str, ns: str, metric: str,
        field: str,
        fine_ms: int,
        bounds: tuple[int, int],
        p: int,
    ) -> None:
        with self._rollup_meta_lock:
            meta = self.distinct_rollups(db, ns, metric)
            meta[(field, fine_ms)] = (bounds, p)
            mp = self._distinct_rollup_meta_path(db, ns, metric)
            os.makedirs(os.path.dirname(mp), exist_ok=True)
            tmp = mp + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {f"{f}|{k}": {"bounds": list(b), "p": pp}
                     for (f, k), (b, pp) in meta.items()},
                    fh,
                )
            os.replace(tmp, mp)

    def distinct_rollups(
        self, db: str, ns: str, metric: str
    ) -> dict[tuple[str, int], tuple[tuple[int, int], int]]:
        mp = self._distinct_rollup_meta_path(db, ns, metric)
        if not os.path.isfile(mp):
            return {}
        with open(mp) as fh:
            raw = json.load(fh)
        out = {}
        for key, v in raw.items():
            field, fine = key.rsplit("|", 1)
            out[(field, int(fine))] = ((v["bounds"][0], v["bounds"][1]), v["p"])
        return out

    def quantile_rollup_path(self, db: str, ns: str, metric: str, fine_ms: int) -> str:
        return os.path.join(self.metric_path(db, ns, metric), "rollups", f"q_{fine_ms}")

    def _quantile_rollup_meta_path(self, db: str, ns: str, metric: str) -> str:
        return os.path.join(
            self.metric_path(db, ns, metric), "rollups", "quantile_rollups.json"
        )

    def register_quantile_rollup(
        self,
        db: str, ns: str, metric: str,
        fine_ms: int,
        bounds: tuple[int, int],
        value_range: tuple[float, float],
        nbins: int,
    ) -> None:
        with self._rollup_meta_lock:
            meta = self.quantile_rollups(db, ns, metric)
            meta[fine_ms] = (bounds, value_range, nbins)
            p = self._quantile_rollup_meta_path(db, ns, metric)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {str(k): {"bounds": list(b), "range": list(r), "nbins": n}
                     for k, (b, r, n) in meta.items()},
                    fh,
                )
            os.replace(tmp, p)

    def quantile_rollups(
        self, db: str, ns: str, metric: str
    ) -> dict[int, tuple[tuple[int, int], tuple[float, float], int]]:
        p = self._quantile_rollup_meta_path(db, ns, metric)
        if not os.path.isfile(p):
            return {}
        with open(p) as fh:
            raw = json.load(fh)
        return {
            int(k): (
                (v["bounds"][0], v["bounds"][1]),
                (v["range"][0], v["range"][1]),
                v["nbins"],
            )
            for k, v in raw.items()
        }

    def invalidate_rollups(self, db: str, ns: str, metric: str) -> None:
        with self._rollup_meta_lock:
            d = os.path.join(self.metric_path(db, ns, metric), "rollups")
            if os.path.isdir(d):
                shutil.rmtree(d)

    # -- dump / restore -----------------------------------------------------
    # Parity surface: the reference ships a restore tool + rpc endpoint
    # (nsdb-cli/src/main/scala/io/radicalbit/nsdb/cli/NsdbRestore.scala,
    # nsdb-rpc/src/main/protobuf/restore.proto) that imports a previously
    # exported bundle. Here a bundle is the metric directory tree
    # (schema.json + meta.json + data/shard_start=* + rollups/*) plus a
    # manifest.json inventory; restore validates the manifest and swaps
    # the tree into place atomically (single directory rename — a reader
    # sees the old metric or the new one, never a half-copied mix).
    BUNDLE_FORMAT = 1
    _BUNDLE_MANIFEST = "manifest.json"

    def dump_metric(self, db: str, ns: str, metric: str, dest: str) -> dict:
        """Export one metric as a self-describing bundle directory at
        `dest` (must not exist). The schema/meta/rollup registry files are
        snapshotted under the registry locks (consistent with each other);
        data shard directories are copied as-is — quiesce writers for a
        point-in-time data snapshot (shard swaps are atomic renames, so a
        racing write surfaces as a copy error, not silent corruption).
        Returns the manifest dict."""
        if not self.exists(db, ns, metric):
            raise MetricNotFound(f"{db}.{ns}.{metric}")
        if os.path.exists(dest):
            raise ValueError(f"dump destination already exists: {dest}")
        src = self.metric_path(db, ns, metric)
        tmp = dest + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        with self._schema_lock, self._rollup_meta_lock:
            shutil.copytree(src, tmp)
        inventory = {}
        total = 0
        for base, _dirs, files in os.walk(tmp):
            for f in files:
                p = os.path.join(base, f)
                rel = os.path.relpath(p, tmp)
                size = os.path.getsize(p)
                inventory[rel] = size
                total += size
        manifest = {
            "format": self.BUNDLE_FORMAT,
            "db": db,
            "namespace": ns,
            "metric": metric,
            "shard_starts": self.locations(db, ns, metric),
            "info": self.get_info(db, ns, metric),
            "n_files": len(inventory),
            "total_bytes": total,
            "files": inventory,
        }
        mpath = os.path.join(tmp, self._BUNDLE_MANIFEST)
        with open(mpath, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.rename(tmp, dest)
        return manifest

    def restore_metric(
        self,
        bundle: str,
        db: str | None = None,
        ns: str | None = None,
        metric: str | None = None,
        overwrite: bool = False,
    ) -> dict:
        """Import a dump_metric bundle. Target identity defaults to the
        manifest's; pass db/ns/metric to restore under a different name.
        The bundle is staged next to the target and verified (manifest
        format, file inventory byte-for-byte sizes, parseable schema)
        BEFORE the atomic swap — a truncated or tampered bundle never
        becomes visible. Refuses an existing target unless overwrite."""
        mpath = os.path.join(bundle, self._BUNDLE_MANIFEST)
        if not os.path.isfile(mpath):
            raise ValueError(f"not a metric bundle (no manifest): {bundle}")
        with open(mpath) as fh:
            manifest = json.load(fh)
        if manifest.get("format") != self.BUNDLE_FORMAT:
            raise ValueError(
                f"unsupported bundle format {manifest.get('format')!r}"
            )
        db = self._safe(db or manifest["db"])
        ns = self._safe(ns or manifest["namespace"])
        metric = self._safe(metric or manifest["metric"])
        target = self.metric_path(db, ns, metric)
        if os.path.exists(target) and not overwrite:
            raise ValueError(
                f"metric {db}.{ns}.{metric} already exists (pass overwrite=True)"
            )
        # verify inventory against the on-disk bundle before touching the
        # warehouse
        for rel, size in manifest["files"].items():
            p = os.path.join(bundle, rel)
            if not os.path.isfile(p) or os.path.getsize(p) != size:
                raise ValueError(f"bundle file missing or truncated: {rel}")
        schema_p = os.path.join(bundle, "schema.json")
        if not os.path.isfile(schema_p):
            raise ValueError("bundle has no schema.json")
        with open(schema_p) as fh:
            MetricSchema.from_json(fh.read())  # raises on corruption
        os.makedirs(os.path.dirname(target), exist_ok=True)
        stage = target + ".restore_tmp"
        if os.path.exists(stage):
            shutil.rmtree(stage)
        shutil.copytree(
            bundle, stage,
            ignore=shutil.ignore_patterns(self._BUNDLE_MANIFEST),
        )
        with self._schema_lock, self._rollup_meta_lock:
            old = None
            if os.path.exists(target):
                old = target + ".restore_old"
                if os.path.exists(old):
                    shutil.rmtree(old)
                os.rename(target, old)
            os.rename(stage, target)
            if old:
                shutil.rmtree(old)
        out = dict(manifest)
        out.update({"db": db, "namespace": ns, "metric": metric})
        return out

        # -- drop / retention ---------------------------------------------------
    def drop_metric(self, db: str, ns: str, metric: str) -> None:
        p = self.metric_path(db, ns, metric)
        if os.path.isdir(p):
            shutil.rmtree(p)

    def drop_shards_older_than(self, db: str, ns: str, metric: str, threshold_ms: int) -> list[int]:
        """Retention eviction: drop whole shards whose upper bound is below
        the threshold (MetadataCoordinator.scala:335-348 analogue)."""
        si = self.get_info(db, ns, metric)["shardInterval"]
        dropped = []
        for start in self.locations(db, ns, metric):
            if start + si <= threshold_ms:
                shutil.rmtree(os.path.join(self.data_path(db, ns, metric), f"shard_start={start}"))
                dropped.append(start)
        return dropped
