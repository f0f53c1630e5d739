"""Persistent catalog: a file-backed metastore facade.

The engine's default catalog is session temp views (catalog.py) — the
right choice for query execution. What Hive additionally provides is
DURABILITY: table metadata survives the session that created it
(reference ``metastore/src/java/org/apache/hadoop/hive/metastore/
HiveMetaStore.java:258`` ``create_table`` / ``:1870`` ``get_table``,
backed by an RDBMS; DDL surface ``ql/exec/DDLTask.java``).

Spark-first mapping: table DATA is self-describing parquet/orc under a
warehouse directory (exactly what ``saveAsTable`` produces); table
METADATA (name → relative path, format, partition columns) is a single
JSON document written atomically next to the data. A brand-new
SparkSession — or a brand-new JVM — calls ``Metastore.attach`` to
re-register every table as a view. No Derby, no Hive jars, no driver
state: the warehouse directory IS the metastore, so at cluster scale
it lives on the shared filesystem (S3/HDFS) like a real warehouse.

Scale notes: attach() reads one small JSON and registers lazy scans —
no data is touched until a query runs; partitioned tables keep their
directory layout so partition pruning works across sessions.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

META_FILE = "_metastore.json"
LOCK_FILE = "_metastore.lock"


def _dir_has_data(root: str) -> bool:
    """True if the directory exists and holds at least one real data
    file (ignoring _SUCCESS/_metadata markers and dotfiles)."""
    for base, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith((".", "_")):
                return True
    return False


class NoSuchTableError(KeyError):
    pass


class Metastore:
    """File-backed table catalog rooted at ``warehouse_dir``."""

    def __init__(self, warehouse_dir: str):
        self.warehouse_dir = warehouse_dir.rstrip("/")
        os.makedirs(self.warehouse_dir, exist_ok=True)
        self._meta_path = os.path.join(self.warehouse_dir, META_FILE)

    # -- metadata document ------------------------------------------------
    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"tables": {}}
        with open(self._meta_path, encoding="utf-8") as f:
            return json.load(f)

    def _write_meta(self, meta: dict, expected_version: int | None = None) -> None:
        # Atomic replace — a crashed writer can never leave a torn
        # metastore (HiveMetaStore gets this from RDBMS transactions).
        # ``expected_version`` is a best-effort compare-and-set: on
        # filesystems where flock degraded to no-op (see _mutate),
        # a concurrent writer that slipped between our read and this
        # write bumps the version, and we fail LOUDLY instead of
        # silently clobbering its update (a small race window
        # remains — the full fix is flock, which is active anywhere
        # POSIX; this turns the degraded path's silent lost-update
        # into a retryable error).
        if expected_version is not None:
            on_disk = self._read_meta().get("version", 0)
            if int(on_disk) != int(expected_version):
                raise RuntimeError(
                    f"metastore concurrent modification: version "
                    f"{on_disk} on disk, expected {expected_version} "
                    "— retry the DDL operation"
                )
        meta["version"] = int(meta.get("version", 0)) + 1
        fd, tmp = tempfile.mkstemp(dir=self.warehouse_dir, suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self._meta_path)

    def _mutate(self, fn: Callable[[dict], object]) -> object:
        """Serialized read-modify-write of the metadata document.

        Concurrency contract (ADVICE r5): two writers interleaving
        read→modify→write would lose updates, so every mutation runs
        under an exclusive ``flock`` on ``_metastore.lock`` — correct
        for any POSIX filesystem (local disk, NFS with lockd, most
        HDFS fuse mounts). On object stores (S3) neither flock nor
        rename atomicity exists: there the deployment contract is
        SINGLE WRITER (one driver mutating DDL, any number of
        readers) — the same contract Hive delegates to its RDBMS and
        S3-native table formats solve with conditional PUTs. The
        ``version`` field increments per write so external tooling
        can detect lost updates after the fact."""
        lock_path = os.path.join(self.warehouse_dir, LOCK_FILE)
        with open(lock_path, "a+", encoding="utf-8") as lock:
            try:
                import fcntl

                fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            except (ImportError, OSError):
                # non-POSIX platform (no fcntl) OR a filesystem whose
                # flock raises ENOLCK/EOPNOTSUPP (NFS without lockd,
                # some fuse/SMB mounts): degrade to the documented
                # single-writer contract rather than failing every
                # DDL mutation.
                pass
            meta = self._read_meta()
            read_version = int(meta.get("version", 0))
            out = fn(meta)
            self._write_meta(meta, expected_version=read_version)
            return out

    def _assert_exists_after_write(self, name: str, written: str) -> None:
        """Post-write guard for DATA writes that validated against an
        unlocked metadata read (defect hunt r13): holding the global
        metastore flock across a distributed write job would serialize
        every table's DDL behind it, so the write runs unlocked and we
        re-check the table UNDER the lock afterwards. If a concurrent
        DROP TABLE won, fail loudly naming the orphaned files — a
        silent success would strand data in a directory no table owns.
        The files are deliberately NOT auto-deleted: DROP with
        purge=False retains the directory by contract, and the two
        cases are indistinguishable after the fact."""
        lock_path = os.path.join(self.warehouse_dir, LOCK_FILE)
        with open(lock_path, "a+", encoding="utf-8") as lock:
            try:
                import fcntl

                fcntl.flock(lock.fileno(), fcntl.LOCK_EX)
            except (ImportError, OSError):
                pass
            exists = name in self._read_meta()["tables"]
        if not exists:
            raise NoSuchTableError(
                f"table {name!r} was dropped concurrently with this "
                f"insert; the written files remain at {written!r} and "
                "are no longer tracked by the metastore"
            )

    # -- DDL surface ------------------------------------------------------
    def create_table(
        self,
        df: DataFrame,
        name: str,
        partition_by: Sequence[str] = (),
        fmt: str = "parquet",
        mode: str = "overwrite",
    ) -> None:
        """``CREATE TABLE name AS SELECT ...`` with durable metadata
        (HiveMetaStore.create_table:258). ``mode='append'`` is
        ``INSERT INTO`` on an existing table — and must agree with
        the registered format/partition spec (ADVICE r5: silently
        rewriting the entry from the call's arguments would corrupt
        the catalog into mixed-format data)."""
        if not name.isidentifier():
            raise ValueError(f"invalid table name {name!r}")
        if mode == "append":
            existing = self._read_meta()["tables"].get(name)
            if existing is not None and (
                existing["format"] != fmt
                or existing["partition_by"] != list(partition_by)
            ):
                raise ValueError(
                    f"INSERT INTO {name!r}: fmt/partition_by "
                    f"({fmt!r}, {list(partition_by)!r}) disagree with the "
                    f"registered table ({existing['format']!r}, "
                    f"{existing['partition_by']!r})"
                )
        path = os.path.join(self.warehouse_dir, name)
        writer = df.write.mode(mode).format(fmt)
        if partition_by:
            from pyspark.sql import functions as F

            writer = df.repartition(
                *[F.col(c) for c in partition_by]
            ).write.mode(mode).format(fmt).partitionBy(*partition_by)
        writer.save(path)

        def upsert(meta: dict) -> None:
            # Re-validate UNDER the lock: the pre-write check above is
            # advisory (it fails fast before a long Spark write), but a
            # concurrent drop+recreate could change the entry between
            # that check and here — never let the catalog entry itself
            # become inconsistent. (The data files written above may
            # still mix in that race; full write-vs-DDL isolation is
            # the single-writer contract — see _mutate.)
            if mode == "append":
                cur = meta["tables"].get(name)
                if cur is not None and (
                    cur["format"] != fmt
                    or cur["partition_by"] != list(partition_by)
                ):
                    raise ValueError(
                        f"INSERT INTO {name!r}: table changed concurrently "
                        f"(registered {cur['format']!r}/"
                        f"{cur['partition_by']!r} vs appended {fmt!r}/"
                        f"{list(partition_by)!r})"
                    )
            entry = {
                "path": name,  # relative → warehouse can be moved/mounted
                "format": fmt,
                "partition_by": list(partition_by),
                "schema": df.schema.json(),
            }
            prev = meta["tables"].get(name)
            if prev is not None:
                if mode == "append":
                    # INSERT INTO must not rewrite the table's
                    # identity: keep owner, per-partition format
                    # overrides and (stale-until-ANALYZE) stats — a
                    # bare replacement let an appender steal
                    # ownership (AuthorizingMetastore re-added owner
                    # as the appender) and broke mixed-format
                    # partition reads
                    merged = dict(prev)
                    merged.update(entry)
                    entry = merged
                elif "owner" in prev:
                    # INSERT OVERWRITE replaces the data (overrides
                    # and stats now describe vanished files) but the
                    # table identity — its owner — survives
                    entry["owner"] = prev["owner"]
            meta["tables"][name] = entry

        self._mutate(upsert)

    def get_table(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve a table on ANY session (HiveMetaStore.get_table:1870).

        With per-partition format overrides present (ALTER TABLE …
        PARTITION … SET FILEFORMAT), resolution switches to the
        Hive reader model: one scan PER PARTITION in that
        partition's effective format, unioned — exactly how the
        reference attaches a per-partition SerDe
        (``Partition.getDeserializer``; qfile family
        ``partition_wise_fileformat*.q``). Partition columns surface
        as STRING (Hive's untyped-partition default). The partition
        list is driver metadata, as in the reference metastore."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        overrides = m.get("partition_formats") or {}
        root = os.path.join(self.warehouse_dir, m["path"])
        if not overrides:
            try:
                return spark.read.format(m["format"]).load(root)
            except Exception:
                # a DATALESS table (create_table_like's empty dir)
                # cannot infer a schema from files; fall back to the
                # recorded definition so the table — and attach()'s
                # whole-warehouse recovery loop, which dies on the
                # first unreadable table — keeps working. Real read
                # errors on tables WITH data re-raise.
                sch = m.get("schema")
                if sch is None or _dir_has_data(root):
                    raise
                from pyspark.sql.types import StructType

                st = StructType.fromJson(json.loads(sch))
                pcols = m.get("partition_by") or []
                fields = [f for f in st.fields if f.name not in pcols]
                fields += [f for f in st.fields if f.name in pcols]
                return spark.createDataFrame([], StructType(fields))
        from functools import reduce
        from urllib.parse import unquote

        from pyspark.sql import functions as F

        cols = m["partition_by"]
        parts = []
        for spec in self.partitions(name):
            segs = [f"{c}={spec[c]}" for c in cols]
            key = "/".join(segs)
            fmt_p = overrides.get(key, m["format"])
            sub = spark.read.format(fmt_p).load(os.path.join(root, *segs))
            for c in cols:
                sub = sub.withColumn(c, F.lit(unquote(spec[c])))
            parts.append(sub)
        if not parts:
            raise ValueError(f"table {name!r} has no partitions to read")
        return reduce(lambda a, b: a.unionByName(b), parts)

    def alter_partition_fileformat(
        self, name: str, spec: dict[str, str], fmt: str
    ) -> None:
        """``ALTER TABLE name PARTITION (col=val, …) SET FILEFORMAT
        fmt`` (reference ``DDLTask.alterPartition``; qfile family
        ``partition_wise_fileformat*.q``): record a per-partition
        format override. As in Hive, this changes how the partition
        is READ and how future writes to it serialize — it does not
        rewrite existing data (overwrite the partition to convert).
        Requires a FULL partition spec naming an EXISTING partition.

        Spec values are restricted to the same safe charset as the
        static-partition writer ([A-Za-z0-9_.-]) so the recorded key
        matches the on-disk percent-escaped directory name exactly —
        for any value Spark escapes (space, colon, …) a raw-keyed
        override would silently never match at read time (ADVICE r6).
        """
        import re as _re

        for v in spec.values():
            if not _re.fullmatch(r"[A-Za-z0-9_.\-]+", str(v)):
                raise ValueError(
                    f"unsupported partition value {v!r} for SET "
                    "FILEFORMAT (escaped-charset values would not "
                    "match on-disk partition directory names)"
                )
        existing = self.partitions(name)
        if not any(
            all(p.get(c) == str(spec[c]) for c in spec) for p in existing
        ):
            raise ValueError(
                f"partition {spec!r} does not exist in table {name!r}"
            )

        def mut(meta: dict) -> None:
            if name not in meta["tables"]:
                raise NoSuchTableError(name)
            m = meta["tables"][name]
            cols = m["partition_by"]
            if not cols:
                raise ValueError(f"table {name!r} is not partitioned")
            if set(spec) != set(cols):
                raise ValueError(
                    f"full partition spec required: {cols} (got "
                    f"{sorted(spec)})"
                )
            key = "/".join(f"{c}={spec[c]}" for c in cols)
            m.setdefault("partition_formats", {})[key] = fmt

        self._mutate(mut)

    def insert_overwrite_static_partition(
        self, df: DataFrame, name: str, spec: dict[str, str]
    ) -> None:
        """``INSERT OVERWRITE TABLE name PARTITION (col='val', …)`` —
        the STATIC single-partition form (``MoveTask`` static branch):
        replace exactly one partition directory, serialized in that
        partition's EFFECTIVE format (honoring SET FILEFORMAT
        overrides). ``df`` must not contain the partition columns —
        they are fixed by the spec."""
        import re as _re

        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        cols = m["partition_by"]
        if not cols:
            raise ValueError(f"table {name!r} is not partitioned")
        if set(spec) != set(cols):
            raise ValueError(f"full partition spec required: {cols}")
        bad = set(cols) & set(df.columns)
        if bad:
            raise ValueError(
                f"df must not carry partition columns {sorted(bad)}"
            )
        for v in spec.values():
            if not _re.fullmatch(r"[A-Za-z0-9_.\-]+", str(v)):
                raise ValueError(
                    f"unsupported partition value {v!r} for the static "
                    "path (use dynamic insert_overwrite_partitions)"
                )
        key = "/".join(f"{c}={spec[c]}" for c in cols)
        fmt = (m.get("partition_formats") or {}).get(key, m["format"])
        dirpath = os.path.join(
            self.warehouse_dir, m["path"], *[f"{c}={spec[c]}" for c in cols]
        )
        df.write.mode("overwrite").format(fmt).save(dirpath)
        # the write ran against an unlocked metadata read — fail loud
        # if a concurrent DROP TABLE won (ghost-directory class)
        self._assert_exists_after_write(name, dirpath)

    def drop_table(self, name: str, purge: bool = True) -> None:
        """``DROP TABLE [PURGE]``: metadata always, data iff purge."""

        def pop(meta: dict) -> dict:
            entry = meta["tables"].pop(name, None)
            if entry is None:
                raise NoSuchTableError(name)
            return entry

        m = self._mutate(pop)
        if purge:
            import shutil

            shutil.rmtree(
                os.path.join(self.warehouse_dir, m["path"]), ignore_errors=True
            )

    def rename_table(self, name: str, new_name: str) -> None:
        """``ALTER TABLE name RENAME TO new_name``
        (``DDLTask.alterTable`` rename branch → metastore
        ``alter_table``; in managed-table Hive the data directory
        moves with the name): metadata re-key + directory rename,
        both under the mutation lock."""
        # same rule create_table applies (ADVICE r11: the two entry
        # points must accept the same name grammar)
        if not new_name.isidentifier():
            raise ValueError(f"invalid table name {new_name!r}")
        moved: list[tuple[str, str]] = []

        def mut(meta: dict) -> None:
            if name not in meta["tables"]:
                raise NoSuchTableError(name)
            if new_name in meta["tables"]:
                raise ValueError(f"table {new_name!r} already exists")
            dst = os.path.join(self.warehouse_dir, new_name)
            if os.path.exists(dst):
                raise ValueError(
                    f"destination path {dst!r} already exists on disk"
                )
            entry = meta["tables"].pop(name)
            # move the directory BEFORE the metadata commit, inside
            # the mutation lock: if the rename fails (stray file at
            # the destination, permissions) the catalog is untouched
            # — committing first left the catalog pointing at a
            # directory that was never created, with the data
            # stranded under the old name
            src = os.path.join(self.warehouse_dir, entry["path"])
            os.rename(src, dst)
            moved.append((src, dst))
            entry["path"] = new_name
            meta["tables"][new_name] = entry

        try:
            self._mutate(mut)
        except BaseException:
            # ADVICE r11: if the metadata commit fails AFTER the
            # directory moved (version conflict on a flock-degraded
            # filesystem, IO error), the catalog still points at the
            # old path — roll the rename back best-effort so the
            # table stays readable; on rollback failure the data is
            # intact at the new path and the raised error names it.
            if moved:
                src, dst = moved[0]
                try:
                    os.rename(dst, src)
                except OSError:
                    pass
            raise

    def truncate_table(self, name: str, spec: dict | None = None) -> None:
        """``TRUNCATE TABLE name [PARTITION (col=val, …)]``
        (``DDLTask.truncateTable``): delete the DATA (whole table or
        one partition directory), keep the table definition. On a
        partitioned table without a spec every partition directory is
        removed; the table root stays."""
        import shutil

        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        root = os.path.join(self.warehouse_dir, m["path"])
        if spec:
            cols = m["partition_by"]
            if set(spec) != set(cols):
                raise ValueError(f"full partition spec required: {cols}")
            target = os.path.join(
                root, *[f"{c}={spec[c]}" for c in cols]
            )
            if not os.path.isdir(target):
                raise ValueError(f"partition {spec!r} not in {name!r}")
            shutil.rmtree(target)
            return
        if os.path.isdir(root):
            for entry in os.listdir(root):
                sub = os.path.join(root, entry)
                if os.path.isdir(sub):
                    shutil.rmtree(sub)
                else:
                    os.remove(sub)

    def create_table_like(self, src: str, new_name: str) -> None:
        """``CREATE TABLE new LIKE src`` (``DDLTask.createTableLike``):
        copy the DEFINITION (format, partition columns) with an empty
        data directory — no rows, no stats."""

        def mut(meta: dict) -> None:
            if src not in meta["tables"]:
                raise NoSuchTableError(src)
            if new_name in meta["tables"]:
                raise ValueError(f"table {new_name!r} already exists")
            entry = dict(meta["tables"][src])
            entry["path"] = new_name
            entry.pop("stats", None)
            entry["partition_formats"] = {}
            meta["tables"][new_name] = entry

        self._mutate(mut)
        os.makedirs(os.path.join(self.warehouse_dir, new_name), exist_ok=True)

    def tables(self) -> list[str]:
        """``SHOW TABLES``."""
        return sorted(self._read_meta()["tables"])

    def attach(self, spark: SparkSession, prefix: str = "") -> list[str]:
        """Register every catalog table as a temp view on ``spark`` —
        the new-session / new-JVM recovery path. Lazy scans only; no
        data read here."""
        names = []
        for name in self.tables():
            self.get_table(spark, name).createOrReplaceTempView(prefix + name)
            names.append(prefix + name)
        return names

    # -- EXPORT / IMPORT --------------------------------------------------
    def export_table(self, name: str, dest_dir: str) -> None:
        """``EXPORT TABLE name TO 'dest'`` (reference
        ``ql/parse/ExportSemanticAnalyzer.java:48`` +
        ``ql/exec/CopyTask``): copy the table's data directory plus a
        self-contained ``_metadata.json`` describing format and
        partition spec, so the archive imports into ANY warehouse —
        the HDP migration / replication path. Data files are copied
        byte-for-byte; no re-encode, no Spark job."""
        import shutil

        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        os.makedirs(dest_dir, exist_ok=True)
        with open(
            os.path.join(dest_dir, "_metadata.json"), "w", encoding="utf-8"
        ) as f:
            json.dump({"table": name, **m}, f, indent=1, sort_keys=True)
        shutil.copytree(
            os.path.join(self.warehouse_dir, m["path"]),
            os.path.join(dest_dir, "data"),
            dirs_exist_ok=True,
        )

    def import_table(self, archive_dir: str, as_name: str | None = None) -> str:
        """``IMPORT [TABLE as_name] FROM 'archive'`` (reference
        ``ql/parse/ImportSemanticAnalyzer.java:71``): read the
        archive's ``_metadata.json``, copy the data directory into
        THIS warehouse, register the table. Returns the table name."""
        import shutil

        with open(
            os.path.join(archive_dir, "_metadata.json"), encoding="utf-8"
        ) as f:
            m = json.load(f)
        name = as_name or m["table"]
        if not name.isidentifier():
            raise ValueError(f"invalid table name {name!r}")
        if name in self._read_meta()["tables"]:
            raise ValueError(f"table {name!r} already exists")
        # copy into a HIDDEN staging dir first and publish with a
        # rename inside the locked mutation: copying straight to the
        # final path squatted the warehouse directory when the
        # registration lost a create race (blocking future CREATE /
        # RENAME to this name), and cleaning the final path up on
        # failure would delete a racing creator's data instead of
        # ours. The staging dir is ours alone — always safe to remove.
        data_dir = os.path.join(self.warehouse_dir, name)
        # pid alone is NOT unique: two driver THREADS importing the
        # same name collide on the staging path, and a crashed import
        # plus pid reuse leaves a stale dir copytree trips over — so
        # add a uuid component (ADVICE r12)
        staged = os.path.join(
            self.warehouse_dir,
            f".import_{name}_{os.getpid()}_{uuid.uuid4().hex[:12]}",
        )
        shutil.copytree(os.path.join(archive_dir, "data"), staged)
        published: list[str] = []

        def insert(meta: dict) -> None:
            if name in meta["tables"]:
                raise ValueError(f"table {name!r} already exists")
            if os.path.exists(data_dir):
                raise ValueError(
                    f"destination path {data_dir!r} already exists on disk"
                )
            entry = {
                "path": name,
                "format": m["format"],
                "partition_by": list(m["partition_by"]),
            }
            # the archive's data files were copied byte-for-byte, so
            # the metadata describing them must travel too: dropping
            # partition_formats left a mixed-format table unreadable
            # (orc partition read with the parquet reader). Owner is
            # NOT carried — the importer owns the imported table.
            for k in ("partition_formats", "stats", "schema"):
                if m.get(k):
                    entry[k] = m[k]
            os.rename(staged, data_dir)
            published.append(data_dir)
            meta["tables"][name] = entry

        try:
            self._mutate(insert)
        except BaseException:
            if published:
                # commit failed AFTER the publish rename — un-publish
                # so the path doesn't squat (same rollback contract
                # as rename_table)
                try:
                    os.rename(data_dir, staged)
                except OSError:
                    pass
            shutil.rmtree(staged, ignore_errors=True)
            raise
        return name

    # -- ANALYZE / statistics ---------------------------------------------
    def analyze_table(
        self,
        spark: SparkSession,
        name: str,
        columns: Sequence[str] | None = None,
        exact_ndv: bool = True,
    ) -> dict:
        """``ANALYZE TABLE name COMPUTE STATISTICS [FOR COLUMNS]``
        (reference ``ql/exec/ColumnStatsTask.java:58`` persisting via
        ``metastore update_table_column_statistics``): one aggregation
        pass computes row count plus per-column NDV / null count /
        min / max, stored durably in the table's metadata document.

        One job, one shuffle-free partial-agg tree: every statistic
        is an aggregate expression in a single ``agg`` — Spark
        computes them all in one scan. ``exact_ndv=False`` switches
        to approx_count_distinct (HLL) — the right dial at 100 TB,
        exactly as Hive's own compute_stats uses an FM-sketch."""
        from pyspark.sql import functions as F

        df = self.get_table(spark, name)
        cols = list(columns) if columns else df.columns
        ndv = (
            (lambda c: F.countDistinct(F.col(c)))
            if exact_ndv
            else (lambda c: F.approx_count_distinct(F.col(c)))
        )
        exprs = [F.count(F.lit(1)).alias("__numRows")]
        for c in cols:
            exprs += [
                ndv(c).alias(f"{c}__ndv"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        row = df.agg(*exprs).collect()[0].asDict()
        stats = {
            "numRows": row["__numRows"],
            "columns": {
                c: {
                    "ndv": row[f"{c}__ndv"],
                    "nulls": row[f"{c}__nulls"],
                    "min": row[f"{c}__min"],
                    "max": row[f"{c}__max"],
                }
                for c in cols
            },
        }
        def store(meta: dict) -> None:
            if name not in meta["tables"]:
                raise NoSuchTableError(name)
            meta["tables"][name]["stats"] = stats

        self._mutate(store)
        return stats

    def table_stats(self, name: str) -> dict | None:
        """Stored statistics (``DESCRIBE FORMATTED`` numbers), or
        None if the table was never analyzed."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        return meta[name].get("stats")

    # -- partitions -------------------------------------------------------
    def partitions(self, name: str) -> list[dict[str, str]]:
        """``SHOW PARTITIONS`` (``ql/exec/DDLTask.java showPartitions``):
        enumerate partition specs from the directory layout —
        ``col=value`` path segments, exactly the Hive convention Spark
        writes. Metadata-only: lists directories, reads no data."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        cols = m["partition_by"]
        if not cols:
            return []
        specs: list[dict[str, str]] = []

        def walk(path: str, depth: int, spec: dict[str, str]) -> None:
            if depth == len(cols):
                specs.append(dict(spec))
                return
            for entry in sorted(os.listdir(path)):
                sub = os.path.join(path, entry)
                if os.path.isdir(sub) and entry.startswith(cols[depth] + "="):
                    spec[cols[depth]] = entry.split("=", 1)[1]
                    walk(sub, depth + 1, spec)
                    spec.pop(cols[depth], None)

        walk(os.path.join(self.warehouse_dir, m["path"]), 0, {})
        return specs

    def insert_overwrite_partitions(self, df: DataFrame, name: str) -> None:
        """``INSERT OVERWRITE TABLE name PARTITION (col, ...)`` with
        HIVE semantics (reference ``ql/exec/MoveTask.java`` +
        ``Hive.loadDynamicPartitions``): only the partitions PRESENT
        in the incoming data are replaced; untouched partitions
        survive. Spark's default static overwrite would truncate the
        whole table — the dynamic partition-overwrite mode is the
        Hive-parity setting, applied via the PER-WRITER
        ``partitionOverwriteMode`` option (never a session-conf
        set/restore, which leaks to concurrent driver threads)."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        if not m["partition_by"]:
            raise ValueError(f"table {name!r} is not partitioned")
        from pyspark.sql import functions as F

        cols = m["partition_by"]
        # partitions this write will replace are serialized in the
        # TABLE format (Hive loadDynamicPartitions gives new
        # partitions the table's SerDe), so any SET FILEFORMAT
        # override they carried is stale the moment the write lands —
        # leaving it would make get_table read the fresh files with
        # the wrong reader
        written = None
        if m.get("partition_formats"):
            written = {
                "/".join(f"{c}={r[c]}" for c in cols)
                for r in df.select(*cols).distinct().collect()
            }
        # dynamic overwrite rides the per-writer option, NOT a
        # session-conf set/restore: a concurrent write on another
        # driver thread could observe the leaked session-wide
        # 'dynamic' (same hazard class as the acid _full_rewrite and
        # idempotent_batch_sink fixes)
        table_root = os.path.join(self.warehouse_dir, m["path"])
        (
            df.repartition(*[F.col(c) for c in cols])
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .format(m["format"])
            .partitionBy(*cols)
            .save(table_root)
        )
        # the write ran against an unlocked metadata read — fail loud
        # if a concurrent DROP TABLE won (ghost-directory class)
        self._assert_exists_after_write(name, table_root)
        if written:

            def drop_stale(meta: dict) -> None:
                t = meta["tables"].get(name)
                if not t:
                    return
                pf = t.get("partition_formats") or {}
                for k in list(pf):
                    if k in written:
                        pf.pop(k)

            self._mutate(drop_stale)

    def exchange_partition(
        self, src: str, dst: str, spec: dict[str, str]
    ) -> None:
        """``ALTER TABLE dst EXCHANGE PARTITION (col=val, …) WITH
        TABLE src`` (reference ``ql/exec/DDLTask.java:4567``
        exchangeTablePartition → ``HiveMetaStore.exchange_partition``):
        MOVE one partition directory from ``src`` into ``dst`` —
        a metadata-speed rename, no data rewrite, the Hive idiom for
        promoting a staging table's partition into production.

        Hive preconditions enforced here too: both tables must share
        the partition-column list and storage format; the partition
        must exist in ``src`` and must NOT exist in ``dst``. Spec
        values are restricted to the safe charset (same rule as SET
        FILEFORMAT) so the on-disk directory name equals the spec.

        The validation AND the directory rename run inside the locked
        mutation (defect hunt r13): validating against an unlocked
        metadata read let a concurrent ``drop_table(dst)`` land
        between the check and the rename — makedirs then RESURRECTED
        the dropped table's directory and moved src's partition into
        a ghost dir no table owns (stranded data, silently clobbered
        by the next CREATE of that name)."""
        import re as _re

        def do(doc: dict) -> None:
            meta = doc["tables"]
            for n in (src, dst):
                if n not in meta:
                    raise NoSuchTableError(n)
            ms, md = meta[src], meta[dst]
            if ms["partition_by"] != md["partition_by"]:
                raise ValueError(
                    f"partition columns differ: {ms['partition_by']} vs "
                    f"{md['partition_by']}"
                )
            if ms["format"] != md["format"]:
                raise ValueError(
                    f"storage formats differ: {ms['format']} vs {md['format']}"
                )
            cols = ms["partition_by"]
            if set(spec) != set(cols):
                raise ValueError(f"full partition spec required: {cols}")
            for v in spec.values():
                if not _re.fullmatch(r"[A-Za-z0-9_.\-]+", str(v)):
                    raise ValueError(f"unsupported partition value {v!r}")
            segs = [f"{c}={spec[c]}" for c in cols]
            src_dir = os.path.join(self.warehouse_dir, ms["path"], *segs)
            dst_dir = os.path.join(self.warehouse_dir, md["path"], *segs)
            # destination-absent is checked FIRST (as in DDLTask's
            # precondition order) so a replayed exchange reports the
            # real conflict, not a misleading missing-source error
            if os.path.exists(dst_dir):
                raise ValueError(
                    f"partition {spec!r} already exists in table {dst!r} "
                    "(Hive EXCHANGE requires the destination to be absent)"
                )
            if not os.path.isdir(src_dir):
                raise ValueError(f"partition {spec!r} not in table {src!r}")
            os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
            os.rename(src_dir, dst_dir)

        self._mutate(do)

    def drop_partition(self, name: str, spec: dict) -> int:
        """``ALTER TABLE name DROP PARTITION (col=val, ...)``
        (reference ``ql/exec/DDLTask.java dropPartitions`` →
        ``HiveMetaStore.drop_partition``): remove every partition
        directory matching the (possibly partial) spec; returns the
        number of LEAF partitions dropped. Metadata needs no update —
        partitions derive from the directory layout.

        Matching: directory names are unescaped before comparison
        (Spark writes Hive-style percent-escaped values, e.g.
        ``a%3Ab`` for ``a:b``), and a spec value of ``None`` matches
        the ``__HIVE_DEFAULT_PARTITION__`` null directory. Spec
        values compare as strings — pass the same text Spark wrote
        (e.g. ``'2.0'`` for a double partition column). An EMPTY spec
        raises: Hive requires at least one column, and silently
        matching everything would rmtree the whole table.

        Runs inside the locked mutation (defect hunt r13, same class
        as exchange_partition): the walk/rmtree must not interleave
        with a concurrent ``drop_table``/``rename_table`` of the same
        table — the table's existence is re-validated under the lock
        the rival's metadata pop also takes."""
        import shutil
        from urllib.parse import unquote

        if not spec:
            raise ValueError(
                "DROP PARTITION requires a non-empty spec (an empty "
                "spec would drop every partition; use drop_table)"
            )

        def do(doc: dict) -> int:
            meta = doc["tables"]
            if name not in meta:
                raise NoSuchTableError(name)
            m = meta[name]
            cols = m["partition_by"]
            bad = set(spec) - set(cols)
            if bad:
                raise ValueError(f"unknown partition columns {sorted(bad)}")
            dropped = 0
            root = os.path.join(self.warehouse_dir, m["path"])

            def matches(want: object, dir_val: str) -> bool:
                val = unquote(dir_val)
                if want is None:
                    return val == "__HIVE_DEFAULT_PARTITION__"
                return str(want) == val

            def leaves(path: str, depth: int) -> int:
                if depth == len(cols):
                    return 1
                total = 0
                for entry in os.listdir(path):
                    sub = os.path.join(path, entry)
                    if os.path.isdir(sub) and entry.startswith(cols[depth] + "="):
                        total += leaves(sub, depth + 1)
                return total

            def walk(path: str, depth: int) -> None:
                nonlocal dropped
                if depth == len(cols):
                    return
                col = cols[depth]
                for entry in sorted(os.listdir(path)):
                    sub = os.path.join(path, entry)
                    if not os.path.isdir(sub) or not entry.startswith(col + "="):
                        continue
                    if col in spec and not matches(
                        spec[col], entry.split("=", 1)[1]
                    ):
                        continue
                    if not any(c in spec for c in cols[depth + 1 :]):
                        dropped += leaves(sub, depth + 1)
                        shutil.rmtree(sub)
                    else:
                        walk(sub, depth + 1)

            walk(root, 0)
            return dropped

        return self._mutate(do)

    def show_create_table(
        self, name: str, spark: SparkSession | None = None
    ) -> str:
        """``SHOW CREATE TABLE`` (reference ``ql/exec/DDLTask.java
        showCreateTable``): reconstruct executable DDL text from the
        catalog entry — columns (from the data's self-describing
        schema when a session is given, else omitted), STORED AS
        format, PARTITIONED BY, LOCATION."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        parts = [f"CREATE TABLE {name}"]
        types: dict[str, str] = {}
        if spark is not None:
            df = self.get_table(spark, name)
            types = {
                f.name: f.dataType.simpleString() for f in df.schema.fields
            }
            pcols = set(m["partition_by"])
            cols = ",\n  ".join(
                f"{n} {t}" for n, t in types.items() if n not in pcols
            )
            parts.append(f"(\n  {cols}\n)")
        if m["partition_by"]:
            # Hive DDL requires TYPED partition columns (and they must
            # not repeat in the body) — emit types whenever the data
            # schema is available so the text actually parses.
            spec = ", ".join(
                f"{c} {types[c]}" if c in types else c
                for c in m["partition_by"]
            )
            parts.append(f"PARTITIONED BY ({spec})")
        parts.append(f"STORED AS {m['format'].upper()}")
        parts.append(
            f"LOCATION '{os.path.join(self.warehouse_dir, m['path'])}'"
        )
        return "\n".join(parts)

    def msck_repair(self, name: str) -> dict:
        """``MSCK REPAIR TABLE`` (``ql/exec/DDLTask.java msck``): in
        Hive, reconcile the partition list in the metastore RDBMS with
        the directories on disk. This catalog derives partitions FROM
        the directory layout (self-describing warehouse), so repair
        reduces to validating the layout and reporting what a
        Hive-side repair would have added — partitions whose
        directories exist. Raises on a layout that Hive could not
        repair (a non-``col=`` stray directory at ANY partition
        depth — ADVICE r5: a first-level-only check lets
        ``table/a=1/junk/`` corrupt a multi-level layout silently)."""
        meta = self._read_meta()["tables"]
        if name not in meta:
            raise NoSuchTableError(name)
        m = meta[name]
        cols = m["partition_by"]
        root = os.path.join(self.warehouse_dir, m["path"])

        def check(path: str, depth: int) -> None:
            if depth == len(cols):
                return
            for entry in os.listdir(path):
                sub = os.path.join(path, entry)
                if not os.path.isdir(sub) or entry.startswith(("_", ".")):
                    continue
                if not entry.startswith(cols[depth] + "="):
                    raise ValueError(
                        f"stray directory {entry!r} at partition depth "
                        f"{depth} ({'/'.join(cols)}) under table {name!r}"
                    )
                check(sub, depth + 1)

        if cols:
            check(root, 0)
        return {"table": name, "partitions": self.partitions(name)}




class AccessDeniedError(PermissionError):
    """SQL-standard authorization denial (HiveAccessControlException
    analogue)."""


PRIVILEGES = ("SELECT", "INSERT", "UPDATE", "DELETE", "ALL")


class AuthorizingMetastore(Metastore):
    """SQL-standard-based authorization over the file-backed catalog
    — the reference's SQLStdHiveAccessController surface
    (``ql/security/authorization/plugin/sqlstd/`` — GRANT/REVOKE
    stored in the metastore, checked at compile time; HDP deploys
    the same model via Ranger policies, whose row/column data plane
    is ``functions/policies.py``).

    Grants are DATA in the same versioned metadata document as
    tables (same flock + CAS discipline), shaped
    ``grants[table][user] -> [privilege,...]``. ``ALL`` implies
    every privilege; a table's OWNER (creator) holds ALL implicitly
    — exactly the default the SQL-standard authorizer ships.
    ``authorized_read`` is the composed enforcement path: privilege
    check, then the Ranger-style row/column policies applied to the
    DataFrame — deny before data, then mask what's left."""

    def __init__(self, warehouse_dir: str, current_user: str = "owner"):
        super().__init__(warehouse_dir)
        self.current_user = current_user

    def create_table(self, df, name, **kw):
        super().create_table(df, name, **kw)

        def add_owner(meta):
            t = meta["tables"].get(name)
            if t is not None and "owner" not in t:
                t["owner"] = self.current_user

        self._mutate(add_owner)

    def grant(self, table: str, user: str, privilege: str) -> None:
        privilege = privilege.upper()
        if privilege not in PRIVILEGES:
            raise ValueError(f"unknown privilege {privilege!r}")

        def do(meta):
            if table not in meta["tables"]:
                raise NoSuchTableError(table)
            g = meta.setdefault("grants", {}).setdefault(table, {})
            cur = set(g.get(user, ()))
            cur.add(privilege)
            g[user] = sorted(cur)

        self._mutate(do)

    def revoke(self, table: str, user: str, privilege: str) -> None:
        privilege = privilege.upper()

        def do(meta):
            g = meta.get("grants", {}).get(table, {})
            cur = set(g.get(user, ()))
            if "ALL" in cur and privilege != "ALL":
                # SQL-standard semantics: ALL stands for every concrete
                # privilege, so revoking one must leave the others —
                # discarding from {'ALL'} was a silent no-op and the
                # user KEPT the revoked privilege
                cur = {p for p in PRIVILEGES if p != "ALL"}
            cur.discard(privilege)
            if privilege == "ALL":
                cur.clear()
            g[user] = sorted(cur)

        self._mutate(do)

    def grants_for(self, table: str, user: str) -> list[str]:
        meta = self._read_meta()
        return list(meta.get("grants", {}).get(table, {}).get(user, []))

    def check_access(self, table: str, privilege: str, user: str | None = None) -> None:
        user = user or self.current_user
        meta = self._read_meta()
        t = meta["tables"].get(table)
        if t is None:
            raise NoSuchTableError(table)
        if t.get("owner") == user:
            return  # owner holds ALL implicitly
        held = set(meta.get("grants", {}).get(table, {}).get(user, ()))
        if privilege.upper() in held or "ALL" in held:
            return
        raise AccessDeniedError(
            f"user {user!r} lacks {privilege.upper()} on {table!r} "
            f"(held: {sorted(held) or 'none'})"
        )

    def authorized_read(
        self,
        spark,
        table: str,
        user: str | None = None,
        policies: list | None = None,
    ):
        """SELECT with the full enforcement stack: privilege gate
        first (deny produces NO plan at all), then row-filter +
        column-mask policies rewrite the DataFrame."""
        user = user or self.current_user
        self.check_access(table, "SELECT", user)
        df = self.get_table(spark, table)
        if policies:
            from .functions.policies import apply_policies

            df = apply_policies(df, table, user, policies)
        return df
