"""TableIO — storage shim: Iceberg tables when a catalog is configured,
plain parquet directories otherwise (this sandbox has no Iceberg jar).

The north rule speaks Iceberg; the engine code only ever says
``TableIO.write(df, "kg.nodes")`` / ``TableIO.read(spark, "kg.nodes")`` so the
same pipeline runs against either backend. KGX TSV export is kept for parity
with the reference's on-disk format (eco_kg writes nodes.tsv/edges.tsv via
``utils/transform_utils.py:66-80``; merge dumps tar.gz TSV per merge.yaml:66-71).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    # an Iceberg catalog is configured iff some spark.sql.catalog.<name> is set
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _ in confs)


class TableIO:
    """Reads/writes logical tables ``db.table`` to Iceberg or a parquet root."""

    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.iceberg = _iceberg_available(spark)
        self.warehouse = warehouse or os.environ.get(
            "ECOKG_WAREHOUSE", "/tmp/ecokg_warehouse"
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, *name.split("."))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.iceberg:
            w = df.writeTo(name)
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
            return
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.table(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(name)
        return os.path.isdir(self._path(name))

    def write_bucketed(self, df: DataFrame, name: str, n_buckets: int,
                       bucket_cols: list[str],
                       sort_cols: list[str] | None = None,
                       mode: str = "overwrite") -> None:
        """Bucketed table write — the co-located-join primitive for the big
        graph tables (north-rule partitioning: kg.edges bucketed by
        subject). Joins/aggregations keyed on the bucket columns read the
        table with NO exchange (each bucket is a pre-shuffled partition;
        Iceberg's equivalent is `bucket(N, col)` partition transforms).
        Requires a session catalog (saveAsTable), which both the in-memory
        and Hive catalogs provide."""
        self.spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.option("path", self._path(name)).saveAsTable(name.replace(".", "_"))

    def read_bucketed(self, name: str) -> DataFrame:
        return self.spark.table(name.replace(".", "_"))

    def merge_into(self, source: DataFrame, name: str, keys: list[str],
                   when_matched: str = "update") -> None:
        """Key-upsert `source` into logical table `name` (north-rule Iceberg
        language: the merged-graph tables are MERGE targets).

        With an Iceberg catalog this is a real in-place ``MERGE INTO``
        (``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``);
        on the parquet fallback it is the anti-join emulation the streaming
        sink already uses (streaming/merge_sink.py):

        - ``when_matched="update"``: kept = target ANTI source(keys);
          rewrite kept UNION source atomically (stage dir + rename — the
          stage write materializes before the old path is dropped).
        - ``when_matched="ignore"``: insert-only — append source ANTI
          target; no rewrite, so replays are idempotent (first write wins).

        Source rows are deduplicated on `keys` first (SQL MERGE errors on
        multi-matched sources); which duplicate survives is arbitrary, so
        pre-aggregate upstream when the surviving row matters.
        At scale the anti-join probes the existing table keyed on `keys`;
        keep the target bucketed on the leading key (write_bucketed) so the
        probe is exchange-free."""
        if when_matched not in ("update", "ignore"):
            raise ValueError(f"when_matched={when_matched!r}")
        source = source.dropDuplicates(keys)
        if not self.exists(name):
            self.write(source, name, mode="overwrite")
            return
        if self.iceberg:
            view = "_merge_src_" + name.replace(".", "_")
            source.createOrReplaceTempView(view)
            on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
            matched = ("WHEN MATCHED THEN UPDATE SET * "
                       if when_matched == "update" else "")
            self.spark.sql(
                f"MERGE INTO {name} t USING {view} s ON {on} "
                f"{matched}WHEN NOT MATCHED THEN INSERT *")
            self.spark.catalog.dropTempView(view)
            return
        path = self._path(name)
        target = self.spark.read.parquet(path)
        if when_matched == "ignore":
            fresh = source.join(target.select(*keys), keys, "left_anti")
            fresh.write.mode("append").parquet(path)
            return
        kept = target.join(source.select(*keys), keys, "left_anti")
        merged = kept.unionByName(source.select(*target.columns))
        tmp = path + "__staging"
        merged.write.mode("overwrite").parquet(tmp)  # materializes BEFORE drop
        import shutil
        shutil.rmtree(path)
        os.rename(tmp, path)

    def export_kgx_tsv(self, df: DataFrame, out_dir: str, compress: bool = True) -> None:
        """KGX-parity TSV export (reference: merge.yaml:66-71 tar.gz TSV dump;
        we keep plain .tsv.gz — the tar wrapper carries no information)."""
        w = df.write.mode("overwrite").option("sep", "\t").option("header", "true")
        if compress:
            w = w.option("compression", "gzip")
        w.csv(out_dir)

    def export_kgx_jsonl(self, df: DataFrame, out_dir: str,
                         compress: bool = True) -> None:
        """KGX jsonlines export — the other interchange format the KGX
        toolchain the reference builds on accepts (kgx transform
        --output-format jsonl). One JSON object per row, written by the
        JVM JSON datasource (no Python in the path); NULL-valued fields
        are omitted per jsonlines convention, which `kgx validate`
        expects. Multi-valued KGX slots (category, synonym) should be
        array columns before export — json keeps them as arrays where csv
        would flatten to pipe-joins."""
        w = df.write.mode("overwrite")
        if compress:
            w = w.option("compression", "gzip")
        w.json(out_dir)


def read_zip_entries(spark: SparkSession, path: str,
                     pattern: str | None = None) -> DataFrame:
    """Zip-archive source (S12; reference `unzip_to_tempdir`,
    utils/transform_utils.py:168-180 — gzip Spark reads natively, zip it
    does not): binaryFile scan + an Arrow-batched decompressor.

    Returns (archive, entry, content binary) — one row per zip member.
    Each archive decompresses inside one task (zip's central directory is
    per-file, so archive-level is the natural parallel unit; many archives
    spread across the cluster via the binaryFile scan's partitioning).
    `pattern` filters entry names with a Python fnmatch (e.g. '*.tsv').
    """
    import fnmatch
    import io as _io
    import zipfile
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("archive", T.StringType()),
        T.StructField("entry", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    def unzip(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for _, row in pdf.iterrows():  # a handful of archives per batch
                out: list[tuple[str, str, bytes]] = []
                with zipfile.ZipFile(_io.BytesIO(row["content"])) as z:
                    for name in z.namelist():
                        if name.endswith("/"):
                            continue
                        if pattern and not fnmatch.fnmatch(name, pattern):
                            continue
                        out.append((row["path"], name, z.read(name)))
                if out:
                    yield pd.DataFrame(out, columns=["archive", "entry", "content"])

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(unzip, schema)


def read_zip_tsv(spark: SparkSession, path: str, cols: list[str],
                 sep: str = "\t", pattern: str | None = None,
                 comment: str | None = None) -> DataFrame:
    """TSV rows out of zip members: decompress (read_zip_entries), split
    lines/fields JVM-side. `comment` drops lines starting with that prefix
    (the GAF '!' convention)."""
    from pyspark.sql import functions as F

    lines = read_zip_entries(spark, path, pattern=pattern).select(
        F.explode(F.split(F.decode("content", "UTF-8"), "\r?\n")).alias("line")
    ).where(F.col("line") != "")
    if comment:
        lines = lines.where(~F.col("line").startswith(comment))
    parts = F.split("line", sep)
    return lines.select(
        *[parts.getItem(i).alias(c) for i, c in enumerate(cols)]
    )


def parse_timestamp_multi(col, formats: list[str] | None = None):
    """Multi-format timestamp ingestion: try each format in order with
    try_to_timestamp (NULL on mismatch, never ANSI errors), first match
    wins; returns (ts, fmt_idx) as a struct column — fmt_idx records
    WHICH format matched (-1 = none), the lineage a messy-feed ingest
    keeps for QC. Formats are Spark datetime patterns; the default list
    covers ISO, ISO-with-T, date-only, and US slash forms.

    Pure Catalyst coalesce chain — one projection, no UDF; at corpus
    scale this rides the scan like any other conversion.
    """
    from pyspark.sql import functions as F

    fmts = formats or [
        "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy-MM-dd", "MM/dd/yyyy HH:mm", "MM/dd/yyyy",
    ]
    c = F.col(col) if isinstance(col, str) else col
    parsed = [F.try_to_timestamp(c, F.lit(f)) for f in fmts]
    ts = F.coalesce(*parsed)
    idx = F.lit(-1)
    for i in range(len(fmts) - 1, -1, -1):
        idx = F.when(parsed[i].isNotNull(), F.lit(i)).otherwise(idx)
    return F.struct(ts.alias("ts"), idx.cast("int").alias("fmt_idx"))


def read_jsonl_tolerant(spark: SparkSession, path: str, schema: str):
    """Corrupt-tolerant JSONL ingestion: read with an explicit schema in
    PERMISSIVE mode plus a `_corrupt` column capturing every line Spark
    could not parse against the schema — the web-feed reality where a
    fraction of records is truncated or malformed and FAILFAST would
    kill a 100-TB job at the first bad byte. An explicit schema is also
    the scale rule: schema inference is a full extra pass over the
    data.

    Returns the parsed DataFrame with `_corrupt` (NULL for good rows);
    filter `_corrupt IS NULL` for the clean set, aggregate the rest for
    the ingest QC report. NOTE (Spark semantics): a corrupt row binds
    ONLY `_corrupt` — its schema columns are NULL — and querying only
    the corrupt column requires the full row set, which this wrapper
    guarantees by never pruning the parsed columns away before a cache
    boundary.
    """
    full = schema + ", _corrupt string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
