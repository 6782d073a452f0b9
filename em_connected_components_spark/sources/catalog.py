"""Edge-table catalog — Iceberg when available, parquet otherwise.

The graft contract (BASELINE.json north_star/input_hint) frames the engine
over Iceberg tables. This sandbox ships no Iceberg runtime jars, so the
catalog negotiates: if the session was built with the Iceberg SQL extensions
and a configured catalog (the standard
``spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions``
+ ``spark.sql.catalog.<name>`` config pair), tables are written/read through
``format("iceberg")`` with bucket partitioning on ``src``; otherwise the same
logical tables live as bucket-partitioned parquet directories. Everything
downstream consumes plain DataFrames either way — the engine's operators are
storage-agnostic by construction.

Production deployment notes (all-public Spark/Iceberg config):
    spark-submit --py-files em_connected_components_spark.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse job.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    """True iff the session has the Iceberg extensions AND the named catalog
    configured — the two things a real deployment sets together."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    cat = spark.conf.get(f"spark.sql.catalog.{catalog}", "") or ""
    return "IcebergSparkSessionExtensions" in ext and bool(cat)


class EdgeCatalog:
    """Reader/writer for the canonical ``(src, dst)`` edge table.

    ``location``: an Iceberg table identifier (``catalog.db.table``) when
    Iceberg is available, else a filesystem path for parquet.
    ``buckets``: bucket count for the src partitioning — co-locates the
    relabel/hook shuffle key so iterative joins start from a useful layout.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        buckets: int = 64,
        catalog: str = "lake",
    ):
        self.spark = spark
        self.location = location
        self.buckets = buckets
        self.use_iceberg = iceberg_available(spark, catalog)

    def write(self, edges: DataFrame, mode: str = "overwrite") -> None:
        df = edges.select("src", "dst").repartition(self.buckets, "src")
        if self.use_iceberg:
            writer = df.writeTo(self.location)
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            df.write.mode(mode).parquet(self.location)

    def append(self, edges: DataFrame) -> None:
        self.write(edges, mode="append")

    def read(self) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self.location)
        return self.spark.read.schema("src long, dst long").parquet(
            self.location
        )

    # -- bucketed layout: the exchange-free entry point -------------------
    def write_bucketed(
        self, edges: DataFrame, table: str, mode: str = "overwrite"
    ) -> None:
        """Persist the edge table in a src-bucketed LAYOUT-AWARE table.

        Unlike ``write`` (plain parquet — the partitioning is lost on read),
        a bucketed table records HashPartitioning(src, buckets) in the
        catalog, so every downstream groupBy/join on ``src`` starts WITHOUT
        an Exchange: at 100 TB this is what lets PageRank skip its initial
        ``repartition(sp, "src")`` of the m-row table (plans/pagerank.py) —
        the iterative joins reuse the on-disk layout across the entire run.

        Iceberg deployments get the same via a ``bucket(buckets, src)``
        partition transform + storage-partitioned joins; this sandbox's
        parquet fallback uses Spark's native bucketed tables
        (``bucketBy().sortBy().saveAsTable``), which need a table name in
        the session catalog on top of ``location``.

        ``mode="append"`` adds new bucketed files to an existing table with
        the same bucket spec (each append is bucketed independently; the
        layout metadata — and the exchange-free read — survive). This is the
        landing mode for continuous ingest: streaming_edge_ingest's
        foreachBatch sink appends micro-batches here so a live crawl keeps
        the exchange-free CC/PageRank entry without a rewrite.
        """
        df = edges.select("src", "dst")
        if self.use_iceberg:
            from pyspark.sql import functions as F

            if mode == "append":
                # the existing table already carries the bucket(src) spec;
                # partitionedBy is a create-time clause
                df.writeTo(self.location).append()
            else:
                (
                    df.writeTo(self.location)
                    .partitionedBy(F.bucket(self.buckets, F.col("src")))
                    .createOrReplace()
                )
            return
        (
            # pre-shuffle to one bucket per task -> exactly one file per
            # bucket (bucketBy and repartition share the Murmur3 hash)
            df.repartition(self.buckets, "src")
            .write.mode(mode)
            .format("parquet")
            .bucketBy(self.buckets, "src")
            .sortBy("src", "dst")
            .option("path", self.location)
            .saveAsTable(table)
        )

    def read_bucketed(self, table: str) -> DataFrame:
        """Read the bucketed table WITH its layout metadata (spark.table,
        not spark.read.parquet — a path read would discard the bucketing)."""
        if self.use_iceberg:
            return self.spark.read.table(self.location)
        return self.spark.table(table)
