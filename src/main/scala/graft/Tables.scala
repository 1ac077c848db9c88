package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver testdata, routed through the nimble connector:
  * parquet tables are converted once per (sfDir, table) into tablet files in
  * a temp cache, then every query reads `format("nimble")` — so the whole
  * query inventory exercises the format end-to-end (write + scan + pushdown).
  */
object Tables {
  private val cacheRoot = sys.props.getOrElse("graft.cache",
    s"${System.getProperty("java.io.tmpdir")}/graft-nimble-v${graft.format.Tablet.Version}s")

  private val lock = new Object

  /** Parquet view of a driver table. events.ts is normalized to epoch-nanos
    * long regardless of how the driver generated it — older testdata wrote
    * parquet TIMESTAMP(NANOS) (read as long via nanosAsLong), current
    * testdata writes timestamp[us] (read as TIMESTAMP_NTZ). The long-ns view
    * is what every events query computes on and matches the DuckDB oracle's
    * epoch_ns(ts); the UTC session timeZone (set by all entry points) makes
    * the NTZ→timestamp cast wall-clock-exact. */
  def parquet(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType | org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df
    }
  }

  /** Nimble view of a driver table (converted + cached on first use). */
  def nimble(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    graft.spark.DecimalNarrowing.install(spark)
    val dir = nimbleDir(spark, sfDir, table)
    spark.read.format("nimble").load(dir)
  }

  /** Round-trip an arbitrary DataFrame through the nimble format (used by
    * queries that exercise nested/map/flatmap writers in the checked path). */
  def roundTrip(spark: SparkSession, sfDir: String, key: String, df: DataFrame,
      writerOptions: Map[String, String] = Map.empty): DataFrame = {
    graft.spark.DecimalNarrowing.install(spark)
    spark.read.format("nimble").load(roundTripDir(spark, sfDir, key, df, writerOptions))
  }

  /** [[roundTrip]], returning the tablet directory (for the Lookup probe API,
    * which addresses files rather than DataFrames). */
  def roundTripDir(spark: SparkSession, sfDir: String, key: String, df: DataFrame,
      writerOptions: Map[String, String] = Map.empty): String = {
    val sfKey = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"$cacheRoot/$sfKey/rt_$key"
    lock.synchronized {
      var w = df.write.format("nimble").mode("overwrite")
      writerOptions.foreach { case (k, v) => w = w.option(k, v) }
      w.save(dir)
    }
    dir
  }

  /** Register the [[graft.spark.NimbleCatalog]] on this session and make
    * sure the co-bucketed lineitem/orders pair exists in its warehouse —
    * the storage-partitioned-join fixtures (q31). Both tables bucket(16)
    * on the join key, so the join plans with zero shuffles when
    * spark.sql.sources.v2.bucketing.enabled is on (set here; inert for
    * non-bucketed tables). */
  /** Returns the catalog name to query through. The name embeds the sf key
    * because Spark caches catalog INSTANCES by name after first use — a
    * shared name would pin the first sfDir's warehouse forever and serve
    * fixtures from the wrong scale factor to every later sfDir. */
  def spjTables(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_").replaceAll("[^A-Za-z0-9_]", "_")
    val cat = s"gsp_$key"
    val wh = s"$cacheRoot/$key/warehouse"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.NimbleCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    lock.synchronized {
      val ready = Seq("lineitem_b", "orders_b").forall(t =>
        new java.io.File(s"$wh/$t").isDirectory &&
          new java.io.File(s"$wh/$t").listFiles().exists(_.getName.endsWith(".gft")))
      if (!ready) {
        import org.apache.spark.sql.functions.{bucket, col}
        new java.io.File(wh).mkdirs()
        spark.sql(s"DROP TABLE IF EXISTS $cat.lineitem_b")
        spark.sql(s"DROP TABLE IF EXISTS $cat.orders_b")
        parquet(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .writeTo(s"$cat.lineitem_b").partitionedBy(bucket(16, col("l_orderkey"))).create()
        parquet(spark, sfDir, "orders")
          .select("o_orderkey", "o_totalprice")
          .writeTo(s"$cat.orders_b").partitionedBy(bucket(16, col("o_orderkey"))).create()
      }
    }
    cat
  }

  def nimbleDir(spark: SparkSession, sfDir: String, table: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"$cacheRoot/$key/$table"
    lock.synchronized {
      val d = new java.io.File(dir)
      val ready = d.isDirectory && d.listFiles().exists(_.getName.endsWith(".gft"))
      if (!ready) {
        val sort = table match {
          case "orders" => Some("o_custkey")
          case "lineitem" => Some("l_orderkey")
          case _ => None
        }
        var w = parquet(spark, sfDir, table)
        // declared sort order -> ClusterIndex-lite stripe/chunk key ranges
        // (reference: dwio/nimble/index/ClusterIndex.h:76 — data must arrive
        // sorted; the writer validates, Spark produces the order here).
        // Range partitioning keeps per-file key ranges disjoint (pruning
        // still sees a global sort) while scan parallelism = #files — the
        // layout a 1000-executor sorted-table write produces; a single
        // repartition(1) file would serialize every downstream scan.
        val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
        sort.foreach(c => w = w.repartitionByRange(shuffleParts,
          org.apache.spark.sql.functions.col(c)).sortWithinPartitions(c))
        val writer = w.write.format("nimble").mode("overwrite")
        sort.foreach(c => writer.option("sortColumns", c))
        // events.ts is epoch-nanos (nanosAsLong): store as the
        // TimestampMicroNano split (micros stream + sub-µs remainder), so
        // every events query (q20-q22) verifies the layout against its oracle
        if (table == "events") writer.option("timestampNanosColumns", "ts")
        writer.save(dir)
      }
    }
    dir
  }
}
