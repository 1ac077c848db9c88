package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver testdata, routed through the nimble connector:
  * parquet tables are converted once per (sfDir, table) into tablet files in
  * a temp cache, then every query reads `format("nimble")` — so the whole
  * query inventory exercises the format end-to-end (write + scan + pushdown).
  */
object Tables {
  private val cacheRoot = sys.props.getOrElse("graft.cache",
    s"${System.getProperty("java.io.tmpdir")}/graft-nimble-v${graft.format.Tablet.Version}r")

  private val lock = new Object

  /** Parquet view of a driver table. */
  def parquet(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Nimble view of a driver table (converted + cached on first use). */
  def nimble(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val dir = nimbleDir(spark, sfDir, table)
    spark.read.format("nimble").load(dir)
  }

  /** Round-trip an arbitrary DataFrame through the nimble format (used by
    * queries that exercise nested/map/flatmap writers in the checked path). */
  def roundTrip(spark: SparkSession, sfDir: String, key: String, df: DataFrame,
      writerOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("nimble").load(roundTripDir(spark, sfDir, key, df, writerOptions))

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
