package graft.tools

import org.apache.spark.sql.SparkSession

/** Byte-identity A/B harness for codec/write-path changes: writes a fixed
  * set of sf0.01 tables at a fixed partitioning to the given directory.
  * Usage: run once at the old code -> hash, once at the new -> hash, diff:
  *   java ... graft.tools.ByteAB /tmp/ab-new
  *   find /tmp/ab-new -name '*.gft' | sort | xargs md5sum | md5sum
  * Writes are deterministic at fixed partitioning, so equal hashes prove a
  * change (e.g. the r19 locked-fast-path selection) left the standard write
  * path byte-identical — the guarantee encoded_size_ratio's byte-for-byte
  * reproduction depends on. */
object ByteAB {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (t <- Seq("lineitem", "orders", "events", "documents")) {
      val df = spark.read.parquet(s"$sf/$t.parquet")
      df.repartition(4).write.format("nimble").mode("overwrite").save(s"$out/$t")
    }
    spark.stop()
  }
}
