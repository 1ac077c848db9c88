package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused timing for q16_window over the nimble orders table. */
object ProfileQ16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("q16_window")
    val nbOrders = graft.Tables.nimble(spark, sfDir, "orders")
    println("partitions=" + nbOrders.rdd.getNumPartitions)
    q(spark, sfDir).limit(1).collect() // warm + convert

    import org.apache.spark.sql.functions._
    def t(label: String)(body: => Unit): Unit = {
      body // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${times.min}%.3f min / ${times.sorted.apply(2)}%.3f med")
    }
    val pqOrders = spark.read.parquet(s"$sfDir/orders.parquet")
    t("orders scan agg (nimble)")(nbOrders.agg(count(lit(1)), sum("o_totalprice")).collect())
    t("orders scan agg (parquet)")(pqOrders.agg(count(lit(1)), sum("o_totalprice")).collect())
    t("q16 over nimble")(q(spark, sfDir).write.format("noop").mode("overwrite").save())
    pqOrders.createOrReplaceTempView("orders_pq")
    val sqlQ16 =
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders_pq) t
         WHERE rn <= 3"""
    t("q16 over parquet")(spark.sql(sqlQ16).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
