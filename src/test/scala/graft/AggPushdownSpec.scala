package graft

import org.apache.spark.sql.functions._

/** Footer-stats aggregate pushdown (SURVEY.md §2.3 aggregation hook, §2.6):
  * results must equal full-scan answers; the plan must show the stats scan. */
class AggPushdownSpec extends SparkTestBase {

  test("count/min/max answered from footer stats match full computation") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("aggpd")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val agg = nb.agg(
      count(lit(1)).as("cnt"),
      min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"),
      min("l_quantity").as("min_q"),
      min("l_returnflag").as("min_rf"), max("l_returnflag").as("max_rf"))
    val expected = pq.agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey"),
      min("l_quantity"), min("l_returnflag"), max("l_returnflag")).collect()(0)
    val got = agg.collect()(0)
    assert(got.toSeq == expected.toSeq, s"$got vs $expected")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"aggregate not pushed (expected LocalTableScan from the stats LocalScan):\n$plan")
  }

  test("max(double) refused when NaN possible; all-null column answered null") {
    import spark.implicits._
    val df = Seq((1L, Double.NaN, null: java.lang.Long), (2L, 1.5, null: java.lang.Long)).toDF("id", "d", "n")
    val dir = tmpDir("aggnan")
    df.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // max(d) must be NaN (Spark sorts NaN greatest) — falls back to scan
    val r = nb.agg(max("d"), min("d"), max("n")).collect()(0)
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1) == 1.5)
    assert(r.isNullAt(2))
  }

  test("filtered aggregate does NOT use stats (falls back)") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("aggfil")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val got = nb.filter(col("l_quantity") > 45).agg(count(lit(1))).collect()(0).getLong(0)
    val exp = pq.filter(col("l_quantity") > 45).count()
    assert(got == exp)
  }
}
