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

  test("filtered aggregate with mixed stripes falls back and stays correct") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("aggfil")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val agg = nb.filter(col("l_quantity") > 45).agg(count(lit(1)))
    val got = agg.collect()(0).getLong(0)
    val exp = pq.filter(col("l_quantity") > 45).count()
    assert(got == exp)
    // l_quantity is uniform within stripes: no stripe is all-match, so the
    // ValueHook-lite path must refuse and plan a real scan
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"mixed stripes must not push:\n$plan")
  }

  test("filtered count/min/max answered from stats when stripes align (ValueHook-lite)") {
    // four files with disjoint id ranges [0,10k) ... [30k,40k): a boundary-
    // aligned filter classifies every stripe all-match or none-match and the
    // aggregate stays O(metadata)
    val base = spark.range(40000).select(
      col("id"),
      when(col("id") % 10 =!= 0, col("id") % 997).as("v"),
      when(col("id") < 20000, lit("A")).otherwise(lit("B")).as("letter"))
    val dir = tmpDir("aggfilpd")
    for (b <- 0 until 4)
      base.filter(col("id") >= b * 10000L && col("id") < (b + 1) * 10000L)
        .coalesce(1).write.format("nimble")
        .mode(if (b == 0) "overwrite" else "append").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val agg = nb.filter(col("id") >= 20000L)
      .agg(count(lit(1)).as("cnt"), count("v").as("cnt_v"),
        min("v").as("min_v"), max("id").as("max_id"), min("letter").as("min_l"))
    val expected = base.filter(col("id") >= 20000L)
      .agg(count(lit(1)), count("v"), min("v"), max("id"), min("letter")).collect()(0)
    assert(agg.collect()(0).toSeq == expected.toSeq)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"aligned filtered aggregate not answered from stats:\n$plan")

    // equality on a per-file-constant string column pushes too
    val aggEq = nb.filter(col("letter") === "B").agg(count(lit(1)), max("id"))
    val expEq = base.filter(col("letter") === "B").agg(count(lit(1)), max("id")).collect()(0)
    assert(aggEq.collect()(0).toSeq == expEq.toSeq)
    assert(aggEq.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // an unaligned filter has a mixed stripe: falls back, still correct
    val aggMix = nb.filter(col("id") >= 15000L).agg(count(lit(1)), min("v"))
    val expMix = base.filter(col("id") >= 15000L).agg(count(lit(1)), min("v")).collect()(0)
    assert(aggMix.collect()(0).toSeq == expMix.toSeq)
    assert(!aggMix.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // none-match everywhere: zero count, null min, still O(metadata)
    val aggNone = nb.filter(col("id") < 0L).agg(count(lit(1)), min("v"))
    val r = aggNone.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    assert(aggNone.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
