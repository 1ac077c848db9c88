package graft

import org.apache.spark.sql.functions._

/** v10 per-column NDV sketches: 256-register HLLs in the footer, merged
  * across files by register max, surfaced as the CBO's distinctCount. */
class NdvSpec extends SparkTestBase {

  private def within(est: Long, truth: Long, tol: Double): Boolean =
    math.abs(est - truth) <= math.max(2.0, truth * tol)

  test("footer sketches estimate known cardinalities within HLL error") {
    val df = spark.range(40000).select(
      col("id"),                                   // 40000 distinct
      (col("id") % 100).as("low"),                 // 100 distinct
      md5(col("id").cast("string")).as("s"),       // 40000 distinct strings
      (col("id") % 7).cast("double").as("d"),      // 7 distinct doubles
      (col("id") % 2 === 0).as("b"))               // bool: not sketched
    val dir = tmpDir("ndv")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val footer = graft.spark.NimbleSource.footerOf(
      graft.spark.NimbleSource.listFiles(dir).head)
    assert(footer.version == 14) // minimum-required stamp ('#'-free keys)
    val sk = footer.ndvSketches
    def est(c: String): Long = graft.format.Hll.estimate(sk(c))
    assert(within(est("id"), 40000, 0.15), s"id ndv=${est("id")}")
    assert(within(est("low"), 100, 0.15), s"low ndv=${est("low")}")
    assert(within(est("s"), 40000, 0.15), s"s ndv=${est("s")}")
    assert(within(est("d"), 7, 0.15), s"d ndv=${est("d")}")
    assert(!sk.contains("b"), "bools must not sketch")
  }

  test("estimateStatistics merges sketches across files: union, not sum") {
    // two files over OVERLAPPING key ranges: per-file ndv ~30000 each, true
    // union 40000 — a sum-of-files estimate (60000) must not survive
    val dir = tmpDir("ndv-merge")
    spark.range(0, 30000).select(col("id"), (col("id") % 50).as("g"))
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    spark.range(10000, 40000).select(col("id"), (col("id") % 50).as("g"))
      .coalesce(1).write.format("nimble").mode("append").save(dir)

    val schema = spark.read.format("nimble").load(dir).schema
    val scan = new graft.spark.NimbleScan(dir, schema, schema, Array.empty)
    val cs = scan.estimateStatistics().columnStats()
    def dc(c: String): Long = cs.entrySet().stream()
      .filter(_.getKey.toString == c).findFirst().get().getValue.distinctCount().getAsLong
    assert(within(dc("id"), 40000, 0.15), s"merged id ndv=${dc("id")}")
    assert(within(dc("g"), 50, 0.15), s"merged g ndv=${dc("g")}")
    // ... and never exceeds the non-null row count (clamped)
    assert(dc("id") <= 40000 * 2)
  }

  test("ndvSketches=false opts a write out; CBO distinctCount stays absent-not-wrong") {
    val df = spark.range(5000).select(col("id"), (col("id") % 9).as("g"))
    val dir = tmpDir("ndv-off")
    df.coalesce(1).write.format("nimble")
      .option("ndvSketches", "false").mode("overwrite").save(dir)
    val footer = graft.spark.NimbleSource.footerOf(
      graft.spark.NimbleSource.listFiles(dir).head)
    assert(footer.version == 14 && footer.ndvSketches.isEmpty)
    val schema = spark.read.format("nimble").load(dir).schema
    val cs = new graft.spark.NimbleScan(dir, schema, schema, Array.empty)
      .estimateStatistics().columnStats()
    val idStats = cs.entrySet().stream()
      .filter(_.getKey.toString == "id").findFirst().get().getValue
    assert(!idStats.distinctCount().isPresent)
    assert(idStats.nullCount().getAsLong == 0L) // other stats unaffected
  }

  test("nanos-split timestamps carry no sketch (micros would undercount)") {
    val df = spark.sql(
      "SELECT id, 1705312200123456789 + id * 1001 AS ts FROM range(5000)")
    val dir = tmpDir("ndv-nanos")
    df.coalesce(1).write.format("nimble")
      .option("timestampNanosColumns", "ts").mode("overwrite").save(dir)
    val footer = graft.spark.NimbleSource.footerOf(
      graft.spark.NimbleSource.listFiles(dir).head)
    assert(footer.ndvSketches.contains("id"))
    assert(!footer.ndvSketches.contains("ts"), "nanos-split column must not sketch")
  }
}
