package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Compaction, Merge}
import graft.spark.NimbleSource

/** MERGE/upsert: metadata-only affected-file discovery via footer key
  * bounds, SQL MERGE semantics (matched rows take the source row wholesale
  * — nulls included; unmatched source rows insert; cardinality violations
  * fail), and layout survival through the rewrite. */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def target(n: Long = 1000L): DataFrame =
    spark.range(n).selectExpr("id AS k", "CAST(id * 10 AS LONG) AS v", "'base' AS tag")

  private def sortedDir(name: String, df: DataFrame): String = {
    val dir = tmpDir(name)
    df.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.format("nimble").mode("overwrite").option("sortColumns", "k").save(dir)
    dir
  }

  private def readBack(dir: String) = spark.read.format("nimble").load(dir)

  private def assertSameData(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("narrow delta on a sorted table touches only boundary files; updates + inserts land") {
    val dir = sortedDir("mrg-sorted", target())
    val before = NimbleSource.listFiles(dir).toSet
    val delta = Seq((5L, 999L, "upd"), (7L, 888L, "upd"), (5000L, 1L, "new"))
      .toDF("k", "v", "tag")
    val rep = Merge.upsert(spark, dir, delta, Seq("k"))
    assert(rep.rowsMatched == 2L && rep.rowsInserted == 1L, rep.toString)
    assert(rep.filesUntouched >= 6, s"keys 5,7 live in the head file(s): $rep")
    assert(NimbleSource.listFiles(dir).toSet.intersect(before).size == rep.filesUntouched)
    val expected = target().filter(!col("k").isin(5L, 7L))
      .unionByName(delta.filter(col("tag") === "upd"))
      .unionByName(delta.filter(col("tag") === "new"))
    assertSameData(readBack(dir), expected)
    assert(Compaction.recoverLayout(dir).get("sortColumns").contains("k"))
  }

  test("matched rows take the source row wholesale — a null update sticks") {
    val dir = sortedDir("mrg-null", target(100L))
    val delta = Seq((10L, Option.empty[Long], "nulled")).toDF("k", "v", "tag")
    val rep = Merge.upsert(spark, dir, delta, Seq("k"))
    assert(rep.rowsMatched == 1L && rep.rowsInserted == 0L, rep.toString)
    val row = readBack(dir).filter(col("k") === 10L).head()
    assert(row.isNullAt(row.fieldIndex("v")) && row.getString(row.fieldIndex("tag")) == "nulled")
  }

  test("pure insert beyond every file's bounds appends without touching a file") {
    val dir = sortedDir("mrg-insert", target(100L))
    val before = NimbleSource.listFiles(dir).toSet
    val delta = Seq((100000L, 1L, "new"), (100001L, 2L, "new")).toDF("k", "v", "tag")
    val rep = Merge.upsert(spark, dir, delta, Seq("k"))
    assert(rep.filesRewritten == 0 && rep.rowsInserted == 2L, rep.toString)
    assert(before.subsetOf(NimbleSource.listFiles(dir).toSet), "originals must survive")
    assertSameData(readBack(dir), target(100L).unionByName(delta))
    // the appended delta file still honors the per-file sort declaration
    assert(Compaction.recoverLayout(dir).get("sortColumns").contains("k"))
  }

  test("unsorted table: bounds cover everything, result still exact") {
    val dir = tmpDir("mrg-plain")
    target(500L).repartition(4).write.format("nimble").mode("overwrite").save(dir)
    val delta = Seq((42L, -1L, "upd"), (9999L, -2L, "new")).toDF("k", "v", "tag")
    val rep = Merge.upsert(spark, dir, delta, Seq("k"))
    assert(rep.rowsMatched == 1L && rep.rowsInserted == 1L, rep.toString)
    assertSameData(readBack(dir),
      target(500L).filter(col("k") =!= 42L).unionByName(delta))
  }

  test("SQL MERGE cardinality: duplicate and null source keys are rejected") {
    val dir = sortedDir("mrg-card", target(50L))
    val dup = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "v", "tag")
    val e1 = intercept[IllegalArgumentException] { Merge.upsert(spark, dir, dup, Seq("k")) }
    assert(e1.getMessage.contains("cardinality"))
    val nul = Seq((Option.empty[Long], 1L, "a")).toDF("k", "v", "tag")
    val e2 = intercept[IllegalArgumentException] { Merge.upsert(spark, dir, nul, Seq("k")) }
    assert(e2.getMessage.contains("null"))
  }

  test("streamingUpsert applies CDC batches with last-write-wins per key") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = sortedDir("mrg-stream", target(100L))
    val input = MemoryStream[(Long, Long, String, Long)](spark) // k, v, tag, version
    val q = graft.ops.Merge.streamingUpsert(
      input.toDF().toDF("k", "v", "tag", "ver"),
      dir, Seq("k"), "ver", tmpDir("mrg-stream-ckpt"))
    try {
      // batch 1: two versions of key 5 (later wins) + an insert
      input.addData((5L, 1L, "old", 1L), (5L, 2L, "newer", 2L), (7777L, 9L, "ins", 1L))
      q.processAllAvailable()
      val t1 = readBack(dir).filter(col("k").isin(5L, 7777L))
        .select("k", "v", "tag").as[(Long, Long, String)].collect().toSet
      assert(t1 == Set((5L, 2L, "newer"), (7777L, 9L, "ins")), t1)
      // batch 2: update the inserted row
      input.addData((7777L, 10L, "upd2", 2L))
      q.processAllAvailable()
      val t2 = readBack(dir).filter(col("k") === 7777L)
        .select("v", "tag").as[(Long, String)].head()
      assert(t2 == ((10L, "upd2")))
      assert(readBack(dir).count() == 101L) // 100 base + 1 insert
    } finally q.stop()
  }

  test("composite key: second column refines matching") {
    val dir = tmpDir("mrg-comp")
    Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L))
      .toDF("k", "sub", "v").write.format("nimble").mode("overwrite").save(dir)
    val delta = Seq((1L, "b", 99L), (2L, "b", 77L)).toDF("k", "sub", "v")
    val rep = Merge.upsert(spark, dir, delta, Seq("k", "sub"))
    assert(rep.rowsMatched == 1L && rep.rowsInserted == 1L, rep.toString)
    val out = readBack(dir).as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "a", 10L), (1L, "b", 99L), (2L, "a", 30L), (2L, "b", 77L)))
  }
}
