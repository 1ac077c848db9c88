package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** `nimble_lookup` table function: batch point-lookup with results in
  * request order (SelectiveNimbleIndexReader.h:45-70 semantics), composite
  * prefix probes via struct literals, probe-type coercion to the stored key
  * type, and the extensions registration path. */
class LookupTvfSpec extends SparkTestBase {

  private def keyedTable(name: String, indexCols: String): String = {
    import spark.implicits._
    val dir = tmpDir(name)
    Seq.tabulate(5000)(i => (i.toLong, (i % 37).toLong, if (i % 3 == 0) "A" else "B",
        i * 1.5, s"payload_$i"))
      .toDF("k", "grp", "tag", "score", "payload")
      .repartition(2).write.format("nimble")
      .option("indexColumns", indexCols).option("rowsPerChunk", "512")
      .mode("overwrite").save(dir)
    dir
  }

  test("batch probes return rows in request order, repeats and misses included") {
    val dir = keyedTable("tvf_single", "k")
    graft.spark.NimbleLookupTvf.install(spark)
    // 4999 exists, 123456 misses, 17 asked twice (requests 0 and 3)
    val out = spark.sql(
      s"SELECT * FROM nimble_lookup('$dir', 'k', 17, 4999, 123456, 17, 0)").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 3, 4),
      s"request order violated: ${out.map(_.getInt(0)).mkString(",")}")
    val byReq = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byReq == Map(0 -> 17L, 1 -> 4999L, 3 -> 17L, 4 -> 0L))
    // full row content survives the physical->logical mapping
    val r17 = out.find(_.getInt(0) == 0).get
    assert(r17.getLong(2) == 17L && r17.getString(3) == "B" &&
      r17.getDouble(4) == 25.5 && r17.getString(5) == "payload_17")
  }

  test("composite index: struct probes, prefix equality, coercion from INT literals") {
    val dir = keyedTable("tvf_comp", "tag+grp")
    graft.spark.NimbleLookupTvf.install(spark)
    // full-key struct probe; grp written as BIGINT but probed with an INT
    // literal — the TVF must coerce before key encoding or silently miss
    val full = spark.sql(
      s"SELECT * FROM nimble_lookup('$dir', 'tag+grp', struct('A', 9), struct('B', 0))")
    val rows = full.collect()
    assert(rows.nonEmpty)
    val expect = spark.read.format("nimble").load(dir)
      .filter((col("tag") === "A" && col("grp") === 9) ||
        (col("tag") === "B" && col("grp") === 0))
      .count()
    assert(rows.length.toLong == expect)
    assert(rows.filter(_.getInt(0) == 0).forall(r => r.getString(3) == "A" && r.getLong(2) == 9L))
    assert(rows.filter(_.getInt(0) == 1).forall(r => r.getString(3) == "B" && r.getLong(2) == 0L))
    // prefix probe: leading component only
    val prefix = spark.sql(
      s"SELECT count(1) AS c, count(DISTINCT grp) AS g FROM nimble_lookup('$dir', 'tag+grp', struct('A'))")
      .collect()(0)
    assert(prefix.getLong(0) == 1667L && prefix.getLong(1) == 37L)
  }

  test("range probes: named_struct(lo,hi) bounds, single and composite (IndexLookup.h:55-65)") {
    val dir = keyedTable("tvf_range", "k")
    graft.spark.NimbleLookupTvf.install(spark)
    // inclusive bounds; mixed with a point probe; request order holds
    val out = spark.sql(
      s"""SELECT * FROM nimble_lookup('$dir', 'k',
          named_struct('lo', 100, 'hi', 104), 17, named_struct('lo', 4996, 'hi', 5100))""")
      .collect()
    val byReq = out.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(byReq(0) == (100L to 104L), s"range 0 got ${byReq(0)}")
    assert(byReq(1) == Seq(17L))
    assert(byReq(2) == (4996L to 4999L), s"tail range clips at the data, got ${byReq(2)}")
    assert(out.map(_.getInt(0)).toSeq == out.map(_.getInt(0)).toSeq.sorted,
      "request order violated across range probes")

    // composite: equality prefix + range on the NEXT component
    val cdir = keyedTable("tvf_range_comp", "tag+grp")
    val comp = spark.sql(
      s"""SELECT count(1) FROM nimble_lookup('$cdir', 'tag+grp',
          struct('A', named_struct('lo', 5, 'hi', 7)))""").collect()(0).getLong(0)
    val expect = spark.read.format("nimble").load(cdir)
      .filter(col("tag") === "A" && col("grp").between(5, 7)).count()
    assert(comp == expect && comp > 0, s"composite range: got $comp, want $expect")

    // misplaced range component and null bounds reject loudly
    intercept[Exception](spark.sql(
      s"""SELECT * FROM nimble_lookup('$cdir', 'tag+grp',
          struct(named_struct('lo', 'A', 'hi', 'B'), 5))""").collect())
    intercept[Exception](spark.sql(
      s"SELECT * FROM nimble_lookup('$dir', 'k', named_struct('lo', CAST(NULL AS INT), 'hi', 7))")
      .collect())
  }

  test("rejects bad usage loudly") {
    val dir = keyedTable("tvf_bad", "k")
    graft.spark.NimbleLookupTvf.install(spark)
    for (q <- Seq(
        s"SELECT * FROM nimble_lookup('$dir', 'k')", // no probes
        s"SELECT * FROM nimble_lookup('$dir', 'nope', 1)", // unknown key col
        s"SELECT * FROM nimble_lookup('$dir', 'k', 'strval')", // type mismatch
        s"SELECT * FROM nimble_lookup('/no/such/dir', 'k', 1)"))
      intercept[Exception](spark.sql(q).collect())
    // r17: a float/double key column must reject LOUDLY — Lookup's stored
    // hash/verify paths are long/string-backed, so a double-key probe would
    // silently return empty on a legitimate probe (wrong answer, not error)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM nimble_lookup('$dir', 'score', 1.5)").collect())
    assert(e.getMessage.contains("hash-stable"), e.getMessage)
  }

  test("the extensions path registers the TVF cluster-wide") {
    val dir = keyedTable("tvf_ext", "k")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new graft.spark.GraftExtensions())
      .getOrCreate()
    try {
      val out = s2.sql(s"SELECT k, payload FROM nimble_lookup('$dir', 'k', 42)").collect()
      assert(out.toSeq == Seq(Row(42L, "payload_42")))
    } finally {
      // getOrCreate reuses the shared SparkContext: only clear the session —
      // stopping s2 would stop the context under every other suite
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(SparkTestBase.session)
      org.apache.spark.sql.SparkSession.setActiveSession(SparkTestBase.session)
    }
  }
}
