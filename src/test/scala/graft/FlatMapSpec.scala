package graft

import org.apache.spark.sql.functions._

/** F4 fixture: FlatMap per-key shredding, ArrayWithOffsets dedup,
  * SlidingWindowMap dedup (reference: dwio/nimble/velox/tests/
  * VeloxReaderTest.cpp:1463,2027,2097; SURVEY.md §1.3). */
class FlatMapSpec extends SparkTestBase {

  private def fixture = spark.sql("""
    SELECT id AS uid,
      CASE WHEN id % 13 = 0 THEN NULL ELSE
        map_filter(map(
          concat('f', id % 7), cast(id AS float),
          concat('g', id % 5), cast(id * 2 AS float),
          'common', cast(id % 3 AS float)), (k, v) -> id % 4 != 0 OR k = 'common')
      END AS features,
      CASE WHEN id % 11 = 0 THEN NULL
           ELSE array(id % 3, (id % 3) + 1) END AS id_list,  -- ~70% consecutive repeats
      map(cast(id % 2 AS int), cast(id % 2 AS double)) AS window_feats
    FROM range(5000)
  """)

  test("flatmap write + merged map read equals plain map round-trip") {
    val df = fixture
    val dir = tmpDir("fm")
    df.write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features")
      .option("dictionaryArrayColumns", "id_list")
      .option("deduplicatedMapColumns", "window_feats")
      .save(dir)
    val back = spark.read.format("nimble").load(dir)
    val a = df.select("uid", "features", "id_list", "window_feats").collect()
      .map(r => (r.getLong(0), Option(r.getMap[String, Float](1)).map(_.toMap),
        Option(r.getSeq[Long](2)).map(_.toList), r.getMap[Int, Double](3).toMap)).sortBy(_._1)
    val b = back.select("uid", "features", "id_list", "window_feats").collect()
      .map(r => (r.getLong(0), Option(r.getMap[String, Float](1)).map(_.toMap),
        Option(r.getSeq[Long](2)).map(_.toList), r.getMap[Int, Double](3).toMap)).sortBy(_._1)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    // per-key shredding visible in the footer
    val files = graft.spark.NimbleSource.listFiles(dir)
    val keys = graft.spark.NimbleSource.footerOf(files.head).streamKeys
    assert(keys.exists(_.startsWith("features#in:")), keys.mkString(","))
    assert(keys.contains("id_list#idx") && keys.contains("window_feats#idx"), keys.mkString(","))
    assert(!keys.contains("features#len"))
  }

  test("flatmap feature projection reads only requested key streams") {
    val df = fixture
    val dir = tmpDir("fmproj")
    df.write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features").save(dir)
    val proj = spark.read.format("nimble")
      .option("flatMapStruct.features", "common,f1,doesnotexist")
      .load(dir)
    assert(proj.schema("features").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val rows = proj.selectExpr("uid", "features.common", "features.f1", "features.doesnotexist")
      .collect()
    val expected = fixture.select(col("uid"),
      col("features")(lit("common")), col("features")(lit("f1")), lit(null)).collect()
    val fmt = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).sortBy(_._1).toSeq
    assert(fmt(rows) == fmt(expected))
  }

  test("v15 escape: '#'-bearing flatmap keys round-trip as map and as feature projection") {
    // keys exercising every escape shape: plain, one '#', a doubled '##',
    // and a '#nanos'-colliding name (the pre-v15 latent writer hazard when
    // two keys' stream names met)
    val df = spark.sql("""
      SELECT id AS uid, map(
        'plain', cast(id AS double),
        concat('a#', id % 3), cast(id * 2 AS double),
        'x##y', cast(id * 3 AS double),
        'x#nanos', cast(id * 5 AS double)) AS m
      FROM range(4000)
    """)
    val dir = tmpDir("fm-hash")
    df.write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "m").save(dir)
    // stream names store the escaped form; single '#' only before tags;
    // the "##"-bearing key table forces the v15 stamp
    val footer = graft.spark.NimbleSource.footerOf(
      graft.spark.NimbleSource.listFiles(dir).head)
    assert(footer.version == 15, s"expected v15 stamp, got ${footer.version}")
    val keys = footer.streamKeys
    assert(keys.contains("m#in:a##0") && keys.contains("m#fm:x####y") &&
      keys.contains("m#in:x##nanos"), keys.mkString(","))
    // merged map read: logical (unescaped) keys come back
    val a = df.collect().map(r => r.getLong(0) -> r.getMap[String, Double](1).toMap).sortBy(_._1)
    val b = spark.read.format("nimble").load(dir).collect()
      .map(r => r.getLong(0) -> r.getMap[String, Double](1).toMap).sortBy(_._1)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    // feature projection by LOGICAL key name
    val proj = spark.read.format("nimble")
      .option("flatMapStruct.m", "a#1,x##y,x#nanos,missing#key")
      .load(dir)
      .selectExpr("uid", "m.`a#1`", "m.`x##y`", "m.`x#nanos`", "m.`missing#key`")
      .collect()
    val expected = df.select(col("uid"), col("m")(lit("a#1")), col("m")(lit("x##y")),
      col("m")(lit("x#nanos")), lit(null)).collect()
    val fmt = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).sortBy(_._1).toSeq
    assert(fmt(proj) == fmt(expected))
  }

  test("sibling raw/escaped key collision: pruning uses the file's own form (r20 review)") {
    // logical keys "x#y" (stored m#fm:x##y) and "x##y" (stored m#fm:x####y):
    // the RAW candidate form of "x##y" equals the ESCAPED stream of "x#y",
    // so un-gated candidate lookup would let x#y's stats prune a filter on
    // x##y. Values are disjoint (x#y in [0,100), x##y in [1000,1100)) — a
    // threshold killing all of x#y's range but none of x##y's must still
    // return every row.
    val dir = tmpDir("fm-collide")
    spark.sql("""
      SELECT id AS uid, map(
        'x#y',  CAST(id % 100 AS DOUBLE),
        'x##y', CAST(1000 + id % 100 AS DOUBLE)) AS m
      FROM range(8000)
    """).repartitionByRange(2, org.apache.spark.sql.functions.col("uid"))
      .sortWithinPartitions("uid")
      .write.format("nimble").option("flatMapColumns", "m")
      .option("rowsPerChunk", "1024").mode("overwrite").save(dir)
    val proj = spark.read.format("nimble")
      .option("flatMapStruct.m", "x##y").load(dir)
    val n = proj.filter(col("m.`x##y`") >= 500.0).count()
    assert(n == 8000L, s"wrong-key stats pruned live rows: $n of 8000")
    // and the inverse: a filter below BOTH ranges still prunes everything
    assert(proj.filter(col("m.`x##y`") < 0.0).count() == 0L)
  }

  test("dedup layouts reduce size on repetitive data") {
    // identical array every row; double elements so the win is structural
    // (string element streams now shared-dict-collapse in the plain layout
    // too, which erased the margin this spec asserts)
    val rep = spark.sql("""
      SELECT id, array(1.5D, 2.5D, 3.5D, 4.5D, 5.5D, 6.5D, 7.5D, 8.5D) AS arr
      FROM range(20000)""")
    val d1 = tmpDir("dd1"); val d2 = tmpDir("dd2")
    rep.coalesce(1).write.format("nimble").mode("overwrite").save(d1)
    rep.coalesce(1).write.format("nimble").mode("overwrite")
      .option("dictionaryArrayColumns", "arr").save(d2)
    def size(d: String) = graft.spark.NimbleSource.listFiles(d).map(new java.io.File(_).length()).sum
    assert(size(d2) < size(d1), s"dedup ${size(d2)} should beat plain ${size(d1)}")
    assert(spark.read.format("nimble").load(d2).selectExpr("sum(size(arr))").collect()(0).getLong(0) == 160000L)
  }
}
