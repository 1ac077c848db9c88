package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Wide-FLATMAP stream-count stress (r16 verdict #5). The reference's
  * headline scale axis is "thousands of columns or STREAMS", and flatmap
  * per-key value streams are the multiplier (reference:
  * dwio/nimble/velox/FieldWriter.cpp:1415 discovers keys during the write;
  * the cap is writer/VeloxWriterOptions.h:138). WideTableSpec covers 1000
  * scalar columns; this spec drives 2000 DISCOVERED flatmap keys — 4001
  * streams in one column — with late-stripe discovery forcing the
  * absent-backfill path, and pins three contracts:
  *   1. footer/metadata bytes stay sane at 2000 keys (the zstd-wrapped
  *      footer core and sectioned meta pay off exactly here),
  *   2. a feature projection fetches ONLY the requested keys' stream bytes
  *      (Fields.neededKeys resolves to 2 streams per requested key, and the
  *      byte counter proves the scan obeys it),
  *   3. the maxFlatMapKeys cap fires with a clear, actionable error.
  */
class WideFlatMapSpec extends SparkTestBase {

  // 2000 distinct keys: 1000 'a' keys (all discovered early), 999 'b' keys
  // (a NEW one every 10 rows — later stripes keep discovering), + 'common'.
  // Disjoint prefixes keep map() literal keys duplicate-free per row.
  private val NKeys = 2000
  private def fixture = spark.sql("""
    SELECT id AS uid,
      map(
        concat('a', cast(id % 1000 AS string)), cast(id AS double),
        concat('b', cast(cast(id/10 AS long) % 999 AS string)), cast(id*2 AS double),
        'common', cast(id % 7 AS double)) AS features
    FROM range(20000)
  """)

  test("2000 discovered flatmap keys across stripes: round-trip + sane footer") {
    val dir = tmpDir("widefm")
    fixture.coalesce(1).write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features")
      .option("stripeBytes", (128L << 10).toString)
      .option("rowsPerChunk", "4096")
      .save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(files.size == 1)
    val r = new graft.format.Tablet.Reader(files.head)
    try {
      val f = r.footer
      assert(f.rowCount == 20000L)
      // discovery must have spanned stripes (late keys -> backfill chunks)
      assert(f.stripes.length >= 3, s"want multi-stripe discovery, got ${f.stripes.length}")
      // 2000 keys x (in + value) + column nulls anchor + uid
      assert(f.nStreams == 2 * NKeys + 2, s"nStreams=${f.nStreams}")
      // footer/meta bytes: everything that is not stripe payload. Directory
      // entries are deliberately uncompressed (readers range-read exactly
      // the projected streams' metadata — WideTableSpec pins that), so meta
      // scales with streams x stripes; the invariant that survives 100 TB
      // is the PER-ENTRY budget (loc + min/max stats + chunk directory),
      // not an absolute byte count. This fixture's 128 KB stripes are
      // pathological by design — at the default 96 MB stripes the same 4002
      // streams produce 1-2 stripes and meta amortizes to ~1% of the file.
      val fileBytes = new java.io.File(files.head).length()
      val dataBytes = f.stripes.map(_.length).sum
      val metaBytes = fileBytes - dataBytes
      val entries = f.nStreams.toLong * f.stripes.length
      info(s"wide-flatmap file: $fileBytes B total, $dataBytes B data, $metaBytes B meta, " +
        s"${f.stripes.length} stripes, ${f.nStreams} streams, " +
        f"${metaBytes.toDouble / entries}%.1f B/dir-entry")
      assert(metaBytes > 0)
      assert(metaBytes < 64L * entries + (64 << 10),
        s"meta $metaBytes B over $entries dir entries — per-entry budget blown at 2000 keys")
    } finally r.close()
    // full-map round trip through the merged-map reader
    val back = spark.read.format("nimble").load(dir)
      .selectExpr("uid", "features['common'] AS c", "features['a5'] AS a5", "features['b907'] AS b907")
      .orderBy("uid").collect()
    val exp = fixture
      .selectExpr("uid", "features['common'] AS c", "features['a5'] AS a5", "features['b907'] AS b907")
      .orderBy("uid").collect()
    assert(back.length == exp.length)
    back.zip(exp).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
  }

  test("feature projection over 2000 keys fetches only the requested keys' streams") {
    val dir = tmpDir("widefmproj")
    fixture.coalesce(1).write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features")
      .option("stripeBytes", (256L << 10).toString)
      .option("rowsPerChunk", "4096")
      .save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    val footer = graft.spark.NimbleSource.footerOf(files.head)
    // neededKeys contract first: a 3-field flatmap struct resolves to the
    // nulls anchor + exactly (in, value) per requested key — 7 streams of
    // the file's 4002, independent of the 2000-key inventory
    val proj = StructType(Seq("common", "a5", "b907").map(n =>
      org.apache.spark.sql.types.StructField(n, DoubleType)))
    val needed = graft.format.Fields.neededKeys("features", proj,
      footer.streamKeys.toSet).toSet
    assert(needed == Set("features#nulls",
      "features#in:common", "features#fm:common",
      "features#in:a5", "features#fm:a5",
      "features#in:b907", "features#fm:b907"),
      s"neededKeys must be anchor + (in,value) per requested key, got $needed")
    // byte-level: the scan fetches the projection's streams, not the table's
    val ctr = graft.spark.NimbleSource.streamBytesFetched
    val b0 = ctr.get()
    spark.read.format("nimble")
      .option("flatMapStruct.features", "common,a5,b907").load(dir)
      .selectExpr("uid", "features.common", "features.a5", "features.b907")
      .collect()
    val projBytes = ctr.get() - b0
    val b1 = ctr.get()
    spark.read.format("nimble").load(dir).select("uid", "features").collect()
    val fullBytes = ctr.get() - b1
    info(s"wide-flatmap projection bytes: $projBytes of $fullBytes full-map")
    assert(projBytes > 0 && fullBytes > 0)
    assert(projBytes < fullBytes / 50,
      s"3-key projection fetched $projBytes B of a $fullBytes B map — reading unrequested streams")
  }

  test("compaction of a beyond-default-cap flatmap table recovers the cap from the footers") {
    // written with an explicit 3000 cap and 2500 discovered keys: the cap is
    // not stored in the file, but the key inventory is — recoverLayout must
    // derive a sufficient cap or the table cannot survive its own OPTIMIZE
    val dir = tmpDir("widefmcompact")
    spark.sql("""
      SELECT id AS uid,
        map(concat('k', cast(id % 2500 AS string)), cast(id AS double)) AS features
      FROM range(10000)
    """).repartition(3).write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features")
      .option("maxFlatMapKeys", "3000")
      .save(dir)
    val layout = graft.ops.Compaction.recoverLayout(dir)
    assert(layout("flatMapColumns") == "features")
    assert(layout.get("maxFlatMapKeys").exists(_.toInt > 2500),
      s"recovered layout must carry a sufficient key cap: $layout")
    val out = tmpDir("widefmcompact-out")
    val rep = graft.ops.Compaction.compact(spark, dir, out, targetFileBytes = 1L << 31)
    assert(rep.rows == 10000)
    val got = spark.read.format("nimble").load(out)
      .selectExpr("sum(features[concat('k', cast(uid % 2500 AS string))])").head().getDouble(0)
    assert(got == (0L until 10000L).map(_.toDouble).sum, "values must survive the rewrite")
  }

  test("a file whose rows held no flatmap keys is union-compatible; a plain-map file conflicts") {
    // partition 1 has real keys, partition 2 is ALL-NULL maps — its file has
    // no '#in:' streams at all, which must read as layout-compatible
    val dir = tmpDir("widefmnull")
    spark.sql("""
      SELECT id AS uid,
        CASE WHEN id < 100 THEN map(concat('k', cast(id AS string)), cast(id AS double))
             ELSE CAST(NULL AS map<string,double>) END AS features
      FROM range(200)
    """).repartitionByRange(2, col("uid"))
      .write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features").save(dir)
    assert(graft.spark.NimbleSource.listFiles(dir).size == 2)
    val layout = graft.ops.Compaction.recoverLayout(dir)
    assert(layout("flatMapColumns") == "features", s"union-compat recovery failed: $layout")
    val out = tmpDir("widefmnull-out")
    val rep = graft.ops.Compaction.compact(spark, dir, out, targetFileBytes = 1L << 31)
    assert(rep.rows == 200)
    // genuinely conflicting: a sibling file stores the column as a PLAIN
    // map. Written to a separate dir and DROPPED IN out-of-band — a plain
    // append now RECOVERS the flatmap layout from the footers (r19), so the
    // conflict can only arrive via external file placement
    val plainDir = tmpDir("widefmnull-plain")
    spark.sql("""
      SELECT id + 1000 AS uid, map('k1', cast(id AS double)) AS features FROM range(50)
    """).coalesce(1).write.format("nimble").mode("overwrite").save(plainDir)
    val plainFile = graft.spark.NimbleSource.listFiles(plainDir).head
    java.nio.file.Files.copy(java.nio.file.Paths.get(plainFile),
      java.nio.file.Paths.get(dir, "zz-plain-conflict.gft"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Compaction.recoverLayout(dir)
    }
    assert(e.getMessage.contains("plain map"), e.getMessage)
  }

  test("maxFlatMapKeys cap fires with a clear error") {
    val dir = tmpDir("widefmcap")
    val e = intercept[Exception] {
      fixture.coalesce(1).write.format("nimble").mode("overwrite")
        .option("flatMapColumns", "features")
        .option("maxFlatMapKeys", "100")
        .save(dir)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString(" | ")
    assert(all.contains("maxFlatMapKeys=100") && all.contains("features"),
      s"cap error must name the column and the cap: $all")
  }
}
