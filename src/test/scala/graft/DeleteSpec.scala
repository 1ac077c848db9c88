package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Compaction, Delete}
import graft.spark.NimbleSource

/** Row-level DELETE / UPDATE: metadata-only file unlinks when stats prove
  * classification, layout-preserving copy-on-write for mixed files, SQL
  * null semantics (a NULL predicate never deletes), SQL DELETE FROM /
  * TRUNCATE through the catalog, and hard refusals where a rewrite would
  * lie (unsigned-widened tables, layout-column updates). */
class DeleteSpec extends SparkTestBase {
  import spark.implicits._

  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def sortedDir(name: String): String = {
    val dir = tmpDir(name)
    orders.repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      .write.format("nimble").mode("overwrite")
      .option("sortColumns", "o_orderkey")
      .option("indexColumns", "o_orderkey")
      .save(dir)
    dir
  }

  private def readBack(dir: String): DataFrame = spark.read.format("nimble").load(dir)

  private def assertSameData(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("metadata-only delete: range predicate on the sort column unlinks whole files, zero rewrite") {
    val dir = sortedDir("del-meta")
    val before = NimbleSource.listFiles(dir)
    val maxKey = orders.agg(max("o_orderkey")).as[Long].head()
    val cut = maxKey / 2
    val rep = Delete.delete(spark, dir, col("o_orderkey") > cut)
    assert(rep.filesRewritten <= 1, s"range delete on the sort key should be ~file-separable: $rep")
    assert(rep.filesDeleted >= 1, s"expected whole-file unlinks: $rep")
    // untouched files are literally the same files (no rewrite churn)
    val after = NimbleSource.listFiles(dir)
    assert(after.toSet.subsetOf(before.toSet ++ after.filterNot(before.contains)), rep.toString)
    assertSameData(readBack(dir), orders.filter(!(col("o_orderkey") > cut)))
    assert(rep.rowsDeleted == orders.filter(col("o_orderkey") > cut).count())
  }

  test("mixed delete: mid-file predicate rewrites only affected files, layout survives") {
    val dir = sortedDir("del-mixed")
    val layoutBefore = Compaction.recoverLayout(dir)
    val filesBefore = NimbleSource.listFiles(dir).toSet
    // delete a narrow keyhole: lands inside one or two files
    val rep = Delete.delete(spark, dir,
      col("o_orderkey") >= 100L && col("o_orderkey") <= 200L)
    assert(rep.filesRewritten >= 1 && rep.filesRewritten <= 2, rep.toString)
    assert(rep.filesUntouched >= 6, rep.toString)
    // untouched files unchanged on disk; the boundary files take chunk
    // surgery (index-bearing files are eligible since r19) and are replaced
    // IN PLACE under their original names
    val stillThere = NimbleSource.listFiles(dir).toSet.intersect(filesBefore)
    assert(stillThere.size >= rep.filesUntouched + rep.filesDeleted, rep.toString)
    assert(graft.ops.Surgery.lastRewrittenChunks.get() > 0,
      "keyhole delete on the indexed table should run chunk surgery")
    assert(Compaction.recoverLayout(dir) == layoutBefore, "layout must survive the rewrite")
    assertSameData(readBack(dir),
      orders.filter(!(col("o_orderkey") >= 100L && col("o_orderkey") <= 200L)))
    // the rewritten file still honors the sort contract (stats-monotone scan planning)
    val footer = NimbleSource.footerOf(NimbleSource.listFiles(dir).head)
    assert(footer.sortColumns == Seq("o_orderkey"))
  }

  test("null semantics: rows where the predicate is NULL survive") {
    val dir = tmpDir("del-null")
    Seq((1L, Some(10L)), (2L, None), (3L, Some(99L)), (4L, None))
      .toDF("id", "v").write.format("nimble").mode("overwrite").save(dir)
    val rep = Delete.delete(spark, dir, col("v") > 50L)
    assert(rep.rowsDeleted == 1L, rep.toString)
    assert(readBack(dir).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("delete everything leaves a readable empty table with the schema") {
    val dir = sortedDir("del-all")
    val rep = Delete.delete(spark, dir, lit(true))
    assert(rep.rowsRemaining == 0L, rep.toString)
    val back = readBack(dir)
    assert(back.count() == 0L)
    assert(back.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
  }

  test("bucketed table: delete preserves the bucket spec and rows") {
    val dir = tmpDir("del-bucketed")
    orders.write.format("nimble").mode("overwrite")
      .option("bucketColumns", "o_orderkey").option("numBuckets", "4")
      .save(dir)
    val specBefore = NimbleSource.bucketSpecOf(NimbleSource.listFiles(dir))
    assert(specBefore.contains((Seq("o_orderkey"), 4)))
    val rep = Delete.delete(spark, dir, col("o_totalprice") > 150000.0)
    assert(rep.filesRewritten >= 1, rep.toString)
    val files = NimbleSource.listFiles(dir)
    assert(NimbleSource.bucketSpecOf(files).contains((Seq("o_orderkey"), 4)),
      "bucket spec must survive the rewrite")
    // every replacement file's rows actually live in its declared bucket
    assertSameData(readBack(dir), orders.filter(!(col("o_totalprice") > 150000.0)))
  }

  test("SQL DELETE FROM + TRUNCATE through the catalog") {
    val wh = tmpDir("del-warehouse")
    spark.conf.set("spark.sql.catalog.gdel", "graft.spark.NimbleCatalog")
    spark.conf.set("spark.sql.catalog.gdel.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS gdel.default.ords")
    orders.writeTo("gdel.default.ords").create()
    val total = orders.count()
    val hit = orders.filter(col("o_orderstatus") === "F").count()
    spark.sql("DELETE FROM gdel.default.ords WHERE o_orderstatus = 'F'")
    assert(spark.table("gdel.default.ords").count() == total - hit)
    assertSameData(spark.table("gdel.default.ords"),
      orders.filter(col("o_orderstatus") =!= "F"))
    spark.sql("TRUNCATE TABLE gdel.default.ords")
    assert(spark.table("gdel.default.ords").count() == 0L)
    assert(spark.table("gdel.default.ords").schema.fieldNames.length == 4)
    spark.sql("DROP TABLE gdel.default.ords")
  }

  test("update: assignments hit only matching rows, evaluated against original values") {
    val dir = tmpDir("upd-basic")
    Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("id", "a", "b").write.format("nimble").mode("overwrite").save(dir)
    // swap semantics: SET a=b, b=a must use ORIGINAL values for both
    val rep = Delete.update(spark, dir, col("id") =!= 2L,
      Map("a" -> col("b"), "b" -> col("a")))
    assert(rep.filesDeleted == 0, rep.toString)
    val rows = readBack(dir).orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 100L, 10L), (2L, 20L, 200L), (3L, 300L, 30L)))
  }

  test("update: files provably outside the predicate are untouched; layout survives") {
    val dir = sortedDir("upd-sorted")
    val filesBefore = NimbleSource.listFiles(dir).toSet
    val rep = Delete.update(spark, dir,
      col("o_orderkey") >= 100L && col("o_orderkey") <= 200L,
      Map("o_totalprice" -> lit(0.0)))
    assert(rep.filesUntouched >= 6, rep.toString)
    // surgered keyhole files are replaced in place (same name) since r19
    assert(NimbleSource.listFiles(dir).toSet.intersect(filesBefore).size >= rep.filesUntouched)
    assert(Compaction.recoverLayout(dir).get("sortColumns").contains("o_orderkey"))
    val expected = orders.withColumn("o_totalprice",
      when(col("o_orderkey") >= 100L && col("o_orderkey") <= 200L, lit(0.0))
        .otherwise(col("o_totalprice")))
    assertSameData(readBack(dir), expected)
  }

  test("update refuses assignments to layout columns") {
    val dir = sortedDir("upd-refuse")
    val e = intercept[IllegalArgumentException] {
      Delete.update(spark, dir, lit(true), Map("o_orderkey" -> lit(0L)))
    }
    assert(e.getMessage.contains("layout"))
  }

  test("fuzz: random layouts x random predicates delete exactly the filter truth (seeded)") {
    val rnd = new scala.util.Random(11814)
    val base = orders
    for (trial <- 0 until 6) {
      val dir = tmpDir(s"del-fuzz$trial")
      val layout = rnd.nextInt(3) match {
        case 0 => // plain
          base.repartition(4 + rnd.nextInt(4)).write.format("nimble")
            .mode("overwrite").save(dir); "plain"
        case 1 => // sorted + indexed
          base.repartitionByRange(4 + rnd.nextInt(4), col("o_orderkey"))
            .sortWithinPartitions("o_orderkey")
            .write.format("nimble").mode("overwrite")
            .option("sortColumns", "o_orderkey")
            .option("indexColumns", "o_orderkey").save(dir); "sorted"
        case _ => // bucketed
          base.write.format("nimble").mode("overwrite")
            .option("bucketColumns", "o_custkey").option("numBuckets", "4")
            .save(dir); "bucketed"
      }
      val maxKey = 60000L
      val cond = rnd.nextInt(4) match {
        case 0 =>
          val lo = (rnd.nextLong().abs % maxKey)
          col("o_orderkey") >= lo && col("o_orderkey") < lo + rnd.nextInt(20000)
        case 1 => col("o_orderstatus") === Seq("F", "O", "P")(rnd.nextInt(3))
        case 2 => col("o_totalprice") > (50000.0 + rnd.nextInt(150000))
        case _ =>
          col("o_custkey").isin((0 until 5).map(_ => rnd.nextLong().abs % 1500): _*)
      }
      val layoutBefore = Compaction.recoverLayout(dir)
      val rep = Delete.delete(spark, dir, cond)
      val truth = base.filter(coalesce(!cond, lit(true)))
      assertSameData(readBack(dir), truth)
      assert(rep.rowsDeleted == base.count() - truth.count(),
        s"trial $trial ($layout): $rep")
      if (truth.count() > 0)
        assert(Compaction.recoverLayout(dir) == layoutBefore,
          s"trial $trial ($layout): layout changed")
    }
  }

  test("unsigned-widened table: stored-domain surgery deletes across the sign boundary") {
    // r20 (r19 verdict #7 stretch): widened-domain predicates translate into
    // the stored signed domain, so boundary files take chunk surgery instead
    // of refusing. Stored shorts -1/-100 read as 65535/65436 widened — the
    // high half of the unsigned domain, which a signed-naive comparison
    // would order BELOW the positives.
    val dir = tmpDir("del-unsigned")
    Seq((1L, 100.toShort), (2L, 200.toShort), (3L, 300.toShort),
        (4L, (-100).toShort) /* 65436 */, (5L, (-1).toShort) /* 65535 */,
        (6L, 0.toShort))
      .toDF("id", "u")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .mode("overwrite").save(dir)
    val opts = Map("unsignedColumns" -> "u")
    graft.ops.Surgery.resetCounters()
    // widened threshold 250: deletes u ∈ {300, 65436, 65535}, keeps {0,100,200}
    val rep = Delete.delete(spark, dir, col("u") > 250, opts)
    assert(rep.rowsDeleted == 3L, s"stored-domain delete drifted: $rep")
    assert(graft.ops.Surgery.lastRewrittenChunks.get() > 0L,
      s"must go through chunk surgery (refusal='${graft.ops.Surgery.lastRefusal}')")
    val back = spark.read.format("nimble").options(opts).load(dir)
      .select("id", "u").as[(Long, Long)].collect().toSet
    assert(back == Set((1L, 100L), (2L, 200L), (6L, 0L)), s"got $back")
    // exact widened-domain equality (Int literal — the widened type; a Long
    // literal would cast-wrap the column and defeat exact translation)
    val rep2 = Delete.delete(spark, dir, col("u") === 200, opts)
    assert(rep2.rowsDeleted == 1L, s"equality delete drifted: $rep2")
    assert(spark.read.format("nimble").options(opts).load(dir).count() == 2L)
    // an inexact (untranslatable-by-construction) predicate still refuses:
    // the Spark rewrite would store widened values
    val e = intercept[IllegalArgumentException] {
      Delete.delete(spark, dir, pmod(col("u"), lit(7L)) === 3L, opts)
    }
    assert(e.getMessage.contains("unsigned"))
  }

  test("DELETE WHERE col NOT IN (x, NULL) deletes nothing — three-valued IN (r20 review)") {
    import org.apache.spark.sql.sources.{Not, In}
    // SQL: v IN (1, NULL) is TRUE or NULL, never FALSE — so NOT of it is
    // never TRUE and the delete must remove ZERO rows. The null LITERAL
    // slips compile's reference-null guard, so pre-fix classification
    // proved a bogus all-match and unlinked whole files (data loss on any
    // table — no unsigned columns involved).
    val dir = tmpDir("del-notin-null")
    spark.range(1000L).toDF("id").withColumn("v", col("id") % 7)
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val f: org.apache.spark.sql.sources.Filter = Not(In("v", Array(1L, null)))
    assert(!Delete.metadataOnlyDeletable(dir, Array(f)),
      "NOT IN with a null literal must never classify metadata-only")
    val rep = Delete.deleteFilters(spark, dir, Array(f))
    assert(rep.rowsDeleted == 0L, s"NOT IN (x, NULL) must delete nothing: $rep")
    assert(spark.read.format("nimble").load(dir).count() == 1000L)
    // the positive direction still behaves: IN (1, NULL) matches v=1 only
    val rep2 = Delete.deleteFilters(spark, dir, Array(In("v", Array(1L, null))))
    assert(rep2.rowsDeleted == 1000L / 7 + (if (1000 % 7 > 1) 1 else 0),
      s"positive IN with null element drifted: $rep2")
  }

  test("unsigned NOT over an out-of-range literal never deletes NULL rows (r20 review)") {
    import org.apache.spark.sql.sources.{Not, EqualTo, GreaterThan, EqualNullSafe}
    // the AlwaysFalse/IsNotNull edge translations are null-equivalent only
    // POSITIVELY: NOT(u = 70000) is NULL (not true) on a NULL u, while
    // Not(AlwaysFalse()) would be TRUE — classification would then unlink
    // whole files and destroy the NULL rows the predicate must keep. The
    // translation must refuse edge forms under Not.
    val dir = tmpDir("del-unsigned-not")
    Seq[(Long, Option[Short])]((1L, Some(100.toShort)), (2L, None),
        (3L, Some((-1).toShort)), (4L, None))
      .toDF("id", "u").coalesce(1)
      .write.format("nimble").mode("overwrite").save(dir)
    val opts = Map("unsignedColumns" -> "u")
    // unit level: edge forms refuse under Not, exact forms survive
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.ShortType)))
    def trOne(f: org.apache.spark.sql.sources.Filter) =
      graft.spark.Filters.unsignedStored(Array(f), Set("u"), sch)
    assert(trOne(Not(EqualTo("u", 70000))).isEmpty, "out-of-range Not(=) must refuse")
    assert(trOne(Not(GreaterThan("u", -5))).isEmpty, "always-true-under-Not must refuse")
    assert(trOne(Not(GreaterThan("u", 100))).isDefined, "in-range Not(>) translates")
    assert(trOne(EqualTo("u", 70000)).isDefined, "positive out-of-range is fine")
    // EqualNullSafe is two-valued — its edge form stays exact under Not
    assert(trOne(Not(EqualNullSafe("u", 70000))).isDefined)
    // end to end through the SQL-filter entry (exact filters by contract):
    // must refuse loudly, leaving every row (NULLs included) intact
    val e = intercept[IllegalArgumentException] {
      Delete.deleteFilters(spark, dir, Array(Not(EqualTo("u", 70000))), opts)
    }
    assert(e.getMessage.contains("unsigned"))
    assert(spark.read.format("nimble").options(opts).load(dir).count() == 4L)
    // and metadata-only classification reports false, not a bogus all-match
    assert(!Delete.metadataOnlyDeletable(dir, Array(Not(EqualTo("u", 70000))), Set("u")))
  }
}
