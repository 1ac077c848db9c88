package graft

import org.apache.spark.sql.functions._

/** SQL CALL procedures (DSv2 ProcedureCatalog): table maintenance —
  * compact, compact_small, zorder — runnable as
  * `CALL cat.system.x(...)`, with one report row back and values intact. */
class ProcedureSpec extends SparkTestBase {
  import spark.implicits._

  private def withCat[A](tag: String)(body: String => A): A = {
    val cat = s"gproc$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.spark.NimbleCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir(s"proc-wh-$tag"))
    body(cat)
  }

  test("CALL system.compact_small merges the small-file tail in place, returns a report row") {
    withCat("a") { cat =>
      val df = spark.range(5000).select(col("id"), (col("id") % 31).as("v"))
      df.writeTo(s"$cat.t1").create()
      // append a 10-file tail
      spark.range(5000, 5500).select(col("id"), (col("id") % 31).as("v"))
        .repartition(10).writeTo(s"$cat.t1").append()
      val before = spark.table(s"$cat.t1").count()
      val rep = spark.sql(
        s"CALL $cat.system.compact_small(table => 't1', min_file_bytes => ${1L << 20})")
        .collect()
      assert(rep.length == 1)
      val r = rep.head
      assert(r.getAs[Int]("files_before") > r.getAs[Int]("files_after"),
        s"tail should merge: $r")
      assert(r.getAs[Long]("rows") == before)
      assert(spark.table(s"$cat.t1").count() == before)
    }
  }

  test("CALL system.zorder rewrites in place; values identical; report sane") {
    withCat("b") { cat =>
      val df = spark.range(20000).select(
        (col("id") % 64).cast("int").as("a"),
        pmod(hash(col("id")), lit(64)).as("b"),
        col("id").as("payload"))
      df.writeTo(s"$cat.t2").create()
      val rep = spark.sql(
        s"CALL $cat.system.zorder(table => 't2', columns => 'a,b')").collect()
      assert(rep.length == 1 && rep.head.getAs[Long]("rows") == 20000L)
      val back = spark.table(s"$cat.t2")
      assert(back.count() == 20000)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    }
  }

  test("CALL system.compact folds a fragmented table to ~one file; unknown proc errors") {
    withCat("c") { cat =>
      spark.range(10000).select(col("id"), (col("id") * 7).as("v"))
        .repartition(12).writeTo(s"$cat.t3").create()
      val rep = spark.sql(s"CALL $cat.system.compact(table => 't3')").collect().head
      assert(rep.getAs[Int]("files_after") == 1, rep)
      assert(spark.table(s"$cat.t3").count() == 10000)
      val e = intercept[Exception] {
        spark.sql(s"CALL $cat.system.nonsense(table => 't3')").collect()
      }
      assert(e.getMessage.toLowerCase.contains("nonsense") ||
        e.getMessage.toLowerCase.contains("procedure"))
    }
  }

  test("failed CALL leaves no side dir and the table intact; catalog-qualified names resolve") {
    withCat("d") { cat =>
      val df = spark.range(3000).select(col("id"), array(col("id")).as("arr"))
      df.writeTo(s"$cat.t4").create()
      // zorder on an unsupported (array) column fails AFTER the side dir is
      // created — the table must be untouched and the side dir cleaned up
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.zorder(table => 't4', columns => 'arr')").collect()
      }
      assert(spark.table(s"$cat.t4").count() == 3000, "failed CALL must not damage the table")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val leftovers = new java.io.File(s"$wh/t4").listFiles()
        .filter(_.getName.startsWith(".optimize-"))
      assert(leftovers.isEmpty, s"side dir leaked: ${leftovers.mkString(",")}")
      // Iceberg-style catalog-qualified table name resolves to the same table
      val rep = spark.sql(s"CALL $cat.system.compact(table => '$cat.t4')").collect().head
      assert(rep.getAs[Long]("rows") == 3000L)
      assert(spark.table(s"$cat.t4").count() == 3000)
    }
  }

  test("CALL system.vacuum removes only aged crash-recovery dirs, never fresh ones or data") {
    withCat("e") { cat =>
      spark.range(2000).select(col("id"), (col("id") % 5).as("v"))
        .writeTo(s"$cat.t5").create()
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val tdir = new java.io.File(s"$wh/t5")
      // an "aged" orphan (simulated crash leftover) and a fresh one
      def aged(name: String): java.io.File = {
        val d = new java.io.File(tdir, name)
        d.mkdirs()
        java.nio.file.Files.write(new java.io.File(d, "part-x.gft").toPath, Array[Byte](1, 2, 3))
        d.listFiles().foreach(_.setLastModified(System.currentTimeMillis() - 10L * 3600 * 1000))
        d.setLastModified(System.currentTimeMillis() - 10L * 3600 * 1000)
        d
      }
      // one per commit protocol that can leave a side dir behind
      val olds = Seq(aged(".rewrite-deadbeef"), aged(".surgery-deadbeef"),
        aged(".compact-deadbeef"))
      val fresh = new java.io.File(tdir, ".optimize-cafebabe")
      fresh.mkdirs()
      val rep = spark.sql(
        s"CALL $cat.system.vacuum(table => 't5', older_than_hours => 1)").collect().head
      assert(rep.getAs[Int]("dirs_removed") == 3, rep)
      assert(rep.getAs[Long]("bytes_reclaimed") == 9L, rep)
      olds.foreach(old => assert(!old.exists(), s"aged orphan $old must be removed"))
      assert(fresh.exists(), "a fresh dir may belong to a live operation")
      assert(spark.table(s"$cat.t5").count() == 2000)
    }
  }

  test("CALL system.stats reports per-column counts and HLL distinct estimates") {
    withCat("f") { cat =>
      spark.range(30000).select(col("id"),
          (col("id") % 40).as("low"),
          when(col("id") % 10 === 0, lit(null)).otherwise(md5(col("id").cast("string"))).as("s"))
        .writeTo(s"$cat.t6").create()
      // second file: overlapping ids — merged ndv must be union, not sum
      spark.range(20000, 35000).select(col("id"),
          (col("id") % 40).as("low"),
          when(col("id") % 10 === 0, lit(null)).otherwise(md5(col("id").cast("string"))).as("s"))
        .writeTo(s"$cat.t6").append()
      // a struct column surfaces per-leaf rows (dotted paths)
      spark.range(1000).select(col("id").as("rid"),
          struct((col("id") % 7).as("a")).as("st"))
        .writeTo(s"$cat.t7").create()
      val nested = spark.sql(s"CALL $cat.system.stats(table => 't7')").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(nested.keySet == Set("rid", "st.a"), nested.keySet.toString)
      assert(math.abs(nested("st.a").getAs[Long]("ndv") - 7) <= 2)

      val rows = spark.sql(s"CALL $cat.system.stats(table => 't6')").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rows.keySet == Set("id", "low", "s"))
      assert(rows("id").getAs[Long]("value_count") == 45000)
      assert(rows("id").getAs[Long]("null_count") == 0)
      val idNdv = rows("id").getAs[Long]("ndv")
      assert(math.abs(idNdv - 35000) <= 35000 * 0.15, s"id ndv=$idNdv")
      val lowNdv = rows("low").getAs[Long]("ndv")
      assert(math.abs(lowNdv - 40) <= 6, s"low ndv=$lowNdv")
      assert(rows("s").getAs[Long]("null_count") == 4500)
    }
  }
}
