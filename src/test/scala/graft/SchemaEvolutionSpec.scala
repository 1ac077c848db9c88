package graft

import org.apache.spark.sql.functions._

/** Schema evolution over mixed-schema table directories (parquet parity):
  * a column added after older files were written reads as null from them,
  * pushed filters on it keep SQL null semantics, and `mergeSchema=true`
  * infers the union schema. */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def writeMixed(): String = {
    val dir = tmpDir("evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    Seq((3L, "c", 9.5), (4L, "d", -1.0)).toDF("id", "s", "extra")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    dir
  }

  test("missing column reads as null; filters keep SQL null semantics") {
    val dir = writeMixed()
    val df = spark.read.format("nimble").schema("id long, s string, extra double").load(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    assert(rows(2).getDouble(2) == 9.5 && rows(3).getDouble(2) == -1.0)

    // range predicate on the evolved column: nulls never match
    assert(df.filter(col("extra") > 1.0).collect().map(_.getLong(0)).toSeq == Seq(3L))
    // IsNull matches exactly the rows from the pre-evolution file
    assert(df.filter(col("extra").isNull).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // count(*) with a filter that references ONLY the evolved column (the
    // zero-stream scan path on the old file)
    assert(df.filter(col("extra").isNull).count() == 2L)
    assert(df.filter(col("extra") < 0.0).count() == 1L)
    // projection of only the evolved column
    assert(df.select("extra").collect().count(_.isNullAt(0)) == 2)
  }

  test("mergeSchema=true infers the union schema across files") {
    val dir = writeMixed()
    val df = spark.read.format("nimble").option("mergeSchema", "true").load(dir)
    assert(df.schema.fieldNames.toSet == Set("id", "s", "extra"))
    assert(df.count() == 4L)
    assert(df.filter(col("extra").isNotNull).count() == 2L)
  }

  test("evolved struct column (entirely absent) reads as null struct") {
    val dir = tmpDir("evolve_struct")
    Seq((1L, "a")).toDF("id", "s")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    val df = spark.read.format("nimble")
      .schema("id long, s string, st struct<x: long, y: string>").load(dir)
    val r = df.collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(2))
  }

  test("field added INSIDE an existing struct reads as null from old files") {
    val dir = tmpDir("evolve_nested")
    spark.sql("SELECT id, named_struct('x', concat('v', id)) AS st FROM range(3)")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    val df = spark.read.format("nimble")
      .schema("id long, st struct<x: string, y: long>").load(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    for ((r, i) <- rows.zipWithIndex) {
      val st = r.getStruct(1)
      assert(st.getString(0) == s"v$i", s"existing nested field must survive: $st")
      assert(st.isNullAt(1), s"added nested field must read null: $st")
    }
  }

  test("mergeSchema rejects same-name columns of different types (no silent garbage)") {
    val dir = tmpDir("evolve_conflict")
    Seq((1L, 5L)).toDF("id", "x")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    Seq((2L, 1.5)).toDF("id", "x")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    val e = intercept[Exception] {
      spark.read.format("nimble").option("mergeSchema", "true").load(dir).collect()
    }
    def chain(t: Throwable): List[Throwable] = if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(m => m.getMessage != null &&
      m.getMessage.contains("incompatible data types")), s"got $e")
  }
}
