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

  test("absent-column null fill survives chunks larger than the vector's initial capacity") {
    // vectors allocate at 16384 and putNulls does not grow on its own — a
    // file written with rowsPerChunk > 16384 read through an evolved schema
    // exercised the unreserved path (ADVICE r8: ArrayIndexOutOfBounds)
    val dir = tmpDir("evolve_bigchunk")
    spark.range(40000).toDF("id")
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "30000")
      .mode("overwrite").save(dir)
    val df = spark.read.format("nimble").schema("id long, extra double").load(dir)
    assert(df.count() == 40000L)
    assert(df.filter(col("extra").isNull).count() == 40000L)
    assert(df.select("extra").collect().forall(_.isNullAt(0)))
  }

  test("mergeSchema recursively merges structs differing by an added nested field") {
    val dir = tmpDir("evolve_nested_merge")
    spark.sql("SELECT id, named_struct('x', concat('v', id)) AS st FROM range(2)")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    spark.sql("SELECT id, named_struct('x', concat('w', id), 'y', id * 10) AS st FROM range(2, 4)")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    val df = spark.read.format("nimble").option("mergeSchema", "true").load(dir)
    val st = df.schema("st").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("x", "y"), s"merged struct: $st")
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getStruct(1).getString(0)).toSeq == Seq("v0", "v1", "w2", "w3"))
    assert(rows.take(2).forall(_.getStruct(1).isNullAt(1)), "old files null-fill the added nested field")
    assert(rows.drop(2).map(_.getStruct(1).getLong(1)).toSeq == Seq(20L, 30L))
    // conflicting nested LEAF types still fail fast
    val dir2 = tmpDir("evolve_nested_conflict")
    spark.sql("SELECT named_struct('x', 1L) AS st FROM range(1)")
      .coalesce(1).write.format("nimble").mode("append").save(dir2)
    spark.sql("SELECT named_struct('x', 1.5D) AS st FROM range(1)")
      .coalesce(1).write.format("nimble").mode("append").save(dir2)
    val e = intercept[Exception] {
      spark.read.format("nimble").option("mergeSchema", "true").load(dir2).collect()
    }
    def chain(t: Throwable): List[Throwable] = if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(m => m.getMessage != null &&
      m.getMessage.contains("incompatible data types")), s"got $e")
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
