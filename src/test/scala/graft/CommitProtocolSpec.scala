package graft

import graft.format.{GraftIO, Tablet}
import org.apache.spark.sql.functions._

/** Hadoop-FS paths + the output commit protocol (VERDICT r2 "Next round" #1):
  * `file:` URIs round-trip; a task that dies mid-write never corrupts the
  * table; a failed overwrite leaves the old table intact. */
class CommitProtocolSpec extends SparkTestBase {

  test("file: URI write + read round-trip") {
    import spark.implicits._
    val dir = "file://" + tmpDir("uri")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    df.write.format("nimble").mode("overwrite").save(dir)
    val back = spark.read.format("nimble").load(dir)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // and the same directory read schemeless sees the same data
    val raw = dir.stripPrefix("file://")
    assert(spark.read.format("nimble").load(raw).count() == 3)
  }

  test("GraftIO path classification") {
    assert(GraftIO.isLocal("/x/y.gft"))
    assert(GraftIO.isLocal("file:///x/y.gft"))
    assert(GraftIO.isLocal("file:/x/y.gft"))
    assert(!GraftIO.isLocal("hdfs://nn:9000/x"))
    assert(!GraftIO.isLocal("s3a://bucket/key"))
    assert(GraftIO.localPath("file:///a/b") == "/a/b")
    assert(GraftIO.localPath("file:/a/b") == "/a/b")
    assert(GraftIO.localPath("/a/b") == "/a/b")
  }

  test("writes land via _temporary; no temp dirs remain after commit") {
    import spark.implicits._
    val dir = tmpDir("commit")
    Seq((1L, "x")).toDF("id", "s").write.format("nimble").mode("overwrite").save(dir)
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.contains("_temporary"), s"working dir not cleaned: $left")
    assert(left.exists(_.endsWith(".gft")))
  }

  test("a writer killed mid-task leaves no visible partial file (exactly-once read)") {
    import spark.implicits._
    val dir = tmpDir("midtask")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.format("nimble").mode("overwrite").save(dir)

    // simulate an executor death with no abort(): a partial AND a complete
    // orphan file sitting in a _temporary working dir of a failed/ongoing job
    val temp = s"$dir/_temporary/deadjob"
    GraftIO.mkdirs(temp)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$temp/0-part-00000-deadjob.gft"),
      Array.fill[Byte](100)(42)) // partial garbage — no footer
    val w = new Tablet.Writer(s"$temp/1-part-00001-deadjob.gft",
      Seq((9L, "z")).toDF("id", "s").schema.json, Array.empty)
    w.close() // complete but uncommitted file

    // the read sees only the committed rows — orphans are invisible
    val got = spark.read.format("nimble").load(dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L), s"uncommitted output leaked into the read: $got")
  }

  test("failed overwrite leaves the previous table intact") {
    import spark.implicits._
    val dir = tmpDir("failover")
    Seq((1L, "keep"), (2L, "keep")).toDF("id", "s")
      .write.format("nimble").mode("overwrite").save(dir)

    // an overwrite whose task throws: job fails before commit -> truncate
    // never ran, temp dir is aborted away
    val boom = udf((id: Long) => {
      if (id == 4L) throw new RuntimeException("injected task failure")
      id
    })
    intercept[Exception] {
      Seq(3L, 4L).toDF("id").withColumn("id", boom(col("id"))).withColumn("s", lit("new"))
        .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    }
    val got = spark.read.format("nimble").load(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "keep"), (2L, "keep")), s"failed overwrite damaged the table: $got")
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.contains("_temporary"), s"aborted working dir not cleaned: $left")
  }

  test("Tablet.Reader + Lookup work through a file: URI") {
    import spark.implicits._
    val dir = tmpDir("lookup-uri")
    Seq((10L, "x"), (20L, "y")).toDF("id", "s").coalesce(1)
      .write.format("nimble").mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles("file://" + dir).head
    assert(file.startsWith("file://") || file.startsWith("/"))
    val r = new Tablet.Reader(file)
    try assert(r.footer.rowCount == 2) finally r.close()
    val hits = graft.format.Lookup.pointLookup("file://" + dir, "id", 20L)
    assert(hits.map(_("s")) == Seq("y"))
  }
}
