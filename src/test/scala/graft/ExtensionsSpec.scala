package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SparkSessionExtensions registration path: every native expression is
  * injectable cluster-wide and callable from pure SQL. */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects every graft_* function without error") {
    val ext = new SparkSessionExtensions
    new graft.spark.GraftExtensions().apply(ext) // must not throw
  }

  test("registerAll exposes every function to pure SQL") {
    graft.spark.GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
         size(graft_shingle_hashes('a b c d', 3)) AS n_shingles,
         graft_simhash32('hello world') AS sh,
         graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cos,
         graft_lsh_bucket(array(1.0f, 0.0f), 2, 4) AS bucket,
         size(graft_lsh_probes(array(1.0f, 0.0f), 2, 4, 3)) AS n_probes
         """).collect().head
    assert(row.getInt(0) == 2) // "a b c", "b c d"
    assert(!row.isNullAt(1))
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-9)
    assert(!row.isNullAt(3))
    assert(row.getInt(4) == 3)
  }
}
