package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SparkSessionExtensions registration path: every native expression is
  * injectable cluster-wide and callable from pure SQL. */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects every graft_* function without error") {
    val ext = new SparkSessionExtensions
    new graft.spark.GraftExtensions().apply(ext) // must not throw
  }

  test("GraftExtensions injects DecimalNarrowing as a cluster-wide optimizer rule") {
    // a FRESH session built through GraftExtensions — the cluster
    // deployment wiring (spark.sql.extensions names this same class; it is
    // a STATIC conf, so on the suite's shared SparkContext it must be
    // registered programmatically via withExtensions — verified to apply
    // identically on a first-session JVM). The shared session must be
    // cleared first: getOrCreate returns an existing active/default session
    // (which may carry the session-local install from other suites — a
    // false pass).
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.spark.GraftExtensions())
      .getOrCreate()
    try {
      assert(s2 ne spark, "must be a genuinely new session")
      // NOTE: the extension wires DecimalNarrowing into
      // experimental.extraOptimizations when s2's session state is built
      // (the only optimizer batch that runs after scan pushdown — the rule
      // needs the built NimbleScan's pinned file snapshot), so a narrowed
      // plan on this fresh session still proves the cluster injection path:
      // nothing else touched s2.
      s2.read.format("nimble").load(dir).createOrReplaceTempView("ext_lineitem")
      val p = s2.sql(
        "SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) s FROM ext_lineitem GROUP BY 1")
        .queryExecution.executedPlan.toString
      assert(p.contains("UnscaledValue"), s"extensions-injected rule did not fire:\n$p")
    } finally {
      // getOrCreate reuses the shared SparkContext: only clear the session,
      // the other suites keep theirs
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(SparkTestBase.session)
      org.apache.spark.sql.SparkSession.setActiveSession(SparkTestBase.session)
    }
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
