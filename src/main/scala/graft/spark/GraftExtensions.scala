package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** The engine's native Catalyst expressions as one catalog.
  *
  * Two registration paths, same builders:
  *  - `spark.sql.extensions=graft.spark.GraftExtensions` — cluster-wide,
  *    pure-SQL users get every `graft_*` function with zero Scala
  *    (the idiomatic `SparkSessionExtensions` route)
  *  - `GraftFunctions.registerAll(spark)` — session-local, idempotent
  *    (what the `ops` operators call on first use).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hashes" -> (exprs => ShingleHashes(exprs.head, exprs(1))),
    "graft_simhash32" -> (exprs => SimHash32(exprs.head)),
    "graft_cosine" -> (exprs => CosineSim(exprs.head, exprs(1))),
    "graft_lsh_bucket" -> (exprs => LshBucket(exprs.head, exprs(1), exprs(2))),
    "graft_lsh_probes" -> (exprs => LshProbes(exprs.head, exprs(1), exprs(2), exprs(3))),
    "graft_normalize" -> (exprs => NormalizeText(exprs.head,
      nfkc = exprs.lift(1).exists(_.eval(null) == true),
      stripAccents = exprs.lift(2).exists(_.eval(null) == true))))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, builder) => Registry.ensure(spark, name, builder) }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    // batch index-lookup table function (SelectiveNimbleIndexReader surface)
    ext.injectTableFunction((FunctionIdentifier(NimbleLookupTvf.name),
      NimbleLookupTvf.info, NimbleLookupTvf.builder))
    // stats-proven decimal aggregate narrowing over nimble relations.
    // The rule must run AFTER V2ScanRelationPushDown — its overflow proof
    // reads the exact file snapshot the built NimbleScan pins — but every
    // direct injection slot (injectOptimizerRule = operator-optimization
    // batch, injectPreCBORule) runs BEFORE scan pushdown in Spark 4.1
    // (verified empirically). The one post-pushdown batch is "User Provided
    // Optimizers" (experimental.extraOptimizations), so the injected
    // builder — which receives the session when its state is constructed —
    // wires the rule there (idempotent), and the operator-batch slot itself
    // contributes nothing (the rule declines on bare pre-pushdown
    // relations by design).
    ext.injectOptimizerRule { session =>
      DecimalNarrowing.install(session)
      DecimalNarrowing
    }
  }
}
