package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for 100 TB joins (SURVEY.md north-star scale notes).
  *
  * AQE's skew-join split handles sort-merge joins at runtime; this manual
  * salting pattern covers the cases AQE can't re-plan — broadcast-ineligible
  * dimension joins against a hot-key fact side, or any shuffle whose skew is
  * known up front. Result is row-identical to the plain equi-join: the salt
  * only changes row placement, never matching.
  */
object Skew {

  /** Salted equi-join: the big side scatters each row to one of `salt`
    * sub-keys, the small side is replicated `salt` ways, and the join runs on
    * (key, salt) — a hot key's rows now land on `salt` reducers instead of
    * one.
    *
    * LIMITATION: the content-derived salt cannot scatter rows that are FULL
    * duplicates (identical in every column) — they hash alike and stay on one
    * reducer. That is the price of retry-determinism: any positional
    * discriminator re-salts differently when a failed stage recomputes a
    * subset, double-counting or dropping rows. Duplicate-heavy hot keys
    * should deduplicate-with-count first (aggregate the multiplicity, join,
    * re-expand) rather than rely on salting. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Content-derived scatter: hash of ALL columns, so the salt is a pure
    // function of row content and a retried/speculated task re-salts every
    // row identically. (monotonically_increasing_id would depend on partition
    // layout and row order — the classic nondeterministic-expression-before-
    // shuffle hazard that double-counts or drops rows under partial stage
    // retry.) Rows that are full duplicates share a salt; a hot KEY still
    // scatters because payload columns differ across its rows.
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
