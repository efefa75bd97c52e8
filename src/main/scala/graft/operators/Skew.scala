package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot spots —
  * the explicit complement to AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin`). AQE only rewrites sort-merge joins
  * it can measure; explicit salting is the declarative fallback when a
  * single key's rows exceed what one task should hold (viral user,
  * null-ish default key, one giant document cluster).
  *
  * Mechanics: every fact row gets a salt in [0, salts); the (small) dim
  * side is replicated `salts`× with one copy per salt; the join key
  * becomes (key, salt), so a hot key's rows spread across `salts` tasks
  * instead of one. Join OUTPUT is identical to the unsalted join for
  * inner/left joins — which salt a row draws never affects matching,
  * only placement — at the cost of a `salts`× blowup of the dim side
  * (keep dims slim).
  */
object Skew {

  /** Salted equi-join: `fact` (possibly skewed, large) ⋈ `dim` (small
    * enough to replicate `salts`×). Supports "inner" and "left". */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 salts: Int = 16, joinType: String = "inner",
                 seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics for inner/left joins, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
