package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SparkSessionExtensions entry point registering graft's native
  * Catalyst expressions (the (c)-tier of the custom-operator ladder:
  * injected via the public extensions API, usable from SQL and
  * `call_function`). Activate with
  * `.config("spark.sql.extensions", "graft.sql.GraftExtensions")`
  * on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "cosine_sim(arrayA, arrayB) takes exactly 2 arguments")
        // CosineSim reads elements as raw doubles and declares no input
        // types, so SQL callers must be normalized here: cast both
        // arguments to array<double>. For array<int>/array<float> this is
        // a real element cast; for array<double> the optimizer folds the
        // cast away; for un-castable types (e.g. plain string) the Cast
        // fails analysis — an error instead of bit-reinterpreted garbage.
        val toDoubleArray =
          (e: Expression) => Cast(e, ArrayType(DoubleType, containsNull = true))
        CosineSim(toDoubleArray(children.head), toDoubleArray(children(1)))
      }))

    // Spark SHIPS Bloom-filter expressions (they power runtime
    // row-level filtering) but does not register them in the OSS
    // function registry. Injecting them makes the Bloom tiers fully
    // in-plan: `bloom_filter_agg` builds the filter as an aggregate
    // (distributed, mergeable, no driver round-trip) and
    // `might_contain` probes it as a codegen'd native predicate — no
    // scalar UDF, no broadcast variable plumbing.
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c)       => new BloomFilterAggregate(c)
          case Seq(c, n)    => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg(col[, estimatedNumItems[, numBits]])")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "token_count(text) takes exactly 1 argument")
        // SQL callers may pass any castable type; normalize to string
        // (the optimizer folds the cast away for string inputs)
        TokenCount(Cast(children.head,
          org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "might_contain(bloomBinary, longValue) takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
