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
  }
}
