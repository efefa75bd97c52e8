package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
        CosineSim(children.head, children(1))
      }))
  }
}
