package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.expressions.{CosineSimilarity, DotProduct}

/** SparkSessionExtensions entry point: installs the graft Catalyst
  * expressions as SQL functions at session build time, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works in any session created
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft", name)
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"), info("cosine_sim"),
        (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(
      (FunctionIdentifier("dot_product"), info("dot_product"),
        (es: Seq[Expression]) => DotProduct(es(0), es(1))))
  }
}
