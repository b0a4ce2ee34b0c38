package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.SqlFunctions

/** SparkSessionExtensions entry point: installs the graft Catalyst
  * expressions as SQL functions at session build time, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` — and the whole sketch/text
  * surface (`minhash_sig`, `simhash32`, `shingle_jaccard`, `lang_quality`,
  * `word_fingerprint`, `char_shingles`) — works in any session created with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. Builder list shared with
  * [[graft.functions.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    SqlFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
    // planner surface: BETWEEN-style range joins → bucketed equi-join
    // (no-op until spark.graft.intervalJoin.bucketSize is set positive)
    ext.injectOptimizerRule(_ => new graft.plans.RangeJoinRewrite)
  }
}
