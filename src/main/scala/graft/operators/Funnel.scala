package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential funnel completion over an event stream: for each entity, the
  * timestamp of its first step-1 event, then the first step-2 event
  * STRICTLY AFTER that, then the first step-3 event after THAT, and so on
  * — the product-analytics "signup → activation → purchase" question,
  * with the strict ordering semantics (each stage must causally follow
  * the previous one's chosen event, not merely exist).
  *
  * Scale shape: stage k is one filtered aggregate (`type = steps(k)` is
  * pushed to the scan, so each pass reads only that step's events) joined
  * to the accumulated funnel on the entity key — k−1 equi-joins all on
  * the SAME key, so one hash partitioning of the per-user funnel serves
  * the whole chain, and each join's build side is the per-entity funnel
  * (≤ one row per entity that reached the previous stage). No window over
  * the event stream, no per-entity event sorting; the conditional min is
  * a map-side partial aggregate.
  */
object Funnel {

  /** One row per entity that completed step 1, with columns
    * `ts_1 .. ts_k` (epoch-µs long; NULL once a stage was not reached).
    * `tsCol` must be a long (epoch-µs — callers on nano sources divide
    * first; µs is the cross-engine-safe domain, see q49/q65).
    */
  def firstCompletion(
      events: DataFrame, entityCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "firstCompletion: empty step list")
    // output/helper columns must not silently clobber caller columns
    (Seq("__ts") ++ steps.indices.map(i => s"ts_${i + 1}")).foreach { c =>
      require(!events.columns.contains(c), s"input already carries a `$c` column")
    }
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("ts_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      // first step-(i+1) event after the accumulated stage-i timestamp:
      // conditional min over the joined (event, funnel-row) pairs
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(entityCol), col(tsCol).as("__ts"))
      acc.join(stepEvents, Seq(entityCol), "left")
        .groupBy(col(entityCol) +: (1 to i).map(j => col(s"ts_$j")): _*)
        .agg(min(when(col("__ts") > col(s"ts_$i"), col("__ts"))).as(s"ts_${i + 1}"))
    }
  }
}
