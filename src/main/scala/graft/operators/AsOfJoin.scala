package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join composed from built-ins (preference (a) of the custom-operator
  * ladder: Spark's union + ordered-window `last(ignoreNulls)` expresses the
  * semantics exactly, so no custom LogicalPlan/Strategy is warranted):
  * for each left row, the most recent right value with
  * `right.time <= left.time` within the same key.
  *
  * Physical shape: ONE shuffle on the key (both sides co-partitioned by the
  * union), one intra-partition sort — the sort-merge as-of. At 100 TB this
  * is the same cost as any keyed window; no per-row lookups, no broadcast
  * of the time series.
  */
object AsOfJoin {

  /** Left rows gain `asof_<valueCol>` = last right `valueCol` at or before
    * the left row's `timeCol` (per `keyCol`); null when no prior right row.
    * Right rows at the SAME timestamp as a left row are visible to it
    * (<= semantics, matching SQL ASOF JOIN).
    */
  def lastPriorValue(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__isright", lit(0))
    val r = right.select(
      col(keyCol), col(timeCol).as(timeCol),
      col(valueCol).as("__rv"), lit(1).as("__isright"))
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select((leftCols.map(col) :+ col("__rv") :+ col("__isright")): _*)
    val unioned = l.select((leftCols.map(col) :+ col("__rv") :+ col("__isright")): _*)
      .unionByName(rAligned)
    // right rows sort BEFORE left rows at equal time -> <= visibility
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__isright").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__isright") === 0)
      .drop("__rv", "__isright")
  }
}
