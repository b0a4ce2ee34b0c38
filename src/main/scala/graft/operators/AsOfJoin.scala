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

  /** Left rows gain `asof_<valueCol>` = the `valueCol` of the last right ROW
    * at or before the left row's `timeCol` (per `keyCol`); null when no
    * prior right row. Right rows at the SAME timestamp as a left row are
    * visible to it (<= semantics, matching SQL ASOF JOIN).
    *
    * The window carries a struct wrapping the value — not the bare value —
    * so a matched right row whose value is NULL yields NULL (the SQL ASOF
    * answer, the struct itself being non-null), never an older row's value.
    */
  def lastPriorValue(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, valueCol: String): DataFrame = {
    val outCol = s"asof_$valueCol"
    require(!left.columns.contains(outCol),
      s"left frame already has a column named '$outCol'")
    val leftCols = left.columns
    val rvType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType)))
    val l = left
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__isright", lit(0))
    val r = right.select(
      col(keyCol), col(timeCol).as(timeCol),
      struct(col(valueCol).as("v")).as("__rv"),
      lit(1).as("__isright"))
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
      .withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__isright") === 0)
      .drop("__rv", "__isright")
  }
}
