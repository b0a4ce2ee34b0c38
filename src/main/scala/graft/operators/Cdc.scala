package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the lakehouse MERGE primitive next to the
  * engine's SCD2 (q124) and IVM refresh (q176): an upsert/delete log
  * collapses to final per-key state by latest-wins under a total (seq,
  * tiebreak) order, and a delta batch merges into a base snapshot with
  * every action classified (insert / update / delete / carry) so the
  * commit is auditable before it lands.
  *
  * Scale: both steps are one window + one key-partitioned join — state
  * per key is O(1), the log shuffles once on the key, and the merge
  * never rescans history (the delta joins the SNAPSHOT, not the base
  * log — q176's merge-of-partials discipline).
  */
object Cdc {

  /** Final state per key from an op log: keeps each key's last row by
    * (seq, tiebreak) DESC. Input needs columns: key, seq, tiebreak, op
    * ('U'/'D'), val. Output: (key, op, val, n_ops) — tombstones ('D')
    * are RETAINED so callers can audit deletes; filter them for the
    * live view.
    */
  def latestWins(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("seq").desc, col("tiebreak").desc)
    log
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("__rn") === 1)
      .select(col("key"), col("op"), col("val"), col("n_ops"))
  }

  /** Merge a delta op log into a base op log's snapshot, classifying every
    * key's outcome: 'carry' (no delta), 'insert' (delta upsert, key absent
    * from the live base), 'update' (delta upsert over a live base row),
    * 'delete' (delta tombstone over a live base row), 'noop_delete'
    * (delta tombstone for a key that was not live). Output:
    * (key, action, live_val, n_base_ops, n_delta_ops) where live_val is
    * NULL unless the key survives the merge.
    */
  def mergeClassify(baseLog: DataFrame, deltaLog: DataFrame): DataFrame = {
    val base = latestWins(baseLog)
      .filter(col("op") === "U") // live snapshot: tombstoned keys are gone
      .select(col("key"), col("val").as("base_val"),
        col("n_ops").as("n_base_ops"))
    val delta = latestWins(deltaLog)
      .select(col("key"), col("op").as("d_op"), col("val").as("d_val"),
        col("n_ops").as("n_delta_ops"))
    base.join(delta, Seq("key"), "full_outer")
      .select(col("key"),
        // key-absence is judged on n_base_ops (never NULL for a live base
        // row), not on the value column, which a caller may legally NULL
        when(col("d_op").isNull, lit("carry"))
          .when(col("d_op") === "U" && col("n_base_ops").isNull, lit("insert"))
          .when(col("d_op") === "U", lit("update"))
          .when(col("n_base_ops").isNotNull, lit("delete"))
          .otherwise(lit("noop_delete")).as("action"),
        when(col("d_op") === "U", col("d_val"))
          .when(col("d_op").isNull, col("base_val"))
          .otherwise(lit(null).cast("long")).as("live_val"),
        coalesce(col("n_base_ops"), lit(0L)).as("n_base_ops"),
        coalesce(col("n_delta_ops"), lit(0L)).as("n_delta_ops"))
  }
}
