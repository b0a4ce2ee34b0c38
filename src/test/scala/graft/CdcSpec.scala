package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Closed-form pins for the CDC apply: latest-wins election under the
  * (seq, tiebreak) total order, tombstone retention, and all five merge
  * action classes on an engineered base/delta pair.
  */
class CdcSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  import org.apache.spark.sql.DataFrame
  private def log(rows: (Long, Long, Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "seq", "tiebreak", "op", "val")
  }

  test("latestWins: last op by (seq, tiebreak) desc wins; tombstones retained") {
    import spark.implicits._
    val l = log((1L, 10L, 1L, "U", 100L), (1L, 20L, 1L, "U", 200L),
      (1L, 20L, 2L, "D", 0L), // same seq, higher tiebreak → wins
      (2L, 5L, 1L, "U", 500L))
    val got = Cdc.latestWins(l).select("key", "op", "val", "n_ops")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "D", 0L, 3L), (2L, "U", 500L, 1L)))
  }

  test("mergeClassify: all five actions, with live_val following the winner") {
    import spark.implicits._
    val base = log(
      (1L, 1L, 1L, "U", 11L),             // carried (no delta)
      (2L, 1L, 1L, "U", 22L),             // updated by delta
      (3L, 1L, 1L, "U", 33L),             // deleted by delta
      (4L, 1L, 1L, "U", 44L), (4L, 2L, 1L, "D", 0L)) // dead in base
    val delta = log(
      (2L, 9L, 1L, "U", 220L),
      (3L, 9L, 1L, "D", 0L),
      (4L, 9L, 1L, "D", 0L),              // noop_delete: not live in base
      (5L, 9L, 1L, "U", 550L))            // insert
    val got = Cdc.mergeClassify(base, delta)
      .select("key", "action", "live_val", "n_base_ops", "n_delta_ops")
      .as[(Long, String, Option[Long], Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "carry", Some(11L), 1L, 0L),
      (2L, "update", Some(220L), 1L, 1L),
      (3L, "delete", None, 1L, 1L),
      (4L, "noop_delete", None, 0L, 1L),
      (5L, "insert", Some(550L), 0L, 1L)))
  }
}
