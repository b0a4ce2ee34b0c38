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
  test("streaming CDC state equals batch latestWins over 100 random streams with replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{max_by, struct}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(218L)
    val all = scala.collection.mutable.Buffer.empty[(Long, Long, Long, String, Long)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String, Long)]
    val q = graft.streaming.StatefulOps.runningCdcState(input.toDS())
      .writeStream.format("memory").queryName("cdc_prop")
      .outputMode("update").start()
    try {
      var opId = 0L
      for (_ <- 0 until 100) {
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          opId += 1
          // seq = opId/2 manufactures seq TIES so the tiebreak is exercised
          (rnd.nextInt(8).toLong, opId / 2, opId,
            if (rnd.nextInt(4) == 0) "D" else "U", rnd.nextInt(1000).toLong)
        }
        val replay = if (all.nonEmpty)
          Seq.fill(rnd.nextInt(3))(all(rnd.nextInt(all.size)))
        else Seq.empty
        all ++= rows
        val batch = rnd.shuffle(rows ++ replay)
        if (batch.nonEmpty) { input.addData(batch: _*); q.processAllAvailable() }
      }
      // latest snapshot per key (n_ops only grows)
      val got = spark.table("cdc_prop").groupBy($"key")
        .agg(max_by(struct($"op", $"value", $"n_ops"), $"n_ops").as("s"))
        .select($"key", $"s.*")
        .as[(Long, String, Long, Long)].collect().toSet
      val want = Cdc.latestWins(
          all.toSeq.toDF("key", "seq", "tiebreak", "op", "val"))
        .select("key", "op", "val", "n_ops")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want,
        s"stream-only=${(got -- want).take(4)} batch-only=${(want -- got).take(4)}")
    } finally q.stop()
  }

  test("streaming join view equals the batch join view over 100 random splits (q252's identity, incremental)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{max_by, struct}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(252L)
    val dim = (0L until 12L).map(k => k -> s"nation_${k % 5}").toMap
    val all = scala.collection.mutable.Buffer.empty[(Long, Long)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = graft.streaming.StatefulOps.runningJoinView(input.toDS(), dim)
      .writeStream.format("memory").queryName("jv_prop")
      .outputMode("update").start()
    try {
      for (_ <- 0 until 100) {
        val rows = (0 until rnd.nextInt(5)).map { _ =>
          // fk 13 has no dim row → must land in "unknown", never drop
          (rnd.nextInt(14).toLong, (rnd.nextInt(9999) + 1).toLong)
        }
        all ++= rows
        if (rows.nonEmpty) { input.addData(rows: _*); q.processAllAvailable() }
      }
      val got = spark.table("jv_prop").groupBy($"n_name")
        .agg(max_by(struct($"n_orders", $"total_cents"), $"n_orders").as("s"))
        .select($"n_name", $"s.*")
        .as[(String, Long, Long)].collect().toSet
      val want = all.toSeq
        .groupBy(r => dim.getOrElse(r._1, "unknown"))
        .map { case (k, rs) => (k, rs.size.toLong, rs.map(_._2).sum) }.toSet
      assert(got == want, s"got=$got want=$want")
      assert(got.exists(_._1 == "unknown"), "fk 13 must surface as unknown")
    } finally q.stop()
  }
}
