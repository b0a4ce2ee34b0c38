package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin #20 — windowed frontier scheduling: emit-at-window-close
  * makes the paced schedule arrival-order-free, so ANY random micro-batch
  * split of the same discoveries must produce the byte-identical schedule
  * q300's batch ranking yields per (domain, window); and closing a window
  * physically removes its state.
  */
class FrontierStreamSpec extends AnyFunSuite {

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

  private val windowMs = 10000L
  private val base = 3600000L

  /** Deterministic fixture: 3 domains × 2 windows × 20 urls; delay by
    * domain, priority a doc_id hash with planted ties broken by doc_id.
    */
  private def fixture(rnd: scala.util.Random): Seq[(String, Long, Long, Long, java.sql.Timestamp)] =
    for {
      d <- 0 until 3
      w <- 0 until 2
      i <- 0 until 20
    } yield {
      val id = (d * 2 + w) * 100L + i
      val delay = Seq(500L, 1000L, 2000L)(d)
      val prio = (id * 37 + 11) % 7 // small range → real ties
      val ts = new java.sql.Timestamp(base + w * windowMs + rnd.nextInt(windowMs.toInt))
      (s"site$d.com", id, prio, delay, ts)
    }

  /** The batch reference: q300's ranking applied per (domain, window). */
  private def reference(rows: Seq[(String, Long, Long, Long, java.sql.Timestamp)])
      : Set[(String, Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(r => (r._1, r._5.getTime / windowMs * windowMs)).flatMap {
      case ((dom, ws), members) =>
        members.sortBy(m => (-m._3, m._2)).zipWithIndex.map { case (m, i) =>
          (dom, ws, m._2, m._3, i + 1L, m._4, i.toLong * m._4)
        }
    }.toSet

  test("any random split + shuffled arrival yields the exact batch schedule; closed windows drop state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 3) {
      val rows = fixture(rnd)
      val want = reference(rows)
      val shuffled = rnd.shuffle(rows)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long, Long, java.sql.Timestamp)]
      // slack (60 s) exceeds the full 20 s timestamp spread, so fully
      // random arrival can never be dropped late (the suite's watermark
      // gotcha); windows then close only when the flush rows advance the
      // watermark past window end
      val q = graft.streaming.StatefulOps.windowedFrontierSchedule(
          input.toDF().toDF("domain", "doc_id", "priority", "delay_ms", "ts"),
          "ts", windowMs, watermarkDelay = "60 seconds")
        .writeStream.format("memory").queryName(s"frontier_$trial")
        .outputMode("append").start()
      try {
        var i = 0
        while (i < shuffled.length) {
          val n = math.min(1 + rnd.nextInt(7), shuffled.length - i)
          input.addData(shuffled.slice(i, i + n): _*)
          q.processAllAvailable()
          i += n
        }
        // nothing may emit before the watermark closes a window
        assert(spark.table(s"frontier_$trial").isEmpty,
          "schedule emitted before window close")
        val open = q.lastProgress.stateOperators(0).numRowsTotal
        assert(open >= 6, s"expected >=6 open windows, state rows=$open")
        // two flush rows far in the future: watermark sweeps past every
        // fixture window end, all six windows emit and drop their state
        input.addData(("flush.com", 9001L, 0L, 1000L,
          new java.sql.Timestamp(base + 500000L)))
        q.processAllAvailable()
        input.addData(("flush.com", 9002L, 0L, 1000L,
          new java.sql.Timestamp(base + 600000L)))
        q.processAllAvailable()
        val got = spark.table(s"frontier_$trial")
          .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
          .filterNot(_._1 == "flush.com") // the flush rows' own window
        assert(got == want,
          s"trial $trial: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
        val after = q.lastProgress.stateOperators(0).numRowsTotal
        assert(after < open,
          s"state did not shrink after close: $after vs $open")
      } finally q.stop()
    }
  }

  test("pacing arithmetic: waves price at (wave-1) x delay with ties broken by doc_id") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      ("d.com", 10L, 5L, 700L, new java.sql.Timestamp(base + 100)),
      ("d.com", 11L, 5L, 700L, new java.sql.Timestamp(base + 200)), // tie: id wins
      ("d.com", 12L, 9L, 700L, new java.sql.Timestamp(base + 300)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, Long, java.sql.Timestamp)]
    val q = graft.streaming.StatefulOps.windowedFrontierSchedule(
        input.toDF().toDF("domain", "doc_id", "priority", "delay_ms", "ts"),
        "ts", windowMs, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("frontier_arith")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(("flush.com", 9L, 0L, 1L,
        new java.sql.Timestamp(base + 300000L)))
      q.processAllAvailable()
      val got = spark.table("frontier_arith")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
        .filter(_._1 == "d.com").sortBy(_._5)
      assert(got.map(r => (r._3, r._5, r._7)).toSeq ==
        Seq((12L, 1L, 0L), (10L, 2L, 700L), (11L, 3L, 1400L)))
    } finally q.stop()
  }
}
