package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CountMinAgg, IntervalJoin}

/** Count-Min sketch: mergeability (partition-count invariance), one-sided
  * error against exact counts, and equality with the relationally-built
  * counter table. Interval join: exact pair parity with a nested-loop
  * reference over randomized corpora, plus the no-nested-loop plan pin.
  */
class CmsIntervalSpec extends AnyFunSuite {

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

  private val depth = 4
  private val width = 32

  private def sketchOf(words: Seq[String], partitions: Int): Seq[Long] = {
    import spark.implicits._
    val cms = udaf(new CountMinAgg(depth, width),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    words.toDF("w").repartition(partitions)
      .select(CountMinAgg.bucketsCol(col("w"), depth, width).as("bs"))
      .agg(cms(col("bs")).as("sk"))
      .collect()(0).getSeq[Long](0).toSeq
  }

  test("CMS is partition-invariant (mergeable) and equals the relational counter table") {
    val words = (0 until 500).map(i => s"tok${i % 37}") ++ Seq.fill(100)("hot")
    val one = sketchOf(words, 1)
    assert(sketchOf(words, 4) == one)
    assert(sketchOf(words, 7) == one)
    // relational rebuild: counter[j][b] = total occurrences hashing there
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val table = Array.fill(depth * width)(0L)
    exact.foreach { case (w, c) =>
      (0 until depth).foreach { j =>
        val b = (graft.functions.HashFunctions.stableHash64(s"cms$j:$w") % width).toInt
        table(j * width + b) += c
      }
    }
    assert(one == table.toSeq)
    assert(one.sum == depth.toLong * words.size)
  }

  test("CMS estimates are one-sided: est >= exact count for every key") {
    import spark.implicits._
    val words = (0 until 800).map(i => s"k${i % 61}")
    val sk = sketchOf(words, 4)
    val skDf = Seq(sk).toDF("sketch")
    val got = words.toDF("w").groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(skDf))
      .select(col("w"), col("cnt"),
        CountMinAgg.estimateCol(col("w"), col("sketch"), depth, width).as("est"))
      .collect()
    assert(got.length == 61)
    got.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"${r.getString(0)}: est ${r.getLong(2)} < cnt ${r.getLong(1)}"))
  }

  test("interval join matches the nested-loop reference over random corpora, one row per matching pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    (0 until 5).foreach { round =>
      val b = 100L
      // rounds 3-4 use a NEGATIVE-straddling domain: `div` truncates toward
      // zero (not floor), but it does so monotonically and identically on
      // the point and interval sides, so bucketing stays consistent — the
      // zero-straddling "double bucket" contains exactly the points whose
      // intervals also map there
      val shift = if (round >= 3) 2500L else 0L
      val points = (0 until 300).map(i => (i.toLong, rnd.nextLong(5000L) - shift))
      val intervals = (0 until 40).map { i =>
        val lo = rnd.nextLong(4800L) - shift
        // lengths from sub-bucket to several buckets, incl. length 1
        (i.toLong, lo, lo + 1 + rnd.nextLong(400L))
      }
      val got = IntervalJoin.joinPointsToIntervals(
          points.toDF("pid", "pt"), "pt",
          intervals.toDF("iid", "lo", "hi"), "lo", "hi", b)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = for {
        (pid, pt) <- points
        (iid, lo, hi) <- intervals
        if pt >= lo && pt < hi
      } yield (pid, iid)
      assert(got.sorted == want.sorted) // exact multiset: no dups, no misses
    }
  }

  test("streaming CMS equals the batch sketch after every random micro-batch split") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(42L)
    val words = (0 until 400).map(i => s"s${i % 23}")
    val batch = sketchOf(words, 3)
    (0 until 3).foreach { _ =>
      val cut = 1 + rnd.nextInt(words.length - 1)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val snaps = graft.streaming.StatefulOps.runningFrequencySketch(
        input.toDF().toDF("w")
          .select(lit("all").as("k"),
            CountMinAgg.bucketsCol(col("w"), depth, width).as("bs"))
          .as[(String, Seq[Int])],
        depth, width)
      val q = snaps.writeStream.format("memory").queryName("cms_run")
        .outputMode("update").start()
      try {
        input.addData(words.take(cut): _*); q.processAllAvailable()
        input.addData(words.drop(cut): _*); q.processAllAvailable()
        val last = spark.table("cms_run")
          .orderBy(col("n_items").desc).limit(1).collect()(0)
        assert(last.getLong(1) == words.length.toLong)
        assert(last.getSeq[Long](2).toSeq == batch)
      } finally q.stop()
    }
  }

  test("streaming HLL registers equal the batch sketch after every random split — even with replayed rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val p = 4
    val rnd = new scala.util.Random(99L)
    val words = (0 until 300).map(i => s"h${i % 41}")
    def rowOf(w: String): (String, Int, Int) = {
      val h = graft.functions.HashFunctions.stableHash64(s"hll:$w")
      val v = h >> p
      val low = v & -v
      val rank = math.min(java.lang.Long.bitCount(low - 1), 47) + 1
      ("all", (h % (1 << p)).toInt, rank)
    }
    // batch reference registers
    val batch = {
      val agg = new graft.operators.HllAgg(p)
      words.map(rowOf).foldLeft(agg.zero) { case (b, (_, bk, r)) => agg.reduce(b, (bk, r)) }.toSeq
    }
    (0 until 3).foreach { round =>
      val cut = 1 + rnd.nextInt(words.length - 1)
      // replay a slice of batch 1 inside batch 2: idempotent max must absorb it
      val b1 = words.take(cut)
      val b2 = (if (round == 2) b1.takeRight(math.min(10, b1.length)) else Nil) ++ words.drop(cut)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val snaps = graft.streaming.StatefulOps.runningDistinctRegisters(
        input.toDF().toDF("w").as[String].map(rowOf), p)
      val q = snaps.writeStream.format("memory").queryName("hll_run")
        .outputMode("update").start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
        val last = spark.table("hll_run")
          .orderBy(col("n_items").desc).limit(1).collect()(0)
        assert(last.getLong(1) == (b1.length + b2.length).toLong)
        assert(last.getSeq[Int](2).toSeq == batch, s"round=$round")
      } finally q.stop()
    }
  }

  test("streaming top-k buffer equals the batch top-k after every random split and shuffle") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(42L)
    val rows = (0 until 200).map(i => ("g" + (i % 3), rnd.nextLong(40L), i.toLong))
    val agg = new graft.operators.TopKAgg(5)
    def batchTop(key: String): List[(Long, Long)] =
      rows.filter(_._1 == key).foldLeft(agg.zero) { case (b, (_, v, id)) =>
        agg.reduce(b, (v, id)) }
    (0 until 3).foreach { round =>
      val shuffled = rnd.shuffle(rows)
      val cut = 1 + rnd.nextInt(rows.length - 1)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StatefulOps.runningTopK(
          input.toDF().as[(String, Long, Long)], k = 5)
        .writeStream.format("memory").queryName(s"topk_run_$round")
        .outputMode("update").start()
      try {
        input.addData(shuffled.take(cut): _*); q.processAllAvailable()
        input.addData(shuffled.drop(cut): _*); q.processAllAvailable()
        // order-independent latest-snapshot pick: sort-then-dropDuplicates
        // does NOT guarantee keeping the first row of a preceding sort
        val last = spark.table(s"topk_run_$round")
          .groupBy(col("key"))
          .agg(org.apache.spark.sql.functions
            .max_by(struct(col("n_items"), col("top")), col("n_items")).as("s"))
          .select(col("key"), col("s.n_items"), col("s.top")).collect()
        last.foreach { r =>
          val key = r.getString(0)
          val got = r.getSeq[org.apache.spark.sql.Row](2)
            .map(t => (t.getLong(0), t.getLong(1))).toList
          assert(got == batchTop(key), s"round=$round key=$key")
        }
      } finally q.stop()
    }
  }

  test("streaming KMV sketch equals the batch sketch after every random split — replay absorbed by set semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(59L)
    val k = 12
    val rows = (0 until 600).map { i =>
      val key = "g" + (i % 3)
      (key, graft.functions.HashFunctions.stableHash64(s"kmv:${rnd.nextInt(150)}"))
    }
    val agg = new graft.operators.KmvSketchAgg(k)
    def batchOf(key: String): Seq[Long] =
      rows.filter(_._1 == key).map(_._2).foldLeft(agg.zero)(agg.reduce).toSeq
    (0 until 3).foreach { round =>
      val shuffled = rnd.shuffle(rows)
      val cut = 1 + rnd.nextInt(shuffled.size - 1)
      val b1 = shuffled.take(cut)
      // replay a slice of batch 1 inside batch 2 — KMV dedups on insert
      val b2 = (if (round == 2) b1.takeRight(math.min(15, b1.size)) else Nil) ++
        shuffled.drop(cut)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long)]
      val q = graft.streaming.StatefulOps.runningKmv(input.toDS(), k)
        .writeStream.format("memory").queryName(s"kmv_run_$round")
        .outputMode("update").start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
        val last = spark.table(s"kmv_run_$round")
          .groupBy(col("key"))
          .agg(org.apache.spark.sql.functions
            .max_by(struct(col("n_items"), col("sketch")), col("n_items")).as("s"))
          .select(col("key"), col("s.sketch")).collect()
        last.foreach { r =>
          assert(r.getSeq[Long](1) == batchOf(r.getString(0)),
            s"round=$round key=${r.getString(0)}")
        }
      } finally q.stop()
    }
  }

  test("keyed interval join equals the per-key nested-loop reference; keys ride the bucket shuffle") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val points = (0 until 400).map(i =>
      (i.toLong, rnd.nextLong(5L), rnd.nextLong(2000L) - 1000L)).toDF("pid", "k", "pt")
    val ivs = (0 until 120).map { i =>
      val lo = rnd.nextLong(2000L) - 1000L
      (i.toLong, rnd.nextLong(5L), lo, lo + rnd.nextLong(300L))
    }.toDF("iid", "k", "lo", "hi")
    val got = graft.operators.IntervalJoin.joinPointsToIntervals(
        points, "pt", ivs, "lo", "hi", bucketSize = 128L, keyCols = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ptRows = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ivRows = ivs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (for {
      (pid, pk, pt) <- ptRows
      (iid, ik, lo, hi) <- ivRows
      if pk == ik && pt >= lo && pt < hi
    } yield (pid, iid)).toSet
    assert(got == want)
  }

  test("RangeJoinRewrite: a BETWEEN theta-join plans bucketed with identical results; gated off by default") {
    import spark.implicits._
    val points = (0 until 300).map(i => (i.toLong, (i * 37 % 5000).toLong)).toDF("pid", "pt")
    val intervals = (0 until 30).map { i =>
      val lo = (i * 161 % 4500).toLong; (i.toLong, lo, lo + 350L)
    }.toDF("iid", "lo", "hi")
    def theta() = points.join(intervals,
      col("pt") >= col("lo") && col("pt") < col("hi"))
    val want = theta().select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // without the rule: Catalyst has no equi key — nested loop
    assert(theta().queryExecution.executedPlan.toString.contains("NestedLoop"))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new graft.plans.RangeJoinRewrite
    try {
      // rule present but gated off: plan unchanged
      assert(theta().queryExecution.executedPlan.toString.contains("NestedLoop"))
      spark.conf.set("spark.graft.intervalJoin.bucketSize", "400")
      val plan = theta().queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(plan.contains("Generate"), plan) // exploded interval buckets
      val got = theta().select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want) // exact multiset — refine kept, no bucket dups
      // an equi-keyed join is NOT touched (it already hash-joins)
      val equi = points.join(intervals, col("pt") === col("lo"))
        .queryExecution.executedPlan.toString
      assert(!equi.contains("Generate"), equi)
    } finally {
      spark.conf.unset("spark.graft.intervalJoin.bucketSize")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("q96 plans without a nested loop — the rewrite fires under its gate inside the query") {
    val df = SparkEntry.queries("q96_range_join_rewrite")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("Generate"), plan)
  }

  test("inverted intervals (hi <= lo) produce zero rows AND zero bucket rows in both forms") {
    import spark.implicits._
    val points = (0 until 50).map(i => (i.toLong, i.toLong * 10)).toDF("pid", "pt")
    // one good interval + two bad ones: empty (hi == lo) and wildly
    // inverted (hi far below lo — unguarded, this alone would explode
    // into ~40 spurious descending bucket rows)
    val intervals = Seq((1L, 100L, 200L), (2L, 300L, 300L), (3L, 4000L, 0L))
      .toDF("iid", "lo", "hi")
    val joined = IntervalJoin.joinPointsToIntervals(
      points, "pt", intervals, "lo", "hi", 100L)
    assert(joined.select(col("iid")).collect().map(_.getLong(0)).toSeq.distinct
      == Seq(1L))
    // the guard kills the bad covers BEFORE the shuffle: count the
    // exploded interval-side rows the same way the operator builds them
    val cover = intervals.withColumn("c",
      explode(when(col("hi") > col("lo"),
        sequence(expr("lo div 100"), expr("(hi - 1) div 100")))))
    assert(cover.count() == 1L) // only interval 1's single bucket survives
    // the optimizer-rule form inherits the guard: same three intervals
    // through the rewritten theta-join give the same (non-exploding) rows
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new graft.plans.RangeJoinRewrite
    spark.conf.set("spark.graft.intervalJoin.bucketSize", "100")
    try {
      val theta = points.join(intervals,
        col("pt") >= col("lo") && col("pt") < col("hi"))
      assert(!theta.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(theta.select(col("iid")).collect().map(_.getLong(0)).toSeq.distinct
        == Seq(1L))
    } finally {
      spark.conf.unset("spark.graft.intervalJoin.bucketSize")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("interval join refuses inputs that already carry the internal bucket column") {
    import spark.implicits._
    val points = Seq((0L, 5L)).toDF("pid", "pt").withColumn("__graft_bkt", lit(1))
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.joinPointsToIntervals(points, "pt", intervals, "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("__graft_bkt"))
  }

  test("auto bucket size: median of valid interval lengths; bucketSize=0 joins identically to any explicit choice") {
    import spark.implicits._
    // lengths 10, 20, 30, plus an inverted interval that must not vote
    val intervals = Seq(
      (1L, 100L, 110L), (2L, 200L, 220L), (3L, 300L, 330L), (4L, 50L, 40L))
      .toDF("iid", "lo", "hi")
    assert(IntervalJoin.estimateBucketSize(intervals, "lo", "hi") == 20L)
    // no valid interval -> 1 (vacuous: the join is empty anyway)
    assert(IntervalJoin.estimateBucketSize(
      Seq((1L, 10L, 10L)).toDF("iid", "lo", "hi"), "lo", "hi") == 1L)
    // parity on a random zero-straddling corpus: auto == explicit == naive
    val rnd = new scala.util.Random(42L)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextLong() % 500L)).toDF("pid", "pt")
    val ivs = (0 until 60).map { i =>
      val lo = rnd.nextLong() % 400L
      (i.toLong, lo, lo + rnd.nextInt(80) - 10L) // some inverted/empty
    }.toDF("iid", "lo", "hi")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val auto = rows(IntervalJoin.joinPointsToIntervals(pts, "pt", ivs, "lo", "hi", 0L))
    assert(auto == rows(IntervalJoin.joinPointsToIntervals(pts, "pt", ivs, "lo", "hi", 7L)))
    assert(auto == rows(pts.join(ivs, col("pt") >= col("lo") && col("pt") < col("hi"))))
  }

  test("interval join boundary semantics are half-open and the plan has no nested loop") {
    import spark.implicits._
    val points = Seq((0L, 99L), (1L, 100L), (2L, 199L), (3L, 200L)).toDF("pid", "pt")
    val intervals = Seq((7L, 100L, 200L)).toDF("iid", "lo", "hi")
    val joined = IntervalJoin.joinPointsToIntervals(
      points, "pt", intervals, "lo", "hi", 50L)
    assert(joined.select(col("pid")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L)) // lo inclusive, hi exclusive
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("streaming weighted sample equals the batch q219 election after random splits, with replays absorbed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(219L)
    val rows = (0 until 240).map(i =>
      ("s" + (i % 3), i.toLong, (rnd.nextInt(900) + 100).toLong))
    (0 until 3).foreach { round =>
      val shuffled = rnd.shuffle(rows)
      val cut = 1 + rnd.nextInt(rows.length - 1)
      val replays = Seq.fill(5)(shuffled(rnd.nextInt(cut))) // redeliveries
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StatefulOps.runningWeightedSample(
          input.toDF().as[(String, Long, Long)], k = 7)
        .writeStream.format("memory").queryName(s"wsamp_run_$round")
        .outputMode("update").start()
      try {
        input.addData(shuffled.take(cut): _*); q.processAllAvailable()
        input.addData((shuffled.drop(cut) ++ replays): _*); q.processAllAvailable()
        val last = spark.table(s"wsamp_run_$round")
          .groupBy(col("stratum"))
          .agg(org.apache.spark.sql.functions
            .max_by(struct(col("n_seen"), col("winners")), col("n_seen")).as("s"))
          .select(col("stratum"), col("s.winners")).collect()
          .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(t => (t.getLong(0), t.getLong(1), t.getLong(2))).toList)
          .toMap
        val want = graft.operators.WeightedSample.perStratum(
            rows.toDF("source", "doc_id", "n_chars"),
            "source", "doc_id", "n_chars", k = 7)
          .select(col("stratum"), col("rank"), col("id"), col("weight"))
          .collect()
          .groupBy(_.getString(0)).view
          .mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
            .sortBy(_._1).toList).toMap
        assert(last == want, s"round=$round")
      } finally q.stop()
    }
  }
}
