package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Boilerplate, CompactionPlanner, SweepLine}

/** Round-9 planners/analytics operators.
  *
  *  - SweepLine: the two-level (per-bucket window + carry-in) decomposition
  *    must equal a single-total-order reference sweep on random intervals.
  *  - CompactionPlanner: greedy cumulative-sum bins obey the one-file
  *    guarantee (target − thresh < bin total < target + thresh for
  *    non-final bins) and the summary arithmetic is self-consistent.
  *  - Boilerplate: frequency counts a paragraph once per document, but the
  *    strip removes every instance — first occurrences included (the exact
  *    semantic [[graft.operators.ParagraphDedup]] does NOT have).
  */
class PlannersSpec extends AnyFunSuite {

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

  // ---------------------------------------------------------------- sweep

  test("SweepLine.peakPerBucket equals a global reference sweep on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val width = 100L
    val intervals = (0 until 400).map { i =>
      val st = rnd.nextInt(2000).toLong
      (i.toLong, st, st + rnd.nextInt(500).toLong)
    }
    val df = intervals.toDF("id", "st", "en").repartition(7)
    val got = SweepLine.peakPerBucket(df, "st", "en", width)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    // reference: one global order, peer-inclusive prefix per (ts, delta)
    val pts = intervals.flatMap { case (_, st, en) => Seq((st, 1L), (en, -1L)) }
    val groups = pts.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case ((ts, d), _) => (ts, d) }
    var running = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    groups.foreach { case ((ts, d), n) =>
      running += d * n
      val b = ts / width
      peaks(b) = math.max(peaks.getOrElse(b, Long.MinValue), running)
    }
    val starts = pts.filter(_._2 == 1L).groupBy(_._1 / width).view.mapValues(_.size.toLong).toMap
    val ends = pts.filter(_._2 == -1L).groupBy(_._1 / width).view.mapValues(_.size.toLong).toMap

    assert(got.keySet == peaks.keySet)
    got.foreach { case (b, (ns, ne, pk)) =>
      assert(pk == peaks(b), s"bucket $b peak")
      assert(ns == starts.getOrElse(b, 0L), s"bucket $b starts")
      assert(ne == ends.getOrElse(b, 0L), s"bucket $b ends")
    }
  }

  test("SweepLine level-1 window partitions by bucket (parallel), not a single global sort") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i.toLong * 37 % 5000, i.toLong * 37 % 5000 + 100))
      .toDF("id", "st", "en")
    val plan = SweepLine.peakPerBucket(df, "st", "en", 1000L)
      .queryExecution.executedPlan.toString
    // the endpoint-stream window must hash-partition on the bucket key;
    // only the bucket AGGREGATE (rows = #buckets) may single-partition
    assert(plan.contains("Exchange hashpartitioning(bucket"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("SweepLine: end-before-start at the same instant never double-counts") {
    import spark.implicits._
    // [0,10] ends exactly when [10,20] starts: peak must stay 1
    val df = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("id", "st", "en")
    val peaks = SweepLine.peakPerBucket(df, "st", "en", 1000L).collect()
    assert(peaks.length == 1 && peaks(0).getLong(3) == 1L)
  }

  // ----------------------------------------------------------- compaction

  test("CompactionPlanner: bin totals within one file of target; summary self-consistent") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val target = 1000L
    val thresh = 300L
    val manifest = (0 until 300).map { i =>
      (s"g${i % 3}", i.toLong, (20 + rnd.nextInt(500)).toLong)
    }.toDF("grp", "file_id", "bytes").repartition(5)

    val bins = CompactionPlanner.assignBins(
      manifest, "grp", "file_id", "bytes", target, thresh).collect()
    // large files never bin; small files always do
    bins.foreach { r =>
      val small = r.getAs[Long]("bytes") < thresh
      assert(small == !r.isNullAt(r.fieldIndex("bin")))
    }
    val byGroup = bins.filter(r => !r.isNullAt(r.fieldIndex("bin")))
      .groupBy(_.getString(0)).view.mapValues { rows =>
        rows.groupBy(_.getAs[Long]("bin")).view
          .mapValues(_.map(_.getAs[Long]("bytes")).sum).toMap
      }.toMap
    byGroup.foreach { case (g, totals) =>
      val maxBin = totals.keys.max
      assert(totals.keySet == (0L to maxBin).toSet, s"$g bins contiguous")
      totals.foreach { case (b, tot) =>
        assert(tot < target + thresh, s"$g bin $b overfull")
        if (b < maxBin) assert(tot > target - thresh, s"$g bin $b underfull")
      }
    }

    val sums = CompactionPlanner.planSummary(
      manifest, "grp", "file_id", "bytes", target, thresh).collect()
    sums.foreach { r =>
      assert(r.getAs[Long]("files_after") ==
        r.getAs[Long]("files_before") - r.getAs[Long]("n_small") + r.getAs[Long]("n_bins"))
      assert(r.getAs[Long]("small_bytes") ==
        byGroup(r.getString(0)).values.sum)
    }
  }

  // ------------------------------------------------------- streaming sweep

  test("streaming sweep-line snapshots + batch carry equal the batch peaks over 100 random streams with replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(192L)
    val width = 100L
    val all = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.StatefulOps.runningConcurrency(input.toDS())
      .writeStream.format("memory").queryName("conc_prop")
      .outputMode("update").start()
    try {
      var id = 0L
      for (_ <- 0 until 100) {
        val ivs = (0 until 1 + rnd.nextInt(3)).map { _ =>
          id += 1
          val st = rnd.nextInt(3000).toLong
          (id, st, st + rnd.nextInt(400).toLong)
        }
        val replay = if (all.nonEmpty)
          Seq.fill(rnd.nextInt(3))(all(rnd.nextInt(all.size)))
        else Seq.empty
        all ++= ivs
        val eps = rnd.shuffle((ivs ++ replay).flatMap { case (i, st, en) =>
          Seq((st / width, st, 1L, i), (en / width, en, -1L, i)) })
        if (eps.nonEmpty) { input.addData(eps: _*); q.processAllAvailable() }
      }
      // latest snapshot per bucket (endpoint count only grows)
      val snaps = spark.table("conc_prop")
        .groupBy($"bucket")
        .agg(max_by(struct($"n_starts", $"n_ends", $"local_peak", $"bucket_delta"),
          $"n_starts" + $"n_ends").as("s"))
        .select($"bucket", $"s.*")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // level 2 exactly as the batch operator: carry-in over the tiny
      // bucket table, read batch-side off the snapshot store
      var carry = 0L
      val gotPeaks = snaps.keys.toSeq.sorted.map { b =>
        val (ns, ne, lp, bd) = snaps(b)
        val out = b -> (ns, ne, carry + lp)
        carry += bd
        out
      }.toMap
      val want = graft.operators.SweepLine
        .peakPerBucket(all.toSeq.toDF("id", "st", "en"), "st", "en", width)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(gotPeaks == want,
        s"stream-only=${(gotPeaks.toSet -- want.toSet).take(3)} " +
          s"batch-only=${(want.toSet -- gotPeaks.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming grouped quantiles equal the batch two-histogram operator over 100 random streams with replays") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(207L)
    val probs4 = Seq(2500L, 5000L, 9000L, 9900L)
    val groups = Seq("en", "fr", "de")
    val all = scala.collection.mutable.Buffer.empty[(String, Long, Long)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StatefulOps
      .runningGroupedQuantiles(input.toDS(), probs4)
      .writeStream.format("memory").queryName("gq_prop")
      .outputMode("update").start()
    try {
      var id = 0L
      for (_ <- 0 until 100) {
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          id += 1
          (groups(rnd.nextInt(groups.size)), id, rnd.nextInt(500).toLong)
        }
        val replay = if (all.nonEmpty)
          Seq.fill(rnd.nextInt(3))(all(rnd.nextInt(all.size)))
        else Seq.empty
        all ++= rows
        val batch = rnd.shuffle(rows ++ replay)
        if (batch.nonEmpty) { input.addData(batch: _*); q.processAllAvailable() }
      }
      // latest snapshot per group (n only grows)
      val got = spark.table("gq_prop")
        .groupBy($"g")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n", $"quantiles"), $"n").as("s"))
        .select($"g", $"s.quantiles")
        .as[(String, Seq[(Long, Long, Long)])]
        .collect()
        .flatMap { case (g, qs) => qs.map { case (p4, rank, v) => (g, p4, rank, v) } }
        .toSet
      val want = graft.operators.ExactQuantiles
        .groupedQuantiles(all.toSeq.toDF("g", "id", "v"), "g", "v", probs4)
        .collect()
        .map(r => (r.getString(0), math.round(r.getDouble(1) * 10000.0),
          r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want,
        s"stream-only=${(got -- want).take(4)} batch-only=${(want -- got).take(4)}")
    } finally q.stop()
  }

  test("streaming watermark-lag snapshots + batch type rollup equal the batch census over 100 random streams with replays and id inversions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(234L)
    val types = Seq("click", "view", "purchase")
    // (user_id, event_id, tsu, type)
    val all = scala.collection.mutable.Buffer.empty[(Long, Long, Long, String)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    val q = graft.streaming.StatefulOps.runningWatermarkLag(input.toDS())
      .writeStream.format("memory").queryName("wml_prop")
      .outputMode("update").start()
    try {
      var id = 0L
      for (_ <- 0 until 100) {
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          id += 1
          // timestamps wander so prior-max inversions are common; ARRIVAL
          // order is shuffled so low event ids can land after high ones
          (1L + rnd.nextInt(5), id, 3600000000L + rnd.nextInt(5000).toLong,
            types(rnd.nextInt(types.size)))
        }
        val replay = if (all.nonEmpty)
          Seq.fill(rnd.nextInt(3))(all(rnd.nextInt(all.size)))
        else Seq.empty
        all ++= rows
        val batch = rnd.shuffle(rows ++ replay)
        if (batch.nonEmpty) { input.addData(batch: _*); q.processAllAvailable() }
      }
      // latest snapshot per user (n_events only grows), then the
      // batch-side event-type rollup a dashboard runs over the store
      val got = spark.table("wml_prop")
        .groupBy($"user_id")
        .agg(max_by($"types", $"n_events").as("types"))
        .select(explode($"types").as("t"))
        .select($"t.*")
        .groupBy($"event_type")
        .agg(sum($"n_events").as("n_events"), sum($"n_late").as("n_late"),
          max($"max_late_us").as("max_late_us"),
          sum($"sum_late_us").as("sum_late_us"))
        .select($"event_type", $"n_events", $"n_late",
          expr("n_late * 10000 div n_events").as("late_bps"),
          $"max_late_us", expr("sum_late_us div n_events").as("mean_late_us"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val want = graft.operators.EvalMetrics.watermarkLag(
          all.toSeq.toDF("user_id", "event_id", "tsu", "event_type")
            .select($"event_type", $"user_id", $"event_id",
              ($"tsu" * 1000L).as("ts")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want,
        s"stream-only=${(got -- want).take(3)} batch-only=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("watermark-lag eviction: folding ids below the low-watermark keeps snapshots bit-equal to the batch census under replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(4321L)
    val types = Seq("click", "view", "purchase")
    val all = scala.collection.mutable.Buffer.empty[(Long, Long, Long, String)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    // aggressive eviction: only the last 8 ids stay buffered — ids are
    // globally increasing across batches (the watermark contract), so a
    // fresh arrival can never land under the floor; REPLAYS of folded ids
    // can and must be absorbed by the evictedUpTo guard
    val q = graft.streaming.StatefulOps
      .runningWatermarkLag(input.toDS(), evictBelow = mx => mx - 8)
      .writeStream.format("memory").queryName("wml_evict")
      .outputMode("update").start()
    try {
      var id = 0L
      for (_ <- 0 until 100) {
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          id += 1
          (1L + rnd.nextInt(4), id, 3600000000L + rnd.nextInt(5000).toLong,
            types(rnd.nextInt(types.size)))
        }
        // replay anything ever sent — including long-folded ids
        val replay = if (all.nonEmpty)
          Seq.fill(rnd.nextInt(3))(all(rnd.nextInt(all.size)))
        else Seq.empty
        all ++= rows
        val batch = rnd.shuffle(rows ++ replay)
        if (batch.nonEmpty) { input.addData(batch: _*); q.processAllAvailable() }
      }
      val got = spark.table("wml_evict")
        .groupBy($"user_id")
        .agg(max_by($"types", $"n_events").as("types"))
        .select(explode($"types").as("t"))
        .select($"t.*")
        .groupBy($"event_type")
        .agg(sum($"n_events").as("n_events"), sum($"n_late").as("n_late"),
          max($"max_late_us").as("max_late_us"),
          sum($"sum_late_us").as("sum_late_us"))
        .select($"event_type", $"n_events", $"n_late",
          expr("n_late * 10000 div n_events").as("late_bps"),
          $"max_late_us", expr("sum_late_us div n_events").as("mean_late_us"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val want = graft.operators.EvalMetrics.watermarkLag(
          all.toSeq.toDF("user_id", "event_id", "tsu", "event_type")
            .select($"event_type", $"user_id", $"event_id",
              ($"tsu" * 1000L).as("ts")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want,
        s"stream-only=${(got -- want).take(3)} batch-only=${(want -- got).take(3)}")
    } finally q.stop()
  }

  // ------------------------------------------------------------------ ppr

  test("personalizedRanks equals a hand-unrolled reference; teleport stays on seeds") {
    import spark.implicits._
    // path graph 0-1-2-3-4 plus a far clique {10,11,12} unreachable from 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val got = graft.operators.PageRank.personalizedRanks(
        edges.toDF("id_a", "id_b"), "id_a", "id_b", Seq(0L), iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // reference: same integer arithmetic, adjacency unrolled by hand
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(v => v -> (if (v == 0L) 1000000L else 0L)).toMap
    (0 until 3).foreach { _ =>
      val mass = sym.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rank(src) / deg(src) }.sum).toMap
      rank = deg.keys.map { v =>
        v -> ((if (v == 0L) 150000L else 0L) + 85L * mass.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    assert(got.keySet == deg.keySet)
    got.foreach { case (v, (d, r)) =>
      assert(d == deg(v) && r == rank(v), s"node $v: got ($d,$r) want (${deg(v)},${rank(v)})")
    }
    // the disconnected clique must carry exactly zero walk probability
    Seq(10L, 11L, 12L).foreach(v => assert(got(v)._2 == 0L, s"clique node $v"))
    // walk-distance property: 3 iterations reach exactly 3 hops — node 3
    // carries mass, node 4 (four hops out) exactly none yet
    assert(got(3L)._2 > 0L && got(4L)._2 == 0L)
  }

  // --------------------------------------------------------- assortativity

  test("degreeAssortativity: brute-force parity, star negative, regular graph null") {
    import spark.implicits._
    import graft.operators.GraphMetrics

    def runOn(edges: Seq[(Long, Long)]) =
      GraphMetrics.degreeAssortativity(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect()(0)

    // brute-force Newman r over directed stubs
    def ref(edges: Seq[(Long, Long)]): Option[Long] = {
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val stubs = edges.flatMap { case (a, b) =>
        Seq((deg(a), deg(b)), (deg(b), deg(a))) }
      val m = stubs.size.toLong
      val sx = stubs.map(_._1).sum
      val sxy = stubs.map(s => BigInt(s._1) * s._2).sum
      val sxx = stubs.map(s => BigInt(s._1) * s._1).sum
      val denom = m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      if (denom > 0.0)
        Some(math.floor((m.toDouble * sxy.toDouble - sx.toDouble * sx.toDouble)
          / denom * 1000000.0).toLong)
      else None
    }

    val rnd = new scala.util.Random(99)
    val random = (0 until 150).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val gotR = runOn(random)
    assert(Option(gotR.get(2)).map(_.asInstanceOf[Long]) == ref(random))

    // star: hub degree n, leaves degree 1 — strongly disassortative
    val star = (1L to 20L).map(i => (0L, i))
    val gotStar = runOn(star)
    assert(gotStar.getLong(2) < 0, s"star r6 = ${gotStar.get(2)}")
    assert(Option(gotStar.get(2)).map(_.asInstanceOf[Long]) == ref(star))

    // 4-clique: degree-regular, zero variance -> null r
    val clique = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(runOn(clique).isNullAt(2))
  }

  // ---------------------------------------------------------- skyline neg

  test("Skyline.frontier handles negated (minimize) objectives — widths from the range, not the max") {
    import spark.implicits._
    val rnd = new scala.util.Random(182)
    // all-negative x (the scaladoc's negate-to-minimize usage): the old
    // max-based width was <= 0 here — NULL cells (empty frontier) or a
    // reversed cell order whose wholesale prune dropped true points
    val rows = (0 until 200).map(i =>
      (i.toLong, -(32L + rnd.nextInt(500)), rnd.nextInt(500).toLong))
    val got = graft.operators.Skyline.frontier(
        rows.toDF("id", "x", "y").repartition(5), "x", "y")
      .collect().map(_.getLong(0)).toSet
    val want = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  // ------------------------------------------------------ group quantiles

  test("groupedQuantiles equals per-group sorted nearest-rank for any coarseWidth and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(159)
    val rows = (0 until 3000).map { i =>
      val g = s"g${i % 4}"
      (g, (rnd.nextInt(1000) + (i % 4) * 500).toLong)
    }
    val probs = Seq(2500L, 5000L, 9000L, 9900L)
    val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      probs.map { p4 =>
        val rank = (p4 * sorted.size + 9999) / 10000
        (g, p4, rank, sorted((rank - 1).toInt))
      }
    }.toSet
    for (width <- Seq(1L, 64L, 10000L); parts <- Seq(1, 7)) {
      val got = graft.operators.ExactQuantiles.groupedQuantiles(
          rows.toDF("lang", "v").repartition(parts), "lang", "v", probs, width)
        .collect()
        .map(r => (r.getString(0), math.round(r.getDouble(1) * 10000),
          r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"width=$width parts=$parts")
    }
  }

  // ------------------------------------------------------------------ ks

  test("ksDrift grid decomposition equals a brute-force KS reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // three sources with deliberately different length distributions
    val rows = (0 until 200).map { i =>
      val src = s"s${i % 3}"
      val v = src match {
        case "s0" => 50L + rnd.nextInt(100)
        case "s1" => 100L + rnd.nextInt(100) // shifted: should drift
        case _    => 50L + rnd.nextInt(150)
      }
      (i.toLong, src, v)
    }
    val docs = rows.toDF("doc_id", "source", "n_chars").repartition(5)
    val got = SparkEntry.ksDrift(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap

    val n = rows.size.toLong
    val bySrc = rows.groupBy(_._2)
    got.keySet.foreach { src =>
      val mine = bySrc(src).map(_._3)
      val rest = rows.filterNot(_._2 == src).map(_._3)
      val (n1, n2) = (mine.size.toLong, rest.size.toLong)
      val vals = rows.map(_._3).distinct.sorted
      val maxnum = vals.map { v =>
        math.abs(mine.count(_ <= v) * n2 - rest.count(_ <= v) * n1)
      }.max
      val d4 = maxnum * 10000 / (n1 * n2)
      val crit = math.floor(1.358 * math.sqrt(n.toDouble / (n1.toDouble * n2.toDouble)) * 10000.0).toLong
      assert(got(src) == ((n1, d4, if (d4 > crit) 1 else 0)), s"source $src")
    }
    // the engineered shift must actually flag
    assert(got("s1")._3 == 1, "shifted source should be flagged")
  }

  // ---------------------------------------------------------- boilerplate

  test("Boilerplate: df counts once per doc, strip removes every instance incl. the first") {
    import spark.implicits._
    val banner = "accept all cookies"
    val rows =
      // source A: banner in 10 of 12 docs; doc 0 carries it TWICE
      (0 until 10).flatMap { d =>
        val bannerRows =
          if (d == 0) Seq((d.toLong, "A", banner, 3L), (d.toLong, "A", banner, 3L))
          else Seq((d.toLong, "A", banner, 3L))
        bannerRows :+ ((d.toLong, "A", s"unique content $d", 3L))
      } ++ Seq((10L, "A", "plain doc ten", 3L), (11L, "A", "plain doc eleven", 3L)) ++
      // source B: same banner text but only in 1 of 40 docs — below 5%
      (0 until 40).map(d => (100L + d, "B", if (d == 0) banner else s"b content $d", 3L))
    val pars = rows.toDF("doc", "src", "p", "n_tok").repartition(3)

    val tmpl = Boilerplate.templateHashes(pars, "doc", "src", "p",
      minFrac = 0.05, minDocs = 2L).collect()
    assert(tmpl.length == 1 && tmpl(0).getString(0) == "A")
    assert(tmpl(0).getAs[Long]("df_docs") == 10L) // once per doc, not 11

    val sum = Boilerplate.stripSummary(pars, "doc", "src", "p", "n_tok",
      minFrac = 0.05, minDocs = 2L).collect()
    assert(sum.length == 1 && sum(0).getString(0) == "A")
    assert(sum(0).getAs[Long]("n_template_pars") == 1L)
    assert(sum(0).getAs[Long]("n_docs_affected") == 10L)
    assert(sum(0).getAs[Long]("n_instances_removed") == 11L) // both copies in doc 0
    assert(sum(0).getAs[Long]("n_tokens_removed") == 33L)
  }
}
