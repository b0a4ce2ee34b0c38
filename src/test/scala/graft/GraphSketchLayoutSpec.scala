package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphMetrics, HllAgg, HllSketch, PageRank, SemanticDedup, TopKAgg, ZOrder}

/** Round-7 operators against independent plain-Scala references: the
  * bounded top-k Aggregator vs a sort, HLL registers vs a relational
  * rebuild (plus partition invariance — the mergeability contract), integer
  * PageRank vs a sequential reference, Morton keys vs a bit-twiddling
  * reference (plus the locality property that justifies the operator), and
  * semantic dedup vs brute force. Plan pins: q103 must aggregate, not
  * window-sort.
  */
class GraphSketchLayoutSpec extends AnyFunSuite {

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

  private val enc2 =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()

  test("TopKAgg equals the sorted reference and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 500).map(i => (s"g${i % 7}", rnd.nextLong(50L), i.toLong))
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(3).toList).toMap
    for (parts <- Seq(1, 4, 11)) {
      val topk = udaf(new TopKAgg(3), enc2)
      val got = rows.toDF("g", "key", "id").repartition(parts)
        .groupBy($"g").agg(topk($"key", $"id").as("top"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getLong(1))).toList)
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("q103 plans as a partial aggregate — no Window, no corpus sort before the exchange") {
    val df = SparkEntry.queries("q103_topk_per_group")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    // partial+final placement: the aggregate appears on both sides of the
    // exchange, so each map partition ships <= k pairs per group
    assert("(?s)Aggregate.*Exchange.*Aggregate".r.findFirstIn(plan).isDefined, plan)
  }

  test("HLL registers equal a relational rebuild; estimate is partition-invariant and sane") {
    import spark.implicits._
    val p = 4
    val m = 1 << p
    val rnd = new scala.util.Random(11L)
    val keys = (0 until 3000).map(_ => s"k${rnd.nextInt(700)}")
    val exact = keys.distinct.size
    // reference registers from the same stable hash
    val want = Array.fill(m)(0)
    keys.distinct.foreach { k =>
      val h = graft.functions.HashFunctions.stableHash64(s"hll:$k")
      val bkt = (h % m).toInt
      val v = h >> p
      var r = 0
      while (r < HllSketch.RankCap - 1 && ((v >> r) & 1L) == 0L) r += 1
      val rank = r + 1
      if (rank > want(bkt)) want(bkt) = rank
    }
    var est0: Option[Double] = None
    for (parts <- Seq(1, 4, 9)) {
      val hll = udaf(new HllAgg(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
      val out = keys.toDF("w").repartition(parts)
        .withColumn("h", graft.functions.HashFunctions.stableHash64(
          concat(lit("hll:"), $"w")))
        .withColumn("bkt", HllSketch.bucketCol($"h", p))
        .withColumn("rnk", HllSketch.rankExpr("h", p))
        .agg(hll($"bkt", $"rnk").as("regs"))
        .select($"regs", HllSketch.estimateExpr("regs", p).as("est"))
        .collect()(0)
      assert(out.getSeq[Int](0).toArray.sameElements(want), s"parts=$parts")
      val est = out.getDouble(1)
      est0 = est0.orElse(Some(est))
      assert(est == est0.get, s"estimate not partition-invariant at parts=$parts")
      // m=16 gives ~26% standard error; 3x is a generous non-flaky bound
      assert(math.abs(est - exact) / exact < 0.8, s"est=$est exact=$exact")
    }
  }

  test("HLL register rollup is lossless: element-wise max of group registers equals the combined scan's registers") {
    import spark.implicits._
    val p = 4
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 4000).map(i => (s"g${i % 5}", s"k${rnd.nextInt(900)}"))
    val hll = udaf(new HllAgg(p),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
    def hashed = rows.toDF("g", "w")
      .withColumn("h", graft.functions.HashFunctions.stableHash64(
        concat(lit("hll:"), $"w")))
      .withColumn("bkt", HllSketch.bucketCol($"h", p))
      .withColumn("rnk", HllSketch.rankExpr("h", p))
    val perGroup = hashed.groupBy($"g").agg(hll($"bkt", $"rnk").as("regs"))
    val rolled = HllSketch.rollupRegisters(perGroup, Seq.empty, "regs")
      .collect()(0).getSeq[Int](0)
    val whole = hashed.agg(hll($"bkt", $"rnk").as("regs"))
      .collect()(0).getSeq[Int](0)
    assert(rolled == whole)
    // and a keyed rollup round-trips: rolling up the finest grain by its
    // own keys is the identity
    val idem = HllSketch.rollupRegisters(perGroup, Seq("g"), "regs")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val fine = perGroup.collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(idem == fine)
  }

  test("integer PageRank equals a sequential reference on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    // the operator's contract: one row per UNDIRECTED pair (id_a < id_b)
    val pairs = (0 until 120).map(_ => (rnd.nextLong(40L), rnd.nextLong(40L)))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    // sequential reference with identical integer semantics
    val sym = pairs.flatMap(e => Seq(e, e.swap)).distinct
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 0 until 3) {
      val mass = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = rank.keys.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = PageRank.ranks(pairs.toDF("id_a", "id_b"), "id_a", "id_b", iters = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == rank.keySet)
    got.foreach { case (n, (d, r)) =>
      assert(d == deg(n), s"degree of $n")
      assert(r == rank(n), s"rank of $n")
    }
  }

  test("PageRank early-exit: a converged clique stops before the cap; capped runs stay bit-identical with the probe on") {
    import spark.implicits._
    // K5 clique: perfect symmetry reaches an exact integer fixed point in
    // a round or two — the cap of 30 must NOT be run out
    val clique = (for (a <- 0L until 5L; b <- a + 1 until 5L) yield (a, b))
    val (cliqueRanks, cliqueIters) = PageRank.ranksIterated(
      clique.toDF("id_a", "id_b"), "id_a", "id_b", iters = 30)
    assert(cliqueIters < 30, s"clique ran all $cliqueIters iterations")
    // at the fixed point every node holds the same rank
    assert(cliqueRanks.select($"rank_u").distinct().count() == 1)
    // star graph: center/leaf asymmetry with integer truncation — whether
    // or not the probe fires before the cap, the output must equal a
    // sequential FIXED-count loop (the pre-probe semantics) bit-for-bit
    val star = (1L to 6L).map(l => (0L, l))
    val sym = star.flatMap(e => Seq(e, e.swap))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ref = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 0 until 4) {
      val mass = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / deg(s) }.sum).toMap
      ref = ref.keys.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    val (starRanks, starIters) = PageRank.ranksIterated(
      star.toDF("id_a", "id_b"), "id_a", "id_b", iters = 4)
    assert(starIters <= 4)
    val got = starRanks.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == ref, s"iters=$starIters got=$got ref=$ref")
  }

  test("zone-map skip estimate matches a brute-force reference; z-order prunes a y-only predicate linear layout cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 32x32 uniform grid, 16 files of 64 rows each
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L)
      yield (x * 32 + y, x, y)).toDF("event_id", "x", "y")
    val lin = ZOrder.linearLayout(grid, "x", files = 16, tieBreak = "event_id")
    val zo = ZOrder.layout(grid, "x", "y", bits = 5, files = 16, tieBreak = "event_id")
    def report(laid: org.apache.spark.sql.DataFrame, bounds: (Long, Long, Long, Long)) = {
      val b = Seq(bounds).toDF("xlo", "xhi", "ylo", "yhi")
      ZOrder.skipEstimate(laid, "x", "y", b).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    }
    // brute-force reference over the collected layout
    def ref(laid: org.apache.spark.sql.DataFrame, bounds: (Long, Long, Long, Long)) = {
      val (xlo, xhi, ylo, yhi) = bounds
      val rows = laid.select(col("file_id"), col("x"), col("y")).collect()
        .map(r => (r.getLong(r.fieldIndex("file_id")), r.getLong(r.fieldIndex("x")),
          r.getLong(r.fieldIndex("y"))))
      val byFile = rows.groupBy(_._1)
      val skipped = byFile.values.count(f =>
        f.map(_._2).max < xlo || f.map(_._2).min > xhi ||
          f.map(_._3).max < ylo || f.map(_._3).min > yhi)
      val scanned = byFile.values.collect {
        case f if !(f.map(_._2).max < xlo || f.map(_._2).min > xhi ||
          f.map(_._3).max < ylo || f.map(_._3).min > yhi) => f.size.toLong
      }.sum
      val matched = rows.count(r =>
        r._2 >= xlo && r._2 <= xhi && r._3 >= ylo && r._3 <= yhi).toLong
      (byFile.size.toLong, skipped.toLong, scanned, matched)
    }
    val rect = (4L, 11L, 4L, 11L)
    assert(report(lin, rect) == ref(lin, rect))
    assert(report(zo, rect) == ref(zo, rect))
    // y-only selectivity: the linear-on-x layout cannot skip a single file
    // (every x-stripe spans all y); z-order files bound y too and drop half
    val yOnly = (0L, 31L, 4L, 11L)
    val (lf, ls, lscan, lm) = report(lin, yOnly)
    val (zf, zs, zscan, zm) = report(zo, yOnly)
    assert((lf, ls, lscan) == (16L, 0L, 1024L))
    assert((zf, zs, zscan) == (16L, 8L, 512L))
    assert(lm == zm && lm == 32 * 8L) // matches are layout-invariant
  }

  test("range planner: full-sample boundaries are exact rank cuts; sampled plan matches a plain-Scala reference and balances uniform data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = (0L until 1000L).map(i => (i, i)).toDF("k", "v")
    // sampleMod=1: every row votes, cuts at ranks 250/500/750 -> 249/499/749
    val full = graft.operators.RangePlanner
      .boundaries(ev, "v", "k", parts = 4, sampleMod = 1)
      .orderBy(col("boundary_idx")).collect().map(_.getLong(1)).toSeq
    assert(full == Seq(249L, 499L, 749L))
    val rep = graft.operators.RangePlanner.balanceReport(ev, "v", full)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rep == Seq((0L, 249L, 2490L), (1L, 250L, 2500L),
      (2L, 250L, 2500L), (3L, 251L, 2510L)))
    // sampled: boundaries equal a plain-Scala replay of the hash sample
    val sampled = graft.operators.RangePlanner
      .boundaries(ev, "v", "k", parts = 4, sampleMod = 5)
      .orderBy(col("boundary_idx")).collect().map(_.getLong(1)).toSeq
    val sampVals = (0L until 1000L).filter(k =>
      math.floorMod(graft.functions.HashFunctions.stableHash64(s"rp:$k"), 5L) == 0L)
      .sorted
    val m = sampVals.size
    val want = (1 to 3).map(i => sampVals(math.max(1, i * m / 4) - 1))
    assert(sampled == want)
    // and still splits uniform data into roughly equal buckets
    val shares = graft.operators.RangePlanner.balanceReport(ev, "v", sampled)
      .collect().map(_.getAs[Long]("share_bp"))
    assert(shares.length == 4 && shares.forall(s => s > 1500 && s < 3500), shares.toSeq)
  }

  test("Morton key equals the bit-twiddling reference; z-layout bounds BOTH dimensions") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(17L)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextLong(65536L), rnd.nextLong(65536L)))
    val got = pts.toDF("id", "x", "y")
      .withColumn("z", ZOrder.zKey($"x", $"y", 16))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    pts.foreach { case (id, x, y) => assert(got(id) == ref(x, y), s"id=$id") }

    // locality: on a 64x64 grid cut into 16 files, the z-order layout must
    // bound the y-extent of every file far below the full domain, while a
    // plain ORDER BY x leaves files spanning (almost) all of y
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x * 64 + y, x, y))
    val laid = ZOrder.layout(grid.toDF("id", "x", "y"), "x", "y",
        bits = 6, files = 16, tieBreak = "id")
      .groupBy($"file_id")
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"))
      .collect()
    assert(laid.length == 16)
    laid.foreach { r =>
      assert(r.getLong(1) <= 31, s"file ${r.get(0)}: x-extent ${r.getLong(1)}")
      assert(r.getLong(2) <= 31, s"file ${r.get(0)}: y-extent ${r.getLong(2)}")
    }
  }

  test("semantic dedup equals brute force within clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(19L)
    def vec(): Seq[Float] = {
      // clustered directions so some pairs clear the threshold
      val base = rnd.nextInt(4)
      (0 until 8).map(i => (if (i % 4 == base) 1.0f else 0.0f) + rnd.nextFloat() * 0.3f)
    }
    val rows = (0 until 60).map(i => (i.toLong, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val cents = graft.operators.IvfIndex.centroids(df, k = 4, iters = 0)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val na = math.sqrt(a.map(p => p.toDouble * p.toDouble).sum)
      val nb = math.sqrt(b.map(q => q.toDouble * q.toDouble).sum)
      dot / (na * nb)
    }
    val centSeq = cents.collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val cells = rows.map { case (id, v) =>
      val best = centSeq.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      (id, v, best)
    }
    val want = (for {
      (ia, va, ca) <- cells; (ib, _, cb) <- cells
      if ca == cb && ia < ib && cos(va, cells.find(_._1 == ib).get._2) >= 0.7
    } yield (ca, ib)).toSet
    val cellsDf = graft.operators.IvfIndex.assign(df, cents, "vec_id", "embedding")
    val got = SemanticDedup.duplicateIds(cellsDf, tau = 0.7)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("triangle summary equals a brute-force reference on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(29L)
    val pairs = (0 until 200).map(_ => (rnd.nextLong(40L), rnd.nextLong(40L)))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct
    val edgeSet = pairs.toSet
    val nodes = pairs.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = pairs.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wantWedges = deg.values.map(d => d * (d - 1) / 2).sum
    val wantTris = (for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      if edgeSet((nodes(i), nodes(j))) && edgeSet((nodes(j), nodes(k))) &&
        edgeSet((nodes(i), nodes(k)))
    } yield 1).size.toLong
    val r = GraphMetrics.triangleSummary(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()(0)
    assert(r.getLong(0) == nodes.length.toLong, "n_nodes")
    assert(r.getLong(1) == pairs.length.toLong, "n_edges")
    assert(r.getLong(2) == wantWedges, "n_wedges")
    assert(r.getLong(3) == wantTris, "n_triangles")
    assert(r.getDouble(4) ==
      (if (wantWedges > 0) (3 * wantTris * 10000 / wantWedges) / 10000.0 else 0.0))
  }

  test("exact quantiles equal the sorted reference for random data across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(43L)
    val xs = Seq.fill(3000)(rnd.nextInt(5000).toLong - 1000L) // negatives too
    val sorted = xs.sorted
    val probs = Seq(1L, 2500L, 5000L, 7500L, 9999L, 10000L)
    val want = probs.map { p4 =>
      val rank = (p4 * xs.size + 9999) / 10000
      (p4 / 10000.0, rank, sorted((rank - 1).toInt))
    }.toSet
    for (width <- Seq(1L, 7L, 64L, 100000L)) { // 1 = exact pass-1; huge = one bucket
      val got = graft.operators.ExactQuantiles
        .quantiles(xs.toDF("v"), "v", probs, coarseWidth = width)
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"width=$width")
    }
  }

  test("exact quantiles plan has no global sort of the corpus") {
    import spark.implicits._
    val df = graft.operators.ExactQuantiles
      .quantiles((1L to 1000L).toDF("v"), "v", Seq(5000L), coarseWidth = 16L)
    // windows sort HISTOGRAM relations; the corpus relation itself must
    // reach its aggregates unsorted — no Sort node directly above the
    // input scan feeding a non-window operator. Cheap proxy: the physical
    // plan's only Sort nodes belong to window operators (and the final
    // probs-sized orderBy), never a global Exchange rangepartitioning of
    // the corpus-sized relation before an aggregate.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning(v"), plan)
  }

  test("triangle summary on a clique is closed-form: transitivity exactly 1") {
    import spark.implicits._
    // K6: 15 edges, 6·C(5,2)=60 wedges, C(6,3)=20 triangles — a true dedup
    // cluster's shape, the transitivity=1 calibration point
    val k6 = for (a <- 0L until 6L; b <- a + 1 until 6L) yield (a, b)
    val r = GraphMetrics.triangleSummary(k6.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      == ((6L, 15L, 60L, 20L, 1.0)))
  }

  test("2-core peel: a chain unravels completely, a clique and a cycle survive intact") {
    import spark.implicits._
    // chain 0-1-…-9 (every node ends up degree < 2 as the ends peel),
    // K5 on 100..104 (dense farm — untouched, degree 4), cycle 200..205
    // (degree exactly 2 everywhere — untouched), plus a pendant 300-100
    // hanging off the clique (peeled in round 1, clique keeps its core)
    val chain = (0L until 9L).map(i => (i, i + 1))
    val k5 = for (a <- 100L until 105L; b <- a + 1 until 105L) yield (a, b)
    val cycle = (200L until 206L).map(i => (i, if (i == 205L) 200L else i + 1))
    val edges = (chain ++ k5 ++ cycle :+ ((300L, 100L))).toDF("id_a", "id_b")
    val got = GraphMetrics.kCore(edges, "id_a", "id_b", k = 2, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (100L until 105L).map(_ -> 4L).toMap ++
      (200L until 206L).map(_ -> 2L).toMap
    assert(got == want)
  }

  test("skyline frontier equals the brute-force dominance reference on random corpora, ties kept") {
    import spark.implicits._
    val rnd = new scala.util.Random(83L)
    for (trial <- 0 until 3) {
      val pts = (0 until 400).map(i =>
        (i.toLong, rnd.nextLong(200L), rnd.nextLong(200L))) ++
        // forced exact ties: neither dominates the other, both survive
        Seq((1000L, 500L, 0L), (1001L, 500L, 0L))
      def dominated(a: (Long, Long, Long)) = pts.exists(b =>
        b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
      val want = pts.filterNot(dominated).map(_._1).toSet
      val got = graft.operators.Skyline
        .frontier(pts.toDF("id", "x", "y"), "x", "y")
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"trial=$trial")
      assert(got.contains(1000L) && got.contains(1001L), "tie dropped")
    }
  }

  test("k-core at k=3 drops the cycle but keeps the clique; a no-op extra round changes nothing") {
    import spark.implicits._
    val k5 = for (a <- 0L until 5L; b <- a + 1 until 5L) yield (a, b)
    val cycle = (10L until 16L).map(i => (i, if (i == 15L) 10L else i + 1))
    val edges = (k5 ++ cycle).toDF("id_a", "id_b")
    def run(rounds: Int) =
      GraphMetrics.kCore(edges, "id_a", "id_b", k = 3, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(4)
    assert(got == (0L until 5L).map(_ -> 4L).toMap)
    assert(run(8) == got)
  }

  test("k-core early exit: fixpoint detected well before a large budget, result identical; empty graph costs zero peels") {
    import spark.implicits._
    // the 2-core fixture again: chain (unravels over ~5 rounds), K5 and a
    // cycle (both stable), pendant (round 1)
    val chain = (0L until 9L).map(i => (i, i + 1))
    val k5 = for (a <- 100L until 105L; b <- a + 1 until 105L) yield (a, b)
    val cycle = (200L until 206L).map(i => (i, if (i == 205L) 200L else i + 1))
    val edges = (chain ++ k5 ++ cycle :+ ((300L, 100L))).toDF("id_a", "id_b")
    val (coreDf, peels) = GraphMetrics.kCoreWithPeels(
      edges, "id_a", "id_b", k = 2, rounds = 50)
    assert(peels > 0 && peels < 10, s"peels=$peels — budget must be a bound, not a cost")
    val got = coreDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (100L until 105L).map(_ -> 4L).toMap ++
      (200L until 206L).map(_ -> 2L).toMap
    assert(got == want)
    val (e0, p0) = GraphMetrics.kCoreWithPeels(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b", k = 2, rounds = 8)
    assert(p0 == 0 && e0.count() == 0L)
  }

  test("label propagation: two cliques over a thin bridge stay two communities; ties break to the smallest label") {
    import spark.implicits._
    // two K6 cliques {0..5} and {10..15} joined by one bridge 5–10: one
    // connected component, but communities must NOT merge across the
    // bridge (each bridge endpoint has 5 in-clique votes vs 1 across)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 5L) ++ clique(10L to 15L) :+ ((5L, 10L)))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.labelPropagation(edges, "id_a", "id_b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == ((0L to 5L) ++ (10L to 15L)).toSet)
    val communities = got.groupBy(_._2).view.mapValues(_.keySet.toSet).toMap
    assert(communities.values.toSet ==
      Set((0L to 5L).toSet, (10L to 15L).toSet),
      s"communities=$communities — bridge must not merge the cliques")
    // determinism: smallest-label tie-break → clique labels are their minima
    assert(communities.keySet == Set(0L, 10L))
    // a lone star: the hub and leaves all vote to the hub's label by round 2
    val star = (1L to 4L).map(l => (100L, 100L + l)).toDF("id_a", "id_b")
    val starGot = GraphMetrics.labelPropagation(star, "id_a", "id_b", rounds = 3)
      .collect().map(r => r.getLong(1)).distinct
    assert(starGot.sameElements(Array(100L)))
  }

  test("Mann-Kendall: integer S and var18 equal a sequential reference; monotone series trend up") {
    import spark.implicits._
    // deterministic per-type daily counts via synthetic events: type 'up'
    // strictly increasing (S = C(n,2), no ties), type 'flat' constant
    // (var18 = 0 → z = 0), type 'mix' with ties
    val dayUs = 86400000000L
    def eventsFor(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (tpe, (d * dayUs + 3600000000L + i) * 1000L))
      }
    val rows = eventsFor("up", Seq(1, 2, 3, 4, 5, 6)) ++
      eventsFor("flat", Seq(3, 3, 3, 3)) ++
      eventsFor("mix", Seq(2, 5, 2, 7, 5))
    val events = rows.toDF("event_type", "ts")
    val got = graft.operators.EvalMetrics.mannKendall(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    def ref(xs: Seq[Int]): (Long, Long) = {
      val n = xs.length.toLong
      val s = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield math.signum(xs(j) - xs(i)).toLong).sum
      val ties = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      (s, n * (n - 1) * (2 * n + 5) - ties)
    }
    val (sUp, vUp) = ref(Seq(1, 2, 3, 4, 5, 6))
    assert(got("up")._2 == sUp && got("up")._3 == vUp)
    assert(got("up")._2 == 15L) // C(6,2) all-positive pairs
    assert(got("flat")._3 == 0L && got("flat")._4 == 0L &&
      got("flat")._5 == "none")
    val (sMix, vMix) = ref(Seq(2, 5, 2, 7, 5))
    assert(got("mix")._2 == sMix && got("mix")._3 == vMix)
    // z for 'up': (15-1)*10000 / sqrt(var18/18), floored
    val zUp = math.floor(14.0 * 10000.0 / math.sqrt(vUp / 18.0)).toLong
    assert(got("up")._4 == zUp && got("up")._5 ==
      (if (zUp > 19600L) "up" else "none"))
  }
}
