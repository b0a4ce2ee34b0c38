package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force parity for the histogram-based evaluation statistics: the
  * shipped operators never materialize per-row ranks or per-pair
  * comparisons, so these specs recompute AUC from ALL (pos, neg) pairs and
  * t-closeness from plain cumulative sums on random small corpora and
  * demand exact integer equality — plus the hand-checkable anchor cases
  * (perfect separation → 10000, identical distributions → t = 0).
  */
class EvalMetricsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("evalmetrics-spec").getOrCreate()

  test("histAuc: exact pairwise Mann-Whitney parity on 20 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(235L)
    for (trial <- 0 until 20) {
      val groups = Seq("a", "b", "c")
      val rows = (0 until 40 + rnd.nextInt(60)).map { _ =>
        (groups(rnd.nextInt(groups.size)), rnd.nextInt(12).toLong)
      }
      val got = graft.operators.EvalMetrics
        .histAuc(rows.toDF("g", "v"), "g", "v")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      groups.filter(g => rows.exists(_._1 == g)).foreach { g =>
        val pos = rows.filter(_._1 == g).map(_._2)
        val neg = rows.filter(_._1 != g).map(_._2)
        // num2 = 2*wins + ties over ALL (pos, neg) pairs — the midrank
        // identity the histogram formula must reproduce exactly
        val num2 = (for (p <- pos; n <- neg) yield {
          if (p > n) 2L else if (p == n) 1L else 0L
        }).sum
        val want = (BigInt(num2) * 10000 /
          (BigInt(2) * pos.size * neg.size)).toLong
        val (np, nn, auc4) = got(g)
        assert(np == pos.size && nn == neg.size && auc4 == want,
          s"trial $trial group $g: got ($np,$nn,$auc4) " +
            s"want (${pos.size},${neg.size},$want)")
      }
    }
  }

  test("histAuc: perfect separation scores 10000, reversal scores 0") {
    import spark.implicits._
    val rows = Seq(("hi", 10L), ("hi", 11L), ("lo", 1L), ("lo", 2L))
    val got = graft.operators.EvalMetrics
      .histAuc(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("hi") == 10000L && got("lo") == 0L)
  }

  test("tCloseness: plain cumulative-sum parity on 20 random corpora; identical class distribution gives t = 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(238L)
    for (trial <- 0 until 20) {
      val rows = (0 until 50 + rnd.nextInt(80)).map { _ =>
        ("l" + rnd.nextInt(2), "s" + rnd.nextInt(3), rnd.nextInt(6).toLong)
      }
      val got = graft.operators.EvalMetrics
        .tCloseness(rows.toDF("lang", "source", "b"), "lang", "source", "b")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4))).toMap
      val buckets = rows.map(_._3).distinct.sorted
      val bigN = rows.size.toLong
      val m = buckets.size.toLong
      rows.groupBy(r => (r._1, r._2)).foreach { case (k, grp) =>
        val ng = grp.size.toLong
        var (cumP, cumG, emd) = (0L, 0L, 0L)
        buckets.foreach { b =>
          cumP += grp.count(_._3 == b)
          cumG += rows.count(_._3 == b)
          emd += math.abs(cumP * bigN - cumG * ng)
        }
        val want = emd * 10000L / (ng * bigN * (m - 1))
        val (gn, gt, flag) = got(k)
        assert(gn == ng && gt == want,
          s"trial $trial class $k: got ($gn,$gt) want ($ng,$want)")
        assert(flag == (if (want > 2000L) "exposed" else "ok"))
      }
    }
    // a class whose bucket distribution IS the corpus distribution
    val uniform = for {
      l <- Seq("x", "y"); b <- 0L until 4L
    } yield (l, "s", b)
    val t0 = graft.operators.EvalMetrics
      .tCloseness(uniform.toDF("lang", "source", "b"), "lang", "source", "b")
      .collect().map(_.getLong(3)).toSet
    assert(t0 == Set(0L))
  }

  test("q263 BH: the Zelen-Severo polynomial hits known normal quantiles; rejections are rank-downward-closed") {
    // the shared polynomial, replicated here as a reference
    def p2sided(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      2.0 * (math.exp(-az * az / 2.0) * 0.3989422804014327 *
        (0.319381530 * t - 0.356563782 * t * t + 1.781477937 * t * t * t
          - 1.821255978 * t * t * t * t + 1.330274429 * t * t * t * t * t))
    }
    // two-sided p at the canonical quantiles, within the A&S error bound
    assert(math.abs(p2sided(1.959964) - 0.05) < 2e-7)
    assert(math.abs(p2sided(2.575829) - 0.01) < 2e-7)
    assert(math.abs(p2sided(0.0) - 1.0) < 2e-7)
    // the shipped query on the sf0.001 corpus: p6 in range, ranks are a
    // permutation of 1..m, and the BH rejection set is downward-closed
    val rows = SparkEntry.queries("q263_bh_fdr")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(5), r.getLong(4), r.getInt(6))) // (rank, p6, rej)
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong))
    assert(rows.forall { case (_, p6, _) => p6 >= 0L && p6 <= 1000000L })
    val rej = rows.map(_._3)
    assert(!rej.sliding(2).exists(w => w.length == 2 && w(0) == 0 && w(1) == 1),
      s"rejections not downward-closed: ${rej.mkString(",")}")
    // BH identity: rejected exactly the ranks <= max{i : p6*m <= i*50000}
    val m = rows.length.toLong
    val maxRej = rows.filter { case (i, p6, _) => p6 * m <= i * 50000L }
      .map(_._1).maxOption.getOrElse(0L)
    rows.foreach { case (i, _, r) => assert((i <= maxRej) == (r == 1)) }
  }
}
