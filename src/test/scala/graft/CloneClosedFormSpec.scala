package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cheap guard for the two round-10 ScaleProbe closed forms (the full probe
  * needs 48g + sf0.1): on a 30-doc corpus cloned 3×, the exact setsim
  * join's output must be EXACTLY c²·P(1×) + C(c,2)·n, and harmonic
  * centrality must follow the clone algebra per node. A regression in
  * either operator's candidate structure breaks an equality here first.
  */
class CloneClosedFormSpec extends AnyFunSuite {

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

  private val offset = 1000L
  private val c = 3

  private def corpus = {
    import spark.implicits._
    val vocab = Vector("kappa", "theta", "sigma", "omega", "lambda", "gamma",
      "delta", "epsilon", "zeta", "iota", "rho", "tau")
    (0 until 30).map { i =>
      val fam = i / 3
      val words = (0 until 30).map(j => vocab((fam * 13 + j * 7) % vocab.size))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def cloned = {
    import spark.implicits._
    (0 until c).map(i => corpus.select(($"doc_id" + lit(i * offset)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
  }

  test("exact setsim closure: 3x output = 9*P1 + 3*n clone pairs, clones at J=1") {
    import spark.implicits._
    val p1 = graft.operators.SetSimJoin
      .selfJoin(corpus, "doc_id", "text", shingleN = 5, tau4 = 9000L).count()
    val scaled = graft.operators.SetSimJoin
      .selfJoin(cloned, "doc_id", "text", shingleN = 5, tau4 = 9000L)
      .localCheckpoint(false)
    assert(scaled.count() == c * c * p1 + 30L * c * (c - 1) / 2)
    assert(scaled
      .filter(pmod($"id_a", lit(offset)) === pmod($"id_b", lit(offset)))
      .filter($"inter" =!= $"uni").count() == 0)
  }

  test("harmonic centrality clone algebra: n1' = (c-1)+c*n1, nf' = c*nf, h' = (c-1)e6 + c*h") {
    import spark.implicits._
    val pairsB = graft.operators.Dedup.nearDupPairs(corpus, "doc_id", "text",
      numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
    val pairsS = graft.operators.Dedup.nearDupPairs(cloned, "doc_id", "text",
      numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
    val hB = graft.operators.GraphMetrics
      .harmonicCentrality(pairsB, "id_a", "id_b", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = graft.operators.GraphMetrics
      .harmonicCentrality(pairsS, "id_a", "id_b", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == c * 30, s"${got.size} nodes, want ${c * 30}")
    got.foreach { case (id, (n1, nf, hm)) =>
      val want = hB.get(id % offset) match {
        case Some((b1, bf, bh)) =>
          ((c - 1) + c * b1, c * bf, (c - 1) * 1000000L + c * bh)
        case None => ((c - 1).toLong, 0L, (c - 1) * 1000000L)
      }
      assert((n1, nf, hm) == want, s"node $id: got ($n1,$nf,$hm) want $want")
    }
  }

  test("harmonic guard: a giant clique is flagged and never traversed; small components match the unguarded run; clones below the cap keep the closed form") {
    import spark.implicits._
    // engineered graph over a 100-id corpus: K40 (quadratic closure bait,
    // 40% share >> the 10% cap) + a 3-node path + a 2-node edge
    val clique = for { a <- 0 until 40; b <- (a + 1) until 40 }
      yield (a.toLong, b.toLong)
    val small = Seq((40L, 41L), (41L, 42L), (43L, 44L))
    val pairs = (clique ++ small).toDF("id_a", "id_b")
    val total = (0 until 100).map(_.toLong).toDF("doc_id")
    val g = graft.operators.GraphMetrics
      .harmonicCentralityGuarded(pairs, "id_a", "id_b", hops = 3,
        maxShare4 = 1000L, totalIds = total)
      .collect()
    val (flagged, ok) = g.partition(_.getInt(4) == 1)
    assert(flagged.map(_.getLong(0)).sorted.toSeq == (0L until 40L), "K40 not flagged")
    assert(flagged.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)),
      "flagged members must carry NULL centrality — they were traversed")
    // the survivors equal the unguarded run on the small subgraph alone
    val plain = graft.operators.GraphMetrics
      .harmonicCentrality(small.toDF("id_a", "id_b"), "id_a", "id_b", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ok.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap == plain)
    // reachability-mass evidence for the guard's point: the guarded dist
    // relation carries Σ(n_1hop + n_far) = 8 pair-distances (edge-sized),
    // while the unguarded closure on the same graph materializes the
    // clique's quadratic 40·39 mass on top of it
    val okMass = ok.map(r => r.getLong(1) + r.getLong(2)).sum
    val ungMass = graft.operators.GraphMetrics
      .harmonicCentrality(pairs, "id_a", "id_b", 3)
      .agg(sum($"n_1hop" + $"n_far")).as[Long].head()
    assert(okMass == 8L, s"guarded mass $okMass")
    assert(ungMass == okMass + 40L * 39L,
      s"unguarded closure should carry the quadratic clique mass: $ungMass")
    // clone path: dup-family cliques of size c stay far below the cap, so
    // the guarded q221 form preserves the clone algebra with flagged = 0.
    // The cliques are constructed explicitly (the 12-word salad corpus
    // above LSH-welds into ONE giant component — itself the scenario the
    // guard exists for, covered by the first half of this test): 15
    // families × 3 members × 3 clones = 9-doc components, 6.7% of the
    // 135-doc corpus, comfortably below the 10% cap.
    val famIds = (0 until 15).map { fam =>
      for { m <- 0 until 3; cp <- 0 until c } yield fam * 3 + m + cp * offset
    }
    val pairsS = famIds.flatMap { ids =>
      for { a <- ids; b <- ids if a < b } yield (a, b)
    }.toDF("id_a", "id_b")
    val allIds = famIds.flatten.toDF("doc_id")
    val gc = graft.operators.GraphMetrics
      .harmonicCentralityGuarded(pairsS, "id_a", "id_b", hops = 3,
        maxShare4 = 1000L, totalIds = allIds)
      .collect()
    assert(gc.forall(_.getInt(4) == 0), "clone cliques crossed the cap")
    val plainS = graft.operators.GraphMetrics
      .harmonicCentrality(pairsS, "id_a", "id_b", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gc.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap == plainS)
  }
}
