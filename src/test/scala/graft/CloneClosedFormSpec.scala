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
}
