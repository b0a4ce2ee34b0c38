package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GraphMetrics, PageRank}

/** Round-16 parity pins: every size-gated LOCAL graph fixpoint
  * ([[graft.operators.LocalGraph]]) must produce bit-identical output to
  * the distributed loop it replaces under the edge limit. Each test runs
  * the same operator twice — once with the default limit (local path) and
  * once with `spark.graft.graph.localEdgeLimit = 0` (distributed path) —
  * and compares the full sorted result sets. The graphs are engineered to
  * exercise the tricky corners: multi-hop chains (labels must propagate,
  * not just copy a neighbor), vote ties, peel cascades, rings (BFS
  * frontier overlap), and string ids for PageRank (the q284 host graph).
  */
class LocalGraphSpec extends AnyFunSuite {

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

  private def bothPaths(f: => DataFrame): (Seq[String], Seq[String]) = {
    spark.conf.unset("spark.graft.graph.localEdgeLimit")
    val local = f.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.graph.localEdgeLimit", "0")
    val dist =
      try f.collect().map(_.toString).sorted.toSeq
      finally spark.conf.unset("spark.graft.graph.localEdgeLimit")
    (local, dist)
  }

  // chain 1-2-3-4-5, triangle 10-11-12 (+ a chord), isolated pair 20-21,
  // self-loop 30-30, duplicate-ish long path 40..45
  private def pairs(): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (40L, 41L), (41L, 42L), (42L, 43L), (43L, 44L), (44L, 45L)
    ).toDF("id_a", "id_b")
  }

  private def allIds(): DataFrame = {
    val s = spark
    import s.implicits._
    ((1L to 5L) ++ (10L to 12L) ++ (20L to 21L) ++ (30L to 31L) ++
      (40L to 45L)).toDF("doc_id")
  }

  test("components: local union-find == distributed min-label rounds") {
    val (local, dist) = bothPaths(
      Dedup.resolveClustersSparse(pairs(), allIds()))
    assert(local == dist)
    // sanity: the 5-chain really collapsed to min id 1, singletons kept
    assert(local.exists(_.contains("[5,1]")))
    assert(local.exists(_.contains("[30,30]")))
  }

  test("guarded components: flag + keeper parity") {
    val (local, dist) = bothPaths(
      Dedup.guardedClusters(pairs(), allIds(), maxShare4 = 2000L))
    assert(local == dist)
  }

  test("pagerank: local integer walk == distributed rounds (long ids)") {
    val (local, dist) = bothPaths(
      PageRank.ranks(pairs(), "id_a", "id_b", iters = 3))
    assert(local == dist)
  }

  test("pagerank: string ids (host-graph shape)") {
    val s = spark
    import s.implicits._
    val hosts = Seq(("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com"),
      ("d.com", "e.com")).toDF("a", "b")
    val (local, dist) = bothPaths(PageRank.ranks(hosts, "a", "b", iters = 3))
    assert(local == dist)
  }

  test("personalized pagerank: seed teleport parity") {
    val (local, dist) = bothPaths(
      PageRank.personalizedRanks(pairs(), "id_a", "id_b", Seq(1L, 10L), iters = 3))
    assert(local == dist)
  }

  test("k-core: peel cascade parity (chain unravels, triangle survives)") {
    val (local, dist) = bothPaths(
      GraphMetrics.kCore(pairs(), "id_a", "id_b", k = 2, rounds = 8))
    assert(local == dist)
    // the triangle is the only 2-core of this graph
    assert(local.size == 3)
  }

  test("label propagation: vote + tie parity") {
    val (local, dist) = bothPaths(
      GraphMetrics.labelPropagation(pairs(), "id_a", "id_b", 3))
    assert(local == dist)
  }

  test("harmonic centrality: bounded BFS parity (hops 1..3)") {
    for (h <- 1 to 3) {
      val (local, dist) = bothPaths(
        GraphMetrics.harmonicCentrality(pairs(), "id_a", "id_b", hops = h))
      assert(local == dist, s"hops=$h")
    }
  }

  test("harmonic centrality guarded: giant-component flag parity") {
    val (local, dist) = bothPaths(
      GraphMetrics.harmonicCentralityGuarded(pairs(), "id_a", "id_b",
        hops = 3, maxShare4 = 2000L, totalIds = allIds()))
    assert(local == dist)
  }
}
