package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NgramLm, RecordLinkage}

/** Closed-form pins for the round-10 linkage + LM operators: every score in
  * the stupid-backoff path computed by hand, and the linkage tie census on
  * an engineered ambiguous deletion.
  */
class LinkageLmSpec extends AnyFunSuite {

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

  test("bigram LM: hit / backoff / OOV branches all fire with hand-computed bps") {
    import spark.implicits._
    // train: c1 = {a:2, b:3, c:1}, N=6; c2 = {(a,b):2, (b,a):1, (b,c):1}
    val train = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    // eval pairs: (a,b) hit 2·10⁴ div 2 = 10000; (b,c) hit 1·10⁴ div 3 = 3333;
    // (c,z) OOV 0; (z,a) backoff 2·4000 div 6 = 1333
    val ev = Seq((10L, "a b c z a")).toDF("doc_id", "text")
    val row = NgramLm.bigramScore(train, ev, "doc_id", "text")
      .select("id", "n_pairs", "n_hit", "n_backoff", "n_oov", "sum_bps", "mean_bps")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(row == Seq((10L, 4L, 2L, 1L, 1L, 14666L, 3666L)))
  }

  test("bigram LM: scoring the train corpus itself never backs off") {
    import spark.implicits._
    val train = Seq((1L, "x y z x y"), (2L, "y z q")).toDF("doc_id", "text")
    val out = NgramLm.bigramScore(train, train, "doc_id", "text")
    import org.apache.spark.sql.functions._
    val agg = out.agg(sum($"n_backoff"), sum($"n_oov")).as[(Long, Long)].head()
    assert(agg == ((0L, 0L)), "self-scoring must hit every bigram")
  }

  test("record linkage: unambiguous deletion links to its source at dist 1") {
    import spark.implicits._
    val left = Seq((1L, "widget-4711"), (2L, "sprocket-88"), (3L, "gizmo-5300"))
      .toDF("rid", "name")
    val right = Seq((101L, "widget-471"), (103L, "gizmo-530")).toDF("rid", "name")
    val got = RecordLinkage.linkage(left, right, "rid", "name", "rid", "name",
        q = 4, rarest = 2, maxDist = 2)
      .select("rid", "lid", "dist", "n_ties")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((101L, 1L, 1L, 1L), (103L, 3L, 1L, 1L)))
  }

  test("record linkage: an ambiguous deletion reports n_ties = 2 and elects the lower id") {
    import spark.implicits._
    // "part-100" is one deletion from BOTH part-1001 and part-1002
    val left = Seq((7L, "part-1001"), (8L, "part-1002")).toDF("rid", "name")
    val right = Seq((200L, "part-100")).toDF("rid", "name")
    val got = RecordLinkage.linkage(left, right, "rid", "name", "rid", "name",
        q = 4, rarest = 2, maxDist = 2)
      .select("rid", "lid", "dist", "n_ties")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((200L, 7L, 1L, 2L)))
  }
}
