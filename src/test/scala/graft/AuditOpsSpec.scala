package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, RepeatedSpans}

/** Closed-form pins for the round-10 audit operators: the repeated-span
  * census on a corpus with a planted shared block, and the pooled dHash
  * on hand-computed pixel grids.
  */
class AuditOpsSpec extends AnyFunSuite {

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

  test("repeated-span census finds a planted 8-token block at every ladder rung it spans") {
    import spark.implicits._
    val block = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    // three docs share the 8-token block embedded in unique context;
    // doc 4 is pure unique text
    // post-contexts are fully disjoint too — a shared word right after the
    // block would manufacture an extra repeated 8-window (block[1:]+word)
    val docs = Seq(
      (1L, s"unique one alpha $block zulu one"),
      (2L, s"different two bravo $block yankee two"),
      (3L, s"third three charlie $block xray three"),
      (4L, "completely disjoint words nothing shared here at all ok"))
      .toDF("doc_id", "text")
    val got = RepeatedSpans.census(docs, "doc_id", "text", Seq(4, 8, 16))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // L=8: exactly one repeated window (the block itself), 3 occurrences
    assert(got(8L) == ((1L, 3L, 3L)), got(8L).toString)
    // L=4: the block contributes 5 distinct 4-gram windows, each 3×
    assert(got(4L) == ((5L, 15L, 3L)), got(4L).toString)
    // L=16: no doc pair shares 16 consecutive tokens
    assert(got(16L) == ((0L, 0L, 0L)), got(16L).toString)
  }

  test("pooled dHash: constant grid hashes to 0; a pooled step flips exactly the crossing bits") {
    import spark.implicits._
    val flat = Multimodal.synthGrayPng(Array.fill(64)(100), 8)
    // left half 200, right half 40 → pooled rows are [200,200,40,40]:
    // comparisons (200>200)=0, (200>40)=1, (40>40)=0 per row → bit r*3+1
    val step = Multimodal.synthGrayPng(
      Array.tabulate(64)(i => if (i % 8 < 4) 200 else 40), 8)
    val df = Seq((1L, flat), (2L, step)).toDF("id", "img")
    val got = Multimodal.pooledDHash(df, "img")
      .select("id", "pool_hash", "is_real")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1L) == ((0L, 1)))
    val wantStep = (0 until 4).map(r => 1L << (r * 3 + 1)).sum
    assert(got(2L) == ((wantStep, 1)))
  }

  test("pooled dHash collapses an isolated pixel inversion the full-res dHash sees") {
    import spark.implicits._
    // smooth horizontal gradient; perturb one interior pixel hard
    val base = Array.tabulate(64)(i => 20 * (i % 8) + 30)
    val pert = base.clone(); pert(27) = 255 - pert(27)
    val df = Seq((1L, Multimodal.synthGrayPng(base, 8)),
      (2L, Multimodal.synthGrayPng(pert, 8))).toDF("id", "img")
    val pooled = Multimodal.pooledDHash(df, "img")
      .select("id", "pool_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Multimodal.perceptualHashes(df, "img")
      .selectExpr("id", "d0 + (d1 * 16384) + (d2 * 268435456) + (d3 * 4398046511104) as fh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full(1L) != full(2L), "full-res hash must see the inverted pixel")
    assert(pooled(1L) == pooled(2L),
      s"pooled hash must absorb it: ${pooled(1L)} vs ${pooled(2L)}")
  }
  test("audio sign bands: grouped synth decodes to the md5 closed form; involution stays in int16") {
    import spark.implicits._
    val df = Seq(8L, 9L).map(Tuple1(_)).toDF("doc_id")
    val wavs = Multimodal.synthAudioGroups(df, "doc_id", groupDiv = 4,
      nSamples = 64, sampleRate = 8000)
    val got = Multimodal.audioSignBands(wavs, "wav")
      .select("doc_id", "samples", "is_real")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1), r.getInt(2))).toMap
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    for (id <- Seq(8L, 9L)) {
      val (smp, real) = got(id)
      assert(real == 1 && smp.length == 64)
      val want = (0 until 64).map { i =>
        val base = Integer.parseInt(md5hex(s"aug:${id / 4}:$i").substring(0, 4), 16) - 32768
        val pert = Integer.parseInt(md5hex(s"aupert:$id:$i").substring(0, 2), 16)
        if (pert % 29 == 0) -base - 1 else base
      }
      assert(smp == want, s"id $id decode mismatch")
    }
    // same group: ids 8 and 9 share base samples — few diffs, all from perts
    val (s8, _) = got(8L); val (s9, _) = got(9L)
    val nd = s8.zip(s9).count { case (a, b) => a != b }
    assert(nd > 0 && nd <= 10, s"unexpected same-group diff count $nd")
    // the involution is closed on int16 at both extremes
    assert((-32767 - 1) == -32768 && -(-32768) - 1 == 32767)
  }
}
