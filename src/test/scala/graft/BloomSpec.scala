package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFunctions
import graft.operators.{BloomAgg, BloomSketch}

/** Bloom runtime filter: zero false negatives (the correctness-bearing
  * half), bounded false-positive rate at the 10-bits/key sizing, merge
  * algebra (partition-count invariance — the partial+final contract), JVM
  * reduce ≡ columnar mightContain arithmetic, and pruned-join parity with
  * the plain join.
  */
class BloomSpec extends AnyFunSuite {

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

  private val numHashes = 3

  private def hashes(n: Int, salt: String): Seq[Long] =
    (0 until n).map(i => HashFunctions.stableHash64(s"$salt:$i"))

  test("no false negatives, and false positives stay under 5% at 10 bits/key") {
    val members = hashes(2000, "in")
    val others = hashes(20000, "out").filterNot(members.toSet)
    val w = BloomSketch.wordsFor(members.size.toLong)
    val agg = new BloomAgg(w, numHashes)
    val filter = members.foldLeft(agg.zero)(agg.reduce)

    def contains(h: Long): Boolean = {
      val bits = w.toLong * 64L; val mask = bits - 1L
      val shift = java.lang.Long.numberOfTrailingZeros(bits)
      val h1 = h & mask; val h2 = ((h >>> shift) & mask) | 1L
      (0 until numHashes).forall { i =>
        val pos = (h1 + i * h2) & mask
        (filter((pos >>> 6).toInt) >>> (pos & 63L).toInt & 1L) == 1L
      }
    }
    assert(members.forall(contains), "false negative — impossible by construction")
    val fp = others.count(contains).toDouble / others.size
    assert(fp < 0.05, s"fp rate $fp at ${w * 64} bits for ${members.size} keys")
  }

  test("merge algebra: the filter is invariant to how the input is partitioned") {
    val members = hashes(1500, "m")
    val w = 256
    val agg = new BloomAgg(w, numHashes)
    val whole = members.foldLeft(agg.zero)(agg.reduce)
    Seq(2, 3, 7).foreach { parts =>
      val merged = members.grouped((members.size + parts - 1) / parts)
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(java.util.Arrays.equals(merged, whole), s"parts=$parts")
    }
  }

  test("columnar mightContainExpr matches the JVM reduce arithmetic bit-for-bit") {
    import spark.implicits._
    val members = hashes(500, "col-in")
    val probes = hashes(4000, "col-probe")
    val w = 128
    val agg = new BloomAgg(w, numHashes)
    val filter = members.foldLeft(agg.zero)(agg.reduce)
    // JVM-side truth
    def contains(h: Long): Boolean = {
      val bits = w.toLong * 64L; val mask = bits - 1L
      val shift = java.lang.Long.numberOfTrailingZeros(bits)
      val h1 = h & mask; val h2 = ((h >>> shift) & mask) | 1L
      (0 until numHashes).forall { i =>
        val pos = (h1 + i * h2) & mask
        (filter((pos >>> 6).toInt) >>> (pos & 63L).toInt & 1L) == 1L
      }
    }
    val got = probes.toDF("h")
      .withColumn("bloom", lit(filter))
      .withColumn("hit", BloomSketch.mightContainExpr("bloom", "h", w, numHashes))
      .select($"h", $"hit").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach(h => assert(got(h) == contains(h), s"h=$h"))
  }

  test("pruned join is row-identical to the plain join, and pruning actually drops rows") {
    import spark.implicits._
    val dim = (0 until 200).map(i => (i.toLong, s"d$i")).toDF("k", "payload")
    // fact: 10% of keys match the dim, the rest are disjoint
    val fact = (0 until 5000)
      .map(i => (if (i % 10 == 0) (i / 10 % 200).toLong else 100000L + i, i.toLong))
      .toDF("fk", "v")
    val pruned = BloomSketch.prune(
      fact, HashFunctions.stableHash64(col("fk")),
      dim, HashFunctions.stableHash64(col("k")))
    val nPruned = pruned.count()
    assert(nPruned < fact.count(), "the filter never dropped anything")
    assert(nPruned >= 500L, "dropped a matching row — false negative")
    val got = pruned.join(dim, pruned("fk") === dim("k"))
      .select($"fk", $"v", $"payload").collect().map(_.toSeq).toSet
    val want = fact.join(dim, fact("fk") === dim("k"))
      .select($"fk", $"v", $"payload").collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("plan pin: pruning adds NO keyed shuffle — probe rows meet the filter in their scan stage") {
    import spark.implicits._
    val dim = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "payload")
    val fact = (0 until 2000).map(i => (i.toLong % 300, i.toLong)).toDF("fk", "v")
    val pruned = BloomSketch.prune(
      fact, HashFunctions.stableHash64(col("fk")),
      dim, HashFunctions.stableHash64(col("k")))
    val plan = pruned.queryExecution.executedPlan.toString
    // the membership check is present and codegen-friendly builtin math
    assert(plan.contains("shiftrightunsigned"), plan)
    // the probe side must NOT be hash-repartitioned to be filtered: the
    // only exchange allowed is the build aggregate's single-partition
    // final merge (the partial+final contract). A hashpartitioning
    // exchange here would mean the "filter" costs what the join costs.
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("streaming bloom words equal the batch filter after every random split, shuffle, and replay") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(7L)
    val keys = hashes(800, "stream")
    val w = 64
    val agg = new BloomAgg(w, numHashes)
    val batchWords = keys.foldLeft(agg.zero)(agg.reduce)
    (0 until 3).foreach { round =>
      val shuffled = rnd.shuffle(keys)
      val cut = 1 + rnd.nextInt(shuffled.size - 1)
      // replay a slice of batch 1 inside batch 2: OR idempotence absorbs it
      val b1 = shuffled.take(cut)
      val b2 = (if (round == 2) b1.takeRight(math.min(20, b1.size)) else Nil) ++
        shuffled.drop(cut)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = graft.streaming.StatefulOps
        .runningBloomWords(input.toDS(), w, numHashes)
        .writeStream.format("memory").queryName(s"bloom_run_$round")
        .outputMode("update").start()
      try {
        input.addData(b1: _*); q.processAllAvailable()
        input.addData(b2: _*); q.processAllAvailable()
        // snapshots are OR-monotone per word — the order-independent
        // reduction of the update stream is bit_or, not "latest row"
        val got = spark.table(s"bloom_run_$round")
          .groupBy($"word_idx").agg(expr("bit_or(word)").as("word"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        (0 until w).foreach { i =>
          assert(got.getOrElse(i, 0L) == batchWords(i), s"round=$round word=$i")
        }
      } finally q.stop()
    }
  }
}
