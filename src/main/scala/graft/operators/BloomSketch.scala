package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distributed Bloom filter over the engine's deterministic
  * 60-bit stable hash ([[graft.functions.HashFunctions.stableHash64]]) —
  * the runtime join filter a 100 TB fact⋈dim plan wants: build the filter
  * on the SMALL side as a partial+final aggregation (each map partition
  * ORs bits into a local word array; the shuffle carries `numWords` longs
  * per partition, the final merge is word-wise OR on one row), broadcast
  * the finished ≤ a-few-hundred-KB word array, and drop non-matching
  * probe rows BEFORE the join's exchange — so the big side's shuffle
  * carries only (matches + ε false positives) instead of the full fact
  * table. Unlike q87's `df.stat.bloomFilter` (collected and merged on the
  * driver, then re-broadcast by value), this filter never leaves the
  * executors until the one-row broadcast, and its merge is exposed as an
  * algebra (word-wise OR) so register tables of per-partition / per-day
  * filters can be re-aggregated without rescanning the build side.
  *
  * Determinism: bit positions come from pure integer arithmetic on the
  * stable hash (double hashing, power-of-two bit count) — the SAME
  * arithmetic in the JVM reduce path and the columnar
  * [[BloomSketch.mightContainExpr]] check (built-in shift/AND
  * expressions, whole-stage-codegen'd; no UDF on the probe side's hot
  * path). Membership is a pure function of the data, so a pruned join is
  * bit-for-bit the plain join (false positives are removed by the exact
  * join that follows; false negatives are impossible).
  *
  * Reference parity: the reference's retrieval app has no runtime filter
  * (its joins are pandas merges — `pipeline2.py` loads whole frames);
  * this is a scale-path operator in the SURVEY §2.9 mergeable-sketch
  * family, same algebra class as [[KmvSketchAgg]] / [[HllAgg]].
  */
class BloomAgg(numWords: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(numWords > 0 && (numWords & (numWords - 1)) == 0,
    s"numWords must be a power of two, got $numWords")
  require(numHashes >= 1 && numHashes <= 8, s"numHashes in [1,8], got $numHashes")

  private val bits = numWords.toLong * 64L
  private val mask = bits - 1L
  private val shift = java.lang.Long.numberOfTrailingZeros(bits)

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val h1 = h & mask
    val h2 = ((h >>> shift) & mask) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      buf((pos >>> 6).toInt) |= 1L << (pos & 63L)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BloomSketch {

  /** Smallest power-of-two word count giving ≥ `bitsPerKey` bits for `n`
    * keys (floor 1024 bits). ~10 bits/key with 3 probes ≈ 1-2% false
    * positives — fp cost is a few extra rows into the exact join, never a
    * wrong answer.
    */
  def wordsFor(n: Long, bitsPerKey: Int = 10): Int = {
    val want = math.max(1024L, n * bitsPerKey)
    var w = 16
    while (w.toLong * 64L < want) w <<= 1
    w
  }

  /** Columnar membership probe against a finished filter column
    * (`array<bigint>`): the exact integer arithmetic of
    * [[BloomAgg.reduce]] re-expressed with built-in shift/AND expressions
    * so the probe filter stays inside whole-stage codegen. `bloom` and
    * `h` are column NAMES (the check composes element_at against a
    * broadcast one-row filter attached by crossJoin).
    */
  def mightContainExpr(
      bloom: String, h: String, numWords: Int, numHashes: Int): Column = {
    val bits = numWords.toLong * 64L
    val mask = bits - 1L
    val shift = java.lang.Long.numberOfTrailingZeros(bits)
    val h1 = s"($h & ${mask}L)"
    val h2 = s"((shiftrightunsigned($h, $shift) & ${mask}L) | 1L)"
    val checks = (0 until numHashes).map { i =>
      val pos = s"(($h1 + ${i}L * $h2) & ${mask}L)"
      s"(shiftrightunsigned(element_at($bloom, cast(shiftright($pos, 6) as int) + 1), " +
        s"cast(($pos & 63L) as int)) & 1L) = 1L"
    }
    expr(checks.mkString("(", ") AND (", ")"))
  }

  /** Semi-join reduction: keep only `probe` rows whose `probeHash` might
    * be in the set of `buildHash` values — the runtime-filter half of a
    * pruned join. `numWords` ≤ 0 auto-sizes from one count of the build
    * side (the data-driven-parameter contract: IntervalJoin bucket size,
    * IvfIndex autoK); pass an explicit `numWords` (e.g. from
    * [[wordsFor]] over a count the caller already has) to skip that
    * count action and make the sizing observable/assertable.
    */
  def prune(
      probe: DataFrame, probeHash: Column,
      build: DataFrame, buildHash: Column,
      numWords: Int = 0, numHashes: Int = 3): DataFrame = {
    val w =
      if (numWords > 0) numWords
      else wordsFor(math.max(build.count(), 1L))
    val agg = udaf(new BloomAgg(w, numHashes),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    val filterRow = build.select(buildHash.as("__bh"))
      .agg(agg(col("__bh")).as("__bloom"))
    probe
      .withColumn("__ph", probeHash)
      .crossJoin(broadcast(filterRow))
      .filter(mightContainExpr("__bloom", "__ph", w, numHashes))
      .drop("__bloom", "__ph")
  }
}
