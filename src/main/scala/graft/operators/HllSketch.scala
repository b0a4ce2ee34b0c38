package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** HyperLogLog (Flajolet et al., AofA 2007) as a mergeable typed
  * Aggregator: `m = 2^p` registers, each holding the maximum "rank" (first
  * set-bit position, 1-based) seen among the hashes routed to it; the
  * cardinality estimate is the bias-corrected harmonic mean of the
  * register values, with linear counting in the small range. The FOURTH
  * mergeable sketch in the suite — constant-size distinct-count alongside
  * KMV (q73: k longs, exact below k), frequency (Count-Min, q91) and
  * set-signature (MinHash union, q42). HLL's edge over KMV at 100 TB is
  * the register array's FIXED byte size (m bytes of state vs k·8) and a
  * merge that is a pure element-wise max — the canonical engine-native
  * `approx_count_distinct` state, rebuilt here on the engine's
  * oracle-reproducible hash so the estimate itself is checkable
  * bit-for-bit against a relational rebuild.
  *
  * Scale shape: registers ingest the raw stream — no distinct, no
  * vocabulary shuffle; Catalyst runs partial+final, each partition reduces
  * to one m-int array, and the merge tree ships registers, never values.
  * Per-group sketches compose upward (source → corpus) without re-scan.
  *
  * Bucket/rank derivation lives OUTSIDE the Aggregator ([[bucketCol]] /
  * [[rankCol]], md5-based [[HashFunctions.stableHash64]]) so a SQL oracle
  * can rebuild the identical registers with a plain `max() GROUP BY` and
  * reproduce the estimate from the same integer state.
  */
class HllAgg(val p: Int) extends Aggregator[(Int, Int), Array[Int], Seq[Int]] {
  private val m = 1 << p

  override def zero: Array[Int] = Array.fill(m)(0)

  override def reduce(buf: Array[Int], in: (Int, Int)): Array[Int] = {
    if (in._2 > buf(in._1)) buf(in._1) = in._2
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]

  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object HllSketch {

  /** Rank cap: the stable hash is 60 bits, bucket eats `p`, and the sum in
    * [[estimateCol]] scales by 2^(Cap − rank) — 48 keeps every term and the
    * whole sum inside a long for any p ≤ 6.
    */
  val RankCap = 48

  /** Register index for a key hash: `h mod 2^p`. */
  def bucketCol(h: Column, p: Int): Column =
    pmod(h, lit((1L << p))).cast("int")

  /** Register value ("rank") for the hash in column `hName`: 1 + the first
    * set-bit position of `v = h >> p`, capped at [[RankCap]], computed as
    * `bit_count((v & -v) - 1)` — `v & -v` isolates the lowest set bit 2^i
    * and the popcount of 2^i − 1 is exactly i. `v = 0` (probability 2^-48
    * per key) gives bit_count(-1) = 64, clamped to the cap; so is a first
    * bit above the cap. Pure integer identities, three codegen'd builtin
    * ops per key — and the oracle writes the IDENTICAL formula, so the
    * registers match bit-for-bit.
    */
  def rankExpr(hName: String, p: Int): Column = {
    val v = s"shiftright($hName, $p)"
    expr(s"cast(least(bit_count(($v & -$v) - 1), ${RankCap - 1}) + 1 as int)")
  }

  /** alpha(16) = 0.673, alpha(32) = 0.697, alpha(64) = 0.709, else the
    * asymptotic 0.7213/(1 + 1.079/m) — the standard HLL bias constants.
    */
  def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Bias-corrected estimate from the register array in column `regName`
    * (caller floor-quantizes).
    *
    * Integer core: S = Σ_j 2^(48 − M_j) — every term and the sum are exact
    * longs (≤ m·2^48 < 2^63 for p ≤ 6), so the only cross-engine float ops
    * are one literal product, one division and (small range only) one
    * `ln`, each written with the same literals on both engines.
    */
  def estimateExpr(regName: String, p: Int): Column = {
    val m = 1 << p
    val alpha = alphaFor(m)
    val s = s"aggregate($regName, cast(0 as bigint), " +
      s"(acc, r) -> acc + shiftleft(cast(1 as bigint), $RankCap - r))"
    val zeros = s"size(filter($regName, r -> r = 0))"
    val raw = s"(${alpha * m * m}D * 281474976710656.0D / cast($s as double))"
    // linear counting below 2.5·m when empty registers remain
    expr(s"case when $raw <= ${2.5 * m}D and $zeros > 0 " +
      s"then ${m.toDouble}D * ln(${m.toDouble}D / cast($zeros as double)) " +
      s"else $raw end")
  }

  /** Re-aggregate FINISHED register arrays to a coarser grouping without
    * touching the raw key stream — the sketch-rollup-table pattern: a
    * nightly job stores per-(source, day) registers; "distinct last 30
    * days per source" or "global distinct" is then element-wise max over
    * 2^p-int arrays, never a rescan of 100 TB of keys. HLL registers are
    * a max-monoid, so rollup(est) is EXACTLY the estimate the fine scan
    * would have produced at the coarse grain (not an approximation of
    * it). `keys` may be empty (global rollup). Shuffle cost: groups × m
    * rows of ints, twice.
    */
  def rollupRegisters(
      df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      regCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{posexplode => pex}
    val exploded = df
      .select(keys.map(col) :+ pex(col(regCol)): _*)
      .toDF(keys ++ Seq("i", "m"): _*)
      .groupBy((keys :+ "i").map(col): _*)
      .agg(max(col("m")).as("m"))
    exploded.groupBy(keys.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as(regCol))
  }
}
