package graft.embed

import graft.functions.HashFunctions

/** Embedding boundary (reference C5: OpenAI ada-002 calls with hand-rolled
  * rate limiting, `pipeline1.py:255-261`, `849-881`). Pluggable so tests and
  * oracle runs are deterministic while a real deployment drops in a batched
  * HTTP implementation. NEVER called per-row from a UDF — the distributed
  * wrapper is [[EmbeddingJob]] (mapPartitions, batched, throttle hook).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed a batch. Implementations may throttle between batches. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Seeded-hash unit vectors: component i of v(text) is a uniform value in
  * [-1, 1] derived from md5(s"$i:$text"), then L2-normalized. Deterministic
  * across JVMs/engines (md5 bytes), dimension configurable (tests use 8-64;
  * the reference's ada-002 is 1536).
  */
final class DeterministicEmbedder(val dim: Int) extends Embedder {
  def embedOne(text: String): Array[Float] = {
    val raw = Array.tabulate(dim) { i =>
      ((HashFunctions.stableHash64(text, i) % 2001L) - 1000L) / 1000.0
    }
    val norm = math.sqrt(raw.map(x => x * x).sum)
    if (norm == 0.0) Array.fill(dim)(0.0f)
    else raw.map(x => (x / norm).toFloat)
  }
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(embedOne)
}

/** Throttled decorator mirroring the reference's rate ceiling (3 calls per
  * 65 s cycle, `pipeline1.py:871-879`) — applied per PARTITION batch, not
  * per row, so a 1000-executor run self-limits without driver coordination.
  */
final class ThrottledEmbedder(
    underlying: Embedder,
    callsPerCycle: Int = 3,
    cycleSleepMillis: Long = 65000L) extends Embedder {
  def dim: Int = underlying.dim
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val out = Seq.newBuilder[Array[Float]]
    texts.grouped(callsPerCycle).zipWithIndex.foreach { case (batch, i) =>
      if (i > 0) Thread.sleep(cycleSleepMillis)
      out ++= underlying.embed(batch)
    }
    out.result()
  }
}
