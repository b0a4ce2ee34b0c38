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

/** Batched HTTP embedding boundary (the ada-002 call,
  * `pipeline1.py:849-881`): POSTs `{"model": ..., "input": [texts]}` and
  * reads `{"data": [{"embedding": [...]}, ...]}` in input order. The
  * transport is injectable — tests run offline against a canned responder;
  * production uses the default `java.net.http` POST with the bearer key.
  * Deployment is config, not code: swap `DeterministicEmbedder` for this in
  * the EmbeddingJob call and wrap with [[ThrottledEmbedder]] for the
  * reference's rate ceiling. NEVER call per-row — [[EmbeddingJob]] batches
  * per partition.
  */
final class HttpEmbedder(
    endpoint: String,
    model: String,
    apiKey: String,
    val dim: Int,
    transport: String => String = null) extends Embedder {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  // one client per executor (connection keep-alive across batches);
  // @transient so the embedder itself stays serializable into tasks
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30)).build()

  private def post(body: String): String =
    if (transport != null) transport(body)
    else {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(120))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $apiKey")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"embedding endpoint HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      resp.body()
    }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("model" -> JString(model), "input" -> JArray(texts.map(JString(_)).toList))))
    val parsed = JsonMethods.parse(post(body))
    val out = (parsed \ "data").children.map { d =>
      (d \ "embedding").children.map {
        case JDouble(x) => x.toFloat
        case JInt(x) => x.toFloat
        case other => throw new java.io.IOException(s"non-numeric embedding component: $other")
      }.toArray
    }
    require(out.size == texts.size,
      s"embedding endpoint returned ${out.size} vectors for ${texts.size} inputs")
    // fail at the HTTP boundary, not rows later inside retrieval queries
    require(out.forall(_.length == dim),
      s"embedding endpoint returned a vector of dimension ${out.map(_.length).find(_ != dim).get}, expected $dim")
    out
  }
}

/** Failure-policy decorator — the piece a 100 TB run cannot live without:
  * one flaky batch must not kill a 1000-executor job. A failing batch is
  * retried `maxRetries` times with exponential backoff; if it still fails,
  * lenient mode isolates the failure PER ROW — each text of the batch is
  * re-embedded on its own (same retry policy) and only the texts that fail
  * individually come back as EMPTY vectors, so one poison row never blanks
  * its 299 batch-mates. Reference parity: `pipeline1.py:872-879` wraps the
  * per-row embedding call and leaves only the failing row's Embeddings
  * empty rather than aborting the DAG. `lenient = false` rethrows after the
  * batch retries for callers that want fail-fast semantics. `sleeper` is
  * injectable so specs run without wall clock.
  */
final class ResilientEmbedder(
    underlying: Embedder,
    maxRetries: Int = 2,
    backoffMillis: Long = 1000L,
    lenient: Boolean = true,
    sleeper: Long => Unit = Thread.sleep) extends Embedder {
  def dim: Int = underlying.dim

  /** One call with the retry/backoff policy; rethrows when retries run out. */
  private def withRetries(texts: Seq[String]): Seq[Array[Float]] = {
    var attempt = 0
    while (true) {
      try return underlying.embed(texts)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          sleeper(backoffMillis << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    try withRetries(texts)
    catch {
      case scala.util.control.NonFatal(e) =>
        if (!lenient) throw e
        else if (texts.sizeIs == 1) Seq(Array.empty[Float])
        else // per-row isolation: only individually-failing rows blank
          texts.map { t =>
            try withRetries(Seq(t)).head
            catch { case scala.util.control.NonFatal(_) => Array.empty[Float] }
          }
    }
  }
}

/** Throttled decorator mirroring the reference's rate ceiling (3 calls per
  * 65 s cycle, `pipeline1.py:871-879`) — applied per PARTITION batch, not
  * per row, so a 1000-executor run self-limits without driver coordination.
  * `sleeper` is injectable so the cadence itself is spec-testable.
  */
final class ThrottledEmbedder(
    underlying: Embedder,
    callsPerCycle: Int = 3,
    cycleSleepMillis: Long = 65000L,
    sleeper: Long => Unit = Thread.sleep) extends Embedder {
  def dim: Int = underlying.dim
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val out = Seq.newBuilder[Array[Float]]
    texts.grouped(callsPerCycle).zipWithIndex.foreach { case (batch, i) =>
      if (i > 0) sleeper(cycleSleepMillis)
      out ++= underlying.embed(batch)
    }
    out.result()
  }
}
