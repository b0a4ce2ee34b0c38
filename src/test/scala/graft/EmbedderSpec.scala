package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{DeterministicEmbedder, Embedder, EmbeddingJob, HttpEmbedder, ResilientEmbedder}

/** Failure-policy specs for the embedding stack (C5): retry/backoff against
  * the canned HTTP transport, lenient per-row blanking (reference parity with
  * `pipeline1.py:872-879` — only the failing row's Embeddings end up empty),
  * and fail-fast mode. The `sleeper` is injected so no spec sleeps.
  */
class EmbedderSpec extends AnyFunSuite {

  private val goodJson = """{"data":[{"embedding":[0.25,0.5]}]}"""

  test("resilient: transient 5xx twice then 2xx succeeds, with two backoff sleeps") {
    var calls = 0
    val transport = (_: String) => {
      calls += 1
      if (calls <= 2) throw new java.io.IOException("embedding endpoint HTTP 503")
      goodJson
    }
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val e = new ResilientEmbedder(
      new HttpEmbedder("http://unused", "m", "k", 2, transport),
      maxRetries = 2, backoffMillis = 1000L, sleeper = sleeps += _)
    val got = e.embed(Seq("a"))
    assert(got.map(_.toSeq) == Seq(Seq(0.25f, 0.5f)))
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // exponential: backoff << attempt
  }

  test("resilient: persistent failure + lenient blanks the row and the job continues") {
    val transport = (_: String) => throw new java.io.IOException("embedding endpoint HTTP 500")
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val e = new ResilientEmbedder(
      new HttpEmbedder("http://unused", "m", "k", 2, transport),
      maxRetries = 1, backoffMillis = 10L, sleeper = sleeps += _)
    assert(e.embed(Seq("only")).map(_.toSeq) == Seq(Seq.empty))
    assert(sleeps.toSeq == Seq(10L)) // one retry, then lenient fallback
  }

  test("resilient: lenient=false rethrows the underlying failure after retries") {
    val transport = (_: String) => throw new java.io.IOException("embedding endpoint HTTP 500")
    val e = new ResilientEmbedder(
      new HttpEmbedder("http://unused", "m", "k", 2, transport),
      maxRetries = 1, backoffMillis = 1L, lenient = false, sleeper = _ => ())
    intercept[java.io.IOException] { e.embed(Seq("a", "b")) }
  }

  test("resilient: one poison row blanks ONLY itself — per-row reference parity") {
    // underlying fails any batch containing the poison text; other rows embed
    val det = new DeterministicEmbedder(4)
    val underlying = new Embedder {
      def dim = 4
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        if (texts.contains("poison")) throw new java.io.IOException("HTTP 400")
        else texts.map(det.embedOne)
    }
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val e = new ResilientEmbedder(underlying, maxRetries = 1, backoffMillis = 7L,
      sleeper = sleeps += _)
    val got = e.embed(Seq("ok-a", "poison", "ok-b"))
    assert(got.length == 3)
    assert(got(0).toSeq == det.embedOne("ok-a").toSeq) // batch-mates survive intact
    assert(got(1).isEmpty)                             // exactly the failing row blanks
    assert(got(2).toSeq == det.embedOne("ok-b").toSeq)
    // batch retried once, then the poison singleton retried once
    assert(sleeps.toSeq == Seq(7L, 7L))
  }

  test("throttle cadence: one sleep between cycles, none before the first") {
    val seen = scala.collection.mutable.Buffer.empty[Int]
    val det = new DeterministicEmbedder(4)
    val counting = new Embedder {
      def dim = 4
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        seen += texts.size; texts.map(det.embedOne)
      }
    }
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val e = new graft.embed.ThrottledEmbedder(counting, callsPerCycle = 3,
      cycleSleepMillis = 65000L, sleeper = sleeps += _)
    val got = e.embed((1 to 7).map(i => s"t$i"))
    assert(got.size == 7)
    assert(seen.toSeq == Seq(3, 3, 1))          // reference cycle size
    assert(sleeps.toSeq == Seq(65000L, 65000L)) // between cycles only
  }

  test("production stack composes resilient over throttled over http") {
    val stack = EmbeddingJob.httpStack("http://unused", "m", "k", dim = 8)
    assert(stack.isInstanceOf[ResilientEmbedder])
    assert(stack.dim == 8)
  }

  test("httpStack composed: one run throttles AND isolates a poison row; retries re-pay the throttle") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // canned transport: any batch containing the poison text 500s; otherwise
    // one vector per input element, in order
    val transport = (body: String) => {
      val inputs = (JsonMethods.parse(body) \ "input").children.collect { case JString(s) => s }
      if (inputs.contains("poison")) throw new java.io.IOException("embedding endpoint HTTP 500")
      """{"data":[""" + inputs.map(_ => """{"embedding":[0.25,0.5]}""").mkString(",") + "]}"
    }
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val stack = EmbeddingJob.httpStack("http://unused", "m", "k", dim = 2,
      callsPerCycle = 2, cycleSleepMillis = 100L, maxRetries = 1,
      backoffMillis = 7L, transport = transport, sleeper = sleeps += _)
    val got = stack.embed(Seq("a", "b", "poison", "d", "e"))
    // exactly the poison row blanks; its cycle-mate "d" survives
    assert(got.map(_.toSeq) == Seq(
      Seq(0.25f, 0.5f), Seq(0.25f, 0.5f), Seq.empty, Seq(0.25f, 0.5f), Seq(0.25f, 0.5f)))
    // the composition order (Resilient OUTSIDE Throttled) has a real
    // behavioral consequence pinned here: the batch retry re-runs the whole
    // throttled batch, so it re-pays the inter-cycle sleep (second 100)
    // before hitting the poison cycle again; then per-row isolation runs
    // singleton batches (no inter-cycle sleeps) and only the poison
    // singleton backs off (final 7) before blanking
    assert(sleeps.toSeq == Seq(100L, 7L, 100L, 7L))
  }

  test("resilient over a healthy embedder is a pass-through (q34 wiring)") {
    val det = new DeterministicEmbedder(16)
    val e = new ResilientEmbedder(det)
    assert(e.embed(Seq("x", "y")).map(_.toSeq) == Seq("x", "y").map(det.embedOne(_).toSeq))
    assert(e.embed(Seq.empty).isEmpty)
  }
}
