package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.expressions.{DecodeNumericRefs, PercentNormalize, RemoveDotSegments}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{CompressedText, WarcReader}

/** Property tests for the crawl-wing primitives: gzip member splitting
  * against arbitrary payload bytes, the WARC record walk as a total
  * function on arbitrary (possibly hostile) input, the RFC 3986
  * expressions' idempotence, and dot-segment removal cross-checked
  * against `java.net.URI.normalize` — an INDEPENDENT implementation of
  * the same RFC algorithm — on the path class where their contracts
  * coincide.
  */
object CrawlProps extends Properties("CrawlOps") {

  private def lit(s: String) =
    Literal.create(UTF8String.fromString(s), StringType)
  private def ev(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e.eval(null).asInstanceOf[UTF8String].toString

  private val rawBytes: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 2000)
    bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield bs.toArray

  property("gzipMembers splits any concatenation back into the original member payloads") =
    forAll(Gen.listOfN(4, rawBytes).flatMap(l => Gen.chooseNum(1, 4).map(l.take))) { parts =>
      def gz(b: Array[Byte]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(b); g.close(); bos.toByteArray
      }
      val got = CompressedText.gzipMembers(parts.map(gz).reduce(_ ++ _))
      got.length == parts.length &&
        got.zip(parts).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }

  property("WarcReader.parse is total on arbitrary bytes — never throws, never fabricates records") =
    forAll(rawBytes) { bytes =>
      val recs = WarcReader.parse(bytes)
      // a random byte blob has no valid WARC version line + Content-Length
      // + block; anything parsed must at least carry a version-led header
      recs.forall(_.warcType != null)
    }

  private val uriText: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('%', '/', '.', '~', '-', '_', '?', '&', '#', ':'),
      1 -> Gen.oneOf('é', '中')))
  } yield cs.mkString

  property("PercentNormalize is idempotent") = forAll(uriText) { s =>
    val once = ev(PercentNormalize(lit(s)))
    ev(PercentNormalize(lit(once))) == once
  }

  property("RemoveDotSegments is idempotent") = forAll(uriText) { s =>
    val once = ev(RemoveDotSegments(lit(s)))
    ev(RemoveDotSegments(lit(once))) == once
  }

  property("DecodeNumericRefs is total and leaves ref-free text unchanged") =
    forAll(uriText) { s =>
      val out = ev(DecodeNumericRefs(lit(s)))
      if (s.contains("&#")) out != null else out == s
    }

  // rooted, non-escaping paths: java.net.URI.normalize implements the
  // same RFC 3986 §5.2.4 algorithm EXCEPT when `..` pops past the root
  // (URI keeps the excess `..`, remove_dot_segments drops it), so the
  // generator keeps the running depth non-negative
  private val safePath: Gen[String] = {
    val seg = Gen.oneOf(Gen.oneOf("a", "bb", "c1", "x-y"), Gen.const("."),
      Gen.const(".."))
    Gen.listOfN(8, seg).map { segs =>
      // track the NET depth so a `..` is only kept when something is
      // actually on the stack to pop (else it would escape the root,
      // where the two implementations deliberately diverge)
      val kept = segs.foldLeft((List.empty[String], 0)) { case ((acc, depth), s) =>
        s match {
          case "." => (s :: acc, depth)
          case ".." => if (depth == 0) (acc, 0) else (s :: acc, depth - 1)
          case real => (real :: acc, depth + 1)
        }
      }._1.reverse
      "/" + kept.mkString("/")
    }
  }

  property("RemoveDotSegments agrees with java.net.URI.normalize on rooted non-escaping paths") =
    forAll(safePath) { p =>
      val mine = ev(RemoveDotSegments(lit(p)))
      val theirs = new java.net.URI("http", "host", p, null).normalize().getPath
      mine == theirs
    }

  private val anyText: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\u00e9', '\u00fc', '\u2014', '\u2019', '\u20ac', '\u0192'),
      1 -> Gen.const(' ')))
  } yield cs.mkString

  property("MojibakeRepair inverts cp1252 mis-decoding on repair-fixpoint texts") =
    forAll(anyText) { s =>
      import org.apache.spark.sql.graft.expressions.MojibakeRepair
      def repair(x: String) = ev(MojibakeRepair(lit(x)))
      // the inverse is only claimable when s itself carries no mojibake
      // (otherwise repair legitimately unwinds one level further)
      repair(s) != s || {
        val damaged = new String(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
        repair(damaged) == s
      }
    }
}
