package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.expressions._

/** The engine's SQL function surface: one builder list shared by
  * [[VectorFunctions.register]] (session-scoped registration) and
  * [[graft.GraftExtensions]] (spark.sql.extensions injection), so the SQL
  * front door and the DataFrame API expose the SAME native Catalyst
  * expressions — a SQL user can express the whole dedup/quality pipeline
  * (minhash_sig → LSH banding, simhash32, shingle_jaccard verify,
  * lang_quality filter, word_fingerprint blocking) declaratively, with
  * values bit-identical to the DataFrame operators in [[graft.operators]].
  */
object SqlFunctions {

  private def intArg(fn: String, arg: String, e: Expression): Int =
    if (e.foldable) e.eval().asInstanceOf[Number].intValue()
    else throw new IllegalArgumentException(
      s"$fn: $arg must be a literal integer, got non-foldable ${e.sql}")

  /** (name, builder) pairs; builders mirror the DataFrame wrappers'
    * parameterization exactly (marker inventory from
    * [[graft.operators.TextAnalysis.Markers]], int args literal-only).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "minhash_sig" -> (es => MinHashSig(es(0),
      intArg("minhash_sig", "numHashes", es(1)),
      intArg("minhash_sig", "shingleLen", es(2)))),
    "simhash32" -> (es => SimHash32(es(0))),
    "shingle_jaccard" -> (es => ShingleJaccard(es(0), es(1),
      intArg("shingle_jaccard", "n", es(2)))),
    "shingle_containment" -> (es => ShingleContainment(es(0), es(1),
      intArg("shingle_containment", "n", es(2)))),
    "shingle_pair_scores" -> (es => ShinglePairScores(es(0), es(1),
      intArg("shingle_pair_scores", "n", es(2)))),
    "sig_jaccard" -> (es => ArrayAgreeRatio(es(0), es(1))),
    "lang_quality" -> (es => LangQuality(es(0),
      graft.operators.TextAnalysis.Markers.toSeq.map { case (l, ws) => (l, ws) })),
    "word_fingerprint" -> (es => WordFingerprint(es(0))),
    "char_shingles" -> (es => CharShingles(es(0),
      intArg("char_shingles", "n", es(1)))),
    "word_ngrams" -> (es => WordNGrams(es(0),
      intArg("word_ngrams", "n", es(1)))),
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "mojibake_repair" -> (es => MojibakeRepair(es(0))),
    "http_dechunk" -> (es => HttpDechunk(es(0))),
    "char_entropy" -> (es => CharEntropyMicroNats(es(0))),
    "decode_numrefs" -> (es => DecodeNumericRefs(es(0))),
    "percent_normalize" -> (es => PercentNormalize(es(0))),
    "remove_dot_segments" -> (es => RemoveDotSegments(es(0))),
    "sniff_charset" -> (es => SniffHtmlCharset(es(0), es(1))),
    "charset_decode" -> (es => CharsetDecode(es(0), es(1))))
}
