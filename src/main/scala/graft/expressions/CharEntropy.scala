package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row Shannon character entropy in integer MICRO-NATS:
  *
  *   e6 = (Σ_c cnt_c · ⌊ln(n / cnt_c)·10⁶⌋) div n
  *
  * over the document's CODEPOINT histogram (n = codepoint count) — the
  * compressibility signal a quality pipeline reads next to length and
  * stop-word ratios: template boilerplate and repeated-character spam sit
  * near 0 nats, natural prose around 3–4.2, uniform noise near ln(Σ) —
  * the same ordering a gzip-ratio filter (C4-style) induces, but exactly
  * replayable by a SQL oracle because the one transcendental per distinct
  * character is floor-quantized THE MOMENT it is computed (the engine's
  * q69 rule) and everything after is integer arithmetic. Empty input → 0.
  *
  * One compiled per-row loop (histogram + term sum): computed in the
  * scan's task with ZERO shuffle at any corpus size — the declarative
  * explode-and-groupBy form shuffles one row per CHARACTER.
  */
case class CharEntropyMicroNats(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val hist = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      hist(cp.toLong) = hist.getOrElse(cp.toLong, 0L) + 1L
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) 0L
    else {
      var acc = 0L
      hist.foreachValue { c =>
        acc += c * math.floor(math.log(n.toDouble / c.toDouble) * 1000000.0).toLong
      }
      acc / n
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicroNats =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}
