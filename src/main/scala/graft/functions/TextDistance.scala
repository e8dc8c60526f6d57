package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-distance scalars beyond Spark's built-ins. */
object TextImpls {

  /** Jaro-Winkler similarity, mirroring the reference byte-wise loop
    * (`/root/reference/apoc/text/text.go:251-320`): half-max match window,
    * greedy match marking, transpositions/2 integer division, and the
    * ≤4-char common-prefix boost at 0.1.
    */
  def jaroWinkler(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.getBytes
    val s2 = u2.getBytes
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    if (s1.length == 0 || s2.length == 0) return 0.0

    val matchWindow = math.max(math.max(s1.length, s2.length) / 2 - 1, 1)
    val m1 = new Array[Boolean](s1.length)
    val m2 = new Array[Boolean](s2.length)
    var matches = 0
    var i = 0
    while (i < s1.length) {
      var j = math.max(0, i - matchWindow)
      val end = math.min(i + matchWindow + 1, s2.length)
      var found = false
      while (j < end && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    var transpositions = 0
    var k = 0
    i = 0
    while (i < s1.length) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) transpositions += 1
        k += 1
      }
      i += 1
    }

    val jaro = (matches.toDouble / s1.length + matches.toDouble / s2.length +
      (matches - transpositions / 2).toDouble / matches) / 3.0

    var prefix = 0
    var p = 0
    val lim = math.min(math.min(s1.length, s2.length), 4)
    var break = false
    while (p < lim && !break) {
      if (s1(p) == s2(p)) prefix += 1 else break = true
      p += 1
    }
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Reference soundex (`/root/reference/apoc/text/text.go:610-650`). It
    * differs from the ANSI soundex Spark ships: the reference resets
    * `prevCode` on ANY unmapped character — vowels AND H/W — so repeated
    * same-code consonants separated by H/W are coded twice ('Ashcraft' →
    * A226, where standard soundex gives A261). Kept byte-wise like the Go
    * loop (first byte of the upper-cased text is emitted verbatim).
    */
  def refSoundex(u: UTF8String): UTF8String = {
    val s = u.toUpperCase.getBytes
    if (s.length == 0) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](4)
    out(0) = s(0)
    var len = 1
    var prevCode = codeOf(s(0))
    var i = 1
    while (i < s.length && len < 4) {
      val code = codeOf(s(i))
      if (code != 0 && code != prevCode) {
        out(len) = code; len += 1; prevCode = code
      } else if (code == 0) {
        prevCode = 0
      }
      i += 1
    }
    while (len < 4) { out(len) = '0'; len += 1 }
    UTF8String.fromBytes(out)
  }

  private def codeOf(b: Byte): Byte = (b: @annotation.switch) match {
    case 'B' | 'F' | 'P' | 'V' => '1'
    case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => '2'
    case 'D' | 'T' => '3'
    case 'L' => '4'
    case 'M' | 'N' => '5'
    case 'R' => '6'
    case _ => 0
  }
}

/** refSoundex(s) → the reference's soundex variant (text.go:610). */
case class RefSoundexExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override protected def nullSafeEval(a: Any): Any =
    TextImpls.refSoundex(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TextImpls$$.MODULE$$.refSoundex($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** jaroWinkler(s1, s2) → similarity in [0, 1]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextImpls.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextImpls$$.MODULE$$.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
