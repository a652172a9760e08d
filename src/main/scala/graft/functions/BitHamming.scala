package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Codegen'd Hamming distance over packed sign-bit codes — the 1-bit
  * tier of the quantization ladder (f32 → int8 → PQ → sign bits). A
  * 1536-d embedding shrinks 6 KB → 192 B (32×), and the scan kernel is
  * pure XOR + popcount, so a binary prefilter pass is memory-bound on
  * 3% of the f32 bytes. Hamming distance between sign codes is a
  * monotone estimator of angular distance (Charikar, STOC 2002,
  * sign-random-projection LSH — here the hyperplanes are the axis
  * directions, the same convention as `SimilaritySearch.signBucket`);
  * exact ordering is restored by an f32 re-rank of the survivors.
  *
  * Sibling of [[Int8VecDot]]/[[FloatVecDot]]: BinaryType operands,
  * participates in whole-stage codegen via a static JVM kernel.
  */
case class BitHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BitHamming requires (binary, binary), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitHamming.dist(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.BitHamming.dist($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitHamming =
    copy(left = newLeft, right = newRight)
}

object BitHamming {

  /** XOR + popcount over the common prefix, 8 bytes at a time via a
    * little-endian long view; the sub-8 tail is folded byte-wise.
    * `Long.bitCount` JITs to a single POPCNT instruction.
    */
  def dist(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var acc = 0
    var i = 0
    val nWords = n >>> 3
    var w = 0
    while (w < nWords) {
      var xa = 0L
      var xb = 0L
      var j = 0
      while (j < 8) {
        xa |= (a(i + j) & 0xffL) << (j << 3)
        xb |= (b(i + j) & 0xffL) << (j << 3)
        j += 1
      }
      acc += java.lang.Long.bitCount(xa ^ xb)
      i += 8
      w += 1
    }
    while (i < n) {
      acc += Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    acc
  }

  /** Pack sign bits (x > 0, matching `signBucket`'s convention — NaN
    * compares false, so NaN components contribute a 0 bit) into
    * ceil(d/8) bytes, dimension i at byte i/8 bit i%8.
    */
  def signPack(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) >>> 3)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) out(i >>> 3) = (out(i >>> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  def bitHamming(a: Column, b: Column): Column =
    ColumnBridge.column(BitHamming(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
