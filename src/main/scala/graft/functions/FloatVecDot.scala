package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Codegen'd float32 dot product over packed little-endian vectors.
  *
  * The reference stores vectors as little-endian float32 blobs and scores
  * with a C-backed matrix·vector product
  * (`/root/reference/src/svs/kb.py:80-83`, `kb.py:1185`,
  * `embeddings/util.py:15-23`). The Spark-native equivalent of that hot
  * kernel: a BinaryType column of packed f32 plus this custom Catalyst
  * `Expression`, whose generated code is a tight primitive loop — no
  * per-element array boxing, no UDF serialization, and it participates in
  * whole-stage codegen (SURVEY §7.3's flag-gated upgrade path over the
  * `aggregate(zip_with(...))` formulation).
  *
  * Accumulates in double precision (like NumPy's dot on f32 inputs
  * promoted per-element then summed in f32; we keep double for
  * determinism with the oracle — document the ±1ulp-scale divergence from
  * the reference's f32 accumulate).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FloatVecDot requires (binary, binary), got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    FloatVecDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.FloatVecDot.dot($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {

  /** The kernel the generated code calls: little-endian f32 pairwise
    * product, f64 accumulate. Dispatches to the SIMD (Panama) or
    * VarHandle-scalar implementation in [[VecKernels]] — see there for
    * the accumulation-order contract.
    */
  def dot(a: Array[Byte], b: Array[Byte]): Double = VecKernels.dot(a, b)

  /** Pack a float array into the little-endian blob form (the reference's
    * `embedding_to_bytes`, `embeddings/util.py:15-16`).
    */
  def pack(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 4)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(v)
    out
  }

  /** Inverse (`embedding_from_bytes`, `embeddings/util.py:19-23`). */
  def unpack(b: Array[Byte]): Array[Float] = {
    require(b.length % 4 == 0, s"blob length ${b.length} not multiple of 4")
    val out = new Array[Float](b.length / 4)
    java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(out)
    out
  }

  /** Column API: dot of two packed-f32 BINARY columns. */
  def floatVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
