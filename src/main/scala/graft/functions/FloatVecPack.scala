package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** ARRAY<FLOAT> → packed little-endian f32 BINARY (the reference's
  * `embedding_to_bytes`, `/root/reference/src/svs/embeddings/util.py:15-16`).
  * Runs once per stored vector at index-build time, so CodegenFallback is
  * fine — the hot loop is [[FloatVecDot]] on the packed form.
  */
case class FloatVecPack(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"FloatVecPack requires array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    FloatVecDot.pack(v.asInstanceOf[ArrayData].toFloatArray())

  override protected def withNewChildInternal(c: Expression): FloatVecPack =
    copy(child = c)
}

object FloatVecPack {
  def floatVecPack(c: Column): Column =
    ColumnBridge.column(FloatVecPack(ColumnBridge.expression(c)))
}
