package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as pure Catalyst column expressions (whole-stage codegen'd;
  * no UDFs in the hot path).
  *
  * The reference scores retrievals with a float32 dot product
  * (`/root/reference/src/svs/kb.py:1185`, `util.py:190-203`) relying on the
  * unit-norm invariant (`kb.py:55-58`) so cosine == dot. We keep the same
  * invariant but compute in double precision for oracle determinism.
  */
object VectorFunctions {

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE> for stable math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product of two ARRAY<DOUBLE> columns — sequential left-to-right
    * fold, same accumulation order as the oracle's list_dot_product.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. Reference: magnitude check `embeddings/util.py:26-41`. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity without the unit-norm assumption. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Scale a vector to unit L2 norm (the index-build normalization that
    * makes cosine collapse to dot at query time — reference kb.py:55-58).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x / n)
  }

  /** |norm - 1| <= tol magnitude validity check (reference tolerance 0.001,
    * kb.py:58).
    */
  def magnitudeOk(a: Column, tol: Double = 0.001): Column =
    abs(l2Norm(a) - lit(1.0)) <= lit(tol)
}
