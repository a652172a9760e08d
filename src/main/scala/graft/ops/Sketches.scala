package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (HyperLogLog, Flajolet et al. 2007) —
  * the pre-aggregation pattern a 100 TB lakehouse uses for distinct
  * counts: each partition/file/day folds its values into a 2^p-register
  * sketch ONCE, and any union of scopes is answered by merging register
  * tables (a groupBy-max) instead of re-scanning raw data. Spark's
  * built-in `approx_count_distinct` answers one query; a PERSISTED
  * register table answers every future slice-union query for free.
  *
  * Everything is engine-portable by construction: the hash is the
  * engine-independent md5-based [[TextAnalysis.hash60]] (60 bits), the
  * bucket is a modulus, and the rank (position of the leading 1 bit) is
  * computed with `bin()` string length — pure integer logic with no
  * floating point, so the register table itself is ORACLE-EXACT
  * (`x25_hll_registers` hash-matches DuckDB). Only the final estimate
  * involves FP, and that stays in a spec-gated error bound.
  */
object Sketches {

  /** HLL register table of a column: (bucket, rho) with one row per
    * NON-EMPTY bucket (absent buckets are rho=0 — the sparse
    * representation a mostly-empty sketch wants). rho = 1 + number of
    * leading zeros of the (60-p)-bit suffix, the HLL rank.
    *
    * Scale shape: one narrow map + one map-side-combinable groupBy-max
    * producing ≤2^p rows, whatever the input size.
    */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val m = 1L << p
    val suffixBits = 60 - p
    val h = TextAnalysis.hash60(col(valueCol).cast("string"))
    // w = suffix of 60-p bits; rho = (suffixBits+1) - bitlength(w);
    // w = 0 (all zeros) -> rho = suffixBits + 1 by convention.
    // Bit ops only (low bits + shiftright — `/` on longs would go
    // through double and lose bits above 2^53), and length(bin(w)) is
    // exact integer logic in both engines — no log2 rounding hazards.
    val bucket = h.bitwiseAND(lit(m - 1))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(w)))
    df.select(bucket.as("bucket"), rho.cast("long").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** Merge any number of register tables (the union-of-scopes query):
    * a groupBy-max — associative, commutative, idempotent, and EXACTLY
    * equal to sketching the unioned raw data (spec-pinned).
    */
  def hllMerge(registers: DataFrame*): DataFrame =
    registers.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))

  /** Cardinality estimate from a register table: the standard HLL
    * estimator with the small-range linear-counting correction
    * (Flajolet et al. §4; the HyperLogLog++ empirical bias table is
    * omitted — the spec gates observed error instead). Driver-side
    * arithmetic over the ≤2^p collected registers.
    */
  def hllEstimate(registers: DataFrame, p: Int = 9): Double = {
    val m = 1 << p
    val regs = new Array[Int](m)
    registers.collect().foreach { r =>
      val bucket = r.getLong(0)
      require(bucket >= 0 && bucket < m,
        s"register bucket $bucket out of range for p=$p (m=$m) — " +
          "estimate p must match the p the register table was built with")
      regs(bucket.toInt) = r.getLong(1).toInt
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
