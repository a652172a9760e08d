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

  /** Grouped HLL register table: one 2^p sketch PER GROUP, keyed by the
    * given group columns — distinct-count-per-dimension (tokens per
    * source, users per day) without `collect_set`'s unbounded state.
    * Same integer-only construction as [[hllRegisters]], so the table
    * is oracle-exact; ≤ |groups|·2^p rows, map-side combinable, and any
    * union of scopes still merges with a groupBy-max over
    * (group, bucket).
    */
  def hllRegistersGrouped(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    require(groupCols.nonEmpty, "need at least one group column")
    val m = 1L << p
    val suffixBits = 60 - p
    val h = TextAnalysis.hash60(col(valueCol).cast("string"))
    val bucket = h.bitwiseAND(lit(m - 1))
    val w = shiftright(h, p)
    val rho = when(w === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(w)))
    df.select(groupCols.map(col(_)) ++
        Seq(bucket.as("bucket"), rho.cast("long").as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col(_)): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Count-Min sketch register table (Cormode & Muthukrishnan 2005):
    * `depth` hash rows × `width` cells; cell (j, c) holds the summed
    * count of values whose row-j hash lands in c. Point estimates are
    * biased UP only (min over rows bounds the true count from above) —
    * the frequency twin of the HLL: persist the register table once per
    * scope and answer any future "how often does X occur" with d cell
    * lookups, merging scopes with a groupBy-SUM.
    *
    * Integer-only (per-row hash = [[TextAnalysis.hash60]] of the value
    * salted with the row index, cell = hash mod width), so the register
    * table is oracle-exact like the HLL's. ≤ depth·width rows out,
    * one narrow explode + one map-side-combinable sum over the input.
    */
  def cmsRegisters(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    val cells = array((0 until depth).map { j =>
      struct(lit(j.toLong).as("row"),
        pmod(TextAnalysis.hash60(
          concat(col(valueCol).cast("string"), lit(s":cms$j"))),
          lit(width.toLong)).as("cell"))
    }: _*)
    df.select(explode(cells).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge CMS register tables (same depth/width): a groupBy-sum —
    * associative and exactly equal to sketching the concatenated raw
    * data (spec-pinned). */
  def cmsMerge(registers: DataFrame*): DataFrame =
    registers.reduce(_ unionByName _)
      .groupBy(col("row"), col("cell")).agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimate for one value from a collected register
    * table: min over the d cells the value hashes to (absent cell = 0).
    * Never underestimates; overestimate is bounded by collisions
    * (spec-gated). Driver-side over ≤ depth·width rows.
    */
  def cmsEstimate(registers: DataFrame, value: String, depth: Int = 4,
      width: Int = 256): Long = {
    val cells = registers.collect().map { r =>
      val (row, cell) = (r.getLong(0), r.getLong(1))
      require(row >= 0 && row < depth && cell >= 0 && cell < width,
        s"register ($row,$cell) out of range for depth=$depth " +
          s"width=$width — estimate params must match the build's")
      (row, cell) -> r.getLong(2)
    }.toMap
    (0 until depth).map { j =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$value:cms$j").substring(0, 15), 16)
      cells.getOrElse((j.toLong, h % width), 0L)
    }.min
  }

  /** Per-group bottom-k signature (the k smallest [[TextAnalysis.hash60]]
    * values of the group's DISTINCT values — a one-permutation
    * min-hash): the dataset-overlap diagnostic of a training-data
    * pipeline ("how much does source A overlap source B / a new crawl
    * overlap the existing corpus") answered from |groups|·k longs
    * instead of the raw corpora.
    *
    * Scale shape: distinct (one hash shuffle) then a BOUNDED typed
    * aggregator — partial aggregation keeps k values per partition, so
    * only k longs per group cross the final shuffle; no collect_set, no
    * per-group sort of the full value set. Output: (group, slot,
    * minhash) with slot = 0-based ascending rank — integer-exact, so
    * the signature table is oracle-exact.
    */
  def bottomKSignatures(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 16): DataFrame = {
    require(k >= 1 && k <= 1024, s"k must be in [1,1024]: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(col(groupCol).cast("string").as("g"),
        TextAnalysis.hash60(col(valueCol).cast("string")).as("h"))
      .distinct()
      .as[(String, Long)]
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        (String, Long), Seq[Long], Seq[Long]] {
      def zero: Seq[Long] = Vector.empty
      private def insert(b: Seq[Long], h: Long): Seq[Long] = {
        if (b.length < k) (b :+ h).sorted
        else if (h >= b.last) b
        else ((b :+ h).sorted).take(k)
      }
      def reduce(b: Seq[Long], a: (String, Long)): Seq[Long] = insert(b, a._2)
      def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
        (b1 ++ b2).sorted.take(k)
      def finish(b: Seq[Long]): Seq[Long] = b
      def bufferEncoder = implicitly[org.apache.spark.sql.Encoder[Seq[Long]]]
      def outputEncoder = implicitly[org.apache.spark.sql.Encoder[Seq[Long]]]
    }
    hashed.groupByKey(_._1)
      .agg(agg.toColumn.name("sig"))
      .toDF("group", "sig")
      .select(col("group"), posexplode(col("sig")).as(Seq("slot", "minhash")))
      .select(col("group"), col("slot").cast("long").as("slot"),
        col("minhash"))
  }

  /** Pairwise Jaccard estimates between bottom-k signatures: for each
    * group pair, B = the k smallest hashes of the UNION of the two
    * signatures; estimate = |{h ∈ B present in both}| / k (the standard
    * bottom-k estimator, Bar-Yossef et al. 2002). Signature tables are
    * |groups|·k rows, so the self-join is sketch-sized, never
    * corpus-sized. Integer counts + one rounded division → oracle-
    * exact. Output (group_a < group_b, n_shared, est_jaccard@6dp).
    */
  def signatureJaccard(signatures: DataFrame, k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = signatures.select(col("group")).distinct()
    val pairs = groups.alias("x").join(groups.alias("y"),
        col("x.group") < col("y.group"))
      .select(col("x.group").as("ga"), col("y.group").as("gb"))
    // union of the two signatures per pair (shared hashes collapse)
    val unioned = pairs.join(signatures, col("group") === col("ga"))
      .select(col("ga"), col("gb"), col("minhash"))
      .union(pairs.join(signatures, col("group") === col("gb"))
        .select(col("ga"), col("gb"), col("minhash")))
      .distinct()
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("minhash"))
    val shared = signatures.groupBy(col("minhash"))
      .agg(collect_set(col("group")).as("gs"))
    unioned.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .join(shared, "minhash")
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(sum(when(array_contains(col("gs"), col("ga")) &&
          array_contains(col("gs"), col("gb")), 1L).otherwise(0L))
        .as("n_shared"))
      .withColumn("est_jaccard",
        round(col("n_shared").cast("double") / k, 6))
  }
}
