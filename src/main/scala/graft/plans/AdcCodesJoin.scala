package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.VectorQuant

/** WHOLE-OPERATOR custom plan (SURVEY §7.3 tier (c): LogicalPlan +
  * SparkStrategy + SparkPlan): the tagged-union ADC block kernel as a
  * first-class physical operator whose children are CO-PARTITIONED BY
  * THE PLANNER instead of by an explicit `repartition`.
  *
  * Why a custom node at all — the measured r7 finding: the blocked ADC
  * kernel (`VectorQuant.knnJoinIvfPq`) is the right execution shape
  * (no per-pair row ever materializes), but its `union → repartition`
  * formulation forces BOTH inputs through an exchange every call, even
  * when the codes table is already laid out by `cid` (a bucketed
  * catalog table — at 100 TB the codes are ~1.5 TB that would cross
  * the wire per join). The relational formulation consumes the
  * bucketed layout exchange-free but materializes a row per candidate
  * PAIR — measured 2.7× slower at 10k×1M because each pair row copies
  * the query blob. Neither composition gets both properties; this node
  * does:
  *
  *   - `requiredChildDistribution` = ClusteredDistribution(cid) on
  *     both children, so `EnsureRequirements` plans the exchanges: a
  *     bucketed codes scan (`HashPartitioning(cid, n)`) satisfies its
  *     side for free and only the probe side shuffles — the planner
  *     decision the DataFrame-level kernel cannot express;
  *   - `doExecute` zips the co-partitioned children and runs the block
  *     kernel: per partition, each probe's m×ncodes ADC lookup table
  *     is built once, codes stream past all of that cid's probes, and
  *     per-query bounded heaps keep top-`sel` — pair space enumerated
  *     in a loop, never as rows.
  *
  * Output: (qid, cand_id, adc) per-partition partial top-`sel` rows —
  * the same contract as the kernel's partial stage; callers merge per
  * query and exact-rerank (`VectorQuant.knnJoinIvfPqBucketed`).
  * Memory: probes-per-partition × m×ncodes×8 B of lookup tables, the
  * kernel's documented contract.
  */
case class AdcCodesJoin(left: LogicalPlan, right: LogicalPlan,
    books: VectorQuant.Codebooks, sel: Int,
    // output lives in the constructor so tree copies (analyzer/
    // optimizer withNewChildren) PRESERVE the expression ids — a
    // fresh-`val` output would mint new ids on every copy and break
    // every downstream binding (the classic custom-node pitfall)
    output: Seq[Attribute] = AdcCodesJoin.freshOutput()) extends BinaryNode {
  require(sel >= 1, s"sel must be >= 1, got $sel")
  // the output attrs are PRODUCED here, not derived from the children —
  // without this CheckAnalysis flags them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AdcCodesJoin =
    copy(left = newLeft, right = newRight)
}

object AdcCodesJoin {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("cand_id", LongType, nullable = false)(),
    AttributeReference("adc", DoubleType, nullable = false)())
}

/** Planner strategy for [[AdcCodesJoin]] — registered per-session via
  * `spark.experimental.extraStrategies` (no config needed; the facade
  * installs it idempotently) and also injectable through
  * [[graft.GraftExtensions]].
  */
object AdcCodesJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AdcCodesJoin =>
      AdcCodesJoinExec(planLater(j.left), planLater(j.right),
        j.books, j.sel, j.output) :: Nil
    case _ => Nil
  }

  /** Idempotently add this strategy to the session's planner. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
}

case class AdcCodesJoinExec(left: SparkPlan, right: SparkPlan,
    books: VectorQuant.Codebooks, sel: Int,
    output: Seq[Attribute]) extends BinaryExecNode {

  // probes child: (qid LONG, qv BINARY, cid LONG, qc DOUBLE)
  // codes child:  (cid LONG, id LONG, code BINARY)
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(left.output(2))),
    ClusteredDistribution(Seq(right.output.head)))

  // both children sorted by cid, so doExecute streams them in a
  // SortMergeJoin-like sweep: only the CURRENT cid block's probe ADC
  // tables are resident (probes-per-list × m×ncodes×8 B), matching the
  // DataFrame kernel's memory contract. Without this the node held
  // every cid's tables for the whole partition at once — measured as
  // a ~250 MB-per-partition GC drag at 10k×1M.
  override def requiredChildOrdering: Seq[Seq[org.apache.spark.sql.catalyst.expressions.SortOrder]] = Seq(
    Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
      left.output(2), org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
      right.output.head, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val m = books.length
    val dsub = if (m == 0 || books(0).isEmpty) 0 else books(0)(0).length
    val bcB = sparkContext.broadcast(books)
    val selN = sel
    left.execute().zipPartitions(right.execute()) { (pIt0, cIt) =>
      val bs = bcB.value
      val flats = bs.map(VectorQuant.flattenBook)
      val pIt = pIt0.buffered
      def buildTable(q: Array[Float]): Array[Array[Double]] =
        Array.tabulate(m) { s =>
          if ((s + 1) * dsub <= q.length) {
            val fl = flats(s)
            Array.tabulate(fl._2.length)(j => graft.functions.VecKernels
              .dotFloatsAt(fl._1, j * dsub, q, s * dsub, dsub))
          } else bs(s).map { c =>
            var acc = 0.0
            var i = 0
            while (i < dsub && s * dsub + i < q.length) {
              acc += q(s * dsub + i).toDouble * c(i).toDouble; i += 1
            }
            acc
          }
        }
      // (score desc, cand asc)-best heaps, worst at head — the same
      // tie discipline as the DataFrame kernel
      val worstFirst = new Ordering[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c1 = java.lang.Double.compare(b._1, a._1)
          if (c1 != 0) c1 else java.lang.Long.compare(a._2, b._2)
        }
      }
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      // current cid block's probe state: (qid, q·c offset, ADC table)
      var curCid = Long.MinValue
      val blockQ = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Double, Array[Array[Double]])]
      cIt.foreach { row =>
        val cid = row.getLong(0)
        if (cid != curCid) {
          blockQ.clear()
          // advance the sorted probe stream to this cid block
          while (pIt.hasNext && pIt.head.getLong(2) < cid) pIt.next()
          while (pIt.hasNext && pIt.head.getLong(2) == cid) {
            val p = pIt.next()
            blockQ += ((p.getLong(0), p.getDouble(3),
              buildTable(graft.functions.FloatVecDot.unpack(p.getBinary(1)))))
          }
          curCid = cid
        }
        if (blockQ.nonEmpty) {
          val id = row.getLong(1)
          val code = row.getBinary(2)
          var j = 0
          while (j < blockQ.length) {
            val (qid, off, t) = blockQ(j)
            var adc = off
            var si = 0
            while (si < m) { adc += t(si)(code(si) & 0xff); si += 1 }
            val h = heaps.getOrElseUpdate(qid,
              scala.collection.mutable.PriorityQueue.empty(worstFirst))
            if (h.size < selN) h.enqueue((adc, id))
            else if (worstFirst.compare((adc, id), h.head) < 0) {
              h.dequeue(); h.enqueue((adc, id))
            }
            j += 1
          }
        }
      }
      // downstream operators expect UnsafeRows; project through a
      // reused buffer (consumers serialize each row before pulling the
      // next — the standard exec-node emission contract)
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(
          Array[org.apache.spark.sql.types.DataType](
            LongType, LongType, DoubleType))
      val buf = new GenericInternalRow(3)
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (s, c2) =>
          buf.setLong(0, qid)
          buf.setLong(1, c2)
          buf.setDouble(2, s)
          toUnsafe(buf): InternalRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AdcCodesJoinExec =
    copy(left = newLeft, right = newRight)
}
