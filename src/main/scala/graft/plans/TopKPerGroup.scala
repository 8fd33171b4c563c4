package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: top-k rows PER GROUP by (score desc,
  * tie asc), with a 1-based `rank` column appended — the ladder's
  * option (c): LogicalPlan + Strategy + physical exec.
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(...))`
  * SORTS every candidate row of every group (O(n log n) per group,
  * full materialization before the filter drops all but k). This
  * operator keeps a bounded k-element heap per group in one pass —
  * O(n log k) and O(groups × k) memory — which is the difference
  * between "sort 2M scored candidates to keep 50" and "stream them".
  * Physically it plans as a partial/final pair (like HashAggregate):
  * a map-side heap below the exchange keeps ≤ k per group per input
  * partition, the final heap above the exchange merges survivors — so
  * the shuffle carries at most partitions × groups × k rows, and a
  * low-cardinality (or constant) group key never funnels the full
  * frame through one task. The final declares ClusteredDistribution
  * on the group key, so EnsureRequirements plans the same single
  * shuffle a window would, and AQE still manages it.
  *
  * Deterministic: total order (score desc, tie asc) must be a total
  * order over rows within a group (pass a unique tie column), so the
  * result equals the window formulation row-for-row (spec-asserted).
  */
case class TopKPerGroupNode(
    groupCols: Seq[Expression],
    scoreCol: Expression, // DoubleType, descending
    tieCol: Expression,   // LongType, ascending tie-break
    k: Int,
    rankAttr: AttributeReference, // constructor param: the exprId must
                                  // survive tree copies or downstream
                                  // references to `rank` dangle
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced HERE, not consumed — without this it lands in
  // `references` (it's an Expression constructor arg) and CheckAnalysis
  // reports it missing from the child's input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** The bounded-heap pass shared by the partial and final execs. */
private[plans] object TopKHeap {
  type Entry = (Long, Long, UnsafeRow) // (score key, tie, row)

  /** Total-order sort key over Double scores matching Spark's ordering
    * semantics for a DESC sort: NaN greatest (above +Inf, ranks FIRST
    * desc), null smallest (below -Inf, ranks LAST desc = NULLS LAST).
    * Standard doubleToLongBits monotone remap; null → Long.MinValue,
    * strictly below the -Inf key (0x800FFFFFFFFFFFFF).
    */
  def scoreKey(raw: Any): Long = raw match {
    case null => Long.MinValue
    case d: java.lang.Double =>
      val bits = java.lang.Double.doubleToLongBits(d)
      if (bits < 0) bits ^ 0x7fffffffffffffffL else bits
    case other => throw new IllegalStateException(
      s"score evaluated to non-Double ${other.getClass.getName}")
  }

  // max under this ordering = WORST kept row (smallest score key,
  // then largest tie) — so heap.head is the eviction candidate
  val heapOrd: Ordering[Entry] = new Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int = {
      val c = java.lang.Long.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  /** One pass over a partition: a k-bounded heap per group key.
    * O(n log k) time, O(groups-in-partition × k) memory. */
  def build(
      iter: Iterator[InternalRow],
      childOutput: Seq[Attribute],
      groupCols: Seq[Expression],
      scoreCol: Expression,
      tieCol: Expression,
      k: Int): scala.collection.mutable.LinkedHashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]] = {
    val groupProj = UnsafeProjection.create(groupCols, childOutput)
    val scoreBound = BindReferences.bindReference(scoreCol, childOutput)
    val tieBound = BindReferences.bindReference(tieCol, childOutput)
    val heaps = scala.collection.mutable.LinkedHashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]
    iter.foreach { row =>
      val score = scoreKey(scoreBound.eval(row))
      val tie = tieBound.eval(row).asInstanceOf[Long]
      val keyRef = groupProj(row)
      val heap = heaps.get(keyRef) match {
        case Some(h) => h
        case None =>
          val h = scala.collection.mutable
            .PriorityQueue.empty[Entry](heapOrd)
          heaps.put(keyRef.copy(), h)
          h
      }
      if (heap.size < k) {
        heap.enqueue((score, tie, row.asInstanceOf[UnsafeRow].copy()))
      } else {
        val (ws, wt, _) = heap.head
        if (score > ws || (score == ws && tie < wt)) {
          heap.dequeue()
          heap.enqueue((score, tie, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
    }
    heaps
  }
}

/** Map-side partial: keeps ≤ k rows per group per INPUT partition with
  * no distribution requirement, so it runs below the exchange
  * EnsureRequirements inserts for the final exec — the partial/final
  * split HashAggregate uses. The shuffle then carries at most
  * partitions × groups × k survivors instead of the full frame, which
  * is what keeps a low-cardinality group (including a constant global
  * group, e.g. Skew.hotKeys) from funneling everything through one
  * task. Emits rows unranked and unordered; the final heap re-selects.
  */
case class TopKPerGroupPartialExec(
    groupCols: Seq[Expression],
    scoreCol: Expression,
    tieCol: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // a map-side pass: a child already clustered on the group key must
  // keep advertising it, or EnsureRequirements plans a redundant
  // exchange above us
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions({ iter =>
      TopKHeap.build(iter, childOutput, groupCols, scoreCol, tieCol, kLocal)
        .iterator.flatMap { case (_, heap) => heap.iterator.map(_._3) }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    scoreCol: Expression,
    tieCol: Expression,
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions ({ iter =>
      val outProj = UnsafeProjection.create(
        childOutput.map(a => a: Expression) :+ rankAttr, childOutput :+ rankAttr)
      val heaps =
        TopKHeap.build(iter, childOutput, groupCols, scoreCol, tieCol, kLocal)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val best: Seq[TopKHeap.Entry] = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case ((_, _, row), i) =>
          outProj(joined(row, InternalRow(i + 1))).copy()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, s, t, k, rank, child) =>
      // partial below the (EnsureRequirements-inserted) exchange,
      // final above — mirroring partial/final HashAggregate
      TopKPerGroupExec(g, s, t, k, rank,
        TopKPerGroupPartialExec(g, s, t, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Idempotently add the planner strategy to a live session
    * (`experimental.extraStrategies` is the public hook). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKStrategy
    }
  }

  /** Top-k rows per group by (score desc, tie asc), `rank` appended.
    * `tie` must be unique within a group for deterministic output.
    * Columns are referenced by name and resolved here against the
    * child's analyzed output — handing the node pre-resolved
    * attributes, since analyzer rules don't reach inside expressions
    * of unknown operators. */
  def topK(
      df: DataFrame,
      groupCols: Seq[String],
      score: String,
      tie: String,
      k: Int): DataFrame = {
    // same rationale as the type checks below: k <= 0 would only fail
    // mid-job (empty-heap head in every task)
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val lp = Bridge.logicalPlan(df)
    def attr(n: String): Expression = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    // The physical exec evals these as primitive Double/Long — a wrong
    // type would only surface as a runtime ClassCastException mid-job.
    // Validate here against the analyzed schema instead.
    val scoreType = attr(score).dataType
    require(scoreType == org.apache.spark.sql.types.DoubleType,
      s"score column '$score' must be DoubleType, got $scoreType " +
        "(cast it explicitly)")
    val tieType = attr(tie).dataType
    require(tieType == org.apache.spark.sql.types.LongType,
      s"tie column '$tie' must be LongType, got $tieType " +
        "(cast it explicitly)")
    Bridge.ofRows(spark, TopKPerGroupNode(
      groupCols.map(attr),
      attr(score),
      attr(tie),
      k,
      AttributeReference("rank", IntegerType, nullable = false)(),
      lp))
  }
}
