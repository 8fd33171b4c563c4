package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators Spark has no native form of
  * (the brief's custom-operator ladder, option a: composed from
  * existing ops, because the built-ins CAN express the semantics
  * scalably).
  *
  * The naive formulations are inequality joins, which Spark plans as
  * nested-loop — quadratic per key. Both operators here reduce to
  * equi-shuffles:
  *
  *  - as-of: union both sides, ONE shuffle+sort per key, carry the
  *    last right-side value forward with a running window — the
  *    merge-join formulation, O(n log n) per key partition;
  *  - range: map each side into overlapping bins of width >= the max
  *    range span, equi-join on (key?, bin), then apply the residual
  *    predicate — the standard binning trick that turns a theta join
  *    into an equi join plus a bounded local filter.
  */
object TemporalJoins {

  /** For every left row, attach the LATEST right row at or before the
    * left row's time, per key ("most recent prior observation").
    *
    * @param left     probe side; keeps all its rows
    * @param right    reference side; its `payload` columns are carried
    * @param keyCol   equi-key column name present on both sides
    * @param timeCol  orderable time column name present on both sides
    * @param payload  right-side columns to attach (null when no right
    *                 row at or before the left time)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // union both sides: right rows carry payload, left rows carry
    // nulls; a right row at the same instant sorts BEFORE the left row
    // (is_left breaks the tie) so "at or before" includes ties
    val taggedLeft = left
      .withColumn("__is_left", lit(1))
      .select((leftCols.map(col) :+ col("__is_left")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType)
          .as(s"__p_$p")): _*)
    val taggedRight = right
      .withColumn("__is_left", lit(0))
      .select((leftCols.map(c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__is_left")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, p) =>
        df.withColumn(s"__c_$p", last(col(s"__p_$p"), ignoreNulls = true)
          .over(w))
    }
    carried
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__c_$p").as(p)): _*)
  }

  /** Join rows to the dimension band containing their value:
    * `lo <= value < hi`, reduced to an equi-join on the bin index.
    * Bands are exploded into every `binWidth`-sized bin they touch
    * (a band spanning many bins fans out accordingly — pick binWidth
    * near the typical band span), and the residual predicate filters
    * locally after the equi-join — no nested-loop, one shuffle (or
    * none when the band side is broadcast, the common case).
    *
    * @param broadcastBands Some(true) forces the broadcast hint,
    *   Some(false) forces a shuffled sort-merge join; None (default)
    *   broadcasts only when the band table's estimated size TIMES the
    *   measured bin fan-out fits `spark.sql.autoBroadcastJoinThreshold`
    *   (one cheap aggregation over the dimension-sized band table at
    *   plan time) — an unconditional hint would drive the driver OOM
    *   on a large or wide-band side instead of degrading to a shuffled
    *   equi-join.
    */
  def bandJoin(
      facts: DataFrame, valueCol: String,
      bands: DataFrame, loCol: String, hiCol: String,
      binWidth: Double,
      broadcastBands: Option[Boolean] = None): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = facts.withColumn(
      "__bin", floor(col(valueCol) / binWidth).cast("long"))
    val bandBins = bands
      .withColumn("__lo_bin", floor(col(loCol) / binWidth).cast("long"))
      .withColumn("__hi_bin",
        floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))
      .withColumn("__bin",
        explode(sequence(col("__lo_bin"), greatest(col("__hi_bin"),
          col("__lo_bin")))))
      .drop("__lo_bin", "__hi_bin")
    val build = broadcastBands match {
      case Some(true) => broadcast(bandBins)
      case Some(false) => bandBins.hint("merge")
      case None =>
        // gate on the POST-explode size: the optimizer's pre-explode
        // estimate misses the (hi-lo)/binWidth fan-out, which can be
        // orders of magnitude (a wide band over a narrow binWidth).
        // One cheap aggregation over the dimension-sized band table
        // counts the exploded rows exactly.
        val est = bands.queryExecution.optimizedPlan.stats.sizeInBytes
        val counted = bands.select(
          count(lit(1)).as("__n"),
          sum(greatest(
            floor((col(hiCol) - lit(1e-9)) / binWidth) -
              floor(col(loCol) / binWidth) + 1,
            lit(1L))).as("__exploded")).head()
        val bandRows = counted.getLong(0)
        val explodedRows =
          if (counted.isNullAt(1)) 0L
          else counted.get(1) match {
            case l: java.lang.Long => l.longValue()
            case d: java.math.BigDecimal => d.longValue()
            case other => other.toString.toDouble.toLong
          }
        val fanout =
          if (bandRows == 0L) 1.0
          else explodedRows.toDouble / bandRows
        val postExplodeEst = (BigDecimal(est) * fanout).toBigInt
        val raw = facts.sparkSession.conf
          .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        // "-1" disables broadcast; JavaUtils rejects negative strings
        val threshold =
          if (raw.trim.startsWith("-")) -1L
          else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        if (threshold > 0 && postExplodeEst <= threshold) broadcast(bandBins)
        // Catalyst's own estimate of the Generate output misses the
        // fan-out too, so declining the hint is not enough — force the
        // shuffle join or the planner auto-broadcasts the inflated side
        else bandBins.hint("merge")
    }
    binned
      .join(build, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
