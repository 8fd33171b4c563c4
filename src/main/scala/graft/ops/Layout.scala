package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Multi-dimensional data layout: z-order (Morton) interleaving so a
  * range-partitioned, sorted-within-partition write clusters BOTH key
  * columns — parquet min/max row-group pruning then works for filters
  * on either column, not just the leading sort key (the lakehouse
  * OPTIMIZE ZORDER technique, public Delta/Iceberg/Hudi feature, here
  * as plain Spark expressions).
  *
  * The interleave is the classic magic-mask bit spread — five
  * shift-and-mask steps per column, all `shiftleft`/`&`/`|` Catalyst
  * expressions (codegen'd, no UDF), byte-reproducible in any engine
  * with integer bit ops, which is what the DuckDB oracle checks.
  *
  * Scale shape: computing z-values is map-side; the write path is one
  * `repartitionByRange(z)` (range exchange with sampled bounds) +
  * `sortWithinPartitions(z)` — the same single shuffle any sorted
  * write costs, but every output file ends up a small rectangle in
  * (a, b) space instead of a stripe in a only.
  */
object Layout {

  /** Spread the low 16 bits of `v` onto even bit positions (0,2,…,30).
    * Magic masks: 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555. */
  def spreadBits16(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value interleaving the low 16 bits of `a` (even
    * positions) and `b` (odd positions). Callers with wider domains
    * bucket first (e.g. `col % 65536`, or a rank); 16 bits per
    * dimension is plenty to steer file-level clustering. */
  def zValue(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** Lay `df` out in z-order over `(a, b)` across `numFiles` output
    * partitions: range-partition then sort by the z-value so each file
    * covers a compact rectangle of the key space. Write the result
    * with any sink; drop the helper column after layout is fixed. */
  def zOrderBy(
      df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Global 1-based row number in the total order given by `sortCols`
    * — `row_number() OVER (ORDER BY ...)` semantics WITHOUT the
    * empty-partition window's Exchange SinglePartition, which funnels
    * the whole table through one task and is the classic global-sort
    * scale killer.
    *
    * Shape: one range exchange (sampled bounds) + in-partition sort —
    * the same single shuffle any total-order sort costs, spread over
    * `numPartitions` tasks — then `zipWithIndex` stitches the global
    * index from per-partition counts. zipWithIndex runs one extra
    * small job to count partitions; both jobs share the range
    * exchange's shuffle files (the map stage is skipped on the second
    * pass), so the input is scanned and shuffled once. The in-partition
    * sort re-runs on the second pass — at 100 TB trade that for a
    * `persist(DISK_ONLY)` of the sorted frame if the sort dominates.
    *
    * `sortCols` must be a TOTAL order (append a unique tiebreak) or
    * the assigned numbers are nondeterministic within ties — same
    * contract as the SQL window.
    */
  def globalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int,
      as: String = "rn"): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    val sorted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(
      indexed, sorted.schema.add(StructField(as, LongType, nullable = false)))
  }
}
