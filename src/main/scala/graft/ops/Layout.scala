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

  /** Hilbert-curve index of the low 16 bits of (a, b) — the
    * better-locality alternative to [[zValue]]: consecutive Hilbert
    * cells are always GRID-ADJACENT (the z-curve jumps across the
    * space at every power-of-two boundary), so range-partitioned
    * files cover tighter rectangles and min/max pruning discards
    * more. The classic non-recursive xy→d walk (16 levels of
    * quadrant pick + rotate/flip) unrolled as 16 PROJECTION STAGES —
    * each level's (x, y, d, rx, ry) materialize as attributes before
    * the next level references them, so the plan stays linear
    * (Catalyst's CollapseProject keeps multi-referenced non-trivial
    * aliases staged; a single nested expression tree would grow
    * 3^16 nodes). The quadrant term (3·rx)⊕ry is computed as a CASE
    * over the four (rx, ry) cells — no XOR dialect dependence — so
    * the DuckDB oracle replays the identical 16-level chain as CTEs.
    *
    * Scale shape: map-side only, codegen'd bit ops, no UDF. */
  def withHilbert(
      df: DataFrame, a: Column, b: Column, out: String): DataFrame = {
    val full = 65535L // n-1 for the 2^16 grid
    var cur = df
      .withColumn("__hx", a.bitwiseAND(lit(full)))
      .withColumn("__hy", b.bitwiseAND(lit(full)))
      .withColumn("__hd", lit(0L))
    var s = 32768L
    while (s >= 1L) {
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
            .otherwise(lit(0L)))
      // quadrant term (3·rx) xor ry over the four cells
      val q = when(col("__rx") === 0 && col("__ry") === 0, lit(0L))
        .when(col("__rx") === 0, lit(1L))
        .when(col("__ry") === 0, lit(3L))
        .otherwise(lit(2L))
      val nx = when(col("__ry") === 1, col("__hx"))
        .otherwise(when(col("__rx") === 1, lit(full) - col("__hy"))
          .otherwise(col("__hy")))
      val ny = when(col("__ry") === 1, col("__hy"))
        .otherwise(when(col("__rx") === 1, lit(full) - col("__hx"))
          .otherwise(col("__hx")))
      cur = cur
        .withColumn("__hd2", col("__hd") + lit(s * s) * q)
        .withColumn("__hx2", nx)
        .withColumn("__hy2", ny)
        .drop("__hd", "__hx", "__hy", "__rx", "__ry")
        .withColumnRenamed("__hd2", "__hd")
        .withColumnRenamed("__hx2", "__hx")
        .withColumnRenamed("__hy2", "__hy")
      s /= 2
    }
    cur.drop("__hx", "__hy").withColumnRenamed("__hd", out)
  }

  /** The DuckDB replay of [[withHilbert]]: one CTE per level, same
    * CASE arithmetic. `src` must yield (keyCols…, x, y). Returns the
    * full `WITH h0 … SELECT keyCols…, d AS out FROM h16` text. */
  def hilbertOracleSql(
      src: String, keyCols: Seq[String], out: String): String = {
    val keys = keyCols.mkString(", ")
    val levels = (0 until 16).map { i =>
      val s = 32768L >> i
      val rx = s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END"
      s"""h${i + 1} AS (
         |  SELECT $keys,
         |    CASE WHEN $ry = 1 THEN x
         |         WHEN $rx = 1 THEN 65535 - y ELSE y END AS x,
         |    CASE WHEN $ry = 1 THEN y
         |         WHEN $rx = 1 THEN 65535 - x ELSE x END AS y,
         |    d + ${s * s} * (CASE WHEN $rx = 0 AND $ry = 0 THEN 0
         |         WHEN $rx = 0 THEN 1
         |         WHEN $ry = 0 THEN 3 ELSE 2 END) AS d
         |  FROM h$i)""".stripMargin
    }
    s"""WITH h0 AS (
       |  SELECT $keys, x & 65535 AS x, y & 65535 AS y, 0::BIGINT AS d
       |  FROM ($src)),
       |${levels.mkString(",\n")}
       |SELECT $keys, d AS $out FROM h16""".stripMargin
  }

  /** [[zOrderBy]]'s Hilbert twin: range-partition + sort by the
    * Hilbert index so each output file covers a compact, CONNECTED
    * region of (a, b) space. */
  def hilbertOrderBy(
      df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame =
    withHilbert(df, a, b, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")

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
