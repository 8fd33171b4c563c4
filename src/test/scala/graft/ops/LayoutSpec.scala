package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  /** Reference interleave, bit by bit. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("zValue matches a bit-by-bit reference interleave") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
      (12345, 54321), (65535, 65535), (256, 255))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => mortonRef(a, b) })
  }

  test("z-order layout clusters BOTH columns; sort-by-a only one") {
    // uniform 128x128 grid; 16 output partitions
    val grid = spark.range(0, 128 * 128)
      .select(($"id" % 128).cast("int").as("a"),
        ($"id" / 128).cast("int").as("b"))
    def avgSpanB(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("__part", spark_partition_id())
        .groupBy("__part")
        .agg((max($"b") - min($"b")).as("span"))
        .agg(avg($"span")).as[Double].collect().head
    val zed = Layout.zOrderBy(grid, $"a", $"b", numFiles = 16)
    val aSorted = grid.repartitionByRange(16, $"a")
      .sortWithinPartitions($"a")
    val (zSpan, aSpan) = (avgSpanB(zed), avgSpanB(aSorted))
    // 16 z-range partitions of a 128x128 grid are ~4x4 quadrant tiles:
    // each covers ~1/4 of b's domain; sort-by-a partitions span ALL of b
    assert(zSpan < 0.45 * 127, s"z-order b-span too wide: $zSpan")
    assert(aSpan > 0.9 * 127, s"control layout unexpectedly clustered b")
  }

  test("globalRowNumber equals the window formulation, without the funnel") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val df = (1 to 5000)
      .map(i => (i.toLong, rnd.nextInt(200).toDouble)) // heavy score ties
      .toDF("id", "score")
    val got = Layout.globalRowNumber(
      df, Seq($"score".desc, $"id".asc), numPartitions = 8)
    val want = df.withColumn(
      "rn", row_number().over(Window.orderBy($"score".desc, $"id".asc)))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the whole point: work is spread, not funneled through one task
    assert(got.rdd.getNumPartitions > 1,
      "globalRowNumber collapsed to a single partition")
  }

  test("globalRowNumber numbering is dense 1..n and follows the order") {
    val df = spark.range(0, 1000).select(($"id" * 7 % 1000).as("k"))
    val got = Layout.globalRowNumber(df, Seq($"k".asc), 5, as = "rn")
      .orderBy("rn").as[(Long, Long)].collect()
    assert(got.map(_._2).toSeq == (1L to 1000L))
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  /** Independent reference xy→d walk (the classic quadrant/rotate
    * loop) — NOT the Column implementation under test. */
  private def hilbertRef(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0 & 0xFFFFL, y0 & 0xFFFFL, 0L)
    var s = 32768L
    while (s >= 1) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("withHilbert matches an independent reference walk") {
    val pts = (0 until 500).map { i =>
      (i.toLong, (i * 2654435761L) & 0xFFFFL, (i * 40503L + 17) & 0xFFFFL)
    }
    val got = Layout.withHilbert(pts.toDF("id", "x", "y"),
        col("x"), col("y"), "h")
      .select("id", "h").as[(Long, Long)].collect().toMap
    pts.foreach { case (id, x, y) =>
      assert(got(id) == hilbertRef(x, y), s"($x,$y)")
    }
  }

  test("hilbert is a bijection on a dense sub-grid and every " +
      "consecutive step is grid-adjacent (the locality z-order lacks)") {
    val grid = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)
    val ds = Layout.withHilbert(grid.toDF("x", "y"),
        col("x"), col("y"), "h")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    assert(ds.map(_._3).distinct.length == 1024, "index not injective")
    // restrict to the curve prefix that stays inside the 32×32 corner:
    // sort by h; every consecutive pair inside the corner region of
    // the full curve must differ by exactly one grid step
    val inCorner = ds.sortBy(_._3)
    val steps = inCorner.sliding(2).collect {
      case Array((x1, y1, h1), (x2, y2, h2)) if h2 == h1 + 1 =>
        math.abs(x1 - x2) + math.abs(y1 - y2)
    }.toSeq
    assert(steps.nonEmpty && steps.forall(_ == 1L),
      "a consecutive Hilbert step was not grid-adjacent")
    // and the z-curve on the same grid DOES jump (what Hilbert fixes)
    val zJumps = grid.map { case (x, y) => (mortonRef(x.toInt, y.toInt), x, y) }
      .sortBy(_._1).sliding(2).count {
        case Seq((_, x1, y1), (_, x2, y2)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) > 1
        case _ => false
      }
    assert(zJumps > 0, "expected the Morton order to jump somewhere")
  }
}
