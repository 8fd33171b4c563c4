package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with a SIGN matrix
  * (Achlioptas, "Database-friendly random projections", PODS'01:
  * entries ±1 preserve pairwise distances in expectation like
  * Gaussian entries, with integer arithmetic). The dimensionality
  * pre-step for embedding pipelines: project 64-d vectors to 16-d
  * before clustering/LSH when full-dimension distance is too
  * expensive per pair.
  *
  * Determinism contract: the sign matrix derives from md5 — the SAME
  * digest both the JVM (driver-side, once, dimension²-sized) and the
  * DuckDB oracle (a range×range CTE) compute, so the matrix is
  * engine-portable without shipping literals through SQL. Vector
  * components are snapped to the 1e-9 grid as BIGINT micro-units
  * (`round(v·1e9)`, the q_outliers integer-cents device), so each
  * projected coordinate is an exact integer sum — associative,
  * partition-order independent, bit-identical across engines. Output
  * stays in micro-units (the pageRankInt convention); divide by 1e9
  * at the consumer's edge if floats are wanted.
  *
  * Scale shape: entirely map-side — the sign matrix is a
  * (outDim × inDim) literal baked into the plan (64×16 ints — plan
  * bytes, not a broadcast), each row computes its projection in one
  * nested fold, no shuffle, no driver data path. At 100 TB this is a
  * pure scan+project stage that fuses into whatever consumes it.
  */
object Projection {

  /** ±1 from the low parity of md5("salt:i:j")'s first hex digit —
    * matches the oracle's
    * `CASE WHEN strpos('02468ace', substr(md5(...), 1, 1)) > 0`. */
  def signMatrix(inDim: Int, outDim: Int, salt: String): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val hex = md.digest(s"$salt:$i:$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        if ("02468ace".contains(hex.charAt(0))) 1 else -1
      }
    }
  }

  /** Project `vec` (length `inDim`) to `outDim` coordinates.
    *
    * @return (id, j, proj_u): j in 0 until outDim, proj_u the exact
    *         integer Σ_i round(v_i·1e9)·s(i,j) in 1e-9 micro-units
    */
  def randomProject(
      df: DataFrame, id: String, vec: String,
      inDim: Int, outDim: Int, salt: String = "jl"): DataFrame = {
    require(inDim >= 1 && outDim >= 1, "dims must be positive")
    val sgn = typedlit(signMatrix(inDim, outDim, salt))
    df.select(col(id),
        posexplode(transform(
          sequence(lit(0), lit(outDim - 1)),
          j => aggregate(
            sequence(lit(0), lit(inDim - 1)),
            lit(0L),
            (acc, i) => acc +
              round(element_at(col(vec), (i + 1).cast("int"))
                .cast("double") * lit(1000000000L)).cast("long") *
              element_at(element_at(sgn, (j + 1).cast("int")),
                (i + 1).cast("int"))))))
      .select(col(id), col("pos").cast("long").as("j"),
        col("col").as("proj_u"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * memory cut (float32 → int8 + one scale per vector) that makes a
    * 100 TB embedding corpus's ANN shortlist scan cache-resident.
    * Dequantize as q_i · m / (127 · 1e9).
    *
    * Per vector: components snap to 1e-9-grid BIGINT micro-units
    * (the [[randomProject]] device), m = max |component| (floored at
    * 1 so a zero vector quantizes to zeros instead of dividing by
    * zero), and q_i = sign(x_i) · (|x_i| · 127) div m — the division
    * runs on NON-NEGATIVE operands only (sign split), so Spark's
    * truncating `div` and DuckDB's flooring `//` cannot diverge and
    * q_i is bit-portable. |x_i| ≤ m gives |q_i| ≤ 127 by
    * construction.
    *
    * Scale shape: entirely map-side array HOFs — no shuffle, no
    * UDF; fuses into the scan that reads the vectors.
    *
    * @return (id, scale_u = m in 1e-9 micro-units, q = int8 codes as
    *         array<int>)
    */
  def quantizeInt8(df: DataFrame, id: String, vec: String): DataFrame = {
    // exact integer floor-div for non-negative operands via the
    // (a - pmod(a,b))/b identity: the subtraction makes an exact
    // multiple, whose double division is exact below 2^53
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val vu = transform(col(vec),
      x => round(x.cast("double") * lit(1000000000L)).cast("long"))
    df.select(col(id), vu.as("__vu"))
      .select(col(id),
        greatest(array_max(transform(col("__vu"), x => abs(x))), lit(1L))
          .as("scale_u"),
        col("__vu"))
      .select(col(id), col("scale_u"),
        transform(col("__vu"), x =>
          when(x < 0, -idiv(-x * 127, col("scale_u")))
            .otherwise(idiv(x * 127, col("scale_u"))).cast("int")).as("q"))
  }
}
