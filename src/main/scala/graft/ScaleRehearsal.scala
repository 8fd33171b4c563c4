package graft

import graft.etl.Indexes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the suite's heaviest faces: runs each at its
  * bench input and at a synthetic 10× (salted-id unions of the same
  * inputs — no new testdata needed) and prints wall-time growth
  * factors. The point is to catch super-linear behavior sf0.1 cannot
  * see — a growth factor ≲ 10 for data-proportional operators (dbscan,
  * pagerank) and ≪ 10 for O(changed)-contract operators (the
  * incremental index refresh) is a pass; results are recorded in
  * SCALING.md.
  *
  * Run: `sbt "runMain graft.ScaleRehearsal [sfDir]"`.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] $label%-28s ${secs}%8.2f s  ($n rows)")
      secs
    }

    // ---- q_pagerank_directed: 10 disjoint salted replicas of the
    // co-order graph — vertex/edge count ×10, identical structure ----
    val e1 = graft.queries.GraphQueries.edges(spark, sfDir, 2)
      .localCheckpoint() // pin the (shared) derivation outside timing
    val maxId = e1.agg(max(greatest(col("a"), col("b")))).head().getLong(0)
    val off = maxId + 1
    val e10 = (0 until 10).map(k =>
        e1.select((col("a") + lit(k * off)).as("a"),
          (col("b") + lit(k * off)).as("b")))
      .reduce(_.unionByName(_)).localCheckpoint()
    val pr1 = timed("pagerank_directed 1x") {
      graft.ops.Graph.pageRankIntDirected(e1, iters = 5).count()
    }
    val pr10 = timed("pagerank_directed 10x") {
      graft.ops.Graph.pageRankIntDirected(e10, iters = 5).count()
    }

    // ---- q_dbscan: 10 spatially-translated replicas (x shifted far
    // past the band structure) — same density profile per replica ----
    val pts1 = graft.queries.DensityQueries.projectedPoints(spark, sfDir)
      .localCheckpoint()
    val nVec = pts1.agg(max(col("vec_id"))).head().getLong(0) + 1
    val span = 200000000000L // 200e9 ≫ the 10-band × 8e9 layout
    val pts10 = (0 until 10).map(k =>
        pts1.select((col("vec_id") + lit(k * nVec)).as("vec_id"),
          (col("px") + lit(k * span)).as("px"), col("py")))
      .reduce(_.unionByName(_)).localCheckpoint()
    import graft.queries.DensityQueries.{Eps, MinPts}
    val db1 = timed("dbscan 1x") {
      graft.ops.Density.dbscan(pts1, "vec_id", "px", "py", Eps, MinPts).count()
    }
    val db10 = timed("dbscan 10x") {
      graft.ops.Density.dbscan(pts10, "vec_id", "px", "py", Eps, MinPts).count()
    }

    // ---- q_index_refresh: corpus ×10 (salted study replicas), changed
    // slice CONSTANT (one study) — the O(changed) contract says the
    // growth factor should be far below 10 ----
    val fixtures = "/root/repo/src/test/resources/clinical"
    val meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42")
    def replicate(in: Indexes.ClinicalInputs, copies: Int): Indexes.ClinicalInputs = {
      def rep(df: DataFrame): DataFrame = (0 until copies).map { k =>
        if (k == 0) df
        else df.withColumn("study_id", concat(col("study_id"), lit(s"_S$k")))
      }.reduce(_.unionByName(_))
      in.copy(donor = rep(in.donor), study = rep(in.study),
        phenotype = rep(in.phenotype), file = rep(in.file),
        biospecimen = rep(in.biospecimen), samples = rep(in.samples),
        diagnosis = rep(in.diagnosis), treatment = rep(in.treatment),
        followUp = rep(in.followUp), exposure = rep(in.exposure),
        family = rep(in.family), familyHistory = rep(in.familyHistory))
    }
    def refreshSecs(copies: Int, label: String): Double = {
      val in = replicate(
        Indexes.ClinicalInputs.fromDir(spark, fixtures), copies)
      // stored prior (untimed — scenario scaffolding, as in Bench)
      val dir = graft.core.Scratch.dir(s"rehearsal_prior_$copies")
      Indexes.studyIndex(in, meta).write.mode("overwrite").parquet(dir)
      val prior = spark.read.parquet(dir)
      timed(label) {
        Indexes.refreshStudyIndex(prior, in, Seq("GS001"), meta).count()
      }
    }
    val ir1 = refreshSecs(1, "index_refresh 1x")
    val ir10 = refreshSecs(10, "index_refresh 10x (corpus)")

    // ---- q_boilerplate: 10 salted-doc replicas per SOURCE (the
    // group key unchanged) — every (source, line) count grows ×10, so
    // this stresses exactly the countDistinct shuffle whose map-side
    // combiners are supposed to eat the duplication ----
    val docs1 = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        concat_ws("\n", concat(lit("NAV "), col("source")), col("text"),
          concat(lit("(c) "), col("source"), lit(" footer"))).as("page"))
      .localCheckpoint()
    val nDocs = docs1.agg(max(col("doc_id"))).head().getLong(0) + 1
    val docs10 = (0 until 10).map(k =>
        docs1.select((col("doc_id") + lit(k * nDocs)).as("doc_id"),
          col("source"), col("page")))
      .reduce(_.unionByName(_)).localCheckpoint()
    val bp1 = timed("boilerplate 1x") {
      graft.ops.Text.boilerplateLines(
        docs1, "doc_id", "source", "page", minDocs = 5).count()
    }
    val bp10 = timed("boilerplate 10x") {
      graft.ops.Text.boilerplateLines(
        docs10, "doc_id", "source", "page", minDocs = 5).count()
    }

    // ---- q_triangles: 10 disjoint salted replicas of the co-order
    // graph (the pagerank device). m grows ×10 with structure held;
    // the compact-forward wedge join is O(m^1.5) WORST-case, but on
    // disjoint replicas the expected growth is ~linear — catching a
    // super-linear regression (e.g. a lost degree bound) is exactly
    // what this face is for ----
    val tr1 = timed("triangles 1x") {
      graft.ops.Graph.triangleCount(e1)
        .head().getLong(0)
    }
    val tr10 = timed("triangles 10x") {
      graft.ops.Graph.triangleCount(e10)
        .head().getLong(0)
    }

    println(f"[rehearsal] growth: pagerank_directed ${pr10 / pr1}%.2fx, " +
      f"dbscan ${db10 / db1}%.2fx, index_refresh ${ir10 / ir1}%.2fx, " +
      f"boilerplate ${bp10 / bp1}%.2fx, " +
      f"triangles ${tr10 / tr1}%.2fx " +
      "(inputs x10; pass = ~linear or below)")
    spark.stop()
  }
}
