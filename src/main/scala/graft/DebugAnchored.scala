package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for anchoredExactNearDupPairs (deleted
  * before round end). */
object DebugAnchored {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    }
    val tdocs1 = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      .localCheckpoint()
    val nTd = tdocs1.agg(max(col("doc_id"))).head().getLong(0) + 1
    val sdocs10 = (0 until 10).map(k =>
        tdocs1.select((col("doc_id") + lit(k * nTd)).as("doc_id"),
          col("source"), col("n_chars"), col("text")))
      .reduce(_.unionByName(_)).localCheckpoint()

    val docs = sdocs10
    val nDocs = docs.count()
    val thr = graft.ops.Sampling.hexThreshold(1500.0 / nDocs)
    val anchor = graft.ops.Sampling.unitDraw(col("doc_id"), "br") < lit(thr)

    // stage 1: sets checkpoint alone
    timed("sets checkpoint") {
      val sh = docs.withColumn("__sh", graft.ops.Text.shingles(col("text"), 3))
      val sets = graft.core.LazyCheckpoint(sh
        .select(col("doc_id").as("__id"),
          array_distinct(col("__sh")).as("__sh2"), anchor.as("__anc"))
        .filter(size(col("__sh2")) > 0))
      sets.count()
    }
    // stage 2: full anchored op, twice
    (1 to 2).foreach { r =>
      timed(s"anchored full rep$r") {
        val sh = docs.withColumn("__sh", graft.ops.Text.shingles(col("text"), 3))
        graft.ops.Dedup.anchoredExactNearDupPairs(
          sh, "doc_id", col("__sh"), 0.8, anchor).count()
      }
    }
    // stage 4: anchored op unrolled, shared sets, per-stage timings
    locally {
      val threshold = 0.8
      val sh = docs.withColumn("__shx", graft.ops.Text.shingles(col("text"), 3))
      val sets = graft.core.LazyCheckpoint(sh
        .select(col("doc_id").as("__id"),
          array_distinct(col("__shx")).as("__sh"), anchor.as("__anc"))
        .filter(size(col("__sh")) > 0))
      timed("u: sets cp") { sets.count() }
      val anchorTokSet = sets.filter(col("__anc"))
        .select(explode(col("__sh")).as("__tok"))
        .select(xxhash64(col("__tok")).as("__th")).distinct()
      timed("u: anchorTokSet") { anchorTokSet.count() }
      val toks = sets
        .select(col("__id"), explode(col("__sh")).as("__tok"))
        .withColumn("__th", xxhash64(col("__tok")))
      val dfreq = toks
        .join(broadcast(anchorTokSet), Seq("__th"), "left_semi")
        .groupBy("__th").agg(count(lit(1)).as("__df"))
      timed("u: dfreq") { dfreq.count() }
      val anchorOrd = sets.filter(col("__anc"))
        .select(col("__id"), explode(col("__sh")).as("__tok"))
        .withColumn("__th", xxhash64(col("__tok")))
        .join(dfreq, "__th")
        .groupBy("__id")
        .agg(sort_array(collect_list(
          struct(col("__df"), col("__th"), col("__tok"))))
          .getField("__th").as("__ord"))
      val prefixed = graft.core.LazyCheckpoint(anchorOrd.select(
        col("__id"),
        size(col("__ord")).as("__n"),
        posexplode(slice(col("__ord"), lit(1),
          (size(col("__ord"))
            - ceil(lit(threshold) * size(col("__ord")) - lit(1e-9)) + 1)
            .cast("int")))
          .as(Seq("__pos", "__tok"))))
      timed("u: prefixed cp") { prefixed.count() }
      val prefixTokSet = prefixed.select(col("__tok").as("__yth")).distinct()
      val posts = sets.select(col("__id").as("__yid"),
          size(col("__sh")).as("__yn"), explode(col("__sh")).as("__ytok"))
        .select(col("__yid"), col("__yn"), xxhash64(col("__ytok")).as("__yth"))
        .join(broadcast(prefixTokSet), Seq("__yth"), "left_semi")
      timed("u: posts") { posts.count() }
      val q = threshold / (1.0 + threshold)
      val cand = prefixed.as("x")
        .join(posts,
          col("x.__tok") === col("__yth") &&
            col("x.__id") =!= col("__yid") &&
            col("__yn") >= ceil(lit(threshold) * col("x.__n") - lit(1e-9)) &&
            col("x.__n") >= ceil(lit(threshold) * col("__yn") - lit(1e-9)) &&
            (col("x.__n") - col("x.__pos"))
              >= ceil(lit(q) * (col("x.__n") + col("__yn")) - lit(1e-9)))
        .select(least(col("x.__id"), col("__yid")).as("a"),
          greatest(col("x.__id"), col("__yid")).as("b"))
        .distinct()
      timed("u: cand") { cand.count() }
      val rescored = cand
        .join(sets.select(col("__id").as("a"), col("__sh").as("__sha")),
          Seq("a"))
        .join(sets.select(col("__id").as("b"), col("__sh").as("__shb")),
          Seq("b"))
        .select(col("a"), col("b"),
          graft.ops.Dedup.jaccard(col("__sha"), col("__shb")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      timed("u: rescored") { rescored.count() }
    }
    // stage 3: exact full, twice
    (1 to 2).foreach { r =>
      timed(s"exact full rep$r") {
        val sh = docs.withColumn("__sh", graft.ops.Text.shingles(col("text"), 3))
        graft.ops.Dedup.exactNearDupPairs(
          sh, "doc_id", col("__sh"), 0.8).count()
      }
    }
    spark.stop()
  }
}
