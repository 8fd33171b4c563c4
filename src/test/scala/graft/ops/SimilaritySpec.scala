package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class SimilaritySpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0)),  // close to 0
    (2L, Seq(0.0, 1.0, 0.0)),  // orthogonal to 0
    (3L, Seq(-1.0, 0.0, 0.0)), // opposite of 0
    (4L, Seq(0.8, 0.2, 0.1))). // close-ish to 0
    toDF("vec_id", "embedding")

  test("codegen DotProduct is bitwise-identical to the HOF formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val pairs = e.select(col("v").as("a"))
      .crossJoin(e.select(col("v").as("b")))
    val mismatch = pairs.select(
        Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotHof(col("a"), col("b")).as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(mismatch == 0)
  }

  test("fused CosineSim is bitwise-identical to the composed three-pass form") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val pairs = e.select(col("v").as("a"))
      .crossJoin(e.select(col("v").as("b")))
    val mismatch = pairs.select(
        Similarity.cosine(col("a"), col("b")).as("fused"),
        Similarity.cosineComposed(col("a"), col("b")).as("ref"))
      .filter(not(col("fused") <=> col("ref"))).count()
    assert(mismatch == 0)
  }

  test("dot and cosine match hand computation") {
    val got = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.cosine(col("a"), col("b")).as("c"))
      .as[(Double, Double)].collect()(0)
    assert(got._1 == 32.0)
    val expC = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got._2 - expC) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self") {
    val got = Similarity.bruteForceTopK(
        vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1), (4L, 2), (2L, 3)))
  }

  test("hardNegatives returns only cross-label neighbors, ranked, and " +
      "they are the TRUE nearest cross-label vectors") {
    val labeled = Seq(
      (0L, Seq(1.0, 0.0, 0.0), 7),
      (1L, Seq(0.9, 0.1, 0.0), 7),  // nearest overall — SAME label
      (2L, Seq(0.0, 1.0, 0.0), 8),
      (3L, Seq(-1.0, 0.0, 0.0), 9),
      (4L, Seq(0.8, 0.2, 0.1), 8)). // nearest cross-label
      toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
        labeled, labeled.filter(col("vec_id") === 0),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .select("neighbor_id", "neighbor_label", "rank")
      .as[(Long, Int, Int)].collect().toSeq
    // 1 (same label) must be absent even though it's the global top-1
    assert(got.map(_._1) == Seq(4L, 2L, 3L))
    assert(got.forall(_._2 != 7))
  }

  test("lshTopK co-buckets near vectors and never returns self") {
    val got = Similarity.lshTopK(
        vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 3, bits = 2, dim = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got.forall { case (q, n) => q == 0L && n != 0L })
    // with 2 bits the half-space containing v0 also holds v1 and v4
    assert(got.map(_._2).contains(1L))
  }

  test("cosineNearDupPairs keeps ordered high-cosine pairs only") {
    val got = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L))) // cos ≈ 0.994
    assert(got.forall { case (a, b) => a < b })
    assert(!got.contains((0L, 3L))) // opposite vectors
  }

  test("block count scales with corpus size: per-task memory is bounded") {
    assert(Similarity.blocksFor(0L, 4096) == 1)
    assert(Similarity.blocksFor(4096L, 4096) == 1)
    assert(Similarity.blocksFor(4097L, 4096) == 2)
    assert(Similarity.blocksFor(1_000_000L, 4096) == 245)
    assert(Similarity.blocksFor(100L, 10) == 10)
    // the kernel result is identical whatever the block layout
    val derived = Similarity.cosineNearDupPairs(
        vecs, "vec_id", "embedding", 0.99, targetPerBlock = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val pinned = Similarity.cosineNearDupPairs(
        vecs, "vec_id", "embedding", 0.99, blocksOverride = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(derived == pinned)
  }

  test("int8TopK recall vs exact dot-product retrieval, and " +
    "partition independence") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val all = e.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val exact = (0L until 5L).flatMap { qid =>
      val qv = all(qid).map(_.toDouble)
      all.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, qv.zip(v).map { case (a, b) => a * b.toDouble }.sum) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => (qid, id) }
    }.toSet
    val approx = Similarity.int8TopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"int8 recall=$recall")
    // int8 quantization error is ~1/127 per component — the top-5 set
    // should survive nearly intact on clustered data
    assert(recall >= 0.8, s"int8 recall $recall too low")
    val again = Similarity.int8TopK(
        e.repartition(7), q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again == approx, "int8 ranking must be partition-independent")
  }

  test("ivfTopK recall vs brute force on clustered real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(
        e, q, "vec_id", "embedding", 5, numCentroids = 16, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    val unrefined = Similarity.ivfTopK(
        e, q, "vec_id", "embedding", 5, numCentroids = 16, nProbe = 8,
        refineIters = 0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall0 = (exact & unrefined).size.toDouble / exact.size
    info(s"IVF recall refined=$recall unrefined=$recall0")
    // the Lloyd pass lifts the floor above what raw corpus-point seeds
    // reach on this fixture (0.68) — a lost refinement fails here
    assert(recall >= 0.7, s"IVF recall $recall too low")
    assert(recall0 >= 0.6, s"unrefined IVF recall $recall0 regressed")
  }

  test("persisted IVF index returns identical results to ivfTopK and " +
      "prunes unprobed list partitions at the scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfBuild(e, "vec_id", "embedding", dir, numCentroids = 16)
    val fromIndex = Similarity.ivfQuery(
      q, dir, "vec_id", "embedding", k = 5, nProbe = 8)
    val direct = Similarity.ivfTopK(
      e, q, "vec_id", "embedding", 5, numCentroids = 16, nProbe = 8)
    val a = fromIndex.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val b = direct.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b)
    // the scale contract: the probe set becomes a PartitionFilter on
    // the cid layout — unprobed inverted lists are never read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid#") ||
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cid.*"),
      s"no partition pruning in:\n${plan.take(2000)}")
  }

  test("frozen-codebook append maintenance: init + N ivfAppend batches " +
      "serves queries identically to one ivfBuild over the union, and " +
      "appends never rewrite existing list files") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val full = java.nio.file.Files.createTempDirectory("graft-ivf-f").toString
    val app = java.nio.file.Files.createTempDirectory("graft-ivf-a").toString
    Similarity.ivfBuild(e, "vec_id", "embedding", full, numCentroids = 16)
    Similarity.ivfInitFrom(spark, full, app)
    Similarity.ivfAppend(
      e.filter(col("vec_id") % 3 === 0), app, "vec_id", "embedding")
    // capture list files after batch 1; they must survive batch 2+3
    // (base build lives in lists/, published append batches in appends/)
    def listFiles(dir: String): Set[String] =
      Seq(s"$dir/lists", s"$dir/appends").flatMap { r =>
        val root = java.nio.file.Paths.get(r)
        if (!java.nio.file.Files.exists(root)) Set.empty[String]
        else {
          val s = java.nio.file.Files.walk(root)
          try s.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet"))
            .map(_.toString).toSet
          finally s.close()
        }
      }.toSet
    val afterB1 = listFiles(app)
    Similarity.ivfAppend(
      e.filter(col("vec_id") % 3 === 1), app, "vec_id", "embedding")
    Similarity.ivfAppend(
      e.filter(col("vec_id") % 3 === 2), app, "vec_id", "embedding")
    assert(afterB1.subsetOf(listFiles(app)),
      "an append rewrote or removed a previously-written list file")
    val fromApp = Similarity.ivfQuery(
        q, app, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val fromFull = Similarity.ivfQuery(
        q, full, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(fromApp == fromFull)
  }

  test("interrupted ivfAppend: a kill inside the append window leaves " +
      "ivfQuery answering from the pre-append index, and the retry " +
      "heals — atomically, without duplicates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val full = java.nio.file.Files.createTempDirectory("graft-ivf-cf").toString
    val app = java.nio.file.Files.createTempDirectory("graft-ivf-cw").toString
    Similarity.ivfBuild(e, "vec_id", "embedding", full, numCentroids = 16)
    Similarity.ivfInitFrom(spark, full, app)
    val b1 = e.filter(col("vec_id") % 2 === 0)
    val b2 = e.filter(col("vec_id") % 2 === 1)
    Similarity.ivfAppend(b1, app, "vec_id", "embedding")
    def answers(dir: String): Set[(Long, Long, Int)] =
      Similarity.ivfQuery(q, dir, "vec_id", "embedding", k = 5, nProbe = 8)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val preAppend = answers(app)
    // simulate the crash window: b2's append dies BETWEEN the staged
    // lists write and the atomic publish rename — a torn (partial)
    // staging dir under the very token the retry will recompute
    val m = graft.sources.Versioned.manifest(
      b2.select(col("vec_id").cast("string").as("__id"),
        col("embedding").cast("string").as("__vec")),
      Seq("__id", "__vec")).head()
    val token = s"b_${m.getLong(0)}_${java.lang.Long.toHexString(m.getLong(1))}"
    b2.limit(7)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("vector"))
      .withColumn("cid", lit(3))
      .write.partitionBy("cid").parquet(s"$app/.staging/$token")
    // window state: readers see ONLY complete batches — the torn
    // staging (even a fully-written one) is invisible until renamed
    assert(answers(app) == preAppend,
      "a torn staging dir leaked into ivfQuery results")
    // the retry sweeps the torn attempt, rewrites, and publishes
    Similarity.ivfAppend(b2, app, "vec_id", "embedding")
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$app/.staging/$token")),
      "retry left the torn staging dir behind")
    assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$app/appends/$token")),
      "retry did not publish the batch")
    // healed: b1+b2 = the whole corpus, so the appended index must
    // answer exactly like the single full build
    val healed = answers(app)
    assert(healed == answers(full))
    // and the publish is idempotent: re-delivering the same batch
    // (crash-after-rename retry) is a no-op — same answers, no
    // duplicate list rows for any probed neighbor
    Similarity.ivfAppend(b2, app, "vec_id", "embedding")
    assert(answers(app) == healed)
    val appendBatches = new java.io.File(s"$app/appends").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(appendBatches.count(_ == token) == 1)
  }

  test("ivfAppend re-embedding batch: same id set with DIFFERENT vectors " +
      "gets its own token and is published, not dropped as a duplicate") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = java.nio.file.Files.createTempDirectory("graft-ivf-re").toString
    val app = java.nio.file.Files.createTempDirectory("graft-ivf-ra").toString
    Similarity.ivfBuild(e, "vec_id", "embedding", full, numCentroids = 16)
    Similarity.ivfInitFrom(spark, full, app)
    val b = e.filter(col("vec_id") % 5 === 0)
    Similarity.ivfAppend(b, app, "vec_id", "embedding")
    // a re-embedding run: identical id column, perturbed vectors — with
    // an id-only manifest this batch would hash to the published token
    // and be silently dropped
    val reEmbedded = b.withColumn("embedding",
      transform(col("embedding"), v => v * lit(0.5f)))
    Similarity.ivfAppend(reEmbedded, app, "vec_id", "embedding")
    val appendBatches = new java.io.File(s"$app/appends").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(appendBatches.size == 2,
      s"re-embedded batch was dropped as a duplicate: $appendBatches")
    // a null vector fails LOUDLY at token time (concat-style hashing
    // would silently degrade the row to id-only and weaken the
    // collision guarantee the token exists for)
    val withNull = b.withColumn("embedding",
      when(col("vec_id") === 0, lit(null)).otherwise(col("embedding")))
    val err = intercept[Exception] {
      Similarity.ivfAppend(withNull, app, "vec_id", "embedding")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("ivfAppend: null")),
      s"expected the null-vector refusal, got: $err")
  }

  test("lshTopK recall vs brute force on clustered real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(
        e, q, "vec_id", "embedding", 5, bits = 4, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("pqTopK recall vs brute force; codes stay within codebook range") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val cb = Similarity.pqCodebooks(
      e, "vec_id", "embedding", m = 32, k = 16, refineIters = 2)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb)
    val codeBounds = codes
      .select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c")))
      .as[(Int, Int)].head()
    assert(codeBounds._1 >= 0 && codeBounds._2 < 16)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(codes, q, "vec_id", "embedding", 5, cb)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall $recall too low")
  }

  test("pqTopK: a query batch past the broadcast bound fails LOUDLY " +
      "with a pointer to ivfPqQuery instead of OOMing the broadcast") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.pqCodebooks(
      e, "vec_id", "embedding", m = 8, k = 16, refineIters = 1)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb)
    val big = e.filter(col("vec_id") < 10)
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(codes, big, "vec_id", "embedding", 5, cb,
        maxQueryRows = 5L)
    }
    assert(ex.getMessage.contains("ivfPqQuery"),
      s"bound violation must route the caller: ${ex.getMessage}")
    // at or under the bound the scan runs
    assert(Similarity.pqTopK(codes, big, "vec_id", "embedding", 5, cb,
      maxQueryRows = 10L).count() > 0)
  }

  test("persisted IVFADC: probing ALL lists equals the flat PQ scan; " +
      "a partial probe set prunes list partitions at the scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    // raw-vector mode: the only variant where all-lists == flat scan
    Similarity.ivfPqBuild(e, "vec_id", "embedding", dir,
      numCentroids = 16, m = 32, k = 16, refineIters = 2,
      residual = false)
    val full = Similarity.ivfPqQuery(
        q, dir, "vec_id", "embedding", k = 5, nProbe = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val cb = Similarity.pqCodebooks(
      e, "vec_id", "embedding", m = 32, k = 16, refineIters = 2)
    val flat = Similarity.pqTopK(
        Similarity.pqEncode(e, "vec_id", "embedding", cb),
        q, "vec_id", "embedding", 5, cb)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(full == flat, "all-lists probe must equal the flat ADC scan")
    val pruned = Similarity.ivfPqQuery(
      q, dir, "vec_id", "embedding", k = 5, nProbe = 4)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cid.*"),
      s"no partition pruning in:\n${plan.take(2000)}")
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfPqQuery(
        q, dir, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVFADC raw-vector recall at nProbe=8: $recall")
    // measured 0.56 on this fixture — the floor is a regression gate,
    // not aspiration (the production answer to the gap is the exact
    // re-rank stage, gated >= 0.8 in its own test)
    assert(recall >= 0.5, s"IVFADC recall $recall too low")
    // residual mode (the paper's formulation): codes spend themselves
    // on v − c, which is smaller on clustered data — recall must not
    // regress vs raw-vector quantization at the same budget
    val rdir = java.nio.file.Files.createTempDirectory("graft-ivfpqr").toString
    Similarity.ivfPqBuild(e, "vec_id", "embedding", rdir,
      numCentroids = 16, m = 32, k = 16, refineIters = 2)
    val resid = Similarity.ivfPqQuery(
        q, dir = rdir, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val residRecall = (exact & resid).size.toDouble / exact.size
    info(s"IVFADC residual recall at nProbe=8: $residRecall")
    assert(residRecall >= 0.6, // measured 0.64 — regression gate
      s"IVFADC residual recall $residRecall too low")
    assert(residRecall >= recall - 0.04,
      s"residual encoding regressed recall: $residRecall < $recall")
  }

  test("IVFADC exact re-rank (IVFADC-R) lifts recall to the gate at nProbe=8") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-rr").toString
    Similarity.ivfPqBuild(e, "vec_id", "embedding", dir,
      numCentroids = 16, m = 32, k = 16, refineIters = 2)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val noRr = Similarity.ivfPqQuery(
        q, dir, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.ivfPqQuery(
        q, dir, "vec_id", "embedding", k = 5, nProbe = 8, rerank = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recallNo = (exact & noRr).size.toDouble / exact.size
    val recallRr = (exact & rr).size.toDouble / exact.size
    info(s"IVFADC residual recall at nProbe=8: " +
      s"no-rerank=$recallNo rerank50=$recallRr")
    // the GATE the compressed path is held to: re-ranked recall must
    // reach 0.8 — quantization mis-ranking is fixed by the exact pass,
    // so only probe-coverage misses remain
    assert(recallRr >= 0.8, s"re-ranked IVFADC recall $recallRr below gate")
    assert(recallRr >= recallNo,
      s"re-rank must never lose recall: $recallRr < $recallNo")
  }

  test("zero-norm and NaN vectors get pinned codes, not -1 sentinels") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),          // zero norm
      (3L, Seq(Float.NaN, 1.0f, 1.0f, 1.0f)),     // NaN component
      (4L, Seq(0.5f, 0.25f, 1.0f, 2.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 2, k = 2)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb)
      .select(explode(col("codes")).as("c")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 2), codes.toSeq)
    // the degenerate rows must also survive an IVFADC residual build
    // + query end to end (the -1 sentinel used to index coarse())
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    Similarity.ivfPqBuild(df, "vec_id", "embedding", dir,
      numCentroids = 2, m = 2, k = 2)
    val got = Similarity.ivfPqQuery(
      df.filter(col("vec_id") === 1), dir, "vec_id", "embedding",
      k = 2, nProbe = 2)
    assert(got.count() > 0)
  }

  test("pq encoding is deterministic across partitionings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.pqCodebooks(e, "vec_id", "embedding")
    val a = Similarity.pqEncode(e, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    val b = Similarity.pqEncode(e.repartition(7), "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("semanticDedup drops planted scaled copies, keeps all originals") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val copies = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val kept = Similarity.semanticDedup(
        e.unionByName(copies), "vec_id", "embedding",
        threshold = 0.99, numCentroids = 8)
      .select("vec_id").as[Long].collect().toSet
    val originals = e.select("vec_id").as[Long].collect().toSet
    assert(kept == originals,
      s"missing=${(originals -- kept).take(5)} extra=${(kept -- originals).take(5)}")
  }

  test("semanticDedup bounds per-task rows even under a 90%-hot cluster") {
    // 450 of 500 vectors land in ONE tight cluster (small angular
    // jitter so they are near-dup-free at the threshold below), the
    // rest spread elsewhere. A block count derived from the MEAN
    // cluster size (500/8 ≈ 62 rows → 2 blocks at target 50) would
    // hand a single task the hot cluster's 450×450/4 pair space; the
    // per-cluster derivation must split the hot cluster by ITS size.
    // centroids are PINNED (the operator's data-adapted Lloyd pass
    // would split a hot region among nearby seeds — the bound must
    // hold even when the layout stays skewed, e.g. user-supplied or
    // stale centroids)
    val hot = (0 until 450).map(i =>
      (i.toLong, Seq(1.0, 0.5 + i * 1e-5, 0.0)))
    val rest = (0 until 50).map(i =>
      (1000L + i, Seq(0.0, 0.1 * (i % 5), 5.0 + i * 0.01)))
    val df = (hot ++ rest).toDF("vec_id", "embedding")
    val cents = Array(
      0 -> Array(1.0, 0.5, 0.0), 1 -> Array(0.0, 0.0, 5.0),
      2 -> Array(0.0, 1.0, 0.0), 3 -> Array(-1.0, 0.0, 0.0),
      4 -> Array(0.0, -1.0, 0.0), 5 -> Array(0.0, 0.0, -1.0),
      6 -> Array(1.0, -1.0, 0.0), 7 -> Array(-1.0, 1.0, 0.0))
    val assigned = Similarity.assignClusters(df, "vec_id", "embedding", cents)
    val blocks = Similarity.clusterBlocks(assigned, targetPerBlock = 50)
    val sizes = assigned.groupByKey(_._1).count().collect().toMap
    val (hotCid, hotSize) = sizes.maxBy(_._2)
    assert(hotSize >= 400, s"fixture drifted: hot cluster only $hotSize")
    assert(blocks(hotCid) >= (hotSize / 50).toInt,
      s"hot cluster got ${blocks(hotCid)} blocks for $hotSize rows")
    // the bound itself: no (cluster, block) task side exceeds
    // ~2×targetPerBlock rows (floorMod over consecutive ids is even)
    val maxPerTask = assigned
      .map { case (cid, r) =>
        (cid, math.floorMod(r.id, blocks(cid).toLong).toInt) }
      .groupByKey(identity).count().collect().map(_._2).max
    assert(maxPerTask <= 100, s"a task side holds $maxPerTask rows")
    // and the operator end-to-end still runs on the skewed layout
    val kept = Similarity.semanticDedup(
      df, "vec_id", "embedding", threshold = 0.9999,
      numCentroids = 8, targetPerBlock = 50).count()
    assert(kept > 0 && kept <= 500)
  }

  test("semanticDedup collapses a duplicate CHAIN to one representative") {
    // three copies of the same vector + one unrelated: the pair graph
    // within the cluster is a clique; min-id representative survives
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f)),
      (3L, Seq(4.0f, 0.0f, 0.0f)),
      (9L, Seq(0.0f, 1.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(
        df, "vec_id", "embedding", threshold = 0.99, numCentroids = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L))
  }

  test("maxSimTopK: identity scores |Q| exactly; differential vs a " +
      "plain Scala reference") {
    val rnd = new scala.util.Random(17)
    def vec() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val rows = (0L until 20L).map(i => (i, Seq.fill(4)(vec())))
    val df = rows.toDF("vec_id", "vs")
    val got = Similarity.maxSimTopK(df, df.filter(col("vec_id") < 3),
        "vec_id", "vs", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    def maxsim(q: Seq[Seq[Double]], d: Seq[Seq[Double]]) =
      BigDecimal(q.map(qv => d.map(dv => cos(qv, dv)).max).sum)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = rows.filter(_._1 < 3).map { case (qid, qvs) =>
      qid -> rows.filter(_._1 != qid)
        .map { case (nid, dvs) => (nid, maxsim(qvs, dvs)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(4).map(_._1).toSeq
    }.toMap
    assert(got == expect)
    // a set scored against itself: every query token finds itself,
    // maxsim == |Q| exactly
    val self = Similarity.maxSimTopK(
        df, df.filter(col("vec_id") === 5L).withColumn("vec_id", lit(99L)),
        "vec_id", "vs", k = 1)
      .select("neighbor_id", "maxsim").as[(Long, Double)].collect()
    assert(self.head._1 == 5L && math.abs(self.head._2 - 4.0) < 1e-9)
  }

  test("maxSimIvfTopK: shortlist rescore tracks the full late-" +
      "interaction ranking (recall gated)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v = col("embedding").cast("array<double>")
    val mv = e.select(col("vec_id"),
      array(slice(v, 1, 16), slice(v, 17, 16),
        slice(v, 33, 16), slice(v, 49, 16)).as("vs"))
    val q = mv.filter(col("vec_id") < 5)
    val full = Similarity.maxSimTopK(mv, q, "vec_id", "vs", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pruned = Similarity.maxSimIvfTopK(mv, q, "vec_id", "vs", k = 3,
        shortlist = 20, numCentroids = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // small-shortlist recall is a POOLING-fidelity property of the
    // data (sliced synthetic vectors are adversarial for mean
    // pooling) — informational here, the contract gate is below
    val recall = (full & pruned).size.toDouble / full.size
    info(s"maxsim IVF-shortlist recall at shortlist=20: $recall")
    assert(pruned.size == full.size, "pruned path lost result rows")
    // CONTRACT: an exhaustive shortlist (>= corpus, all lists probed)
    // makes the pruned path EQUAL the brute-force path exactly — the
    // rescore and selection stages add zero approximation of their own
    val n = mv.count().toInt
    val exhaustive = Similarity.maxSimIvfTopK(mv, q, "vec_id", "vs",
        k = 3, shortlist = n, numCentroids = 8, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exhaustive == full,
      "exhaustive-shortlist rescore diverged from brute-force maxsim")
  }

  test("marginMine pairs each src with its aligned tgt") {
    import org.apache.spark.sql.functions.col
    // two aligned axes: src {0, 2} on e1/e2, tgt {1, 3} tilted copies
    val src = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f)), (3L, Array(0.1f, 0.9f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (2L, 3L)))
    // margins are finite, positive, and above 1 for the aligned pair
    // (the tilted twin is much closer than the neighborhood average)
    val margins = Similarity
      .marginMine(src, tgt, "vec_id", "embedding", k = 2)
      .select("margin").as[Double].collect()
    assert(margins.forall(m => m > 1.0 && m < 3.0), margins.toSeq)
  }
}
