package graft.ops

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  // d1/d2 exact dups after normalization; d3 a near-dup of d1 (one word
  // changed); d4/d5 unrelated.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2L, "The QUICK brown fox, jumps over the lazy dog near the old barn!"),
    (3L, "the quick brown fox jumps over the lazy cat near the old barn"),
    (4L, "completely different content about spark query engines and planning"),
    (5L, "yet another unrelated document mentioning databases and storage"))
    .toDF("doc_id", "text")
    .withColumn("sh", Text.shingles(col("text"), 3))

  test("exactGroups keeps min-id representative with dup count") {
    val got = Dedup.exactGroups(
        docs, Text.fingerprintMd5(col("text")), col("doc_id"))
      .orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("dropExact keeps exactly the representatives") {
    val kept = Dedup.dropExact(
        docs, Text.fingerprintMd5(col("text")), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash signature is deterministic with expected length") {
    val sigs = docs.select(
        Dedup.minhashSignature(col("sh"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 16))
    val again = docs.select(
        Dedup.minhashSignature(col("sh"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("aggregated signatures agree with the expression formulation") {
    val viaExpr = docs
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 16).as("sig"))
      .filter(col("sig").isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = Dedup.minhashSignatures(docs, "doc_id", col("sh"), 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr == viaAgg)
  }

  test("identical shingle sets share every minhash band bucket") {
    val sig = docs.filter(col("doc_id").isin(1L, 2L))
      .select(Dedup.minhashSignature(col("sh"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sig(0) == sig(1))
  }

  test("nearDupPairs finds planted near-dups and nothing else") {
    val got = Dedup.nearDupPairs(
        docs, "doc_id", col("sh"), threshold = 0.5,
        numHashes = 64, bands = 16)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // jaccard(d1,d2)=1.0, jaccard(d1,d3)≈0.45/0.57 — with threshold 0.5
    // only pairs among {1,2,3} with J>=0.5 survive; 4,5 never appear.
    assert(got.contains((1L, 2L)))
    assert(got.forall { case (a, b) => Set(1L, 2L, 3L).contains(a) &&
      Set(1L, 2L, 3L).contains(b) })
  }

  test("exactNearDupPairs finds planted near-dups with exact scores") {
    val got = Dedup.exactNearDupPairs(docs, "doc_id", col("sh"), 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(got.forall { case (a, b) => Set(1L, 2L, 3L).contains(a) &&
      Set(1L, 2L, 3L).contains(b) })
  }

  test("exactNearDupPairs equals brute-force all-pairs Jaccard " +
      "(completeness: the prefix filter provably misses nothing)") {
    // deterministic pseudo-random corpus over a tiny vocab so shingle
    // overlap is common — the adversarial case for candidate pruning
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 60L).map { i =>
      val n = 6 + rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 2))
    val sets = corpus.select(col("doc_id"),
      array_distinct(col("sh")).as("s"))
    for (t <- Seq(0.4, 0.7, 0.9)) {
      val brute = sets.as("x").join(sets.as("y"),
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          Dedup.jaccard(col("x.s"), col("y.s")).as("j"))
        .filter(col("j") >= t)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val got = Dedup.exactNearDupPairs(corpus, "doc_id", col("sh"), t)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"threshold $t")
    }
  }

  test("anchoredExactNearDupPairs equals brute-force truth restricted " +
      "to pairs touching the anchor set (one-sided prefix completeness)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 60L).map { i =>
      val n = 6 + rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 2))
    val sets = corpus.select(col("doc_id"),
      array_distinct(col("sh")).as("s"))
    // anchor = every 3rd doc — arbitrary but deterministic
    val anchor = col("doc_id") % 3 === 0
    for (t <- Seq(0.4, 0.7, 0.9)) {
      val brute = sets.as("x").join(sets.as("y"),
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          Dedup.jaccard(col("x.s"), col("y.s")).as("j"))
        .filter(col("j") >= t &&
          (col("a") % 3 === 0 || col("b") % 3 === 0))
        .select("a", "b").as[(Long, Long)].collect().toSet
      val got = Dedup.anchoredExactNearDupPairs(
          corpus, "doc_id", col("sh"), t, anchor)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"threshold $t")
    }
    // layout independence
    val a1 = Dedup.anchoredExactNearDupPairs(
        corpus.repartition(13), "doc_id", col("sh"), 0.4, anchor)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val a2 = Dedup.anchoredExactNearDupPairs(
        corpus, "doc_id", col("sh"), 0.4, anchor)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(a1 == a2)
  }

  test("containmentJoinExact finds a template inside a larger doc " +
      "where Jaccard misses it") {
    val tmpl = "one two three four five six"
    val page = tmpl + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val c = Seq((1L, tmpl), (2L, page), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 2))
    val got = Dedup.containmentJoinExact(c, "doc_id", col("sh"), 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // directed: template ⊂ page only
    val jac = Dedup.exactNearDupPairs(c, "doc_id", col("sh"), 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty) // the symmetric score can't see it
  }

  test("containmentJoinExact equals brute-force all-pairs containment " +
      "(asymmetric prefix filter completeness)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 60L).map { i =>
      val n = 4 + rnd.nextInt(14)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 2))
    val sets = corpus.select(col("doc_id"),
      array_distinct(col("sh")).as("s"))
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val brute = sets.as("x").join(sets.as("y"),
          col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          Dedup.containment(col("x.s"), col("y.s")).as("c"))
        .filter(col("c") >= t)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val got = Dedup.containmentJoinExact(corpus, "doc_id", col("sh"), t)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"threshold $t")
    }
  }

  test("incrementalCandidates: batch joins the persisted state, " +
      "existing pairs never re-reported") {
    // corpus: d1/d2 exact dups, d4 unique — state built once
    val corpus = docs.filter(col("doc_id").isin(1L, 2L, 4L))
    val state = Dedup.bandedBuckets(corpus, "doc_id", col("sh"),
      numHashes = 64, bands = 16)
    // batch: d3 near-dups d1/d2 (cross-batch), d6/d7 in-batch dups,
    // d5 unique
    val batch = docs.filter(col("doc_id").isin(3L, 5L))
      .unionByName(Seq(
        (6L, "spark shuffles partition data across the cluster nodes"),
        (7L, "spark shuffles partition data across the cluster racks"))
        .toDF("doc_id", "text")
        .withColumn("sh", Text.shingles(col("text"), 3)))
    val (pairs, newBanded) = Dedup.incrementalCandidates(
      state, batch, "doc_id", col("sh"), numHashes = 64, bands = 16)
    val got = pairs.as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)) || got.contains((2L, 3L)),
      s"cross-batch near-dup missed: $got")
    assert(got.contains((6L, 7L)), s"in-batch near-dup missed: $got")
    assert(!got.contains((1L, 2L)),
      "existing-vs-existing pair must not be re-reported")
    assert(got.forall { case (_, b) => Set(3L, 5L, 6L, 7L).contains(b) },
      s"b side must always be a new doc: $got")
    // appending the batch state keeps the invariant: next batch sees all
    val nextState = state.unionByName(newBanded)
    assert(nextState.select("doc_id").distinct().count() == 7)
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val sh = Dedup.simhashes(docs, "doc_id", col("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L)) // identical shingle sets → identical simhash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
    // bands must exceed maxHamming for the pigeonhole recall guarantee
    // (enforced by require in simhashNearDups)
    val pairs = Dedup.simhashNearDups(
        docs, "doc_id", col("sh"), maxHamming = 10, bands = 16)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) })
    assertThrows[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, "doc_id", col("sh"),
        maxHamming = 10, bands = 4)
    }
  }

  test("maxBucketSize caps boilerplate buckets; 0 leaves recall intact") {
    // 6 exact copies of one template: every band-bucket holds all 6
    val boiler = (10L to 15L)
      .map(i => (i, "common template text repeated across the corpus wide"))
      .toDF("doc_id", "text")
      .withColumn("sh", Text.shingles(col("text"), 3))
    val uncapped = Dedup.candidatePairs(boiler, "doc_id", col("sh"))
      .count()
    assert(uncapped == 15) // all C(6,2) pairs
    val capped = Dedup.candidatePairs(boiler, "doc_id", col("sh"),
      maxBucketSize = 5).count()
    assert(capped == 0) // every bucket oversized → dropped
    // small genuine clusters are untouched by a generous cap
    val normal = Dedup.candidatePairs(docs, "doc_id", col("sh"),
        maxBucketSize = 100)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val reference = Dedup.candidatePairs(docs, "doc_id", col("sh"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(normal == reference)
  }

  test("clusterLabels reaches fixpoint on a chain graph (diameter > 2)") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Dedup.clusterLabels(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      9L -> 9L))
  }

  test("dropNearDups keeps one representative per near-dup cluster") {
    val kept = Dedup.dropNearDups(
        docs, "doc_id", col("sh"), threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // d1/d2 (and possibly d3) collapse to min id 1; d4, d5 survive
    assert(kept.head == 1L)
    assert(kept.contains(4L) && kept.contains(5L))
    assert(!kept.contains(2L))
  }

  test("jaccard computes |A∩B| / |A∪B| on distinct shingles") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
      .as[Double].collect()(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("decontaminate drops docs sharing any eval n-gram, keeps the rest") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"), // shares a 3-gram
      (2L, "completely unrelated training text here now"),
      (3L, "short doc"), // fewer than n words: never contaminated
      (4L, "Quick  BROWN fox! appears here too")) // normalization matches
      .toDF("doc_id", "text")
    val eval = Seq((100L, "watch the quick brown fox run"))
      .toDF("doc_id", "text")
    val kept = Dedup.decontaminate(
        train, "doc_id", col("text"), eval, col("text"), n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("keepBestPerCluster keeps the max-score row per cluster, " +
    "tie-breaks to the smaller id, passes singletons through") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0), // cluster {1,2,3}: tie 2 vs 3 → 2
      (4L, 5.0), (5L, 50.0),              // cluster {4,5} → 5
      (9L, 1.0))                          // singleton → kept
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val kept = Dedup.keepBestPerCluster(docs, "id", col("score"), pairs)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 9L), s"got $kept")
    // min-id companion (dropNearDups semantics) would keep 1 and 4 —
    // the two selections must genuinely differ on this fixture
    assert(!kept.contains(1L) && !kept.contains(4L))
  }

  test("collapseProvenance: sorted member arrays per cluster, " +
      "singletons kept, chain clusters fully merged") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    // 1-2-3 is a CHAIN (diameter 2), 4-5 a pair, 9 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val got = Dedup.collapseProvenance(docs, "id", pairs)
      .collect().map(r => (r.getLong(0),
        (r.getSeq[Long](1).toList, r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((List(1L, 2L, 3L), 3L)),
      4L -> ((List(4L, 5L), 2L)),
      9L -> ((List(9L), 1L))))
    // every doc appears exactly once across all member arrays
    assert(got.values.flatMap(_._1).toList.sorted ==
      List(1L, 2L, 3L, 4L, 5L, 9L))
  }

  test("sortedNeighborhoodPairs: exactly the next-w pairs in key " +
      "order, layout-independent") {
    import spark.implicits._
    // keys sort as d10 (id 3), d20 (1), d30 (4), d40 (2), d50 (5)
    val docs = Seq((3L, "d10"), (1L, "d20"), (4L, "d30"),
      (2L, "d40"), (5L, "d50")).toDF("id", "k")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.sortedNeighborhoodPairs(d, "id", col("k"), window = 2,
          numPartitions = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run(docs)
    // rank order 3,1,4,2,5: each row pairs with the next two
    assert(got == Set((3L, 1L), (3L, 4L), (1L, 4L), (1L, 2L),
      (4L, 2L), (4L, 5L), (2L, 5L)))
    assert(got == run(docs.repartition(7)), "layout changed the pairs")
  }

  test("multi-pass SNM: the reversed-key pass catches suffix-agreeing " +
      "clones the prefix pass provably misses") {
    import org.apache.spark.sql.functions._
    // two clones differing only in their FIRST token, buried among
    // filler whose prefixes interleave between them alphabetically —
    // the prefix sort separates the clones by > window, the reversed
    // (suffix) sort makes them adjacent
    val clones = Seq(
      (100L, "aardvark shared middle body ending tail"),
      (101L, "zebra shared middle body ending tail"))
    val filler = ('b' to 'y').zipWithIndex.map { case (c, i) =>
      (i.toLong, s"$c$i unique filler document number $i")
    }
    val docs = (clones ++ filler).toDF("doc_id", "text")
      .withColumn("__nt", Text.normalize(col("text")))
    def pairs(key: org.apache.spark.sql.Column): Set[(Long, Long)] =
      Dedup.sortedNeighborhoodPairs(
          docs.select(col("doc_id"), key.as("__k")),
          "doc_id", col("__k"), window = 2)
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .as[(Long, Long)].collect().toSet
    val prefix = pairs(substring(col("__nt"), 1, 12))
    val suffix = pairs(substring(reverse(col("__nt")), 1, 12))
    assert(!prefix.contains((100L, 101L)),
      "fixture broken: the prefix pass was supposed to miss the clones")
    assert(suffix.contains((100L, 101L)),
      "the reversed-key pass must make suffix twins adjacent")
    assert((prefix ++ suffix).contains((100L, 101L)))
  }

  test("decontaminateNear drops near-dups of the eval set, keeps the rest") {
    import org.apache.spark.sql.functions.col
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "completely different words nothing shared here at all today"))
      .toDF("doc_id", "text")
    // eval doc 10 = train doc 1 plus one word: 8 of 9 distinct
    // 3-shingles shared -> J = 8/9 >= 0.8
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog end extra"))
      .toDF("eval_id", "text")
    val kept = Dedup.decontaminateNear(
        train, "doc_id", col("text"), eval, "eval_id", col("text"),
        threshold = 0.8, n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
    // below-threshold overlap survives: raise the bar and doc 1 stays
    val keptAll = Dedup.decontaminateNear(
        train, "doc_id", col("text"), eval, "eval_id", col("text"),
        threshold = 0.95, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAll == Set(1L, 2L))
  }

  test("gramNovelty: known, novel, and mixed probes count exactly") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq((100L, "a b c d e f g")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "a b c d e f g"),     // every 5-gram known
      (2L, "z y x w v u t"),     // every 5-gram novel
      (3L, "a b c d e z z z z")) // abcde known, 4 others novel
      .toDF("doc_id", "text")
    val got = Dedup.gramNovelty(
        probe, "doc_id", col("text"), corpus, col("text"), n = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 3L, 0L, 0L)))
    assert(got(2L) == ((2L, 3L, 0L, 3L, 1000000L)))
    assert(got(3L) == ((3L, 5L, 1L, 4L, 800000L)))
  }

  test("cluster-keyed split keeps near-dup twins in one split") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "the quick brown fox jumps over the lazy dog end extra"),
      (3L, "completely different words nothing shared here at all today"))
      .toDF("doc_id", "text")
      .withColumn("sh", graft.ops.Text.shingles(col("text"), 3))
    val pairs = Dedup.nearDupPairs(docs, "doc_id", col("sh"), 0.8, 64, 16)
      .select("a", "b")
    val split = Dedup.clusterLabels(docs.select("doc_id"), pairs)
      .select(col("node"), graft.ops.Sampling.splitAssign(col("cluster"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "cl")
        .as("split"))
      .as[(Long, String)].collect().toMap
    assert(split(1L) == split(2L),
      "near-dup twins must land in the same split")
    assert(split.size == 3)
  }
}
