package graft.sources

import graft.WithSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExportSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def corpus(n: Int, tag: String = "") =
    (0 until n).map(i => (i.toLong, s"doc$tag-$i-" + ("x" * (50 + i % 7))))
      .toDF("doc_id", "text")

  private def export(df: org.apache.spark.sql.DataFrame, dir: String,
      target: Long = 2048L, keep: Int = 3) =
    Export.exportShards(df, dir, target, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"), keep = keep)

  test("exportShards: size-targeted shard count, one file per shard, " +
      "manifest matches the data, verify is empty, read round-trips") {
    val dir = graft.core.Scratch.dir("export_basic")
    val docs = corpus(200)
    val res = export(docs, dir)
    // shard count = ceil(total payload / target)
    val total = docs.agg(sum(octet_length(col("text"))))
      .head().getLong(0)
    assert(res.shards == ((total + 2047) / 2048).toInt)
    assert(res.shards > 1, "fixture must exercise multiple shards")
    assert(res.rows == 200L)
    // one row per shard in the manifest; every path exists with the
    // listed file size
    val m = Export.readShardManifest(spark, dir).collect()
    assert(m.length == res.shards ||
      m.length < res.shards && m.length > 0) // md5 draw may leave a
                                             // shard empty (no row)
    m.foreach { r =>
      val f = new java.io.File(new java.net.URI(
        r.getAs[String]("path")).getPath)
      assert(f.isFile && f.length == r.getAs[Long]("file_bytes"))
    }
    // read round-trip: same rows, shard column deterministic
    val back = Export.readShards(spark, dir)
    assert(back.count() == 200L)
    assert(back.select("doc_id", "text").except(docs).isEmpty &&
      docs.except(back.select("doc_id", "text")).isEmpty)
    // the audit agrees with the manifest on every shard
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // manifest totals equal the frame's own aggregates
    val mt = Export.readShardManifest(spark, dir)
      .agg(sum("n_rows"), sum("bytes")).head()
    assert(mt.getLong(0) == 200L && mt.getLong(1) == total)
  }

  test("re-export of identical content is idempotent (same " +
      "content-addressed dir), changed content gets a fresh dir and " +
      "old manifest versions stay readable; sweep reclaims " +
      "unreferenced dirs") {
    val dir = graft.core.Scratch.dir("export_idem")
    val a1 = export(corpus(120), dir, keep = 2)
    val a2 = export(corpus(120), dir, keep = 2)
    assert(a2.dataDir == a1.dataDir, "identical content must re-land " +
      "in the same content-addressed dir")
    assert(a2.version > a1.version)
    // changed content: fresh dir; the superseded manifest (a2) still
    // resolves to its own data after the new publish
    val b = export(corpus(120, tag = "B"), dir, keep = 2)
    assert(b.dataDir != a1.dataDir)
    assert(spark.read.parquet(a1.dataDir).count() == 120L,
      "data referenced by a surviving manifest version was swept")
    // keep=2 prunes a1's manifest version; a third export with fresh
    // content drops a1/a2's shared data dir once unreferenced
    val c = export(corpus(120, tag = "C"), dir, keep = 1)
    assert(!new java.io.File(new java.net.URI(
        "file://" + a1.dataDir).getPath).exists(),
      "sweep left an unreferenced content dir behind")
    assert(spark.read.parquet(c.dataDir).count() == 120L)
  }

  test("exportJsonlShards: gzip jsonl shards behind the same manifest " +
      "discipline — one .json.gz file per shard, format-dispatched " +
      "read round-trip, audit empty, idempotent content addressing") {
    val dir = graft.core.Scratch.dir("export_jsonl")
    val docs = corpus(200)
    val res = Export.exportJsonlShards(docs, dir, 2048L, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(res.shards > 1)
    val m = Export.readShardManifest(spark, dir).collect()
    m.foreach { r =>
      assert(r.getAs[String]("format") == "json")
      val path = r.getAs[String]("path")
      assert(path.contains(".json") && path.endsWith(".gz"),
        s"expected a gzip jsonl shard file, got $path")
      val f = new java.io.File(new java.net.URI(path).getPath)
      assert(f.isFile && f.length == r.getAs[Long]("file_bytes"))
    }
    // readShards dispatches on the manifest's format column
    val back = Export.readShards(spark, dir)
    assert(back.count() == 200L)
    assert(back.select(col("doc_id").cast("long"), col("text"))
      .except(docs).isEmpty)
    // audit recomputes from the text shards themselves
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // checksum/shard-draw identical to the parquet path -> identical
    // content-addressed dir name for identical content
    val res2 = Export.exportJsonlShards(docs, dir, 2048L, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(res2.dataDir == res.dataDir)
    // a pinned schema read is exact (the loader contract)
    val pinned = Export.readShards(spark, dir, Some(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING")))
    assert(pinned.select("doc_id", "text").except(docs).isEmpty)
  }

  test("lookupById: a point lookup reads ONE shard file (the draw " +
      "routes it), finds present ids, and proves absent ids absent — " +
      "including after a takedown") {
    val dir = graft.core.Scratch.dir("export_lookup")
    val base = corpus(100)
    Export.exportShardsIncremental(base, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val hit = Export.lookupById(spark, dir, "doc_id", "42")
    assert(hit.inputFiles.length == 1,
      s"lookup touched ${hit.inputFiles.length} files")
    assert(hit.select(col("text")).as[String].collect().toSeq ==
      base.filter(col("doc_id") === 42L)
        .select(col("text")).as[String].collect().toSeq)
    assert(Export.lookupById(spark, dir, "doc_id", "424242").isEmpty)
    // takedown, then the id is provably gone through the same path
    Export.retractShards(spark, dir, "doc_id", Seq("42"),
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(Export.lookupById(spark, dir, "doc_id", "42").isEmpty)
  }

  test("diffManifestVersions: a takedown's provenance record — " +
      "exactly the touched shards as changed/removed, repointed paths " +
      "visible, untouched shards absent") {
    val dir = graft.core.Scratch.dir("export_diff")
    val base = corpus(120)
    val v1 = Export.exportShardsIncremental(base, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val drop = Seq(9L, 33L)
    val v2 = Export.retractShards(spark, dir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    val diff = Export.diffManifestVersions(
        spark, dir, v1.version, v2.version)
      .select(col("shard"), col("change"), col("old_path"),
        col("new_path"))
      .as[(Int, String, String, String)].collect()
    val touched = drop.map(i => Export.shardOfId(i.toString, 8)).toSet
    assert(diff.map(_._1).toSet == touched,
      s"diff shards ${diff.map(_._1).toSet} != touched $touched")
    diff.foreach { case (k, change, oldP, newP) =>
      assert(change == "changed" || change == "removed")
      if (change == "changed")
        assert(oldP != newP, s"changed shard $k kept its path in diff")
    }
  }

  test("retract and incremental re-export COMPOSE on one store: " +
      "takedown, then grow, then takedown again — the manifest always " +
      "equals the surviving corpus and unchanged files never move") {
    val dir = graft.core.Scratch.dir("export_retract_inc_compose")
    val n = 8
    def inc(df: org.apache.spark.sql.DataFrame) =
      Export.exportShardsIncremental(df, dir, n, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"))
    def retract(ids: Seq[Long]) =
      Export.retractShards(spark, dir, "doc_id", ids.map(_.toString),
        octet_length(col("text")), Seq("doc_id", "text"))
    def view() = Export.readShards(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSet
    val base = corpus(120)
    inc(base)
    retract(Seq(5L, 6L))
    val afterTakedown = base.as[(Long, String)].collect().toSet
      .filterNot(r => Set(5L, 6L)(r._1))
    assert(view() == afterTakedown)
    // grow the SURVIVING corpus (the caller re-presents it, minus the
    // retracted rows, plus new ones)
    val grown = afterTakedown ++ Set((7001L, "late-7001"))
    inc(grown.toSeq.toDF("doc_id", "text"))
    assert(view() == grown)
    // second takedown over the composed store
    retract(Seq(7001L, 10L))
    assert(view() == grown.filterNot(r => Set(7001L, 10L)(r._1)))
    // the audit holds over the whole composition
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
  }

  test("incremental store schema evolution: a column added to the " +
      "corpus reaches rewritten shards; older generations surface it " +
      "as null through the group reader") {
    val dir = graft.core.Scratch.dir("export_inc_evolve")
    val base = corpus(100)
    Export.exportShardsIncremental(base, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    // the corpus gains a lang column AND two new rows; only the new
    // rows' shards rewrite, carrying the new column
    val evolved = base.withColumn("lang", lit(null).cast("string"))
      .unionByName(Seq((8001L, "neu", "de"), (8002L, "nuevo", "es"))
        .toDF("doc_id", "text", "lang"))
    Export.exportShardsIncremental(evolved, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val back = Export.readShards(spark, dir)
    assert(back.columns.contains("lang"),
      "the evolved column must surface through the group reader")
    assert(back.count() == 102L)
    val langs = back.select(col("doc_id"), col("lang"))
      .as[(Long, Option[String])].collect().toMap
    assert(langs(8001L).contains("de") && langs(8002L).contains("es"))
    // rows from generations that never rewrote read the column as null
    assert(langs.count(_._2.isEmpty) >= 90,
      "old-generation rows must surface the evolved column as null")
  }

  test("retractShards: takedown touches ONLY the ids' shards, is " +
      "idempotent, drops emptied shards, and the driver-side shard " +
      "draw matches the engine draw exactly") {
    val dir = graft.core.Scratch.dir("export_retract")
    val docs = corpus(200)
    Export.exportShardsIncremental(docs, dir, 16, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    def paths() = Export.readShardManifest(spark, dir)
      .select(col("shard"), col("path")).as[(Int, String)]
      .collect().toMap
    val before = paths()
    // driver-side draw == engine draw for every id
    val engineDraw = docs.select(col("doc_id"),
        Export.shardOf(col("doc_id"), 16))
      .as[(Long, Int)].collect().toMap
    engineDraw.foreach { case (id, k) =>
      assert(Export.shardOfId(id.toString, 16) == k,
        s"driver draw diverged from engine draw for id $id")
    }
    val drop = Seq(3L, 77L, 150L)
    val touched = drop.map(i => Export.shardOfId(i.toString, 16)).toSet
    val res = Export.retractShards(spark, dir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(res.rows == 197L)
    val after = paths()
    before.foreach { case (k, p) =>
      if (touched(k)) assert(after(k) != p,
        s"affected shard $k kept its old file")
      else assert(after(k) == p, s"UNTOUCHED shard $k was rewritten")
    }
    // the documents are gone; everything else survives byte-exact
    val back = Export.readShards(spark, dir)
      .select("doc_id", "text")
    assert(back.count() == 197L)
    assert(back.filter(col("doc_id").isin(drop: _*)).isEmpty)
    assert(back.except(docs.filter(!col("doc_id").isin(drop: _*)))
      .isEmpty)
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // idempotent: re-running the takedown list is a version no-op
    val v2 = Export.retractShards(spark, dir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(v2.version == res.version,
      "re-running a takedown minted a new version")
    // emptying a whole shard drops it from the manifest
    val shard0Ids = engineDraw.collect {
      case (id, k) if k == engineDraw(3L) && !drop.contains(id) => id
    }.toSeq
    Export.retractShards(spark, dir, "doc_id",
      shard0Ids.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(!paths().keySet.contains(engineDraw(3L)),
      "an emptied shard stayed in the manifest")
  }

  test("exportShardsIncremental format=json: a jsonl store grows " +
      "O(changed) — unchanged .json.gz files reused by reference, " +
      "changed shards rewrite as gzip json deltas, no-op publishes " +
      "nothing, retract composes, family mixing is loud") {
    val dir = graft.core.Scratch.dir("export_inc_jsonl")
    def inc(df: org.apache.spark.sql.DataFrame) =
      Export.exportShardsIncremental(df, dir, 8, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"),
        format = "json")
    def paths() = Export.readShardManifest(spark, dir)
      .select(col("shard"), col("path")).as[(Int, String)]
      .collect().toMap
    val base = corpus(160)
    val v1 = inc(base)
    assert(Export.readShardManifest(spark, dir)
      .select(col("format")).head().getString(0) == "json_inc")
    paths().values.foreach(p => assert(p.contains(".json") &&
      p.endsWith(".gz"), s"expected gzip json shard files, got $p"))
    val back1 = Export.readShards(spark, dir, Some(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING")))
    assert(back1.select("doc_id", "text").except(base).isEmpty &&
      base.except(back1.select("doc_id", "text")).isEmpty)
    val paths1 = paths()
    // no-op re-export publishes nothing
    assert(inc(base).version == v1.version)
    // grow: only the new rows' shards rewrite
    val grown = base.unionByName(
      Seq((9001L, "new-doc-9001"), (9002L, "new-doc-9002"))
        .toDF("doc_id", "text"))
    val v2 = inc(grown)
    assert(v2.version > v1.version)
    val touched = Seq(9001L, 9002L)
      .map(i => Export.shardOfId(i.toString, 8)).toSet
    val paths2 = paths()
    paths1.foreach { case (k, p) =>
      if (touched(k)) assert(paths2(k) != p)
      else assert(paths2(k) == p,
        s"UNCHANGED jsonl shard $k was rewritten")
    }
    assert(Export.readShards(spark, dir, Some(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))).count() == 162L)
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // takedown composes on the incremental jsonl store
    Export.retractShards(spark, dir, "doc_id", Seq("9001"),
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(Export.lookupById(spark, dir, "doc_id", "9001").isEmpty)
    assert(Export.readShards(spark, dir, Some(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"))).count() == 161L)
    // family mixing is loud
    val e = intercept[IllegalArgumentException] {
      Export.exportShardsIncremental(grown, dir, 8, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"))
    }
    assert(e.getMessage.contains("never mixes layouts"))
  }

  test("retractShards on a JSONL store: the text-format takedown " +
      "rewrites only affected shards as gzip json (codec preserved), " +
      "readShards dispatches json_inc across generations, lookup " +
      "proves the id gone, audit holds, tar stores refuse loudly") {
    val dir = graft.core.Scratch.dir("export_retract_jsonl")
    val docs = corpus(150)
    Export.exportJsonlShards(docs, dir, 2048L, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    def paths() = Export.readShardManifest(spark, dir)
      .select(col("shard"), col("path")).as[(Int, String)]
      .collect().toMap
    val before = paths()
    val drop = Seq(11L, 47L)
    val res = Export.retractShards(spark, dir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(res.rows == 148L)
    val after = paths()
    val touched = drop.map(i => Export.shardOfId(i.toString,
      Export.readShardManifest(spark, dir)
        .select(col("n_shards")).head().getInt(0))).toSet
    before.foreach { case (k, p) =>
      if (touched(k)) {
        assert(after(k) != p, s"affected shard $k kept its old file")
        assert(after(k).contains(".json") && after(k).endsWith(".gz"),
          s"json delta lost the store codec: ${after(k)}")
      } else assert(after(k) == p, s"UNTOUCHED shard $k was rewritten")
    }
    assert(Export.readShardManifest(spark, dir)
      .select(col("format")).head().getString(0) == "json_inc")
    val back = Export.readShards(spark, dir, Some(
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING")))
    assert(back.count() == 148L)
    assert(back.select("doc_id", "text")
      .except(docs.filter(!col("doc_id").isin(drop: _*))).isEmpty)
    assert(Export.lookupById(spark, dir, "doc_id", "11").isEmpty)
    assert(Export.lookupById(spark, dir, "doc_id", "12")
      .count() == 1L)
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // idempotent re-run mints no version
    val v2 = Export.retractShards(spark, dir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(v2.version == res.version)
    // tar stores are immutable interchange artifacts
    val tarDir = graft.core.Scratch.dir("export_retract_tar")
    Export.exportTarShards(docs, tarDir, 2048L, col("doc_id"),
      col("text"))
    val e = intercept[IllegalArgumentException] {
      Export.retractShards(spark, tarDir, "key", Seq("11"),
        octet_length(col("payload")), Seq("key", "payload"))
    }
    assert(e.getMessage.contains("parquet and jsonl"))
  }

  test("retractShardsOf: the DataFrame takedown equals the Seq " +
      "takedown (same view, same manifest aggregates), re-running it " +
      "is a version no-op, and the Seq path bounds its in-plan id " +
      "list loudly") {
    val docs = corpus(300)
    val drop = docs.select(col("doc_id")).as[Long].collect()
      .filter(_ % 7 == 0).toSeq
    def build(tag: String): String = {
      val dir = graft.core.Scratch.dir(s"export_retract_df_$tag")
      Export.exportShardsIncremental(docs, dir, 16, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"))
      dir
    }
    val (seqDir, dfDir) = (build("seq"), build("df"))
    Export.retractShards(spark, seqDir, "doc_id",
      drop.map(_.toString), octet_length(col("text")),
      Seq("doc_id", "text"))
    val resDf = Export.retractShardsOf(spark, dfDir, "doc_id",
      drop.toDF("doc_id"), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(resDf.rows == 300L - drop.size)
    def view(d: String) = Export.readShards(spark, d)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSet
    assert(view(dfDir) == view(seqDir),
      "DataFrame takedown diverged from the Seq takedown")
    def agg(d: String) = Export.readShardManifest(spark, d)
      .select(col("shard"), col("n_rows"), col("bytes"), col("checksum"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(agg(dfDir) == agg(seqDir))
    assert(Export.verifyShards(spark, dfDir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // idempotent: a re-run (plus ids never stored) mints no version
    val v2 = Export.retractShardsOf(spark, dfDir, "doc_id",
      (drop ++ Seq(999999L)).toDF("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(v2.version == resDf.version,
      "re-running a DataFrame takedown minted a new version")
    // the Seq path refuses plan-inflating lists and names the route
    val big = (0 until Export.MaxRetractIds + 1).map(_.toString)
    val e = intercept[IllegalArgumentException] {
      Export.retractShards(spark, seqDir, "doc_id", big,
        octet_length(col("text")), Seq("doc_id", "text"))
    }
    assert(e.getMessage.contains("retractShardsOf"))
  }

  test("exportShardsIncremental: only changed shards rewrite (files " +
      "reused BY REFERENCE), no-op re-export publishes nothing, " +
      "vanished shards drop, re-shard attempts fail loudly, rollback " +
      "still reads, the sweep keeps every referenced generation") {
    val dir = graft.core.Scratch.dir("export_inc")
    val n = 8
    def inc(df: org.apache.spark.sql.DataFrame, keep: Int = 3) =
      Export.exportShardsIncremental(df, dir, n, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"), keep = keep)
    def manifestPaths() = Export.readShardManifest(spark, dir)
      .select(col("shard"), col("path")).as[(Int, String)]
      .collect().toMap
    val base = corpus(160)
    val v1 = inc(base)
    assert(v1.shards == n)
    // read-back through the parquet_inc group reader
    val back1 = Export.readShards(spark, dir)
    assert(back1.select("doc_id", "text").except(base).isEmpty &&
      base.except(back1.select("doc_id", "text")).isEmpty)
    val paths1 = manifestPaths()
    // no-op: identical content publishes NO new version, writes nothing
    val v1b = inc(base)
    assert(v1b.version == v1.version, "a no-op re-export minted a version")
    assert(manifestPaths() == paths1)
    // grow the corpus: only the new rows' shards may move
    val grown = base.unionByName(
      Seq((9001L, "new-doc-9001"), (9002L, "new-doc-9002"))
        .toDF("doc_id", "text"))
    val v2 = inc(grown)
    assert(v2.version > v1.version)
    val paths2 = manifestPaths()
    val touched = Seq(9001L, 9002L).map(i =>
      Export.shardAggregates(
        Seq((i, "")).toDF("doc_id", "x")
          .withColumn("shard", Export.shardOf(col("doc_id"), n)),
        lit(0L), Seq("doc_id")).select("shard").head().getInt(0)).toSet
    paths1.foreach { case (k, p) =>
      if (touched(k))
        assert(paths2(k) != p, s"changed shard $k kept its old file")
      else
        assert(paths2(k) == p,
          s"UNCHANGED shard $k was rewritten: ${paths2(k)}")
    }
    assert(Export.readShards(spark, dir).count() == 162L)
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
    // rollback: the previous version's mix of generations still reads
    graft.sources.Versioned.rollback(spark, s"$dir/manifest")
    assert(Export.readShards(spark, dir).count() == 160L)
    graft.sources.Versioned.publish(
      Export.readShardManifest(spark, dir).sparkSession.read
        .parquet(s"$dir/manifest/v_${v2.version}"),
      s"$dir/manifest"): Unit // roll forward again for the next steps
    // vanish a shard: export only rows of ONE shard's complement
    val keepShard = paths2.keySet.head
    val shrunk = grown.withColumn("shard",
        Export.shardOf(col("doc_id"), n))
      .filter(col("shard") =!= keepShard).drop("shard")
    val v3 = inc(shrunk)
    assert(v3.version > v2.version)
    assert(!manifestPaths().keySet.contains(keepShard),
      "a vanished shard stayed in the manifest")
    // re-shard attempt is loud
    val ex = intercept[IllegalArgumentException] {
      Export.exportShardsIncremental(grown, dir, n + 1, col("doc_id"),
        octet_length(col("text")), Seq("doc_id", "text"))
    }
    assert(ex.getMessage.contains("re-export fully"))
    // sweep: generations referenced by surviving versions survive
    val gens = manifestPaths().values
      .map(p => new java.io.File(new java.net.URI(p).getPath)
        .getParentFile.getParentFile.getName).toSet
    gens.foreach { g =>
      assert(new java.io.File(s"$dir/shards/$g").exists(),
        s"sweep deleted a referenced generation $g")
    }
  }

  test("content address includes the FORMAT: identical content " +
      "exported as parquet then jsonl into one root lands in two " +
      "dirs, and the superseded parquet manifest stays readable") {
    val dir = graft.core.Scratch.dir("export_format_addr")
    val docs = corpus(60)
    val rp = export(docs, dir, keep = 2)
    val rj = Export.exportJsonlShards(docs, dir, 2048L, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"), keep = 2)
    assert(rj.dataDir != rp.dataDir,
      "a different format must get a fresh content-addressed dir — " +
        "sharing one would overwrite files the retained parquet " +
        "manifest version still references")
    // the parquet snapshot behind the superseded manifest version is
    // intact: roll back and read it
    graft.sources.Versioned.rollback(spark, s"$dir/manifest")
    val back = Export.readShards(spark, dir)
    assert(back.count() == 60L)
    assert(back.select("doc_id", "text").except(docs).isEmpty)
  }

  test("exportTarSamples: <key>.bin + <key>.json pairs, adjacent and " +
      "key-sorted per tar, round-trip as (key, payload, meta) rows; " +
      "a torn pair fails loudly") {
    val dir = graft.core.Scratch.dir("export_tar_samples")
    val docs = corpus(80).withColumn("meta",
      concat(lit("{\"id\":"), col("doc_id"), lit("}")))
    val res = Export.exportTarSamples(docs, dir, 2048L,
      col("doc_id"), col("text"), col("meta"))
    assert(res.rows == 80L)
    val back = Export.readShards(spark, dir)
    assert(back.columns.toSeq ==
      Seq("shard", "key", "payload", "meta"))
    val pairs = back.select(col("key").cast("long"),
        col("payload").cast("string"), col("meta"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val want = docs.select(col("doc_id"), col("text"), col("meta"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(pairs == want, "sample pairs did not round-trip")
    assert(Export.verifyShards(spark, dir,
      octet_length(col("payload")) + octet_length(col("meta")),
      Seq("key", "payload", "meta")).isEmpty)
    // entries inside each tar: bin/json interleaved, key-sorted
    Export.readShardManifest(spark, dir).collect().foreach { r =>
      val f = new java.io.File(new java.net.URI(
        r.getAs[String]("path")).getPath)
      val names = Export.untar(
        java.nio.file.Files.readAllBytes(f.toPath)).map(_._1).toSeq
      assert(names.size % 2 == 0)
      names.grouped(2).foreach { case Seq(a, b) =>
        assert(a.endsWith(".bin") && b.endsWith(".json") &&
          a.stripSuffix(".bin") == b.stripSuffix(".json"),
          s"pair order broke: $a / $b")
      }
      val keys = names.grouped(2).map(_.head.stripSuffix(".bin")).toSeq
      assert(keys == keys.sorted, s"samples not key-sorted: $keys")
    }
    // a torn pair (dangling .bin) must fail the read, not yield a
    // half-sample
    val victim = Export.readShardManifest(spark, dir)
      .select(col("path")).head().getString(0)
    val vf = new java.io.File(new java.net.URI(victim).getPath)
    val entries = Export.untar(
      java.nio.file.Files.readAllBytes(vf.toPath)).toSeq
    val torn = new java.io.ByteArrayOutputStream()
    // keep the first entry only (a .bin without its .json), then end
    val first = entries.head
    val hdr = Export.getClass.getDeclaredMethods
      .find(_.getName == "tarHeader").get
    hdr.setAccessible(true)
    torn.write(hdr.invoke(Export, first._1,
      java.lang.Long.valueOf(first._2.length.toLong))
      .asInstanceOf[Array[Byte]])
    torn.write(first._2)
    val pad = (512 - first._2.length % 512) % 512
    if (pad > 0) torn.write(new Array[Byte](pad))
    torn.write(new Array[Byte](1024))
    java.nio.file.Files.write(vf.toPath, torn.toByteArray)
    intercept[Exception] { Export.readShards(spark, dir).count() }
  }

  test("exportTarShards: WebDataset-style tar per shard — key-sorted " +
      "entries round-trip, manifest/audit agree, re-export is " +
      "BYTE-identical (deterministic tar), oversized keys fail loudly") {
    val dir = graft.core.Scratch.dir("export_tar")
    val docs = corpus(120)
    val res = Export.exportTarShards(docs, dir, 2048L,
      col("doc_id"), col("text"))
    assert(res.shards > 1 && res.rows == 120L)
    // read round-trip through the manifest's format dispatch
    val back = Export.readShards(spark, dir)
      .select(col("key").cast("long").as("doc_id"),
        col("payload").cast("string").as("text"))
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
    // audit over the tar read-back surface
    assert(Export.verifyShards(spark, dir,
      octet_length(col("payload")), Seq("key", "payload")).isEmpty)
    // entries are key-sorted inside each tar (the loader contract)
    val m = Export.readShardManifest(spark, dir).collect()
    m.foreach { r =>
      val f = new java.io.File(new java.net.URI(
        r.getAs[String]("path")).getPath)
      assert(f.getName.endsWith(".tar") &&
        f.length == r.getAs[Long]("file_bytes"))
      val names = Export.untar(
        java.nio.file.Files.readAllBytes(f.toPath)).map(_._1).toSeq
      assert(names == names.sorted, s"tar entries not key-sorted: $names")
    }
    // byte-identical idempotency: same content -> same dir, same bytes
    val bytes1 = m.map(r => r.getAs[String]("path") ->
      java.nio.file.Files.readAllBytes(new java.io.File(
        new java.net.URI(r.getAs[String]("path")).getPath).toPath).toSeq)
      .toMap
    val res2 = Export.exportTarShards(docs, dir, 2048L,
      col("doc_id"), col("text"))
    assert(res2.dataDir == res.dataDir)
    bytes1.foreach { case (path, b) =>
      val now = java.nio.file.Files.readAllBytes(new java.io.File(
        new java.net.URI(path).getPath).toPath).toSeq
      assert(now == b, s"re-export changed tar bytes at $path")
    }
    // USTAR name bound is loud
    val longKey = Seq(("k" * 120, "x")).toDF("doc_id", "text")
    intercept[Exception] {
      Export.exportTarShards(longKey,
        graft.core.Scratch.dir("export_tar_long"), 2048L,
        col("doc_id"), col("text"))
    }
  }

  test("exportTarShards: a null payload becomes an EMPTY tar entry " +
      "(no NPE), round-trips as zero bytes, and checksums apart from " +
      "an empty-string payload on another key") {
    val dir = graft.core.Scratch.dir("export_tar_null")
    val rows = Seq((1L, "hello"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val res = Export.exportTarShards(rows, dir, 1L << 20,
      col("doc_id"), col("text"))
    assert(res.rows == 3L)
    val back = Export.readShards(spark, dir)
      .select(col("key"), length(col("payload")).cast("int"))
      .as[(String, Int)].collect().toMap
    assert(back == Map("1" -> 5, "2" -> 0, "3" -> 0))
    assert(Export.verifyShards(spark, dir,
      octet_length(col("payload")), Seq("key", "payload")).isEmpty)
  }

  test("tar round-trip at the 512-byte block boundaries: payloads of " +
      "0, 1, 511, 512, 513 and 1024 bytes survive write->stream-read " +
      "byte-exact (padding arithmetic has no off-by-one)") {
    val dir = graft.core.Scratch.dir("export_tar_boundary")
    val sizes = Seq(0, 1, 511, 512, 513, 1024)
    val rows = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, "b" * n)
    }.toDF("doc_id", "text")
    Export.exportTarShards(rows, dir, 1L << 20, col("doc_id"),
      col("text"))
    val back = Export.readShards(spark, dir)
      .select(col("key").cast("long"), col("payload").cast("string"))
      .as[(Long, String)].collect().toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      assert(back(i.toLong) == "b" * n,
        s"payload of $n bytes did not round-trip")
    }
  }

  test("untarStream: entries stream off an InputStream that is never " +
      "materialized (a generated 64 MiB tar reads entry-by-entry), " +
      "and truncation anywhere is LOUD") {
    // a tar GENERATOR stream: no byte array of the whole tar ever
    // exists, so a pass proves the read path needs only one entry in
    // memory — the round-15 whole-blob cut could not run this test
    val entrySize = 64 * 1024
    val nEntries = 1024 // 64 MiB of payload
    def hdr(name: String, size: Long) = {
      val m = Export.getClass.getDeclaredMethods
        .find(_.getName == "tarHeader").get
      m.setAccessible(true)
      m.invoke(Export, name, java.lang.Long.valueOf(size))
        .asInstanceOf[Array[Byte]]
    }
    def gen(truncateAt: Long = Long.MaxValue) = new java.io.InputStream {
      private var entry = 0
      private var buf: Array[Byte] = Array.empty
      private var pos = 0
      private var emitted = 0L
      override def read(): Int = {
        if (pos >= buf.length) {
          if (entry > nEntries) return -1
          buf =
            if (entry == nEntries) new Array[Byte](1024) // end blocks
            else hdr(f"e$entry%05d.txt", entrySize.toLong) ++
              Array.fill[Byte](entrySize)((entry % 251).toByte)
          pos = 0; entry += 1
        }
        if (emitted >= truncateAt) return -1
        emitted += 1
        pos += 1
        buf(pos - 1) & 0xff
      }
    }
    var n = 0
    Export.untarStream("gen", new java.io.BufferedInputStream(
        gen(), 1 << 16)).foreach { case (name, payload) =>
      assert(name == f"e$n%05d.txt" && payload.length == entrySize &&
        payload(0) == (n % 251).toByte)
      n += 1
    }
    assert(n == nEntries)
    // truncate mid-payload of a later entry: loud, names the entry
    val cut = 512L * 3 + entrySize + 100 // inside entry 1's payload
    val e = intercept[RuntimeException] {
      Export.untarStream("gen", gen(truncateAt = cut)).foreach(_ => ())
    }
    assert(e.getMessage.contains("truncated tar"),
      s"expected a loud truncation, got: ${e.getMessage}")
  }

  test("epochOrder: positions are an exact 1..N permutation, " +
      "reproducible for the same (seed, epoch), different across " +
      "epochs, and in-shard blocks follow the shard draw order") {
    val dir = graft.core.Scratch.dir("export_epoch")
    val docs = corpus(150)
    val res = export(docs, dir)
    def order(epoch: Int) = Export
      .epochOrder(spark, dir, "doc_id", seed = 7L, epoch = epoch)
      .select(col("epoch_pos").cast("long"), col("doc_id"), col("shard"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val e0 = order(0)
    assert(e0.map(_._1).toSeq == (1L to 150L),
      "epoch positions must be an exact 1..N permutation")
    // reproducible: same (seed, epoch) -> identical order
    assert(order(0).toSeq == e0.toSeq)
    // a different epoch is a DIFFERENT permutation of the same docs
    val e1 = order(1)
    assert(e1.map(_._2).toSet == e0.map(_._2).toSet)
    assert(e1.map(_._2).toSeq != e0.map(_._2).toSeq,
      "changing the epoch must move the order")
    // shards are contiguous blocks (visit order = the shard draw)
    val shardRuns = e0.map(_._3).foldLeft(List.empty[Int]) {
      case (acc, sh) if acc.headOption.contains(sh) => acc
      case (acc, sh) => sh :: acc
    }
    assert(shardRuns.distinct.size == shardRuns.size,
      "a shard's rows must be one contiguous block in the epoch order")
    assert(shardRuns.toSet == e0.map(_._3).toSet)
  }

  test("retractShards spans EVOLVED generations: a takedown touching " +
      "a pre-evolution shard and a post-evolution shard in ONE call " +
      "unions the schemas and retracts (no AnalysisException)") {
    val dir = graft.core.Scratch.dir("export_retract_evolve")
    val base = corpus(100)
    Export.exportShardsIncremental(base, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    // evolve: +lang column, +2 rows — only the new rows' shards
    // rewrite, so the store now spans a no-lang generation and a
    // lang-carrying generation
    val evolved = base.withColumn("lang", lit(null).cast("string"))
      .unionByName(Seq((8001L, "neu", "de"), (8002L, "nuevo", "es"))
        .toDF("doc_id", "text", "lang"))
    Export.exportShardsIncremental(evolved, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    // one old-generation id + one new-generation id, retracted together:
    // the affected-shard union spans both schemas
    val newShards = Set("8001", "8002").map(Export.shardOfId(_, 8))
    val oldId = base.select(col("doc_id")).as[Long].collect()
      .find(i => !newShards(Export.shardOfId(i.toString, 8))).get
    val res = Export.retractShards(spark, dir, "doc_id",
      Seq(oldId.toString, "8001"), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(res.rows == 100L) // 102 - 2
    val back = Export.readShards(spark, dir)
    assert(back.filter(col("doc_id").isin(oldId, 8001L)).isEmpty)
    assert(back.count() == 100L)
    assert(Export.verifyShards(spark, dir,
      octet_length(col("text")), Seq("doc_id", "text")).isEmpty)
  }

  test("legacy manifest (no format / checksum_scheme columns — the " +
      "pre-round-15 on-disk shape): plain reads work (format defaults " +
      "to parquet), checksum consumers refuse LOUDLY as scheme 1") {
    val dir = graft.core.Scratch.dir("export_legacy_manifest")
    val docs = corpus(90)
    val res = export(docs, dir)
    // rewrite the promoted manifest WITHOUT the round-15 columns
    val legacy = Export.readShardManifest(spark, dir)
      .drop("format", "checksum_scheme")
    Versioned.publish(legacy, s"$dir/manifest"): Unit
    // plain reads: full read and point lookup both dispatch as parquet
    val back = Export.readShards(spark, dir)
    assert(back.count() == 90L)
    assert(back.select("doc_id", "text").except(docs).isEmpty)
    assert(Export.lookupById(spark, dir, "doc_id", "42")
      .select(col("text")).as[String].collect().nonEmpty)
    assert(Export.epochOrder(spark, dir, "doc_id", 1L, 0)
      .count() == 90L)
    // checksum consumers: loud, actionable, attributable to the
    // formula change — never phantom mismatches
    Seq(
      () => Export.verifyShards(spark, dir,
        octet_length(col("text")), Seq("doc_id", "text")).count(),
      () => Export.exportShardsIncremental(docs, dir, res.shards,
        col("doc_id"), octet_length(col("text")),
        Seq("doc_id", "text")): Unit,
      () => Export.retractShards(spark, dir, "doc_id", Seq("42"),
        octet_length(col("text")), Seq("doc_id", "text")): Unit
    ).foreach { op =>
      val e = intercept[IllegalArgumentException] { op() }
      assert(e.getMessage.contains("checksum scheme 1"),
        s"expected the scheme refusal, got: ${e.getMessage}")
    }
    // published manifests RECORD the scheme going forward
    val dir2 = graft.core.Scratch.dir("export_scheme_col")
    export(docs, dir2): Unit
    assert(Export.readShardManifest(spark, dir2)
      .select(col("checksum_scheme")).distinct()
      .as[Int].collect().toSeq == Seq(Export.ChecksumScheme))
  }

  test("exportShards exclude gate: the published store equals " +
      "decontaminate-then-export (exactly the contaminated docs " +
      "dropped, manifest computed over survivors only)") {
    import graft.ops.{Dedup, Text}
    val docs = (0 until 60).map { i =>
      val base = s"unique document number $i with plain filler words"
      // docs 50-59 are the eval set; docs 0-9 quote eval doc (i+50)'s
      // exact phrasing -> contaminated; 10-49 are clean
      val text =
        if (i < 10) base + s" quoting unique document number ${i + 50} " +
          "with plain filler words"
        else base
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") < 50)
    val eval_ = docs.filter(col("doc_id") >= 50)
    val grams = eval_.select(explode(
      Text.shingles(col("text"), 5)).as("g"))
    val gatedDir = graft.core.Scratch.dir("export_gate")
    val refDir = graft.core.Scratch.dir("export_gate_ref")
    val resGated = Export.exportShards(train, gatedDir, 1024L,
      col("doc_id"), octet_length(col("text")), Seq("doc_id", "text"),
      exclude = Some(Export.ExcludeGrams(col("text"), grams, 5)))
    val resRef = Export.exportShards(
      Dedup.decontaminate(train, "doc_id", col("text"), eval_,
        col("text"), n = 5),
      refDir, 1024L, col("doc_id"), octet_length(col("text")),
      Seq("doc_id", "text"))
    assert(resGated.rows == 40L, s"gate kept ${resGated.rows} rows")
    assert(resGated.rows == resRef.rows &&
      resGated.shards == resRef.shards)
    def view(d: String) = Export.readShards(spark, d)
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    assert(view(gatedDir) == view(refDir))
    assert(view(gatedDir) == (10L until 50L).toSet,
      "gate must drop exactly the contaminated docs")
    // identical content -> identical content-addressed dir name
    assert(new java.io.File(new java.net.URI(
        "file://" + resGated.dataDir).getPath).getName ==
      new java.io.File(new java.net.URI(
        "file://" + resRef.dataDir).getPath).getName)
  }

  test("storeCard: version/provenance-aware publication card — all " +
      "shards 'added' on a first version, a takedown shows up as " +
      "changed+removed against v-1, token/dup stats read from the " +
      "store, langless stores card with null top_lang") {
    val dir = graft.core.Scratch.dir("export_store_card")
    val docs = (0 until 96).map(i =>
        (i.toLong, s"word$i text text", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")
    Export.exportShardsIncremental(docs, dir, 8, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val c1 = Export.storeCard(spark, dir, "text", Some("lang"))
      .as[(Long, Int, Long, Long, Long, String, Long, Long, Long, Long)]
      .head()
    assert(c1 == ((1L, 8, 96L, 96L * 3, 2L, "en", 0L, 8L, 0L, 0L)),
      s"first-version card was $c1")
    // retract one whole shard's ids plus one id elsewhere: the card
    // against v-1 must show exactly those shards as removed/changed
    val byShard = docs.select(col("doc_id")).as[Long].collect()
      .groupBy(i => Export.shardOfId(i.toString, 8))
    val emptied = byShard.keys.head
    val otherId = byShard.collect {
      case (k, ids) if k != emptied => ids.head }.head
    Export.retractShards(spark, dir, "doc_id",
      (byShard(emptied).toSeq :+ otherId).map(_.toString),
      octet_length(col("text")), Seq("doc_id", "text"))
    val c2 = Export.storeCard(spark, dir, "text", Some("lang"))
      .as[(Long, Int, Long, Long, Long, String, Long, Long, Long, Long)]
      .head()
    assert(c2._1 == 2L && c2._3 == (96L - byShard(emptied).size - 1))
    assert(c2._8 == 0L && c2._9 == 1L && c2._10 == 1L,
      s"expected 0 added / 1 changed / 1 removed, got $c2")
    // langless: n_langs 0, top_lang null, same counting
    val c3 = Export.storeCard(spark, dir, "text", None)
      .select(col("n_langs"), col("top_lang"), col("n_docs"))
      .as[(Long, Option[String], Long)].head()
    assert(c3 == ((0L, None, c2._3)))
  }

  test("epochWorkerSlices: W contiguous shard-granular slices — " +
      "disjoint union is the full epoch, worker ids non-decreasing " +
      "along the global order, one worker per shard, balanced to " +
      "within one shard, reproducible, and moving with the epoch") {
    val dir = graft.core.Scratch.dir("export_epoch_workers")
    val docs = corpus(200)
    export(docs, dir): Unit
    val w = 4
    def slices(epoch: Int) = Export
      .epochWorkerSlices(spark, dir, "doc_id", seed = 11L,
        epoch = epoch, nWorkers = w)
      .select(col("epoch_pos").cast("long"), col("doc_id"),
        col("shard"), col("worker"))
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    val e0 = slices(0)
    // disjoint union = the full epoch (every doc exactly once, with
    // the same positions the plain epoch order assigns)
    assert(e0.map(_._1).toSeq == (1L to 200L))
    assert(e0.map(_._2).toSet ==
      docs.select("doc_id").as[Long].collect().toSet)
    val plain = Export.epochOrder(spark, dir, "doc_id", 11L, 0)
      .select(col("epoch_pos").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(e0.map(r => (r._1, r._2)).toSeq == plain.toSeq,
      "the worker view must not move the epoch order itself")
    // contiguous: worker id is non-decreasing along the global order
    assert(e0.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
      "worker slices must be contiguous runs of the epoch order")
    assert(e0.map(_._4).distinct.toSeq == (0 until w),
      "every worker must get a slice at this scale")
    // shard-granular: a shard never splits across workers
    e0.groupBy(_._3).foreach { case (sh, rows) =>
      assert(rows.map(_._4).distinct.size == 1,
        s"shard $sh split across workers")
    }
    // balanced to within the largest shard's rows
    val sizes = e0.groupBy(_._4).view.mapValues(_.size).values.toSeq
    val maxShard = e0.groupBy(_._3).map(_._2.size).max
    assert(sizes.max - sizes.min <= maxShard,
      s"slices $sizes unbalanced beyond one shard ($maxShard rows)")
    // pure draw: reproducible for the same key, moved by the epoch
    assert(slices(0).toSeq == e0.toSeq)
    val e1 = slices(1)
    assert(e1.map(_._2).toSeq != e0.map(_._2).toSeq,
      "a new epoch must re-deal the slices")
  }

  test("epochWorkerFiles: the pure-metadata files view agrees with " +
      "epochWorkerSlices row-for-row (same worker per shard, visit " +
      "order = the slice order), reads ONLY the manifest, and lists " +
      "real files covering every row") {
    val dir = graft.core.Scratch.dir("export_epoch_files")
    val docs = corpus(160)
    export(docs, dir): Unit
    val files = Export.epochWorkerFiles(spark, dir, seed = 9L,
      epoch = 1, nWorkers = 3)
    assert(files.inputFiles.forall(_.contains("/manifest/")),
      "the files view must touch only manifest metadata")
    val f = files.select(col("worker"), col("visit_pos"),
        col("shard"), col("path"), col("n_rows"))
      .as[(Int, Int, Int, String, Long)].collect().sortBy(_._2)
    // visit order is contiguous 1..S and worker ids non-decreasing
    assert(f.map(_._2).toSeq == (1 to f.length))
    assert(f.map(_._1).sliding(2).forall(p => p(0) <= p(1)))
    // per-shard worker equals the row-level slice assignment
    val rowView = Export.epochWorkerSlices(spark, dir, "doc_id",
        9L, 1, 3)
      .select(col("shard"), col("worker")).distinct()
      .as[(Int, Int)].collect().toMap
    f.foreach { case (w, _, sh, _, _) =>
      assert(rowView(sh) == w, s"files view worker $w != row view " +
        s"${rowView(sh)} for shard $sh")
    }
    // the files exist and the listed row counts cover the corpus
    f.foreach { case (_, _, _, p, _) =>
      assert(new java.io.File(new java.net.URI(p).getPath).isFile)
    }
    assert(f.map(_._5).sum == 160L)
  }

  test("epochOrder's manifest-count shortcut: the store-based order " +
      "(offsets from manifest n_rows, no second corpus pass) equals " +
      "the frame-based order exactly — including worker slices, on a " +
      "jsonl store where the saved pass is a full re-decode") {
    val dir = graft.core.Scratch.dir("export_epoch_manifest")
    val docs = corpus(140)
    Export.exportJsonlShards(docs, dir, 2048L, col("doc_id"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val viaManifest = Export
      .epochOrder(spark, dir, "doc_id", seed = 5L, epoch = 2)
      .select(col("doc_id").cast("long"), col("epoch_pos").cast("long"))
      .as[(Long, Long)].collect().toSet
    val viaFrame = Export
      .epochOrderOf(Export.readShards(spark, dir), "doc_id", 5L, 2)
      .select(col("doc_id").cast("long"), col("epoch_pos").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(viaManifest == viaFrame,
      "manifest-count offsets diverged from recomputed counts")
    val wm = Export.epochWorkerSlices(spark, dir, "doc_id", 5L, 2, 3)
      .select(col("doc_id").cast("long"), col("worker"))
      .as[(Long, Int)].collect().toSet
    val wf = Export.epochWorkerSlicesOf(
        Export.readShards(spark, dir), "doc_id", 5L, 2, 3)
      .select(col("doc_id").cast("long"), col("worker"))
      .as[(Long, Int)].collect().toSet
    assert(wm == wf)
  }

  test("rowChecksum null-normalization: rows differing only in null " +
      "PLACEMENT get different checksums, and a null column never " +
      "drops the row from the sum") {
    def sum1(rows: Seq[(Long, String, String)]): Long =
      Export.shardAggregates(
        rows.toDF("doc_id", "c1", "c2").withColumn("shard", lit(0)),
        lit(1L), Seq("doc_id", "c1", "c2"))
        .select("checksum").head().getLong(0)
    val nullFirst = sum1(Seq((1L, null, "a")))
    val nullSecond = sum1(Seq((1L, "a", null)))
    // pre-fix concat_ws skipped null operands AND their separators, so
    // both rows canonicalized to "1\u0001a" and collided
    assert(nullFirst != nullSecond,
      "null placement must move the checksum")
    // and neither row vanished from the sum (the DuckDB || chain would
    // have nulled the row out entirely without the coalesce mirror)
    assert(nullFirst != 0L && nullSecond != 0L)
    // fully-null checksum cols still contribute a deterministic draw
    val bothNull = sum1(Seq((1L, null, null)))
    assert(bothNull != 0L && bothNull != nullFirst &&
      bothNull != nullSecond)
  }

  test("shard assignment is the portable md5 draw: membership " +
      "replays relationally, and a row moves shards only if the " +
      "corpus size target moves") {
    val dir = graft.core.Scratch.dir("export_draw")
    val docs = corpus(80)
    val res = export(docs, dir)
    val got = Export.readShards(spark, dir)
      .select(col("doc_id"), col("shard")).as[(Long, Int)]
      .collect().toMap
    val want = docs.select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 8), 16, 10).cast("long"),
          lit(res.shards.toLong)).cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(got == want, "shard membership diverged from the md5 draw")
  }

  test("store profile: per-shard sketches merge to EXACTLY the global " +
      "sketch (KMV k-min union re-min; bucket counts add) and the " +
      "profile reads without a shard rescan") {
    val dir = graft.core.Scratch.dir("export_profile")
    val df = corpus(500)
    export(df, dir)
    Export.publishShardProfile(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING"),
      key = col("text"), v = length(col("text")).cast("long"), k = 64)
    val prof = Export.readStoreProfile(spark, dir, k = 64).head()
    // manifest totals
    assert(prof.getAs[Long]("n_rows") == 500L)
    // merge law: the merged KMV estimate equals the estimate of a
    // DIRECT global sketch over the same corpus
    val direct = graft.ops.Kmv
      .distinctEstimate(df, col("text"), k = 64).head()
    assert(prof.getAs[Long]("n_sketch") == direct.getAs[Long]("n_sketch"))
    assert(prof.getAs[Long]("kth_hv") == direct.getAs[Long]("kth_hv"))
    assert(prof.getAs[Double]("est_distinct") ==
      direct.getAs[Double]("est_distinct"))
    // merge law: merged bucket quantiles equal a direct global sketch
    val lhDirect = graft.ops.LogHist.quantiles(
      graft.ops.LogHist.sketch(df, Seq.empty,
        length(col("text")).cast("long")),
      Seq.empty, Seq(250000L, 500000L, 750000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prof.getAs[Long]("p25") == lhDirect(250000L))
    assert(prof.getAs[Long]("p50") == lhDirect(500000L))
    assert(prof.getAs[Long]("p75") == lhDirect(750000L))
    // the profile state is KB-sized: <= shards*k KMV rows
    val nShards = Export.readShardManifest(spark, dir).count()
    val kmvRows = Versioned.readCurrent(spark, s"$dir/profile_kmv").count()
    assert(kmvRows <= nShards * 64)
  }

  test("compactStore: a three-generation incremental store collapses " +
      "to ONE plain generation with identical per-shard triples; " +
      "plain stores are a publish-free no-op; future increments " +
      "continue from the compacted base") {
    val dir = graft.core.Scratch.dir("export_compact")
    val a = corpus(300)
    Export.exportShardsIncremental(
      a.filter(col("doc_id") % 2 === 0), dir, nShards = 4,
      id = col("doc_id"), sizeOf = octet_length(col("text")),
      checksumCols = Seq("doc_id", "text"))
    Export.exportShardsIncremental(a, dir, nShards = 4,
      id = col("doc_id"), sizeOf = octet_length(col("text")),
      checksumCols = Seq("doc_id", "text"))
    Export.retractShards(spark, dir, "doc_id", Seq("7", "13"),
      octet_length(col("text")), Seq("doc_id", "text"))
    def manifestTriples() = Export.readShardManifest(spark, dir)
      .select("shard", "n_rows", "bytes", "checksum")
      .collect().map(r => (r.getInt(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def generations() = Export.readShardManifest(spark, dir)
      .select("path").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0))
        .getParent.getParent.toString).distinct.length
    val before = manifestTriples()
    assert(generations() >= 2, "fixture must actually span generations")
    assert(Export.readShardManifest(spark, dir)
      .select("format").head().getString(0) == "parquet_inc")
    val ddl = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val compacted = Export.compactStore(spark, dir, ddl,
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(manifestTriples() == before,
      "compaction must move files, never rows")
    assert(generations() == 1)
    assert(Export.readShardManifest(spark, dir)
      .select("format").head().getString(0) == "parquet")
    assert(Export.readShards(spark, dir, Some(ddl)).count() == 298L)
    // idempotent: a second compaction publishes nothing
    val again = Export.compactStore(spark, dir, ddl,
      octet_length(col("text")), Seq("doc_id", "text"))
    assert(again.version == compacted.version)
    // increments continue from the compacted base
    Export.exportShardsIncremental(a.filter(col("doc_id") =!= 7),
      dir, nShards = 4, id = col("doc_id"),
      sizeOf = octet_length(col("text")),
      checksumCols = Seq("doc_id", "text"))
    assert(Export.readShards(spark, dir, Some(ddl)).count() == 299L)
  }

  test("refreshShardProfile: a takedown re-sketches ONLY its shards, " +
      "the refreshed profile equals a from-scratch publish, and a " +
      "no-change refresh publishes nothing") {
    val dir = graft.core.Scratch.dir("export_profile_refresh")
    val df = corpus(400)
    val ddl = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    Export.exportShardsIncremental(df, dir, nShards = 8,
      id = col("doc_id"), sizeOf = octet_length(col("text")),
      checksumCols = Seq("doc_id", "text"))
    Export.publishShardProfile(spark, dir, ddl,
      key = col("text"), v = length(col("text")).cast("long"), k = 32)
    // takedown touches at most 2 shards
    Export.retractShards(spark, dir, "doc_id", Seq("11", "23"),
      octet_length(col("text")), Seq("doc_id", "text"))
    val n = Export.refreshShardProfile(spark, dir, ddl,
      key = col("text"), v = length(col("text")).cast("long"), k = 32)
    assert(n >= 1 && n <= 2, s"takedown of 2 ids re-sketched $n shards")
    def profile(d: String) = {
      val kmv = Versioned.readCurrent(spark, s"$d/profile_kmv")
        .select("shard", "hv").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      val lh = Versioned.readCurrent(spark, s"$d/profile_loghist")
        .select("shard", "bucket", "n").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      (kmv, lh)
    }
    val refreshed = profile(dir)
    // ground truth: a from-scratch publish over the post-takedown store
    Export.publishShardProfile(spark, dir, ddl,
      key = col("text"), v = length(col("text")).cast("long"), k = 32)
    assert(profile(dir) == refreshed,
      "incremental refresh must equal the full republish")
    // read view still one row, and totals reflect the takedown
    val prof = Export.readStoreProfile(spark, dir, k = 32).head()
    assert(prof.getAs[Long]("n_rows") == 398L)
    // no-op refresh: nothing moved, nothing published
    val v0 = Versioned.currentVersion(spark, s"$dir/profile_kmv").get
    assert(Export.refreshShardProfile(spark, dir, ddl,
      key = col("text"), v = length(col("text")).cast("long"),
      k = 32) == 0)
    assert(Versioned.currentVersion(spark, s"$dir/profile_kmv")
      .get == v0)
  }
}
