package graft

/** Dev-only: phase breakdown of the stored study-index refresh face.
  * `sbt "Test/runMain graft.BreakdownProbe <reps>"`. */
object BreakdownProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val spark = WithSpark.session
    graft.queries.IndexQueries.warm(spark)
    val fixtureDir = graft.queries.SourceQueries.FixtureDir
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bk] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42")
    (1 to reps).foreach { rep =>
      println(s"== rep $rep ==")
      val in = t("fromDir") {
        graft.etl.Indexes.ClinicalInputs.fromDir(spark, fixtureDir)
      }
      val dir = t("stalePriorStore (cached)") {
        graft.queries.IndexQueries.probeStalePriorStore(spark)
      }
      t("refreshStudyIndexStore") {
        graft.etl.Indexes.refreshStudyIndexStore(
          spark, dir, in, Seq("GS001"), meta)
      }
      // inner split: plan construction vs the rebuild action
      val priorU = t("  readCurrent(universe)") {
        graft.sources.Versioned.readCurrent(spark, s"$dir/universe")
      }
      val slice = t("  studyIndex plan only") {
        graft.etl.Indexes.studyIndex(
          graft.etl.Indexes.filterStudies(in, Seq("GS001")), meta,
          shared = None, extraCatKeys = Some(priorU))
      }
      t("  rebuild count (action)") { slice.count() }
      val view = t("readStudyIndexStore (plan)") {
        graft.etl.Indexes.readStudyIndexStore(spark, dir)
      }
      t("flatten+count") {
        graft.queries.Canon.flattenNested(view).count()
      }
    }
    spark.stop()
  }
}
