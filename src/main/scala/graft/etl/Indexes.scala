package graft.etl

import graft.functions.GraftFunctions
import graft.ops.{Nest, Ontology}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index assembly — composing the nest/summary/ontology operators into
  * the reference's output products (reference: indexes/DonorIndex
  * .scala:21-113, indexes/DataAccess.scala:9-43, indexes/Summary
  * .scala:18-121): one row per parent entity carrying every child
  * table as a sorted array-of-struct column, a summary struct, and
  * literal metadata stamps.
  *
  * Scale shape: every child nest is ONE shuffle on the parent key and
  * the assembly is a chain of left equi-joins on that same key, so at
  * 100 TB the whole index builds in parent-key partitioning end to
  * end; dimension sides (study, DUO codes, ontology terms) are
  * explicitly broadcast. The reference's six chained full-outer
  * summary joins (Summary.scala:115-121) are replaced by single-pass
  * aggregation per child source.
  */
object Indexes {

  private val DonorKey = Seq("study_id", "submitter_donor_id")

  /** Observed/non-observed phenotypes, ontology-expanded and nested,
    * one row per donor — ONE scan of the phenotype fact table (the
    * observed flag joins the expansion group keys; a first(when)
    * pivot splits the two columns afterwards). Shared by the donor,
    * study, and file indexes. */
  private def phenotypesPerDonor(
      phenotype: DataFrame, terms: DataFrame): DataFrame = {
    val flagged = phenotype.withColumn(
      "__obs", GraftFunctions.truthy(col("phenotype_observed")))
    Ontology.expandAndNest(
        flagged, terms, codeCol = "phenotype_HPO_code",
        groupKeys = DonorKey :+ "__obs", valueCol = "age_at_phenotype",
        as = "__phenos")
      .groupBy(DonorKey.map(col): _*)
      .agg(
        first(when(col("__obs"), col("__phenos")), ignoreNulls = true)
          .as("observed_phenotypes"),
        first(when(!col("__obs"), col("__phenos")), ignoreNulls = true)
          .as("non_observed_phenotypes"))
  }

  /** File rows with their biospecimen (and its nested samples) struct
    * attached. Shared by the three indexes. */
  private def filesWithBiospecimen(
      file: DataFrame, biospecimen: DataFrame,
      samples: DataFrame): DataFrame = {
    val bioWithSamples = Nest.attachChildren(
      biospecimen,
      Nest.nestChildren(
        samples.select("submitter_biospecimen_id", "submitter_sample_id",
          "sample_type"),
        Seq("submitter_biospecimen_id"),
        Seq(col("submitter_sample_id"), col("sample_type")), "samples"),
      Seq("submitter_biospecimen_id"), "samples")
    file.join(
      bioWithSamples.select(
        col("submitter_biospecimen_id"),
        struct(col("biospecimen_tissue_source"), col("biospecimen_type"),
          col("is_cancer"), col("samples")).as("biospecimen")),
      Seq("submitter_biospecimen_id"), "left")
  }

  /** study as a one-element array<struct> dimension (reference
    * DonorIndex.scala:84-90 `array(struct("study.*"))`). */
  private def studyStructArr(study: DataFrame): DataFrame =
    broadcast(
      study.groupBy("study_id")
        .agg(first(struct(study.columns.filterNot(_ == "study_id")
          .map(col).toIndexedSeq: _*)).as("__s"))
        .select(col("study_id"), array(col("__s")).as("study")))

  /** Donor-centric nested index over the clinical model.
    *
    * @param donor       pre-processed donor rows (one per donor)
    * @param study       pre-processed study rows (dimension)
    * @param phenotype   phenotype child rows with an HPO code column
    * @param file        file child rows
    * @param biospecimen biospecimen rows (files join through them)
    * @param samples     sample-registration rows (nested under
    *                    biospecimen)
    * @param terms       ontology term table (id, name, parents,
    *                    ancestors, is_leaf)
    * @param meta        literal stamps (dictionary/study version)
    */
  def donorIndex(
      donor: DataFrame,
      study: DataFrame,
      phenotype: DataFrame,
      file: DataFrame,
      biospecimen: DataFrame,
      samples: DataFrame,
      terms: DataFrame,
      meta: Seq[(String, String)] = Seq.empty): DataFrame = {
    val donorKey = DonorKey
    val studyArr = studyStructArr(study)
    val phenoNested = phenotypesPerDonor(phenotype, terms)
    val filesNested = Nest.nestChildren(
      filesWithBiospecimen(file, biospecimen, samples),
      donorKey,
      Seq(col("file_name"), col("data_category"), col("data_type"),
        col("experimental_strategy"), col("file_format"),
        col("data_access"), col("biospecimen")),
      "files")

    // summary struct derived from the ALREADY-NESTED files array via
    // array HOFs — no second scan of the file table
    val emptyS = array().cast("array<string>")
    val assembled = donor
      .join(studyArr, Seq("study_id"), "left")
      .join(phenoNested, donorKey, "left")
      .join(filesNested, donorKey, "left")
      .withColumn("summary", struct(
        coalesce(sort_array(array_distinct(
          transform(col("files"), f => f.getField("data_category")))),
          emptyS).as("data_category"),
        coalesce(sort_array(array_distinct(
          transform(col("files"), f => f.getField("experimental_strategy")))),
          emptyS).as("experimental_strategy"),
        coalesce(size(col("files")), lit(0)).cast("long").as("n_files"),
        (coalesce(size(col("files")), lit(0)) > 0).as("files_available"),
        col("observed_phenotypes").isNotNull
          .as("clinical_data_available")))

    meta.foldLeft(assembled) { case (d, (k, v)) =>
      d.withColumn(k, lit(v))
    }
  }

  /** Study-centric nested index (reference: StudyIndex.scala:30-104):
    * one row per study with nested donors (each carrying its
    * phenotype expansions), nested files (with biospecimen), a
    * study-level summary struct, DUO data-access codes, and metadata
    * stamps. Same single-scan-per-input plan shape as [[donorIndex]];
    * the final nests shuffle on study_id.
    */
  def studyIndex(
      study: DataFrame,
      donor: DataFrame,
      phenotype: DataFrame,
      file: DataFrame,
      biospecimen: DataFrame,
      samples: DataFrame,
      terms: DataFrame,
      duoTerms: DataFrame,
      meta: Seq[(String, String)] = Seq.empty): DataFrame = {
    val phenoNested = phenotypesPerDonor(phenotype, terms)
    val donorCols = donor.columns.filterNot(_ == "study_id").toIndexedSeq
    val donorsNested = donor
      .join(phenoNested, DonorKey, "left")
      .groupBy("study_id")
      .agg(collect_list(struct(
        (donorCols.map(col) ++ Seq(col("observed_phenotypes"),
          col("non_observed_phenotypes"))): _*)).as("donors"))
    val filesNested = filesWithBiospecimen(file, biospecimen, samples)
      .groupBy("study_id")
      .agg(
        collect_list(struct(col("file_name"), col("data_category"),
          col("experimental_strategy"), col("data_access"),
          col("biospecimen"))).as("files"),
        sort_array(collect_set(col("data_category"))).as("__cats"),
        sort_array(collect_set(col("experimental_strategy"))).as("__strats"),
        countDistinct(col("submitter_donor_id")).as("__nd"))
    val assembled = study
      .join(donorsNested, Seq("study_id"), "left")
      .join(filesNested, Seq("study_id"), "left")
      .join(dataAccessCodes(study, duoTerms), Seq("study_id"), "left")
      .withColumn("summary", struct(
        coalesce(col("__cats"), array().cast("array<string>"))
          .as("data_category"),
        coalesce(col("__strats"), array().cast("array<string>"))
          .as("experimental_strategy"),
        coalesce(size(col("donors")), lit(0)).cast("long").as("n_donors"),
        coalesce(size(col("files")), lit(0)).cast("long").as("n_files"),
        coalesce(col("__nd"), lit(0L)).as("n_donors_with_files")))
      .drop("__cats", "__strats", "__nd")
    meta.foldLeft(assembled) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  /** File-centric nested index (reference: FileIndex.scala:19-77):
    * one row per file with its study struct-array, its biospecimen
    * (nested samples), its donor's row plus phenotype expansions, and
    * metadata stamps. All joins are on file/donor/study keys — no
    * fan-out beyond the reference's own donors-per-file nest.
    */
  def fileIndex(
      file: DataFrame,
      donor: DataFrame,
      study: DataFrame,
      phenotype: DataFrame,
      biospecimen: DataFrame,
      samples: DataFrame,
      terms: DataFrame,
      meta: Seq[(String, String)] = Seq.empty): DataFrame = {
    val phenoNested = phenotypesPerDonor(phenotype, terms)
    val donorStruct = donor
      .join(phenoNested, DonorKey, "left")
      .select(col("study_id"), col("submitter_donor_id"),
        struct((donor.columns.filterNot(_ == "study_id").map(col) ++
          Seq(col("observed_phenotypes"), col("non_observed_phenotypes")))
          .toIndexedSeq: _*).as("donor"))
    val assembled = filesWithBiospecimen(file, biospecimen, samples)
      .join(studyStructArr(study), Seq("study_id"), "left")
      .join(donorStruct, DonorKey, "left")
    meta.foldLeft(assembled) { case (d, (k, v)) => d.withColumn(k, lit(v)) }
  }

  /** Study-level DUO data-access codes (reference: DataAccess
    * .scala:9-43): split the ";"-separated requirement list, explode,
    * display-name both limitation and requirement codes through the
    * broadcast DUO term table, and collapse to one struct per study.
    */
  def dataAccessCodes(study: DataFrame, duoTerms: DataFrame): DataFrame = {
    val duo = broadcast(duoTerms.select(
      col("id").as("__duo_id"), col("name").as("__duo_name")))
    study
      .select(col("study_id"), col("access_limitations"),
        explode(split(col("access_requirements"), ";")).as("req"))
      .filter(GraftFunctions.isNotBlank(col("req")))
      .withColumn("req", trim(col("req")))
      .join(duo, col("access_limitations") === col("__duo_id"), "left")
      .select(col("study_id"),
        GraftFunctions.displayName(col("__duo_name"),
          col("access_limitations")).as("access_limitations"),
        col("req"))
      .join(duo, col("req") === col("__duo_id"), "left")
      .select(col("study_id"), col("access_limitations"),
        GraftFunctions.displayName(col("__duo_name"), col("req"))
          .as("access_requirements"))
      .groupBy("study_id", "access_limitations")
      .agg(sort_array(collect_set(col("access_requirements")))
        .as("access_requirements"))
      .groupBy("study_id")
      .agg(first(struct(col("access_limitations"),
        col("access_requirements"))).as("data_access_codes"))
  }

  /** TPC-H analog of the index assembly, oracle-checkable at any SF:
    * one row per customer with a broadcast nation struct-array, the
    * customer's orders nested sorted, and a summary struct. Same
    * plan shape as [[donorIndex]] (parent-key shuffles only).
    */
  def customerIndex(
      customer: DataFrame, nation: DataFrame, orders: DataFrame): DataFrame = {
    val nationArr = broadcast(nation
      .select(col("n_nationkey"),
        array(struct(col("n_name").as("name"),
          col("n_regionkey").as("regionkey"))).as("nation")))
    val ordersNested = orders
      .groupBy(col("o_custkey"))
      .agg(
        sort_array(collect_list(struct(
          col("o_orderkey").as("orderkey"),
          col("o_orderdate").as("orderdate"),
          col("o_totalprice").as("totalprice")))).as("orders"),
        count(lit(1)).as("__n"),
        round(sum(col("o_totalprice")), 2).as("__spend"))
    customer
      .join(nationArr, customer("c_nationkey") === col("n_nationkey"), "left")
      .join(ordersNested, customer("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("nation"), col("orders"),
        struct(
          coalesce(col("__n"), lit(0L)).as("n_orders"),
          coalesce(col("__spend"), lit(0.0)).as("total_spend"),
          (coalesce(col("__n"), lit(0L)) > 0).as("has_orders"))
          .as("summary"))
  }
}
