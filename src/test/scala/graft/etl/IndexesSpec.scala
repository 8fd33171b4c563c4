package graft.etl

import graft.WithSpark
import graft.sources.Sources
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden assertions over the assembled donor index, reference-style
  * (reference: PreProcessETLTest golden compare + StudiesExpected
  * nested shape). */
class IndexesSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private val dir = "src/test/resources/clinical"

  private lazy val index = Indexes.donorIndex(
    donor = Sources.tsv(spark, s"$dir/donor.tsv"),
    study = Sources.tsv(spark, s"$dir/study.tsv"),
    phenotype = Sources.tsv(spark, s"$dir/phenotype.tsv"),
    file = Sources.tsv(spark, s"$dir/file.tsv"),
    biospecimen = Sources.tsv(spark, s"$dir/biospecimen.tsv"),
    samples = Sources.tsv(spark, s"$dir/sample_registration.tsv"),
    terms = Sources.jsonLines(spark, s"$dir/terms.jsonl.gz"),
    meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42"))
    .cache()

  test("one row per donor, metadata stamped, study nested") {
    assert(index.count() == 5)
    val row = index.filter($"submitter_donor_id" === "DO001")
      .select("dictionary_version", "study_version")
      .as[(String, String)].collect().head
    assert(row == ("9.9", "v42"))
    val studyArr = index.filter($"submitter_donor_id" === "DO001")
      .select($"study".getField("name")).as[Seq[String]].collect().head
    assert(studyArr == Seq("Graft Study One"))
  }

  test("observed phenotypes are ontology-expanded per donor") {
    // DO001: PH001 (Seizure) observed TRUE, PH002 (Fever) observed yes
    // → leaves + Neurological + Constitutional + shared root = 5 terms
    val terms = index.filter($"submitter_donor_id" === "DO001")
      .select(explode($"observed_phenotypes").as("t"))
      .select($"t.term_id", $"t.is_tagged")
      .as[(String, Boolean)].collect().toMap
    assert(terms.keySet == Set("HP:0000001", "HP:0000002", "HP:0000700",
      "HP:0025142", "HP:0000118"))
    assert(terms("HP:0000001") && terms("HP:0000002")) // leaves tagged
    assert(!terms("HP:0000118")) // root only an ancestor
    // DO004: PH004 observed FALSE → lands in non_observed side
    val nobs = index.filter($"submitter_donor_id" === "DO004")
      .select(explode($"non_observed_phenotypes").as("t"))
      .select($"t.term_id").as[String].collect().toSet
    assert(nobs.contains("HP:0000003"))
  }

  test("files nest with biospecimen and samples attached") {
    val files = index.filter($"submitter_donor_id" === "DO001")
      .select(explode($"files").as("f"))
      .select($"f.file_name", $"f.biospecimen.biospecimen_type",
        size($"f.biospecimen.samples"))
      .as[(String, String, Int)].collect().toSet
    assert(files == Set(("f1.cram", "normal", 2), ("f2.vcf", "normal", 2)))
  }

  test("summary struct: facets, counts, availability flags") {
    val s2 = index.filter($"submitter_donor_id" === "DO002")
      .select($"summary.data_category", $"summary.n_files",
        $"summary.files_available", $"summary.clinical_data_available")
      .as[(Seq[String], Long, Boolean, Boolean)].collect().head
    assert(s2 == ((Seq("Genomics", "Imaging"), 2L, true, true)))
    // DO003 has no files and no phenotypes
    val s3 = index.filter($"submitter_donor_id" === "DO003")
      .select($"summary.n_files", $"summary.files_available",
        $"summary.clinical_data_available")
      .as[(Long, Boolean, Boolean)].collect().head
    assert(s3 == ((0L, false, false)))
  }

  test("dataAccessCodes: split, DUO display-name, sorted distinct") {
    val got = Indexes.dataAccessCodes(
        Sources.tsv(spark, s"$dir/study.tsv"),
        Sources.jsonLines(spark, s"$dir/duo_terms.jsonl.gz"))
      .orderBy("study_id").collect()
    val gs1 = got(0).getStruct(1)
    assert(gs1.getString(0) == "General Research Use (DUO:0000005)")
    assert(gs1.getSeq[String](1) == Seq(
      "Ethics Approval Required (DUO:0000021)",
      "Publication Required (DUO:0000019)"))
    val gs2 = got(1).getStruct(1)
    assert(gs2.getString(0) == "Disease Specific Research (DUO:0000007)")
    assert(gs2.getSeq[String](1) == Seq("Publication Required (DUO:0000019)"))
  }

  test("studyIndex: one row per study, nested donors/files, summary, DUO") {
    val idx = Indexes.studyIndex(
      study = Sources.tsv(spark, s"$dir/study.tsv"),
      donor = Sources.tsv(spark, s"$dir/donor.tsv"),
      phenotype = Sources.tsv(spark, s"$dir/phenotype.tsv"),
      file = Sources.tsv(spark, s"$dir/file.tsv"),
      biospecimen = Sources.tsv(spark, s"$dir/biospecimen.tsv"),
      samples = Sources.tsv(spark, s"$dir/sample_registration.tsv"),
      terms = Sources.jsonLines(spark, s"$dir/terms.jsonl.gz"),
      duoTerms = Sources.jsonLines(spark, s"$dir/duo_terms.jsonl.gz"),
      meta = Seq("study_version" -> "v42"))
    assert(idx.count() == 2)
    val gs1 = idx.filter($"study_id" === "GS001")
      .select(size($"donors"), size($"files"), $"summary.n_donors",
        $"summary.n_files", $"summary.data_category",
        $"data_access_codes.access_limitations", $"study_version")
      .as[(Int, Int, Long, Long, Seq[String], String, String)]
      .collect().head
    assert(gs1 == ((3, 4, 3L, 4L, Seq("Genomics", "Imaging"),
      "General Research Use (DUO:0000005)", "v42")))
    // donors carry their phenotype expansions into the nest
    val donorsWithPhenos = idx.filter($"study_id" === "GS001")
      .select(explode($"donors").as("d"))
      .select($"d.submitter_donor_id",
        coalesce(size($"d.observed_phenotypes"), lit(-1)).as("n"))
      .as[(String, Int)].collect().toMap
    assert(donorsWithPhenos("DO001") == 5) // 2 leaves + 3 ancestors
    assert(donorsWithPhenos("DO003") == -1) // no phenotypes → null nest
  }

  test("fileIndex: one row per file with study, biospecimen, donor") {
    val idx = Indexes.fileIndex(
      file = Sources.tsv(spark, s"$dir/file.tsv"),
      donor = Sources.tsv(spark, s"$dir/donor.tsv"),
      study = Sources.tsv(spark, s"$dir/study.tsv"),
      phenotype = Sources.tsv(spark, s"$dir/phenotype.tsv"),
      biospecimen = Sources.tsv(spark, s"$dir/biospecimen.tsv"),
      samples = Sources.tsv(spark, s"$dir/sample_registration.tsv"),
      terms = Sources.jsonLines(spark, s"$dir/terms.jsonl.gz"),
      meta = Seq("dictionary_version" -> "9.9"))
    assert(idx.count() == 5)
    val f1 = idx.filter($"file_name" === "f1.cram")
      .select($"study".getField("name").getItem(0),
        $"biospecimen.biospecimen_type", $"donor.gender",
        size($"donor.observed_phenotypes"), $"dictionary_version")
      .as[(String, String, String, Int, String)].collect().head
    assert(f1 == (("Graft Study One", "normal", "Female", 5, "9.9")))
  }

  test("customerIndex assembles nation + sorted orders + summary") {
    val customer = Seq((1L, "Alice", "BUILDING", 10L), (2L, "Bob", "AUTO", 11L))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    val nation = Seq((10L, "CANADA", 1L), (11L, "PERU", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val orders = Seq((100L, 1L, "2024-01-01", 10.0), (99L, 1L, "2024-02-01", 5.5))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = Indexes.customerIndex(customer, nation, orders)
      .orderBy("c_custkey").collect()
    val alice = got(0)
    assert(alice.getSeq[Row](3).map(_.getString(0)) == Seq("CANADA"))
    assert(alice.getSeq[Row](4).map(_.getLong(0)) == Seq(99L, 100L)) // sorted
    val aliceSummary = alice.getStruct(5)
    assert(aliceSummary.getLong(0) == 2L && aliceSummary.getDouble(1) == 15.5
      && aliceSummary.getBoolean(2))
    val bobSummary = got(1).getStruct(5)
    assert(bobSummary.getLong(0) == 0L && !bobSummary.getBoolean(2))
    assert(got(1).isNullAt(4)) // no orders → null nest (left join)
  }
}
