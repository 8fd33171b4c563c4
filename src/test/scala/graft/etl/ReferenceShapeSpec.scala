package graft.etl

import graft.WithSpark
import org.apache.spark.sql.types.{ArrayType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Structural parity with the reference's golden document shape
  * (reference: validation/process/StudiesExpected.scala:8-209): every
  * STRUCTURAL element of the reference's study document — each nested
  * collection and its key fields — must have an equivalent path in our
  * study index. This is a shape map, not a field-for-field port: the
  * deliberate divergences are listed at the bottom.
  */
class ReferenceShapeSpec extends AnyFunSuite with WithSpark {

  private val dir = "src/test/resources/clinical"

  private lazy val schema: StructType =
    Indexes.studyIndex(
      Indexes.ClinicalInputs.fromDir(spark, dir),
      meta = Seq("dictionary_version" -> "9.9", "study_version" -> "v42"))
      .schema

  /** Resolve a dotted path through structs and array-of-struct hops. */
  private def fieldAt(path: String): Option[org.apache.spark.sql.types.DataType] = {
    path.split('.').foldLeft(Option(schema: org.apache.spark.sql.types.DataType)) {
      case (Some(st: StructType), name) =>
        st.fields.find(_.name == name).map(_.dataType match {
          case ArrayType(inner, _) => inner
          case other => other
        })
      case _ => None
    }
  }

  private def assertPath(path: String): Unit =
    assert(fieldAt(path).isDefined, s"missing reference-shape path: $path")

  test("study-level scalars and metadata stamps (StudiesExpected:8-27)") {
    Seq("study_id", "name", "domain", "dictionary_version", "study_version")
      .foreach(assertPath)
  }

  test("data_access_codes {access_limitations, access_requirements[]} (:32-33)") {
    assertPath("data_access_codes.access_limitations")
    assertPath("data_access_codes.access_requirements")
  }

  test("donors[] carries every reference DONORS branch (:35-62)") {
    // scalars
    Seq("submitter_donor_id", "dob", "gender", "ethnicity", "vital_status",
      "is_a_proband").foreach(f => assertPath(s"donors.$f"))
    // familyRelationships / familyConditions / exposures (:54-56)
    assertPath("donors.family_relationships.submitter_family_id")
    assertPath("donors.family_conditions.family_condition_name")
    assertPath("donors.exposures.smoking_status")
    // diagnoses with nested treatments + follow_ups (:88-107)
    Seq("submitter_diagnosis_id", "diagnosis_mondo_code",
      "diagnosis_ICD_code", "age_at_diagnosis", "mondo_main_category",
      "icd_main_category").foreach(f => assertPath(s"donors.diagnoses.$f"))
    assertPath("donors.diagnoses.treatments.submitter_treatment_id")
    assertPath("donors.diagnoses.follow_ups.submitter_follow_up_id")
    // mondo / icd per-donor expansions (:66-83)
    Seq("term_id", "term_name", "is_tagged", "is_leaf", "values")
      .foreach { f =>
        assertPath(s"donors.mondo.$f"); assertPath(s"donors.icd.$f")
      }
    // observed / not-observed phenotype expansions (:60-61, :110-118)
    Seq("term_id", "term_name", "is_tagged", "is_leaf", "values")
      .foreach { f =>
        assertPath(s"donors.observed_phenotypes.$f")
        assertPath(s"donors.non_observed_phenotypes.$f")
      }
  }

  test("files[] with biospecimen and nested samples (:120-160)") {
    Seq("file_name", "data_category", "experimental_strategy", "data_access")
      .foreach(f => assertPath(s"files.$f"))
    assertPath("files.biospecimen.biospecimen_type")
    assertPath("files.biospecimen.samples.submitter_sample_id")
    assertPath("files.biospecimen.samples.sample_type")
  }

  test("summary: category matrices + clinical availability (:28-29, :85-86)") {
    Seq("key", "donors", "files").foreach { f =>
      assertPath(s"summary.data_category.$f")
      assertPath(s"summary.experimental_strategy.$f")
    }
    assertPath("summary.clinical_data_available.key")
    assertPath("summary.clinical_data_available.donors")
  }

  test("field-for-field golden of the full study document (ClassGenerator device)") {
    // the committed snapshot locks VALUE-level parity of every column
    // the document carries — the reference's own StudiesExpected
    // mechanism; regenerate with GenGoldens after an INTENTIONAL
    // semantic change and review the diff
    val got = graft.queries.Canon.flattenNested(
        Indexes.studyIndex(
          Indexes.ClinicalInputs.fromDir(spark, dir),
          meta = Seq("dictionary_version" -> "9.9",
            "study_version" -> "v42")))
      .orderBy("study_id")
      .toJSON.collect().toSeq
    val want = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$dir/golden_study_index.jsonl"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
    assert(got.size == want.size, s"row count ${got.size} != ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"study document row $i diverged from the golden")
    }
    // reviewed anchors: the golden means what StudiesExpected means
    val gs1 = got.head
    assert(gs1.contains("\"study_id\":\"GS001\""))
    assert(gs1.contains("\"name\":\"Graft Study One\""))
    assert(gs1.contains("\"dictionary_version\":\"9.9\""))
    // nested branches live inside escaped JSON strings — match on the
    // escaped key:value form
    assert(gs1.contains("\\\"submitter_donor_id\\\":\\\"DO001\\\"")) // donors[]
    assert(gs1.contains("\\\"submitter_treatment_id\\\":\\\"TR001\\\"")) // 3 deep
    assert(gs1.contains("\\\"submitter_sample_id\\\":\\\"SA001\\\"")) // files→bio→samples
  }

  // Deliberate divergences from StudiesExpected (documented, not bugs):
  //  - *_keyword / *_ngrams search-duplicate columns: an Elasticsearch
  //    indexing concern, not engine semantics (SURVEY.md §7.3).
  //  - file_size: the reference stubs it with a driver-frozen random
  //    draw (ProcessETLUtils.scala:503-507) — excluded by design.
  //  - per-term field names: the reference's {phenotype_id, name,
  //    display_name, age_at_event} maps to our {term_id, term_name,
  //    values}; display_name is derivable (concat) and asserted in
  //    OntologySpec via mainCategory formatting.
  //  - internal_*_id columns ride through the pre-processed pipeline
  //    (PipelineSpec) rather than the raw-fixture index queries.
}
