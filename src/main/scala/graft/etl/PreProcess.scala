package graft.etl

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-process stage: surrogate-key minting, internal-id attachment,
  * dictionary-whitelist pruning, and metadata stamping (reference:
  * PreProcessUtils.scala:14-105, PreProcessETL.scala:53-88).
  *
  * The reference's id flow collects every (hash, entity) pair to the
  * driver and POSTs them to an HTTP id server
  * (PreProcessUtils.scala:96-101) — a driver-memory and coordination
  * bottleneck that cannot survive 100 TB. Here id resolution is a
  * pluggable [[IdResolver]]: the default derives the internal id from
  * the key hash itself (per-row expression, zero shuffle, same
  * uniqueness guarantees as the hash); external mappings join
  * distributed on the key column instead of round-tripping the driver.
  */
object PreProcess {

  /** Per-entity surrogate-key recipe: the reference hashes "_"-joined
    * (entity name, key columns) per clinical entity
    * (PreProcessUtils.scala:17-91). */
  final case class EntitySpec(entity: String, keyCols: Seq[String])

  /** The reference's twelve clinical entities and their key columns,
    * keyed by sanitized table name (PreProcessUtils.scala:17-91). */
  val ClinicalEntities: Map[String, EntitySpec] = Map(
    "study" -> EntitySpec("study", Seq("study_id")),
    "donor" -> EntitySpec("donor", Seq("study_id", "submitter_donor_id")),
    "diagnosis" -> EntitySpec(
      "diagnosis",
      Seq("study_id", "submitter_donor_id", "submitter_diagnosis_id")),
    "phenotype" -> EntitySpec(
      "phenotype",
      Seq("study_id", "submitter_donor_id", "submitter_phenotype_id",
        "phenotype_HPO_code")),
    "biospecimen" -> EntitySpec(
      "biospecimen",
      Seq("study_id", "submitter_donor_id", "submitter_biospecimen_id")),
    "sampleregistration" -> EntitySpec(
      "sample_registration",
      Seq("study_id", "submitter_donor_id", "submitter_biospecimen_id",
        "submitter_sample_id")),
    "treatment" -> EntitySpec(
      "treatment",
      Seq("study_id", "submitter_donor_id", "submitter_treatment_id")),
    "followup" -> EntitySpec(
      "follow_up",
      Seq("study_id", "submitter_donor_id", "submitter_follow_up_id")),
    "exposure" -> EntitySpec(
      "exposure", Seq("study_id", "submitter_donor_id")),
    "family" -> EntitySpec(
      "family",
      Seq("study_id", "submitter_family_id", "submitter_donor_id")),
    "familyhistory" -> EntitySpec(
      "family_history",
      Seq("study_id", "submitter_donor_id",
        "submitter_family_condition_id")),
    "file" -> EntitySpec(
      "file", Seq("study_id", "submitter_donor_id", "file_name")))

  /** Pluggable internal-id source. */
  trait IdResolver {
    /** Fast path: a per-row expression over (entity_kind, entity_key)
      * columns — attached with `withColumn`, no join, no shuffle. */
    def asColumn: Option[Column] = None

    /** Join path: map a frame of distinct `entity_key` rows to
      * (entity_key, internal_id). */
    def resolve(keys: DataFrame): DataFrame =
      throw new UnsupportedOperationException(
        "columnar resolver: use asColumn")
  }

  /** Default: derive the id from the key hash — "<entity>_<key12>".
    * Deterministic, collision-safe to the same degree as the sha1 key,
    * and purely map-side. */
  object HashDerivedIds extends IdResolver {
    override def asColumn: Option[Column] = Some(
      concat(col("entity_kind"), lit("_"),
        substring(col("entity_key"), 1, 12)))
  }

  /** Fixture-backed resolver — the test double for the reference's
    * id-server mock (idserver/hash.json). Small map → broadcast join. */
  final case class MapIds(spark: SparkSession, ids: Map[String, String])
      extends IdResolver {
    override def resolve(keys: DataFrame): DataFrame = {
      import spark.implicits._
      keys.join(
        broadcast(ids.toSeq.toDF("entity_key", "internal_id")),
        Seq("entity_key"), "left")
    }
  }

  /** Stamp `entity_kind` + sha1 `entity_key` (the reference's
    * cqdg_entity / cqdg_hash pair, PreProcessUtils.scala:17-91). */
  def mintKey(df: DataFrame, spec: EntitySpec): DataFrame =
    df.withColumn("entity_kind", lit(spec.entity))
      .withColumn("entity_key",
        GraftFunctions.entityKey(spec.entity, spec.keyCols.map(col): _*))

  /** Mint the key, resolve and attach `internal_<entity>_id`, drop the
    * raw key (the reference drops cqdg_hash after the id join,
    * PreProcessUtils.scala:100-103). */
  def attachInternalId(
      df: DataFrame, spec: EntitySpec, resolver: IdResolver): DataFrame = {
    val minted = mintKey(df, spec)
    val idName = s"internal_${spec.entity}_id"
    val withId = resolver.asColumn match {
      case Some(c) => minted.withColumn(idName, c)
      case None =>
        minted
          .join(resolver.resolve(minted.select("entity_key").distinct()),
            Seq("entity_key"), "left")
          .withColumnRenamed("internal_id", idName)
    }
    withId.drop("entity_key")
  }

  /** Dictionary-whitelist pruning: drop every column not in the schema
    * (reference: PreProcessETL.scala:68-75). */
  def whitelist(df: DataFrame, allowed: Seq[String]): DataFrame =
    df.drop(df.columns.filterNot(allowed.contains).toIndexedSeq: _*)

  /** Stamp literal metadata columns (the reference adds
    * dictionary_version / study_version / study_version_creation_date
    * to `study`, PreProcessETL.scala:77-82). */
  def stampMetadata(df: DataFrame, meta: Seq[(String, String)]): DataFrame =
    meta.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }

  /** Full pre-process of one raw entity table: mint + id + whitelist
    * (+ metadata stamp for `study`). The schema lists the DICTIONARY
    * columns; the minted `entity_kind` and `internal_<entity>_id`
    * survive pruning implicitly, like the reference's schema columns
    * appended by its dictionary client. */
  def preProcessEntity(
      name: String,
      df: DataFrame,
      schema: Seq[String],
      resolver: IdResolver = HashDerivedIds,
      studyMeta: Seq[(String, String)] = Seq.empty): DataFrame = {
    val sanitized = GraftFunctions.sanitize(name)
    val spec = ClinicalEntities.getOrElse(
      sanitized,
      throw new IllegalArgumentException(s"no entity spec for $name"))
    val withId = attachInternalId(df, spec, resolver)
    val allowed =
      schema ++ Seq("entity_kind", s"internal_${spec.entity}_id")
    val pruned = whitelist(withId, allowed)
    if (sanitized == "study") stampMetadata(pruned, studyMeta) else pruned
  }
}
