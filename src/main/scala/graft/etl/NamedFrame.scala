package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Lineage-tagged frame — the engine's carrier for the reference's
  * `NamedDataFrame` (reference models/NamedDataFrame.scala:5-11: a
  * name plus mutable studyVersion / studyVersionCreationDate /
  * dictionaryVersion fields riding next to the DataFrame).
  *
  * Re-expressed immutably, with two materialization modes:
  *  - [[stamped]] writes each tag as a literal COLUMN — the
  *    convention the index builders already use for their
  *    `dictionary_version` / `study_version` stamps, right when the
  *    lineage must be queryable per row;
  *  - [[annotated]] embeds the tags in the schema's column METADATA
  *    (zero bytes per row). Spark persists field metadata in the
  *    parquet footer, so an annotated frame's lineage SURVIVES a
  *    write/read round-trip — [[NamedFrame.fromAnnotated]] recovers
  *    it. That is the property the reference's driver-side POJO
  *    cannot offer: its tags die with the JVM.
  *
  * Scale note: both modes are plan-only decorations — no action, no
  * shuffle, no per-row cost for `annotated` (and `stamped` literals
  * are constant-folded by Catalyst).
  */
final case class NamedFrame(
    name: String,
    df: DataFrame,
    tags: Map[String, String] = Map.empty) {

  def withTag(key: String, value: String): NamedFrame =
    copy(tags = tags + (key -> value))

  /** Tags as literal columns (sorted by key for a deterministic
    * schema), matching the index builders' stamp convention. A tag
    * whose name collides with an existing column replaces it —
    * re-stamping is idempotent. */
  def stamped: DataFrame =
    tags.toSeq.sortBy(_._1).foldLeft(df) { case (d, (k, v)) =>
      d.withColumn(k, lit(v))
    }

  /** Tags embedded in the FIRST column's metadata under
    * [[NamedFrame.MetadataKey]] (plus the frame's name). Persisted by
    * parquet in the footer schema; recover with [[NamedFrame.fromAnnotated]].
    * Requires at least one column. */
  def annotated: DataFrame = {
    require(df.columns.nonEmpty, "cannot annotate a zero-column frame")
    val head = df.columns.head
    val sortedKeys = tags.keys.toArray.sorted
    // Metadata exposes no key enumeration, so the tag names ride as
    // an explicit array — fromAnnotated reads it back
    val tagMeta = sortedKeys.foldLeft(new MetadataBuilder()) {
      (b, k) => b.putString(k, tags(k))
    }.putString(NamedFrame.NameKey, name)
      .putStringArray(NamedFrame.KeysKey, sortedKeys)
      .build()
    val existing = df.schema.head.metadata
    val merged = new MetadataBuilder().withMetadata(existing)
      .putMetadata(NamedFrame.MetadataKey, tagMeta).build()
    df.withColumn(head, col(head).as(head, merged))
  }
}

object NamedFrame {
  /** Field-metadata key holding the lineage tags. */
  val MetadataKey = "graft.lineage"
  private[etl] val NameKey = "__name"
  private[etl] val KeysKey = "__keys"

  /** Recover a [[NamedFrame]] from an [[NamedFrame#annotated]] frame
    * (e.g. freshly read back from parquet). Returns None when no
    * lineage metadata is present. */
  def fromAnnotated(df: DataFrame): Option[NamedFrame] = {
    if (df.schema.isEmpty) return None
    val m = df.schema.head.metadata
    if (!m.contains(MetadataKey)) None
    else {
      val lineage = m.getMetadata(MetadataKey)
      val tags = lineage.getStringArray(KeysKey)
        .map(k => k -> lineage.getString(k)).toMap
      Some(NamedFrame(lineage.getString(NameKey), df, tags))
    }
  }
}
