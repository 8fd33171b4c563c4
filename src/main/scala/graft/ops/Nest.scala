package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational → nested-document operators: THE core pattern of the
  * reference (≈80% of its code; SURVEY.md §0, §2.4 A1) —
  * `equi-join → groupBy → collect_list(struct(...))`.
  *
  * Scale notes: `groupBy(keys).agg(collect_list(...))` is a single
  * hash-aggregate with map-side partial aggregation; when the child
  * table is pre-partitioned on the group keys (bucketing / prior
  * shuffle) Catalyst elides the exchange entirely. `collect_list` is
  * unbounded per group — at 100 TB callers must know group cardinality
  * (here: children-per-parent, e.g. lineitems-per-order ≤ 7).
  */
object Nest {

  /** Fold child rows into one array-of-struct column per parent key
    * (reference: ProcessETLUtils.scala:67-99 and 15+ other sites).
    *
    * @param sorted when true (default), `sort_array` orders the packed
    *   structs by their leading fields so child order is deterministic
    *   (the reference relies on single-row fixtures for determinism;
    *   we don't).
    */
  def nestChildren(
      children: DataFrame,
      parentKeys: Seq[String],
      structCols: Seq[Column],
      as: String,
      sorted: Boolean = true): DataFrame = {
    val packed = collect_list(struct(structCols: _*))
    children
      .groupBy(parentKeys.map(col): _*)
      .agg((if (sorted) sort_array(packed) else packed).as(as))
  }

  /** Left-join a nested child column back onto the parent table
    * (reference: ProcessETLUtils.scala:103-106 re-join pattern),
    * defaulting missing children to an empty array so downstream
    * `explode_outer`/`size` behave uniformly.
    */
  def attachChildren(
      parent: DataFrame,
      nested: DataFrame,
      keys: Seq[String],
      as: String): DataFrame =
    parent
      .join(nested, keys, "left")
      .withColumn(as, coalesce(col(as), array()))
}
