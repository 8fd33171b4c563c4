package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (SFT / preference) conversation-data operators.
  *
  * The input shape everywhere is the exploded TURNS table —
  * `(conv_id, turn_idx, role, content)` — the form conversation data
  * actually arrives in (one row per message), not a pre-nested blob:
  * nesting is an output concern, so every operator here is a plain
  * one-shuffle groupBy/window on `conv_id` and scales the way any
  * keyed aggregation does (hash-partition on the conversation key; a
  * conversation is never larger than one executor's row group).
  *
  * Everything is native `functions._` + array HOFs — no UDFs — and
  * each operator has an exact relational replay (window lag /
  * conditional aggregation / cumulative sum), which the ChatQueries
  * faces pin against DuckDB.
  *
  * Contract: `turn_idx` is unique within a conversation (the sorted
  * turn list, the mask cumsum, and `min_by`/`max_by` tie on it);
  * duplicate indices make the order — and thus render/mask output —
  * undefined. Dedup upstream if a source can re-emit a turn.
  */
object Chat {

  private def sorted(
      turns: DataFrame, conv: String, idx: String, role: String,
      content: String): DataFrame =
    turns
      .groupBy(col(conv))
      .agg(array_sort(collect_list(struct(
        col(idx).as("i"), col(role).as("r"),
        coalesce(col(content), lit("")).as("c")))).as("t"))

  /** Per-conversation structural validation: turn count, leading
    * system turn, first non-system turn is a user turn, strict role
    * alternation (no adjacent equal roles), ends on an assistant
    * turn, empty-content count, and the combined `valid` gate.
    *
    * One hash shuffle on the conversation key; all checks are
    * map-side HOFs over the per-conversation sorted turn list.
    */
  def conversationStats(
      turns: DataFrame,
      conv: String = "conv_id", idx: String = "turn_idx",
      role: String = "role", content: String = "content"): DataFrame = {
    val g = sorted(turns, conv, idx, role, content)
    val t = col("t")
    val body = filter(t, x => x.getField("r") =!= "system")
    val startsOk = coalesce(
      element_at(body, 1).getField("r") === "user", lit(false))
    val alternates = when(size(t) <= 1, lit(true)).otherwise(
      !exists(sequence(lit(2), size(t)), i =>
        element_at(t, i).getField("r") ===
          element_at(t, i - 1).getField("r")))
    val nEmpty = size(filter(t, x => x.getField("c") === ""))
    g.select(
      col(conv),
      size(t).cast("long").as("n_turns"),
      (element_at(t, 1).getField("r") === "system").as("has_system"),
      startsOk.as("starts_ok"),
      alternates.as("alternates"),
      (element_at(t, -1).getField("r") === "assistant")
        .as("ends_assistant"),
      nEmpty.cast("long").as("n_empty"),
      (startsOk && alternates &&
        element_at(t, -1).getField("r") === "assistant" &&
        nEmpty === 0).as("valid"))
  }

  /** Render each conversation to ONE training string with the block
    * template `<|role|>\ncontent<|end|>\n` per turn, turns in
    * `turn_idx` order. Output: (conv, rendered, n_chars).
    *
    * The template is deliberately concatenation-only (no escaping, no
    * locale-sensitive formatting) so the render is byte-reproducible
    * across engines — the DuckDB face replays it with an ordered
    * `string_agg` and hash-compares the full string.
    */
  def renderChat(
      turns: DataFrame,
      conv: String = "conv_id", idx: String = "turn_idx",
      role: String = "role", content: String = "content"): DataFrame = {
    val g = sorted(turns, conv, idx, role, content)
    val rendered = aggregate(col("t"), lit(""), (acc, x) =>
      concat(acc, lit("<|"), x.getField("r"), lit("|>\n"),
        x.getField("c"), lit("<|end|>\n")))
    g.select(col(conv), rendered.as("rendered"))
      .withColumn("n_chars", length(col("rendered")).cast("long"))
  }

  /** Loss-mask character spans for [[renderChat]]'s template: for
    * every turn, the 0-based [start, end) offsets of its CONTENT
    * within the conversation's rendered string — the trainer masks
    * loss outside the assistant spans. Pure cumulative-sum window
    * (one shuffle + per-conversation sort); exact integers, no
    * string search at apply time.
    */
  def maskSpans(
      turns: DataFrame,
      conv: String = "conv_id", idx: String = "turn_idx",
      role: String = "role", content: String = "content"): DataFrame = {
    val c = coalesce(col(content), lit(""))
    // <|role|>\n = 2 + len(role) + 2 + 1 ; <|end|>\n = 8
    val prefix = length(col(role)) + lit(5)
    val fullLen = prefix + length(c) + lit(8)
    val before = Window.partitionBy(col(conv)).orderBy(col(idx))
      .rowsBetween(Window.unboundedPreceding, -1)
    val start = coalesce(sum(fullLen).over(before), lit(0)) + prefix
    turns.select(
      col(conv), col(idx), col(role),
      start.cast("long").as("mask_start"),
      (start + length(c)).cast("long").as("mask_end"))
  }

  /** First user turn of each conversation — the prompt for
    * prompt-level dedup. Output: (conv, prompt). Conversations with
    * no user turn are absent (inner aggregation semantics).
    */
  def firstUserTurn(
      turns: DataFrame,
      conv: String = "conv_id", idx: String = "turn_idx",
      role: String = "role", content: String = "content"): DataFrame =
    turns
      .filter(col(role) === "user")
      .groupBy(col(conv))
      .agg(min_by(coalesce(col(content), lit("")), col(idx))
        .as("prompt"))

  /** Keep one canonical row per prompt key: the highest `score`, ties
    * to the smallest `tie` — plus the group size (`n_dups`) so the
    * caller can audit collapse rates. One shuffle on the prompt key;
    * the group-size count rides the same exchange as the rank.
    */
  def keepCanonical(
      convs: DataFrame, prompt: String, score: String, tie: String)
      : DataFrame = {
    val part = Window.partitionBy(col(prompt))
    val w = part.orderBy(col(score).desc, col(tie).asc)
    convs
      .withColumn("n_dups", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** DPO/RLHF preference pairs from scored candidates: per prompt,
    * chosen = highest score (ties → smallest candidate id), rejected
    * = lowest score (ties → largest candidate id); pairs where the
    * two coincide (single candidate) or the margin is below
    * `minMargin` are dropped.
    *
    * Single hash aggregation — the argmax/argmin ride ONE groupBy as
    * ordered-struct max/min (partial aggregation map-side), no window
    * sort, no self-join.
    */
  def preferencePairs(
      cands: DataFrame, prompt: String, cand: String, score: String,
      minMargin: Long = 0L): DataFrame = {
    val pick = struct(col(score).as("s"), (-col(cand)).as("nc"))
    cands
      .groupBy(col(prompt))
      .agg(max(pick).as("ch"), min(pick).as("rj"),
        count(lit(1)).as("n_cands"))
      .select(
        col(prompt),
        (-col("ch.nc")).as("chosen_id"),
        (-col("rj.nc")).as("rejected_id"),
        col("ch.s").as("chosen_score"),
        col("rj.s").as("rejected_score"),
        (col("ch.s") - col("rj.s")).as("margin"),
        col("n_cands"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
  }

  /** Per-conversation training-quality gate: user/assistant content
    * volume, their integer percentage ratio, and a keep decision —
    * all exact-integer so the gate replays bit-identically in any
    * engine. Single conditional aggregation, one shuffle.
    */
  def chatGate(
      turns: DataFrame,
      conv: String = "conv_id", idx: String = "turn_idx",
      role: String = "role", content: String = "content",
      minAsstChars: Long = 40L, minTurns: Long = 3L): DataFrame = {
    val c = coalesce(col(content), lit(""))
    turns
      .groupBy(col(conv))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col(role) === "user", length(c)).otherwise(0))
          .cast("long").as("user_chars"),
        sum(when(col(role) === "assistant", length(c)).otherwise(0))
          .cast("long").as("asst_chars"),
        max_by(c, col(idx)).as("last_content"))
      .select(
        col(conv), col("n_turns"), col("user_chars"),
        col("asst_chars"),
        expr("(asst_chars * 100) div nullif(user_chars, 0)")
          .cast("long").as("ratio_pct"),
        (col("asst_chars") >= minAsstChars &&
          col("n_turns") >= minTurns &&
          col("last_content") =!= "").as("keep"))
  }
}
