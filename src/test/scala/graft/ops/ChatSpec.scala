package graft.ops

import graft.WithSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Chat]] — post-training conversation operators: structural
  * validation flags, byte-exact template render, loss-mask span
  * correctness (substring property over EVERY turn), prompt dedup
  * tie-breaks, and preference-pair argmax/argmin semantics.
  */
class ChatSpec extends AnyFunSuite with WithSpark {
  import spark.implicits._

  private def turns(rows: (Long, Long, String, String)*) =
    rows.toDF("conv_id", "turn_idx", "role", "content")

  test("conversationStats: valid user/assistant alternation") {
    val st = Chat.conversationStats(turns(
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello")))
      .collect()
    assert(st.toSeq == Seq(
      Row(1L, 2L, false, true, true, true, 0L, true)))
  }

  test("conversationStats: leading system turn is allowed") {
    val st = Chat.conversationStats(turns(
      (1L, 0L, "system", "be brief"), (1L, 1L, "user", "q"),
      (1L, 2L, "assistant", "a"))).collect().head
    assert(st.getBoolean(2) && st.getBoolean(3) && st.getBoolean(7))
  }

  test("conversationStats: assistant-first fails starts_ok only") {
    val st = Chat.conversationStats(turns(
      (1L, 0L, "assistant", "a"), (1L, 1L, "user", "q"),
      (1L, 2L, "assistant", "a2"))).collect().head
    assert(!st.getBoolean(3) && st.getBoolean(4) && !st.getBoolean(7))
  }

  test("conversationStats: adjacent equal roles break alternates") {
    val st = Chat.conversationStats(turns(
      (1L, 0L, "user", "q"), (1L, 1L, "user", "q2"),
      (1L, 2L, "assistant", "a"))).collect().head
    assert(!st.getBoolean(4) && !st.getBoolean(7))
  }

  test("conversationStats: empty content counted and gates valid") {
    val st = Chat.conversationStats(turns(
      (1L, 0L, "user", "q"), (1L, 1L, "assistant", "")))
      .collect().head
    assert(st.getLong(6) == 1L && !st.getBoolean(7))
  }

  test("conversationStats: single user turn — no alternation break") {
    val st = Chat.conversationStats(turns((1L, 0L, "user", "q")))
      .collect().head
    assert(st.getBoolean(4) && !st.getBoolean(5) && !st.getBoolean(7))
  }

  test("renderChat emits the exact block template in turn order") {
    val r = Chat.renderChat(turns(
      (1L, 1L, "assistant", "hello"), (1L, 0L, "user", "hi")))
      .collect().head
    assert(r.getString(1) ==
      "<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n")
    assert(r.getLong(2) == r.getString(1).length.toLong)
  }

  test("maskSpans: every span slices its own content back out") {
    val t = turns(
      (1L, 0L, "system", "sys"), (1L, 1L, "user", "question"),
      (1L, 2L, "assistant", "answer one"), (1L, 3L, "user", ""),
      (1L, 4L, "assistant", "two"),
      (2L, 0L, "user", "x"), (2L, 1L, "assistant", "y"))
    val joined = Chat.maskSpans(t)
      .join(Chat.renderChat(t), "conv_id")
      .join(t, Seq("conv_id", "turn_idx"))
      .select(col("rendered"), col("mask_start"), col("mask_end"),
        col("content"))
      .collect()
    assert(joined.length == 7)
    joined.foreach { r =>
      val (rend, s, e) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(rend.substring(s.toInt, e.toInt) == r.getString(3))
    }
  }

  test("firstUserTurn: min turn_idx wins; userless convs absent") {
    val p = Chat.firstUserTurn(turns(
      (1L, 2L, "user", "second"), (1L, 1L, "user", "first"),
      (1L, 0L, "system", "s"),
      (2L, 0L, "assistant", "a"))).collect()
    assert(p.toSeq == Seq(Row(1L, "first")))
  }

  test("keepCanonical: highest score, tie to smallest tie col") {
    val kept = Chat.keepCanonical(
      Seq(("p", 10L, 3L), ("p", 20L, 9L), ("p", 20L, 7L),
        ("q", 1L, 1L))
        .toDF("prompt_key", "n_turns", "conv_id"),
      "prompt_key", "n_turns", "conv_id")
      .select("prompt_key", "conv_id", "n_dups")
      .collect().sortBy(_.getString(0))
    assert(kept.toSeq == Seq(Row("p", 7L, 3L), Row("q", 1L, 1L)))
  }

  test("preferencePairs: argmax/argmin with pinned tie-breaks") {
    val pairs = Chat.preferencePairs(
      Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 9L), (1L, 13L, 5L),
        (2L, 20L, 4L))
        .toDF("prompt_id", "cand_id", "score"),
      "prompt_id", "cand_id", "score")
      .collect()
    // prompt 2 is a singleton (chosen == rejected) -> dropped
    assert(pairs.toSeq == Seq(Row(1L, 11L, 13L, 9L, 5L, 4L, 4L)))
  }

  test("preferencePairs: minMargin filters narrow pairs") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 7L), (2L, 3L, 10L),
      (2L, 4L, 2L)).toDF("prompt_id", "cand_id", "score")
    val pairs = Chat.preferencePairs(df, "prompt_id", "cand_id",
      "score", minMargin = 5L).collect()
    assert(pairs.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("chatGate: ratio is exact integer div, NULL on zero user") {
    val g = Chat.chatGate(turns(
      (1L, 0L, "user", "abcd"), (1L, 1L, "assistant", "abcdefghi"),
      (2L, 0L, "system", "s"), (2L, 1L, "assistant", "aa")),
      minAsstChars = 2L, minTurns = 2L)
      .orderBy("conv_id").collect()
    assert(g(0).getLong(4) == 225L) // 9*100 div 4
    assert(g(0).getBoolean(5))
    assert(g(1).isNullAt(4) && g(1).getBoolean(5))
  }

  test("chatGate: empty last turn or low volume rejects") {
    val g = Chat.chatGate(turns(
      (1L, 0L, "user", "q"), (1L, 1L, "assistant", "")),
      minAsstChars = 0L, minTurns = 1L).collect().head
    assert(!g.getBoolean(5))
  }
}
