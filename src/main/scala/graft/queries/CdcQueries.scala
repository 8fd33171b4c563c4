package graft.queries

import graft.core.{QueryDef, Tables}
import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Change-data-capture faces ([[graft.ops.Cdc]]): snapshot diff, SCD1
  * upsert, SCD2 history merge. Both "snapshots" of each pair derive
  * deterministically from one driver table (modulus filters + attribute
  * mutations), so the DuckDB oracle can rebuild the exact same pair and
  * recompute the merge relationally.
  */
object CdcQueries {
  import QueryDef.sql

  val defs: Seq[QueryDef] = Seq(

    // ---- snapshot diff: inserts (keys %13=0 ∧ %11≠0), deletes
    //      (%11=0 ∧ %13≠0), updates (status mutated at %7=0) ----
    sql(
      "q_snapshot_diff",
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |           FROM orders WHERE o_orderkey % 13 <> 0),
        |n AS (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
        |          AS o_orderstatus,
        |        o_totalprice
        |      FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS op,
        |  o.o_orderstatus AS old_o_orderstatus,
        |  o.o_totalprice  AS old_o_totalprice,
        |  n.o_orderstatus AS new_o_orderstatus,
        |  n.o_totalprice  AS new_o_totalprice
        |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice""".stripMargin) {
      (s, d) =>
        val base = Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val oldSnap = base.filter(col("o_orderkey") % 13 =!= 0)
        val newSnap = base.filter(col("o_orderkey") % 11 =!= 0)
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 7 === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
        Cdc.diffSnapshots(oldSnap, newSnap,
          keys = Seq("o_orderkey"),
          attrs = Seq("o_orderstatus", "o_totalprice"))
    },

    // ---- incremental view maintenance with retraction (round 16):
    //      the v1 per-status aggregate state plus the v1→v2 diff must
    //      equal the direct v2 aggregate — the oracle. The fixture's
    //      status→'X' mutations are GROUP-MOVING updates (−1 old
    //      group, +1 new group), plus real inserts and deletes, so
    //      every retraction branch does work ----
    sql(
      "q_ivm_agg",
      """WITH n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT o_orderstatus, count(*)::BIGINT AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total
        |FROM n GROUP BY 1""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val oldSnap = base.filter(col("o_orderkey") % 13 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val state = Cdc.aggState(
        oldSnap.withColumn("cents",
          round(col("o_totalprice") * 100).cast("long")),
        Seq("o_orderstatus"), "cents")
      val diff = Cdc.diffSnapshots(oldSnap, newSnap,
        keys = Seq("o_orderkey"),
        attrs = Seq("o_orderstatus", "o_totalprice"))
      Cdc.aggApplyDiff(state, diff, "o_orderstatus",
        oldVal = round(col("old_o_totalprice") * 100),
        newVal = round(col("new_o_totalprice") * 100))
    },

    // ---- the consumer side of the diff: applying the delta to the
    //      old snapshot reconstructs the new one exactly, so the
    //      oracle is simply the new snapshot ----
    sql(
      "q_apply_diff",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 11 <> 0""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val oldSnap = base.filter(col("o_orderkey") % 13 =!= 0)
      val newSnap = base.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val keys = Seq("o_orderkey")
      val attrs = Seq("o_orderstatus", "o_totalprice")
      Cdc.applyDiff(oldSnap,
        Cdc.diffSnapshots(oldSnap, newSnap, keys, attrs), keys, attrs)
    },

    // ---- SCD1 upsert: batch rows win, untouched target survives ----
    sql(
      "q_scd1_merge",
      """WITH t AS (SELECT c_custkey, c_name, c_mktsegment
        |           FROM customer WHERE c_custkey % 10 <> 0),
        |b AS (SELECT c_custkey, upper(c_name) AS c_name, c_mktsegment
        |      FROM customer WHERE c_custkey % 3 = 0)
        |SELECT * FROM b
        |UNION ALL
        |SELECT * FROM t
        |WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.c_custkey = t.c_custkey)""".stripMargin) {
      (s, d) =>
        val base = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_mktsegment")
        val target = base.filter(col("c_custkey") % 10 =!= 0)
        val batch = base.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_name", upper(col("c_name")))
        Cdc.scd1Merge(target, batch, Seq("c_custkey"))
    },

    // ---- SCD2 merge: closed history passes through, changed keys
    //      (%5=0, status flips to 'X') close + reopen, no-op batch
    //      rows (%5=1, same status) change nothing ----
    sql(
      "q_scd2_merge",
      """SELECT o_orderkey, 'OLD' AS status,
        |  TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
        |  o_orderdate AS valid_to
        |FROM orders WHERE o_orderkey % 17 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus AS status,
        |  o_orderdate AS valid_from,
        |  CASE WHEN o_orderkey % 5 = 0
        |       THEN TIMESTAMP '1998-12-31 00:00:00' END AS valid_to
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'X' AS status,
        |  TIMESTAMP '1998-12-31 00:00:00' AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val closed = orders.filter(col("o_orderkey") % 17 === 0).select(
        col("o_orderkey"), lit("OLD").as("status"),
        expr("TIMESTAMP '1990-01-01 00:00:00'").as("valid_from"),
        col("o_orderdate").as("valid_to"))
      val current = orders.select(
        col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      // batch: %5=0 keys flip to 'X' (a real change — statuses are
      // O/F/P), %5=1 keys restate the current status (a no-op)
      val batch = orders
        .filter(col("o_orderkey") % 5 <= 1)
        .select(
          col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("status"),
          expr("TIMESTAMP '1998-12-31 00:00:00'").as("effective_at"))
      Cdc.scd2Merge(closed.unionByName(current), batch,
        keys = Seq("o_orderkey"), attrs = Seq("status"))
    },

    // ---- SCD2 point-in-time read: the q_scd2_merge history read
    //      as-of 1995-06-01 — every key shows exactly the version live
    //      then ('OLD' rows whose interval covers it, current rows
    //      opened before it and not yet closed; the 'X' reopenings at
    //      1998-12-31 are invisible). Oracle = the merge oracle wrapped
    //      in the same interval filter ----
    sql(
      "q_scd2_asof",
      """WITH hist AS (
        |  SELECT o_orderkey, 'OLD' AS status,
        |    TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
        |    o_orderdate AS valid_to
        |  FROM orders WHERE o_orderkey % 17 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus AS status,
        |    o_orderdate AS valid_from,
        |    CASE WHEN o_orderkey % 5 = 0
        |         THEN TIMESTAMP '1998-12-31 00:00:00' END AS valid_to
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'X' AS status,
        |    TIMESTAMP '1998-12-31 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT o_orderkey, status, valid_from, valid_to
        |FROM hist
        |WHERE valid_from <= TIMESTAMP '1995-06-01 00:00:00'
        |  AND (valid_to IS NULL
        |       OR valid_to > TIMESTAMP '1995-06-01 00:00:00')"""
        .stripMargin) { (s, d) =>
      // the REAL composition: scd2Merge builds the history (exactly
      // the q_scd2_merge construction), scd2AsOf reads it
      val orders = Tables.orders(s, d)
      val closed = orders.filter(col("o_orderkey") % 17 === 0).select(
        col("o_orderkey"), lit("OLD").as("status"),
        expr("TIMESTAMP '1990-01-01 00:00:00'").as("valid_from"),
        col("o_orderdate").as("valid_to"))
      val current = orders.select(
        col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val batch = orders
        .filter(col("o_orderkey") % 5 <= 1)
        .select(
          col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("status"),
          expr("TIMESTAMP '1998-12-31 00:00:00'").as("effective_at"))
      Cdc.scd2AsOf(
        Cdc.scd2Merge(closed.unionByName(current), batch,
          keys = Seq("o_orderkey"), attrs = Seq("status")),
        expr("TIMESTAMP '1995-06-01 00:00:00'"))
    },

    // ---- incremental rollup maintenance: the per-source (count, sum)
    //      state bootstrapped from the first third of the corpus and
    //      folded forward with two batch refreshes must EQUAL the
    //      one-shot aggregate over everything — associativity is the
    //      whole contract, and the oracle recomputes the one-shot side ----
    sql(
      "q_agg_refresh",
      """SELECT source, count(*)::BIGINT AS n,
        |  sum(n_chars)::BIGINT AS total
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val state0 = Cdc.aggState(
        docs.filter(col("doc_id") < 170), Seq("source"), "n_chars")
      val state1 = Cdc.aggRefresh(state0,
        docs.filter(col("doc_id") >= 170 && col("doc_id") < 340),
        Seq("source"), "n_chars")
      Cdc.aggRefresh(state1,
          docs.filter(col("doc_id") >= 340), Seq("source"), "n_chars")
        .orderBy("source")
    })
}
