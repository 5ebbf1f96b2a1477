package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.3 [N]): for each left row, attach the nearest
  * right row in the same key — `backward` (latest `rightTs <= leftTs`,
  * the default time-series enrichment) or `forward` (earliest
  * `rightTs >= leftTs`, e.g. "next fill after the order") — the standard
  * time-series operator Spark lacks natively.
  *
  * Implementation is the union+window (sort-merge-shaped) form:
  * union both sides tagged, sort per key by (ts, side) — descending ts
  * for the forward direction — carry the most recent right value forward
  * with `last(ignoreNulls)` over an unbounded preceding frame, keep left
  * rows.
  *
  * Scale: one shuffle on the key + one per-partition sort — the same
  * cost envelope as a sort-merge join, no range explosion, spillable.
  * (A tolerance variant filters on signed staleness afterwards.)
  */
object AsOfJoin {

  /** Orderable per Catalyst's ordering rules (RowOrdering.isOrderable):
    * atomics, arrays of orderable, structs of orderable; a UDT is
    * ordered by its sqlType; MapType and CalendarIntervalType are not.
    */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType              => false
      case CalendarIntervalType    => false
      case ArrayType(e, _)         => orderable(e)
      case StructType(fields)      => fields.forall(f => orderable(f.dataType))
      case u: UserDefinedType[_]   => orderable(u.sqlType)
      case _                       => true
    }
  }

  /** @param left       rows to enrich
    * @param right      timeline to look up into
    * @param key        equi-key column name present on both sides
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightVals  right columns to attach (prefixed as-is)
    * @param toleranceMs optional max signed staleness in ms (ts columns
    *                    must be castable to long ms via unix_millis)
    * @param direction  "backward" (latest earlier-or-equal right row),
    *                    "forward" (earliest later-or-equal right row), or
    *                    "nearest" (whichever of the two is closer in
    *                    time; equal distance prefers backward — a total,
    *                    deterministic choice). Nearest runs BOTH carries
    *                    over the same keyed partition — one shuffle, two
    *                    per-partition sorts — then picks per row.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"joinAsOf: unknown direction '$direction'")
    // The _rrow struct is part of the window SORT key (the deterministic
    // same-timestamp tiebreak below), so every attached right column must
    // be an orderable type — validated here with a named error instead of
    // letting a MapType value column fail analysis deep inside the window.
    rightVals.foreach { v =>
      val dt = right.schema(v).dataType
      require(orderable(dt),
        s"joinAsOf: right value column '$v' has non-orderable type " +
          s"${dt.simpleString} — it cannot join the deterministic " +
          "same-timestamp tiebreak (drop it from rightVals or cast it " +
          "to an orderable representation, e.g. map_entries)")
    }
    if (direction == "nearest") {
      require(toleranceMs.isEmpty, "joinAsOf: tolerance+nearest not supported")
      return joinAsOfNearest(left, right, key, leftTs, rightTs, rightVals)
    }
    val fwd = direction == "forward"
    val leftCols = left.columns
    val l = left.withColumn("_side", lit(1))
      .withColumn("_ts", col(leftTs))
      .select((col(key) +: leftCols.filterNot(_ == key).map(col)
        :+ col("_ts") :+ col("_side")): _*)
    // The whole right row rides as ONE struct (values + its own ts), so a
    // single last(ignoreNulls) attaches the latest right row wholesale —
    // per-column carries would silently backfill a NULL value column from
    // an older row and let asof_ts disagree with the row the values came
    // from (not as-of semantics).
    // NULL-ts right rows are dropped: "as of an unknown time" matches
    // nothing, but the window sort would otherwise place them first
    // (nulls-first asc) where they'd spuriously match every left row
    // earlier than all real right rows. NULL-ts LEFT rows are masked to
    // no-match after the scan (see below) for the same reason.
    val r = right.filter(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct((rightVals.map(col) :+ col(rightTs).as("_asof_ts")): _*).as("_rrow"))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Right rows sort before left rows at equal timestamps (_side 0 < 1),
    // so an exact-timestamp right row IS visible to the left row — in
    // both directions (both are inclusive). Forward is the time-mirrored
    // scan: descending ts, carry the nearest LATER right row. The _rrow
    // struct is the final sort key: among right rows SHARING (key, ts)
    // the greatest (rightVals…, ts) tuple is carried — a total,
    // direction-independent tiebreak instead of shuffle-order
    // nondeterminism (requires rightVals to be orderable types).
    val ts = if (fwd) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(key).orderBy(ts, col("_side").asc, col("_rrow").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = unioned
      .withColumn("_rrow", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      // a left row with no event time has no "as of" point — no match
      // (in the desc scan it sorts last and would otherwise carry the
      // minimum-ts right row)
      .withColumn("_rrow", when(col("_ts").isNull, lit(null)).otherwise(col("_rrow")))
    val bounded = toleranceMs match {
      case Some(t) =>
        // Too stale → no match at all: the entire attached row nulls out.
        // Staleness is signed per direction (how far the match lags the
        // left row backward, leads it forward).
        val gap =
          if (fwd) unix_millis(col("_rrow")("_asof_ts")) - unix_millis(col("_ts"))
          else unix_millis(col("_ts")) - unix_millis(col("_rrow")("_asof_ts"))
        kept.withColumn("_rrow", when(gap > t, lit(null)).otherwise(col("_rrow")))
      case None => kept
    }
    bounded.select((leftCols.map(col) ++ rightVals.map(v => col("_rrow")(v).as(v)) :+
      col("_rrow")("_asof_ts").as("asof_ts")): _*)
  }

  /** Nearest direction: both carries computed over the SAME keyed
    * partition (Catalyst plans the two opposite-order windows as one
    * exchange + two sorts), then a per-row pick of the closer side —
    * gaps compared in integer microseconds, equal distance prefers
    * backward (total, deterministic). Right rows sharing (key, ts) use
    * the same greatest-_rrow tiebreak as backward/forward — and because
    * BOTH windows order the tie group by the struct ascending, the two
    * carries agree on the winner, so the equal-distance pick can never
    * flip on shuffle order either.
    */
  private def joinAsOfNearest(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_side", lit(1))
      .withColumn("_ts", col(leftTs))
      .select((col(key) +: leftCols.filterNot(_ == key).map(col)
        :+ col("_ts") :+ col("_side")): _*)
    // NULL-ts rows: right ones dropped, left ones masked to no-match —
    // same contract as the directional form above.
    val r = right.filter(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct((rightVals.map(col) :+ col(rightTs).as("_asof_ts")): _*).as("_rrow"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val wb = Window.partitionBy(key)
      .orderBy(col("_ts").asc, col("_side").asc, col("_rrow").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key)
      .orderBy(col("_ts").desc, col("_side").asc, col("_rrow").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = unioned
      .withColumn("_bw", last(col("_rrow"), ignoreNulls = true).over(wb))
      .withColumn("_fw", last(col("_rrow"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .withColumn("_bgap",
        unix_micros(col("_ts")) - unix_micros(col("_bw")("_asof_ts")))
      .withColumn("_fgap",
        unix_micros(col("_fw")("_asof_ts")) - unix_micros(col("_ts")))
      .withColumn("_rrow",
        when(col("_ts").isNull, lit(null)) // unknown left time → no match
          .when(col("_bw").isNotNull &&
            (col("_fw").isNull || col("_bgap") <= col("_fgap")), col("_bw"))
          .otherwise(col("_fw")))
    picked.select((leftCols.map(col) ++ rightVals.map(v => col("_rrow")(v).as(v)) :+
      col("_rrow")("_asof_ts").as("asof_ts")): _*)
  }
}
