package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-15 additions beyond the verdict list:
  * MRR really is 1/rank-of-first-positive under the pessimistic tie
  * convention (brute sequential reference on controlled tie fixtures),
  * and the proximity score really is the pair count of positions
  * within the slop window (hand postings, boundary-exact).
  */
class Extra24Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mrrOf == brute sequential MRR under pessimistic ties") {
    import spark.implicits._
    // seg 0: ranks (desc score) 9,8,7 — first positive at score 8 →
    //   k = 2, rr_units = 500000000.
    // seg 1: the TIE pin — scores 5,5,5 hold 2 negatives + 1 positive;
    //   pessimistic resolution ranks both tied negatives first, so the
    //   positive lands at k = 1(better: score 6) + 2(tied negs) + 1 = 4
    //   even though an optimistic engine would say 2.
    // seg 2: no positives — first_k NULL, rr_units 0, rr NULL.
    // seg 3: positive is the unique top score → k = 1, rr = 1.0.
    val e = Seq(
      (0L, 9.0, 0L), (0L, 8.0, 1L), (0L, 7.0, 1L),
      (1L, 6.0, 0L), (1L, 5.0, 0L), (1L, 5.0, 0L), (1L, 5.0, 1L),
      (2L, 3.0, 0L), (2L, 2.0, 0L),
      (3L, 4.0, 1L), (3L, 1.0, 0L)
    ).toDF("seg", "score", "pos")
    val got = graft.queries.Extra24.mrrOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toList
    val want = List(
      (0L, 3L, 2L, 2L, 500000000L),
      (1L, 4L, 1L, 4L, 250000000L),
      (2L, 2L, 0L, -1L, 0L),
      (3L, 2L, 1L, 1L, 1000000000L))
    assert(got == want, s"got $got\nwant $want")
    // The rounded ratio column agrees with the unit column (readability
    // rider, never the gate): seg 1 → 0.25, seg 2 → NULL.
    val rr = graft.queries.Extra24.mrrOf(e).collect()
      .map(r => if (r.isNullAt(5)) None else Some(r.getDecimal(5).doubleValue))
    assert(rr.toList == List(Some(0.5), Some(0.25), None, Some(1.0)), rr.toList)
  }

  test("proximityScored == the pair count within the slop window, boundary-exact") {
    import spark.implicits._
    // doc 1: w1 at {1, 10}, w2 at {4, 5, 14} with window 3:
    //   x=1 pairs y∈{4} (|1-4|=3 inside, |1-5|=4 outside) → 1
    //   x=10 pairs y∈{14}? |10-14|=4 outside → 0 … total 1.
    // doc 2: symmetric side — w2 BEFORE w1 must count (|x-y|, not x-y):
    //   w1 at {7}, w2 at {5} → |7-5|=2 → 1.
    // doc 3: w1 present, w2 absent → no posting join row, filtered out.
    val tf = Seq(
      (1L, "alpha", Seq(1, 10)), (1L, "beta", Seq(4, 5, 14)),
      (2L, "alpha", Seq(7)), (2L, "beta", Seq(5)),
      (3L, "alpha", Seq(2))
    ).toDF("doc_id", "word", "positions")
    val ph = Seq((1L, "alpha", "beta")).toDF("qid", "w1", "w2")
    val got = graft.queries.Extra24.proximityScored(tf, ph, window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 1L)), got.toString)
    // Widening the window by one admits exactly the two boundary pairs
    // (1↔5 and 10↔14 in doc 1) — the off-by-one pin on the slop.
    val got4 = graft.queries.Extra24.proximityScored(tf, ph, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got4 == Set((1L, 1L, 3L), (1L, 2L, 1L)), got4.toString)
  }
}
