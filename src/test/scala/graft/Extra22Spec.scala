package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the DSIR importance filter — the law the hash gate
  * states but can't explain: the weight really is a log-likelihood
  * ratio, so documents drawn from the target token distribution score
  * POSITIVE (admitted) and documents over raw-exclusive vocabulary
  * score NEGATIVE (rejected), with the margin growing in document
  * length.
  */
class Extra22Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("DSIR separation: target-vocab docs weigh positive, raw-exclusive docs negative") {
    import spark.implicits._
    // 4 target docs over vocab {ta tb tc td}, 4 raw-only docs over the
    // disjoint {rx ry rz rw}. Target tokens then have ct = cr (u_b = 0),
    // so a pure-target doc's weight is n_tok·kc with kc = ln(Nr+B) −
    // ln(Nt+B) > 0 — admitted. A raw-only token has ct = 0, u_b =
    // −ln(cr+1) ≪ −kc, so raw docs reject. The law is exactly the
    // importance-ratio semantics, independent of the md5 bucketing
    // (collisions only mix counts; the fixture's margins dwarf them).
    val docs = ((0 until 4).map(i => (s"s${i % 2}", i.toLong, "T", "ta tb tc td")) ++
      (4 until 8).map(i => (s"s${i % 2}", i.toLong, "R", "rx ry rz rw")))
      .toDF("source", "doc_id", "lang", "text")
    val w = graft.queries.Extra22.dsirWeights(docs, col("lang") === "T")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w.size == 8)
    (0L until 4L).foreach(i => assert(w(i) > 0, s"target doc $i: ${w(i)}"))
    (4L until 8L).foreach(i => assert(w(i) < 0, s"raw doc $i: ${w(i)}"))
  }

  test("DSIR margin grows with document length (weights sum per token)") {
    import spark.implicits._
    val docs = Seq(
      ("s0", 0L, "T", "ta tb"),
      ("s0", 1L, "T", "ta tb ta tb ta tb"),
      ("s0", 2L, "R", "rx ry"),
      ("s0", 3L, "R", "rx ry rx ry rx ry")).toDF("source", "doc_id", "lang", "text")
    val w = graft.queries.Extra22.dsirWeights(docs, col("lang") === "T")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w(1L) == 3 * w(0L), s"target: ${w(0L)} vs ${w(1L)}")
    assert(w(3L) == 3 * w(2L), s"raw: ${w(2L)} vs ${w(3L)}")
    assert(w(1L) > 0 && w(3L) < 0)
  }
}
