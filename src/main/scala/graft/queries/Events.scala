package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators (SURVEY §2.9), declared in batch over
  * `events.parquet`. The identical plans run under `readStream` — see
  * graft.streaming.* and its specs for the watermark/stateful variants.
  *
  * Time discipline (SURVEY §2.11): parquet `ts` is ns; Spark reads it as
  * BIGINT ns (Tables.events adds µs-timestamp `ts_us`); DuckDB reads
  * TIMESTAMP_NS. Oracles therefore only ever emit integer epoch seconds
  * (floored), never raw timestamps, and DuckDB-side session logic first
  * truncates to µs (CAST(ts AS TIMESTAMP)) to match Spark's domain.
  */
object Events {

  val defs: Map[String, Q] = Map(

    "stream_tumbling" -> Q(
      """SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_s,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sumv
        |FROM read_parquet('{sfDir}/events.parquet')
        |GROUP BY day_s, event_type
        |ORDER BY day_s, event_type""".stripMargin) {
      // Tumbling 1-day window × type: in streaming this is the canonical
      // watermarked windowed agg; partial aggregation makes the shuffle
      // carry only (window, type) groups at scale.
      (s, d) => T.events(s, d)
        .groupBy(window(col("ts_us"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          dec2(sum(dec2(col("value")))).as("sumv"))
        .select(unix_timestamp(col("window.start")).as("day_s"),
          col("event_type"), col("n"), col("sumv"))
        .orderBy("day_s", "event_type")
    },

    "stream_sliding" -> Q(
      """SELECT ((CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600) - j) * 21600 AS win_s,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sumv
        |FROM read_parquet('{sfDir}/events.parquet')
        |CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js
        |GROUP BY win_s, event_type
        |ORDER BY win_s, event_type""".stripMargin) {
      // 1-day windows sliding 6h: each event belongs to 4 windows. The
      // oracle derives the same 4 window-starts arithmetically.
      (s, d) => T.events(s, d)
        .groupBy(window(col("ts_us"), "1 day", "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          dec2(sum(dec2(col("value")))).as("sumv"))
        .select(unix_timestamp(col("window.start")).as("win_s"),
          col("event_type"), col("n"), col("sumv"))
        .orderBy("win_s", "event_type")
    },

    "stream_session" -> Q(
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id
        |  FROM read_parquet('{sfDir}/events.parquet')
        |), flagged AS (
        |  SELECT user_id, t,
        |    CASE WHEN LAG(t) OVER w IS NULL
        |           OR t - LAG(t) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |), sess AS (
        |  SELECT user_id, t,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, CAST(FLOOR(epoch(MIN(t))) AS BIGINT) AS start_s,
        |       CAST(FLOOR(epoch(MAX(t))) AS BIGINT) AS end_s, COUNT(*) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_s""".stripMargin) {
      // Spark-native session windows (30-min gap); the oracle is the
      // classic gaps-and-islands formulation over µs-truncated time.
      (s, d) => T.events(s, d)
        .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("ts_us")).as("last_ts"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("start_s"),
          unix_timestamp(col("last_ts")).as("end_s"),
          col("n"))
        .orderBy("user_id", "start_s")
    },

    "join_asof" -> Q(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) t, event_type
        |           FROM read_parquet('{sfDir}/events.parquet')),
        |c AS (SELECT user_id, event_id, t FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, t, MIN(event_id) AS p_event_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
        |SELECT c.user_id, c.event_id AS click_id, CAST(FLOOR(epoch(c.t)) AS BIGINT) AS click_s,
        |       p.p_event_id, CAST(FLOOR(epoch(p.t)) AS BIGINT) AS p_s
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t >= p.t
        |ORDER BY c.user_id, click_id""".stripMargin) {
      // As-of join (graft.ops.AsOfJoin, union+window form) checked against
      // DuckDB's native ASOF LEFT JOIN: for each click, the latest
      // earlier purchase of the same user. Right side deduped per
      // (user, ts) so tie-carrying is engine-independent.
      (s, d) =>
        val e = T.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us").as("pts"))
          .agg(min(col("event_id")).as("p_event_id"))
        graft.ops.AsOfJoin.joinAsOf(clicks, purchases, key = "user_id",
            leftTs = "ts_us", rightTs = "pts", rightVals = Seq("p_event_id"))
          .select(col("user_id"), col("click_id"),
            unix_timestamp(col("ts_us")).as("click_s"),
            col("p_event_id"),
            unix_timestamp(col("asof_ts")).as("p_s"))
          .orderBy("user_id", "click_id")
    },

    "join_asof_fwd" -> Q(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) t, event_type
        |           FROM read_parquet('{sfDir}/events.parquet')),
        |c AS (SELECT user_id, event_id, t FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, t, MIN(event_id) AS p_event_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
        |SELECT c.user_id, c.event_id AS click_id, CAST(FLOOR(epoch(c.t)) AS BIGINT) AS click_s,
        |       p.p_event_id, CAST(FLOOR(epoch(p.t)) AS BIGINT) AS p_s
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t <= p.t
        |ORDER BY c.user_id, click_id""".stripMargin) {
      // FORWARD as-of join — for each click, the EARLIEST later purchase
      // of the same user ("did the click convert, and when"): the
      // time-mirrored direction of join_asof, checked against DuckDB's
      // native ASOF LEFT JOIN with the <= inequality. Same
      // union+window plan (one shuffle, one per-key sort), descending
      // scan order inside AsOfJoin.
      (s, d) =>
        val e = T.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us").as("pts"))
          .agg(min(col("event_id")).as("p_event_id"))
        graft.ops.AsOfJoin.joinAsOf(clicks, purchases, key = "user_id",
            leftTs = "ts_us", rightTs = "pts", rightVals = Seq("p_event_id"),
            direction = "forward")
          .select(col("user_id"), col("click_id"),
            unix_timestamp(col("ts_us")).as("click_s"),
            col("p_event_id"),
            unix_timestamp(col("asof_ts")).as("p_s"))
          .orderBy("user_id", "click_id")
    },

    "join_asof_near" -> Q(
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) t, event_type
        |           FROM read_parquet('{sfDir}/events.parquet')),
        |c AS (SELECT user_id, event_id, t FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, t, MIN(event_id) AS p_event_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, t),
        |bw AS (SELECT c.user_id, c.event_id, c.t, p.p_event_id AS b_id, p.t AS b_t
        |       FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t >= p.t),
        |fw AS (SELECT c.user_id, c.event_id, p.p_event_id AS f_id, p.t AS f_t
        |       FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t <= p.t)
        |SELECT bw.user_id, bw.event_id AS click_id,
        |  CAST(FLOOR(epoch(bw.t)) AS BIGINT) AS click_s,
        |  CASE WHEN b_t IS NOT NULL AND (f_t IS NULL
        |         OR epoch_us(bw.t) - epoch_us(b_t) <= epoch_us(f_t) - epoch_us(bw.t))
        |       THEN b_id ELSE f_id END AS p_event_id,
        |  CAST(FLOOR(epoch(
        |    CASE WHEN b_t IS NOT NULL AND (f_t IS NULL
        |           OR epoch_us(bw.t) - epoch_us(b_t) <= epoch_us(f_t) - epoch_us(bw.t))
        |         THEN b_t ELSE f_t END)) AS BIGINT) AS p_s
        |FROM bw JOIN fw ON bw.user_id = fw.user_id AND bw.event_id = fw.event_id
        |ORDER BY bw.user_id, click_id""".stripMargin) {
      // NEAREST as-of join — completes the direction family: for each
      // click, the purchase closest in time either way (equal distance
      // prefers backward — a total, deterministic choice). DuckDB has no
      // native nearest, so the oracle composes its two native ASOF
      // directions and picks per row in integer microseconds, exactly
      // like the operator. One shuffle, two per-partition sorts
      // (opposite-order windows share the keyed exchange).
      (s, d) =>
        val e = T.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us").as("pts"))
          .agg(min(col("event_id")).as("p_event_id"))
        graft.ops.AsOfJoin.joinAsOf(clicks, purchases, key = "user_id",
            leftTs = "ts_us", rightTs = "pts", rightVals = Seq("p_event_id"),
            direction = "nearest")
          .select(col("user_id"), col("click_id"),
            unix_timestamp(col("ts_us")).as("click_s"),
            col("p_event_id"),
            unix_timestamp(col("asof_ts")).as("p_s"))
          .orderBy("user_id", "click_id")
    },

    "stream_dedup" -> Q(
      """SELECT user_id, event_type, value, event_id AS keep_id FROM (
        |  SELECT user_id, event_type, value, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, value
        |                       ORDER BY ts, event_id) AS rn
        |  FROM read_parquet('{sfDir}/events.parquet')) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type, value""".stripMargin) {
      // Keep-first-by-time dedup: the batch shape of streaming
      // dropDuplicates (see graft.streaming specs for that variant).
      (s, d) =>
        val w = Window.partitionBy("user_id", "event_type", "value")
          .orderBy(col("ts"), col("event_id"))
        T.events(s, d)
          .select(col("user_id"), col("event_type"), col("value"),
            col("event_id"), row_number().over(w).as("rn"))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("value"),
            col("event_id").as("keep_id"))
          .orderBy("user_id", "event_type", "value")
    }
  )
}
