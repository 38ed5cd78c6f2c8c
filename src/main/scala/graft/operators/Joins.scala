package graft.operators

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators Spark SQL lacks as primitives — as-of join
  * and interval range join — composed from existing operators so
  * Catalyst plans them (SURVEY §2; preference order (a) of the
  * custom-operator ladder). Both avoid the naive inequality-join
  * plan, which Spark executes as a broadcast-nested-loop: the as-of
  * join is a single co-shuffle + linear window pass, the range join
  * an equi-join on coarse time buckets with a residual filter.
  */
object Joins {

  /** j01: as-of join — for every event, the most recent order by the
    * same user at-or-before the event time (latest state as of ts,
    * the canonical feature-lookup / point-in-time-correctness join in
    * training pipelines).
    *
    * Shape: union both sides tagged, one shuffle on user_id, then a
    * running `last(..., ignoreNulls)` window carries the latest order
    * forward onto each event row. Cost is one exchange + one linear
    * pass regardless of how many orders precede each event — the
    * scale-right as-of plan (a per-event subquery or inequality join
    * is quadratic per user). Ties: an order dated exactly at ts
    * matches (at-or-before); among same-date orders the largest
    * o_orderkey wins (explicit third sort key, engine-portable).
    */
  def j01AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("od"),
      col("o_totalprice"))
    val events = Tables.events(spark, sfDir).select(
      col("user_id"),
      col("ts").as("t"),
      lit(1).as("is_event"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("od"),
      lit(null).cast("double").as("o_totalprice"))
    // orders sort before events at the same instant (<= semantics);
    // coalesce pins the null-key rows so both engines order alike
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_event"), coalesce(col("o_orderkey"), lit(0L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.union(events)
      .withColumn("m_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("m_orderdate", last(col("od"), ignoreNulls = true).over(w))
      .withColumn("m_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("m_orderkey").as("last_orderkey"),
        col("m_orderdate").as("last_orderdate"),
        round(col("m_totalprice"), 2).as("last_totalprice"))
      .orderBy(col("event_id"))
  }

  /** j02: interval range join — per click event, the count and value
    * of purchases by the same user inside [click_ts, click_ts + 24h)
    * (the attribution-window join; every click gets a row, zero-
    * purchase clicks included).
    *
    * Shape: bucket time into window-sized bins; a click's interval
    * spans at most two consecutive bins, so the click side explodes
    * to 2 rows, the purchase side maps to exactly 1, and the join is
    * a plain equi-join on (user_id, bucket) with the precise interval
    * check as a residual filter — shuffle-partitioned, AQE-skew-
    * handled, never the O(rows²) broadcast-nested-loop Spark would
    * plan for a bare inequality join. Each purchase matches a given
    * click at most once (its single bucket equals at most one of the
    * click's two).
    */
  def j02RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketSec = 86400L // = the 24h attribution window
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val cb = clicks
      .withColumn("b0", floor(unix_seconds(col("click_ts")) / bucketSec))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        explode(array(col("b0"), col("b0") + 1)).as("bucket"))
    val pb = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"),
        floor(unix_seconds(col("ts")) / bucketSec).as("bucket"))
    val matched = cb.join(pb, Seq("user_id", "bucket"))
      .filter(col("p_ts") >= col("click_ts") &&
        col("p_ts") < col("click_ts") + expr("INTERVAL 24 HOUR"))
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purchases"), round(sum(col("value")), 2).as("total_value"))
    clicks.join(matched, Seq("click_id"), "left")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("click_id"))
  }

  /** j03: nearest-neighbor temporal join — for every event, the
    * temporally CLOSEST order by the same user, before or after (the
    * symmetric completion of j01's at-or-before: label joins and
    * sensor alignment want "nearest reading", not "latest state").
    *
    * Shape: the j01 tagged-union co-shuffle, then TWO linear window
    * passes over the SAME partitioning and sort order (Catalyst plans
    * one exchange, chained Window operators): a running
    * `last(ignoreNulls)` carries the latest at-or-before order onto
    * each event, a mirrored `first(ignoreNulls)` over the following
    * frame carries the earliest strictly-after one (same-instant
    * orders sort before the event, so they land in the at-or-before
    * side — no double count). The winner is the smaller integer-µs
    * distance; ties prefer the before side, then j01's within-side
    * orderkey rules — every rule engine-portable. Events whose user
    * has no orders emit direction 'none'. Never a per-event subquery
    * or inequality join: cost is one exchange + two linear passes.
    */
  def j03NearestJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("od"))
    val events = Tables.events(spark, sfDir).select(
      col("user_id"),
      col("ts").as("t"),
      lit(1).as("is_event"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("od"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_event"), coalesce(col("o_orderkey"), lit(0L)))
    val wBefore = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAfter = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val deltaB = unix_micros(col("t")) - unix_micros(col("b_t"))
    val deltaA = unix_micros(col("a_t")) - unix_micros(col("t"))
    val pickBefore = col("b_key").isNotNull &&
      (col("a_key").isNull || deltaB <= deltaA)
    orders.union(events)
      .withColumn("b_key", last(col("o_orderkey"), ignoreNulls = true).over(wBefore))
      .withColumn("b_t", last(col("od"), ignoreNulls = true).over(wBefore))
      .withColumn("a_key", first(col("o_orderkey"), ignoreNulls = true).over(wAfter))
      .withColumn("a_t", first(col("od"), ignoreNulls = true).over(wAfter))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        when(pickBefore, col("b_key")).otherwise(col("a_key")).as("nearest_orderkey"),
        when(pickBefore, col("b_t")).otherwise(col("a_t")).as("nearest_orderdate"),
        when(col("b_key").isNull && col("a_key").isNull, "none")
          .when(pickBefore, "before").otherwise("after").as("direction"),
        when(pickBefore, deltaB)
          .when(col("a_key").isNotNull, deltaA)
          .otherwise(lit(null).cast("long")).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** Microseconds per hour — the j04 band width. */
  private val HourUs = 3600L * 1000000L

  /** j04: interval OVERLAP join — sessions (q31's assembly, reused as
    * a frame) against the corpus's HOT activity windows (tumbling
    * hours whose event count is ≥ 1.2× the mean, the data-derived
    * integer predicate 5·n·W ≥ 6·E so the threshold scales with the
    * corpus instead of hard-coding a count): which sessions ran
    * through congested periods, and for how long. The third temporal
    * join primitive after as-of (j01) and point-in-interval (j02) —
    * both interval sets here have extent.
    *
    * Shape: the standard banded decomposition — sessions explode to
    * the hour bands they touch (bounded by session length), windows
    * carry their single aligned band, and the band EQUI-join is
    * exactly the overlap predicate (window bands are hour-aligned,
    * so band ∈ [s div H, e div H] ⇔ ws ≤ e ∧ s < ws+H — the residual
    * filter is kept as a guard, not a correctness need, and no
    * dedup is needed since each window owns one band). At 100 TB
    * band population is per-hour activity — time-uniform by
    * construction; a skewed band would salt exactly like q23.
    * Overlap durations are integer microseconds end to end
    * (session intervals closed, windows half-open; an
    * instant-session overlap legitimately reports 0 µs).
    */
  def j04OverlapJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = Events.sessionFrame(spark, sfDir)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
    val hours = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_ev"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("n_ev"))
    val tot = hours.agg(count(lit(1)).as("nw"), sum(col("n_ev")).as("ne"))
    val hot = hours.crossJoin(broadcast(tot))
      .filter(col("n_ev") * lit(5L) * col("nw") >= col("ne") * lit(6L))
      .select(col("ws_us"), col("n_ev"))
    bandedOverlap(sessions, hot)
  }

  /** The banded interval-overlap core (see [[j04OverlapJoin]]):
    * `sessions` carries (user_id, session_id, s_us, e_us) closed
    * intervals, `hot` carries (ws_us, n_ev) hour-aligned half-open
    * windows. Package-private for the boundary-case spec.
    */
  private[graft] def bandedOverlap(sessions: DataFrame, hot: DataFrame): DataFrame = {
    // Band = FLOOR(us / hour), not `div`: `div` truncates toward zero,
    // which for a pre-1970 (negative-epoch) instant would round the
    // band UP and the equi-join would miss genuine overlaps that the
    // oracle's banding-free direct join finds. `(x - pmod(x, w)) div w`
    // floors for any sign in exact long arithmetic.
    def bandOf(c: String) = expr(s"($c - pmod($c, ${HourUs}L)) div ${HourUs}L")
    val sBands = sessions.withColumn("band",
      explode(sequence(bandOf("s_us"), bandOf("e_us"))))
    val hBands = hot.withColumn("band", bandOf("ws_us"))
    sBands.join(hBands, "band")
      .filter(col("ws_us") <= col("e_us") && col("s_us") < col("ws_us") + lit(HourUs))
      .select(col("user_id"), col("session_id"),
        col("ws_us").as("win_start_us"),
        (least(col("e_us"), col("ws_us") + lit(HourUs)) -
          greatest(col("s_us"), col("ws_us"))).as("overlap_us"),
        col("n_ev").as("win_events"))
      .orderBy(col("user_id"), col("session_id"), col("win_start_us"))
  }

  /** Hot-key-only salted inner equi-join — q23's demonstration as a
    * reusable operator. Keys whose LEFT-side row count reaches
    * `hotThreshold` are split across `saltBuckets` sub-keys (the
    * right side's hot rows are replicated `saltBuckets`×); every
    * other key joins plainly. Identical semantics to
    * `left.join(right, leftKey === rightKey)`, but no task ever holds
    * a whole hot key — the straggler/OOM profile of a power-law key
    * (the shape of per-user or per-domain joins on web data) goes
    * away, while the replication cost is confined to the hot slice
    * instead of a blanket build-side blow-up.
    *
    * The hot-key set is one partial-agg'd count pass, checkpointed
    * (four broadcast consumers) and broadcast — hot keys are by
    * definition few. `saltBy` picks the left-side salt source (any
    * deterministic, roughly-uniform column, e.g. a line number);
    * default is a hash of the entire left row, deterministic across
    * retries where a random/partition-id salt is not. AQE's
    * skew-join split covers the same risk REACTIVELY for sort-merge
    * joins; this operator is the declarative form that also works
    * where AQE can't re-plan (e.g. under a required distribution).
    *
    * Column names must be disjoint across the two sides (the usual
    * prefixed-schema convention); both key columns survive in the
    * output like a plain join's.
    */
  def skewSaltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      hotThreshold: Long, saltBuckets: Int = 8,
      saltBy: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val overlap = left.columns.toSet & right.columns.toSet
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    // the salt/hot-key working columns are added to the INPUTS — an
    // input already carrying one of these names would silently corrupt
    // the join (same contract as distributedRank's rankCol guard)
    val reserved = Seq("__graft_salt", "__graft_hot_key")
    val clash = (left.columns.toSet ++ right.columns.toSet) & reserved.toSet
    require(clash.isEmpty, s"inputs must not contain reserved internal columns: $clash")
    val saltCol = "__graft_salt"
    val hotKeys = left.groupBy(col(leftKey))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= hotThreshold)
      .select(col(leftKey).as("__graft_hot_key"))
      .ckpt(true)
    val saltSrc = saltBy.getOrElse(
      xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)))
    val hotSet = broadcast(hotKeys)
    val lHot = left.join(hotSet, col(leftKey) === col("__graft_hot_key"), "left_semi")
      .withColumn(saltCol, pmod(saltSrc, lit(saltBuckets)))
    val lCold = left.join(hotSet, col(leftKey) === col("__graft_hot_key"), "left_anti")
    val rHot = right.join(hotSet, col(rightKey) === col("__graft_hot_key"), "left_semi")
      .withColumn(saltCol, explode(array((0 until saltBuckets).map(lit): _*)))
    val rCold = right.join(hotSet, col(rightKey) === col("__graft_hot_key"), "left_anti")
    val hotJoin = lHot.join(rHot,
      lHot(leftKey) === rHot(rightKey) && lHot(saltCol) === rHot(saltCol))
      .drop(saltCol)
    val coldJoin = lCold.join(rCold, lCold(leftKey) === rCold(rightKey))
    hotJoin.unionByName(coldJoin)
  }
}
