package graft.queries

import graft.Tables
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Relational query pack: exercises the reference's filter DSL (SURVEY
  * §2.4 F1/F2), top-K ranking (§2.7 T1/T2), conditional-count batch stats
  * (§2.6 A1-A3), and standard joins on the TPC-H-ish fixtures. Each query
  * has a DuckDB oracle in `oracles` with identical column names.
  *
  * Scale posture: group-bys keyed on low-cardinality columns (partial
  * aggregation collapses them map-side); dimension joins broadcast; the
  * band join is an equi-join on a bucketed key, not a cross product.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (reference A1/A2 batch-stats analog). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity"), 2).as("sum_qty"),
        exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        exactAvg(col("l_quantity"), 2).as("avg_qty"),
        exactAvg(col("l_extendedprice"), 2).as("avg_price"),
        exactAvg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Reference Filters range chain (F1): min/max numeric range predicates
    * compiled to a conjunctive filter, aggregated per group.
    */
  def filterRanges(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .filter(
        col("l_quantity") >= lit(10.0) && col("l_quantity") <= lit(40.0) &&
        col("l_discount") >= lit(0.02) && col("l_discount") <= lit(0.08) &&
        col("l_extendedprice") < lit(50000.0))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        exactSum(col("l_quantity"), 2).as("sum_qty"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Membership filter (F2, chain/DEX IN-lists) + broadcast dim join. */
  def membership(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      .join(broadcast(nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy(col("n_name"), col("c_mktsegment"))
  }

  /** Global top-K (T1/T2): rank-by key desc with deterministic tie-break;
    * Spark plans this as TakeOrderedAndProject (no full sort at scale).
    */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)
  }

  /** 3-way star join rollup: fact → broadcast dims, single shuffle on the
    * final low-cardinality group key.
    */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir)
      .join(broadcast(nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal"), 2).as("sum_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Scalar function family (P1/P2/P5/P6) + the Base58 codegen
    * expression (D11), oracle-gated: inputs are closed-form in
    * c_custkey with every branch planted (trim vs '@'/'\\' truncation,
    * empty→UNK, zero-denominator default, valid/invalid-alphabet/
    * too-short addresses), so the oracle states each expected value
    * directly while the engine computes it through the real functions.
    */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Functions => F}
    // the SOL mint — the reference's canonical valid base58 fixture
    val solMint = "So11111111111111111111111111111111111111112"
    val c = col("c_custkey")
    val k = c.cast("string")
    val cleanIn = when(c % 4 === 0, concat(lit("  name"), k, lit("  ")))
      .when(c % 4 === 1, concat(lit("user@ex"), k))
      .when(c % 4 === 2, concat(lit("a\\b"), k))
      .otherwise(concat(lit("tab\tname"), k, lit("\u0001")))
    val symIn = when(c % 5 === 0, lit("!!!")).otherwise(concat(lit("sym-"), k, lit("x!")))
    val addrIn = when(c % 3 === 0, lit(solMint))
      .when(c % 3 === 1, lit("0" + solMint.drop(1))) // '0' not in the alphabet
      .otherwise(lit(solMint.take(20))) // too short
    customer(spark, dir).select(
        c,
        F.cleanString(cleanIn).as("cleaned"),
        F.normalizeSymbol(symIn).as("symbol"),
        F.safeDivide((c + 1).cast("double") * 1.5, (c % 4).cast("double")).as("ratio"),
        F.tokenId(concat(lit("tok"), k)).as("token_id"),
        F.isBase58Address(addrIn).as("is_mint"))
      .orderBy(c)
  }

  /** Sink output projection (P7 null-coalescing defaults), trading-data
    * sanity (F5), and the config-driven rank/limit compile (T2) in one
    * oracle-gated query: token rows synthesize from c_custkey with nulls
    * planted in every default family (string/numeric/int + the
    * token_name→symbol→"" fallback chain), F5 probe values cover every
    * rejection branch (0.0, ±1.0, out-of-range magnitudes, >$1M price,
    * negative/oversized volume, null-passes), and the result then flows
    * through `QueryCompiler.apply` with rankBy=volume/desc + limit over
    * unique volumes (plans as TakeOrderedAndProject).
    */
  def outputGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.config.{Filters, Order, QueryCompiler, RankBy, ScrapingConfig}
    import graft.functions.{Functions => F}
    val c = col("c_custkey")
    val k = c.cast("string")
    val priceProbe = when(c % 7 === 0, lit(null))
      .when(c % 7 === 1, lit(0.0))
      .when(c % 7 === 2, lit(-1.0))
      .when(c % 7 === 3, lit(2e15))
      .when(c % 7 === 4, lit(1e-16))
      .when(c % 7 === 5, lit(1500000.0))
      .otherwise(lit(0.05))
    val volProbe = when(c % 5 === 0, lit(null))
      .when(c % 5 === 1, lit(-5.0))
      .when(c % 5 === 2, lit(2e12))
      .otherwise(lit(1000.0))
    val tokens = customer(spark, dir).select(
      c,
      when(c % 2 === 0, lit(null)).otherwise(concat(lit("S"), k)).as("symbol"),
      when(c % 4 === 0, lit(null)).otherwise(concat(lit("N"), k)).as("token_name"),
      when(c % 3 === 0, lit(null)).otherwise(lit("base")).as("chain"),
      lit(null).cast("string").as("protocol"),
      lit(null).cast("string").as("age"),
      lit(null).cast("string").as("website"),
      lit(null).cast("string").as("twitter"),
      lit(null).cast("string").as("telegram"),
      lit(null).cast("string").as("pair_address"),
      lit(null).cast("string").as("creator_address"),
      lit(null).cast("string").as("token_address"),
      lit(null).cast("string").as("quote_address"),
      priceProbe.as("price"),
      (c.cast("double") * 7.0).as("volume_24h"), // unique → deterministic top-N
      (c.cast("double") * 3.0).as("liquidity"),
      (c.cast("double") * 11.0).as("market_cap"),
      lit(null).cast("double").as("change_5m"),
      lit(null).cast("double").as("change_1h"),
      lit(null).cast("double").as("change_6h"),
      when(c % 6 === 0, lit(null)).otherwise(lit(1.25)).as("change_24h"),
      when(c % 3 === 1, lit(null)).otherwise((c % 100).cast("int")).as("txns_24h"),
      when(c % 5 === 2, lit(null)).otherwise((c % 50).cast("int")).as("makers"),
      lit(null).cast("int").as("boost"),
      (lit(0.5) + (c % 5).cast("double") / 10.0).as("confidence_score"),
      (c % 8).cast("int").as("field_count"),
      volProbe.as("vol_probe"))
    val projected = graft.operators.Tokens.outputProjection(tokens)
      .withColumn("valid_trading", F.validTradingData(priceProbe, col("vol_probe")))
      .drop("vol_probe")
    // Filters() keeps the reference's chain default (solana) — after P7
    // defaulting that retains exactly the null-chain rows (c%3=0), so the
    // F2 membership filter is live in this gate too.
    val config = ScrapingConfig(rankBy = RankBy.Volume, order = Order.Desc,
      filters = Filters(volumeH24Min = Some(700L)))
    QueryCompiler.apply(projected, config, limitN = 100)
      .select(c, col("symbol"), col("token_name"), col("chain"), col("protocol"),
        col("pair_address"), col("price"), col("volume_24h"),
        col("change_5m"), col("change_24h"),
        col("txns_24h").cast("long").as("txns_24h"),
        col("makers").cast("long").as("makers"),
        col("boost").cast("long").as("boost"), col("valid_trading"))
      .orderBy(c)
  }

  /** Batch statistics (A1): total / conditional counts / distinct users —
    * the reference's `ExtractedTokenBatch.__post_init__` stats shape.
    */
  def batchStats(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).agg(
      count(lit(1)).as("total_events"),
      count_if(col("value") >= lit(100.0)).as("high_value_count"),
      count_if(col("event_type") === lit("purchase")).as("purchase_count"),
      countDistinct(col("user_id")).as("n_users"))
  }

  /** Frequency count + order (A3/T5: symbol frequency ranking). */
  def frequency(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("freq"), exactSum(col("value"), 2).as("sum_value"))
      .orderBy(col("freq").desc, col("event_type"))
  }

  /** Per-group top-K (T1 applied per chain): the reference's top-tokens
    * ranking scoped by group, via window row_number.
    */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** Proximity band join (J1): |left.pos - right.pos| <= width, realized
    * as an equi-join on a bucketed position key (each probe row expands to
    * 3 candidate buckets) instead of a cross product — the 100 TB-safe
    * shape of the reference's ±1000-byte metadata join.
    */
  def proximityBand(spark: SparkSession, dir: String): DataFrame = {
    val width = 50L
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"))
      .withColumn("bucket", explode(array(
        floor(col("click_id") / width) - 1,
        floor(col("click_id") / width),
        floor(col("click_id") / width) + 1)))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        floor(col("view_id") / width).as("bucket"))
    clicks.join(views, "bucket")
      .filter(abs(col("click_id") - col("view_id")) <= width)
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_views"),
        min(abs(col("click_id") - col("view_id"))).as("min_dist"))
      .orderBy(col("click_id"))
  }

  /** Degenerate tick→bar projections (W1, W2/W3) + trades estimate (W5),
    * oracle-gated: ticks derive from `events` with planted nulls
    * (closed-form in event_id) so BOTH the has-data path and every
    * placeholder branch (W1's price=1.0 / volume=1000.0 / ts=nowTs;
    * W2's row-drop) are exercised and hash-checked. Narrow projections —
    * the only shuffle is the presentation sort.
    */
  def tickBars(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.OhlcOps
    val ticks = events(spark, dir).select(
      col("event_id"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("price"),
      when(col("event_id") % 11 === 0, lit(null))
        .otherwise(col("value") * 100.0).as("volume_h24"),
      when(col("event_id") % 13 === 0, lit(null))
        .otherwise(col("event_id") + 1700000000L).as("created_at"))
    val w1 = OhlcOps.pairToOhlc(ticks, nowTs = 1800000000L, idCols = Seq("event_id"))
      .withColumn("op", lit("w1"))
    val w2 = OhlcOps.tokenToOhlc(
        ticks.select(col("event_id"), col("price"),
          col("volume_h24").as("volume_24h"), col("created_at").as("timestamp")),
        idCols = Seq("event_id"))
      .withColumn("op", lit("w2"))
    w1.unionByName(w2)
      .withColumn("trades_est", OhlcOps.tradesOrEstimate.cast("long"))
      .drop("trades")
      .orderBy(col("op"), col("event_id"))
  }

  /** Tick stream → hourly OHLC bars (W4): the true time-bucketed form of
    * the reference's OHLC export, with open/close selected by a total
    * order (arg-min/arg-max on the unique event id) so results are
    * deterministic under parallel aggregation.
    */
  def ohlcHourly(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .groupBy(col("bucket"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        exactSum(col("value"), 2).as("volume"),
        count(lit(1)).as("trades"))
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bar_ts"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("trades"))
      .orderBy(col("bar_ts"), col("event_type"))
  }

  /** As-of join inside the event stream: every `purchase` event picks up
    * the latest `view` event by the same user at or before its timestamp
    * (null columns when the user never viewed before buying). One
    * union+window pass — see [[graft.operators.AsofJoin]] for why this
    * beats a range theta-join at scale; the oracle uses DuckDB's native
    * ASOF LEFT JOIN, a deliberately different formulation.
    */
  def asofPurchaseView(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("value").as("view_value"))
    graft.operators.AsofJoin.asofJoin(
        purchases, views,
        leftKey = "user_id", rightKey = "user_id",
        leftTs = "purchase_ts", rightTs = "ts",
        payload = Seq("view_id", "view_ts", "view_value"), tiebreak = "event_id")
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"),
        col("purchase_value"),
        col("view_id"),
        unix_micros(col("view_ts")).as("view_ts_us"),
        col("view_value"))
      .orderBy(col("purchase_id"))
  }

  private val SessionGapUs = 30L * 60 * 1000000 // 30-minute inactivity gap
  private val AttributionUs = 6L * 3600 * 1000000 // q63 post-view window

  /** q60: gap-based sessionization of the event stream — the canonical
    * behavioral-analytics window the reference's snapshot model never
    * needs but any event pipeline does. One window pass per user
    * (lag → new-session flag → running sum), one aggregate per
    * session; both shuffles key on user_id, so skew equals user skew.
    * The (ts, event_id) order is total, making the session numbering
    * deterministic under equal timestamps.
    */
  private def sessionsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > SessionGapUs, 1L)
      .otherwise(0L)
    ev.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_sess", isNew)
      .withColumn("session_seq", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionsOf(events(spark, dir))
      .orderBy(col("user_id"), col("session_seq"))

  /** q63: attribution as a point-in-interval join — purchases landing
    * inside a view-session of the same user, via the bucketized
    * equi-join ([[graft.operators.IntervalJoin]]) instead of the
    * per-key-quadratic BETWEEN theta-join the oracle deliberately runs.
    */
  def intervalAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    // attribution window = the session plus 6 h after the last view
    // ("bought within 6 h of browsing") — 6 one-hour buckets per
    // interval, so the bucket replication path actually exercises
    val sessions = sessionsOf(ev.filter(col("event_type") === "view"))
      .select(col("user_id"), col("session_start_us"),
        (col("session_end_us") + AttributionUs).as("session_end_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_ts_us"))
    graft.operators.IntervalJoin.pointInInterval(
        purchases, sessions, "purchase_ts_us",
        "session_start_us", "session_end_us",
        keyCols = Seq("user_id"), bucketWidth = 3600000000L) // 1 h ≈ session scale
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_us"),
        col("session_start_us"), col("session_end_us"))
      .orderBy(col("purchase_id"))
  }

  private val QuantilePs = Seq(1, 25, 50, 75, 99)

  /** q61: exact percentiles of lineitem price via the two-pass
    * distributed prefix sum ([[graft.ext.StatOps.exactQuantiles]]) —
    * the oracle uses the global cumulative window the engine
    * deliberately avoids (fine in DuckDB at sf0.01; a one-partition
    * sort as a Spark plan at 100 TB).
    */
  def exactQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.ext.StatOps.exactQuantiles(
      lineitem(spark, dir), "l_extendedprice", QuantilePs)
      .orderBy(col("p"))

  /** q117: WINSORIZED statistics — clamp the metric at its own exact
    * p01/p99 ([[graft.ext.StatOps.exactQuantiles]] — quantile_disc
    * values drawn from the data, so the clamp bounds are exact doubles
    * both engines share) and emit the clipped census: clip counts each
    * side and the exact-decimal sum/mean of the winsorized column
    * ([[Tables.exactSum]]/[[Tables.exactAvg]] — order-independent
    * int64 accumulation). The robust companion to q114's MAD gate:
    * MAD flags the tail, winsorization prices it out of the moments.
    *
    * Scale shape: the quantile pass is the two-pass prefix-sum
    * (O(parts) driver traffic, no global sort); the bounds reach the
    * census scan as a broadcast 1-row frame; the census is one
    * map-side-combinable global aggregate.
    */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Caches.persisted(
      lineitem(spark, dir).select(col("l_extendedprice")))
    val bounds = graft.ext.StatOps.exactQuantiles(li, "l_extendedprice", Seq(1, 99))
      .agg(max(when(col("p") === 1, col("value"))).as("lo"),
        max(when(col("p") === 99, col("value"))).as("hi"))
    li.crossJoin(broadcast(bounds))
      .withColumn("w", least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice") < col("lo")).cast("long")).as("n_clip_lo"),
        sum((col("l_extendedprice") > col("hi")).cast("long")).as("n_clip_hi"),
        exactSum(col("w"), 2).as("sum_w"),
        exactAvg(col("w"), 2).as("avg_w"))
  }

  /** q116: INCREMENTAL exact quantiles, oracle-gated — the distinct-
    * value count table `(v, c)` is the exact quantile's ADDITIVE
    * sufficient statistic: three l_orderkey-ranged micro-batches each
    * build their own table, the tables merge by union + groupBy-sum,
    * and finalizing the merged table ([[graft.ext.StatOps
    * .exactQuantilesFromCounts]]) must hash-equal the one-shot batch
    * q61 via q61's own oracle. Completes the incremental family
    * (q96 HLL, q99 CMS, q106 scatter, q113 KMV) with the EXACT member:
    * unlike the sketches, the merged state reproduces the precise
    * order statistic, at state cost O(distinct values) instead of O(k).
    */
  def streamQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Caches.persisted(lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(col("l_extendedprice").isNotNull))
    val mx = li.agg(max(col("l_orderkey"))).head.getLong(0)
    val merged = Seq(
      li.filter(col("l_orderkey") <= mx / 3),
      li.filter(col("l_orderkey") > mx / 3 && col("l_orderkey") <= 2 * mx / 3),
      li.filter(col("l_orderkey") > 2 * mx / 3))
      .map(_.groupBy(col("l_extendedprice").as("v")).agg(count(lit(1)).as("c")))
      .reduce(_ unionByName _)
      .groupBy(col("v")).agg(sum(col("c")).as("c"))
    graft.ext.StatOps.exactQuantilesFromCounts(merged, QuantilePs)
      .orderBy(col("p"))
  }

  /** q62: the HLL-shape distinct sketch ([[graft.ext.SketchOps]]) gated
    * register-for-register: per event_type the full 64-register state
    * collapses to (nonzero count, zero count, exact-integer harmonic
    * Z) plus the estimate, joined against the true distinct count the
    * sketch approximates — so the oracle re-derives the sketch AND the
    * ground truth it should be within ~13% of (m=64 → ±1.04/√64).
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_type"), col("user_id"))
    val sketch = graft.ext.SketchOps.hllDistinct(ev, Seq("event_type"), "user_id")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, "event_type").orderBy(col("event_type"))
  }

  /** q87: the KMV / bottom-k distinct sketch ([[graft.ext.SketchOps
    * .kmvDistinct]]) gated state-for-state: per event_type the kept-set
    * size, the k-th smallest hash, and the integer estimate, joined
    * against the true distinct count it approximates — the same
    * sketch-AND-ground-truth contract as q62's HLL gate.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_type"), col("user_id"))
    val sketch = graft.ext.SketchOps.kmvDistinct(ev, Seq("event_type"), "user_id")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, "event_type").orderBy(col("event_type"))
  }

  /** q89: the STREAMING half of q60's gap sessionization, oracle-gated —
    * the real stateful engine path ([[graft.streaming.Streaming
    * .sessionStream]]: `session_window` + watermark, append mode), fed
    * the same events through a file stream and hash-gated against q60's
    * own DuckDB oracle: closed streamed sessions must equal the batch
    * lag/cumsum formulation row-for-row.
    *
    * Two deliberate mechanics make stream ≡ batch EXACT:
    *   - gap = 30 min + 1 µs: `session_window` merges on diff < gap
    *     (strict), the batch rule keeps a session on diff ≤ 30 min —
    *     the +1 µs aligns the boundary case;
    *   - a far-future sentinel row (user −1, filtered from the output)
    *     drives the watermark past every real session's close, so
    *     append mode emits them all; the sentinel's own session never
    *     closes and stays in the (discarded) state store.
    *
    * `session_seq` (the batch output's per-user ordinal) is assigned in
    * a batch post-pass over the CLOSED sessions (a per-user window over
    * session counts, not events). Staging the fixture through a temp
    * dir is harness plumbing — production reads an actual stream.
    */
  def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id")))
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q89-").toString
    ev.write.mode("overwrite").parquet(tmp)
    ev.sparkSession.range(1)
      .select(lit(-1L).as("event_id"),
        timestamp_micros(lit(maxTs + 86400L * 1000000L)).as("ts"),
        lit(-1L).as("user_id"))
      .write.mode("append").parquet(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, nullable = false),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val src = spark.readStream.schema(schema).parquet(tmp)
    val gapUs = SessionGapUs + 1L
    val sessions = graft.streaming.Streaming.sessionStream(
      src, s"$gapUs microseconds", "0 seconds", keyCols = Seq("user_id"))
    val sinkName = s"graft_q89_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // state partitions sized to the input, not the core count — the
    // stateful stream pins its state layout from shuffle.partitions at
    // start and AQE cannot coalesce it (Streaming.statePartitions)
    graft.streaming.Streaming.withShufflePartitions(spark,
      graft.streaming.Streaming.statePartitions(spark, ev)) {
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName(sinkName).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    val closed = spark.table(sinkName)
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        (unix_micros(col("session_end")) - gapUs).as("session_end_us"),
        col("n_events"), col("first_event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start_us").asc)
    closed.withColumn("session_seq", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_seq"), col("session_start_us"),
        col("session_end_us"), col("n_events"), col("first_event_id"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** q93: the STREAMING half of q84's funnel, oracle-gated — the event
    * log replays through [[graft.streaming.StatefulOps.funnelStates]]
    * (`flatMapGroupsWithState`, one O(1) stage-triple per user in the
    * state store) in three event-time terciles, each a micro-batch
    * (`maxFilesPerTrigger` 1; file names AND modtimes ascend, so the
    * source replays them in ts order — the operator's feed contract).
    * The final per-user stage times are a max-fold over emitted
    * snapshots (stages only ever get set), and the stage census must
    * hash-equal the batch funnel against q84's own DuckDB oracle.
    */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type")))
    val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head
    val (lo, span) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-q93-")
    val cuts = Seq(lo, lo + span / 3, lo + 2 * span / 3, lo + span)
    (0 until 3).foreach { i =>
      val stageDir = java.nio.file.Files.createTempDirectory("graft-q93-stage-")
      ev.filter(col("ts_us") >= cuts(i) && col("ts_us") < cuts(i + 1))
        .coalesce(1).write.mode("overwrite").parquet(stageDir.toString)
      val part = java.nio.file.Files.list(stageDir).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"q93: no parquet part written for tercile $i"))
      val dst = streamDir.resolve(s"t$i.parquet")
      java.nio.file.Files.move(part, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val snaps = graft.streaming.StatefulOps.funnelStates(
      src.select(col("user_id").as("userId"), col("event_id").as("eventId"),
          col("ts_us").as("tsUs"), col("event_type").as("eventType"))
        .as[graft.streaming.StatefulOps.FunnelEvent],
      Seq("view", "click", "purchase"))
    val sinkName = s"graft_q93_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // input-proportional state partitioning, as in q89 — see
    // Streaming.statePartitions for the sizing contract
    graft.streaming.Streaming.withShufflePartitions(spark,
      graft.streaming.Streaming.statePartitions(spark, ev)) {
      val q = snaps.toDF().writeStream.outputMode("append")
        .format("memory").queryName(sinkName).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    val fin = spark.table(sinkName).groupBy(col("userId"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
    def stageRow(df: DataFrame, stage: Long, name: String, lag: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
          coalesce(sum(lag), lit(0L)).as("sum_lag_us"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_users"), col("sum_lag_us"))
    stageRow(fin.filter(col("t1") >= 0), 1L, "view", lit(0L))
      .unionByName(stageRow(fin.filter(col("t2") >= 0), 2L, "click",
        col("t2") - col("t1")))
      .unionByName(stageRow(fin.filter(col("t3") >= 0), 3L, "purchase",
        col("t3") - col("t2")))
      .orderBy(col("stage"))
  }

  /** q92: time-DECAYED trending aggregate over the event stream — the
    * distributed form of the reference's trending-score family
    * (recency-weighted activity; `config/QueryConfig.scala`'s
    * trendingScore h1/h6/h24 normalization is the batch-window
    * cousin): per event_type, Σ value·2^(−age_days) — a one-day
    * half-life.
    *
    * Exactness: the weight is a POWER OF TWO with an integer exponent
    * (ages clamp at 62 so shifts stay in int64), the value is
    * integer-scaled (×100), and the decayed numerator is carried at
    * the common denominator 2^horizon as exact arbitrary-precision
    * integers — decimal(38,0) here, HUGEINT in the oracle — emitted
    * as a STRING so the gate compares digits, not engine decimal
    * types. No floating point anywhere: ln/exp-based decay would
    * never hash-match across engines.
    *
    * Scale shape: one narrow scan + ONE broadcast 1-row (max, horizon)
    * frame + one groupBy — the decayed sum is order-independent
    * integer addition, so it partial-aggregates map-side like any sum
    * (the property running-window EWMA formulations lose).
    */
  def decayedTrend(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = events(spark, dir).select(col("event_type"),
      unix_micros(date_trunc("day", col("ts"))).as("day_us"),
      round(col("value") * 100).cast("long").as("v_int"))
    val bounds = ev.agg(max(col("day_us")).as("mx"),
      least(expr(s"(max(day_us) - min(day_us)) div $dayUs"), lit(62L)).as("a"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("age_c", least(expr(s"(mx - day_us) div $dayUs"), lit(62L)))
      .groupBy(col("event_type"))
      .agg(max(col("a")).as("horizon_days"),
        count(lit(1)).as("n_events"),
        sum(col("v_int")).as("sum_v_int"),
        sum(col("v_int").cast("decimal(38,0)") *
          expr("shiftleft(1L, cast(a - age_c as int))").cast("decimal(38,0)"))
          .cast("string").as("decayed_num"))
      .orderBy(col("event_type"))
  }

  /** q88: Markov TRANSITION MATRIX over per-user event sequences — the
    * third classic sequence operator beside the funnel (q84) and
    * retention (q85): for every ordered pair of consecutive events of
    * one user, count the (prev_type → next_type) transition, the
    * distinct users making it, and the row-normalized probability in
    * exact ppm (integer `div`, so both engines land identical values —
    * no floating-point division anywhere).
    *
    * Scale shape: the only per-user work is ONE `lag` window whose
    * partitions are each a single user's events (the same posture as
    * sessionize q60 — a hash shuffle on user_id into user-sized groups,
    * never a global sort; the hot-key ceiling is the busiest single
    * user, not the corpus). Everything after is two tiny aggregations:
    * the transition counts (|types|² rows) and their row totals, joined
    * broadcast-small.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("user_id"), col("prev_type"), col("event_type").as("next_type"))
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n_transitions")).as("row_total"))
    counts.join(broadcast(totals), "prev_type")
      .withColumn("ppm", expr("(n_transitions * 1000000L) div row_total"))
      .select(col("prev_type"), col("next_type"), col("n_transitions"),
        col("n_users"), col("ppm"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** q102: SCD-2 DIMENSION BUILD from the event stream — the
    * warehouse-layer intervalization every analytics stack runs
    * (Kimball type-2 slowly changing dimensions): per user, track the
    * JSON property `k` (extracted from the raw `props` payload — the
    * semi-structured ETL step), emit one VERSION row per change with
    * half-open validity [valid_from_us, valid_to_us) — the final
    * version open-ended at Long.MaxValue — plus the version ordinal.
    * An as-of join (q53) against this output answers "what was k for
    * user u at time t" without scanning events.
    *
    * Scale shape: change detection (lag) and interval close
    * (lead + version row_number, fused into one Window node) share
    * the per-user (ts, event_id) ordering, so the filter between them
    * preserves partitioning and the chain costs ONE hash shuffle on
    * user_id (user-sized partitions, the sessionize posture; the only
    * other exchange is the output sort's range partitioning — audited
    * with tools.ExplainQuery: 2 windows, 1 hash + 1 range shuffle).
    * The output is change-count-sized, not event-count-sized.
    */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val changes = ev
      .withColumn("prev_k", lag(col("k"), 1).over(w))
      .filter(col("prev_k").isNull || col("prev_k") =!= col("k"))
    val wc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    changes
      .withColumn("version", row_number().over(wc).cast("long"))
      .withColumn("valid_to_us",
        coalesce(lead(col("ts_us"), 1).over(wc), lit(Long.MaxValue)))
      .select(col("user_id"), col("version"), col("k"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("version"))
  }

  /** q96: INCREMENTAL sketch maintenance, oracle-gated — the event
    * stream splits into three id-ranged micro-batches, each builds its
    * own HLL register state independently, the states merge by
    * per-bucket max ([[graft.ext.SketchOps.hllMergeRegisters]] — the
    * mergeability that makes the sketch a streaming/cross-day
    * structure at all), and the merged estimate must hash-equal the
    * one-shot batch sketch via q62's own DuckDB oracle. This is the
    * sketch analog of the q72/q73 incremental-index gates.
    */
  def streamHll(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.SketchOps
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id")))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    val states = Seq(
      ev.filter(col("event_id") <= mx / 3),
      ev.filter(col("event_id") > mx / 3 && col("event_id") <= 2 * mx / 3),
      ev.filter(col("event_id") > 2 * mx / 3))
      .map(SketchOps.hllRegisters(_, Seq("event_type"), "user_id"))
    val sketch = SketchOps.hllFinalize(
      SketchOps.hllMergeRegisters(states, Seq("event_type")), Seq("event_type"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, "event_type").orderBy(col("event_type"))
  }

  private val BucketCount = 8

  /** Per-process location for q125's bucketed tables (see the cleanup
    * note in [[bucketedJoin]]); the shutdown hook makes the whole dir
    * transient so per-PID paths can't accumulate across JVM runs.
    */
  private lazy val bucketedTmpPath: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-q125-bucketed-${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
          st.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => java.nio.file.Files.deleteIfExists(q))
        }))
    p
  }

  /** q125: the BUCKETED-STORAGE join path under the oracle hash gate —
    * both fact sides written as co-bucketed, per-bucket-sorted tables
    * on the join key ([[graft.operators.Bucketing.writeBucketed]]),
    * joined via the catalog relations ([[graft.operators.Bucketing
    * .coLocatedJoin]] — BucketingSpec proves ZERO shuffle exchanges in
    * this plan), then a priority-keyed revenue rollup whose values
    * must hash-equal a plain DuckDB join. The write-once/join-many
    * layout is how a 100 TB fact-fact join amortizes its shuffle into
    * the storage layer; this query pins that the layout path is
    * value-identical to the logical join, not just shuffle-free.
    * (The in-query write to a temp dir is harness plumbing —
    * production writes the bucketed tables once at ingest.)
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // Fixed per-PROCESS path, cleared before each write: a fresh temp
    // dir per invocation leaked disk across repeated bench/verify runs
    // (saveAsTable overwrote only the catalog entry, not the old path),
    // and a pre-existing non-empty location would trip Spark's
    // CTAS-into-non-empty-directory check in a fresh catalog. The PID
    // suffix keeps two concurrent JVMs (bench + test on one machine)
    // from deleting each other's live tables; the shutdown hook keeps
    // per-process disk usage transient, so repeated single-run JVMs
    // don't accumulate copies either.
    val tmpPath = bucketedTmpPath
    if (java.nio.file.Files.exists(tmpPath)) {
      // walk() holds a directory stream — close it or leak an fd per call
      scala.util.Using.resource(java.nio.file.Files.walk(tmpPath)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val tmp = tmpPath.toString
    graft.operators.Bucketing.writeBucketed(
      lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"),
        col("l_discount")),
      "graft_q125_lineitem", s"$tmp/lineitem", "l_orderkey", BucketCount)
    graft.operators.Bucketing.writeBucketed(
      orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
      "graft_q125_orders", s"$tmp/orders", "o_orderkey", BucketCount)
    graft.operators.Bucketing.coLocatedJoin(spark,
        "graft_q125_lineitem", "graft_q125_orders", "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** q124: VOLUME anomaly gate — per event_type, flag days whose event
    * count sits more than 3σ from that type's daily mean, with the
    * sigma test done in EXACT integer arithmetic: `(x−μ)² > k²σ²`
    * multiplied through by n² gives `(n·x − S)² > k²·(n·ΣX² − S²)` —
    * counts, sums and squares only, no division, no floating point, so
    * both engines land identical flags (the ingest-volume tripwire a
    * pipeline checks before trusting a day's partition; the value-
    * level sibling is q114's MAD). Squares ride in decimal(38,0)
    * (Spark) / hugeint (DuckDB) so petabyte-scale daily counts cannot
    * overflow.
    *
    * Scale shape: one map-side-combinable (type, day) count — day
    * grain, so everything after is days-sized; the per-type moment
    * table broadcasts back onto the daily frame.
    */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x")))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("s"),
        sum(col("x").cast(dec) * col("x").cast(dec)).cast(dec).as("ss"))
    val d = col("n") * col("x").cast(dec) - col("s")
    daily.join(broadcast(stats), "event_type")
      .withColumn("is_anomaly",
        (d * d > lit(9).cast(dec) * (col("n") * col("ss") - col("s") * col("s")))
          .cast("long"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x").as("n_events"), col("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  private val SkewTopK = 20

  /** q123: HOT-KEY skew census — the diagnostic every join/groupBy
    * sizing decision at 100 TB starts from (and what
    * [[graft.operators.Skew.autoSalts]] automates at plan time): per
    * join key (user_id), the row count of the 20 hottest keys, each
    * key's corpus share in ppm, and its multiple of the mean key load
    * (`hot_x_mean_fp`, ×10⁶ fixed point) — "key 7 carries 80× the
    * average; salt it 8 ways". All exact int64 over one
    * map-side-combinable count; the totals frame (2 values) broadcasts.
    *
    * Scale shape: groupBy(user_id) count is the same shuffle the
    * skewed join itself would pay; top-20 is a TakeOrderedAndProject
    * (never a global sort); everything after the count is key-
    * cardinality sized.
    */
  def keySkewCensus(spark: SparkSession, dir: String): DataFrame = {
    val counts = graft.Caches.persisted(events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows")))
    val totals = counts.agg(sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("n_rows").desc, col("user_id")).limit(SkewTopK)
      .crossJoin(broadcast(totals))
      // decimal/hugeint: n_rows·n_keys is a product of two corpus-scale
      // counts (a 10¹⁰-row hot key × 10⁸ keys wraps int64 by 10⁴×); the
      // share numerator wraps at ~9×10¹² rows — both far below target
      // scale, so the ppm arithmetic rides wide unconditionally
      .withColumn("share_ppm",
        expr("(cast(1000000 as decimal(38,0)) * n_rows) div total_rows"))
      .withColumn("hot_x_mean_fp",
        expr("(cast(1000000 as decimal(38,0)) * n_rows * n_keys) div total_rows"))
      .orderBy(col("n_rows").desc, col("user_id"))
  }

  private val GroupQuantilePs = Seq(25L, 50L, 75L)

  /** q122: GROUPED exact quantiles — per event_type p25/p50/p75 of the
    * value metric (integer cents), the per-segment spread panel q61's
    * global quantiles don't give. Same collapsed-count discipline as
    * q114: ONE corpus shuffle into the (type, value, count) table,
    * then rank selection runs entirely on the value-cardinality frame
    * (window over distinct values per type, never rows); the 3-row
    * percentile relation broadcasts into the band filter. Rank is
    * `((n−1)·p) div 100 + 1` (quantile_disc — StatOps' convention).
    */
  def groupedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("c")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val n = counts.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    val cum = counts.withColumn("cum_end", sum(col("c")).over(w))
      .join(n, "event_type")
    val tr = expr("(n - 1) * p div 100 + 1")
    cum.join(broadcast(GroupQuantilePs.toDF("p")),
        col("cum_end") >= tr && col("cum_end") - col("c") < tr)
      .select(col("event_type"), col("p"), tr.as("target_rank"),
        col("v").as("value"))
      .orderBy(col("event_type"), col("p"))
  }

  private val RollingDays = 7

  /** q120: ROLLING ACTIVE USERS — per day, the exact distinct users
    * seen in the trailing 7-day window (the WAU curve every product
    * and every training-data freshness dashboard tracks). Rolling
    * DISTINCT is not additive, so no running sum applies; instead the
    * corpus collapses ONCE to the (day, user) distinct frame — the
    * only corpus-sized shuffle, map-side combinable — and the window
    * is a bounded-range self-enumeration of that collapsed frame:
    * each (day, user) row contributes to ≤7 window anchors via a
    * 7-row sequence explode (days are a dense integer grid), then one
    * distinct + count per anchor day. Anchors are restricted to days
    * the data actually contains (inner join against the day set).
    *
    * Scale shape: everything after the first collapse is
    * (active-users × 7)-sized — users per day, not events; no range
    * join, no per-day rescans, no window over raw rows.
    */
  def rollingActive(spark: SparkSession, dir: String): DataFrame = {
    val dayUser = events(spark, dir)
      .select(expr(s"unix_micros(date_trunc('day', ts)) div ${86400L * 1000000L}")
        .as("day"), col("user_id"))
      .distinct()
    val days = dayUser.select(col("day")).distinct()
    dayUser
      .select(explode(sequence(col("day"),
        col("day") + lit(RollingDays - 1))).as("anchor"), col("user_id"))
      .distinct()
      .join(days.withColumnRenamed("day", "anchor"), "anchor")
      .groupBy(col("anchor"))
      .agg(count(lit(1)).as("n_active_7d"))
      .select(date_format(timestamp_micros(col("anchor") * lit(86400L * 1000000L)),
        "yyyy-MM-dd").as("day"), col("n_active_7d"))
      .orderBy(col("day"))
  }

  /** q143: event-type ADOPTION overlap matrix — for every type pair,
    * how many users did both (plus each side's adoption and the
    * overlap as ppm of the smaller side): the feature-adoption
    * co-occurrence panel. The corpus collapses to the distinct
    * (user, type) frame first — ≤ #types rows per user — so the
    * user-keyed self-join fans out at most types² per user, bounded
    * regardless of event volume; the per-type adoption table
    * broadcasts back onto the #type-pair-row output.
    */
  def typeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = graft.Caches.persisted(events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct())
    val adoption = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val pairs = ut.select(col("user_id"), col("event_type").as("t1"))
      .join(ut.select(col("user_id"), col("event_type").as("t2")), "user_id")
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(adoption.select(col("event_type").as("t1"),
        col("n_users").as("n_users_1"))), "t1")
      .join(broadcast(adoption.select(col("event_type").as("t2"),
        col("n_users").as("n_users_2"))), "t2")
      .withColumn("overlap_ppm",
        expr("(1000000 * n_both) div least(n_users_1, n_users_2)"))
      .select(col("t1"), col("t2"), col("n_both"), col("n_users_1"),
        col("n_users_2"), col("overlap_ppm"))
      .orderBy(col("t1"), col("t2"))
  }

  /** q144: user ACTIVITY histogram — how many users fall in each
    * power-of-two event-count bucket (q126's integer-exact
    * `length(bin(x))` trick on the per-user counts): the degree
    * distribution that complements q123's top-k census — q123 names
    * the whales, this shows the whole body. Two map-side-combinable
    * aggregations, output ≤64 rows.
    */
  def userActivityHistogram(spark: SparkSession, dir: String): DataFrame = {
    val perUser = events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    perUser
      .select(col("n_events"),
        length(bin(col("n_events"))).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("sum_events"),
        min(col("n_events")).as("min_events"),
        max(col("n_events")).as("max_events"))
      .orderBy(col("bucket"))
  }

  /** q147: ROLLING volume + revenue — per day, events and exact
    * revenue cents in the trailing 7-day window: q120's additive
    * sibling (counts and sums ARE additive, so the corpus collapses
    * to DAY GRAIN first — one map-side-combinable groupBy — and only
    * day rows self-enumerate their ≤7 window anchors; everything
    * after the collapse is days-sized, even cheaper than q120's
    * (user × day) frame). Anchors restricted to days present in the
    * data, matching q120's frame.
    */
  def rollingVolume(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .select(expr(s"unix_micros(date_trunc('day', ts)) div ${86400L * 1000000L}")
        .as("day"), round(col("value") * 100).cast("long").as("v"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("rev"))
    val days = daily.select(col("day")).distinct()
    daily
      .select(explode(sequence(col("day"), col("day") + lit(6))).as("anchor"),
        col("n"), col("rev"))
      .join(days.withColumnRenamed("day", "anchor"), "anchor")
      .groupBy(col("anchor"))
      .agg(sum(col("n")).as("n_events_7d"), sum(col("rev")).as("revenue_cents_7d"))
      .select(date_format(timestamp_micros(col("anchor") * lit(86400L * 1000000L)),
        "yyyy-MM-dd").as("day"), col("n_events_7d"), col("revenue_cents_7d"))
      .orderBy(col("day"))
  }

  /** q148: per-type VALUE histogram — event values in power-of-two
    * cent buckets (q126's integer-exact `length(bin(x))` trick): the
    * distribution SHAPE that q122's three quantile points summarize,
    * per event_type — the panel that shows bimodality or a hard cap
    * that quantiles alone hide. One map-side-combinable groupBy on
    * (type, bucket); output ≤ types × 64 rows.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("event_type"), col("cents"),
        length(bin(col("cents"))).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy(col("event_type"), col("bucket"))

  private val MadK = 5L // flag |x - median| > 5 * MAD

  /** Per-group EXACT median over an integer metric, computed on the
    * VALUE-CARDINALITY frame: groupBy(key, v) collapses the corpus to
    * (key, distinct value, count) first — the only corpus-sized
    * shuffle, map-side combinable — and the rank-selection window runs
    * over that collapsed frame (≤ distinct-values rows per group, NOT
    * rows; a price metric has thousands of distinct cents no matter
    * how many billions of events carry them). Median is rank
    * `(n−1) div 2 + 1` (quantile_disc 0.5 — StatOps' convention), the
    * unique value whose cumulative band contains the rank.
    */
  private def groupedMedianInt(counts: DataFrame, key: String, v: String,
      medName: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(v))
    val n = counts.groupBy(col(key)).agg(sum(col("c")).as("n"))
    counts.withColumn("cum_end", sum(col("c")).over(w))
      .join(n, key)
      .withColumn("rk", expr("(n - 1) div 2 + 1"))
      .filter(col("cum_end") >= col("rk") && col("cum_end") - col("c") < col("rk"))
      .select(col(key), col(v).as(medName))
  }

  /** q114: robust ANOMALY GATE — per event_type median + median
    * absolute deviation (both exact, integer cents) and the
    * `|x − med| > 5·MAD` outlier census, the robust-z-score check a
    * metrics pipeline runs where mean/stddev would be dragged by the
    * very outliers it hunts. Two [[groupedMedianInt]] passes (value
    * median, then deviation median) + one counting aggregation;
    * `outlier_ppm` is the repo-standard truncating int64 division.
    *
    * Scale shape: each median pass shuffles the corpus once into a
    * map-side-combinable (type, value) count, then ranks on the
    * collapsed value-cardinality frame; the per-type median/MAD tables
    * broadcast (≤ #event_types rows) into the final census scan.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    madFromCounts(madCounts(events(spark, dir)))

  /** The (type, value-cents) count table — q114's ADDITIVE sufficient
    * statistic (the q116 seam again): per-batch tables union +
    * groupBy-sum into the corpus table exactly.
    */
  private def madCounts(ev: DataFrame): DataFrame =
    ev.select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("c"))

  /** Finalize the MAD census from the count table alone — after the one
    * corpus-collapsing shuffle in [[madCounts]], EVERYTHING here is
    * value-cardinality sized: the deviation distribution is derived by
    * re-keying the counts on |v − med| (weight-aware, no second corpus
    * pass), both medians rank-select on collapsed frames, and the
    * outlier census is a weighted sum over the counts.
    */
  private def madFromCounts(countsIn: DataFrame): DataFrame = {
    val counts = graft.Caches.persisted(countsIn)
    val med = groupedMedianInt(counts, "event_type", "v", "med")
    val dev = graft.Caches.persisted(
      counts.join(broadcast(med), "event_type")
        .select(col("event_type"), col("med"),
          abs(col("v") - col("med")).as("d"), col("c"))
        .groupBy(col("event_type"), col("med"), col("d"))
        .agg(sum(col("c")).as("c")))
    val mad = groupedMedianInt(dev, "event_type", "d", "mad")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("d") > lit(MadK) * col("mad"), col("c"))
          .otherwise(lit(0L))).as("n_outliers"))
      .withColumn("outlier_ppm", expr("(1000000 * n_outliers) div n"))
      .orderBy(col("event_type"))
  }

  /** q121: INCREMENTAL robust anomaly gate, oracle-gated — q114 through
    * the merge seam: three event_id-ranged batches each build their
    * (type, value-cents) count table ([[madCounts]]), the tables merge
    * by union + groupBy-sum, and the census finalized from the merged
    * table must hash-equal the one-shot q114 via q114's own oracle.
    * Exact medians over a stream for the price of a vocabulary-sized
    * state — the robust-stats member of the incremental family.
    */
  def streamMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id")))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    val merged = Seq(
      ev.filter(col("event_id") <= mx / 3),
      ev.filter(col("event_id") > mx / 3 && col("event_id") <= 2 * mx / 3),
      ev.filter(col("event_id") > 2 * mx / 3))
      .map(madCounts)
      .reduce(_ unionByName _)
      .groupBy(col("event_type"), col("v")).agg(sum(col("c")).as("c"))
    madFromCounts(merged)
  }

  /** q113: INCREMENTAL KMV maintenance, oracle-gated — the bottom-k
    * sibling of q96's HLL register gate and q106's scatter merge: the
    * events split into three event_id-ranged micro-batches, each keeps
    * its own ≤k bottom-hash set ([[graft.ext.SketchOps.kmvKeptHashes]]),
    * the sets union and re-finalize ([[graft.ext.SketchOps
    * .kmvFinalizeKept]] — KMV's defining mergeability), and the merged
    * sketch must hash-equal the one-shot batch q87 via q87's own
    * oracle. Proves the cross-day/streaming distinct-count path needs
    * only sketch-sized state, never the value set.
    */
  def streamKmv(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.SketchOps
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id")))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    val kept = Seq(
      ev.filter(col("event_id") <= mx / 3),
      ev.filter(col("event_id") > mx / 3 && col("event_id") <= 2 * mx / 3),
      ev.filter(col("event_id") > 2 * mx / 3))
      .map(SketchOps.kmvKeptHashes(_, Seq("event_type"), "user_id"))
      .reduce(_ unionByName _)
    val sketch = SketchOps.kmvFinalizeKept(kept, Seq("event_type"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sketch.join(exact, "event_type").orderBy(col("event_type"))
  }

  private val BalanceBuckets = 32L

  /** q134: hash-PARTITION balance audit — before committing a
    * partitioning/bucketing key at 100 TB, measure how evenly it
    * spreads: rows per `hash32(key) mod 32` bucket for the events
    * user_id key, plus each bucket's load as a ×10⁶ multiple of the
    * mean (`x_mean_fp`). Complements q123 (which finds the hot KEYS;
    * this measures the resulting BUCKET spread the shuffle actually
    * sees). The hash is the engine's md5-derived 32-bit
    * ([[graft.ext.TextOps.hash32]] — the sketches' hash), so the
    * oracle reproduces bucket assignment bit-for-bit, which a
    * Murmur3-based audit could not.
    *
    * Scale shape: one map-side-combinable groupBy on the derived
    * bucket (32 partials per input partition); the 1-row total
    * broadcasts. Output is exactly 32 rows.
    */
  def partitionBalance(spark: SparkSession, dir: String): DataFrame = {
    val b = events(spark, dir)
      .select(pmod(graft.ext.TextOps.hash32(
        concat(lit("part:"), col("user_id").cast("string"))),
        lit(BalanceBuckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val tot = b.agg(sum(col("n_rows")).as("total_rows"))
    b.crossJoin(broadcast(tot))
      .withColumn("x_mean_fp",
        // same wide-arithmetic treatment as q123: 10⁶·32·n_rows wraps
        // int64 at ~3×10¹¹ rows per bucket
        expr(s"(cast(1000000 as decimal(38,0)) * n_rows * $BalanceBuckets) div total_rows"))
      .orderBy(col("bucket"))
  }

  /** q131: REFERENTIAL-INTEGRITY audit — orphan census for the two
    * fact→dim edges (lineitem→orders, orders→customer): child rows
    * whose key has no parent, as count + ppm. The data-quality gate a
    * pipeline runs after every ingest/compaction before downstream
    * joins silently drop rows (an inner join on a corrupted edge
    * doesn't fail, it shrinks). A zero-orphan corpus makes the audit
    * MORE valuable, not less — the output proves the invariant.
    *
    * Scale shape: each edge is one left-anti equi-join on the join
    * key (the same shuffle the production join pays) feeding a 1-row
    * count; parent key sets never collect anywhere.
    */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: Column,
        parent: DataFrame, pkey: Column): DataFrame = {
      val orphans = child.join(parent, key === pkey, "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(broadcast(orphans))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
          // greatest(…,1): an EMPTY child table must yield ppm 0 in both
          // engines, not Spark-null vs DuckDB divide-by-zero error
          expr("(1000000 * n_orphans) div greatest(n_child, 1L)").as("orphan_ppm"))
    }
    edge("lineitem->orders",
        lineitem(spark, dir).select(col("l_orderkey")), col("l_orderkey"),
        orders(spark, dir).select(col("o_orderkey")), col("o_orderkey"))
      .unionByName(edge("orders->customer",
        orders(spark, dir).select(col("o_custkey")), col("o_custkey"),
        customer(spark, dir).select(col("c_custkey")), col("c_custkey")))
      .orderBy(col("edge"))
  }

  /** q129: OUT-OF-ORDER ingest audit — per zone (q110's row-group
    * proxy, ingest order), how far the zone's earliest event-time sits
    * BEHIND the maximum event-time already ingested in prior zones:
    * `late_us = max(0, runmax(prev zones' max_ts) − min_ts)`. The
    * distribution of `late_us` IS the watermark-delay sizing input —
    * a streaming job's allowed lateness must cover the observed
    * disorder or q10/q60's watermarks silently drop rows.
    *
    * Scale shape: the corpus collapses to zone grain first (one
    * map-side-combinable groupBy); the running max over the zones
    * frame goes through [[graft.ext.PrefixOps.runningMaxExclusive]] —
    * the two-pass range-partitioned prefix scheme (numParts-way
    * parallel, O(numParts) driver longs), so the zone path is
    * scale-uniform with q130/q133 instead of carrying the last
    * unpartitioned WindowExec in the engine.
    */
  def ingestDisorder(spark: SparkSession, dir: String): DataFrame = {
    val zones = events(spark, dir)
      .select(expr(s"event_id div $ZoneRows").as("zone"),
        unix_micros(col("ts")).as("ts_us"))
      .groupBy(col("zone"))
      .agg(min(col("ts_us")).as("min_ts_us"), max(col("ts_us")).as("max_ts_us"))
    graft.ext.PrefixOps
      .runningMaxExclusive(zones, Seq("zone"), "max_ts_us", maxName = "pm")
      .select(col("zone"), col("min_ts_us"), col("max_ts_us"),
        coalesce(col("pm"), col("min_ts_us")).as("prev_max_ts_us"),
        greatest(lit(0L), coalesce(col("pm") - col("min_ts_us"), lit(0L)))
          .as("late_us"),
        (coalesce(col("pm") - col("min_ts_us"), lit(0L)) > 0L)
          .cast("long").as("is_disordered"))
      .orderBy(col("zone"))
  }

  private val LagPs = Seq(25, 50, 75, 90, 99)

  /** q128: CONVERSION-LAG quantiles — the exact p25/p50/p75/p90/p99 of
    * each user's first-view → first-purchase delay in epoch
    * microseconds, the latency distribution behind every funnel SLA
    * ("half convert within X, the p99 takes Y"). Lag construction is
    * the q84 funnel shape — two pushed type-filters, two groupBy-mins,
    * one user-keyed equi-join, integer subtraction — and the
    * distribution goes through the two-pass exact-quantile operator
    * ([[graft.ext.StatOps.exactQuantiles]]): no global sort, no
    * per-user window, O(parts) driver traffic.
    */
  def conversionLags(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("ts_us")))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_buy"))
    val lags = v.join(p, "user_id")
      .filter(col("t_buy") >= col("t_view"))
      .select((col("t_buy") - col("t_view")).as("lag_us"))
    graft.ext.StatOps.exactQuantiles(lags, "lag_us", LagPs).orderBy(col("p"))
  }

  /** q127: sketch ERROR calibration panel — the HLL (q62) and KMV
    * (q87) distinct estimates side by side with the exact count and
    * each sketch's absolute error in ppm, per event_type: the table
    * an engineer reads before choosing which sketch (and which m/k)
    * to deploy at 100 TB, produced by the engine itself instead of a
    * notebook. Error is `(10⁶·|est − exact|) div exact` — kept
    * non-negative so Spark's truncate-toward-zero `div` and DuckDB's
    * flooring `//` agree.
    *
    * Scale shape: both sketch subtrees are the already-gated q62/q87
    * shapes (register/kept-set state, map-side combinable); the exact
    * side is the one countDistinct they approximate (gate
    * instrumentation — at production scale you drop it and keep the
    * two sketch columns). Three #type-row frames meet in equi-joins.
    */
  def sketchErrorPanel(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.SketchOps
    val ev = graft.Caches.persisted(events(spark, dir)
      .select(col("event_type"), col("user_id")))
    val hll = SketchOps.hllDistinct(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), col("estimate").as("hll_est"))
    val kmv = SketchOps.kmvDistinct(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), col("est_distinct").as("kmv_est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    exact.join(hll, "event_type").join(kmv, "event_type")
      .withColumn("hll_err_ppm",
        expr("(1000000 * abs(hll_est - exact_distinct)) div exact_distinct"))
      .withColumn("kmv_err_ppm",
        expr("(1000000 * abs(kmv_est - exact_distinct)) div exact_distinct"))
      .orderBy(col("event_type"))
  }

  /** q84: greedy ordered FUNNEL over the event stream — the classic
    * product-analytics sequence operator (view → click → purchase):
    * stage 1 is each user's earliest view; stage k>1 is the earliest
    * stage-k event STRICTLY AFTER the user's stage-(k−1) time. Output
    * is the per-stage census (users remaining + total stage-to-stage
    * lag in exact epoch microseconds — integer arithmetic, so both
    * engines land the identical sums).
    *
    * Scale shape: no per-user window/sort anywhere — each stage is one
    * type-filtered scan (predicate pushed to parquet), one user-keyed
    * equi-join against the previous stage's 1-row-per-user frame, and
    * one groupBy-min; all three stages shuffle on the SAME user_id
    * key, so a co-partitioned layout (or AQE exchange reuse) makes the
    * chain one-shuffle deep. The alternative — collect each user's
    * full event list and walk it — serializes a 10⁸-event user through
    * one task; the min-per-stage formulation has no such hot key.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
    def stageRow(df: DataFrame, stage: Long, name: String, lag: Column): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
          coalesce(sum(lag), lit(0L)).as("sum_lag_us"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_users"), col("sum_lag_us"))
    stageRow(v, 1L, "view", lit(0L))
      .unionByName(stageRow(c, 2L, "click", unix_micros(col("t2")) - unix_micros(col("t1"))))
      .unionByName(stageRow(p, 3L, "purchase", unix_micros(col("t3")) - unix_micros(col("t2"))))
      .orderBy(col("stage"))
  }

  /** q85: retention COHORT matrix over the event stream — the second
    * classic product-analytics operator (q84 is the funnel): cohort =
    * each user's first-signup day; every later activity day contributes
    * the user to cell (cohort_day, day_offset). Offsets are exact
    * integer arithmetic on epoch microseconds (both days are
    * `date_trunc('day')` instants, so the difference is an exact
    * 86 400 000 000 multiple — the double division is exact and both
    * engines truncate to the identical bigint).
    *
    * Scale shape: one pushed signup scan → per-user min (groupBy), one
    * user-keyed equi-join back to the activity stream, then ONE
    * two-key aggregate with an exact distinct-user count — Spark plans
    * count(DISTINCT) as a two-level partial-then-merge expand, never a
    * per-cohort collect; the matrix itself is O(days²) rows, tiny at
    * any corpus scale.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(date_trunc("day", min(col("ts"))).as("cd"))
    ev.select(col("user_id"), date_trunc("day", col("ts")).as("ad"))
      .join(cohort, "user_id")
      .filter(col("ad") >= col("cd"))
      .select(col("user_id"), col("cd"),
        ((unix_micros(col("ad")) - unix_micros(col("cd"))) / lit(dayUs))
          .cast("long").as("day_offset"))
      .groupBy(col("cd"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active_users"))
      .select(date_format(col("cd"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q139: REPEAT-PURCHASE gap quantiles — the exact distribution of
    * the time between a user's consecutive purchases (p25/p50/p75/p90/
    * p99 in epoch µs): q128 measures first-conversion latency, this
    * measures the repeat cycle — the re-engagement number. Gaps come
    * from a lag window PARTITIONED PER USER over the type-filtered
    * purchase stream (bounded by one user's purchase count — the q88
    * transition-window shape, never a global window), then the gap set
    * goes through the two-pass exact-quantile operator.
    */
  def purchaseGapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val p = events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = p.withColumn("prev", lag(col("ts_us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("ts_us") - col("prev")).as("gap_us"))
    graft.ext.StatOps.exactQuantiles(gaps, "gap_us", LagPs).orderBy(col("p"))
  }

  /** q137: cohort REVENUE matrix (the LTV curve) — q85's retention
    * matrix with money on it: per signup-day cohort and day offset,
    * purchase count, distinct buyers, and exact revenue in integer
    * cents (`sum(round(value·100))` — order-independent int64, so
    * both engines land the identical sum where a double sum would
    * drift in the last ulps). Same scale shape as q85: one cohort
    * groupBy-min, one user-keyed equi-join, one (cohort, offset)
    * aggregate — no per-user window anywhere.
    */
  def cohortRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"),
        round(col("value") * 100).cast("long").as("v"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(date_trunc("day", min(col("ts"))).as("cd"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("v"), date_trunc("day", col("ts")).as("ad"))
      .join(cohort, "user_id")
      .filter(col("ad") >= col("cd"))
      .select(col("user_id"), col("v"), col("cd"),
        ((unix_micros(col("ad")) - unix_micros(col("cd"))) / lit(dayUs))
          .cast("long").as("day_offset"))
      .groupBy(col("cd"), col("day_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_buyers"),
        sum(col("v")).as("revenue_cents"))
      .select(date_format(col("cd"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_purchases"), col("n_buyers"),
        col("revenue_cents"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private val ZoneRows = 512L            // rows per zone (row-group proxy)
  private val ZoneHiValue = 400.0        // audit predicate: value > 400
  private val ZoneStaleUs = 86400L * 1000000L // audit predicate: last 1 day

  /** q110: ZONE-MAP build + data-skipping audit — the per-row-group
    * min/max/count statistics a lakehouse table format (parquet footer,
    * Delta/Iceberg manifests) keeps so scans can skip data without
    * reading it. Zones are fixed-width `event_id div 512` ranges (the
    * row-group proxy: at 100 TB a zone IS a parquet row group and this
    * groupBy IS the stats-collection pass of an OPTIMIZE/compaction
    * job). Per zone: row count, min/max of ts (µs)/value/user_id,
    * distinct event_type count — plus a SELF-AUDITING pruning check for
    * two canonical predicates: `value > 400` (prune_value_hi: the
    * zone's max proves no row can match) and "last 1 day"
    * (prune_stale: the zone closed before global-max-ts − 1 d).
    * `n_match_hi` carries the ground truth: a zone with
    * prune_value_hi=1 must show n_match_hi=0, so the oracle re-proves
    * the skipping is sound, not just computed.
    *
    * The fixture's events are time-ordered by event_id (corr ≈ 1.0, as
    * ingest order is at scale), so the staleness audit shows the real
    * effect: 18/20 zones prunable at sf0.01 — the reason time-travel
    * queries on chronologically-laid-out data touch O(result) bytes,
    * not O(corpus). The value audit shows the converse: an unclustered
    * column prunes only where the tail value happens to be absent.
    *
    * Scale shape: ONE map-side-combinable groupBy on a derived key
    * (shuffle carries one partial row per zone per input partition)
    * plus a 1-row global bound broadcast into a flag projection. No
    * window, no second corpus pass.
    */
  def zonemapStats(spark: SparkSession, dir: String): DataFrame =
    zoneFinalize(Seq(zoneState(events(spark, dir))))

  /** The zone map's ADDITIVE state at (zone, event_type) grain — every
    * column is a plain sum / min / max, so states from independent
    * micro-batches merge exactly even when a batch boundary splits a
    * zone. The extra grain key is what keeps `n_types` mergeable
    * (a per-zone countDistinct partial would not be); state size is
    * zones × #event_types, corpus-independent.
    */
  private def zoneState(ev: DataFrame): DataFrame =
    ev.select(expr(s"event_id div $ZoneRows").as("zone"),
        unix_micros(col("ts")).as("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .groupBy(col("zone"), col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ts_us")).as("min_ts_us"), max(col("ts_us")).as("max_ts_us"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        sum((col("value") > lit(ZoneHiValue)).cast("long")).as("n_match_hi"))

  /** Merge zone states and finalize to the q110 output: re-aggregate at
    * (zone, event_type) grain (sums add, mins/maxs fold), collapse to
    * zones (`n_types` = surviving grain rows), and derive the global
    * staleness bound FROM THE STATE ITSELF (max over zone maxima) — no
    * second corpus pass anywhere; everything after [[zoneState]]
    * shuffles state-sized frames only.
    */
  private def zoneFinalize(states: Seq[DataFrame]): DataFrame = {
    val zones = states.reduce(_ unionByName _)
      .groupBy(col("zone"), col("event_type"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("min_ts_us")).as("min_ts_us"), max(col("max_ts_us")).as("max_ts_us"),
        min(col("min_value")).as("min_value"), max(col("max_value")).as("max_value"),
        min(col("min_user")).as("min_user"), max(col("max_user")).as("max_user"),
        sum(col("n_match_hi")).as("n_match_hi"))
      .groupBy(col("zone"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("min_ts_us")).as("min_ts_us"), max(col("max_ts_us")).as("max_ts_us"),
        min(col("min_value")).as("min_value"), max(col("max_value")).as("max_value"),
        min(col("min_user")).as("min_user"), max(col("max_user")).as("max_user"),
        count(lit(1)).as("n_types"),
        sum(col("n_match_hi")).as("n_match_hi"))
    val bounds = zones.agg(max(col("max_ts_us")).as("g_max_ts_us"))
    zones.crossJoin(broadcast(bounds))
      .withColumn("prune_value_hi",
        (col("max_value") <= lit(ZoneHiValue)).cast("long"))
      .withColumn("prune_stale",
        (col("max_ts_us") < col("g_max_ts_us") - lit(ZoneStaleUs)).cast("long"))
      .drop("g_max_ts_us")
      .orderBy(col("zone"))
  }

  private val CompactTargetRows = 2048L

  /** q141: COMPACTION plan — the planning half of an OPTIMIZE job,
    * fed by the q110 zone map: greedily pack consecutive zones into
    * target files of ~2048 rows (stride-crossing on the zones' row-
    * count prefix sum — q115's arithmetic applied to storage), then
    * emit the per-file manifest: zone span, exact row count, and a
    * fill factor in ppm of target. Consecutive packing preserves the
    * table's physical order, so the time-clustering that makes q110's
    * staleness pruning work survives the rewrite.
    *
    * Scale shape: operates on the ZONES frame only (corpus/zone_rows
    * rows); the prefix sum goes through
    * [[graft.ext.PrefixOps.groupedRunningAgg]] (one constant group —
    * the whole-frame total order is the degenerate stratum), replacing
    * the last single-task unpartitioned window; the rollup is one
    * groupBy(file_id).
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val zones = events(spark, dir)
      .select(expr(s"event_id div $ZoneRows").as("zone"))
      .groupBy(col("zone")).agg(count(lit(1)).as("n_rows"))
      .withColumn("g", lit(0L))
    graft.ext.PrefixOps
      .groupedRunningAgg(zones, Seq("g"), Seq("zone"),
        sumCol = Some("n_rows"), sumName = "cum")
      .drop("g", "rank")
      .withColumn("file_id", expr(s"(cum - n_rows) div $CompactTargetRows"))
      .groupBy(col("file_id"))
      .agg(min(col("zone")).as("zone_from"), max(col("zone")).as("zone_to"),
        count(lit(1)).as("n_zones"), sum(col("n_rows")).as("n_rows"))
      .withColumn("fill_ppm",
        expr(s"(1000000 * n_rows) div $CompactTargetRows"))
      .orderBy(col("file_id"))
  }

  /** q118: INCREMENTAL zone-map maintenance, oracle-gated — the
    * lakehouse stats layer as a streaming structure: three event_id-
    * ranged micro-batches (boundaries deliberately NOT zone-aligned —
    * mx/3 splits a zone across batches) each build their own
    * [[zoneState]], the states merge ([[zoneFinalize]] — sums add,
    * extrema fold, the grain keeps distinct-type counting exact), and
    * the result must hash-equal the one-shot batch q110 via q110's own
    * oracle. This is how table-format stats actually update at 100 TB:
    * per-commit partial stats folded into the manifest, never a
    * corpus rescan.
    */
  def streamZonemap(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(events(spark, dir))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    zoneFinalize(Seq(
      ev.filter(col("event_id") <= mx / 3),
      ev.filter(col("event_id") > mx / 3 && col("event_id") <= 2 * mx / 3),
      ev.filter(col("event_id") > 2 * mx / 3)).map(zoneState))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_zonemap_stats" -> zonemapStats _,
    "q85_retention_cohorts" -> retentionCohorts _,
    "q84_funnel_stages" -> funnelStages _,
    "q63_interval_join" -> intervalAttribution _,
    "q62_hll_distinct" -> hllDistinct _,
    "q87_kmv_distinct" -> kmvDistinct _,
    "q88_event_transitions" -> eventTransitions _,
    "q89_stream_sessions" -> streamSessions _,
    "q92_decayed_trend" -> decayedTrend _,
    "q93_stream_funnel" -> streamFunnel _,
    "q96_stream_hll" -> streamHll _,
    "q113_stream_kmv" -> streamKmv _,
    "q127_sketch_errors" -> sketchErrorPanel _,
    "q128_conversion_lags" -> conversionLags _,
    "q129_ingest_disorder" -> ingestDisorder _,
    "q131_fk_orphans" -> fkOrphans _,
    "q134_partition_balance" -> partitionBalance _,
    "q137_cohort_revenue" -> cohortRevenue _,
    "q139_purchase_gaps" -> purchaseGapQuantiles _,
    "q141_compaction_plan" -> compactionPlan _,
    "q143_type_overlap" -> typeOverlap _,
    "q144_user_activity_histogram" -> userActivityHistogram _,
    "q147_rolling_volume" -> rollingVolume _,
    "q148_value_histogram" -> valueHistogram _,
    "q114_mad_outliers" -> madOutliers _,
    "q116_stream_quantiles" -> streamQuantiles _,
    "q117_winsorized_stats" -> winsorizedStats _,
    "q120_rolling_active" -> rollingActive _,
    "q121_stream_mad" -> streamMad _,
    "q122_grouped_quantiles" -> groupedQuantiles _,
    "q123_key_skew_census" -> keySkewCensus _,
    "q124_volume_anomaly" -> volumeAnomaly _,
    "q125_bucketed_join" -> bucketedJoin _,
    "q118_stream_zonemap" -> streamZonemap _,
    "q102_scd2_build" -> scd2Build _,
    "q60_sessionize" -> sessionize _,
    "q61_exact_quantiles" -> exactQuantiles _,
    "q53_asof_join" -> asofPurchaseView _,
    "q01_pricing_summary" -> pricingSummary _,
    "q02_filter_ranges" -> filterRanges _,
    "q03_membership" -> membership _,
    "q04_topk" -> topK _,
    "q05_star_join" -> starJoin _,
    "q06_batch_stats" -> batchStats _,
    "q07_frequency" -> frequency _,
    "q08_topk_per_group" -> topKPerGroup _,
    "q09_proximity_band" -> proximityBand _,
    "q10_ohlc_hourly" -> ohlcHourly _,
    "q43_tick_bars" -> tickBars _,
    "q44_scalar_functions" -> scalarFunctions _,
    "q45_output_gate" -> outputGate _)

  private val oraclesBase: Map[String, String] = Map(
    "q148_value_histogram" ->
      """WITH v AS (
        |  SELECT event_type, cast(round(value * 100) AS bigint) AS cents
        |  FROM events)
        |SELECT event_type, length(bin(cents))::bigint AS bucket,
        |  count(*)::bigint AS n_events, sum(cents)::bigint AS sum_cents,
        |  min(cents)::bigint AS min_cents, max(cents)::bigint AS max_cents
        |FROM v GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "q147_rolling_volume" ->
      s"""WITH d AS (
         |  SELECT epoch_us(date_trunc('day', ts)) // ${86400L * 1000000L} AS day,
         |    count(*)::bigint AS n,
         |    sum(cast(round(value * 100) AS bigint))::bigint AS rev
         |  FROM events GROUP BY 1),
         |days AS (SELECT DISTINCT day FROM d),
         |x AS (
         |  SELECT d.day + g.i AS anchor, d.n, d.rev
         |  FROM d CROSS JOIN (SELECT unnest(range(7)) AS i) g)
         |SELECT strftime(epoch_ms(x.anchor * 86400000), '%Y-%m-%d') AS day,
         |  sum(x.n)::bigint AS n_events_7d,
         |  sum(x.rev)::bigint AS revenue_cents_7d
         |FROM x JOIN days ON days.day = x.anchor
         |GROUP BY 1 ORDER BY day""".stripMargin,
    "q143_type_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |a AS (SELECT event_type, count(*)::bigint AS n_users FROM ut GROUP BY 1),
        |p AS (
        |  SELECT x.event_type AS t1, y.event_type AS t2,
        |    count(*)::bigint AS n_both
        |  FROM ut x JOIN ut y
        |    ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT p.t1, p.t2, p.n_both,
        |  a1.n_users AS n_users_1, a2.n_users AS n_users_2,
        |  ((1000000 * p.n_both) // least(a1.n_users, a2.n_users))::bigint AS overlap_ppm
        |FROM p JOIN a a1 ON a1.event_type = p.t1
        |JOIN a a2 ON a2.event_type = p.t2
        |ORDER BY p.t1, p.t2""".stripMargin,
    "q144_user_activity_histogram" ->
      """WITH u AS (
        |  SELECT user_id, count(*)::bigint AS n_events
        |  FROM events GROUP BY 1)
        |SELECT length(bin(n_events))::bigint AS bucket,
        |  count(*)::bigint AS n_users, sum(n_events)::bigint AS sum_events,
        |  min(n_events)::bigint AS min_events, max(n_events)::bigint AS max_events
        |FROM u GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q141_compaction_plan" ->
      s"""WITH z AS (
         |  SELECT event_id // $ZoneRows AS zone, count(*)::bigint AS n_rows
         |  FROM events GROUP BY 1),
         |c AS (
         |  SELECT zone, n_rows,
         |    sum(n_rows) OVER (ORDER BY zone
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS cum
         |  FROM z),
         |f AS (
         |  SELECT zone, n_rows,
         |    ((cum - n_rows) // $CompactTargetRows)::bigint AS file_id
         |  FROM c)
         |SELECT file_id, min(zone)::bigint AS zone_from,
         |  max(zone)::bigint AS zone_to, count(*)::bigint AS n_zones,
         |  sum(n_rows)::bigint AS n_rows,
         |  ((1000000 * sum(n_rows)) // $CompactTargetRows)::bigint AS fill_ppm
         |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin,
    "q139_purchase_gaps" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS v
        |  FROM p),
        |l AS (SELECT v FROM g WHERE v IS NOT NULL),
        |c AS (SELECT v, count(*)::bigint AS c FROM l GROUP BY 1),
        |o AS (SELECT v, c, sum(c) OVER (ORDER BY v)::bigint AS cum_end FROM c),
        |n AS (SELECT sum(c)::bigint AS n FROM c),
        |r AS (
        |  SELECT p2.p::bigint AS p,
        |    (floor((n.n - 1) * p2.p / 100) + 1)::bigint AS target_rank
        |  FROM (SELECT unnest([25, 50, 75, 90, 99]) AS p) p2 CROSS JOIN n)
        |SELECT r.p, r.target_rank, min(o.v) AS value
        |FROM r JOIN o
        |  ON o.cum_end >= r.target_rank AND o.cum_end - o.c < r.target_rank
        |GROUP BY 1, 2 ORDER BY p""".stripMargin,
    "q137_cohort_revenue" ->
      """WITH s AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cd FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id,
        |    cast(round(e.value * 100) AS bigint) AS v,
        |    s.cd, date_trunc('day', e.ts) AS ad
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND date_trunc('day', e.ts) >= s.cd)
        |SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
        |  ((epoch_us(ad) - epoch_us(cd)) / 86400000000)::bigint AS day_offset,
        |  count(*)::bigint AS n_purchases,
        |  count(DISTINCT user_id)::bigint AS n_buyers,
        |  sum(v)::bigint AS revenue_cents
        |FROM p GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q134_partition_balance" ->
      s"""WITH b AS (
         |  SELECT ('0x' || substr(md5('part:' || user_id), 1, 8))::bigint
         |    % $BalanceBuckets AS bucket
         |  FROM events),
         |c AS (SELECT bucket, count(*)::bigint AS n_rows FROM b GROUP BY 1),
         |t AS (SELECT sum(n_rows)::bigint AS total_rows FROM c)
         |SELECT c.bucket, c.n_rows, t.total_rows,
         |  ((1000000::hugeint * c.n_rows * $BalanceBuckets) // t.total_rows)::bigint AS x_mean_fp
         |FROM c, t ORDER BY c.bucket""".stripMargin,
    "q131_fk_orphans" ->
      """WITH a AS (
        |  SELECT 'lineitem->orders' AS edge,
        |    (SELECT count(*) FROM lineitem)::bigint AS n_child,
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))::bigint AS n_orphans),
        |b AS (
        |  SELECT 'orders->customer' AS edge,
        |    (SELECT count(*) FROM orders)::bigint AS n_child,
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))::bigint AS n_orphans),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT edge, n_child, n_orphans,
        |  ((1000000 * n_orphans) // greatest(n_child, 1))::bigint AS orphan_ppm
        |FROM u ORDER BY edge""".stripMargin,
    "q129_ingest_disorder" ->
      s"""WITH z AS (
         |  SELECT event_id // $ZoneRows AS zone,
         |    min(epoch_us(ts))::bigint AS min_ts_us,
         |    max(epoch_us(ts))::bigint AS max_ts_us
         |  FROM events GROUP BY 1),
         |w AS (
         |  SELECT *, max(max_ts_us) OVER (ORDER BY zone
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM z)
         |SELECT zone, min_ts_us, max_ts_us,
         |  coalesce(pm, min_ts_us)::bigint AS prev_max_ts_us,
         |  greatest(0, coalesce(pm - min_ts_us, 0))::bigint AS late_us,
         |  (CASE WHEN coalesce(pm - min_ts_us, 0) > 0
         |        THEN 1 ELSE 0 END)::bigint AS is_disordered
         |FROM w ORDER BY zone""".stripMargin,
    "q128_conversion_lags" ->
      """WITH e AS (
        |  SELECT event_type, user_id, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |pp AS (SELECT user_id, min(ts_us) AS t_buy FROM e
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT t_buy - t_view AS v FROM v JOIN pp USING (user_id)
        |      WHERE t_buy >= t_view),
        |c AS (SELECT v, count(*)::bigint AS c FROM l GROUP BY 1),
        |o AS (SELECT v, c, sum(c) OVER (ORDER BY v)::bigint AS cum_end FROM c),
        |n AS (SELECT sum(c)::bigint AS n FROM c),
        |r AS (
        |  SELECT p::bigint AS p,
        |    (floor((n.n - 1) * p / 100) + 1)::bigint AS target_rank
        |  FROM (SELECT unnest([25, 50, 75, 90, 99]) AS p) CROSS JOIN n)
        |SELECT r.p, r.target_rank, min(o.v) AS value
        |FROM r JOIN o
        |  ON o.cum_end >= r.target_rank AND o.cum_end - o.c < r.target_rank
        |GROUP BY 1, 2 ORDER BY p""".stripMargin,
    "q127_sketch_errors" ->
      """WITH hh AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5('hll:' || user_id), 1, 15))::bigint AS h
        |  FROM events),
        |obs AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE instr(lpad(bin(h // 64), 54, '0'), '1') END AS rho
        |  FROM hh),
        |regs0 AS (SELECT event_type, bucket, max(rho)::bigint AS r
        |          FROM obs GROUP BY 1, 2),
        |frame AS (SELECT DISTINCT event_type, b AS bucket
        |          FROM hh CROSS JOIN (SELECT unnest(range(64)) AS b)),
        |regs AS (
        |  SELECT frame.event_type, frame.bucket, coalesce(r, 0)::bigint AS r
        |  FROM frame LEFT JOIN regs0
        |    ON regs0.event_type = frame.event_type AND regs0.bucket = frame.bucket),
        |hagg AS (
        |  SELECT event_type,
        |    sum(1::bigint << cast(55 - r AS int))::bigint AS z
        |  FROM regs GROUP BY 1),
        |hest AS (
        |  SELECT event_type,
        |    floor(2905460736.0::double * 36028797018963968.0::double
        |          / 1000000.0::double / z::double)::bigint AS hll_est
        |  FROM hagg),
        |kh AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5('kmv:' || user_id), 1, 8))::bigint AS h
        |  FROM events),
        |kr AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM kh),
        |ks AS (
        |  SELECT event_type, count(*)::bigint AS n_kept,
        |    max(h)::bigint AS kth_hash
        |  FROM kr WHERE rn <= 64 GROUP BY event_type),
        |kest AS (
        |  SELECT event_type,
        |    (CASE WHEN n_kept < 64 THEN n_kept
        |          ELSE (63::bigint * 4294967296) // greatest(kth_hash, 1) END
        |    )::bigint AS kmv_est
        |  FROM ks),
        |ex AS (SELECT event_type, count(DISTINCT user_id)::bigint AS exact_distinct
        |       FROM events GROUP BY 1)
        |SELECT ex.event_type, ex.exact_distinct, hest.hll_est, kest.kmv_est,
        |  ((1000000 * abs(hest.hll_est - ex.exact_distinct))
        |    // ex.exact_distinct)::bigint AS hll_err_ppm,
        |  ((1000000 * abs(kest.kmv_est - ex.exact_distinct))
        |    // ex.exact_distinct)::bigint AS kmv_err_ppm
        |FROM ex JOIN hest USING (event_type) JOIN kest USING (event_type)
        |ORDER BY ex.event_type""".stripMargin,
    "q125_bucketed_join" ->
      s"""SELECT o_orderpriority, count(*)::bigint AS n_items,
         |  ${Tables.sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q124_volume_anomaly" ->
      s"""WITH d AS (
         |  SELECT event_type, date_trunc('day', ts) AS day,
         |    count(*)::bigint AS x
         |  FROM events GROUP BY 1, 2),
         |st AS (
         |  SELECT event_type, count(*)::hugeint AS n,
         |    sum(x)::hugeint AS s,
         |    sum(x::hugeint * x::hugeint)::hugeint AS ss
         |  FROM d GROUP BY 1)
         |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
         |  d.x AS n_events,
         |  (CASE WHEN (st.n * d.x - st.s) * (st.n * d.x - st.s)
         |          > 9 * (st.n * st.ss - st.s * st.s)
         |        THEN 1 ELSE 0 END)::bigint AS is_anomaly
         |FROM d JOIN st USING (event_type) ORDER BY 1, 2""".stripMargin,
    "q123_key_skew_census" ->
      s"""WITH c AS (
         |  SELECT user_id, count(*)::bigint AS n_rows
         |  FROM events GROUP BY 1),
         |t AS (
         |  SELECT sum(n_rows)::bigint AS total_rows,
         |    count(*)::bigint AS n_keys FROM c)
         |SELECT c.user_id, c.n_rows, t.total_rows, t.n_keys,
         |  ((1000000::hugeint * c.n_rows) // t.total_rows)::bigint AS share_ppm,
         |  ((1000000::hugeint * c.n_rows * t.n_keys) // t.total_rows)::bigint AS hot_x_mean_fp
         |FROM c, t ORDER BY c.n_rows DESC, c.user_id LIMIT $SkewTopK""".stripMargin,
    "q122_grouped_quantiles" ->
      s"""WITH vv AS (
         |  SELECT event_type, cast(round(value * 100) AS bigint) AS v
         |  FROM events),
         |c AS (SELECT event_type, v, count(*)::bigint AS c FROM vv GROUP BY 1, 2),
         |o AS (
         |  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY v)::bigint AS cum_end
         |  FROM c),
         |n AS (SELECT event_type, sum(c)::bigint AS n FROM c GROUP BY 1),
         |r AS (
         |  SELECT n.event_type, p::bigint AS p,
         |    (((n.n - 1) * p) // 100 + 1)::bigint AS tr
         |  FROM (SELECT unnest([${GroupQuantilePs.mkString(", ")}]) AS p)
         |  CROSS JOIN n)
         |SELECT r.event_type, r.p, r.tr AS target_rank, min(o.v) AS value
         |FROM r JOIN o ON o.event_type = r.event_type
         |  AND o.cum_end >= r.tr AND o.cum_end - o.c < r.tr
         |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
    "q120_rolling_active" ->
      s"""WITH du AS (
         |  SELECT DISTINCT
         |    epoch_us(date_trunc('day', ts)) // ${86400L * 1000000L} AS day,
         |    user_id
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM du),
         |x AS (
         |  SELECT DISTINCT du.day + g.i AS anchor, du.user_id
         |  FROM du CROSS JOIN (SELECT unnest(range($RollingDays)) AS i) g)
         |SELECT strftime(epoch_ms(x.anchor * 86400000), '%Y-%m-%d') AS day,
         |  count(*)::bigint AS n_active_7d
         |FROM x JOIN days ON days.day = x.anchor
         |GROUP BY 1 ORDER BY day""".stripMargin,
    "q117_winsorized_stats" ->
      s"""WITH c AS (
         |  SELECT l_extendedprice AS v, count(*)::bigint AS c
         |  FROM lineitem GROUP BY 1),
         |o AS (SELECT v, c, sum(c) OVER (ORDER BY v)::bigint AS cum_end FROM c),
         |n AS (SELECT sum(c)::bigint AS n FROM c),
         |r AS (
         |  SELECT p::bigint AS p,
         |    (floor((n.n - 1) * p / 100) + 1)::bigint AS tr
         |  FROM (SELECT unnest([1, 99]) AS p) CROSS JOIN n),
         |qq AS (
         |  SELECT r.p, min(o.v) AS value FROM r JOIN o
         |    ON o.cum_end >= r.tr AND o.cum_end - o.c < r.tr GROUP BY 1),
         |b AS (
         |  SELECT max(CASE WHEN p = 1 THEN value END) AS lo,
         |    max(CASE WHEN p = 99 THEN value END) AS hi FROM qq),
         |w AS (
         |  SELECT least(greatest(l_extendedprice, b.lo), b.hi) AS w,
         |    l_extendedprice AS x, b.lo, b.hi
         |  FROM lineitem, b)
         |SELECT lo, hi, count(*)::bigint AS n,
         |  sum(CASE WHEN x < lo THEN 1 ELSE 0 END)::bigint AS n_clip_lo,
         |  sum(CASE WHEN x > hi THEN 1 ELSE 0 END)::bigint AS n_clip_hi,
         |  ${Tables.sqlExactSum("w", 2)} AS sum_w,
         |  ${Tables.sqlExactAvg("w", 2)} AS avg_w
         |FROM w GROUP BY lo, hi""".stripMargin,
    "q114_mad_outliers" ->
      s"""WITH v AS (
         |  SELECT event_type, cast(round(value * 100) AS bigint) AS v
         |  FROM events),
         |dc AS (SELECT event_type, v, count(*)::bigint AS c FROM v GROUP BY 1, 2),
         |cc AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum_end FROM dc),
         |nn AS (SELECT event_type, sum(c)::bigint AS n FROM dc GROUP BY 1),
         |med AS (
         |  SELECT cc.event_type, cc.v AS med FROM cc JOIN nn USING (event_type)
         |  WHERE cum_end >= (n - 1) // 2 + 1 AND cum_end - c < (n - 1) // 2 + 1),
         |d AS (
         |  SELECT v.event_type, abs(v.v - med.med) AS d, med.med
         |  FROM v JOIN med USING (event_type)),
         |dc2 AS (SELECT event_type, d, count(*)::bigint AS c FROM d GROUP BY 1, 2),
         |cc2 AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum_end FROM dc2),
         |nn2 AS (SELECT event_type, sum(c)::bigint AS n FROM dc2 GROUP BY 1),
         |mad AS (
         |  SELECT cc2.event_type, cc2.d AS mad FROM cc2 JOIN nn2 USING (event_type)
         |  WHERE cum_end >= (n - 1) // 2 + 1 AND cum_end - c < (n - 1) // 2 + 1)
         |SELECT d.event_type, d.med, mad.mad, count(*)::bigint AS n,
         |  sum(CASE WHEN d.d > $MadK * mad.mad THEN 1 ELSE 0 END)::bigint AS n_outliers,
         |  ((1000000 * sum(CASE WHEN d.d > $MadK * mad.mad THEN 1 ELSE 0 END))
         |    // count(*))::bigint AS outlier_ppm
         |FROM d JOIN mad USING (event_type)
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q110_zonemap_stats" ->
      s"""WITH e AS (
         |  SELECT event_id // $ZoneRows AS zone, epoch_us(ts) AS ts_us,
         |    user_id, event_type, value
         |  FROM events),
         |z AS (
         |  SELECT zone, count(*)::bigint AS n_rows,
         |    min(ts_us)::bigint AS min_ts_us, max(ts_us)::bigint AS max_ts_us,
         |    min(value) AS min_value, max(value) AS max_value,
         |    min(user_id)::bigint AS min_user, max(user_id)::bigint AS max_user,
         |    count(DISTINCT event_type)::bigint AS n_types,
         |    sum(CASE WHEN value > $ZoneHiValue THEN 1 ELSE 0 END)::bigint AS n_match_hi
         |  FROM e GROUP BY zone),
         |b AS (SELECT max(ts_us) AS g FROM e)
         |SELECT z.zone, z.n_rows, z.min_ts_us, z.max_ts_us, z.min_value,
         |  z.max_value, z.min_user, z.max_user, z.n_types, z.n_match_hi,
         |  (CASE WHEN z.max_value <= $ZoneHiValue THEN 1 ELSE 0 END)::bigint AS prune_value_hi,
         |  (CASE WHEN z.max_ts_us < b.g - $ZoneStaleUs THEN 1 ELSE 0 END)::bigint AS prune_stale
         |FROM z, b ORDER BY z.zone""".stripMargin,
    // Deliberately the BETWEEN theta-join the engine's bucketized
    // equi-join avoids.
    "q63_interval_join" ->
      s"""WITH v AS (
         |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         |o AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM v),
         |m AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch_us(ts) - epoch_us(prev_ts) > ${30L * 60 * 1000000}
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM o),
         |s AS (
         |  SELECT user_id, ts,
         |    sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id)::bigint AS session_seq
         |  FROM m),
         |sess AS (
         |  SELECT user_id, session_seq,
         |    min(epoch_us(ts))::bigint AS session_start_us,
         |    max(epoch_us(ts))::bigint + ${6L * 3600 * 1000000} AS session_end_us
         |  FROM s GROUP BY 1, 2),
         |p AS (
         |  SELECT user_id, event_id AS purchase_id,
         |    epoch_us(ts)::bigint AS purchase_ts_us
         |  FROM events WHERE event_type = 'purchase')
         |SELECT p.purchase_id, p.user_id, p.purchase_ts_us,
         |  sess.session_start_us, sess.session_end_us
         |FROM p JOIN sess ON sess.user_id = p.user_id
         |  AND p.purchase_ts_us BETWEEN sess.session_start_us AND sess.session_end_us
         |ORDER BY purchase_id""".stripMargin,
    "q102_scd2_build" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts)::bigint AS ts_us,
        |    json_extract_string(props, '$.k')::bigint AS k
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts_us, k,
        |    lag(k) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_k
        |  FROM e),
        |ch AS (SELECT user_id, event_id, ts_us, k FROM c
        |       WHERE prev_k IS NULL OR prev_k <> k),
        |v AS (
        |  SELECT user_id, ts_us, k,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id)::bigint AS version,
        |    lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS nxt
        |  FROM ch)
        |SELECT user_id, version, k, ts_us AS valid_from_us,
        |  coalesce(nxt, 9223372036854775807)::bigint AS valid_to_us
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q92_decayed_trend" ->
      """WITH e AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('day', ts))::bigint AS day_us,
        |    cast(round(value * 100) AS bigint) AS v_int
        |  FROM events),
        |b AS (SELECT max(day_us) AS mx,
        |        least((max(day_us) - min(day_us)) // 86400000000, 62)::bigint AS a
        |      FROM e),
        |w AS (
        |  SELECT event_type, v_int, (SELECT a FROM b) AS a,
        |    least(((SELECT mx FROM b) - day_us) // 86400000000, 62)::bigint AS age_c
        |  FROM e)
        |SELECT event_type,
        |  max(a)::bigint AS horizon_days,
        |  count(*)::bigint AS n_events,
        |  sum(v_int)::bigint AS sum_v_int,
        |  (sum(v_int::hugeint * ((1::bigint << (a - age_c))::hugeint)))::varchar
        |    AS decayed_num
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q88_event_transitions" ->
      """WITH p AS (
        |  SELECT user_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, next_type, count(*)::bigint AS n_transitions,
        |    count(DISTINCT user_id)::bigint AS n_users
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n_transitions)::bigint AS row_total
        |      FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n_transitions, c.n_users,
        |  ((c.n_transitions * 1000000) // t.row_total)::bigint AS ppm
        |FROM c JOIN t USING (prev_type)
        |ORDER BY c.prev_type, c.next_type""".stripMargin,
    "q87_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5('kmv:' || user_id), 1, 8))::bigint AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM h),
        |s AS (
        |  SELECT event_type, count(*)::bigint AS n_kept,
        |    max(h)::bigint AS kth_hash
        |  FROM r WHERE rn <= 64 GROUP BY event_type),
        |x AS (
        |  SELECT event_type, count(DISTINCT user_id)::bigint AS exact_distinct
        |  FROM events GROUP BY event_type)
        |SELECT s.event_type, s.n_kept, s.kth_hash,
        |  (CASE WHEN s.n_kept < 64 THEN s.n_kept
        |        ELSE (63::bigint * 4294967296) // greatest(s.kth_hash, 1) END
        |  )::bigint AS est_distinct,
        |  x.exact_distinct
        |FROM s JOIN x USING (event_type)
        |ORDER BY s.event_type""".stripMargin,
    "q62_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5('hll:' || user_id), 1, 15))::bigint AS h
        |  FROM events),
        |obs AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    CASE WHEN h // 64 = 0 THEN 55
        |         ELSE instr(lpad(bin(h // 64), 54, '0'), '1') END AS rho
        |  FROM h),
        |regs0 AS (SELECT event_type, bucket, max(rho)::bigint AS r
        |          FROM obs GROUP BY 1, 2),
        |frame AS (SELECT DISTINCT event_type, b AS bucket
        |          FROM h CROSS JOIN (SELECT unnest(range(64)) AS b)),
        |regs AS (
        |  SELECT frame.event_type, frame.bucket, coalesce(r, 0)::bigint AS r
        |  FROM frame LEFT JOIN regs0
        |    ON regs0.event_type = frame.event_type AND regs0.bucket = frame.bucket),
        |agg AS (
        |  SELECT event_type,
        |    sum(CASE WHEN r > 0 THEN 1 ELSE 0 END)::bigint AS n_nonzero_buckets,
        |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END)::bigint AS n_zero_buckets,
        |    sum(1::bigint << cast(55 - r AS int))::bigint AS z
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT user_id)::bigint AS exact_distinct
        |       FROM events GROUP BY 1)
        |SELECT agg.event_type, n_nonzero_buckets, n_zero_buckets, z,
        |  floor(2905460736.0::double * 36028797018963968.0::double
        |        / 1000000.0::double / z::double)::bigint AS estimate,
        |  exact_distinct
        |FROM agg JOIN ex ON ex.event_type = agg.event_type
        |ORDER BY agg.event_type""".stripMargin,
    "q60_sessionize" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch_us(ts) - epoch_us(prev_ts) > ${30L * 60 * 1000000}
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM o),
         |s AS (
         |  SELECT user_id, event_id, ts,
         |    sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id)::bigint AS session_seq
         |  FROM m)
         |SELECT user_id, session_seq,
         |  min(epoch_us(ts))::bigint AS session_start_us,
         |  max(epoch_us(ts))::bigint AS session_end_us,
         |  count(*)::bigint AS n_events,
         |  min(event_id)::bigint AS first_event_id
         |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,
    // Deliberately different formulation: the global cumulative window
    // the engine's two-pass prefix sum exists to avoid.
    "q61_exact_quantiles" ->
      """WITH c AS (
        |  SELECT l_extendedprice AS v, count(*)::bigint AS c
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT v, c, sum(c) OVER (ORDER BY v)::bigint AS cum_end FROM c),
        |n AS (SELECT sum(c)::bigint AS n FROM c),
        |r AS (
        |  SELECT p::bigint AS p,
        |    (floor((n.n - 1) * p / 100) + 1)::bigint AS target_rank
        |  FROM (SELECT unnest([1, 25, 50, 75, 99]) AS p) CROSS JOIN n)
        |SELECT r.p, r.target_rank, min(o.v) AS value
        |FROM r JOIN o
        |  ON o.cum_end >= r.target_rank AND o.cum_end - o.c < r.target_rank
        |GROUP BY 1, 2 ORDER BY p""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN (greatest e.ts <= p.ts, inclusive)
    // vs the engine's union+window pass: two independent formulations of
    // the same semantics. The dedup CTE pins equal-timestamp ties to the
    // highest event_id exactly like the operator's tiebreak.
    "q53_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
        |    SELECT user_id, ts, event_id, value,
        |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'view') WHERE rn = 1),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id,
        |  epoch_us(p.pts) AS purchase_ts_us,
        |  p.purchase_value,
        |  v.view_id,
        |  epoch_us(v.ts) AS view_ts_us,
        |  v.view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.pts >= v.ts
        |ORDER BY p.purchase_id""".stripMargin,
    "q45_output_gate" ->
      """WITH sel AS (
        |  SELECT c_custkey AS c FROM customer
        |  WHERE c_custkey % 3 = 0 AND c_custkey * 7.0 >= 700.0
        |  ORDER BY c_custkey * 7.0 DESC LIMIT 100)
        |SELECT c AS c_custkey,
        |  CASE WHEN c % 2 = 0 THEN '' ELSE 'S' || c END AS symbol,
        |  CASE WHEN c % 4 <> 0 THEN 'N' || c ELSE '' END AS token_name,
        |  'solana' AS chain,
        |  'unknown' AS protocol,
        |  'unknown' AS pair_address,
        |  CASE c % 7 WHEN 0 THEN 0.0 WHEN 1 THEN 0.0 WHEN 2 THEN -1.0
        |    WHEN 3 THEN 2e15 WHEN 4 THEN 1e-16 WHEN 5 THEN 1500000.0
        |    ELSE 0.05 END AS price,
        |  c * 7.0 AS volume_24h,
        |  0.0 AS change_5m,
        |  CASE WHEN c % 6 = 0 THEN 0.0 ELSE 1.25 END AS change_24h,
        |  cast(CASE WHEN c % 3 = 1 THEN 0 ELSE c % 100 END AS bigint) AS txns_24h,
        |  cast(CASE WHEN c % 5 = 2 THEN 0 ELSE c % 50 END AS bigint) AS makers,
        |  cast(0 AS bigint) AS boost,
        |  (c % 7 IN (0, 6)) AND (c % 5 NOT IN (1, 2)) AS valid_trading
        |FROM sel ORDER BY c""".stripMargin,
    "q44_scalar_functions" ->
      """SELECT c_custkey,
        |  CASE c_custkey % 4
        |    WHEN 0 THEN 'name' || c_custkey
        |    WHEN 1 THEN 'user'
        |    WHEN 2 THEN 'a'
        |    ELSE 'tab' || chr(9) || 'name' || c_custkey END AS cleaned,
        |  CASE WHEN c_custkey % 5 = 0 THEN 'UNK'
        |    ELSE left('SYM' || c_custkey || 'X', 10) END AS symbol,
        |  CASE WHEN c_custkey % 4 = 0 THEN 0.0
        |    ELSE (c_custkey + 1) * 1.5 / (c_custkey % 4) END AS ratio,
        |  left(md5('tok' || c_custkey), 8) AS token_id,
        |  c_custkey % 3 = 0 AS is_mint
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q43_tick_bars" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS price,
        |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE value * 100.0 END AS volume_h24,
        |    CASE WHEN event_id % 13 = 0 THEN NULL
        |         ELSE event_id + 1700000000 END AS created_at
        |  FROM events),
        |w1 AS (
        |  SELECT event_id,
        |    CASE WHEN ok THEN created_at ELSE 1800000000 END AS "timestamp",
        |    CASE WHEN ok THEN price ELSE 1.0 END AS open,
        |    CASE WHEN ok THEN price ELSE 1.0 END AS high,
        |    CASE WHEN ok THEN price ELSE 1.0 END AS low,
        |    CASE WHEN ok THEN price ELSE 1.0 END AS close,
        |    CASE WHEN ok THEN volume_h24 ELSE 1000.0 END AS volume,
        |    'w1' AS op
        |  FROM (SELECT *, price IS NOT NULL AND volume_h24 IS NOT NULL
        |          AND created_at IS NOT NULL AS ok FROM t)),
        |w2 AS (
        |  SELECT event_id, created_at AS "timestamp",
        |    price AS open, price * 1.02 AS high, price * 0.98 AS low,
        |    price AS close, volume_h24 AS volume, 'w2' AS op
        |  FROM t WHERE price IS NOT NULL AND volume_h24 IS NOT NULL),
        |u AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2)
        |SELECT event_id, "timestamp", open, high, low, close, volume, op,
        |  cast(trunc(volume / 1000.0) AS bigint) AS trades_est
        |FROM u ORDER BY op, event_id""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlExactSum("l_quantity", 2)} AS sum_qty,
         |  ${sqlExactSum("l_extendedprice", 2)} AS sum_base_price,
         |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
         |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |  ${sqlExactAvg("l_quantity", 2)} AS avg_qty,
         |  ${sqlExactAvg("l_extendedprice", 2)} AS avg_price,
         |  ${sqlExactAvg("l_discount", 2)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_ranges" ->
      s"""SELECT l_returnflag, count(*) AS n_rows,
         |  ${sqlExactSum("l_quantity", 2)} AS sum_qty,
         |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |WHERE l_quantity >= 10.0 AND l_quantity <= 40.0
         |  AND l_discount >= 0.02 AND l_discount <= 0.08
         |  AND l_extendedprice < 50000.0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q03_membership" ->
      s"""SELECT n_name, c_mktsegment, count(*) AS n_customers,
         |  ${sqlExactSum("c_acctbal", 2)} AS sum_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
         |GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment""".stripMargin,
    "q04_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q05_star_join" ->
      s"""SELECT r_name, count(*) AS n_customers,
         |  ${sqlExactSum("c_acctbal", 2)} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q06_batch_stats" ->
      """SELECT count(*) AS total_events,
        |  count(*) FILTER (WHERE value >= 100.0) AS high_value_count,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase_count,
        |  count(DISTINCT user_id) AS n_users
        |FROM events""".stripMargin,
    "q07_frequency" ->
      s"""SELECT event_type, count(*) AS freq,
         |  ${sqlExactSum("value", 2)} AS sum_value
         |FROM events GROUP BY event_type ORDER BY freq DESC, event_type""".stripMargin,
    "q08_topk_per_group" ->
      """SELECT event_type, rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "q09_proximity_band" ->
      """SELECT c.event_id AS click_id, count(*) AS n_views,
        |  min(abs(c.event_id - v.event_id)) AS min_dist
        |FROM events c JOIN events v
        |  ON abs(c.event_id - v.event_id) <= 50
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |GROUP BY c.event_id ORDER BY click_id""".stripMargin,
    "q10_ohlc_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_ts,
         |  event_type,
         |  arg_min(value, event_id) AS open,
         |  max(value) AS high,
         |  min(value) AS low,
         |  arg_max(value, event_id) AS close,
         |  ${sqlExactSum("value", 2)} AS volume,
         |  count(*) AS trades
         |FROM events GROUP BY 1, 2 ORDER BY bar_ts, event_type""".stripMargin,
    "q84_funnel_stages" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 1::bigint AS stage, 'view' AS stage_name,
        |  count(*)::bigint AS n_users, 0::bigint AS sum_lag_us FROM v
        |UNION ALL
        |SELECT 2::bigint, 'click', count(*)::bigint,
        |  coalesce(sum(epoch_us(t2) - epoch_us(t1)), 0)::bigint FROM c
        |UNION ALL
        |SELECT 3::bigint, 'purchase', count(*)::bigint,
        |  coalesce(sum(epoch_us(t3) - epoch_us(t2)), 0)::bigint FROM p
        |ORDER BY stage""".stripMargin,
    "q85_retention_cohorts" ->
      """WITH s AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cd FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (
        |  SELECT e.user_id, s.cd, date_trunc('day', e.ts) AS ad
        |  FROM events e JOIN s USING (user_id)
        |  WHERE date_trunc('day', e.ts) >= s.cd)
        |SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
        |  ((epoch_us(ad) - epoch_us(cd)) / 86400000000)::bigint AS day_offset,
        |  count(DISTINCT user_id)::bigint AS n_active_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)

  /** q89 shares q60's oracle verbatim (closed streamed session_windows
    * ≡ the batch lag/cumsum sessionization) and q93 shares q84's (the
    * replayed stateful funnel ≡ the batch min-per-stage funnel).
    */
  val oracles: Map[String, String] =
    oraclesBase +
      ("q89_stream_sessions" -> oraclesBase("q60_sessionize")) +
      ("q93_stream_funnel" -> oraclesBase("q84_funnel_stages")) +
      ("q96_stream_hll" -> oraclesBase("q62_hll_distinct")) +
      ("q113_stream_kmv" -> oraclesBase("q87_kmv_distinct")) +
      ("q116_stream_quantiles" -> oraclesBase("q61_exact_quantiles")) +
      ("q118_stream_zonemap" -> oraclesBase("q110_zonemap_stats")) +
      ("q121_stream_mad" -> oraclesBase("q114_mad_outliers"))
}
