package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exprs._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 on
  * the driver testdata (TESTDATA.md); `oracleSql` holds the equivalent
  * DuckDB SQL. Column names/types are aligned on both sides (the driver
  * sorts columns by name before hashing). Float aggregates are rounded
  * identically on both sides so the hash compare is stable across
  * summation orders.
  */
object SparkEntry {

  /** Load a testdata table, normalizing every timestamp encoding the
    * driver has shipped to a session-zoned µs TIMESTAMP:
    *  - parquet TIMESTAMP(NANOS) + `nanosAsLong=true` (see [[Sessions]])
    *    arrives as LONG nanos → `timestamp_micros(ns div 1000)` (lossless:
    *    the data is µs-precision; integer `div` avoids double rounding on
    *    >2^53 values);
    *  - naive TIMESTAMP (isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ
    *    under default session configs → cast to TIMESTAMP (the session is
    *    pinned UTC, so the instant is unchanged). [[Sessions]] also sets
    *    `inferTimestampNTZ.enabled=false` so its sessions never see NTZ,
    *    but the loader stays correct under a caller's default session too.
    * Time arithmetic downstream (`unix_micros`, lag deltas, bucketing)
    * requires the zoned type — NTZ would fail analysis. */
  private[graft] def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        d.withColumn("ts", timestamp_micros(expr(s"`${f.name}` div 1000")))
      else if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast("timestamp"))
      else d
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Interval-containment join (J1) + bucketed aggregation — the
    * reference's core step-2 shape on the testdata tables. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_interval_join")(spark, "/root/testdata/sf0.001")

  /** Engine-portable rounding: floor(x·10^d + 0.5)/10^d in plain IEEE
    * double arithmetic, so Spark and the DuckDB oracle compute the exact
    * same bits even on decimal-boundary values (engine round() functions
    * disagree there: Spark rounds the shortest decimal repr HALF_UP,
    * DuckDB rounds an fp-scaled value). */
  private def rq(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + lit(0.5)) / f
  }
  private def rq(c: Column): Column = rq(c, 6)

  // ---- SURVEY §2 operator inventory over testdata ----

  /** S1-S3/P1/P5: scan + pushed-down filter + projection. */
  private def qFilterProject(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1999-01-01") && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** A1: hash aggregation, sum + count per group. */
  private def qAggSum(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))

  /** A2/A4: multi-column aggregate (sums, mean, min/max) per group. */
  private def qAggMulti(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        rq(sum("l_quantity"), 4).as("sum_qty"),
        rq(sum("l_extendedprice"), 4).as("sum_price"),
        rq(avg("l_discount"), 6).as("avg_disc"),
        min("l_shipdate").as("min_ship"),
        max("l_shipdate").as("max_ship"),
        count(lit(1)).as("n_rows"))

  /** A3: mean aggregation (the step-2 per-bucket mean). */
  private def qAggMean(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(rq(avg("value"), 6).as("avg_value"), count(lit(1)).as("n_events"))

  /** A5: distinct values. */
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()

  /** A6: sorted comma-joined distinct strings per group (host_list). */
  private def qCollectStr(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(hostList(col("c_mktsegment")).as("segments"),
        count(lit(1)).as("n_customers"))

  /** A8: pivot (events → columns), the step-2 wide-table shape. */
  private def qPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = tbl(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(rq(avg(col("value")), 6))
    p.select(col("user_id") +: types.map(t => col(t).as(s"avg_$t")): _*)
  }

  /** W1/W4 + P6: lag-difference rate derivation with validity filter —
    * the step-1 counter-rate pattern on the events stream. */
  private def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tbl(s, dir, "events")
      .withColumn("delta_value", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dt_sec", secondsBetween(col("ts"), lag(col("ts"), 1).over(w)))
      .filter(col("dt_sec") >= 0.1 && col("delta_value") >= 0.0)
      .select("user_id", "event_id", "delta_value", "dt_sec")
  }

  /** J1: interval-containment join (equi-key + time-range condition) +
    * aggregation — the reference's metrics⋈accounting join shape.
    * The orders side is the small dimension: broadcast. */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    val o = tbl(s, dir, "orders")
    li.join(broadcast(o),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "inner")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), rq(sum("l_quantity"), 4).as("sum_qty"))
  }

  /** J1 scale path: the broadcast-free bucketed interval join (intervals
    * explode into 30-day buckets, range condition becomes equi-join on
    * (jid, bucket) + residual) — must produce exactly the broadcast
    * join's answer, so it shares q_interval_join's oracle SQL. */
  private def qIntervalJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val metrics = tbl(s, dir, "lineitem")
      .select(col("l_orderkey").cast("string").as("jid"),
        col("l_shipdate").as("Timestamp"), col("l_quantity"))
    val acct = tbl(s, dir, "orders")
      .select(col("o_orderkey").cast("string").as("jid"),
        col("o_orderdate").as("start"),
        (col("o_orderdate") + expr("INTERVAL 90 DAY")).as("end"),
        col("o_orderpriority"))
    graft.operators.IntervalJoin
      .bucketed(metrics, acct, bucketMicros = 30L * 86400L * 1000000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), rq(sum("l_quantity"), 4).as("sum_qty"))
  }

  /** J1c: the NATURAL interval join — no hint, no explicit bucketing —
    * relying on the [[graft.plans.IntervalJoinRewrite]] optimizer rule
    * (default on) to plan the bucketed equi-join; the rule thereby sits
    * inside the correctness gate, and PlanSpec pins that it actually
    * fired. The intervals (per-user 30-minute session jobs) are shorter
    * than the rule's 1-day default bucket, so no width conf is touched —
    * the session state is exactly as every other query leaves it. */
  private def qIntervalJoinAuto(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val acct = ev.groupBy(col("user_id").as("auid"))
      .agg(min(col("ts")).as("start"))
      .withColumn("end",
        timestamp_micros(unix_micros(col("start")) + 1800L * 1000000L))
    ev.join(acct,
        col("user_id") === col("auid") &&
          col("ts") >= col("start") && col("ts") < col("end"))
      .groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), rq(sum("value"), 4).as("sum_v"))
  }

  /** J1d: the INCLUSIVE-bound natural interval join — `ts BETWEEN start
    * AND end` (`Column.between` desugars to `>= AND <=`), the reference
    * step-3.1 boundary semantics. Each user's interval ends EXACTLY at
    * their 5th event's timestamp, so the inclusive upper bound genuinely
    * matters: every user's boundary event is in the answer iff `<=` is
    * honored. Relies on [[graft.plans.IntervalJoinRewrite]] planning the
    * bucketed equi-join for the `<=` shape (PlanSpec pins it fired). */
  private def qIntervalJoinIncl(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val acct = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("user_id").as("auid"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"))
    ev.join(acct,
        col("user_id") === col("auid") &&
          col("ts").between(col("start"), col("end")))
      .groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), rq(sum("value"), 4).as("sum_v"))
  }

  /** Multi-way broadcast join: customer ⋈ nation ⋈ region + aggregate. */
  private def qJoin3(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        rq(sum("c_acctbal"), 4).as("total_acctbal"))

  /** J3: left-semi join (EXISTS). */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = tbl(s, dir, "lineitem").filter(col("l_quantity") >= 49)
    tbl(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
  }

  /** P8/U4: left-anti join (NOT EXISTS) — customers with no orders since
    * 2000. */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** U2/U3: union + full-row dedup. */
  private def qUnionDedup(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "events")
    e.filter(col("value") > 150)
      .union(e.filter(col("event_type") === "error"))
      .dropDuplicates()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"))
  }

  /** F1-F4: job-id standardization / normalization / suffixing over the
    * variant zoo (`123`, `jobID123`, `JOB123`, `task-123`). */
  private def qJidNormalize(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val raw = when(k % 4 === 0, concat(lit("jobID"), k.cast("string")))
      .when(k % 4 === 1, concat(lit("JOB"), k.cast("string")))
      .when(k % 4 === 2, k.cast("string"))
      .otherwise(concat(lit("task-"), k.cast("string")))
    tbl(s, dir, "orders")
      .withColumn("raw_id", raw)
      .select(
        col("o_orderkey"),
        col("raw_id"),
        standardizeJobId(col("raw_id")).as("std_id"),
        normalizeJobId(col("raw_id")).as("jid"),
        suffixS(standardizeJobId(col("raw_id"))).as("suffixed"))
  }

  /** F7-F11: date formatting and part extraction. */
  private def qDates(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month_str"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"))

  /** T4: start-aligned tumbling buckets — per-user session buckets of
    * 10 minutes anchored at each user's first event (NOT epoch-aligned),
    * the reference's job-start-aligned windowing on testdata. */
  private def qSessionBucket(s: SparkSession, dir: String): DataFrame = {
    val widthUs = 600L * 1000000L
    val w = Window.partitionBy("user_id")
    tbl(s, dir, "events")
      .withColumn("session_start", min(col("ts")).over(w))
      .withColumn("bucket", bucketIndex(col("ts"), col("session_start"), widthUs))
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n_events"), rq(avg("value"), 6).as("avg_value"))
      .withColumn("user_id", col("user_id").cast("long"))
  }

  /** Gap-based sessionization (batch form of the streaming
    * `EventAggregator.sessionize` gap rule — the two are asserted
    * equivalent in EventAggregatorSpec): per-user sessions split at
    * 10-minute silences. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize(tbl(s, dir, "events"), "user_id", "ts", "value",
        gapMs = 10L * 60L * 1000L)
      .select(col("user_id").cast("long").as("user_id"), col("session_idx"),
        col("n_events"), col("first_ts"), col("last_ts"),
        rq(col("mean_value"), 6).as("mean_value"))

  /** Skew-mitigated two-phase aggregation: the hot-key salted groupBy
    * (phase 1 on (key, salt), phase 2 combine) must produce exactly the
    * single-phase answer — oracle-checked against the plain GROUP BY. */
  private def qSkewSalted(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
        tbl(s, dir, "events").select("event_type", "value"), Seq("event_type"), 32,
        "n_events" -> (count(lit(1)), (ps: Column) => sum(ps)),
        "total_value" -> (sum(col("value")), (ps: Column) => sum(ps)))
      .withColumn("total_value", rq(col("total_value"), 4))

  /** A9 + exact dedup: distinct-text counts per language. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy("lang")
      .agg(countDistinct(col("text")).as("n_distinct_docs"),
        sum("n_chars").as("total_chars"),
        count(lit(1)).as("n_docs"))

  /** O2/O5: global sort + limit (top-k). */
  private def qTopK(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** P9/P10: safe division + clamp expression helpers. */
  private def qSafeDivClamp(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        rq(clampMetric(safeDiv(col("l_extendedprice"), col("l_quantity")), 0.0, 1500.0), 6)
          .as("unit_price_clamped"))

  /** Column profiling: per-group count / distinct / min / max / EXACT
    * linear-interpolation percentiles — the data-profiling pass a pipeline
    * runs before committing to a curation config. Spark's `percentile`
    * and DuckDB's `quantile_cont` share the same rank = p·(n−1)
    * interpolation definition, so the profile is hash-checkable. */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        rq(min("value"), 6).as("min_v"),
        rq(max("value"), 6).as("max_v"),
        rq(expr("percentile(value, 0.25)"), 6).as("p25"),
        rq(expr("percentile(value, 0.5)"), 6).as("p50"),
        rq(expr("percentile(value, 0.75)"), 6).as("p75"))

  /** [[qProfile]]'s one-pass SKETCH twin — the 100 TB shape: exact
    * `percentile` materializes each group's full value set to take an
    * order statistic (a per-group sort that stops fitting once a group
    * outgrows an executor), while `approx_percentile` is the
    * Greenwald–Khanna summary — single pass, mergeable map-side partials,
    * bounded state — with the STATED bound: rank error ≤ n/accuracy
    * (n/100,000 here). Oracle-exact, not rows-only: at the gate's group
    * sizes the bound is ≪ 1 rank, where GK returns precisely the element
    * at rank ⌈p·n⌉ — the same discrete-quantile convention DuckDB's
    * `quantile_disc` implements (verified on both engines across odd and
    * even n), so the sketch plan itself sits under the hash check. The
    * QueriesSpec tolerance case covers the genuinely-approximate regime
    * the gate can't reach (coarse accuracy vs the exact path). */
  private def qProfileApprox(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        rq(expr("approx_percentile(value, 0.25, 100000)"), 6).as("p25_approx"),
        rq(expr("approx_percentile(value, 0.5, 100000)"), 6).as("p50_approx"),
        rq(expr("approx_percentile(value, 0.75, 100000)"), 6).as("p75_approx"))
      // the oracle-exact convention holds only while the GK rank-error
      // bound n/accuracy stays < 1 rank (integer ranks then force the
      // exact ⌈p·n⌉ element). A group reaching accuracy rows would turn
      // the hash gate silently flaky at larger scale factors — guard the
      // assumption loudly, naming the dial, instead of letting it rot
      .select(col("event_type"),
        when(col("n") >= 100000L, raise_error(concat(
          lit("q_profile_approx: group size "), col("n").cast("string"),
          lit(" reaches accuracy=100000 - the <1-rank exactness convention " +
            "no longer holds; raise the accuracy argument"))))
          .otherwise(col("n")).as("n"),
        col("p25_approx"), col("p50_approx"), col("p75_approx"))

  /** JSON extraction from the events `props` column. */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))

  // ---- training-data pipeline operators (dedup / similarity / text / multimodal) ----

  import graft.operators.{Bpe, Dedup, LanguageModel, Multimodal, Similarity, TextAnalysis, TextClassifier}

  /** Exact dedup: representative (min id) per distinct text. */
  private def qDedupRep(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(tbl(s, dir, "documents"), "doc_id", "text")

  /** Exact all-pairs word-3-gram Jaccard near-dup pairs (verification
    * baseline for the LSH path). */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(
        Dedup.hashedWordShingles(tbl(s, dir, "documents"), "doc_id", "text"), 0.8)
      .withColumn("jaccard", rq(col("jaccard"), 6))

  /** MinHash-LSH near-dup pipeline (candidate-generate-verify). With 128
    * hashes / 32 bands, P[miss] < 1e-7 at jaccard 0.8, so the output is
    * oracle-checked against the exact all-pairs SQL. */
  private def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDuplicates(
        Dedup.hashedWordShingles(tbl(s, dir, "documents"), "doc_id", "text"), 0.8)
      .withColumn("jaccard", rq(col("jaccard"), 6))

  /** Fixture parquet the DuckDB oracle reads back for q_dedup_simhash —
    * the 64-bit simhash itself is engine-specific (seeded xxhash64 per
    * token, no DuckDB equivalent), but GIVEN the per-doc hashes, the
    * banding + Hamming-distance pair derivation is plain SQL. The Verify
    * harness dumps the hashes here via [[prepareOracleFixtures]]; the
    * query recomputes them from the same deterministic expression, so the
    * oracle checks the full pair logic on identical inputs. Resolved
    * against the working directory (not a hardcoded checkout path) so any
    * clone location works; the oracle SQL interpolates the same value. */
  private lazy val SimhashFixture =
    new java.io.File("target/verify-fixtures/simhash_hashes").getAbsolutePath

  /** Fixture parquet the DuckDB oracle reads back for q_dedup_spans —
    * same pattern as [[SimhashFixture]]: the per-doc distinct span hashes
    * are engine-bound (fused seeded-xxhash64 shingling), but GIVEN them,
    * the cross-document span counting + per-doc shared fraction is plain
    * SQL. */
  private lazy val SpanFixture =
    new java.io.File("target/verify-fixtures/span_hashes").getAbsolutePath

  /** Batch-side spans for q_dedup_spans_index — [[SpanFixture]]'s serving
    * twin: GIVEN the batch's hashed spans and the corpus spans, the
    * index counting + left-join scoring is plain SQL. */
  private lazy val SpanBatchFixture =
    new java.io.File("target/verify-fixtures/span_batch_hashes").getAbsolutePath

  /** Per-span CMS estimates for q_dedup_spans_sketch — the
    * [[SimhashFixture]] pattern: the seeded-hash sketch probe is
    * engine-bound, but GIVEN each batch span's estimate, the threshold
    * test, per-doc counting and fraction are plain SQL. Dumped via
    * posexplode_OUTER so a zero-span doc reaches the oracle as a
    * NULL-shingle sentinel (the sketch's narrow form reports such docs;
    * the exploded exact form omits them). */
  private lazy val SpanSketchFixture =
    new java.io.File("target/verify-fixtures/span_sketch_est").getAbsolutePath

  /** Span sketch for `dir`'s documents corpus, built once per JVM —
    * deterministic (spec-pinned bit-identical rebuilds), so the fixture
    * dump and the query agree across JVMs by construction. SIZED by the
    * executable rule ([[Dedup.sketchGeometryFor]] over the persisted
    * span index's N₁) rather than the fixed default width, which
    * SATURATES at sf0.1's span population (the `kept_sketch_fixed_w16`
    * disclosure in bench_scale_span_index.json) — per-corpus sizing
    * keeps the profile faithful at every dir this JVM serves; depth
    * from errorProb 1/16 = the family's historical depth 4. */
  private val spanSketchCache =
    collection.concurrent.TrieMap.empty[String, graft.operators.Dedup.SpanSketch]
  private def spanSketch(s: SparkSession, dir: String): graft.operators.Dedup.SpanSketch =
    cached(spanSketchCache, dir, {
      val index = s.read.parquet(spanIndexPath(s, dir))
      // coalesce: sum over an empty index is null — let the builder's
      // own "empty index" require fire, not a bare NPE here
      val n1 = index.agg(coalesce(sum("span_docs"), lit(0L))).head().getLong(0)
      // width CAPPED at 2^22 (134 MB at depth 4): exactness at
      // minDocs=1 inherently costs width ∝ N₁, so past the cap the
      // profile gracefully overcounts instead of demanding a
      // corpus-proportional driver array — the sub-linear-memory
      // contract beats last-ulp exactness for a coarse first gate, and
      // the oracle replays the engine's estimates at any geometry
      val (w, d) = Dedup.sketchGeometryFor(math.min(n1, 1L << 21),
        targetOvercount = 1L, errorProb = 1.0 / 16)
      Dedup.spanSketchFromIndex(index, width = w, depth = d)
    })

  /** Encoded-word fixture for q_bpe_encode — the [[SimhashFixture]]
    * pattern: BPE TRAINING is engine-bound (an iterative argmax loop no
    * SQL replays), but GIVEN each distinct word's learned symbol
    * sequence, the corpus-wide re-assembly — token positions joined to
    * word encodings, flattened in document order — is plain SQL over
    * [[SpanTokFixture]]'s positional tokens. */
  private lazy val BpeFixture =
    new java.io.File("target/verify-fixtures/bpe_words").getAbsolutePath

  /** Trained BPE merges for `dir`'s documents corpus, once per JVM —
    * training is deterministic (tie-breaks pinned by BpeSpec), so the
    * fixture dump and the queries agree by construction. TRAIN is the
    * build step (the serve-not-build bench pattern: an encode deployment
    * trains once per corpus release); `q_bpe_encode` times ENCODING. */
  private val bpeMergesCache =
    collection.concurrent.TrieMap.empty[String, Seq[Bpe.Merge]]
  private def bpeMerges(s: SparkSession, dir: String): Seq[Bpe.Merge] =
    cached(bpeMergesCache, dir, {
      // persist-once across JVMs: training is deterministic (tie-breaks
      // pinned by BpeSpec) and the merge list round-trips parquet
      // exactly (strings + integers), so a reused list is bit-identical
      // to a retrain — but the retrain is ~64 driver-looped rounds of
      // jobs per JVM, the single heaviest fixture build Verify paid
      val p = new java.io.File(s"target/q-bpe-merges/${dirKey(dir)}").getAbsolutePath
      reusableLayout(p) {
        Bpe.writeMerges(s,
          Bpe.train(tbl(s, dir, "documents"), "text", numMerges = 64), p)
      }
      Bpe.readMerges(s, p)
    })

  /** PRE-TOKENIZED merges over the events table's JSON `props` strings —
    * the corpus where the GPT-2-style pre-tokenizer actually bites: the
    * whitespace tokenizer sees units like `{"k":` while
    * [[graft.operators.TextAnalysis.preTokens]] splits the punctuation
    * off, so merges learn the real subword structure (`":`, digits,
    * braces). Encoded-word fixture at [[BpePreFixture]]. */
  private val bpePreMergesCache =
    collection.concurrent.TrieMap.empty[String, Seq[Bpe.Merge]]
  private def bpePreMerges(s: SparkSession, dir: String): Seq[Bpe.Merge] =
    cached(bpePreMergesCache, dir, {
      // the [[bpeMerges]] persist-once contract, pre-tokenized corpus
      val p = new java.io.File(s"target/q-bpe-pre-merges/${dirKey(dir)}").getAbsolutePath
      reusableLayout(p) {
        Bpe.writeMerges(s,
          Bpe.train(tbl(s, dir, "events"), "props", numMerges = 32,
            pretokenize = true), p)
      }
      Bpe.readMerges(s, p)
    })

  private lazy val BpePreFixture =
    new java.io.File("target/verify-fixtures/bpe_pre_words").getAbsolutePath

  /** POSITIONAL fixtures for q_dedup_span_trim — the ordered gram hashes
    * (`(sh_id, pos, gram)`, index = gram start) and the tokens
    * (`(sh_id, pos, token)`): the hashing and tokenization are
    * engine-bound, but GIVEN both, the dup detection, coverage test and
    * text reconstruction are plain SQL. */
  private lazy val SpanPosFixture =
    new java.io.File("target/verify-fixtures/span_pos_hashes").getAbsolutePath
  private lazy val SpanTokFixture =
    new java.io.File("target/verify-fixtures/span_tokens").getAbsolutePath

  /** Span-frequency index for `dir`'s documents corpus, persisted once
    * per JVM ([[bandedIndexTable]] pattern): built over the two
    * id-parity HALVES and merged — `mergeSpanIndexes(build(A), build(B))
    * ≡ build(A ∪ B)` by the additive-count algebra (spec-pinned), so the
    * growth path itself sits inside the oracle gate — then written to
    * parquet, the serving contract. */
  private val spanIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def spanIndexPath(s: SparkSession, dir: String): String =
    cached(spanIxCache, dir, {
      val p = new java.io.File(s"target/q-span-index/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val docs = tbl(s, dir, "documents")
      def half(r: Int) = docs.filter(pmod(col("doc_id"), lit(2)) === r)
      Dedup.mergeSpanIndexes(
          Dedup.buildSpanIndex(half(0), "doc_id", "text", n = 8),
          Dedup.buildSpanIndex(half(1), "doc_id", "text", n = 8))
        .write.mode("overwrite").parquet(p)
        }
    })

  /** BUCKETED span-index tables for `dir`'s documents corpus, grown
    * through the full ingest lifecycle ([[ingestBandedTable]]'s span
    * twin): built over a third of the corpus, the rest arriving as two
    * epoch-committed [[Dedup.appendToSpanIndex]] calls — counts are
    * additive, so the grown table answers the same oracle as a one-shot
    * build (multi-epoch rows collapse at serve time). Built ONCE per JVM;
    * the bench times SERVING, the steady state, while the build/append
    * split is measured in bench_scale_span_index.json. */
  private val spanBucketedCache = collection.concurrent.TrieMap.empty[String, String]
  private def bucketedSpanTable(s: SparkSession, dir: String): String =
    cached(spanBucketedCache, dir, {
      val name = "graft_q_span_ix_" + dirKey(dir)
      val docs = tbl(s, dir, "documents")
      def slice(r: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === r)
      Dedup.writeSpanIndex(
        Dedup.buildSpanIndex(slice(0), "doc_id", "text", n = 8),
        name, buckets = 32)
      Dedup.appendToSpanIndex(slice(1), name, "doc_id", "text")
      Dedup.appendToSpanIndex(slice(2), name, "doc_id", "text")
      name
    })

  /** Fixture parquet the DuckDB oracle reads back for
    * q_multimodal_features — same pattern as [[SimhashFixture]]: the
    * byte-histogram features are deterministic in the payload bytes but
    * their float normalization is engine-bound (no bit-exact DuckDB
    * float32 equivalent), so the Verify harness dumps the full feature
    * vectors here and the oracle reproduces the query's downstream
    * projection (dimension count, first-element extraction, rounding)
    * from them in plain SQL. The pixel DECODE itself is oracle-replayed
    * for real by q_multimodal_pixels over [[BmpFixture]]. */
  private lazy val MultimodalFixture =
    new java.io.File("target/verify-fixtures/multimodal_features").getAbsolutePath

  /** Fixture parquet of the synthesized uncompressed-BMP payloads for
    * q_multimodal_pixels: the engine query re-synthesizes the SAME
    * payloads inline ([[bmpPayload]] — deterministic column arithmetic
    * over doc_id, so dump and query agree byte for byte) and decodes
    * them with the REAL `javax.imageio` codec; the oracle never sees
    * the codec — it slices the pixel bytes out of these blobs at the
    * header-declared data offset and recomputes the channel sums from
    * first principles, so the decode path itself sits under the hash
    * gate. */
  private lazy val BmpFixture =
    new java.io.File("target/verify-fixtures/bmp_payloads").getAbsolutePath

  /** Fixture dir for q_dedup_index — the MinHash signatures and banded
    * frames are engine-bound (seeded xxhash64), but GIVEN them, the
    * serving join + signature-agreement estimate is plain SQL: the oracle
    * reproduces candidate generation and the estimate from these dumps,
    * the same pattern as [[SimhashFixture]]. */
  private lazy val DedupIndexFixture =
    new java.io.File("target/verify-fixtures/dedup_index").getAbsolutePath

  /** Fixture dir for q_ann_kmeans — the learned centroids are engine-bound
    * (deterministic Gonzalez seeding + Lloyd over distributed sums has no
    * DuckDB equivalent), but GIVEN the coarse labels they induce, IVF
    * serving is plain SQL: the Verify harness dumps the labeled corpus and
    * the multi-probe query fan-out, and the oracle reproduces the
    * per-cell candidate join + exact-cosine ranking from those. Same
    * pattern as [[DedupIndexFixture]]. */
  private lazy val KmeansFixture =
    new java.io.File("target/verify-fixtures/kmeans_ivf").getAbsolutePath

  /** Learned-IVF centroids for `dir`'s embeddings table: loaded from the
    * matrix [[prepareOracleFixtures]] persisted (when present and dumped
    * for the SAME dir), else fitted — then cached per JVM. The in-JVM
    * cache guarantees fixture dump and query serve from the IDENTICAL
    * matrix within one session; the persisted matrix extends that
    * persist-once contract ACROSS JVMs — [[Similarity.kmeansFit]] is
    * refit-deterministic per layout, but Lloyd's reduce-side double sums
    * carry no cross-session bit-identity promise, so a Verify fixture
    * dump and a later serve in a fresh JVM must share the matrix by
    * PERSISTENCE, not by re-derivation. The dump records `dir` and is
    * ignored for any other dir (a stale sf0.01 matrix must never label
    * an sf0.1 corpus). */
  /** Full-width per-dir key for cache table names / index paths: md5 of
    * the dir string. `String.hashCode` (32 bits) invited a silent
    * collision class — two dirs sharing one physical index and serving
    * each other's corpus with no error. */
  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Exactly-once per (cache, key) computation. `TrieMap.getOrElseUpdate`
    * may run its thunk TWICE under concurrent first access — for these
    * caches that is two racing overwrite writes of one persisted layout
    * (the r18 ADVICE finding) — so every cache site routes through this
    * per-key lock instead. The lock map is keyed by cache identity + key;
    * the fast path (already cached) takes no lock. This is what makes the
    * caches safe for [[Verify]]'s PARALLEL dump loop. */
  private val cacheLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def cached[V](cache: collection.concurrent.TrieMap[String, V],
                        key: String, build: => V): V =
    cache.getOrElse(key, {
      val lk = cacheLocks.computeIfAbsent(
        s"${System.identityHashCode(cache)}|$key", _ => new Object)
      lk.synchronized(cache.getOrElseUpdate(key, build))
    })

  /** Fixture-recipe epoch: bump whenever any persisted corpus / model /
    * layout RECIPE changes, so cross-JVM reuse can never serve a stale
    * build of a changed recipe. Recorded inside every completion marker. */
  private[graft] val FixtureEpoch = "r19-1"

  /** Cross-JVM fixture reuse is ON only when asked for: [[Verify]] turns
    * it on by default (the correctness gate re-derives nothing whose
    * persisted copy already exists — the r18 t2-cost finding), while
    * [[Bench]] leaves it off so every bench invocation computes its
    * layouts from the parquet inputs in-JVM, as the timing contract
    * requires. Env `SPARK_GRAFT_FIXTURE_REUSE` overrides both ways. */
  private def fixtureReuse: Boolean =
    sys.env.get("SPARK_GRAFT_FIXTURE_REUSE")
      .orElse(sys.props.get("graft.fixtureReuse")).contains("1")

  /** Persist-once layout build: when reuse is enabled and `p` carries a
    * completion marker from the SAME fixture epoch, skip `build` and
    * serve the existing files; otherwise build and write the marker LAST
    * (a crashed build leaves no marker → next run rebuilds). The marker
    * is epoch-stamped so a recipe change (new [[FixtureEpoch]]) invalidates
    * every prior layout at once. */
  private def reusableLayout(p: String)(build: => Unit): String = {
    val marker = new java.io.File(p, "_GRAFT_COMPLETE")
    def fresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == FixtureEpoch
    if (!(fixtureReuse && fresh)) {
      build
      new java.io.File(p).mkdirs()
      java.nio.file.Files.write(marker.toPath, FixtureEpoch.getBytes("UTF-8"))
    }
    p
  }

  private val kmeansCache =
    collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  private def kmeansCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    cached(kmeansCache, dir, {
      // one subdirectory PER dir (not one overwritten table): dumping
      // fixtures for a second sf dir must never destroy the first's
      // persisted matrix — that would silently revert that dir to
      // refit-derivation, the exact cross-JVM divergence this
      // persistence exists to prevent
      val persisted = new java.io.File(s"$KmeansFixture/centroids/${dirKey(dir)}")
      if (!persisted.exists())
        Similarity.kmeansFit(tbl(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 5)
      else {
        // a half-written dump must fail LOUDLY, not silently refit a
        // matrix different from the one the surviving label fixtures
        // were induced by (an undiagnosable oracle hash mismatch)
        require(new java.io.File(persisted, "_SUCCESS").exists(),
          s"kmeansCentroids: ${persisted} exists without _SUCCESS - crashed " +
            "fixture dump; re-run Verify (prepareOracleFixtures) for this dir")
        val cents = s.read.parquet(persisted.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("cid", "centroid").orderBy("cid").collect()
          .map(_.getSeq[Double](1).toArray)
        require(cents.nonEmpty,
          s"kmeansCentroids: ${persisted} holds no rows for dir=$dir - " +
            "corrupt fixture dump; re-run Verify for this dir")
        cents
      }
    })

  /** PQ codebooks for `dir`'s embeddings (m = 8 subspaces × ksub = 16
    * centroids over the 64-dim column) — [[kmeansCentroids]]'s product-
    * quantization sibling, with the same persistence contract: the
    * per-subspace Lloyd fits are refit-deterministic per layout but
    * carry no cross-JVM bit-identity promise, so a Verify fixture dump
    * and a later serve share the matrix by PERSISTENCE
    * ([[prepareOracleFixtures]] writes the per-dir store), never by
    * re-derivation. */
  private val pqCache =
    collection.concurrent.TrieMap.empty[String, Similarity.PqCodebooks]
  private def pqCodebooks(s: SparkSession, dir: String): Similarity.PqCodebooks =
    cached(pqCache, dir, {
      val persisted = new java.io.File(s"$KmeansFixture/pq_store/${dirKey(dir)}")
      if (!persisted.exists())
        Similarity.trainPq(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          m = 8, ksub = 16)
      else {
        require(new java.io.File(persisted, "_SUCCESS").exists(),
          s"pqCodebooks: ${persisted} exists without _SUCCESS - crashed " +
            "fixture dump; re-run Verify (prepareOracleFixtures) for this dir")
        val rows = s.read.parquet(persisted.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("j", "c", "centroid").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        require(rows.nonEmpty,
          s"pqCodebooks: ${persisted} holds no rows for dir=$dir - corrupt " +
            "fixture dump; re-run Verify for this dir")
        val byJ = rows.groupBy(_._1)
        Similarity.PqCodebooks((0 until byJ.size).toArray.map { j =>
          byJ(j).sortBy(_._2).map(_._3)
        })
      }
    })

  /** RESIDUAL PQ codebooks for `dir`'s embeddings — [[pqCodebooks]]'
    * production-semantics sibling (codes quantize `v − centroid(coarse)`,
    * the FAISS IVFPQ default), same persistence contract: fixture dump
    * and any later serve share the matrix by PERSISTENCE
    * (`pq_res_store`), never by re-derivation. */
  private val pqResCache =
    collection.concurrent.TrieMap.empty[String, Similarity.PqCodebooks]
  private def pqResCodebooks(s: SparkSession, dir: String): Similarity.PqCodebooks =
    cached(pqResCache, dir, {
      val persisted = new java.io.File(s"$KmeansFixture/pq_res_store/${dirKey(dir)}")
      if (!persisted.exists())
        Similarity.trainPqResidual(tbl(s, dir, "embeddings"), "vec_id",
          "embedding", kmeansCentroids(s, dir), m = 8, ksub = 16)
      else {
        require(new java.io.File(persisted, "_SUCCESS").exists(),
          s"pqResCodebooks: ${persisted} exists without _SUCCESS - crashed " +
            "fixture dump; re-run Verify (prepareOracleFixtures) for this dir")
        val rows = s.read.parquet(persisted.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("j", "c", "centroid").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        require(rows.nonEmpty,
          s"pqResCodebooks: ${persisted} holds no rows for dir=$dir - corrupt " +
            "fixture dump; re-run Verify for this dir")
        val byJ = rows.groupBy(_._1)
        Similarity.PqCodebooks((0 until byJ.size).toArray.map { j =>
          byJ(j).sortBy(_._2).map(_._3)
        })
      }
    })

  /** The (index, new-batch) construction shared by q_dedup_index and its
    * fixture dump: index over the whole documents table; the batch is
    * every 10th doc re-id'd (+1,000,000) with a tail appended — near-dups
    * of their originals at high-but-below-1 jaccard. */
  private def dedupIndexParts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = tbl(s, dir, "documents")
    // the serving path scans the index twice (banding + estimate join) —
    // materialize the built index once, the way a deployment serves from
    // the PERSISTED parquet, never the unmaterialized signature pipeline
    val index = graft.operators.Materialize.eagerCheckpoint(
      Dedup.buildDedupIndex(docs, "doc_id", "text"))
    (index, dedupIndexBatch(s, dir))
  }

  /** Just the new-batch half of [[dedupIndexParts]] — what the bucketed
    * serving query needs per call once the index tables are cached, so the
    * timed body never rebuilds (or re-checkpoints) the index frame. */
  private def dedupIndexBatch(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" extra tail words appended here")).as("text"))

  /** Banded-index tables for `dir`'s documents corpus, built ONCE per JVM
    * (the [[kmeansCache]] pattern): a deployment pays [[Dedup.writeBandedIndex]]
    * once per corpus, not per batch, so the bench times SERVING — the
    * steady state — while the build/serve split is measured where it
    * belongs, in bench_scale_index.json / bench_scale_compact.json. The
    * table name is dir-keyed so sf dirs never collide within a JVM. */
  private val bandedIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def bandedIndexTable(s: SparkSession, dir: String): String =
    cached(bandedIxCache, dir, {
      val name = "graft_q_banded_ix_" + dirKey(dir)
      val (index, _) = dedupIndexParts(s, dir)
      Dedup.writeBandedIndex(index, name, buckets = 32)
      name
    })

  /** [[bandedIndexTable]]'s INGEST twin ([[ingestIvfPath]]'s dedup-side
    * mirror): the same index CONTENT reached through the lifecycle path —
    * built over a third of the corpus, grown to the rest through two
    * epoch-committed [[Dedup.appendToBandedIndex]] calls. Geometry and
    * bucket count ride with the tables, so appended signatures are
    * consistent by construction and the grown tables hold row-for-row
    * what a full build holds (signatures are deterministic per doc) —
    * serving answers the SAME oracle. */
  private val ingestBandedCache = collection.concurrent.TrieMap.empty[String, String]
  private def ingestBandedTable(s: SparkSession, dir: String): String =
    cached(ingestBandedCache, dir, {
      val name = "graft_q_banded_ing_" + dirKey(dir)
      val docs = tbl(s, dir, "documents")
      def slice(r: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === r)
      Dedup.writeBandedIndex(
        graft.operators.Materialize.eagerCheckpoint(
          Dedup.buildDedupIndex(slice(0), "doc_id", "text")),
        name, buckets = 32)
      Dedup.appendToBandedIndex(slice(1), name, "doc_id", "text")
      Dedup.appendToBandedIndex(slice(2), name, "doc_id", "text")
      name
    })

  /** [[bandedIndexTable]]'s DELETION twin: the full banded index with
    * every 50th doc tombstoned out ([[Dedup.deleteFromBandedIndex]] —
    * ids only, no text). Serving must answer as if the deleted docs were
    * never indexed, which the oracle replays (the fixture index minus
    * the same ids). */
  private val deletedBandedCache = collection.concurrent.TrieMap.empty[String, String]
  private def deletedBandedTable(s: SparkSession, dir: String): String =
    cached(deletedBandedCache, dir, {
      val name = "graft_q_banded_del_" + dirKey(dir)
      val (index, _) = dedupIndexParts(s, dir)
      Dedup.writeBandedIndex(index, name, buckets = 32)
      Dedup.deleteFromBandedIndex(
        tbl(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(50)) === 0).select("doc_id"),
        name, "doc_id")
      name
    })

  /** On-disk pruned-IVF index for `dir`'s embeddings (int8 codes
    * partitioned by the coarse `label` cell), written once per JVM — the
    * [[bandedIndexTable]] pattern on the ANN side: a deployment pays
    * [[Similarity.writeIvfIndex]] once per corpus and serves every query
    * batch from the partition-pruned files, so the bench times SERVING;
    * the build/serve split stays measured in bench_scale_ivf.json. The
    * path is dir-keyed so sf dirs never collide within a JVM. */
  private val ivfIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def ivfIndexPath(s: SparkSession, dir: String): String =
    cached(ivfIxCache, dir, {
      val path = new java.io.File("target/bench-ivf-index/" +
        dirKey(dir)).getAbsolutePath
        reusableLayout(path) {
      Similarity.writeIvfIndex(
        Similarity.buildQuantizedIndex(tbl(s, dir, "embeddings"),
          "vec_id", "embedding", "label"),
        path, "label")
        }
    })

  /** LEARNED on-disk IVF index for `dir`'s embeddings: cells induced by
    * the [[kmeansCentroids]] matrix (the same matrix the q_ann_kmeans
    * fixture dumps — so the oracle's labels and this index's cells are
    * the same labels), quantizer riding with the index
    * ([[Similarity.writeLearnedIvfIndex]]). Built once per JVM, outside
    * the timed body, like every other serving-layout cache here. */
  private val learnedIvfCache = collection.concurrent.TrieMap.empty[String, String]
  private def learnedIvfPath(s: SparkSession, dir: String): String =
    cached(learnedIvfCache, dir, {
      val path = new java.io.File("target/bench-ivf-learned/" +
        dirKey(dir)).getAbsolutePath
        reusableLayout(path) {
      Similarity.writeLearnedIvfIndex(tbl(s, dir, "embeddings"),
        "vec_id", "embedding", path, kmeansCentroids(s, dir))
        }
    })

  /** [[learnedIvfPath]]'s INGEST twin: the same index CONTENT reached
    * through the lifecycle path — built over a third of the corpus, grown
    * to the rest through two epoch-committed [[Similarity
    * .appendToIvfIndex]] calls. Appended rows are labeled by the index's
    * riding quantizer — the same [[kmeansCentroids]] matrix the fixture
    * dumps — so build-then-append holds exactly the rows a full build
    * holds, and the same oracle applies. Built once per JVM, outside the
    * timed body, like every serving-layout cache here. */
  private val ingestIvfCache = collection.concurrent.TrieMap.empty[String, String]
  private def ingestIvfPath(s: SparkSession, dir: String): String =
    cached(ingestIvfCache, dir, {
      val path = new java.io.File("target/bench-ivf-ingest/" +
        dirKey(dir)).getAbsolutePath
        reusableLayout(path) {
      val e = tbl(s, dir, "embeddings")
      Similarity.writeLearnedIvfIndex(
        e.filter(pmod(col("vec_id"), lit(3)) === 0),
        "vec_id", "embedding", path, kmeansCentroids(s, dir))
      Similarity.appendToIvfIndex(
        e.filter(pmod(col("vec_id"), lit(3)) === 1), path, "vec_id", "embedding")
      Similarity.appendToIvfIndex(
        e.filter(pmod(col("vec_id"), lit(3)) === 2), path, "vec_id", "embedding")
        }
    })

  /** [[learnedIvfPath]]'s DELETION twin: the full learned index with
    * every 5th vector tombstoned out ([[Similarity.deleteFromIvfIndex]]
    * — ids only, no vectors, the takedown shape). Serving must answer as
    * if the deleted rows were never indexed, which is exactly what the
    * oracle replays (the fixture corpus filtered by the same predicate). */
  private val deletedIvfCache = collection.concurrent.TrieMap.empty[String, String]
  private def deletedIvfPath(s: SparkSession, dir: String): String =
    cached(deletedIvfCache, dir, {
      val path = new java.io.File("target/bench-ivf-deleted/" +
        dirKey(dir)).getAbsolutePath
        reusableLayout(path) {
      val e = tbl(s, dir, "embeddings")
      Similarity.writeLearnedIvfIndex(e, "vec_id", "embedding", path,
        kmeansCentroids(s, dir))
      Similarity.deleteFromIvfIndex(
        e.filter(pmod(col("vec_id"), lit(5)) === 0).select("vec_id"),
        path, "vec_id")
        }
    })

  /** Oracle-side fixture dump, called by the Verify harness (NOT by the
    * queries themselves — the bench must time operators, not fixture
    * I/O). Written distributed; DuckDB globs the part files. */
  def prepareOracleFixtures(s: SparkSession, dir: String): Unit = {
    // Persist-once across JVMs (the r18 t2-cost fix): the fixture tree
    // describes exactly ONE dir, so the completion marker records
    // (epoch, dir) and a re-run for the SAME dir under reuse skips the
    // whole dump — every fixture here is deterministic in (recipe, dir),
    // and the model stores the dump writes are exactly what the
    // cross-JVM model caches re-load. A different dir (or epoch bump)
    // rebuilds everything; the marker is deleted first so a crashed
    // rebuild can never leave a stale marker standing over mixed
    // fixtures.
    val fixturesMarker = new java.io.File("target/verify-fixtures/_GRAFT_COMPLETE")
    val stamp = s"$FixtureEpoch $dir"
    if (fixtureReuse && fixturesMarker.exists() &&
        new String(java.nio.file.Files.readAllBytes(fixturesMarker.toPath),
          "UTF-8") == stamp) return
    java.nio.file.Files.deleteIfExists(fixturesMarker.toPath)
    Dedup.simhash(tbl(s, dir, "documents"), "doc_id", "text")
      .write.mode("overwrite").parquet(SimhashFixture)
    Dedup.hashedWordShingles(tbl(s, dir, "documents"), "doc_id", "text", k = 8)
      .write.mode("overwrite").parquet(SpanFixture)
    Dedup.hashedWordShingles(dedupIndexBatch(s, dir), "doc_id", "text", k = 8)
      .write.mode("overwrite").parquet(SpanBatchFixture)
    // broadcast-backed estimates (SpanSketchValue): the sized sketch's
    // counter matrix must never ride the task binaries as a typedLit —
    // the null-shingle sentinel keeps its NULL estimate through the
    // expression's own null propagation (no hash-skip hazard)
    Dedup.withSpanSketchEstimates(
        dedupIndexBatch(s, dir).select(col("doc_id").as("sh_id"),
          posexplode_outer(graft.functions.ShingleHashes
            .shingleHashes(col("text"), 8)).as(Seq("pos", "shingle"))),
        spanSketch(s, dir), "shingle", "est")
      .select("sh_id", "shingle", "est")
      .write.mode("overwrite").parquet(SpanSketchFixture)
    // posexplode_OUTER on both positional fixtures: a doc whose text
    // tokenizes to zero tokens (or to fewer than n, for the gram side)
    // must still reach the oracle — removeDuplicatedSpans emits a row
    // for it (empty text, n_tokens 0), and the non-outer form would
    // silently drop it from the DuckDB side. The outer row carries NULL
    // pos/token/gram; the oracle counts `count(pos)` (non-NULL only) and
    // NULL grams never equi-join, so the sentinel row reconstructs the
    // empty doc without polluting dup detection.
    tbl(s, dir, "documents").select(col("doc_id").as("sh_id"),
        posexplode_outer(graft.functions.ShingleHashesAll
          .shingleHashesAll(col("text"), 8)).as(Seq("pos", "gram")))
      .write.mode("overwrite").parquet(SpanPosFixture)
    tbl(s, dir, "documents").select(col("doc_id").as("sh_id"),
        posexplode_outer(filter(split(col("text"), "\\s+"), t => length(t) > 0))
          .as(Seq("pos", "token")))
      .write.mode("overwrite").parquet(SpanTokFixture)
    Multimodal.extractFeatures(
        Multimodal.toAssets(tbl(s, dir, "documents"), "doc_id", "text", "text/plain"), 16)
      .write.mode("overwrite").parquet(MultimodalFixture)
    Multimodal.imageDHash(s.read.parquet(imageCorpusPath(s, dir)))
      .write.mode("overwrite").parquet(ImageDhashFixture)
    Multimodal.imageDHash(s.read.parquet(imageBatchPath(s, dir)))
      .write.mode("overwrite").parquet(ImageBatchDhashFixture)
    Multimodal.audioFingerprints(s.read.parquet(audioCorpusPath(s, dir)))
      .write.mode("overwrite").parquet(AudioFpFixture)
    Multimodal.luminanceGridsQ(s.read.parquet(imageCorpusPath(s, dir)))
      .filter(col("qgrid").isNotNull)
      .select(col("asset_id"), posexplode(col("qgrid")).as(Seq("cell", "qv")))
      .write.mode("overwrite").parquet(ImageGridFixture)
    Multimodal.energyCurvesQ(s.read.parquet(audioCorpusPath(s, dir)))
      .filter(col("qcurve").isNotNull)
      .select(col("asset_id"), posexplode(col("qcurve")).as(Seq("cell", "qv")))
      .write.mode("overwrite").parquet(AudioCurveFixture)
    s.read.parquet(videoCorpusPath(s, dir)).select("asset_id", "content")
      .write.mode("overwrite").parquet(VideoPayloadFixture)
    hybridCosines(s, dir)
      .write.mode("overwrite").parquet(HybridCosFixture)
    Multimodal.videoDHash(s.read.parquet(videoCorpusPath(s, dir)))
      .write.mode("overwrite").parquet(VideoHashFixture)
    Multimodal.videoGridsQ(s.read.parquet(videoCorpusPath(s, dir)))
      .filter(col("qgrid").isNotNull)
      .select(col("asset_id"), posexplode(col("qgrid")).as(Seq("cell", "qv")))
      .write.mode("overwrite").parquet(VideoGridFixture)
    // quality-classifier oracle inputs: the SERVED model's weight table
    // (nonzero quantized weights), its bias, and per-doc feature slots —
    // outer-exploded so featureless docs reach the oracle and serve
    // exactly the bias (NULL widx never equi-joins)
    locally {
      val m = qcModel(s, dir)
      import s.implicits._
      m.qweights.zipWithIndex.collect {
        case (qw, i) if qw != 0L => (i.toLong, qw)
      }.toSeq.toDF("widx", "qw")
        .write.mode("overwrite").parquet(QcWeightsFixture)
      Seq((m.qbias, TextClassifier.QuantScale)).toDF("qbias", "qscale")
        .write.mode("overwrite").parquet(QcMetaFixture)
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode_outer(TextClassifier.featureSlots(col("text"), QcDim))
            .as("widx"))
        .write.mode("overwrite").parquet(QcFeatFixture)
    }
    tbl(s, dir, "documents")
      .select(col("doc_id"), bmpPayload(col("doc_id")).as("img"))
      .write.mode("overwrite").parquet(BmpFixture)
    Bpe.encodeWords(
        Bpe.wordTable(tbl(s, dir, "documents"), "text"), bpeMerges(s, dir))
      .select("word", "syms")
      .write.mode("overwrite").parquet(BpeFixture)
    Bpe.encodeWords(
        Bpe.wordTable(tbl(s, dir, "events"), "props", pretokenize = true),
        bpePreMerges(s, dir))
      .select("word", "syms")
      .write.mode("overwrite").parquet(BpePreFixture)
    val (index, batch) = dedupIndexParts(s, dir)
    val newSigs = Dedup.buildDedupIndex(batch, "doc_id", "text")
    index.write.mode("overwrite").parquet(s"$DedupIndexFixture/index_sigs")
    newSigs.write.mode("overwrite").parquet(s"$DedupIndexFixture/new_sigs")
    Dedup.bandedSignatures(index, 32, 128)
      .write.mode("overwrite").parquet(s"$DedupIndexFixture/index_banded")
    Dedup.bandedSignatures(newSigs, 32, 128)
      .write.mode("overwrite").parquet(s"$DedupIndexFixture/new_banded")
    val emb = tbl(s, dir, "embeddings")
    val cents = kmeansCentroids(s, dir)
    // persist the matrix itself alongside the labels it induced: a later
    // JVM's queries load THIS matrix (see kmeansCentroids) instead of
    // trusting cross-session bit-identity of a refit
    s.createDataFrame(cents.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq, dir) })
      .toDF("cid", "centroid", "dir")
      // per-dir subdirectory: overwrites only THIS dir's matrix (see
      // kmeansCentroids — a shared overwritten table would clobber other
      // dirs' persisted matrices)
      .write.mode("overwrite").parquet(s"$KmeansFixture/centroids/${dirKey(dir)}")
    // centroid_dist rides along for q_semdedup_cdist's priority replay
    // (engine-computed, the fixture pattern — summation-order-exact fp
    // distances are engine-bound; GIVEN them the keep rule is plain SQL)
    Similarity.withCentroidDist(emb, "embedding", cents)
      .select("vec_id", "coarse", "centroid_dist")
      .write.mode("overwrite").parquet(s"$KmeansFixture/corpus")
    Similarity.withProbeLabels(emb.filter(col("vec_id") < 20), "embedding",
        cents, nprobe = 2)
      .select("vec_id", "coarse")
      .write.mode("overwrite").parquet(s"$KmeansFixture/probes")
    // augmented-corpus labels for q_semdedup_lsh: the SAME matrix labels
    // the planted corpus, so the oracle's cluster-bounded pair scan and
    // the engine's agree by construction
    Similarity.withCoarseLabel(augmentedEmbeddings(emb), "embedding", cents)
      .select("vec_id", "coarse")
      .write.mode("overwrite").parquet(s"$KmeansFixture/semcorpus")
    // PQ codebooks for q_ann_pq: persisted per-dir (the kmeansCentroids
    // cross-JVM contract) AND dumped flat for the oracle, which replays
    // code ASSIGNMENT and ADC from the codebooks alone — only the Lloyd
    // fits themselves are engine-bound
    val cbq = pqCodebooks(s, dir)
    val cbRows = for (j <- cbq.codebooks.indices; c <- cbq.codebooks(j).indices)
      yield (j, c, cbq.codebooks(j)(c).toSeq, dir)
    s.createDataFrame(cbRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_store/${dirKey(dir)}")
    s.createDataFrame(cbRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_codebooks")
    // flat matrix dump for the residual-PQ oracle: the residual
    // arithmetic (v − centroid[coarse]) needs the centroid VALUES, not
    // just the labels they induce — same "Lloyd is engine-bound, the
    // arithmetic it parameterizes is not" line as pq_codebooks
    s.createDataFrame(cents.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) })
      .toDF("cid", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/centroids_flat")
    val cbr = pqResCodebooks(s, dir)
    val cbrRows = for (j <- cbr.codebooks.indices; c <- cbr.codebooks(j).indices)
      yield (j, c, cbr.codebooks(j)(c).toSeq, dir)
    s.createDataFrame(cbrRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_res_store/${dirKey(dir)}")
    s.createDataFrame(cbrRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_codebooks_res")
    // OPQ: the learned rotation AND the rotated-space codebooks both
    // persist per-dir (cross-JVM contract) and dump flat for the oracle,
    // which replays rotation, code assignment and ADC from the matrices
    // alone — only the Jacobi/Procrustes/Lloyd fits are engine-bound
    val (opqRot, opqCb) = opqModel(s, dir)
    val rotRows = opqRot.zipWithIndex.map { case (r, i) => (i, r.toSeq, dir) }
    s.createDataFrame(rotRows.toSeq).toDF("i", "rowv", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_rot_store/${dirKey(dir)}")
    s.createDataFrame(rotRows.toSeq).toDF("i", "rowv", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_rotation")
    val cboRows = for (j <- opqCb.codebooks.indices; c <- opqCb.codebooks(j).indices)
      yield (j, c, opqCb.codebooks(j)(c).toSeq, dir)
    s.createDataFrame(cboRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_cb_store/${dirKey(dir)}")
    s.createDataFrame(cboRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_codebooks_opq")
    // the learned OPQ composition's rotated-space quantizers: per-dir
    // stores (cross-JVM contract) + flat oracle dumps — the oracle
    // re-derives labels/probes/codes from the MATRICES, no label fixture
    val (opqCents, opqResCb) = opqResModel(s, dir)
    val ocRows = opqCents.zipWithIndex.map { case (c, i) => (i, c.toSeq, dir) }
    s.createDataFrame(ocRows.toSeq).toDF("cid", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_res_cent_store/${dirKey(dir)}")
    s.createDataFrame(ocRows.toSeq).toDF("cid", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_centroids_flat")
    val orRows = for (j <- opqResCb.codebooks.indices;
                      c <- opqResCb.codebooks(j).indices)
      yield (j, c, opqResCb.codebooks(j)(c).toSeq, dir)
    s.createDataFrame(orRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/opq_res_cb_store/${dirKey(dir)}")
    s.createDataFrame(orRows).toDF("j", "c", "centroid", "dir")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$KmeansFixture/pq_codebooks_opq_res")
    // completion marker LAST: only a fully-written fixture tree is reusable
    fixturesMarker.getParentFile.mkdirs()
    java.nio.file.Files.write(fixturesMarker.toPath, stamp.getBytes("UTF-8"))
  }

  /** OPQ model (learned rotation + rotated-space codebooks) for `dir`'s
    * embeddings — [[pqCodebooks]]' optimized sibling
    * ([[Similarity.trainOpq]], Ge et al. 2013), same persistence
    * contract: the Jacobi/Procrustes/Lloyd fits are deterministic per
    * layout but carry no cross-JVM bit-identity promise, so fixture
    * dump and any later serve share BOTH matrices by PERSISTENCE
    * (`opq_rot_store` + `opq_cb_store`), never by re-derivation. */
  private val opqCache = collection.concurrent.TrieMap
    .empty[String, (Array[Array[Double]], Similarity.PqCodebooks)]
  private def opqModel(s: SparkSession, dir: String): (Array[Array[Double]], Similarity.PqCodebooks) =
    cached(opqCache, dir, {
      val rotStore = new java.io.File(s"$KmeansFixture/opq_rot_store/${dirKey(dir)}")
      val cbStore = new java.io.File(s"$KmeansFixture/opq_cb_store/${dirKey(dir)}")
      if (!rotStore.exists() || !cbStore.exists())
        Similarity.trainOpq(tbl(s, dir, "embeddings"), "vec_id", "embedding",
          m = 8, ksub = 16)
      else {
        Seq(rotStore, cbStore).foreach { p =>
          require(new java.io.File(p, "_SUCCESS").exists(),
            s"opqModel: ${p} exists without _SUCCESS - crashed fixture " +
              "dump; re-run Verify (prepareOracleFixtures) for this dir")
        }
        val rotRows = s.read.parquet(rotStore.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("i", "rowv").collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        val cbRows = s.read.parquet(cbStore.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("j", "c", "centroid").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        require(rotRows.nonEmpty && cbRows.nonEmpty,
          s"opqModel: persisted OPQ store holds no rows for dir=$dir - " +
            "corrupt fixture dump; re-run Verify for this dir")
        val byJ = cbRows.groupBy(_._1)
        (rotRows.sortBy(_._1).map(_._2),
          Similarity.PqCodebooks((0 until byJ.size).toArray.map { j =>
            byJ(j).sortBy(_._2).map(_._3)
          }))
      }
    })

  /** The ROTATED-SPACE residual quantizers for `dir`'s embeddings — the
    * full OPQ+IVF-PQ composition's coarse centroids and residual
    * codebooks, both trained on `rotateExpr`-projected vectors under
    * [[opqModel]]'s rotation; same per-dir persistence contract as
    * every learned quantizer here. */
  private val opqResCache = collection.concurrent.TrieMap
    .empty[String, (Array[Array[Double]], Similarity.PqCodebooks)]
  private def opqResModel(s: SparkSession, dir: String)
      : (Array[Array[Double]], Similarity.PqCodebooks) =
    cached(opqResCache, dir, {
      val centStore = new java.io.File(s"$KmeansFixture/opq_res_cent_store/${dirKey(dir)}")
      val cbStore = new java.io.File(s"$KmeansFixture/opq_res_cb_store/${dirKey(dir)}")
      if (!centStore.exists() || !cbStore.exists()) {
        val (rot, _) = opqModel(s, dir)
        // cast staged in its own projection: rotateExpr re-evaluates its
        // input once per output dimension (its documented contract)
        val rotated = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
          .select(col("vec_id"), Similarity.rotateExpr(col("__v"), rot).as("__rotv"))
        val cents = Similarity.kmeansFit(rotated, "vec_id", "__rotv",
          k = 8, iters = 5)
        (cents, Similarity.trainPqResidual(rotated, "vec_id", "__rotv",
          cents, m = 8, ksub = 16))
      } else {
        Seq(centStore, cbStore).foreach { p =>
          require(new java.io.File(p, "_SUCCESS").exists(),
            s"opqResModel: ${p} exists without _SUCCESS - crashed fixture " +
              "dump; re-run Verify (prepareOracleFixtures) for this dir")
        }
        val cents = s.read.parquet(centStore.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("cid", "centroid").orderBy("cid").collect()
          .map(_.getSeq[Double](1).toArray)
        val rows = s.read.parquet(cbStore.getAbsolutePath)
          .filter(col("dir") === dir)
          .select("j", "c", "centroid").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        require(cents.nonEmpty && rows.nonEmpty,
          s"opqResModel: persisted store holds no rows for dir=$dir - " +
            "corrupt fixture dump; re-run Verify for this dir")
        val byJ = rows.groupBy(_._1)
        (cents, Similarity.PqCodebooks((0 until byJ.size).toArray.map { j =>
          byJ(j).sortBy(_._2).map(_._3)
        }))
      }
    })

  /** On-disk LEARNED OPQ index for `dir`'s embeddings (the FAISS
    * `OPQ,IVF,PQ` composition persisted with all three quantizers
    * riding), written once per JVM — [[qAnnOpqRes]] serves every batch
    * from it, the deployment steady state. */
  private val opqLearnedCache = collection.concurrent.TrieMap.empty[String, String]
  private def opqLearnedIndexPath(s: SparkSession, dir: String): String =
    cached(opqLearnedCache, dir, {
      val p = new java.io.File(s"target/q-ann-opq-learned/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val (rot, _) = opqModel(s, dir)
      val (cents, cb) = opqResModel(s, dir)
      Similarity.writeLearnedOpqIndex(tbl(s, dir, "embeddings"), "vec_id",
        "embedding", p, rot, cents, cb)
        }
    })

  /** Incremental dedup serving: a new batch against the prebuilt MinHash
    * signature index — band-collision candidates (batch × index only)
    * verified by the signature-agreement estimate. The index is PERSISTED
    * once per dir and served from its parquet ([[flatIndexPath]] — the
    * operator's own contract: "hand it a PERSISTED frame", and the
    * deployment steady state this query should time; the build cost
    * stays measured in the scale harnesses), so what remains in the
    * timed body is exactly what distinguishes FLAT serving from
    * [[qDedupIndexBanded]]: the whole-index re-band + shuffle every
    * serve pays that the bucketed layout paid once at build. Oracle:
    * DuckDB reproduces the serving join + estimate from
    * [[DedupIndexFixture]]. */
  private val flatIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def flatIndexPath(s: SparkSession, dir: String): String =
    cached(flatIxCache, dir, {
      val p = new java.io.File(s"target/q-flat-index/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val (index, _) = dedupIndexParts(s, dir)
      index.write.mode("overwrite").parquet(p)
        }
    })
  private def qDedupIndex(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupAgainstIndex(dedupIndexBatch(s, dir),
        s.read.parquet(flatIndexPath(s, dir)), "doc_id", "text",
        minJaccard = 0.3)
      .withColumn("est_jaccard", rq(col("est_jaccard"), 6))

  /** The BUCKETED serving layout under the oracle gate: serve the same
    * batch from the epoch-committed banded tables and match the SAME
    * oracle as [[qDedupIndex]] — the layout changes the plan (one-sided
    * shuffle, bucket-aligned index scans), never the hits or the
    * estimates, and this query makes that equivalence a hash-checked fact
    * rather than a spec-only claim. The tables are built once per dir
    * ([[bandedIndexTable]]) OUTSIDE the timed body: a deployment pays the
    * build once per corpus and then serves every ingest batch, so the
    * bench number is the per-batch steady state; the build cost stays
    * visible in the scale harnesses, which measure exactly that split. */
  private def qDedupIndexBanded(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupAgainstBandedIndex(dedupIndexBatch(s, dir),
        bandedIndexTable(s, dir), "doc_id", "text", minJaccard = 0.3)
      .withColumn("est_jaccard", rq(col("est_jaccard"), 6))

  /** q_dedup_index_banded's INGEST-LIFECYCLE twin, same oracle: the
    * served tables were grown through [[Dedup.appendToBandedIndex]]
    * (build over a third of the corpus, two epoch-committed appends for
    * the rest — [[ingestBandedTable]]) instead of built in one shot.
    * The dedup-side mirror of q_ann_ingest: both append paths pinned by
    * the same DuckDB replay that pins their build paths. */
  private def qDedupIndexIngest(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupAgainstBandedIndex(dedupIndexBatch(s, dir),
        ingestBandedTable(s, dir), "doc_id", "text", minJaccard = 0.3)
      .withColumn("est_jaccard", rq(col("est_jaccard"), 6))

  /** q_dedup_index_banded's DELETION twin ([[qAnnDelete]]'s dedup-side
    * mirror), serving the [[deletedBandedTable]]: every 50th doc
    * tombstoned, so the batch docs whose near-dup source was a victim
    * must stop matching — the oracle replays the estimate join over the
    * fixture index MINUS the same ids. */
  private def qDedupIndexDelete(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupAgainstBandedIndex(dedupIndexBatch(s, dir),
        deletedBandedTable(s, dir), "doc_id", "text", minJaccard = 0.3)
      .withColumn("est_jaccard", rq(col("est_jaccard"), 6))

  /** SimHash near-dup pairs (hamming ≤ 3 over 64-bit token simhash).
    * Oracle-checked on the pair set: banding + `bit_count` Hamming
    * filtering are reproduced in DuckDB from the fixture dumped by
    * [[prepareOracleFixtures]] — `simhash64` is deterministic, so the
    * recomputed hashes here and the dump are value-identical. */
  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Dedup.simhash(tbl(s, dir, "documents"), "doc_id", "text"), 3)
      .withColumn("hamming", col("hamming").cast("long"))

  /** Span-level duplication profile ([[Dedup.spanStats]]): per doc, the
    * fraction of its distinct word 8-gram spans that also occur in some
    * OTHER document — the substring-dedup signal (Lee et al.) that
    * catches boilerplate pasted into otherwise-unique docs, which
    * doc-level MinHash/SimHash miss. Oracle: DuckDB reproduces the span
    * counting + per-doc fraction from [[SpanFixture]] (the engine-bound
    * hashed spans dumped by [[prepareOracleFixtures]]; the query
    * recomputes them from the same deterministic expression). */
  private def qDedupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.spanStats(tbl(s, dir, "documents"), "doc_id", "text", n = 8)
      .withColumn("shared_frac", rq(col("shared_frac"), 6))

  /** Ingest-time boilerplate scoring ([[Dedup.spanStatsAgainstIndex]]):
    * the standard new batch served against the persisted span-frequency
    * index — built through the MERGE growth path ([[spanIndexPath]]), so
    * the additive algebra answers the same oracle as a one-shot build.
    * Span width rides with the index; only the batch explodes per serve.
    * Oracle: DuckDB recomputes the index counts from [[SpanFixture]] and
    * the left-join scoring from [[SpanBatchFixture]]. */
  private def qDedupSpansIndex(s: SparkSession, dir: String): DataFrame =
    Dedup.spanStatsAgainstIndex(dedupIndexBatch(s, dir),
        s.read.parquet(spanIndexPath(s, dir)), "doc_id", "text")
      .withColumn("indexed_frac", rq(col("indexed_frac"), 6))

  /** q_dedup_spans_index's BUCKETED-LAYOUT twin, same oracle — the
    * `q_dedup_index` vs `q_dedup_index_banded` pattern applied to the
    * span family: the served table was grown through the full lifecycle
    * ([[bucketedSpanTable]] — build over a third of the corpus, two
    * epoch-committed [[Dedup.appendToSpanIndex]] calls), and serving
    * joins it bucket-aligned so the index side never shuffles — what
    * flat serving pays per batch, this layout paid once at build. The
    * layout (and the deferred count merge it implies) changes the plan,
    * never the answer. */
  private def qDedupSpansIndexBucketed(s: SparkSession, dir: String): DataFrame =
    Dedup.spanStatsAgainstBucketedIndex(dedupIndexBatch(s, dir),
        bucketedSpanTable(s, dir), "doc_id", "text")
      .withColumn("indexed_frac", rq(col("indexed_frac"), 6))

  /** The COUNT-MIN-SKETCH form of the boilerplate gate
    * ([[Dedup.spanStatsAgainstSketch]]): the same batch profiled against
    * a [[Dedup.sketchGeometryFor]]-sized sketch of the corpus span
    * index — no join, no shuffle, one narrow pass (`depth` array probes
    * per span). The sub-linear-memory serving shape for 100 TB, where
    * even the exact span index is corpus-scale; estimates only
    * overcount (spec-pinned vs the exact index), and at the SIZED
    * geometry the overcount bound stays below the threshold — the
    * fixed default width would saturate at sf0.1 (the
    * `kept_sketch_fixed_w16` disclosure). Oracle:
    * DuckDB replays the threshold test, per-doc counting and fraction
    * from the dumped per-span estimates ([[SpanSketchFixture]]). */
  private def qDedupSpansSketch(s: SparkSession, dir: String): DataFrame =
    Dedup.spanStatsAgainstSketch(dedupIndexBatch(s, dir),
        spanSketch(s, dir), "doc_id", "text")
      .withColumn("indexed_frac", rq(col("indexed_frac"), 6))

  /** Duplicated-span REMOVAL ([[Dedup.removeDuplicatedSpans]]): the
    * text-surgery form of substring dedup — tokens covered by a word
    * 8-gram occurring in ≥2 distinct documents are cut from EVERY copy
    * and the text rebuilt. Oracle: DuckDB reproduces dup detection,
    * coverage and reconstruction from the positional fixtures
    * ([[SpanPosFixture]]/[[SpanTokFixture]]), `string_agg ORDER BY pos`
    * against the engine's rebuilt strings — a hash check over the full
    * rewritten text of every document. */
  private def qDedupSpanTrim(s: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(tbl(s, dir, "documents"), "doc_id", "text",
      n = 8, minDocs = 2)

  /** Token-budget mixture sampling ([[TextAnalysis.sampleByTokenBudget]]):
    * per-language token budgets over the documents table, exercising
    * every bucket class the two-pass design distinguishes — `de` fully
    * within budget (wholesale keep, no window), `en`/`zh` straddling
    * (windowed boundary buckets), `es` zero budget, `fr` absent from the
    * map (dropped). Oracle: the NAIVE single-window formulation in
    * DuckDB — `sum OVER (PARTITION BY lang ORDER BY md5(id), id)` ≤
    * budget — which the two-pass plan must match row for row. */
  private def qSampleBudget(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sampleByTokenBudget(tbl(s, dir, "documents"),
        "doc_id", "text", "lang",
        Map("en" -> 5000L, "de" -> 100000L, "zh" -> 2000L, "es" -> 0L))
      .select("doc_id", "lang", "n_tokens")

  /** Embedding near-dup: all pairs with cosine ≥ 0.4. */
  private def qEmbedCosinePairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(tbl(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
      .withColumn("cosine", rq(col("cosine"), 6))

  /** Embedding near-dup at scale: banded random-hyperplane LSH candidates
    * + exact-cosine verify (candidate-generate-verify), oracle-checked
    * against the exact all-pairs SQL. The testdata embeddings are
    * near-uniform (background cosine ≤ ~0.6) — at such low similarity no
    * LSH scheme can prune, so the corpus plants near-duplicates derived
    * from the table itself (dim-1 sign flip, id + 1,000,000): planted
    * cosines 1 - 2·v₁²/|v|² span ~[0.69, 1.0], making the 0.95-threshold
    * verification nontrivial while background pairs stay far below it.
    * With 24 bands × 8 bits, per-pair miss probability at cosine ≥ 0.95
    * is < 1e-8 (empirically zero misses at sf0.01 AND sf0.1), and only
    * ~1/8 of all pairs ever reach the exact-cosine verify. */
  /** The PLANTED near-dup corpus shared by the embedding LSH queries and
    * the SemDeDup-LSH twin: each vector plus its first-coordinate flip
    * under +1000000 ids — cos(v, v') ≈ 1 − 2v₁²/|v|², mostly ≥ 0.95 on
    * these near-uniform 64-dim vectors. */
  private def augmentedEmbeddings(e: DataFrame): DataFrame =
    e.select("vec_id", "embedding").union(
      e.select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(-element_at(col("embedding"), 1)),
          slice(col("embedding"), 2, 63)).as("embedding")))

  private def qEmbedLshPairs(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val corpus = augmentedEmbeddings(e)
    // geometry sized to the corpus (the lshGeometryFor sizing rule, inside
    // the correctness gate): the count is a parquet-metadata job, and the
    // per-pair miss bound (1e-6) keeps the oracle hash-exact
    val (bands, bits) = Similarity.lshGeometryFor(math.max(1L, 2 * e.count()), 0.95)
    Similarity.lshCosinePairs(corpus, "vec_id", "embedding", dims = 64,
        minCosine = 0.95, bands = bands, bitsPerBand = bits)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** Embedding near-dup CLUSTERS end to end: [[qEmbedLshPairs]]'s
    * candidate-generate-verify pair path composed with the alternating-star
    * connected-components resolution — the actual curation product of
    * embedding dedup (one canonical representative per near-dup group).
    * Same planted corpus; the oracle recomputes exact all-pairs edges at
    * ≥ 0.95 and resolves components with a recursive CTE, so BOTH the LSH
    * recall and the CC labeling are inside one hash check. */
  private def qEmbedClusters(s: SparkSession, dir: String): DataFrame =
    // the SAME pair frame q_embed_lsh_pairs oracle-checks (corpus planting
    // and sized geometry included by construction, not duplicated), with
    // CC resolution on top — the cosine rounding is projected away
    Dedup.duplicateClusters(
        qEmbedLshPairs(s, dir).select("id_a", "id_b"))
      .withColumnRenamed("doc_id", "vec_id")

  /** SemDeDup over the embeddings corpus: cluster-bounded semantic
    * near-dup removal, reported as a kept/dropped flag per vector. The
    * clusters are the [[kmeansCentroids]] cells — the SAME matrix the
    * ANN fixture dumps, so the oracle replays the within-cluster pair
    * scan from the fixture labels and the raw embeddings. */
  private def qSemdedup(s: SparkSession, dir: String): DataFrame =
    Similarity.withSemDupFlag(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        kmeansCentroids(s, dir), minCosine = 0.4)
      .select("vec_id", "coarse", "kept")

  /** [[qSemdedup]] under the PAPER-EXACT keep rule (`keepBy =
    * "centroid_dist"`): within a near-dup pair the point FARTHEST from
    * its centroid survives — SemDeDup's prescription, demonstrably a
    * different answer from the id-order relaxation on this corpus, and
    * the oracle replays the (dist desc, id asc) dominance from the
    * fixture's engine-computed distances. */
  private def qSemdedupCdist(s: SparkSession, dir: String): DataFrame =
    Similarity.withSemDupFlag(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        kmeansCentroids(s, dir), minCosine = 0.4, keepBy = "centroid_dist")
      .select("vec_id", "coarse", "kept")

  /** The HOT-CLUSTER scale path under the gate: [[qSemdedup]]'s LSH
    * twin over the PLANTED corpus at τ = 0.95 with
    * [[Similarity.lshGeometryFor]]-sized geometry (per-pair miss bound
    * ~1e-6, the q_embed_lsh_pairs precedent) — the oracle replays the
    * EXACT dominated rule from the dumped augmented-corpus labels, so
    * the hash check pins the LSH candidate path equal to the exact
    * pair scan, cluster-bounded on both sides. */
  private def qSemdedupLsh(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val (bands, bits) = Similarity.lshGeometryFor(math.max(1L, 2 * e.count()), 0.95)
    Similarity.withSemDupFlagLsh(augmentedEmbeddings(e), "vec_id", "embedding",
        kmeansCentroids(s, dir), minCosine = 0.95,
        bands = bands, bitsPerBand = bits)
      .select("vec_id", "coarse", "kept")
  }

  /** BPE round-0 statistics: adjacent symbol-pair counts over the
    * word-frequency table (chars + end-of-word marker), weighted by word
    * frequency — the counting core every merge round of tokenizer
    * training runs, under the exact oracle. Top 50 by (n, lhs, rhs). */
  private def qBpePairs(s: SparkSession, dir: String): DataFrame =
    Bpe.pairCounts(Bpe.wordTable(tbl(s, dir, "documents"), "text"))
      .orderBy(col("n").desc, col("lhs"), col("rhs")).limit(50)

  /** BPE corpus ENCODING under the [[bpeMerges]] vocabulary (trained
    * once per dir outside the timed body — the serve-not-build pattern):
    * per doc, the BPE token count and the md5 of the space-joined token
    * stream. The oracle re-assembles every document from the positional
    * token fixture and the encoded-word fixture, so the distributed
    * distinct-words/join-back/ordered-flatten path is hash-checked
    * end to end. */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame =
    Bpe.encode(tbl(s, dir, "documents"), "doc_id", "text", bpeMerges(s, dir))
      .select(col("doc_id"), col("n_bpe_tokens"),
        md5(concat_ws(" ", col("bpe_tokens")).cast("binary")).as("bpe_md5"))

  /** [[qBpeEncode]] under the GPT-2-style PRE-tokenizer, over the
    * punctuation-rich JSON `props` corpus where the option matters:
    * `{"k": 87}` decomposes to 7 pre-token units instead of 2
    * whitespace tokens, so merges cross the boundaries the whitespace
    * tokenizer hides. The oracle replays the SPLIT itself (the
    * lookaround-free `regexp_extract_all` equivalent — see
    * [[graft.operators.TextAnalysis.preTokens]]) and reassembles from
    * the encoded-word fixture, so this gate is strictly stronger than
    * q_bpe_encode's: tokenization AND reassembly both checked. */
  private def qBpeEncodePre(s: SparkSession, dir: String): DataFrame =
    Bpe.encode(tbl(s, dir, "events"), "event_id", "props",
        bpePreMerges(s, dir), pretokenize = true)
      .select(col("event_id"), col("n_bpe_tokens"),
        md5(concat_ws(" ", col("bpe_tokens")).cast("binary")).as("bpe_md5"))

  /** Inverted-index BM25 search: build + score one fixed query over the
    * documents corpus; full scored set (no top-k cut), compared in the
    * rounded-score domain — rank columns would amplify last-ulp ties. */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25(
        graft.operators.TextIndex.build(tbl(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "spark hash join stream")
      .select(col("doc_id"), col("n_matched"), rq(col("score"), 6).as("score"))

  /** On-disk EPOCH-GROWN text index for `dir`'s documents — built over a
    * third of the corpus, grown to the rest through two committed
    * [[graft.operators.TextIndex.appendEpoch]] calls (the ingest-twin
    * pattern of [[ingestIvfPath]]), once per JVM outside the timed
    * body. Counts, df, N and Σdl are all additive over the id-disjoint
    * thirds, and avgdl derives from the exact integer sums, so the
    * grown index's statistics EQUAL the one-shot build's bit for bit. */
  private val textIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def textIndexPath(s: SparkSession, dir: String): String =
    cached(textIxCache, dir, {
      val p = new java.io.File(s"target/q-bm25-index/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val d = tbl(s, dir, "documents")
      graft.operators.TextIndex.write(
        graft.operators.TextIndex.build(
          d.filter(pmod(col("doc_id"), lit(3)) === 0), "doc_id", "text"), p)
      graft.operators.TextIndex.appendEpoch(
        d.filter(pmod(col("doc_id"), lit(3)) === 1), p, "doc_id", "text", "a1")
      graft.operators.TextIndex.appendEpoch(
        d.filter(pmod(col("doc_id"), lit(3)) === 2), p, "doc_id", "text", "a2")
        }
    })

  /** [[qBm25]]'s SERVING twin — same oracle, different path: the query
    * answers from the persisted epoch-grown layout (committed-epoch
    * read, per-epoch term-sorted postings, docFreq re-aggregated under
    * the pushed-down term filter). Additive growth makes the grown
    * statistics identical to a one-shot build's, so the lifecycle sits
    * under the hash gate with no oracle of its own. */
  private def qBm25Served(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25(
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", "spark hash join stream")
      .select(col("doc_id"), col("n_matched"), rq(col("score"), 6).as("score"))

  /** EXACT-PHRASE retrieval from the positional postings, served from
    * the same epoch-grown persisted layout as [[qBm25Served]] — the
    * decontamination-forensics query: every doc containing "hash join"
    * verbatim, with its occurrence count and phrase-as-one-term BM25
    * score. The oracle replays adjacency from the raw token arrays
    * (w[i] = 'hash' ∧ w[i+1] = 'join'), so the positional schema, the
    * per-doc term→positions map, and the higher-order adjacency filter
    * are all hash-checked. */
  private def qBm25Phrase(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25Phrase(
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", "hash join")
      .select(col("doc_id"), col("n_occurrences"), rq(col("score"), 6).as("score"))

  /** WINDOWED co-occurrence from the same persisted layout: every doc
    * where "hash" and "join" co-occur within 3 tokens of a "hash"
    * anchor, any order — the near-verbatim decontamination shape
    * ([[graft.operators.TextIndex.bm25Window]]); the oracle replays the
    * anchor/window arithmetic from the raw token arrays. */
  private def qBm25Window(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25Window(
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", "hash join", window = 3)
      .select(col("doc_id"), col("n_occurrences"), rq(col("score"), 6).as("score"))

  /** On-disk TOP-K (impact-blocked) layout for `dir`'s documents —
    * [[textIndexPath]]'s block-max sibling, derived once per JVM
    * outside the timed body: a deployment refreshes it on the
    * compaction cadence and serves every k-cut query from it. */
  private val topkIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def topkIndexPath(s: SparkSession, dir: String): String =
    cached(topkIxCache, dir, {
      val p = new java.io.File(s"target/q-bm25-topk/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      graft.operators.TextIndex.writeTopK(
        graft.operators.TextIndex.build(tbl(s, dir, "documents"), "doc_id", "text"),
        p)
        }
    })

  /** TOP-K BM25 with block-max pruning
    * ([[graft.operators.TextIndex.bm25TopK]]): the 25 best docs for
    * [[qBm25]]'s exact query, served from the impact-blocked layout —
    * threshold from the best blocks, per-term kept prefixes, exact
    * rescore of the candidates. The oracle is full scoring + the SAME
    * rounded k-cut (ORDER BY rounded score, doc_id, LIMIT k), so the
    * hash gate pins the pruned path's top-k equal to exhaustive
    * scoring's — the operator's whole claim. */
  private def qBm25TopK(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25TopK(
        graft.operators.TextIndex.readTopK(s, topkIndexPath(s, dir)),
        "doc_id", "spark hash join stream", k = 25)
      .select(col("doc_id"), col("n_matched"), rq(col("score"), 6).as("score"))

  /** BATCH exact-phrase matching — three phrases verified against the
    * persisted positional postings in ONE pass
    * ([[graft.operators.TextIndex.bm25PhraseBatch]]): the
    * decontamination-forensics shape, N eval sentences ≠ N corpus
    * scans. The oracle replays each phrase's adjacency from the raw
    * token arrays and the per-phrase df scoring. */
  private def qBm25PhraseBatch(s: SparkSession, dir: String): DataFrame = {
    val phrases = s.createDataFrame(Seq(
      (1L, "hash join"), (2L, "sort merge"), (3L, "the fast")))
      .toDF("phrase_id", "phrase")
    graft.operators.TextIndex.bm25PhraseBatch(
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", phrases, "phrase_id", "phrase")
      .select(col("phrase_id"), col("doc_id"), col("n_occurrences"),
        rq(col("score"), 6).as("score"))
  }

  /** The DECONTAMINATION CAPSTONE over the retrieval family: the
    * documents corpus minus every doc containing ANY of the three eval
    * phrases verbatim ([[graft.operators.TextIndex
    * .decontaminatePhrases]] — one postings scan over the persisted
    * positional layout, broadcast anti-join of the hit ids). The
    * oracle replays each phrase's adjacency from the raw token arrays
    * and complements the hit set, so the whole gate — batch positional
    * verification AND the drop — is hash-checked end to end. */
  private def qDecontaminatePhrase(s: SparkSession, dir: String): DataFrame = {
    val phrases = s.createDataFrame(Seq(
      (1L, "hash join"), (2L, "sort merge"), (3L, "the fast")))
      .toDF("phrase_id", "phrase")
    graft.operators.TextIndex.decontaminatePhrases(
        tbl(s, dir, "documents"),
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", phrases, "phrase_id", "phrase")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.tokens(col("text"))).as("n_tokens"))
  }

  /** BATCH BM25 — three queries scored in ONE pass over the persisted
    * index ([[graft.operators.TextIndex.bm25Batch]]): the
    * decontamination shape, N eval strings ≠ N corpus scans. Query 1 is
    * [[qBm25]]'s exact query (so the batch path is directly comparable),
    * 2 the rare selective term, 3 a mixed present/absent-term string. */
  private def qBm25Batch(s: SparkSession, dir: String): DataFrame = {
    val queries = s.createDataFrame(Seq(
      (1L, "spark hash join stream"), (2L, "dup"), (3L, "the quick sort merge")))
      .toDF("query_id", "query")
    graft.operators.TextIndex.bm25Batch(
        graft.operators.TextIndex.read(s, textIndexPath(s, dir)),
        "doc_id", queries, "query_id", "query")
      .select(col("query_id"), col("doc_id"), col("n_matched"),
        rq(col("score"), 6).as("score"))
  }

  /** Corpus vocabulary: top-100 tokens by frequency (ties by token). */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topTokens(tbl(s, dir, "documents"), "text", 100)

  /** Bigram-LM cross-entropy per document (the CCNet perplexity gate,
    * self-scored: corpus model over the corpus itself — train + score
    * both inside the timed body, the honest cost of the operator).
    * Compared in LOG space: the oracle reproduces counts, smoothing,
    * and the per-doc mean −log P exactly; `exp` never enters the gate
    * (it would only amplify last-ulp `ln` differences between engines). */
  private def qLmXent(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.train(docs, "text")
    LanguageModel.crossEntropy(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))
  }

  /** [[qLmXent]] under the INTERPOLATED bigram/unigram model (λ = 0.7,
    * Jelinek-Mercer): unseen-bigram mass backs off to word frequency
    * instead of the uniform-ish floor — the form materially closer to
    * the deployed CCNet gate, still closed over exact counts so the
    * oracle replays it term for term. */
  private def qLmXentInterp(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainInterpolated(docs, "text")
    LanguageModel.crossEntropyInterpolated(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED INTERPOLATED model for `dir`'s corpus (minCount = 2),
    * written once per JVM — [[lmModelPath]]'s interpolated sibling, so
    * prune + writeInterpolated/readInterpolated + floor-backoff scoring
    * all sit under the hash gate, not just the spec. */
  private val lmInterpModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmInterpModelPath(s: SparkSession, dir: String): String =
    cached(lmInterpModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-interp-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeInterpolated(
        LanguageModel.pruneInterpolated(
          LanguageModel.trainInterpolated(tbl(s, dir, "documents"), "text"),
          minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentInterp]]: score against the persisted
    * PRUNED interpolated model. Pruned-away singleton bigrams fall to
    * the unseen-bigram floor INSIDE the mixture — the unigram leg is
    * untouched (it IS the vocabulary), so the backoff still
    * discriminates by word frequency where the plain pruned model
    * flattens to the uniform-ish floor. */
  private def qLmXentInterpServed(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyInterpolated(tbl(s, dir, "documents"), "doc_id",
        "text", LanguageModel.readInterpolated(s, lmInterpModelPath(s, dir)))
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))

  /** Kneser-Ney cross-entropy per document (discount 0.75, continuation
    * floor 0.5) — the deployed-gate smoothing family
    * ([[graft.operators.LanguageModel.trainKneserNey]]), train + score
    * in the timed body like [[qLmXent]]. Self-scoring keeps every
    * bigram and context seen, so what the hash gate pins is the full
    * discount + fan-out + continuation arithmetic on the seen path
    * (the unseen legs are spec territory and the SERVED twin's pruned
    * oracle). */
  private def qLmXentKn(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainKneserNey(docs, "text")
    LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED KN model for `dir`'s corpus (minCount = 2) —
    * [[lmModelPath]]'s KN sibling, written once per JVM. */
  private val lmKnModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmKnModelPath(s: SparkSession, dir: String): String =
    cached(lmKnModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-kn-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeKneserNey(
        LanguageModel.pruneKneserNey(
          LanguageModel.trainKneserNey(tbl(s, dir, "documents"), "text"),
          minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentKn]]: score against the persisted
    * PRUNED model. Pruned singleton bigrams drop their discounted
    * first term and fall to the discounted-backoff leg alone — the
    * continuation distribution (unpruned, like the interpolated form's
    * unigram leg) still ranks them by context diversity, and the
    * oracle replays exactly that coalesce-to-backoff arithmetic, so
    * prune + write/read + the backoff path all sit under the hash
    * gate. */
  private def qLmXentKnServed(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyKneserNey(tbl(s, dir, "documents"), "doc_id",
        "text", LanguageModel.readKneserNey(s, lmKnModelPath(s, dir)))
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))

  /** On-disk PRUNED model for `dir`'s corpus (minCount = 2, the KenLM
    * deployment shape), written once per JVM — the serve-not-build
    * pattern: [[qLmXentServed]] times SCORING against the persisted
    * model, the per-ingest-batch steady state. */
  private val lmModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmModelPath(s: SparkSession, dir: String): String =
    cached(lmModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.write(
        LanguageModel.prune(LanguageModel.train(tbl(s, dir, "documents"), "text"),
          minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXent]]: score against the persisted
    * PRUNED model ([[lmModelPath]]). Different oracle by design —
    * pruned-away singleton bigrams fall to the unseen floor (coalesce
    * in the SQL), so this query puts prune + write/read + the
    * floor-scoring path under the hash gate, not just the spec. */
  private def qLmXentServed(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropy(tbl(s, dir, "documents"), "doc_id", "text",
        LanguageModel.read(s, lmModelPath(s, dir)))
      .select(col("doc_id"), col("n_bigrams"), rq(col("xent"), 6).as("xent"))

  /** Trigram Kneser-Ney cross-entropy (D = 0.75, β = 0.5) — the
    * ORDER-RECURSIVE KN structure served by the GENERIC cascade
    * ([[LanguageModel.trainKneserNeyN]] at order 3): raw-count
    * discounting at the top order, continuation-TYPE discounting at
    * the middle, the floored continuation unigram at the bottom.
    * The bespoke [[LanguageModel.trainKneserNey3]] remains ONLY as
    * the spec's bit-identity witness (LanguageModelSpec pins the two
    * paths' scores equal bit for bit); serving goes through the one
    * order-generic code path so kn3 and kn5 share every physical-plan
    * and materialization decision. Train + score in the timed body
    * like [[qLmXentKn]]; self-scoring keeps every leg's joined counts
    * seen, so the hash gate pins the full three-level
    * discount/backoff cascade. */
  private def qLmXentKn3(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainKneserNeyN(docs, "text", order = 3)
    LanguageModel.crossEntropyKneserNeyN(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED KN3 model for `dir`'s corpus (minCount = 2) —
    * [[lmKnModelPath]]'s trigram sibling, written once per JVM, in
    * the generic KN-N layout ([[LanguageModel.writeKneserNeyN]]). */
  private val lmKn3ModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmKn3ModelPath(s: SparkSession, dir: String): String =
    cached(lmKn3ModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-kn3-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeKneserNeyN(
        LanguageModel.pruneKneserNeyN(
          LanguageModel.trainKneserNeyN(tbl(s, dir, "documents"), "text",
            order = 3), minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentKn3]]: score against the persisted
    * PRUNED trigram model. Pruned singleton trigrams lose their
    * discounted first term and fall to the continuation-backoff
    * cascade — which stays unpruned and full-corpus, so the oracle
    * replays exactly the coalesce-to-backoff arithmetic and prune +
    * write/read + all three backoff legs sit under the hash gate. */
  private def qLmXentKn3Served(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyKneserNeyN(tbl(s, dir, "documents"), "doc_id",
        "text", LanguageModel.readKneserNeyN(s, lmKn3ModelPath(s, dir)))
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))

  /** 5-gram Kneser-Ney cross-entropy (D = 0.75, β = 0.5) — the
    * [[LanguageModel.trainKneserNeyN]] recursion at the CCNet/KenLM
    * deployment order. Train + score in the timed body like
    * [[qLmXentKn3]]; the oracle replays all FIVE discount/backoff
    * levels ([[knNOracleSql]] generates the CTE cascade for any order,
    * so the SQL is the same recursion the engine runs, not a
    * hand-transcribed approximation of it). */
  private def qLmXentKn5(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainKneserNeyN(docs, "text", order = 5)
    LanguageModel.crossEntropyKneserNeyN(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED KN5 model for `dir`'s corpus (minCount = 2) —
    * [[lmKn3ModelPath]]'s order-5 sibling, written once per JVM. */
  private val lmKn5ModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmKn5ModelPath(s: SparkSession, dir: String): String =
    cached(lmKn5ModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-kn5-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeKneserNeyN(
        LanguageModel.pruneKneserNeyN(
          LanguageModel.trainKneserNeyN(tbl(s, dir, "documents"), "text",
            order = 5), minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentKn5]]: score against the persisted
    * PRUNED order-5 model. Pruned singleton 5-grams lose their
    * discounted first term and fall to the four-level continuation
    * cascade (which stays unpruned and full-corpus), so prune +
    * write/read + every backoff leg of the deployment order sit under
    * the hash gate. */
  private def qLmXentKn5Served(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyKneserNeyN(tbl(s, dir, "documents"), "doc_id",
        "text", LanguageModel.readKneserNeyN(s, lmKn5ModelPath(s, dir)))
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))

  /** MODIFIED Kneser-Ney cross-entropy at order 3 (Chen & Goodman
    * 1999): per-level D₁/D₂/D₃₊ estimated from count-of-counts instead
    * of [[qLmXentKn3]]'s fixed D = 0.75 — the discount fidelity step
    * production CCNet-style gates actually deploy
    * ([[LanguageModel.trainModifiedKneserNeyN]]). Train + score in the
    * timed body; the oracle ([[mknOracleSql]]) independently
    * recomputes the count-of-counts, the Chen-Goodman estimates AND
    * the three-bucket backoff weights as SQL CTEs, so the discount
    * estimation itself sits under the hash gate, not just the scan. */
  private def qLmXentMkn(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainModifiedKneserNeyN(docs, "text", order = 3)
    LanguageModel.crossEntropyModifiedKneserNeyN(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED modified-KN model for `dir`'s corpus (minCount =
    * 2) — [[lmKn3ModelPath]]'s modified sibling; the train-time
    * discount estimates persist with the model, so the served scan
    * never re-derives them. */
  private val lmMknModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmMknModelPath(s: SparkSession, dir: String): String =
    cached(lmMknModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-mkn-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeModifiedKneserNeyN(
        LanguageModel.pruneModifiedKneserNeyN(
          LanguageModel.trainModifiedKneserNeyN(tbl(s, dir, "documents"),
            "text", order = 3), minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentMkn]]: score against the persisted
    * PRUNED modified-KN model. Pruned singleton grams lose their
    * D₁-discounted first term and fall to the backoff cascade — whose
    * bucket weights and discounts keep describing the FULL corpus
    * (they persisted with the model), exactly what the oracle
    * replays. */
  private def qLmXentMknServed(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyModifiedKneserNeyN(tbl(s, dir, "documents"),
        "doc_id", "text",
        LanguageModel.readModifiedKneserNeyN(s, lmMknModelPath(s, dir)))
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))

  /** MODIFIED Kneser-Ney at ORDER 5 — [[qLmXentMkn]] at the CCNet/KenLM
    * deployment order (Chen & Goodman 1999's headline configuration):
    * four continuation levels below the raw 5-gram counts, each with
    * its own count-of-counts-estimated D₁/D₂/D₃₊ (or the per-level
    * thin-histogram fallback — at order 5 the low continuation levels
    * routinely trip it on dense corpora, so the fallback is exercised
    * under the hash gate, not just in specs). Same machinery as order
    * 3 ([[LanguageModel.trainModifiedKneserNeyN]] is
    * order-parameterized); the oracle ([[mknOracleSql]]) generates the
    * full five-level cascade mechanically. */
  private def qLmXentMkn5(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val lm = LanguageModel.trainModifiedKneserNeyN(docs, "text", order = 5)
    LanguageModel.crossEntropyModifiedKneserNeyN(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))
  }

  /** On-disk PRUNED order-5 modified-KN model (minCount = 2) —
    * [[lmMknModelPath]]'s order-5 sibling, written once per JVM. */
  private val lmMkn5ModelCache = collection.concurrent.TrieMap.empty[String, String]
  private def lmMkn5ModelPath(s: SparkSession, dir: String): String =
    cached(lmMkn5ModelCache, dir, {
      val p = new java.io.File(s"target/q-lm-mkn5-model/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      LanguageModel.writeModifiedKneserNeyN(
        LanguageModel.pruneModifiedKneserNeyN(
          LanguageModel.trainModifiedKneserNeyN(tbl(s, dir, "documents"),
            "text", order = 5), minCount = 2), p)
        }
    })

  /** The SERVING twin of [[qLmXentMkn5]]: score against the persisted
    * PRUNED order-5 modified-KN model — pruned singleton 5-grams fall
    * to the four-level cascade whose bucket weights and train-time
    * discount estimates persisted with the model. */
  private def qLmXentMkn5Served(s: SparkSession, dir: String): DataFrame =
    LanguageModel.crossEntropyModifiedKneserNeyN(tbl(s, dir, "documents"),
        "doc_id", "text",
        LanguageModel.readModifiedKneserNeyN(s, lmMkn5ModelPath(s, dir)))
      .select(col("doc_id"), col("n_ngrams"), rq(col("xent"), 6).as("xent"))

  /** Deterministic stratified sampling by `source` (corpus mixing): keep
    * src0 wholesale, src1 at 1/2, src2 at 1/4, everything else at 1/10 —
    * the oracle reproduces the md5-cutoff membership row for row. */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sampleStratified(tbl(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), default = 0.1)
      .select("doc_id", "source")

  /** Temperature mixture sampling over `source` at α = 0.5, budget =
    * half the corpus (floor): this corpus's near-equal strata never cap,
    * so the closed-form single pass `B·n^α/Σn^α/n` is the whole
    * water-filling answer and the oracle replays it directly (the
    * capping loop is spec-territory — TrainingOpsSpec). */
  private def qSampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    TextAnalysis.sampleByTemperature(docs, "doc_id", "source",
        alpha = 0.5, budget = docs.count() / 2)
      .select("doc_id", "source")
  }

  /** Grouped vocabulary: top-5 tokens per language (window rank). */
  private def qVocabByLang(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topTokensByGroup(tbl(s, dir, "documents"), "text", "lang", 5)

  /** Sequence packing: docs → fixed-capacity token bins, 8 shards. */
  private def qPackBins(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packBins(tbl(s, dir, "documents"), "doc_id", "text",
        capacity = 256, shards = 8)
      .select("doc_id", "n_tokens", "bin")

  /** Brute-force cosine top-5 for the first 10 vectors. */
  private def qAnnTopK(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** IVF-style top-3 restricted to the query's coarse partition (label). */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding", "label", 3)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** IVF top-3 over the int8-quantized index with exact re-scoring — must
    * return exactly the full-precision answer (recall@k = 1.0 at these
    * settings), so it shares q_ann_ivf's exact-top-k oracle. */
  private def qAnnIvfQ8(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.ivfTopKQuantized(e, e.filter(col("vec_id") < 20), "vec_id",
        "embedding", "label", 3, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** IVF-PQ top-3: product-quantized codes (m = 8 × ksub = 16 — 8
    * bytes/vector, the 32×-vs-fp32 ANN memory story), ADC shortlist
    * within the coarse cell, exact-cosine re-scoring
    * ([[Similarity.ivfTopKPq]]). The oracle replays code ASSIGNMENT
    * (per-subspace argmin against the dumped codebooks) and the ADC
    * arithmetic itself, so the whole product-quantization path — not
    * just its end answer — sits under the hash gate. */
  private def qAnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val cb = pqCodebooks(s, dir)
    Similarity.ivfTopKPq(
        Similarity.buildPqIndex(e, "vec_id", "embedding", "label", cb),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", "label",
        cb, 3, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** On-disk PQ index for `dir`'s embeddings (codes partitioned with
    * their cells ride as plain columns — integer codes round-trip
    * parquet exactly), written once per JVM: [[qAnnPqServed]] serves
    * every query batch from the read-back frame, the deployment steady
    * state, under the SAME oracle as the inline path. */
  private val pqIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def pqIndexPath(s: SparkSession, dir: String): String =
    cached(pqIxCache, dir, {
      val p = new java.io.File(s"target/q-ann-pq/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      Similarity.buildPqIndex(tbl(s, dir, "embeddings"), "vec_id",
          "embedding", "label", pqCodebooks(s, dir))
        .write.mode("overwrite").parquet(p)
        }
    })

  /** [[qAnnPq]]'s SERVING twin: the ADC shortlist answers from the
    * PERSISTED code table — quantize once, serve every batch — and
    * must hash-match the inline path's oracle (codes are integers, so
    * the parquet round-trip is exact; the suite's serve-not-build
    * pattern on the PQ side). */
  private def qAnnPqServed(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.ivfTopKPq(s.read.parquet(pqIndexPath(s, dir)),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", "label",
        pqCodebooks(s, dir), 3, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** OPQ top-3 (Ge et al. 2013): [[qAnnPq]] behind the LEARNED rotation —
    * codes and ADC both live in the rotated space, exact re-scoring in
    * the original one. The oracle replays the WHOLE optimized path from
    * the dumped matrices: every corpus vector's rotation (the
    * sequential-fold dot products DuckDB's list_sum reproduces
    * bit-identically), per-subspace code assignment in rotated space,
    * the query's rotated ADC table, the rounded shortlist, exact
    * re-scoring — so the rotation arithmetic itself sits under the hash
    * gate, not just its end answer. */
  private def qAnnOpq(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val (rot, cb) = opqModel(s, dir)
    Similarity.ivfTopKOpq(
        Similarity.buildOpqIndex(e, "vec_id", "embedding", "label", rot, cb),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", "label",
        rot, cb, 3, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** On-disk OPQ index for `dir`'s embeddings (rotated-space codes ride
    * as integer columns — exact parquet round-trip), written once per
    * JVM; [[qAnnOpqServed]] serves every batch from the read-back frame
    * under the SAME oracle as the inline path. */
  private val opqIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def opqIndexPath(s: SparkSession, dir: String): String =
    cached(opqIxCache, dir, {
      val p = new java.io.File(s"target/q-ann-opq/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val (rot, cb) = opqModel(s, dir)
      Similarity.buildOpqIndex(tbl(s, dir, "embeddings"), "vec_id",
          "embedding", "label", rot, cb)
        .write.mode("overwrite").parquet(p)
        }
    })

  /** [[qAnnOpq]]'s SERVING twin: the rotated-space ADC shortlist answers
    * from the PERSISTED code table — rotate + quantize once, serve every
    * batch — and must hash-match the inline path's oracle. */
  private def qAnnOpqServed(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val (rot, cb) = opqModel(s, dir)
    Similarity.ivfTopKOpq(s.read.parquet(opqIndexPath(s, dir)),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", "label",
        rot, cb, 3, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** The FULL OPQ composition under the hash gate — the learned
    * `OPQ → IVF → residual-PQ` index ([[Similarity.writeLearnedOpqIndex]],
    * FAISS's production factory shape) served end to end from its path
    * ([[Similarity.serveOpqIndex]]): queries rotate once, multi-probe
    * their 2 nearest ROTATED-space cells partition-pruned into the
    * read, per-cell rotated residual ADC, exact re-score on ORIGINAL
    * vectors. The oracle re-derives EVERYTHING from the three dumped
    * matrices alone — rotated corpus vectors, coarse assignment, probe
    * fan-out, residual codes, the query's per-cell residual ADC, the
    * rounded shortlist, the original-space re-score — so the whole
    * composition (not just its answer) sits under the gate. */
  private def qAnnOpqRes(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.serveOpqIndex(opqLearnedIndexPath(s, dir),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nprobe = 2, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** RESIDUAL IVF-PQ top-3 — [[qAnnPq]] at production IVF-PQ semantics
    * (Jégou 2011 §V-C, the FAISS `IVFPQ` default): codes quantize each
    * vector's RESIDUAL to its learned coarse centroid, queries
    * multi-probe their 2 nearest cells, and within each probed cell the
    * ADC runs between the query's residual TO THAT CELL and the
    * candidates' residual codes. The oracle replays the whole path from
    * the dumped centroid matrix + residual codebooks: residual
    * subtraction, per-subspace code assignment, per-cell query
    * residuals over the dumped probe fan-out, rounded ADC shortlist,
    * exact re-scoring. */
  private def qAnnPqRes(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val cents = kmeansCentroids(s, dir)
    val cb = pqResCodebooks(s, dir)
    Similarity.ivfTopKPqResidual(
        Similarity.buildPqIndexResidual(e, "vec_id", "embedding", cents, cb),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding", cents,
        cb, 3, nprobe = 2, candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** On-disk residual-PQ index for `dir`'s embeddings — (vec_id, coarse,
    * pq_codes): the cell id travels with the codes (a residual code is
    * meaningless without its centroid), written once per JVM. */
  private val pqResIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def pqResIndexPath(s: SparkSession, dir: String): String =
    cached(pqResIxCache, dir, {
      val p = new java.io.File(s"target/q-ann-pq-res/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      Similarity.buildPqIndexResidual(tbl(s, dir, "embeddings"), "vec_id",
          "embedding", kmeansCentroids(s, dir), pqResCodebooks(s, dir))
        .write.mode("overwrite").parquet(p)
        }
    })

  /** [[qAnnPqRes]]'s SERVING twin: encode once, serve every query batch
    * from the persisted residual code table — same oracle (integer
    * codes round-trip parquet exactly). */
  private def qAnnPqResServed(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.ivfTopKPqResidual(s.read.parquet(pqResIndexPath(s, dir)),
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        kmeansCentroids(s, dir), pqResCodebooks(s, dir), 3, nprobe = 2,
        candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** On-disk LEARNED residual-PQ layout for `dir`
    * ([[Similarity.writeLearnedPqIndex]]: codes partitioned by cell,
    * BOTH quantizers riding with the index, epoch-committed), built once
    * per JVM from the SAME persisted centroid matrix + residual
    * codebooks the oracle dumps replay. */
  private val pqLayoutCache = collection.concurrent.TrieMap.empty[String, String]
  private def pqLayoutPath(s: SparkSession, dir: String): String =
    cached(pqLayoutCache, dir, {
      val p = new java.io.File(s"target/q-ann-pq-layout/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      Similarity.writeLearnedPqIndex(tbl(s, dir, "embeddings"), "vec_id",
        "embedding", p, kmeansCentroids(s, dir), pqResCodebooks(s, dir))
        }
    })

  /** [[qAnnPqRes]] answered from the PARTITION-PRUNED on-disk layout
    * ([[Similarity.servePqIndex]]: quantizers loaded from the path,
    * probed cells pruned into the file listing, committed-epoch filter)
    * under the SAME oracle — the layout changes which files are listed
    * and scanned, never the answer (pruning is exact: the ADC join is
    * on the cell). The PQ counterpart of q_ann_ivf_pruned. */
  private def qAnnPqResPruned(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.servePqIndex(pqLayoutPath(s, dir), e,
        e.filter(col("vec_id") < 20), "vec_id", "embedding", 3, nprobe = 2,
        candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** q_ann_ivf_q8's answer served from the ON-DISK partition-pruned
    * layout ([[Similarity.writeIvfIndex]] + [[Similarity.ivfTopKQuantizedPruned]])
    * under the SAME oracle — the layout changes which files are listed
    * and scanned, never the answer (pruning is exact: stage 1 joins on
    * the cell, so an unprobed cell cannot contribute a candidate). The
    * ANN counterpart of q_dedup_index_banded: both serving layouts are
    * hash-checked against the frame-level path, not just spec'd. The
    * index is built once per dir ([[ivfIndexPath]]) outside the timed
    * body, so the bench number is the per-batch serving steady state. */
  private def qAnnIvfPruned(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.ivfTopKQuantizedPruned(ivfIndexPath(s, dir), e,
        e.filter(col("vec_id") < 20), "vec_id", "embedding", "label", 3,
        candidateFactor = 4)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** Learned IVF end to end: [[Similarity.kmeansFit]] centroids (engine
    * side), corpus labeled by nearest centroid, queries fanned out to
    * their 2 nearest cells ([[Similarity.withProbeLabels]] — the recall
    * dial), per-cell exact-cosine top-3. Oracle: DuckDB reproduces the
    * cell-restricted join + ranking from the [[KmeansFixture]] label
    * dumps — the centroids themselves are engine-bound, the serving
    * semantics they induce are not. */
  private def qAnnKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val cents = kmeansCentroids(s, dir)
    Similarity.ivfTopK(
        Similarity.withCoarseLabel(e, "embedding", cents),
        Similarity.withProbeLabels(e.filter(col("vec_id") < 20), "embedding",
          cents, nprobe = 2),
        "vec_id", "embedding", "coarse", 3)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** The whole production ANN serving story in ONE call, under the same
    * oracle as q_ann_kmeans: learned quantizer (loaded FROM the index —
    * [[Similarity.serveIvfIndex]] threads nothing), on-disk
    * partition-pruned layout, int8 stage-1 shortlist, exact re-scoring.
    * Every composition layer is separately oracle-checked (q_ann_kmeans:
    * learned cells; q_ann_ivf_q8: quantized shortlist; q_ann_ivf_pruned:
    * pruned disk serving) — this query checks their COMPOSITION returns
    * the bit-identical answer. Index built once per dir
    * ([[learnedIvfPath]]) from the same centroid matrix the oracle
    * fixture dumps, so cells and labels agree by construction. */
  private def qAnnServe(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.serveIvfIndex(learnedIvfPath(s, dir), e,
        e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 3, nprobe = 2)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** q_ann_serve's INGEST-LIFECYCLE twin, same oracle: the served index
    * was grown through [[Similarity.appendToIvfIndex]] (build over a
    * third of the corpus, two epoch-committed appends for the rest —
    * [[ingestIvfPath]]) instead of built in one shot. Appends label with
    * the riding quantizer, so the grown index holds row-for-row what the
    * full build holds and the serve must return the bit-identical
    * answer — the append path's correctness pinned by the SAME DuckDB
    * replay that pins the build path's. */
  private def qAnnIngest(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.serveIvfIndex(ingestIvfPath(s, dir), e,
        e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 3, nprobe = 2)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** q_ann_serve's DELETION twin: the index lost every 5th vector to a
    * [[Similarity.deleteFromIvfIndex]] tombstone ([[deletedIvfPath]]),
    * and serving must answer as if those rows were never indexed — the
    * oracle replays the cell-restricted ranking over the fixture corpus
    * MINUS the same ids. Deleted ids still QUERY (a query needn't be
    * indexed); they just can never be answers. The takedown path inside
    * the correctness gate, like the append path before it. */
  private def qAnnDelete(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    Similarity.serveIvfIndex(deletedIvfPath(s, dir), e,
        e.filter(col("vec_id") < 20), "vec_id", "embedding", k = 3, nprobe = 2)
      .withColumn("cosine", rq(col("cosine"), 6))
  }

  /** Int8 quantization round-trip, exploded per element so the oracle
    * compares code-for-code: the half-up `floor(x/s + 0.5)` formula is
    * closed-form IEEE arithmetic both engines compute bit-identically,
    * and `in_bound` pins the dequantization error ≤ s/2 guarantee. */
  private def qEmbedQuantize(s: SparkSession, dir: String): DataFrame = {
    // zip code+element BEFORE exploding: each exploded row then carries one
    // (code, x) struct instead of the whole 64-element source array (the
    // element_at(v, pos) form materializes the full vector per output row —
    // 64× the bytes through the explode)
    val q = Similarity.quantizeInt8(tbl(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("q8_scale"),
        posexplode(arrays_zip(col("q8"),
          col("embedding").cast("array<double>").as("x"))))
    q.select(col("vec_id"), col("pos"), col("col.q8").as("code"), col("q8_scale"),
      (abs(col("col.q8").cast("double") * col("q8_scale") - col("col.x")) <=
        col("q8_scale") / 2).cast("int").as("in_bound"))
  }

  /** Token counts + quality-score features. */
  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withQuality(tbl(s, dir, "documents"), "text")
      .select(
        col("doc_id"),
        col("n_tokens"),
        rq(col("punct_ratio"), 6).as("punct_ratio"),
        rq(col("stopword_ratio"), 6).as("stopword_ratio"),
        rq(col("mean_word_len"), 6).as("mean_word_len"),
        rq(col("quality_score"), 6).as("quality_score"))

  /** Marker-token language-ID heuristic. */
  private def qTextLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(tbl(s, dir, "documents"), "text")
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        rq(col("lang_score"), 6).as("lang_score"))

  /** Document fingerprints: md5 of normalized text + min-shingle rolling
    * fingerprint. */
  private def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withFingerprints(tbl(s, dir, "documents"), "text")
      .select("doc_id", "md5_fp", "min_shingle_fp")

  /** Gopher-style repetition quality signals: duplicate-line and
    * duplicate-bigram fractions — boilerplate/spam flags that corpus-level
    * dedup cannot catch (nothing ELSE shares the text). */
  private def qTextRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withRepetition(tbl(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_lines"),
        rq(col("dup_line_frac"), 6).as("dup_line_frac"),
        rq(col("dup_bigram_frac"), 6).as("dup_bigram_frac"))

  /** Context-window chunking: overlapping 64-token windows every 48
    * tokens — the sequence-packing front end of a training pipeline.
    * Chunk text rides as md5 to keep the dump compact. */
  private def qTextChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkTokens(tbl(s, dir, "documents"), "doc_id", "text", 64, 48)
      .select(col("doc_id"), col("chunk_idx"),
        md5(col("chunk_text").cast("binary")).as("chunk_md5"),
        col("chunk_tokens"))

  /** Train-eval decontamination: distinct shared word-3-grams per training
    * doc against a synthetic eval slice (doc_id % 97 == 0) — the GPT-3 /
    * Dolma leakage check as a broadcast-semi-join over hashed shingles. */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    Dedup.contamination(
      docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(97)) === 0),
      "doc_id", "text", 3)
  }

  /** Deterministic md5 train/val/test split — reproducible membership with
    * no rand(), no shuffle; the oracle recomputes the same hex cutoffs. */
  private def qHashSplit(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashSplit(tbl(s, dir, "documents"), "doc_id")
      .select("doc_id", "split")

  /** PII scrubbing: plant a deterministic email/phone/IPv4 per document,
    * then count and redact — RE2-compatible patterns, so the oracle runs
    * the literal same regexes. Redacted text rides as md5. */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = tbl(s, dir, "documents").withColumn("text2",
      concat(col("text"),
        lit(" contact u"), id.cast("string"), lit("@mail.example.com or 555-"),
        lpad(pmod(id, lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(id, lit(10000)).cast("string"), 4, "0"),
        lit(" from 10.0."), pmod(id, lit(256)).cast("string"), lit("."),
        pmod(id * 7, lit(256)).cast("string")))
    TextAnalysis.withPiiRedaction(planted, "text2")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted").cast("binary")).as("red_md5"))
  }

  /** Multimodal asset plumbing: binary payload + typed metadata. Non-image
    * mime ⇒ width/height are null (header sniffing is image-only). */
  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.toAssets(tbl(s, dir, "documents"), "doc_id", "text", "text/plain")
    assets.select(
      col("asset_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      md5(col("content")).as("content_md5"))
  }

  /** Real container-header parsing: PNG/GIF/BMP/JPEG payloads are
    * SYNTHESIZED per document from its doc_id with byte-construction
    * built-ins, then parsed back by `Multimodal.toAssets`' header reader.
    * The oracle computes the planted dimensions arithmetically — a parse
    * bug (endian swap, offset slip, sign error, segment-hop slip) breaks
    * the hash match. BMP heights are stored NEGATIVE for even ids
    * (top-down row order) to pin the two's-complement little-endian path;
    * JPEG dims sit in a SOF segment BEHIND real APP0+COM segments (so the
    * hash only matches if the segment walk hops lengths correctly), with
    * baseline SOF0 for even ids and progressive SOF2 for odd. */
  private def qMultimodalDims(s: SparkSession, dir: String): DataFrame = {
    // little/big-endian byte construction: arithmetic shift + mask works
    // for negative values too (two's complement bytes fall out directly)
    def byteAt(v: Column, i: Int): Column =
      unhex(lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    def be32(v: Column) = concat(byteAt(v, 3), byteAt(v, 2), byteAt(v, 1), byteAt(v, 0))
    def be16(v: Column) = concat(byteAt(v, 1), byteAt(v, 0))
    def le16(v: Column) = concat(byteAt(v, 0), byteAt(v, 1))
    def le32(v: Column) = concat(byteAt(v, 0), byteAt(v, 1), byteAt(v, 2), byteAt(v, 3))

    val id = col("doc_id")
    val w = pmod(id, lit(1920)) + 1
    val h = pmod(id, lit(1080)) + 1
    val hBmpRaw = when(pmod(id, lit(2)) === 0, -h).otherwise(h)

    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val png = concat(
      lit(pngSig ++ Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII")),
      be32(w), be32(h),
      lit(Array[Byte](8, 6, 0, 0, 0, 0, 0, 0, 0))) // depth/color/crc filler
    val gif = concat(
      lit("GIF89a".getBytes("US-ASCII")),
      le16(w), le16(h), lit(Array[Byte](0, 0, 0)))
    val bmp = concat(
      lit("BM".getBytes("US-ASCII") ++ Array.fill[Byte](12)(0) ++
        Array[Byte](40, 0, 0, 0)), // BITMAPINFOHEADER size
      le32(w), le32(hBmpRaw))
    val jpeg = concat(
      lit(Array(0xFF, 0xD8).map(_.toByte) ++                  // SOI
        Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte) ++        // APP0, len 16
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0) ++ Array.fill[Byte](9)(1) ++
        Array(0xFF, 0xFE, 0x00, 0x04).map(_.toByte) ++        // COM, len 4
        "hi".getBytes("US-ASCII")),
      when(pmod(id, lit(2)) === 0, lit(Array(0xFF, 0xC0).map(_.toByte)))
        .otherwise(lit(Array(0xFF, 0xC2).map(_.toByte))),     // SOF0 / SOF2
      lit(Array[Byte](0x00, 0x11, 8)),                        // len 17, precision
      be16(h), be16(w),
      lit(Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))) // 3 components

    val payload = when(pmod(id, lit(4)) === 0, png)
      .when(pmod(id, lit(4)) === 1, gif)
      .when(pmod(id, lit(4)) === 2, bmp)
      .otherwise(jpeg)
    val assets = Multimodal.toAssets(
      tbl(s, dir, "documents").select(id, payload.as("img")),
      "doc_id", "img", "image/sniffed")
    assets.select(
      col("asset_id"),
      when(pmod(col("asset_id"), lit(4)) === 0, "png")
        .when(pmod(col("asset_id"), lit(4)) === 1, "gif")
        .when(pmod(col("asset_id"), lit(4)) === 2, "bmp")
        .otherwise("jpeg").as("fmt"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
  }

  /** A complete uncompressed 24-bit bottom-up BMP synthesized per
    * document from its doc_id with byte-construction built-ins — REAL
    * image files (54-byte BITMAPINFOHEADER container, 4-byte-padded
    * rows), w = doc_id%8+1, h = doc_id%6+1, and planted per-pixel
    * channels r/g/b = linear functions of (doc_id, x, y) mod 256. The
    * pixel array is built as a hex string (one `lpad(hex(v),2)` per
    * byte under a single `transform`) and `unhex`ed — all codegen'd
    * built-ins, no UDF. Shared by [[qMultimodalPixels]] (inline) and
    * [[prepareOracleFixtures]] (the [[BmpFixture]] dump), so the oracle
    * replays the EXACT bytes the engine decodes. */
  private[graft] def bmpPayload(id: Column): Column = {
    def byteAt(v: Column, i: Int): Column =
      unhex(lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    def le16(v: Column) = concat(byteAt(v, 0), byteAt(v, 1))
    def le32(v: Column) = concat(byteAt(v, 0), byteAt(v, 1), byteAt(v, 2), byteAt(v, 3))
    val w = pmod(id, lit(8L)) + 1
    val h = pmod(id, lit(6L)) + 1
    // row stride padded to 4 bytes: floor((3w+3)/4)*4 = (3w+3) − ((3w+3) mod 4)
    val stride = (w * 3 + 3) - pmod(w * 3 + 3, lit(4L))
    val dataLen = stride * h
    val header = concat(
      lit("BM".getBytes("US-ASCII")), le32(dataLen + 54), le32(lit(0L)),
      le32(lit(54L)), // pixel-data offset — the oracle READS this field
      le32(lit(40L)), le32(w), le32(h), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(dataLen), le32(lit(2835L)), le32(lit(2835L)),
      le32(lit(0L)), le32(lit(0L)))
    val pixHex = concat_ws("", transform(sequence(lit(0L), dataLen - 1), i => {
      val fr = floor(i / stride).cast("long") // file row (bottom-up)
      val o = i - fr * stride                 // byte offset within the row
      val y = h - 1 - fr                      // image row (top-down)
      val x = floor(o / 3).cast("long")
      val c = o - x * 3                       // 0=B, 1=G, 2=R (BMP order)
      val v = when(o >= w * 3, lit(0L))       // row padding
        .when(c === 0, pmod(id * 3 + x * 7 + y * 13, lit(256L)))
        .when(c === 1, pmod(id * 5 + x * 11 + y * 3, lit(256L)))
        .otherwise(pmod(id * 7 + x * 5 + y * 17, lit(256L)))
      lpad(hex(v), 2, "0")
    }))
    concat(header, unhex(pixHex))
  }

  /** Per-dir PERSISTED BMP payload table, written once per JVM: the
    * timed query body is then the DECODE — the operator under test —
    * not the byte-construction synthesis (which a deployment never
    * pays per scan; payloads arrive from storage). Identical bytes to
    * the [[BmpFixture]] oracle dump by construction (same
    * [[bmpPayload]] column arithmetic over the same doc_ids). */
  private val bmpCache = collection.concurrent.TrieMap.empty[String, String]
  private def bmpPayloadPath(s: SparkSession, dir: String): String =
    cached(bmpCache, dir, {
      val p = new java.io.File(s"target/q-mm-bmp/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      tbl(s, dir, "documents")
        .select(col("doc_id"), bmpPayload(col("doc_id")).as("img"))
        .write.mode("overwrite").parquet(p)
        }
    })

  /** Grayscale luminance field for the q_image_dedup corpus, in RELATIVE
    * coordinates `u = (x+0.5)/w, v = (y+0.5)/h`: a two-sinusoid sum whose
    * six parameters (two frequency pairs + two phases) are drawn from the
    * doc_id under six DISTINCT prime moduli (97/89/101 and 83/79/103), so
    * two documents share a pattern only when their ids agree under all
    * six — impossible within any testdata corpus (lcm ≈ 5.6·10¹¹). The
    * relative-coordinate form is the point: the SAME field rendered at a
    * different resolution pools to the same 9×8 dHash grid, so a planted
    * rescaled copy collides in Hamming space while unrelated documents'
    * fields (independent frequencies/phases) sit ~32 bits apart. */
  private def synthLum(id: Column, x: Column, y: Column,
                       w: Column, h: Column): Column = {
    // each parameter mixes the id through its own large multiplier before
    // the prime mod (a Knuth-style multiplicative scatter): without it,
    // adjacent ids step ALL SIX parameters by one tiny correlated
    // increment and render near-identical fields — measured as spurious
    // hamming-<=3 collisions between consecutive doc_ids
    def par(mult: Long, m: Int, lo: Double, span: Double): Column =
      lit(lo) + lit(span) * pmod(id * mult, lit(m.toLong)).cast("double") / m.toDouble
    val twoPi = 2.0 * math.Pi
    val u = (x.cast("double") + 0.5) / w.cast("double")
    val v = (y.cast("double") + 0.5) / h.cast("double")
    val s1 = sin(lit(twoPi) * (par(2654435761L, 97, 0.7, 2.0) * u
      + par(2246822519L, 89, 0.7, 2.0) * v) + par(3266489917L, 101, 0.0, twoPi))
    val s2 = sin(lit(twoPi) * (par(668265263L, 83, 0.7, 2.0) * u
      - par(374761393L, 79, 0.7, 2.0) * v) + par(2654435789L, 103, 0.0, twoPi))
    greatest(lit(0L), least(lit(255L),
      round(lit(128.0) + lit(45.0) * s1 + lit(45.0) * s2).cast("long")))
  }

  /** A complete uncompressed 24-bit bottom-up BMP rendering of
    * [[synthLum]] at the document's own resolution (w = 64 + id%32,
    * h = 52 + id%28 — boxes of 7-10 px per dHash grid cell, so the
    * pooled means are stable against the copy's resample grid) — the [[bmpPayload]] byte-construction discipline
    * (header + 4-byte-padded rows, all codegen'd built-ins, no UDF) with
    * the pixel loop nested rows→pixels so the luminance evaluates once
    * per PIXEL (grayscale: the three channel bytes repeat it), not once
    * per byte. */
  private[graft] def synthImagePayload(id: Column): Column = {
    def byteAt(v: Column, i: Int): Column =
      unhex(lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0"))
    def le16(v: Column) = concat(byteAt(v, 0), byteAt(v, 1))
    def le32(v: Column) = concat(byteAt(v, 0), byteAt(v, 1), byteAt(v, 2), byteAt(v, 3))
    val w = pmod(id, lit(32L)) + 64
    val h = pmod(id, lit(28L)) + 52
    val stride = (w * 3 + 3) - pmod(w * 3 + 3, lit(4L))
    val dataLen = stride * h
    val header = concat(
      lit("BM".getBytes("US-ASCII")), le32(dataLen + 54), le32(lit(0L)),
      le32(lit(54L)),
      le32(lit(40L)), le32(w), le32(h), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(dataLen), le32(lit(2835L)), le32(lit(2835L)),
      le32(lit(0L)), le32(lit(0L)))
    // bottom-up file rows: file row fr renders image row y = h-1-fr;
    // per-row zero padding to the 4-byte stride via left() on a literal
    val pixHex = concat_ws("", transform(sequence(lit(0L), h - 1), fr =>
      concat(
        concat_ws("", transform(sequence(lit(0L), w - 1), x =>
          repeat(lpad(hex(synthLum(id, x, h - 1 - fr, w, h)), 2, "0"), 3))),
        left(lit("000000"), ((stride - w * 3) * 2).cast("int")))))
    concat(header, unhex(pixHex))
  }

  /** Persisted q_image_dedup corpus for `dir`, written once per JVM: one
    * base BMP per document ([[synthImagePayload]]) plus, for every fifth
    * document, a PLANTED RESCALED COPY — the base asset run through the
    * REAL [[Multimodal.resizeImages]] operator to a fixed 128×96 target
    * (nearest-neighbor resample + `ImageIO` BMP re-encode at a DIFFERENT
    * resolution and aspect ratio, so the copy shares no bytes with its
    * base and byte-level exact dedup can never pair them), re-identified
    * at `base_id + 10_000_000`. The timed query body is then decode +
    * dHash + banded pairing — the operator under test — not synthesis. */
  private[graft] val ImgCopyOffset = 10000000L
  private val imgDedupCache = collection.concurrent.TrieMap.empty[String, String]
  private def imageCorpusPath(s: SparkSession, dir: String): String =
    cached(imgDedupCache, dir, {
      val p = new java.io.File(s"target/q-img-dedup/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val base = Multimodal.toAssets(
        tbl(s, dir, "documents")
          .select(col("doc_id"), synthImagePayload(col("doc_id")).as("img")),
        "doc_id", "img", "image/bmp")
      val copies = Multimodal.resizeImages(
          base.filter(pmod(col("asset_id"), lit(5)) === 0), 128, 96)
        .select((col("asset_id") + ImgCopyOffset).as("asset_id"),
          col("content"), col("meta"))
      base.unionByName(copies).write.mode("overwrite").parquet(p)
        }
    })

  /** Image near-duplicate dedup ([[Dedup.imageNearDupPairs]]): dHash per
    * decoded raster, then the SAME banded-Hamming machinery as
    * q_dedup_simhash — the dedup story the multimodal pillar needs,
    * because a rescaled/re-encoded copy of the same picture survives
    * byte-level dedup (different bytes, different size, different aspect)
    * and text dedup (no text), yet collides in dHash space. The corpus
    * plants exactly that ([[imageCorpusPath]]). Oracle: the dHash itself
    * is engine-bound (codec + float pooling), but GIVEN the per-image
    * hashes ([[ImageDhashFixture]]), banding + `bit_count` pair
    * derivation is plain SQL — the q_dedup_simhash pattern verbatim. */
  private def qImageDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.imageNearDupPairs(s.read.parquet(imageCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Fixture parquet of per-image dHashes for q_image_dedup's oracle —
    * the [[SimhashFixture]] pattern: GIVEN the hashes, DuckDB replays
    * banding + Hamming filtering. */
  private lazy val ImageDhashFixture =
    new java.io.File("target/verify-fixtures/image_dhash").getAbsolutePath

  /** Fake-PCM "waveform" sample for the q_audio_dedup corpus, in RELATIVE
    * time `t = (i+0.5)/L` — the 1-D [[synthLum]]: a two-tone sum whose
    * four parameters (two frequencies + two phases) scatter from the
    * doc_id under four DISTINCT prime moduli (107/109/113/127, disjoint
    * from the image corpus's six), each behind its own Knuth-style
    * multiplier so adjacent ids share nothing. Frequencies sit HIGH
    * (8–24 and 5–19 cycles per clip): the fingerprint pools the
    * rectified envelope onto 65 frames, and a low-frequency envelope
    * would hold its sign for long runs — low-entropy fingerprints and
    * spurious small-Hamming collisions between unrelated documents. The
    * relative-time form is the point: the SAME tone pair rendered at a
    * different sample count pools to the same 65-frame energy curve, so
    * a resampled copy collides in Hamming space. */
  private def synthPcmSample(id: Column, i: Column, len: Column): Column = {
    def par(mult: Long, m: Int, lo: Double, span: Double): Column =
      lit(lo) + lit(span) * pmod(id * mult, lit(m.toLong)).cast("double") / m.toDouble
    val twoPi = 2.0 * math.Pi
    val t = (i.cast("double") + 0.5) / len.cast("double")
    val s1 = sin(lit(twoPi) * par(2654435761L, 107, 8.0, 16.0) * t
      + par(3266489917L, 109, 0.0, twoPi))
    val s2 = sin(lit(twoPi) * par(2246822519L, 113, 5.0, 14.0) * t
      + par(2654435789L, 127, 0.0, twoPi))
    greatest(lit(0L), least(lit(255L),
      round(lit(128.0) + lit(52.0) * s1 + lit(36.0) * s2).cast("long")))
  }

  /** A complete unsigned-8-bit PCM payload of [[synthPcmSample]] at the
    * document's own length (4000 + id%257 samples — varying, so copies
    * resampled to a FIXED length share a length with nothing) — the
    * [[synthImagePayload]] byte-construction discipline (codegen'd
    * built-ins, hex/unhex packing, no UDF). */
  private[graft] def synthAudioPayload(id: Column): Column = {
    val len = pmod(id, lit(257L)) + lit(4000L)
    unhex(concat_ws("", transform(sequence(lit(0L), len - 1),
      i => lpad(hex(synthPcmSample(id, i, len)), 2, "0"))))
  }

  /** Persisted q_audio_dedup corpus for `dir` — the [[imageCorpusPath]]
    * recipe on the audio axis: one base PCM clip per document plus, for
    * every fifth document, a PLANTED copy run through the REAL
    * [[Multimodal.resamplePcm]] operator (nearest-neighbor resample to a
    * fixed 3000 samples at half gain — different length, different byte
    * values, so byte-level exact dedup can never pair it with its base),
    * re-identified at `base_id + 20_000_000`. The timed query body is
    * fingerprint + banded pairing — the operator under test — not
    * synthesis. */
  private[graft] val AudioCopyOffset = 20000000L
  private val audioDedupCache = collection.concurrent.TrieMap.empty[String, String]
  private def audioCorpusPath(s: SparkSession, dir: String): String =
    cached(audioDedupCache, dir, {
      val p = new java.io.File(s"target/q-audio-dedup/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val base = Multimodal.toAssets(
        tbl(s, dir, "documents")
          .select(col("doc_id"), synthAudioPayload(col("doc_id")).as("pcm")),
        "doc_id", "pcm", "audio/pcm-u8")
      val copies = Multimodal.resamplePcm(
          base.filter(pmod(col("asset_id"), lit(5)) === 0), 3000, gain = 0.5)
        .select((col("asset_id") + AudioCopyOffset).as("asset_id"),
          col("content"), col("meta"))
      base.unionByName(copies).write.mode("overwrite").parquet(p)
        }
    })

  /** Audio near-duplicate dedup ([[Dedup.audioNearDupPairs]]): the
    * multimodal dedup story's third modality — a resampled/re-gained
    * copy of the same clip survives byte-level dedup (different length,
    * different bytes) and text dedup (no text), yet collides in
    * energy-delta fingerprint space. The corpus plants exactly that
    * ([[audioCorpusPath]]). Oracle: the fingerprint is engine-bound
    * (byte framing + float energy pooling), but GIVEN the per-asset
    * fingerprints ([[AudioFpFixture]]), banding + `bit_count` pair
    * derivation is plain SQL — the q_image_dedup pattern verbatim. */
  private def qAudioDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.audioNearDupPairs(s.read.parquet(audioCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Fixture parquet of per-asset audio fingerprints for q_audio_dedup's
    * oracle — the [[ImageDhashFixture]] pattern. */
  private lazy val AudioFpFixture =
    new java.io.File("target/verify-fixtures/audio_afp").getAbsolutePath

  /** Multimodal near-dup VERIFIED pipelines ([[Dedup
    * .imageNearDupPairsVerified]]/[[Dedup.audioNearDupPairsVerified]]):
    * banded-Hamming candidates promoted only when the quantized content
    * features agree — the candidate-generate-verify tail the precision
    * note on the candidate operators calls for at scale. Oracle: GIVEN
    * the dumped hashes AND the dumped quantized grids/curves, the whole
    * pipeline — banding, bit_count radius, per-cell |Δ| integer sum,
    * threshold — is plain SQL (the distances are fixed-point exact by
    * construction, so no IEEE-order ceremony). */
  private def qImageDedupVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.imageNearDupPairsVerified(s.read.parquet(imageCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  private def qAudioDedupVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.audioNearDupPairsVerified(s.read.parquet(audioCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Exploded quantized-feature fixtures for the verified-pair oracles:
    * `(asset_id, cell, qv)` rows, non-null features only. */
  private lazy val ImageGridFixture =
    new java.io.File("target/verify-fixtures/image_qgrid").getAbsolutePath
  private lazy val AudioCurveFixture =
    new java.io.File("target/verify-fixtures/audio_qcurve").getAbsolutePath

  /** Per-frame amplitude-modulated luminance for the video corpus —
    * [[synthLum]]'s field (same six-prime parameter scatter, so
    * unrelated documents render unrelated fields) scaled around the u8
    * midpoint by `amp`: `128 + amp·(45·s1 + 45·s2)`. Frames of one clip
    * share the spatial field and differ by a smooth temporal amplitude
    * ramp — REAL temporal variation (the per-frame grids differ by up to
    * ~30%) that the temporal-mean dHash is exactly invariant to
    * (positive scaling preserves every adjacent-delta sign), so the
    * recall story is pinned by construction while the verify distances
    * stay genuinely frame-aligned. Max |amp·90| at amp 1.15 is 103.5 <
    * 127: the clamp never binds and scaling stays exact. */
  private def synthVideoLum(id: Column, x: Column, y: Column,
                            w: Column, h: Column, amp: Column): Column = {
    def par(mult: Long, m: Int, lo: Double, span: Double): Column =
      lit(lo) + lit(span) * pmod(id * mult, lit(m.toLong)).cast("double") / m.toDouble
    val twoPi = 2.0 * math.Pi
    val u = (x.cast("double") + 0.5) / w.cast("double")
    val v = (y.cast("double") + 0.5) / h.cast("double")
    val s1 = sin(lit(twoPi) * (par(2654435761L, 97, 0.7, 2.0) * u
      + par(2246822519L, 89, 0.7, 2.0) * v) + par(3266489917L, 101, 0.0, twoPi))
    val s2 = sin(lit(twoPi) * (par(668265263L, 83, 0.7, 2.0) * u
      - par(374761393L, 79, 0.7, 2.0) * v) + par(2654435789L, 103, 0.0, twoPi))
    greatest(lit(0L), least(lit(255L),
      round(lit(128.0) + amp * (lit(45.0) * s1 + lit(45.0) * s2)).cast("long")))
  }

  /** HEX string of one complete uncompressed 24-bit bottom-up BMP frame
    * of the video corpus ([[synthVideoLum]] at amplitude
    * `0.85 + 0.3·(f+0.5)/nf` — a smooth ramp over the clip), rendered at
    * the clip's own resolution (w = 48 + id%16, h = 40 + id%12 — 5-7 px
    * per dHash grid cell; smaller than the image corpus because each
    * clip decodes several frames). Hex (not binary) so frames compose
    * under a variable-count `transform` + one trailing `unhex` —
    * otherwise the [[synthImagePayload]] byte-construction discipline
    * (codegen'd built-ins, no UDF). */
  private def synthVideoFrameHex(id: Column, f: Column, nf: Column): Column = {
    def byteHex(v: Column, i: Int): Column =
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0")
    def le16(v: Column) = concat(byteHex(v, 0), byteHex(v, 1))
    def le32(v: Column) = concat(byteHex(v, 0), byteHex(v, 1),
      byteHex(v, 2), byteHex(v, 3))
    val w = pmod(id, lit(16L)) + 48
    val h = pmod(id, lit(12L)) + 40
    val stride = (w * 3 + 3) - pmod(w * 3 + 3, lit(4L))
    val dataLen = stride * h
    val amp = lit(0.85) + lit(0.3) * (f.cast("double") + 0.5) / nf.cast("double")
    val header = concat(
      lit("424D"), le32(dataLen + 54), le32(lit(0L)), le32(lit(54L)),
      le32(lit(40L)), le32(w), le32(h), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(dataLen), le32(lit(2835L)), le32(lit(2835L)),
      le32(lit(0L)), le32(lit(0L)))
    val pixHex = concat_ws("", transform(sequence(lit(0L), h - 1), fr =>
      concat(
        concat_ws("", transform(sequence(lit(0L), w - 1), x =>
          repeat(lpad(hex(synthVideoLum(id, x, h - 1 - fr, w, h, amp)), 2, "0"), 3))),
        left(lit("000000"), ((stride - w * 3) * 2).cast("int")))))
    concat(header, pixHex)
  }

  /** A complete concatenated-BMP video payload: `3 + (id/3)%3` frames
    * (3-5 — id is always a multiple of 3 in the corpus, so the count
    * must scatter off id/3) of [[synthVideoFrameHex]] back to back,
    * plus — for every 11th clip — a MALFORMED TAIL ("BM" + a size field
    * claiming ~10 MB + 48 zero bytes: magic and header length check out,
    * the declared extent does not), so the frame walk's honest-stop rule
    * sits inside the oracle-replayed corpus, not just the spec. */
  private[graft] def synthVideoPayload(id: Column): Column = {
    val nf = pmod(floor(id / 3).cast("long"), lit(3L)) + 3
    val frames = concat_ws("",
      transform(sequence(lit(0L), nf - 1), f => synthVideoFrameHex(id, f, nf)))
    val tail = when(pmod(id, lit(33L)) === 0,
      lit("424D" + "7F969800" + "00" * 48)).otherwise(lit(""))
    unhex(concat(frames, tail))
  }

  /** Persisted q_video_dedup corpus for `dir` — the [[imageCorpusPath]]
    * recipe on the video axis: one base clip per every-3rd document
    * (bounding the suite's per-frame decode volume) plus, for every
    * fifth clip, a PLANTED copy run through the REAL
    * [[Multimodal.transcodeVideo]] operator (temporal resample to a
    * fixed 4 frames + spatial resample to 96×72 + re-encode — different
    * frame count, resolution, aspect, and bytes, so byte-level exact
    * dedup can never pair it with its base), re-identified at
    * `base_id + 40_000_000`. targetFrames equals the fingerprint's
    * sample count, so the copy's sampled frames land on exactly the
    * base frames the base's own sampling reads (floor-composition — see
    * [[Multimodal.VideoSampleFrames]]) and the only plant noise is
    * spatial pooling, the image-corpus regime. */
  private[graft] val VideoCopyOffset = 40000000L
  private val videoDedupCache = collection.concurrent.TrieMap.empty[String, String]
  private def videoCorpusPath(s: SparkSession, dir: String): String =
    cached(videoDedupCache, dir, {
      val p = new java.io.File(s"target/q-video-dedup/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val base = Multimodal.toAssets(
        tbl(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(col("doc_id"), synthVideoPayload(col("doc_id")).as("vid")),
        "doc_id", "vid", "video/x-graft-bmpseq")
      val copies = Multimodal.transcodeVideo(
          base.filter(pmod(col("asset_id"), lit(15)) === 0),
          Multimodal.VideoSampleFrames, 96, 72)
        .select((col("asset_id") + VideoCopyOffset).as("asset_id"),
          col("content"), col("meta"))
      base.unionByName(copies).write.mode("overwrite").parquet(p)
        }
    })

  /** Video frame-walk metadata ([[Multimodal.videoFrameMeta]]): the REAL
    * container parse — each frame found via its own header's size field,
    * per-frame dims read from its BITMAPINFOHEADER, the walk stopping
    * honestly at the planted malformed tails. Oracle: the walk is
    * replayed FROM THE PAYLOAD BYTES in DuckDB — a recursive CTE over
    * the blob's hex dump reads the same size fields, applies the same
    * magic/extent guards, and emits the same per-frame rows (the
    * q_multimodal_pixels no-codec-on-the-oracle-side discipline extended
    * from fixed offsets to a data-dependent walk). */
  private def qVideoFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameMeta(s.read.parquet(videoCorpusPath(s, dir)))

  /** Fixture parquet of the raw video payloads for q_video_frames's
    * oracle walk (asset_id + content only — the oracle parses bytes). */
  private lazy val VideoPayloadFixture =
    new java.io.File("target/verify-fixtures/video_payloads").getAbsolutePath

  /** Video near-duplicate dedup ([[Dedup.videoNearDupPairs]]): the
    * multimodal dedup story's fourth modality — a transcoded copy of the
    * same clip (fewer frames, smaller resolution, different aspect)
    * survives byte-level dedup and per-image dedup (no single frame's
    * bytes repeat), yet collides in temporal-mean dHash space. The
    * corpus plants exactly that ([[videoCorpusPath]]). Oracle: the hash
    * is engine-bound (codec + float pooling over sampled frames), but
    * GIVEN the per-clip hashes ([[VideoHashFixture]]), banding +
    * `bit_count` pair derivation is plain SQL — the q_image_dedup
    * pattern verbatim. */
  private def qVideoDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.videoNearDupPairs(s.read.parquet(videoCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Fixture parquet of per-clip temporal-mean dHashes for
    * q_video_dedup's oracle — the [[ImageDhashFixture]] pattern. */
  private lazy val VideoHashFixture =
    new java.io.File("target/verify-fixtures/video_vhash").getAbsolutePath

  private def qVideoDedupVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.videoNearDupPairsVerified(s.read.parquet(videoCorpusPath(s, dir)))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Exploded quantized temporally-aligned grid fixture for the video
    * verified-pair oracle: `(asset_id, cell, qv)` with cell = j·72 + c —
    * [[mmVerifiedOracleSql]] carries verbatim because the temporal
    * alignment is IN the cell key. */
  private lazy val VideoGridFixture =
    new java.io.File("target/verify-fixtures/video_qgrid").getAbsolutePath

  private def qVideoDedupKeep(s: SparkSession, dir: String): DataFrame =
    Dedup.videoNearDupKeep(s.read.parquet(videoCorpusPath(s, dir)))

  /** NEW image batch for the hash-index serving queries: transcoded
    * copies of every 7th document's base image (the REAL
    * [[Multimodal.resizeImages]] operator to a 96×72 target — different
    * resolution and aspect, no shared bytes), re-identified at
    * `base_id + 30_000_000` — the ingest-batch twin of
    * [[imageCorpusPath]]'s plants, persisted once per JVM so the timed
    * body is hash + serve, never synthesis or transcode. */
  private[graft] val ImgBatchOffset = 30000000L
  private val imgBatchCache = collection.concurrent.TrieMap.empty[String, String]
  private def imageBatchPath(s: SparkSession, dir: String): String =
    cached(imgBatchCache, dir, {
      val p = new java.io.File(s"target/q-img-batch/${dirKey(dir)}").getAbsolutePath
        reusableLayout(p) {
      val base = Multimodal.toAssets(
        tbl(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), synthImagePayload(col("doc_id")).as("img")),
        "doc_id", "img", "image/bmp")
      Multimodal.resizeImages(base, 96, 72)
        .select((col("asset_id") + ImgBatchOffset).as("asset_id"),
          col("content"), col("meta"))
        .write.mode("overwrite").parquet(p)
        }
    })

  /** Persisted image HASH-INDEX tables for `dir`, grown once per JVM
    * through the FULL maintenance lifecycle ([[ingestBandedTable]]'s
    * multimodal mirror): [[Dedup.writeHashIndex]] over a third of the
    * corpus's dHashes, one plain append and one idempotent append (whose
    * REPLAY no-ops — exercised right here, so every serve of this table
    * also rides on the at-least-once protocol having held), every 50th
    * asset tombstoned, then compacted (tombstones physical, keys
    * re-pointed). The corpus is hashed ONCE (one decode pass,
    * checkpointed 16 B/asset) for the whole cycle. */
  private val imgHashIxCache = collection.concurrent.TrieMap.empty[String, String]
  private def imageHashIndexTable(s: SparkSession, dir: String): String =
    cached(imgHashIxCache, dir, {
      val name = "graft_q_img_hash_ix_" + dirKey(dir)
      val assets = s.read.parquet(imageCorpusPath(s, dir))
      val hashes = graft.operators.Materialize.eagerCheckpoint(
        Dedup.imageHashes(assets))
      def slice(r: Int) = hashes.filter(pmod(col("sh_id"), lit(3)) === r)
      Dedup.writeHashIndex(slice(0), name, buckets = 32)
      Dedup.appendToHashIndex(slice(1), name)
      assert(Dedup.appendToHashIndexIdempotent(slice(2), name, "batch_0"))
      assert(!Dedup.appendToHashIndexIdempotent(slice(2), name, "batch_0"),
        s"$name: replayed append key must no-op")
      Dedup.deleteFromHashIndex(
        assets.filter(pmod(col("asset_id"), lit(50)) === 0).select("asset_id"),
        name, "asset_id")
      Dedup.compactHashIndex(s, name)
      name
    })

  /** Incremental multimodal dedup serving ([[Dedup
    * .pairsAgainstHashIndex]]): a NEW batch of transcoded image assets
    * hashed once and paired against the PERSISTED banded dHash table —
    * the ingest economics the batch self-join queries (q_image_dedup)
    * cannot express: the corpus is never re-decoded or re-paired, only
    * the batch moves. The served table was grown through the full
    * lifecycle (build → appends with a replayed idempotency key → delete
    * → compact, [[imageHashIndexTable]]), so this one oracle pins every
    * maintenance path's contents. Oracle: GIVEN the dumped corpus and
    * batch dHashes, banding + `bit_count` radius + the deletion
    * predicate are plain SQL. */
  private def qImageDedupIndex(s: SparkSession, dir: String): DataFrame =
    Dedup.imagePairsAgainstHashIndex(
        s.read.parquet(imageBatchPath(s, dir)),
        imageHashIndexTable(s, dir))
      .withColumn("hamming", col("hamming").cast("long"))

  /** Fixture parquet of the NEW batch's dHashes for q_image_dedup_index's
    * oracle — the [[ImageDhashFixture]] pattern on the batch side. */
  private lazy val ImageBatchDhashFixture =
    new java.io.File("target/verify-fixtures/image_batch_dhash").getAbsolutePath

  /** Multimodal KEEP-SET resolution ([[Dedup.imageNearDupKeep]]): the
    * verified near-dup pairs resolved to connected components, one
    * representative (min asset id) kept per cluster, unpaired assets
    * kept — the end state a curation pipeline consumes (drop all but one
    * of each near-dup group), composing the multimodal pair machinery
    * with the SAME cluster resolution q_dedup_clusters pins for text.
    * Oracle: the verified-pair replay ([[mmVerifiedOracleSql]]) extended
    * by a recursive-CTE connected components + min-rep keep rule — the
    * q_dedup_clusters SQL pattern verbatim. */
  private def qImageDedupKeep(s: SparkSession, dir: String): DataFrame =
    Dedup.imageNearDupKeep(s.read.parquet(imageCorpusPath(s, dir)))

  private def qAudioDedupKeep(s: SparkSession, dir: String): DataFrame =
    Dedup.audioNearDupKeep(s.read.parquet(audioCorpusPath(s, dir)))

  /** Generated DuckDB oracle for the verified multimodal pair queries:
    * banding + Hamming radius over the dumped 64-bit hashes (the
    * q_dedup_simhash replay), then the fixed-point feature distance per
    * candidate (per-cell equi-join, ABS-diff integer SUM) thresholded
    * exactly as the engine's `maxQDist`. */
  private def mmVerifiedOracleSql(hashFixture: String, hashCol: String,
                                  featFixture: String, maxQDist: Long): String = {
    val maxHamming = Dedup.MmMaxHamming
    s"""WITH h AS (
      |  SELECT asset_id AS sh_id, $hashCol AS simhash
      |  FROM read_parquet('$hashFixture/*.parquet')
      |  WHERE $hashCol IS NOT NULL),
      | b AS (
      |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
      |  FROM h CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
      | p AS (
      |  SELECT DISTINCT a.sh_id AS id_a, b2.sh_id AS id_b,
      |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
      |  FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
      |   AND a.sh_id < b2.sh_id),
      | g AS (
      |  SELECT asset_id, cell, qv FROM read_parquet('$featFixture/*.parquet')),
      | d AS (
      |  SELECT p.id_a, p.id_b, p.hamming,
      |         SUM(ABS(ga.qv - gb.qv)) AS qdist
      |  FROM p
      |  JOIN g ga ON ga.asset_id = p.id_a
      |  JOIN g gb ON gb.asset_id = p.id_b AND gb.cell = ga.cell
      |  WHERE p.hamming <= $maxHamming
      |  GROUP BY p.id_a, p.id_b, p.hamming)
      |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming,
      |       CAST(qdist AS BIGINT) AS qdist
      |FROM d WHERE qdist <= $maxQDist""".stripMargin
  }

  /** Generated DuckDB oracle for the multimodal KEEP-SET queries: the
    * verified-pair replay ([[mmVerifiedOracleSql]], nested as a CTE)
    * resolved by the q_dedup_clusters recursive-CTE connected components,
    * each member keeping its component minimum — every asset (null-hash
    * ones included: unhashable assets are never candidates, so they
    * always survive) minus the non-representative members. */
  private def mmKeepOracleSql(hashFixture: String, hashCol: String,
                              featFixture: String, maxQDist: Long): String =
    s"""WITH pairs AS (
      |${mmVerifiedOracleSql(hashFixture, hashCol, featFixture, maxQDist)}),
      | e AS (SELECT id_a AS u, id_b AS v FROM pairs
      |       UNION SELECT id_b, id_a FROM pairs),
      | r AS (
      |   WITH RECURSIVE reach(u, v) AS (
      |     SELECT u, v FROM e
      |     UNION
      |     SELECT reach.u, e.v FROM reach JOIN e ON reach.v = e.u)
      |   SELECT u, v FROM reach),
      | losers AS (
      |   SELECT u AS member FROM r GROUP BY u
      |   HAVING u <> least(u, min(v)))
      |SELECT asset_id FROM read_parquet('$hashFixture/*.parquet')
      |WHERE asset_id NOT IN (SELECT member FROM losers)""".stripMargin

  /** Generated DuckDB oracle for q_video_frames: the concatenated-BMP
    * frame walk replayed FROM THE PAYLOAD BYTES — a recursive CTE over
    * each blob's hex dump reads the size field at the current offset,
    * applies the engine's guards (magic "BM", 54-byte header present,
    * declared size ≥ 54 and within the payload), advances, and emits
    * per-frame dims from each frame's own BITMAPINFOHEADER. Assets whose
    * walk yields no frames keep one null row (LEFT JOIN), matching the
    * engine's reported-never-dropped rule. No codec, no fixture of
    * engine outputs — the oracle input is the raw bytes. */
  private def videoFramesOracleSql(payloadFixture: String): String = {
    // byte at 0-based offset `p` (a SQL expression) of hex dump `hx`.
    // TRY_CAST, not CAST: at the walk's natural stop (off+sz = n) the
    // size-field read lands past the payload end — substring yields ''
    // and a plain CAST of '0x' raises; the query only survived because
    // DuckDB happened to evaluate the bounds conjunct first (r18 ADVICE).
    // TRY_CAST's NULL fails the >= 54 guard harmlessly under ANY filter
    // evaluation order, and equals CAST wherever the bytes exist.
    def byteAt(hx: String, p: String) =
      s"TRY_CAST(concat('0x', substring($hx, CAST(2*($p)+1 AS INT), 2)) AS BIGINT)"
    def leU32(hx: String, p: String) =
      (0 to 3).map(k => s"${byteAt(hx, s"($p)+$k")} * ${1L << (8 * k)}")
        .mkString("(", " + ", ")")
    // signed LE i32 → |value| (BMP height may be negative = top-down).
    // The i32-minimum corner is pinned to the ENGINE's semantics
    // (math.abs(Int.MinValue) = Int.MinValue, surfaced as-is): a hostile
    // 0x80000000 dim yields -2147483648 on both sides instead of an
    // out-of-range error from CAST(2147483648 AS INT) (r18 ADVICE).
    def absI32(hx: String, p: String) = {
      val signed = s"(CASE WHEN ${leU32(hx, p)} >= 2147483648 " +
        s"THEN ${leU32(hx, p)} - 4294967296 ELSE ${leU32(hx, p)} END)"
      s"(CASE WHEN $signed = -2147483648 THEN CAST(-2147483648 AS INT) " +
        s"ELSE CAST(ABS($signed) AS INT) END)"
    }
    // the size field lives at frame offset + 2 (after the "BM" magic)
    val sz0 = leU32("hx", "2")
    val szN = leU32("v.hx", "w.off + w.sz + 2")
    s"""WITH RECURSIVE v AS (
      |  SELECT asset_id, hex(content) AS hx, octet_length(content) AS n
      |  FROM read_parquet('$payloadFixture/*.parquet')),
      | w(asset_id, frame_idx, off, sz) AS (
      |  SELECT asset_id, 0, CAST(0 AS BIGINT), $sz0
      |  FROM v
      |  WHERE n >= 54 AND substring(hx, 1, 4) = '424D'
      |    AND $sz0 >= 54 AND $sz0 <= n
      |  UNION ALL
      |  SELECT w.asset_id, w.frame_idx + 1, w.off + w.sz, $szN
      |  FROM w JOIN v USING (asset_id)
      |  WHERE w.off + w.sz + 54 <= v.n
      |    AND substring(v.hx, CAST(2*(w.off + w.sz)+1 AS INT), 4) = '424D'
      |    AND $szN >= 54 AND w.off + w.sz + $szN <= v.n),
      | f AS (
      |  SELECT w.asset_id, CAST(w.frame_idx AS INT) AS frame_idx,
      |         w.off AS frame_off, w.sz AS frame_bytes,
      |         ${absI32("v.hx", "w.off + 18")} AS width,
      |         ${absI32("v.hx", "w.off + 22")} AS height
      |  FROM w JOIN v USING (asset_id))
      |SELECT v.asset_id, f.frame_idx, f.frame_off, f.frame_bytes,
      |       f.width, f.height
      |FROM v LEFT JOIN f USING (asset_id)""".stripMargin
  }

  /** Trained-and-persisted quality classifier for `dir`, built once per
    * JVM — the served-layout cache pattern ([[ivfIndexPath]] rationale:
    * a deployment trains once and serves every batch from the committed
    * weights, so the timed query body is SCORING; the train pass runs
    * here, untimed, like every other layout build). Labels distill the
    * engine's own heuristic gate ([[TextAnalysis.withQuality]] at the
    * 0.5 threshold) — the weak-supervision shape real pipelines use to
    * turn a hand gate into a single cheap linear scorer. */
  private val qcModelCache =
    collection.concurrent.TrieMap.empty[String, TextClassifier.QuantModel]
  private def qcModel(s: SparkSession, dir: String): TextClassifier.QuantModel =
    cached(qcModelCache, dir, {
      val path = new java.io.File(s"target/q-quality-model/${dirKey(dir)}")
        .getAbsolutePath
      // persist-once across JVMs: GD training is deterministic per layout
      // but carries no cross-JVM bit-identity promise, so under reuse a
      // completed saved model is LOADED, never refit — the same
      // persistence contract as kmeansCentroids, now epoch-marked
      reusableLayout(path) {
        val labeled = TextAnalysis.withQuality(tbl(s, dir, "documents"), "text")
          .select(col("doc_id"), col("text"),
            (col("quality_score") >= 0.5).cast("int").as("label"))
        TextClassifier.save(
          TextClassifier.train(labeled, "text", "label",
            dim = QcDim, iters = 12, lr = 0.5),
          path, s)
      }
      TextClassifier.load(s, path)
    })
  private val QcDim = 1 << 16

  /** Trained quality classifier ([[TextClassifier]]): fasttext-style
    * linear gate over hashed presence unigrams, served from fixed-point
    * weights so the margin is an EXACT integer sum. Oracle: training is
    * engine-bound (distributed GD), but GIVEN the dumped quantized
    * weight table, bias, and per-doc feature slots
    * ([[QcWeightsFixture]]/[[QcFeatFixture]]), every served margin is a
    * plain SQL left-join + SUM, and the probability is the same per-row
    * sigmoid both engines round through [[rq]]. */
  private def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val m = qcModel(s, dir)
    TextClassifier.score(tbl(s, dir, "documents"), "doc_id", "text", m)
      .select(col("doc_id"), col("margin_q"), rq(col("p"), 6).as("p"))
  }

  /** Fixtures for q_quality_classifier's oracle: the model's nonzero
    * quantized weights + bias ([[qcModel]]'s committed tables re-dumped
    * flat) and every document's feature SLOTS (outer-exploded, so a
    * featureless doc still reaches the oracle and serves exactly the
    * bias). */
  private lazy val QcWeightsFixture =
    new java.io.File("target/verify-fixtures/qc_weights").getAbsolutePath
  private lazy val QcFeatFixture =
    new java.io.File("target/verify-fixtures/qc_feats").getAbsolutePath
  private lazy val QcMetaFixture =
    new java.io.File("target/verify-fixtures/qc_meta").getAbsolutePath

  /** REAL pixel decode under the hash gate: a complete uncompressed BMP
    * per document ([[bmpPayload]], persisted once per dir — the timed
    * body reads payloads and DECODES, the deployment steady state),
    * decoded with the JDK's `javax.imageio` codec
    * ([[Multimodal.decodePixels]] — real pixels, not a fake), each
    * raster reduced to exact integer channel sums. The oracle gets the
    * SAME payload bytes ([[BmpFixture]]) but no codec: it reads the
    * header's data-offset / width / height fields out of the blob,
    * slices every pixel byte at its computed (row-padded, bottom-up)
    * position, and recomputes the sums — a full independent replay of
    * the decode arithmetic, the q_multimodal_dims discipline extended
    * from headers to pixels. */
  private def qMultimodalPixels(s: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.toAssets(
      s.read.parquet(bmpPayloadPath(s, dir)), "doc_id", "img", "image/bmp")
    def chanSum(shift: Int) = aggregate(
      transform(col("pixels"),
        p => shiftright(p, shift).bitwiseAND(lit(255)).cast("long")),
      lit(0L), (a, x) => a + x)
    Multimodal.decodePixels(assets).select(
      col("asset_id"), col("width"), col("height"),
      size(col("pixels")).as("n_px"),
      chanSum(16).as("sum_r"), chanSum(8).as("sum_g"), chanSum(0).as("sum_b"))
  }

  /** Multimodal feature extraction — text payloads take the REAL
    * byte-histogram featurizer ([[Multimodal.extractFeatures]]'s
    * non-image path; the image path's `javax.imageio` decode sits under
    * q_multimodal_pixels' gate). Oracle-checked via
    * [[MultimodalFixture]]: the float32 normalization is engine-bound,
    * so the Verify harness dumps the feature vectors and DuckDB
    * reproduces the dimension-count/first-element/rounding projection
    * from them — the same given-the-engine-bound-values pattern as
    * q_dedup_simhash. */
  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val assets = Multimodal.toAssets(tbl(s, dir, "documents"), "doc_id", "text", "text/plain")
    Multimodal.extractFeatures(assets, 16)
      .select(col("asset_id"), size(col("feature")).as("feat_dim"),
        rq(element_at(col("feature"), 1).cast("double"), 6).as("feat0"))
  }

  /** Hybrid-retrieval fusion constants: RRF's K (Cormack, Clarke &
    * Buettcher 2009 — 60 is the paper's value), the shared query text,
    * and the per-leg ranking depth. */
  private val RrfK = 60
  private val HybridQuery = "spark hash join stream"
  private[graft] val HybridTopN = 50

  /** Per-doc feature cosine against [[HybridQuery]]'s own feature
    * vector — the semantic leg of q_hybrid_rrf, shared by the query and
    * the fixture dump. Features are the engine's real (if simple)
    * byte-histogram featurizer ([[Multimodal.extractFeatures]] over
    * text payloads — the honest stand-in at exactly the boundary where
    * a deployment slots a learned encoder); the cosine is ROUNDED to 6
    * decimals at birth (the rq discipline) so the rank order downstream
    * is a function of values the oracle consumes verbatim. Zero-norm
    * sides (empty text) yield a NULL cosine — reported, never ranked. */
  private def hybridCosines(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(
      Multimodal.toAssets(tbl(s, dir, "documents"), "doc_id", "text",
        "text/plain"), 16)
      .select(col("asset_id").as("doc_id"), col("feature"))
    import s.implicits._
    val qf = Multimodal.extractFeatures(
      Multimodal.toAssets(Seq((-1L, HybridQuery)).toDF("doc_id", "text"),
        "doc_id", "text", "text/plain"), 16)
      .select(col("feature").as("qfeat"))
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
    feats.crossJoin(broadcast(qf))
      .withColumn("__num", dot(col("feature"), col("qfeat")))
      .withColumn("__den",
        sqrt(dot(col("feature"), col("feature"))) *
          sqrt(dot(col("qfeat"), col("qfeat"))))
      .select(col("doc_id"),
        when(col("__den") > 0, rq(col("__num") / col("__den"), 6)).as("cos_r"))
  }

  /** Fixture parquet of the engine-computed per-doc query cosines for
    * q_hybrid_rrf's oracle (float featurizer + dot products are
    * engine-bound; GIVEN the rounded cosines, ranking + fusion is plain
    * SQL — the [[MultimodalFixture]] discipline). */
  private lazy val HybridCosFixture =
    new java.io.File("target/verify-fixtures/hybrid_cos").getAbsolutePath

  /** Top-`n` ranking of a scored leg, scale-right: the cut is a
    * `TakeOrderedAndProject` (orderBy + limit — distributed, never a
    * global single-partition window over the corpus), and only the ≤ n
    * surviving rows pay the row_number window (bounded by construction).
    * Rank order is (rounded score DESC, doc_id) — both components exact,
    * so engine and oracle rank identically. */
  private def rankTop(leg: DataFrame, scoreCol: String, n: Int,
                      rankName: String): DataFrame =
    leg.orderBy(col(scoreCol).desc, col("doc_id")).limit(n)
      .withColumn(rankName,
        row_number().over(Window.orderBy(col(scoreCol).desc, col("doc_id")))
          .cast("int"))
      .select(col("doc_id"), col(rankName))

  /** HYBRID RETRIEVAL — Reciprocal Rank Fusion (Cormack et al. 2009) of
    * a lexical and a semantic ranking for ONE query: BM25 top-50 over
    * the corpus index fused with feature-cosine top-50 against the
    * query's own feature vector, `rrf(d) = Σ_legs 1/(K + rank_leg(d))`,
    * top 20 fused docs returned. The mining composition a training-data
    * pipeline runs to pull targeted subsets out of a corpus (lexical
    * match alone misses paraphrases; embedding match alone misses exact
    * terms — RRF needs no score calibration between legs, which is why
    * it is the deployed default). Every fusion input is exact (integer
    * ranks over 6-decimal-rounded scores, doc_id tie-break), and the
    * per-doc RRF sum is two IEEE divisions + one add with identical
    * operands on both sides — so the whole fusion, cut included, sits
    * under the hash gate. Oracle: the q_bm25 score replay CTE ranked the
    * same way, the dumped cosines ([[HybridCosFixture]]) ranked the same
    * way, same fusion arithmetic, same (rrf DESC, doc_id) cut. */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val bm = graft.operators.TextIndex.bm25(
        graft.operators.TextIndex.build(tbl(s, dir, "documents"), "doc_id", "text"),
        "doc_id", HybridQuery)
      .select(col("doc_id"), rq(col("score"), 6).as("s"))
    val bmR = rankTop(bm, "s", HybridTopN, "r_bm25")
    val cosR = rankTop(hybridCosines(s, dir).filter(col("cos_r").isNotNull),
      "cos_r", HybridTopN, "r_emb")
    bmR.join(cosR, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_emb")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("r_bm25"), col("r_emb"),
        rq(col("rrf"), 9).as("rrf"))
  }

  /** Capstone curation pipeline: quality-filter the corpus and drop the
    * HIGHER-id'd member of every near-duplicate pair (pairs carry
    * id_a < id_b, so keeping id_a keeps the min-id representative) — the
    * composed dedup + quality flow of a real training-data pipeline.
    * Near-dups come from the MinHash-LSH candidate-generate-verify path
    * (the 100 TB shape — oracle-proven ≡ exact all-pairs at threshold 0.8
    * by q_dedup_minhash), NOT the quadratic all-pairs baseline. */
  private def qCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val dupLosers = Dedup.minhashDuplicates(
        Dedup.hashedWordShingles(docs, "doc_id", "text"), 0.8)
      .select(col("id_b").as("doc_id"))
    TextAnalysis.withQuality(docs, "text")
      .filter(col("quality_score") >= 0.5)
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), rq(col("quality_score"), 6).as("quality_score"))
  }

  /** q_curate with the TRAINED gate ([[TextClassifier]]) in place of the
    * fixed heuristic — the composition a real pipeline runs once it has
    * distilled (or hand-labeled) a seed set: the model is trained and
    * persisted OUTSIDE the timed body ([[qcModel]], the `_served`
    * convention — a deployment trains once and serves every batch), the
    * timed body SCORES (one broadcast integer probe per doc, no shuffle)
    * and removes near-dup losers. The gate is `margin_q >= 0` (⇔
    * p ≥ 0.5, exact in integer space — no float threshold to disagree
    * over). Oracle: margins re-derived from the dumped quantized weight
    * table exactly as q_quality_classifier; losers from the shared
    * n-gram replay. */
  private def qCurateClassified(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val dupLosers = Dedup.minhashDuplicates(
        Dedup.hashedWordShingles(docs, "doc_id", "text"), 0.8)
      .select(col("id_b").as("doc_id"))
    TextClassifier.score(docs, "doc_id", "text", qcModel(s, dir))
      .filter(col("margin_q") >= 0)
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("margin_q"))
  }

  /** q_curate with a PERPLEXITY gate in place of the fixed heuristic —
    * the CCNet-shaped composition (Wenzek et al. 2020: keep the
    * low-perplexity stratum under a language model trained on trusted
    * text): documents are scored against the PERSISTED pruned bigram LM
    * ([[lmModelPath]], trained outside the timed body — the `_served`
    * convention), kept when their 6-decimal-rounded cross-entropy is at
    * most [[LmCurateMaxXent]], then near-dup losers are removed. Gating
    * on the ROUNDED value is deliberate: the hash gate proves the
    * rounded xent identical between engine and oracle (q_lm_xent_served),
    * so the threshold compare can never straddle an ulp disagreement.
    * Docs with zero bigrams carry a NULL xent and are dropped by the
    * gate on both sides — a doc the model cannot score is not "low
    * perplexity". Oracle: the q_lm_xent_served pruned-model replay CTE
    * + the shared n-gram loser replay + the same rounded threshold.
    *
    * The cutoff is a CALIBRATION CONSTANT, the CCNet deployment shape
    * (their head/middle/tail boundaries are fixed numbers computed once
    * offline, then applied verbatim to every shard): 3.39 is the
    * sf0.01 corpus's median served xent (measured distribution
    * 3.26-3.61, σ 0.035), so the gate keeps roughly the low-perplexity
    * half there — re-calibrate the constant, not the operator, for a
    * different corpus. */
  private[graft] val LmCurateMaxXent = 3.39
  private def qCurateLm(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val dupLosers = Dedup.minhashDuplicates(
        Dedup.hashedWordShingles(docs, "doc_id", "text"), 0.8)
      .select(col("id_b").as("doc_id"))
    LanguageModel.crossEntropy(docs, "doc_id", "text",
        LanguageModel.read(s, lmModelPath(s, dir)))
      .withColumn("xent", rq(col("xent"), 6))
      .filter(col("xent") <= LmCurateMaxXent)
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("xent"))
  }

  /** Capstone curation pipeline v2 — the FULL composition a training-data
    * run executes, oracle-checked END TO END in one result: eval holdout
    * carve-out → train-eval decontamination (shared 3-grams) → quality
    * filter → near-dup loser removal (MinHash-LSH path) → PII redaction →
    * deterministic hash split. Every stage is individually oracle-proven;
    * this pins their composition (filter ordering, join seams, column
    * flow). */
  private def qCurateFull(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val evalSet = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val dupLosers = Dedup.minhashDuplicates(
        Dedup.hashedWordShingles(docs, "doc_id", "text"), 0.8)
      .select(col("id_b").as("doc_id"))
    val kept = TextAnalysis.withQuality(
        Dedup.decontaminate(train, evalSet, "doc_id", "text", 3), "text")
      .filter(col("quality_score") >= 0.5)
      .join(dupLosers, Seq("doc_id"), "left_anti")
    TextAnalysis.hashSplit(TextAnalysis.withPiiRedaction(kept, "text"), "doc_id")
      .select(col("doc_id"), col("lang"),
        rq(col("quality_score"), 6).as("quality_score"), col("split"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("n_pii"),
        md5(col("redacted").cast("binary")).as("red_md5"))
  }

  /** Capstone curation pipeline v3 — the STREAMING-curation capstone's
    * batch equivalent (a one-batch
    * [[graft.streaming.StreamingCurate.idempotentCurateSemanticSink]]
    * over the whole corpus produces exactly this keep set, spec-pinned
    * in StreamingCurateSpec — with exact 3-gram decontamination in
    * place of the stream's Bloom probe, the one stage a SQL oracle
    * cannot replay probabilistically): eval holdout carve-out →
    * decontamination → quality filter → PII redaction → hash split →
    * SEMANTIC dedup over the survivors' embeddings (within-cell id
    * rule at the fixture centroids, the [[graft.operators.Similarity
    * .semDedup]] one-batch semantics). The oracle recomputes every
    * stage including the within-cell cosine scan restricted to the
    * survivor set, so the seam this adds over q_curate_full — the
    * semantic gate seeing only curation survivors — sits under the
    * hash gate. */
  private def qCurateSemantic(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val evalSet = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val kept = TextAnalysis.withQuality(
        Dedup.decontaminate(train, evalSet, "doc_id", "text", 3), "text")
      .filter(col("quality_score") >= 0.5)
    val gated = TextAnalysis.hashSplit(
      TextAnalysis.withPiiRedaction(kept, "text"), "doc_id")
    val embs = tbl(s, dir, "embeddings")
      .join(gated.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val admitted = Similarity.semDedup(embs, "vec_id", "embedding",
        kmeansCentroids(s, dir), minCosine = 0.4)
      .select(col("vec_id").as("doc_id"), col("coarse"))
    gated.join(admitted, Seq("doc_id"))
      .select(col("doc_id"), col("coarse"), col("lang"),
        rq(col("quality_score"), 6).as("quality_score"), col("split"))
  }

  /** Composed FRESCO pipeline — IntervalJoin → BucketAggregate → Finalize
    * (the real `Pipeline.step2`/`step3` operators), oracle-checked END TO
    * END rather than per-part: synthesizes a FRESCO-long metric stream and
    * an accounting frame from `events` (jid = user_id; the five event
    * types → the five FRESCO metrics; three synthetic hosts; one
    * 30-minute job per user starting at that user's first event). Covers
    * the composition's seams: `[start, end)` containment boundary,
    * start-aligned 1-minute bucketing, explicit-value pivot, per-record
    * host_list, µs midpoint time, and the step-3 `_S` pass. */
  private def qFrescoPipeline(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val metrics = ev.select(
      concat(lit("NODE"), pmod(col("event_id"), lit(3)).cast("string")).as("Host"),
      col("ts").as("Timestamp"),
      when(col("event_type") === "click", "block")
        .when(col("event_type") === "error", "cpuuser")
        .when(col("event_type") === "purchase", "memused")
        .when(col("event_type") === "signup", "memused_minus_diskcache")
        .otherwise("nfs").as("Event"),
      col("value").as("Value"),
      col("user_id").cast("string").as("jid"))
    val acct = ev.groupBy(col("user_id").cast("string").as("jid"))
      .agg(min(col("ts")).as("start"))
      .select(col("jid"), col("start"),
        timestamp_micros(unix_micros(col("start")) + 1800L * 1000000L).as("end"),
        timestamp_micros(unix_micros(col("start")) - 60L * 1000000L).as("submit"),
        concat(lit("u"), col("jid")).as("user"),
        lit("research").as("account"),
        concat(lit("job"), col("jid")).as("jobname"),
        lit("normal").as("queue"),
        lit(3L).as("nnodes"), lit(96L).as("ncpus"),
        lit(1800L).as("walltime"), lit("0").as("exit_status"))
    Pipeline.step3(Pipeline.step2(metrics, acct)).select(
      col("time"), col("submit_time"), col("start_time"), col("end_time"),
      col("timelimit"), col("nhosts"), col("ncores"),
      col("account"), col("queue"), col("host"), col("jid"), col("jobname"),
      col("exitcode"), col("host_list"), col("username"),
      rq(col("value_cpuuser"), 6).as("value_cpuuser"),
      col("value_gpu"),
      rq(col("value_memused"), 6).as("value_memused"),
      rq(col("value_memused_minus_diskcache"), 6).as("value_memused_minus_diskcache"),
      rq(col("value_nfs"), 6).as("value_nfs"),
      rq(col("value_block"), 6).as("value_block"))
  }

  /** SQL frontend: the same engine drives `spark.sql` over temp views
    * (with the graft-registered functions available) — TPC-H Q4 shape. */
  private def qSqlFrontend(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    tbl(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Duplicate-cluster resolution: connected components over the near-dup
    * pair graph; every member labeled with its component's min doc id.
    * Pairs come from the LSH candidate-generate-verify path
    * (`minhashDuplicates`), not the quadratic shingle self-join — this is
    * the full 100 TB shape end to end. At threshold 0.8 with 128 hashes /
    * 32 bands, LSH recall is oracle-proven ≡ the exact all-pairs SQL
    * (`q_dedup_minhash` shares the same oracle). */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClusters(dedupClusterPairs(s, dir))

  /** The cluster query's pair input, exposed because `duplicateClusters`
    * eagerly checkpoints it (lineage truncation hides the pair plan from
    * the final frame) — PlanSpec asserts on THIS frame that candidate
    * generation is LSH banding, not the quadratic shingle self-join. */
  private[graft] def dedupClusterPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDuplicates(
      Dedup.hashedWordShingles(tbl(s, dir, "documents"), "doc_id", "text"), 0.8)

  /** TPC-H Q1 shape: the canonical wide aggregate (8 aggregates, 2 keys). */
  private def qTpchQ1(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        rq(sum("l_quantity"), 4).as("sum_qty"),
        rq(sum("l_extendedprice"), 4).as("sum_base_price"),
        rq(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        rq(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        rq(avg("l_quantity"), 6).as("avg_qty"),
        rq(avg("l_extendedprice"), 6).as("avg_price"),
        rq(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: segment filter ⋈ orders ⋈ lineitem → top revenue. */
  private def qTpchQ3(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .filter(col("o_orderdate") < lit("1998-01-01") && col("l_shipdate") > lit("1998-01-01"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        rq(col("revenue"), 4).as("revenue"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q1" -> qTpchQ1,
    "q_tpch_q3" -> qTpchQ3,
    "q_dedup_clusters" -> qDedupClusters,
    "q_sql_frontend" -> qSqlFrontend,
    "q_fresco_pipeline" -> qFrescoPipeline,
    "q_curate" -> qCurate,
    "q_curate_full" -> qCurateFull,
    "q_curate_semantic" -> qCurateSemantic,
    "q_dedup_rep" -> qDedupRep,
    "q_ngram_jaccard" -> qNgramJaccard,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_image_dedup" -> qImageDedup,
    "q_image_dedup_verified" -> qImageDedupVerified,
    "q_image_dedup_index" -> qImageDedupIndex,
    "q_image_dedup_keep" -> qImageDedupKeep,
    "q_audio_dedup" -> qAudioDedup,
    "q_audio_dedup_verified" -> qAudioDedupVerified,
    "q_audio_dedup_keep" -> qAudioDedupKeep,
    "q_video_frames" -> qVideoFrames,
    "q_video_dedup" -> qVideoDedup,
    "q_video_dedup_verified" -> qVideoDedupVerified,
    "q_video_dedup_keep" -> qVideoDedupKeep,
    "q_quality_classifier" -> qQualityClassifier,
    "q_curate_classified" -> qCurateClassified,
    "q_curate_lm" -> qCurateLm,
    "q_hybrid_rrf" -> qHybridRrf,
    "q_dedup_spans" -> qDedupSpans,
    "q_dedup_spans_index" -> qDedupSpansIndex,
    "q_dedup_spans_index_bucketed" -> qDedupSpansIndexBucketed,
    "q_dedup_spans_sketch" -> qDedupSpansSketch,
    "q_dedup_span_trim" -> qDedupSpanTrim,
    "q_dedup_index" -> qDedupIndex,
    "q_dedup_index_banded" -> qDedupIndexBanded,
    "q_dedup_index_ingest" -> qDedupIndexIngest,
    "q_dedup_index_delete" -> qDedupIndexDelete,
    "q_embed_cosine_pairs" -> qEmbedCosinePairs,
    "q_embed_lsh_pairs" -> qEmbedLshPairs,
    "q_embed_clusters" -> qEmbedClusters,
    "q_semdedup" -> qSemdedup,
    "q_semdedup_cdist" -> qSemdedupCdist,
    "q_semdedup_lsh" -> qSemdedupLsh,
    "q_bpe_pairs" -> qBpePairs,
    "q_bpe_encode" -> qBpeEncode,
    "q_bpe_encode_pre" -> qBpeEncodePre,
    "q_bm25" -> qBm25,
    "q_bm25_served" -> qBm25Served,
    "q_bm25_phrase" -> qBm25Phrase,
    "q_bm25_window" -> qBm25Window,
    "q_bm25_phrase_batch" -> qBm25PhraseBatch,
    "q_bm25_batch" -> qBm25Batch,
    "q_bm25_topk" -> qBm25TopK,
    "q_decontaminate_phrase" -> qDecontaminatePhrase,
    "q_vocab" -> qVocab,
    "q_lm_xent" -> qLmXent,
    "q_lm_xent_served" -> qLmXentServed,
    "q_lm_xent_interp" -> qLmXentInterp,
    "q_lm_xent_interp_served" -> qLmXentInterpServed,
    "q_lm_xent_kn" -> qLmXentKn,
    "q_lm_xent_kn_served" -> qLmXentKnServed,
    "q_lm_xent_kn3" -> qLmXentKn3,
    "q_lm_xent_kn3_served" -> qLmXentKn3Served,
    "q_lm_xent_kn5" -> qLmXentKn5,
    "q_lm_xent_kn5_served" -> qLmXentKn5Served,
    "q_lm_xent_mkn" -> qLmXentMkn,
    "q_lm_xent_mkn_served" -> qLmXentMknServed,
    "q_lm_xent_mkn5" -> qLmXentMkn5,
    "q_lm_xent_mkn5_served" -> qLmXentMkn5Served,
    "q_sample_stratified" -> qSampleStratified,
    "q_sample_temperature" -> qSampleTemperature,
    "q_sample_budget" -> qSampleBudget,
    "q_pack_bins" -> qPackBins,
    "q_vocab_by_lang" -> qVocabByLang,
    "q_ann_topk" -> qAnnTopK,
    "q_ann_ivf" -> qAnnIvf,
    "q_ann_ivf_q8" -> qAnnIvfQ8,
    "q_ann_ivf_pruned" -> qAnnIvfPruned,
    "q_ann_pq" -> qAnnPq,
    "q_ann_pq_served" -> qAnnPqServed,
    "q_ann_opq" -> qAnnOpq,
    "q_ann_opq_served" -> qAnnOpqServed,
    "q_ann_opq_res" -> qAnnOpqRes,
    "q_ann_pq_res" -> qAnnPqRes,
    "q_ann_pq_res_served" -> qAnnPqResServed,
    "q_ann_pq_res_pruned" -> qAnnPqResPruned,
    "q_ann_kmeans" -> qAnnKmeans,
    "q_ann_serve" -> qAnnServe,
    "q_ann_ingest" -> qAnnIngest,
    "q_ann_delete" -> qAnnDelete,
    "q_embed_quantize" -> qEmbedQuantize,
    "q_text_stats" -> qTextStats,
    "q_text_langid" -> qTextLangId,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_repetition" -> qTextRepetition,
    "q_text_chunks" -> qTextChunks,
    "q_decontaminate" -> qDecontaminate,
    "q_hash_split" -> qHashSplit,
    "q_pii_redact" -> qPiiRedact,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_dims" -> qMultimodalDims,
    "q_multimodal_pixels" -> qMultimodalPixels,
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_filter_project" -> qFilterProject,
    "q_agg_sum" -> qAggSum,
    "q_agg_multi" -> qAggMulti,
    "q_agg_mean" -> qAggMean,
    "q_distinct" -> qDistinct,
    "q_collect_str" -> qCollectStr,
    "q_pivot" -> qPivot,
    "q_window_lag" -> qWindowLag,
    "q_interval_join" -> qIntervalJoin,
    "q_interval_join_bucketed" -> qIntervalJoinBucketed,
    "q_interval_join_auto" -> qIntervalJoinAuto,
    "q_interval_join_incl" -> qIntervalJoinIncl,
    "q_join3" -> qJoin3,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_union_dedup" -> qUnionDedup,
    "q_jid_normalize" -> qJidNormalize,
    "q_dates" -> qDates,
    "q_session_bucket" -> qSessionBucket,
    "q_sessionize" -> qSessionize,
    "q_skew_salted" -> qSkewSalted,
    "q_dedup_exact" -> qDedupExact,
    "q_topk" -> qTopK,
    "q_safediv_clamp" -> qSafeDivClamp,
    "q_profile" -> qProfile,
    "q_profile_approx" -> qProfileApprox,
    "q_json_extract" -> qJsonExtract)

  /** Word-3-gram jaccard pairs ≥ 0.8 in DuckDB SQL — oracle for both the
    * exact all-pairs query and the MinHash-LSH pipeline (recall ≈ 1 at
    * this threshold with 128 hashes / 32 bands). */
  private val ngramJaccardSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS INT):CAST(i+2 AS INT)], ' ') AS s
      |       FROM toks, LATERAL unnest(range(1, greatest(len(w)-1, 2))) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b, floor((i*1.0/(sa.sz+sb.sz-i))*1000000.0 + 0.5)/1000000.0 AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |WHERE i*1.0/(sa.sz+sb.sz-i) >= 0.8""".stripMargin

  /** Shared by q_dedup_spans_index (flat serving) and
    * q_dedup_spans_index_bucketed (lifecycle-grown bucketed layout):
    * DuckDB recomputes the corpus span counts from [[SpanFixture]] and
    * the left-join scoring from [[SpanBatchFixture]]; layout and growth
    * path change the plan, never the answer. */
  private lazy val spansIndexSql: String =
    s"""WITH ix AS (
      |  SELECT shingle, count(*) AS span_docs
      |  FROM read_parquet('$SpanFixture/*.parquet') GROUP BY shingle),
      | bs AS (
      |  SELECT sh_id, shingle
      |  FROM read_parquet('$SpanBatchFixture/*.parquet'))
      |SELECT CAST(bs.sh_id AS BIGINT) AS doc_id,
      |       count(*) AS n_spans,
      |       CAST(sum(CASE WHEN ix.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_indexed_spans,
      |       floor((CAST(sum(CASE WHEN ix.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |              / count(*))*1000000.0 + 0.5)/1000000.0 AS indexed_frac
      |FROM bs LEFT JOIN ix USING (shingle)
      |GROUP BY bs.sh_id""".stripMargin

  /** Shared by q_dedup_index (flat serving) and q_dedup_index_banded
    * (bucketed serving layout): DuckDB reproduces candidate generation +
    * the signature-agreement estimate from the fixture dumps; the layout
    * changes the plan, never the answer. */
  private lazy val dedupIndexSql: String =
    s"""WITH nb AS (SELECT * FROM read_parquet('$DedupIndexFixture/new_banded/*.parquet')),
      | ib AS (SELECT * FROM read_parquet('$DedupIndexFixture/index_banded/*.parquet')),
      | ns AS (SELECT * FROM read_parquet('$DedupIndexFixture/new_sigs/*.parquet')),
      | isg AS (SELECT * FROM read_parquet('$DedupIndexFixture/index_sigs/*.parquet')),
      | cands AS (
      |  SELECT DISTINCT nb.sh_id AS new_id, ib.sh_id AS index_id
      |  FROM nb JOIN ib ON nb.band = ib.band AND nb.band_hash = ib.band_hash),
      | est AS (
      |  SELECT c.new_id, c.index_id,
      |         len(list_filter(list_zip(n2.sig, i2.sig), p -> p[1] = p[2])) / 128.0 AS ej
      |  FROM cands c
      |  JOIN ns n2 ON n2.sh_id = c.new_id
      |  JOIN isg i2 ON i2.sh_id = c.index_id)
      |SELECT new_id AS doc_id, index_id,
      |       floor((ej)*1000000.0 + 0.5)/1000000.0 AS est_jaccard
      |FROM est WHERE ej >= 0.3""".stripMargin

  /** q_dedup_index_delete's oracle: [[dedupIndexSql]] with the index
    * side minus the tombstoned docs — serving a deleted index must be
    * indistinguishable from never having indexed them. Both fixture
    * tables are filtered (the engine only filters the signature side —
    * victims' band rows surface candidates that die at the sig join —
    * but the RESULT is identical, which is the point). */
  private lazy val dedupIndexDeleteSql: String =
    s"""WITH nb AS (SELECT * FROM read_parquet('$DedupIndexFixture/new_banded/*.parquet')),
      | ib AS (SELECT * FROM read_parquet('$DedupIndexFixture/index_banded/*.parquet')
      |        WHERE sh_id % 50 <> 0),
      | ns AS (SELECT * FROM read_parquet('$DedupIndexFixture/new_sigs/*.parquet')),
      | isg AS (SELECT * FROM read_parquet('$DedupIndexFixture/index_sigs/*.parquet')
      |         WHERE sh_id % 50 <> 0),
      | cands AS (
      |  SELECT DISTINCT nb.sh_id AS new_id, ib.sh_id AS index_id
      |  FROM nb JOIN ib ON nb.band = ib.band AND nb.band_hash = ib.band_hash),
      | est AS (
      |  SELECT c.new_id, c.index_id,
      |         len(list_filter(list_zip(n2.sig, i2.sig), p -> p[1] = p[2])) / 128.0 AS ej
      |  FROM cands c
      |  JOIN ns n2 ON n2.sh_id = c.new_id
      |  JOIN isg i2 ON i2.sh_id = c.index_id)
      |SELECT new_id AS doc_id, index_id,
      |       floor((ej)*1000000.0 + 0.5)/1000000.0 AS est_jaccard
      |FROM est WHERE ej >= 0.3""".stripMargin

  /** Shared by q_ann_kmeans (in-memory learned serving) and q_ann_serve
    * (the on-disk composition) — both answer from the cells the
    * [[kmeansCentroids]] matrix induces, which the fixture dump records. */
  private lazy val kmeansIvfSql: String =
    s"""WITH c AS (SELECT * FROM read_parquet('$KmeansFixture/corpus/*.parquet')),
      | p AS (SELECT * FROM read_parquet('$KmeansFixture/probes/*.parquet')),
      | scored AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS nn_id,
      |         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
      |                                CAST(ec.embedding AS DOUBLE[])) AS cos
      |  FROM p JOIN c ON c.coarse = p.coarse
      |  JOIN embeddings eq ON eq.vec_id = p.vec_id
      |  JOIN embeddings ec ON ec.vec_id = c.vec_id
      |  WHERE c.vec_id <> p.vec_id)
      |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
      |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
      |FROM scored QUALIFY rank <= 3""".stripMargin

  /** q_ann_delete's oracle: [[kmeansIvfSql]] with the corpus minus the
    * tombstoned ids — serving a deleted index must be indistinguishable
    * from never having indexed those rows. */
  private lazy val kmeansIvfDeleteSql: String =
    s"""WITH c AS (SELECT * FROM read_parquet('$KmeansFixture/corpus/*.parquet')
      |           WHERE vec_id % 5 <> 0),
      | p AS (SELECT * FROM read_parquet('$KmeansFixture/probes/*.parquet')),
      | scored AS (
      |  SELECT p.vec_id AS query_id, c.vec_id AS nn_id,
      |         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
      |                                CAST(ec.embedding AS DOUBLE[])) AS cos
      |  FROM p JOIN c ON c.coarse = p.coarse
      |  JOIN embeddings eq ON eq.vec_id = p.vec_id
      |  JOIN embeddings ec ON ec.vec_id = c.vec_id
      |  WHERE c.vec_id <> p.vec_id)
      |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
      |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
      |FROM scored QUALIFY rank <= 3""".stripMargin

  /** Shared by q_ann_ivf (full-precision) and q_ann_ivf_q8 (int8 index +
    * exact re-scoring) — the quantized path must reproduce the exact
    * top-k answer bit-for-bit at these settings. */
  private val annIvfSql: String =
    """WITH scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
      |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                CAST(c.embedding AS DOUBLE[])) AS cos
      |  FROM embeddings q JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 20)
      |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
      |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
      |FROM scored QUALIFY rank <= 3""".stripMargin

  /** Shared by q_interval_join (broadcast) and q_interval_join_bucketed
    * (scale path) — the two plans must agree exactly. */
  private val intervalJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_rows,
      |       floor((CAST(sum(l_quantity) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_qty
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |GROUP BY o_orderpriority""".stripMargin

  /** Shared by q_bm25 (in-memory build) and q_bm25_served (the
    * epoch-grown persisted layout). */
  private val bm25Sql: String =
    """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents),
        | d AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x <> '')) AS dl
        |  FROM documents),
        | stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
        | tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'hash', 'join', 'stream') GROUP BY 1, 2),
        | df AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM tok)
        |  WHERE term IN ('spark', 'hash', 'join', 'stream') GROUP BY term),
        | sc AS (
        |  SELECT tf.doc_id,
        |         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
        |         (tf.tf * (1.2 + 1)) /
        |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / stats.avgdl)) AS part
        |  FROM tf JOIN df USING (term) JOIN d ON d.doc_id = tf.doc_id
        |  CROSS JOIN stats)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, count(*) AS n_matched,
        |       floor(sum(part)*1000000.0 + 0.5)/1000000.0 AS score
        |FROM sc GROUP BY doc_id""".stripMargin

  /** Shared by q_ann_pq (inline codes) and q_ann_pq_served (persisted
    * code table): given ONLY the dumped codebooks, DuckDB re-derives
    * every corpus vector's PQ codes, replays the rounded ADC shortlist,
    * and exact-rescores it. */
  private lazy val annPqSql: String =
    s"""WITH cb AS (SELECT j, c, CAST(centroid AS DOUBLE[]) AS cent
        |            FROM read_parquet('$KmeansFixture/pq_codebooks/*.parquet')),
        | e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (e.v[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (e.v[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS d
        |  FROM e CROSS JOIN cb),
        | code AS (
        |  SELECT vec_id, j, c FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1),
        | q AS (SELECT vec_id, label, v FROM e WHERE vec_id < 20),
        | pairsub AS (
        |  SELECT q.vec_id AS query_id, ce.vec_id AS nn_id, co.j,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (q.v[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (q.v[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS dj
        |  FROM q JOIN e ce ON ce.label = q.label AND ce.vec_id <> q.vec_id
        |  JOIN code co ON co.vec_id = ce.vec_id
        |  JOIN cb ON cb.j = co.j AND cb.c = co.c),
        | adc AS (SELECT query_id, nn_id, sum(dj) AS adc FROM pairsub GROUP BY 1, 2),
        | short AS (
        |  SELECT query_id, nn_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY floor(adc*1000000.0 + 0.5)/1000000.0, nn_id) <= 12),
        | scored AS (
        |  SELECT s.query_id, s.nn_id, list_cosine_similarity(eq.v, ec.v) AS cos
        |  FROM short s JOIN e eq ON eq.vec_id = s.query_id
        |  JOIN e ec ON ec.vec_id = s.nn_id)
        |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
        |FROM scored QUALIFY rank <= 3""".stripMargin

  /** Shared by q_ann_opq (inline) and q_ann_opq_served (persisted code
    * table): given ONLY the dumped rotation matrix and rotated-space
    * codebooks, DuckDB re-derives every corpus vector's ROTATED form
    * (list_sum over the per-output-row products — the engine's exact
    * sequential-fold IEEE association), its rotated-space PQ codes, the
    * query's rotated ADC table, replays the rounded shortlist, and
    * exact-rescores it against the ORIGINAL vectors. */
  private lazy val annOpqSql: String =
    s"""WITH rt AS (SELECT i, CAST(rowv AS DOUBLE[]) AS rv
        |            FROM read_parquet('$KmeansFixture/opq_rotation/*.parquet')),
        | cb AS (SELECT j, c, CAST(centroid AS DOUBLE[]) AS cent
        |            FROM read_parquet('$KmeansFixture/pq_codebooks_opq/*.parquet')),
        | e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | e AS (
        |  SELECT e0.vec_id,
        |         list(list_sum(list_transform(range(1, 65),
        |           jj -> rt.rv[CAST(jj AS INT)] * e0.v[CAST(jj AS INT)]))
        |           ORDER BY rt.i) AS v
        |  FROM e0 CROSS JOIN rt GROUP BY e0.vec_id),
        | dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (e.v[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (e.v[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS d
        |  FROM e CROSS JOIN cb),
        | code AS (
        |  SELECT vec_id, j, c FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1),
        | q AS (SELECT e.vec_id, e0.label, e.v
        |       FROM e JOIN e0 USING (vec_id) WHERE vec_id < 20),
        | pairsub AS (
        |  SELECT q.vec_id AS query_id, c0.vec_id AS nn_id, co.j,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (q.v[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (q.v[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS dj
        |  FROM q JOIN e0 c0 ON c0.label = q.label AND c0.vec_id <> q.vec_id
        |  JOIN code co ON co.vec_id = c0.vec_id
        |  JOIN cb ON cb.j = co.j AND cb.c = co.c),
        | adc AS (SELECT query_id, nn_id, sum(dj) AS adc FROM pairsub GROUP BY 1, 2),
        | short AS (
        |  SELECT query_id, nn_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY floor(adc*1000000.0 + 0.5)/1000000.0, nn_id) <= 12),
        | scored AS (
        |  SELECT s.query_id, s.nn_id, list_cosine_similarity(eq.v, ec.v) AS cos
        |  FROM short s JOIN e0 eq ON eq.vec_id = s.query_id
        |  JOIN e0 ec ON ec.vec_id = s.nn_id)
        |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
        |FROM scored QUALIFY rank <= 3""".stripMargin

  /** q_ann_opq_res — the FULL learned OPQ composition replayed from the
    * three dumped matrices ALONE (rotation, rotated-space coarse
    * centroids, rotated-space residual codebooks): DuckDB re-derives
    * every corpus vector's rotation, its coarse cell (sequential-fold
    * squared-L2 argmin — the engine's NearestCentroid association), its
    * residual codes, each query's 2-cell probe fan-out and PER-CELL
    * rotated residual, replays the rounded ADC shortlist across both
    * probed cells, and re-scores exact against the ORIGINAL vectors.
    * Unlike the plain residual oracle (which reads label/probe
    * fixtures shared with the kmeans queries), nothing here is a
    * fixture but the matrices — the composition is derived end to
    * end. */
  private lazy val annOpqResSql: String =
    s"""WITH rt AS (SELECT i, CAST(rowv AS DOUBLE[]) AS rv
        |            FROM read_parquet('$KmeansFixture/opq_rotation/*.parquet')),
        | cents AS (SELECT cid, CAST(centroid AS DOUBLE[]) AS cv
        |           FROM read_parquet('$KmeansFixture/opq_centroids_flat/*.parquet')),
        | cb AS (SELECT j, c, CAST(centroid AS DOUBLE[]) AS cent
        |            FROM read_parquet('$KmeansFixture/pq_codebooks_opq_res/*.parquet')),
        | e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | e AS (
        |  SELECT e0.vec_id,
        |         list(list_sum(list_transform(range(1, 65),
        |           jj -> rt.rv[CAST(jj AS INT)] * e0.v[CAST(jj AS INT)]))
        |           ORDER BY rt.i) AS rv
        |  FROM e0 CROSS JOIN rt GROUP BY e0.vec_id),
        | ldist AS (
        |  SELECT e.vec_id, cents.cid,
        |         list_sum(list_transform(range(1, 65),
        |           i -> (e.rv[CAST(i AS INT)] - cents.cv[CAST(i AS INT)])
        |              * (e.rv[CAST(i AS INT)] - cents.cv[CAST(i AS INT)]))) AS d
        |  FROM e CROSS JOIN cents),
        | lab AS (SELECT vec_id, cid AS coarse FROM ldist
        |         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
        | r AS (SELECT lab.vec_id, lab.coarse,
        |         list_transform(range(1, 65),
        |           i -> e.rv[CAST(i AS INT)] - cents.cv[CAST(i AS INT)]) AS res
        |       FROM lab JOIN e USING (vec_id) JOIN cents ON cents.cid = lab.coarse),
        | dist AS (
        |  SELECT r.vec_id, cb.j, cb.c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (r.res[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (r.res[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS d
        |  FROM r CROSS JOIN cb),
        | code AS (
        |  SELECT vec_id, j, c FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1),
        | p AS (SELECT vec_id, cid AS coarse FROM ldist WHERE vec_id < 20
        |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) <= 2),
        | qr AS (SELECT p.vec_id, p.coarse,
        |          list_transform(range(1, 65),
        |            i -> e.rv[CAST(i AS INT)] - cents.cv[CAST(i AS INT)]) AS qres
        |        FROM p JOIN e USING (vec_id) JOIN cents ON cents.cid = p.coarse),
        | pairsub AS (
        |  SELECT qr.vec_id AS query_id, ce.vec_id AS nn_id, co.j,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (qr.qres[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (qr.qres[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS dj
        |  FROM qr JOIN r ce ON ce.coarse = qr.coarse AND ce.vec_id <> qr.vec_id
        |  JOIN code co ON co.vec_id = ce.vec_id
        |  JOIN cb ON cb.j = co.j AND cb.c = co.c),
        | adc AS (SELECT query_id, nn_id, sum(dj) AS adc FROM pairsub GROUP BY 1, 2),
        | short AS (
        |  SELECT query_id, nn_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY floor(adc*1000000.0 + 0.5)/1000000.0, nn_id) <= 12),
        | scored AS (
        |  SELECT s.query_id, s.nn_id, list_cosine_similarity(eq.v, ec.v) AS cos
        |  FROM short s JOIN e0 eq ON eq.vec_id = s.query_id
        |  JOIN e0 ec ON ec.vec_id = s.nn_id)
        |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
        |FROM scored QUALIFY rank <= 3""".stripMargin

  /** Shared by q_ann_pq_res (inline) and q_ann_pq_res_served (persisted
    * residual code table): given the dumped coarse-centroid matrix, the
    * residual codebooks, the corpus labels, and the probe fan-out,
    * DuckDB re-derives every corpus vector's residual and its codes,
    * every query's PER-PROBED-CELL residual, replays the rounded ADC
    * shortlist across both probed cells, and exact-rescores it. */
  private lazy val annPqResSql: String =
    s"""WITH cb AS (SELECT j, c, CAST(centroid AS DOUBLE[]) AS cent
        |            FROM read_parquet('$KmeansFixture/pq_codebooks_res/*.parquet')),
        | cents AS (SELECT cid, CAST(centroid AS DOUBLE[]) AS cv
        |           FROM read_parquet('$KmeansFixture/centroids_flat/*.parquet')),
        | lab AS (SELECT vec_id, coarse
        |         FROM read_parquet('$KmeansFixture/corpus/*.parquet')),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | r AS (SELECT lab.vec_id, lab.coarse,
        |         list_transform(range(1, 65),
        |           i -> e.v[CAST(i AS INT)] - cents.cv[CAST(i AS INT)]) AS rv
        |       FROM lab JOIN e USING (vec_id) JOIN cents ON cents.cid = lab.coarse),
        | dist AS (
        |  SELECT r.vec_id, cb.j, cb.c,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (r.rv[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (r.rv[CAST(cb.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS d
        |  FROM r CROSS JOIN cb),
        | code AS (
        |  SELECT vec_id, j, c FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) = 1),
        | p AS (SELECT vec_id, coarse
        |       FROM read_parquet('$KmeansFixture/probes/*.parquet')),
        | qr AS (SELECT p.vec_id, p.coarse,
        |          list_transform(range(1, 65),
        |            i -> e.v[CAST(i AS INT)] - cents.cv[CAST(i AS INT)]) AS qv
        |        FROM p JOIN e USING (vec_id) JOIN cents ON cents.cid = p.coarse),
        | pairsub AS (
        |  SELECT qr.vec_id AS query_id, ce.vec_id AS nn_id, co.j,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (qr.qv[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)])
        |              * (qr.qv[CAST(co.j*8 + i AS INT)] - cb.cent[CAST(i AS INT)]))) AS dj
        |  FROM qr JOIN r ce ON ce.coarse = qr.coarse AND ce.vec_id <> qr.vec_id
        |  JOIN code co ON co.vec_id = ce.vec_id
        |  JOIN cb ON cb.j = co.j AND cb.c = co.c),
        | adc AS (SELECT query_id, nn_id, sum(dj) AS adc FROM pairsub GROUP BY 1, 2),
        | short AS (
        |  SELECT query_id, nn_id FROM adc
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY floor(adc*1000000.0 + 0.5)/1000000.0, nn_id) <= 12),
        | scored AS (
        |  SELECT s.query_id, s.nn_id, list_cosine_similarity(eq.v, ec.v) AS cos
        |  FROM short s JOIN e eq ON eq.vec_id = s.query_id
        |  JOIN e ec ON ec.vec_id = s.nn_id)
        |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
        |FROM scored QUALIFY rank <= 3""".stripMargin

  /** Generate the order-N Kneser-Ney oracle: the SAME CTE cascade at
    * any order (N-gram counts → top context → continuation TYPE tables
    * each grouped from the one above → the floored unigram), with the
    * engine's literal IEEE association at every level — the KN3 oracle
    * generalized mechanically, so adding an order never hand-transcribes
    * the recursion. `pruned` replays the served twins' coalesce-to-
    * backoff arithmetic (top-order table filtered at minCount 2, LEFT
    * JOIN + coalesce; the cascade stays full-corpus). */
  private def knNOracleSql(order: Int, pruned: Boolean): String = {
    val ws = (1 to order).map(i => s"w$i")
    def groupBy(k: Int) = (1 to k).map(_.toString).mkString(", ")
    val ngSel = ws.zipWithIndex.map { case (w, j) =>
      if (j == 0) s"w[CAST(i AS INT)] AS $w" else s"w[CAST(i+$j AS INT)] AS $w"
    }.mkString(", ")
    // cont_k keyed by the LAST k positions, ctx_k by positions
    // (order-k .. order-1) — [[LanguageModel.trainKneserNeyN]]'s layout
    def contKey(k: Int) = ws.drop(order - k)
    def ctxKey(k: Int) = ws.slice(order - k - 1, order - 1)
    val cascade = ((order - 2) to 1 by -1).flatMap { k =>
      Seq(
        s" ctx$k AS MATERIALIZED (SELECT ${ctxKey(k).mkString(", ")}, sum(nct${k + 1}) AS s$k, " +
          s"count(*) AS f$k FROM cont${k + 1} GROUP BY ${groupBy(k)}),",
        s" cont$k AS MATERIALIZED (SELECT ${contKey(k).mkString(", ")}, count(*) AS nct$k " +
          s"FROM cont${k + 1} GROUP BY ${groupBy(k)}),")
    }.mkString("\n")
    def pexpr(k: Int): String =
      if (k == 1) "((cont1.nct1 + 0.5) / (nt.ntt + 0.5 * v.vs))"
      else s"(greatest(cont$k.nct$k - 0.75, 0.0) / ctx${k - 1}.s${k - 1} + " +
        s"(0.75 * ctx${k - 1}.f${k - 1} / ctx${k - 1}.s${k - 1}) * ${pexpr(k - 1)})"
    val cntRef = if (pruned) "coalesce(cgp.cnt, 0)" else "cg.cnt"
    val top = s"greatest($cntRef - 0.75, 0.0) / ctop.tot + " +
      s"(0.75 * ctop.types / ctop.tot) * ${pexpr(order - 1)}"
    val gramJoin =
      if (pruned) s"LEFT JOIN cgp USING (${ws.mkString(", ")})"
      else s"JOIN cg USING (${ws.mkString(", ")})"
    def onJoin(t: String, key: Seq[String]) =
      s"JOIN $t ON " + key.map(w => s"$t.$w = ng.$w").mkString(" AND ")
    val scoreJoins = ((order - 1) to 2 by -1).flatMap { k =>
      Seq(onJoin(s"cont$k", contKey(k)), onJoin(s"ctx${k - 1}", ctxKey(k - 1)))
    }.mkString("\n  ") + "\n  " + onJoin("cont1", Seq(ws.last))
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       | tok AS (SELECT unnest(w) AS token FROM d),
       | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
       | ng AS MATERIALIZED (
       |  SELECT doc_id, $ngSel
       |  FROM d, LATERAL unnest(range(1, greatest(len(w) - ${order - 2}, 1))) AS t(i)),
       | cg AS MATERIALIZED (SELECT ${ws.mkString(", ")}, count(*) AS cnt FROM ng
       |        GROUP BY ${groupBy(order)}),
       |${if (pruned) " cgp AS (SELECT * FROM cg WHERE cnt >= 2),\n" else ""} ctop AS MATERIALIZED (SELECT ${ws.init.mkString(", ")}, sum(cnt) AS tot, count(*) AS types
       |        FROM cg GROUP BY ${groupBy(order - 1)}),
       | cont${order - 1} AS MATERIALIZED (SELECT ${ws.tail.mkString(", ")}, count(*) AS nct${order - 1}
       |        FROM cg GROUP BY ${groupBy(order - 1)}),
       |$cascade
       | nt AS (SELECT count(*) AS ntt FROM cont2),
       | sc AS (
       |  SELECT ng.doc_id,
       |         ln($top) AS logp
       |  FROM ng $gramJoin JOIN ctop USING (${ws.init.mkString(", ")})
       |  $scoreJoins CROSS JOIN nt CROSS JOIN v),
       | pd AS (SELECT doc_id, count(*) AS n_ngrams, -avg(logp) AS xent
       |        FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(pd.n_ngrams, 0) AS n_ngrams,
       |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
       |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin
  }

  /** Generate the MODIFIED Kneser-Ney oracle ([[knNOracleSql]]'s
    * sibling for [[LanguageModel.trainModifiedKneserNeyN]]): the same
    * CTE cascade with the context tables' type count split into the
    * three D₁/D₂/D₃₊ buckets, one count-of-counts + Chen-Goodman
    * discount CTE per level (the exact IEEE association the engine's
    * driver-side `estimateDiscounts` computes), count-selected
    * discounts in the score expression, and three-bucket backoff
    * weights — so the oracle independently re-derives the DISCOUNT
    * ESTIMATION, not just the scan. `pruned` replays the served
    * twin's coalesce-to-backoff arithmetic (top table filtered at
    * minCount 2; cascade, buckets and discounts stay full-corpus,
    * exactly as they persist with the model). */
  private def mknOracleSql(order: Int, pruned: Boolean): String = {
    val ws = (1 to order).map(i => s"w$i")
    def groupBy(k: Int) = (1 to k).map(_.toString).mkString(", ")
    val ngSel = ws.zipWithIndex.map { case (w, j) =>
      if (j == 0) s"w[CAST(i AS INT)] AS $w" else s"w[CAST(i+$j AS INT)] AS $w"
    }.mkString(", ")
    def contKey(k: Int) = ws.drop(order - k)
    def ctxKey(k: Int) = ws.slice(order - k - 1, order - 1)
    // cascade with bucketed context tables: ctx_k carries s_k plus the
    // f1/f2/f3 bucket counts the modified backoff weight needs
    val cascade = ((order - 2) to 1 by -1).flatMap { k =>
      Seq(
        s" ctx$k AS MATERIALIZED (SELECT ${ctxKey(k).mkString(", ")}, sum(nct${k + 1}) AS s$k, " +
          s"count(*) FILTER (WHERE nct${k + 1} = 1) AS f1_$k, " +
          s"count(*) FILTER (WHERE nct${k + 1} = 2) AS f2_$k, " +
          s"count(*) FILTER (WHERE nct${k + 1} >= 3) AS f3_$k " +
          s"FROM cont${k + 1} GROUP BY ${groupBy(k)}),",
        s" cont$k AS MATERIALIZED (SELECT ${contKey(k).mkString(", ")}, count(*) AS nct$k " +
          s"FROM cont${k + 1} GROUP BY ${groupBy(k)}),")
    }.mkString("\n")
    // one Chen-Goodman discount CTE per level — the engine's literal
    // driver arithmetic: y = n1/(n1 + 2.0*n2), d1 = 1.0 - (2.0*y*n2)/n1,
    // each estimate CLAMPED into its normalization-safe range, and the
    // whole level falling back to the fixed 0.75 when its histogram
    // cannot feed the estimator (n1, n2, n3 or n4 = 0 — real on dense
    // corpora; n4 = 0 would clamp D3+ to a degenerate 3.0) — exactly
    // LanguageModel.estimateDiscounts' rules
    def discountCte(name: String, tbl: String, c: String) =
      s""" $name AS (
         |  SELECT CASE WHEN ok THEN least(greatest(1.0 - (2.0 * y * n2) / n1, 0.0), 1.0) ELSE 0.75 END AS d1,
         |         CASE WHEN ok THEN least(greatest(2.0 - (3.0 * y * n3) / n2, 0.0), 2.0) ELSE 0.75 END AS d2,
         |         CASE WHEN ok THEN least(greatest(3.0 - (4.0 * y * n4) / n3, 0.0), 3.0) ELSE 0.75 END AS d3
         |  FROM (SELECT n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0 AS ok,
         |               CASE WHEN n1 > 0 THEN n1 / (n1 + 2.0 * n2) ELSE 0.0 END AS y,
         |               n1, n2, n3, n4
         |        FROM (SELECT count(*) FILTER (WHERE $c = 1) AS n1,
         |                     count(*) FILTER (WHERE $c = 2) AS n2,
         |                     count(*) FILTER (WHERE $c = 3) AS n3,
         |                     count(*) FILTER (WHERE $c = 4) AS n4 FROM $tbl)))""".stripMargin
    val discountCtes = ((2 until order).map(k =>
      discountCte(s"dl$k", s"cont$k", s"nct$k")) :+
      discountCte("dtop", "cg", "cnt")).mkString(",\n")
    def pexpr(k: Int): String =
      if (k == 1) "((cont1.nct1 + 0.5) / (nt.ntt + 0.5 * v.vs))"
      else {
        val dsel = s"(CASE WHEN cont$k.nct$k >= 3 THEN dl$k.d3 " +
          s"WHEN cont$k.nct$k = 2 THEN dl$k.d2 ELSE dl$k.d1 END)"
        s"(greatest(cont$k.nct$k - $dsel, 0.0) / ctx${k - 1}.s${k - 1} + " +
          s"((dl$k.d1 * ctx${k - 1}.f1_${k - 1} + dl$k.d2 * ctx${k - 1}.f2_${k - 1} + " +
          s"dl$k.d3 * ctx${k - 1}.f3_${k - 1}) / ctx${k - 1}.s${k - 1}) * ${pexpr(k - 1)})"
      }
    val cntRef = if (pruned) "coalesce(cgp.cnt, 0)" else "cg.cnt"
    val dtopSel = s"(CASE WHEN $cntRef >= 3 THEN dtop.d3 " +
      s"WHEN $cntRef = 2 THEN dtop.d2 ELSE dtop.d1 END)"
    val top = s"greatest($cntRef - $dtopSel, 0.0) / ctop.tot + " +
      s"((dtop.d1 * ctop.t1 + dtop.d2 * ctop.t2 + dtop.d3 * ctop.t3) / ctop.tot) * ${pexpr(order - 1)}"
    val gramJoin =
      if (pruned) s"LEFT JOIN cgp USING (${ws.mkString(", ")})"
      else s"JOIN cg USING (${ws.mkString(", ")})"
    def onJoin(t: String, key: Seq[String]) =
      s"JOIN $t ON " + key.map(w => s"$t.$w = ng.$w").mkString(" AND ")
    val scoreJoins = ((order - 1) to 2 by -1).flatMap { k =>
      Seq(onJoin(s"cont$k", contKey(k)), onJoin(s"ctx${k - 1}", ctxKey(k - 1)))
    }.mkString("\n  ") + "\n  " + onJoin("cont1", Seq(ws.last))
    val discountCrossJoins = ((2 until order).map(k => s"CROSS JOIN dl$k") :+
      "CROSS JOIN dtop").mkString(" ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       | tok AS (SELECT unnest(w) AS token FROM d),
       | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
       | ng AS MATERIALIZED (
       |  SELECT doc_id, $ngSel
       |  FROM d, LATERAL unnest(range(1, greatest(len(w) - ${order - 2}, 1))) AS t(i)),
       | cg AS MATERIALIZED (SELECT ${ws.mkString(", ")}, count(*) AS cnt FROM ng
       |        GROUP BY ${groupBy(order)}),
       |${if (pruned) " cgp AS (SELECT * FROM cg WHERE cnt >= 2),\n" else ""} ctop AS MATERIALIZED (SELECT ${ws.init.mkString(", ")}, sum(cnt) AS tot,
       |        count(*) FILTER (WHERE cnt = 1) AS t1,
       |        count(*) FILTER (WHERE cnt = 2) AS t2,
       |        count(*) FILTER (WHERE cnt >= 3) AS t3
       |        FROM cg GROUP BY ${groupBy(order - 1)}),
       | cont${order - 1} AS MATERIALIZED (SELECT ${ws.tail.mkString(", ")}, count(*) AS nct${order - 1}
       |        FROM cg GROUP BY ${groupBy(order - 1)}),
       |$cascade
       | nt AS (SELECT count(*) AS ntt FROM cont2),
       |$discountCtes,
       | sc AS (
       |  SELECT ng.doc_id,
       |         ln($top) AS logp
       |  FROM ng $gramJoin JOIN ctop USING (${ws.init.mkString(", ")})
       |  $scoreJoins CROSS JOIN nt CROSS JOIN v $discountCrossJoins),
       | pd AS (SELECT doc_id, count(*) AS n_ngrams, -avg(logp) AS xent
       |        FROM sc GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(pd.n_ngrams, 0) AS n_ngrams,
       |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
       |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((CAST(sum(l_quantity) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_qty,
        |  floor((CAST(sum(l_extendedprice) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_base_price,
        |  floor((CAST(sum(l_extendedprice*(1-l_discount)) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_disc_price,
        |  floor((CAST(sum(l_extendedprice*(1-l_discount)*(1+l_tax)) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_charge,
        |  floor((CAST(avg(l_quantity) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_qty,
        |  floor((CAST(avg(l_extendedprice) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_price,
        |  floor((CAST(avg(l_discount) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  floor((CAST(sum(l_extendedprice*(1-l_discount)) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY sum(l_extendedprice*(1-l_discount)) DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_dedup_clusters" ->
      s"""WITH pairs AS ($ngramJaccardSql),
         |e AS (SELECT id_a AS u, id_b AS v FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |r AS (
         |  WITH RECURSIVE reach(u, v) AS (
         |    SELECT u, v FROM e
         |    UNION
         |    SELECT reach.u, e.v FROM reach JOIN e ON reach.v = e.u)
         |  SELECT u, v FROM reach)
         |SELECT u AS doc_id, least(u, min(v)) AS cluster_rep
         |FROM r GROUP BY u""".stripMargin,
    "q_fresco_pipeline" ->
      """WITH m AS (
        |  SELECT 'NODE' || CAST(((event_id % 3) + 3) % 3 AS VARCHAR) AS host, ts,
        |         CASE event_type WHEN 'click' THEN 'block' WHEN 'error' THEN 'cpuuser'
        |              WHEN 'purchase' THEN 'memused' WHEN 'signup' THEN 'memused_minus_diskcache'
        |              ELSE 'nfs' END AS event,
        |         value, CAST(user_id AS VARCHAR) AS jid
        |  FROM events),
        |a AS (
        |  SELECT CAST(user_id AS VARCHAR) AS jid, min(ts) AS jstart,
        |         min(ts) + INTERVAL 30 MINUTE AS jend
        |  FROM events GROUP BY 1),
        |j AS (
        |  SELECT m.host, m.event, m.value, m.jid, a.jstart, a.jend,
        |         CAST(floor((epoch_us(m.ts) - epoch_us(a.jstart)) / 60000000) AS BIGINT) AS bucket
        |  FROM m JOIN a ON m.jid = a.jid AND m.ts >= a.jstart AND m.ts < a.jend),
        |p AS (
        |  SELECT jid, host, bucket, jstart, jend,
        |         avg(CASE WHEN event = 'cpuuser' THEN value END) AS v_cpuuser,
        |         avg(CASE WHEN event = 'memused' THEN value END) AS v_memused,
        |         avg(CASE WHEN event = 'memused_minus_diskcache' THEN value END) AS v_mmdc,
        |         avg(CASE WHEN event = 'nfs' THEN value END) AS v_nfs,
        |         avg(CASE WHEN event = 'block' THEN value END) AS v_block
        |  FROM j GROUP BY 1, 2, 3, 4, 5),
        |hl AS (
        |  SELECT jid, jstart, jend, string_agg(DISTINCT host, ',' ORDER BY host) AS host_list
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT
        |  make_timestamp(epoch_us(p.jstart) + p.bucket*60000000
        |    + CAST(floor((least(epoch_us(p.jstart) + (p.bucket+1)*60000000, epoch_us(p.jend))
        |                  - (epoch_us(p.jstart) + p.bucket*60000000)) / 2) AS BIGINT)) AS time,
        |  p.jstart - INTERVAL 60 SECOND AS submit_time,
        |  p.jstart AS start_time,
        |  p.jend AS end_time,
        |  CAST(1800 AS BIGINT) AS timelimit,
        |  CAST(3 AS BIGINT) AS nhosts,
        |  CAST(96 AS BIGINT) AS ncores,
        |  'research' AS account,
        |  'normal' AS queue,
        |  p.host || '_S' AS host,
        |  p.jid || '_S' AS jid,
        |  'job' || p.jid AS jobname,
        |  '0' AS exitcode,
        |  hl.host_list || '_S' AS host_list,
        |  'u' || p.jid || '_S' AS username,
        |  floor((v_cpuuser)*1000000.0 + 0.5)/1000000.0 AS value_cpuuser,
        |  CAST(NULL AS DOUBLE) AS value_gpu,
        |  floor((v_memused)*1000000.0 + 0.5)/1000000.0 AS value_memused,
        |  floor((v_mmdc)*1000000.0 + 0.5)/1000000.0 AS value_memused_minus_diskcache,
        |  floor((v_nfs)*1000000.0 + 0.5)/1000000.0 AS value_nfs,
        |  floor((v_block)*1000000.0 + 0.5)/1000000.0 AS value_block
        |FROM p JOIN hl ON p.jid = hl.jid AND p.jstart = hl.jstart AND p.jend = hl.jend""".stripMargin,
    "q_sql_frontend" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_curate" ->
      s"""WITH dup_losers AS (SELECT id_b AS doc_id FROM ($ngramJaccardSql)),
         |q AS (
         |  SELECT doc_id, lang,
         |         string_split_regex(trim(text), '\\s+') AS toks,
         |         (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))*1.0
         |           / greatest(length(text), 1) AS pr,
         |         len(list_filter(string_split_regex(trim(text), '\\s+'),
         |             w -> w IN ('the','a','an','and','or','of','to','in','is','it',
         |                        'on','for','with','as','at','by','from','that','this')))*1.0
         |           / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS sr
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |         least(greatest(0.4 * least(len(toks)/64.0, 1.0) + 0.4 * least(sr*4.0, 1.0)
         |           + 0.2 * (1.0 - least(pr*5.0, 1.0)), 0.0), 1.0) AS qs
         |  FROM q)
         |SELECT doc_id, lang, floor((qs)*1000000.0 + 0.5)/1000000.0 AS quality_score FROM scored
         |WHERE qs >= 0.5 AND doc_id NOT IN (SELECT doc_id FROM dup_losers)""".stripMargin,
    "q_curate_full" ->
      s"""WITH toks0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS INT):CAST(i+2 AS INT)], ' ') AS s
         |        FROM toks0, LATERAL unnest(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |ev AS (SELECT DISTINCT s FROM sh0 WHERE doc_id % 97 = 0),
         |contaminated AS (SELECT DISTINCT sh0.doc_id FROM sh0 JOIN ev ON sh0.s = ev.s
         |                 WHERE sh0.doc_id % 97 <> 0),
         |dup_losers AS (SELECT id_b AS doc_id FROM ($ngramJaccardSql)),
         |q AS (
         |  SELECT doc_id, lang, text,
         |         string_split_regex(trim(text), '\\s+') AS toks,
         |         (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))*1.0
         |           / greatest(length(text), 1) AS pr,
         |         len(list_filter(string_split_regex(trim(text), '\\s+'),
         |             w -> w IN ('the','a','an','and','or','of','to','in','is','it',
         |                        'on','for','with','as','at','by','from','that','this')))*1.0
         |           / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS sr
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang, text,
         |         least(greatest(0.4 * least(len(toks)/64.0, 1.0) + 0.4 * least(sr*4.0, 1.0)
         |           + 0.2 * (1.0 - least(pr*5.0, 1.0)), 0.0), 1.0) AS qs
         |  FROM q)
         |SELECT doc_id, lang, floor((qs)*1000000.0 + 0.5)/1000000.0 AS quality_score,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |     + len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
         |     + len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS INT) AS n_pii,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |      '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g')) AS red_md5
         |FROM scored
         |WHERE doc_id % 97 <> 0
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |  AND qs >= 0.5
         |  AND doc_id NOT IN (SELECT doc_id FROM dup_losers)""".stripMargin,
    // the streaming-curation capstone's batch equivalent: the
    // q_curate_full stages (minus MinHash near-dup, plus the semantic
    // gate) with the within-cell cosine scan restricted to CURATION
    // SURVIVORS — the seam this query exists to pin. Labels from the
    // kmeans fixture, exactly as q_semdedup.
    "q_curate_semantic" ->
      s"""WITH toks0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS INT):CAST(i+2 AS INT)], ' ') AS s
         |        FROM toks0, LATERAL unnest(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |ev AS (SELECT DISTINCT s FROM sh0 WHERE doc_id % 97 = 0),
         |contaminated AS (SELECT DISTINCT sh0.doc_id FROM sh0 JOIN ev ON sh0.s = ev.s
         |                 WHERE sh0.doc_id % 97 <> 0),
         |q AS (
         |  SELECT doc_id, lang,
         |         string_split_regex(trim(text), '\\s+') AS toks,
         |         (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))*1.0
         |           / greatest(length(text), 1) AS pr,
         |         len(list_filter(string_split_regex(trim(text), '\\s+'),
         |             w -> w IN ('the','a','an','and','or','of','to','in','is','it',
         |                        'on','for','with','as','at','by','from','that','this')))*1.0
         |           / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS sr
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang,
         |         least(greatest(0.4 * least(len(toks)/64.0, 1.0) + 0.4 * least(sr*4.0, 1.0)
         |           + 0.2 * (1.0 - least(pr*5.0, 1.0)), 0.0), 1.0) AS qs
         |  FROM q),
         |survivors AS (
         |  SELECT doc_id, lang, qs,
         |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM scored
         |  WHERE doc_id % 97 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |    AND qs >= 0.5),
         |c AS (SELECT * FROM read_parquet('$KmeansFixture/corpus/*.parquet')),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sc AS (SELECT c.vec_id, c.coarse FROM c JOIN survivors s ON s.doc_id = c.vec_id),
         |losers AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM sc a JOIN sc b ON a.coarse = b.coarse AND a.vec_id < b.vec_id
         |  JOIN e ea ON ea.vec_id = a.vec_id
         |  JOIN e eb ON eb.vec_id = b.vec_id
         |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4)
         |SELECT s.doc_id, sc.coarse, s.lang,
         |       floor((s.qs)*1000000.0 + 0.5)/1000000.0 AS quality_score, s.split
         |FROM survivors s JOIN sc ON sc.vec_id = s.doc_id
         |WHERE s.doc_id NOT IN (SELECT vec_id FROM losers)""".stripMargin,
    // the trained-gate curation capstone: served margins re-derived from
    // the dumped quantized weight table (the q_quality_classifier
    // replay), the integer gate margin_q >= 0, near-dup losers from the
    // shared n-gram replay, lang joined from the corpus
    "q_curate_classified" ->
      s"""WITH dup_losers AS (SELECT id_b AS doc_id FROM ($ngramJaccardSql)),
         | f AS (SELECT doc_id, widx FROM read_parquet('$QcFeatFixture/*.parquet')),
         | w AS (SELECT widx, qw FROM read_parquet('$QcWeightsFixture/*.parquet')),
         | mt AS (SELECT qbias FROM read_parquet('$QcMetaFixture/*.parquet')),
         | m AS (
         |  SELECT f.doc_id,
         |         CAST(mt.qbias + COALESCE(SUM(w.qw), 0) AS BIGINT) AS margin_q
         |  FROM f LEFT JOIN w ON f.widx = w.widx CROSS JOIN mt
         |  GROUP BY f.doc_id, mt.qbias)
         |SELECT m.doc_id, d.lang, m.margin_q
         |FROM m JOIN documents d ON d.doc_id = m.doc_id
         |WHERE m.margin_q >= 0
         |  AND m.doc_id NOT IN (SELECT doc_id FROM dup_losers)""".stripMargin,
    // perplexity-gated curation: the q_lm_xent_served pruned-model replay
    // (same CTE chain — the whole bigram model re-derived in SQL, prune
    // included) scored per doc, thresholded on the ROUNDED xent both
    // sides compute identically, minus the shared n-gram loser replay.
    // Zero-bigram docs have no pd row and are dropped by construction,
    // matching the engine's NULL-fails-the-gate semantics.
    "q_curate_lm" ->
      s"""WITH dup_losers AS (SELECT id_b AS doc_id FROM ($ngramJaccardSql)),
        | d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c12p AS (SELECT * FROM c12 WHERE n12 >= 2),
        | c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln((coalesce(c12p.n12, 0) + 0.5) / (c1.n1 + 0.5 * v.vs)) AS logp
        |  FROM bg LEFT JOIN c12p USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams,
        |               floor(-avg(logp)*1000000.0 + 0.5)/1000000.0 AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT pd.doc_id, docs.lang, pd.n_bigrams, pd.xent
        |FROM pd JOIN documents docs ON docs.doc_id = pd.doc_id
        |WHERE pd.xent <= $LmCurateMaxXent
        |  AND pd.doc_id NOT IN (SELECT doc_id FROM dup_losers)""".stripMargin,
    "q_dedup_rep" ->
      """SELECT min(doc_id) AS doc_id, text, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_dedup_minhash" -> ngramJaccardSql,
    "q_dedup_simhash" ->
      s"""WITH h AS (
        |  SELECT sh_id, simhash
        |  FROM read_parquet('$SimhashFixture/*.parquet')),
        | b AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM h CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | p AS (
        |  SELECT DISTINCT a.sh_id AS id_a, b2.sh_id AS id_b,
        |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
        |  FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
        |   AND a.sh_id < b2.sh_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p WHERE hamming <= 3""".stripMargin,
    // the q_dedup_simhash replay over per-IMAGE dHashes: the hash is
    // engine-bound (codec decode + float grid pooling), but GIVEN the
    // dumped hashes, banding + bit_count pairing is plain SQL; null
    // dhash rows (unhashable images) are excluded on both sides
    "q_image_dedup" ->
      s"""WITH h AS (
        |  SELECT asset_id AS sh_id, dhash AS simhash
        |  FROM read_parquet('$ImageDhashFixture/*.parquet')
        |  WHERE dhash IS NOT NULL),
        | b AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM h CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | p AS (
        |  SELECT DISTINCT a.sh_id AS id_a, b2.sh_id AS id_b,
        |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
        |  FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
        |   AND a.sh_id < b2.sh_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p WHERE hamming <= ${Dedup.MmMaxHamming}""".stripMargin,
    // same replay over per-CLIP energy-delta fingerprints: the
    // fingerprint is engine-bound (byte framing + float pooling), but
    // GIVEN the dumped values, banding + bit_count pairing is plain SQL;
    // null afp rows (clips too short to frame) are excluded on both sides
    "q_audio_dedup" ->
      s"""WITH h AS (
        |  SELECT asset_id AS sh_id, afp AS simhash
        |  FROM read_parquet('$AudioFpFixture/*.parquet')
        |  WHERE afp IS NOT NULL),
        | b AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM h CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | p AS (
        |  SELECT DISTINCT a.sh_id AS id_a, b2.sh_id AS id_b,
        |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
        |  FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
        |   AND a.sh_id < b2.sh_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p WHERE hamming <= ${Dedup.MmMaxHamming}""".stripMargin,
    // the verified-pair pipelines replayed END TO END from fixtures:
    // banding + bit_count radius over the dumped hashes, then the
    // fixed-point grid/curve distance (exact integer sum — no IEEE
    // ceremony) joined per cell and thresholded exactly as the engine
    "q_image_dedup_verified" ->
      mmVerifiedOracleSql(ImageDhashFixture, "dhash", ImageGridFixture,
        Dedup.ImageMaxQDist),
    "q_audio_dedup_verified" ->
      mmVerifiedOracleSql(AudioFpFixture, "afp", AudioCurveFixture,
        Dedup.AudioMaxQDist),
    // hash-index SERVING replay: batch dHashes banded against the corpus
    // dHashes minus the tombstoned ids (asset_id % 50 — the lifecycle
    // builder's deletion predicate), exact bit_count radius. The engine
    // answers from the lifecycle-grown bucketed tables (build → appends
    // with a replayed key → delete → compact); the oracle derives the
    // same pairs from the dumped hashes alone — layout changes the plan,
    // never the answer (the q_dedup_index convention).
    "q_image_dedup_index" ->
      s"""WITH ih AS (
        |  SELECT asset_id AS sh_id, dhash AS simhash
        |  FROM read_parquet('$ImageDhashFixture/*.parquet')
        |  WHERE dhash IS NOT NULL AND asset_id % 50 <> 0),
        | nh AS (
        |  SELECT asset_id AS sh_id, dhash AS simhash
        |  FROM read_parquet('$ImageBatchDhashFixture/*.parquet')
        |  WHERE dhash IS NOT NULL),
        | ib AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM ih CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | nb AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM nh CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | p AS (
        |  SELECT DISTINCT nb.sh_id AS new_id, ib.sh_id AS index_id,
        |         bit_count(xor(nb.simhash, ib.simhash)) AS hamming
        |  FROM nb JOIN ib ON nb.chunk = ib.chunk AND nb.chunk_val = ib.chunk_val)
        |SELECT new_id, index_id, CAST(hamming AS BIGINT) AS hamming
        |FROM p WHERE hamming <= ${Dedup.MmMaxHamming}""".stripMargin,
    "q_image_dedup_keep" ->
      mmKeepOracleSql(ImageDhashFixture, "dhash", ImageGridFixture,
        Dedup.ImageMaxQDist),
    "q_audio_dedup_keep" ->
      mmKeepOracleSql(AudioFpFixture, "afp", AudioCurveFixture,
        Dedup.AudioMaxQDist),
    // the video modality rides the same three replays verbatim — the
    // temporal alignment lives in the qgrid cell key (j·72 + c), so the
    // generic banding + bit_count + Σ|Δ| SQL needs no video-specific
    // arithmetic — plus the frame-walk oracle, which parses the raw
    // payload bytes with no engine-derived fixture at all
    "q_video_frames" -> videoFramesOracleSql(VideoPayloadFixture),
    "q_video_dedup" ->
      s"""WITH h AS (
        |  SELECT asset_id AS sh_id, vhash AS simhash
        |  FROM read_parquet('$VideoHashFixture/*.parquet')
        |  WHERE vhash IS NOT NULL),
        | b AS (
        |  SELECT sh_id, simhash, c.chunk, (simhash >> (c.chunk*16)) & 65535 AS chunk_val
        |  FROM h CROSS JOIN (SELECT unnest([0,1,2,3]) AS chunk) c),
        | p AS (
        |  SELECT DISTINCT a.sh_id AS id_a, b2.sh_id AS id_b,
        |         bit_count(xor(a.simhash, b2.simhash)) AS hamming
        |  FROM b a JOIN b b2 ON a.chunk = b2.chunk AND a.chunk_val = b2.chunk_val
        |   AND a.sh_id < b2.sh_id)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p WHERE hamming <= ${Dedup.MmMaxHamming}""".stripMargin,
    "q_video_dedup_verified" ->
      mmVerifiedOracleSql(VideoHashFixture, "vhash", VideoGridFixture,
        Dedup.VideoMaxQDist),
    "q_video_dedup_keep" ->
      mmKeepOracleSql(VideoHashFixture, "vhash", VideoGridFixture,
        Dedup.VideoMaxQDist),
    // served quality-classifier margins re-derived from the dumped
    // quantized weight table + bias + per-doc feature slots: the margin
    // is an exact integer sum (fixed-point weights — associative, so a
    // plain SQL SUM replays it bit-for-bit), and p is the same per-row
    // sigmoid both engines round through the shared floor formula.
    // Slots carry hash-collision multiplicity on both sides (the dump
    // explodes the same transform the server folds), and featureless
    // docs ride the outer explode's NULL slot — never equi-joins, so
    // they serve exactly the bias.
    "q_quality_classifier" ->
      s"""WITH f AS (
        |  SELECT doc_id, widx FROM read_parquet('$QcFeatFixture/*.parquet')),
        | w AS (
        |  SELECT widx, qw FROM read_parquet('$QcWeightsFixture/*.parquet')),
        | mt AS (
        |  SELECT qbias, qscale FROM read_parquet('$QcMetaFixture/*.parquet')),
        | m AS (
        |  SELECT f.doc_id,
        |         CAST(mt.qbias + COALESCE(SUM(w.qw), 0) AS BIGINT) AS margin_q,
        |         mt.qscale AS qscale
        |  FROM f LEFT JOIN w ON f.widx = w.widx CROSS JOIN mt
        |  GROUP BY f.doc_id, mt.qbias, mt.qscale)
        |SELECT doc_id, margin_q,
        |       floor((1.0/(1.0 + exp(-(CAST(margin_q AS DOUBLE)/qscale))))*1000000.0 + 0.5)/1000000.0 AS p
        |FROM m""".stripMargin,
    "q_dedup_spans" ->
      s"""WITH sp AS (
        |  SELECT sh_id, shingle FROM read_parquet('$SpanFixture/*.parquet')),
        | c AS (
        |  SELECT shingle, count(*) AS span_docs FROM sp GROUP BY shingle)
        |SELECT CAST(sp.sh_id AS BIGINT) AS doc_id,
        |       count(*) AS n_spans,
        |       CAST(sum(CASE WHEN c.span_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_shared_spans,
        |       floor((CAST(sum(CASE WHEN c.span_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |              / count(*))*1000000.0 + 0.5)/1000000.0 AS shared_frac
        |FROM sp JOIN c USING (shingle)
        |GROUP BY sp.sh_id""".stripMargin,
    "q_dedup_spans_index" -> spansIndexSql,
    // the bucketed lifecycle-grown layout must produce the SAME scores
    // as flat serving of a one-shot build — one oracle, two plans (the
    // q_dedup_index / q_dedup_index_banded pattern); count additivity
    // makes the append-grown table content-equivalent to the full build
    "q_dedup_spans_index_bucketed" -> spansIndexSql,
    "q_dedup_spans_sketch" ->
      s"""WITH be AS (
        |  SELECT sh_id, shingle, est
        |  FROM read_parquet('$SpanSketchFixture/*.parquet'))
        |SELECT CAST(sh_id AS BIGINT) AS doc_id,
        |       count(shingle) AS n_spans,
        |       CAST(sum(CASE WHEN est >= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_indexed_spans,
        |       CASE WHEN count(shingle) > 0 THEN
        |         floor((CAST(sum(CASE WHEN est >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |                / count(shingle))*1000000.0 + 0.5)/1000000.0 END
        |         AS indexed_frac
        |FROM be GROUP BY sh_id""".stripMargin,
    "q_dedup_span_trim" ->
      s"""WITH g AS (
        |  SELECT sh_id, pos, gram FROM read_parquet('$SpanPosFixture/*.parquet')),
        | dup AS (
        |  SELECT gram FROM (
        |    SELECT gram, count(DISTINCT sh_id) AS nd FROM g GROUP BY gram)
        |  WHERE nd >= 2),
        | ds AS (SELECT DISTINCT sh_id, pos FROM g JOIN dup USING (gram)),
        | t AS (SELECT sh_id, pos, token
        |       FROM read_parquet('$SpanTokFixture/*.parquet')),
        | c AS (
        |  SELECT t.sh_id, t.pos, t.token,
        |         EXISTS (SELECT 1 FROM ds
        |                 WHERE ds.sh_id = t.sh_id
        |                   AND t.pos >= ds.pos AND t.pos < ds.pos + 8) AS covered
        |  FROM t)
        |SELECT CAST(sh_id AS BIGINT) AS doc_id,
        |       coalesce(string_agg(CASE WHEN NOT covered THEN token END,
        |                           ' ' ORDER BY pos), '') AS text,
        |       count(pos) AS n_tokens,
        |       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_tokens_removed
        |FROM c GROUP BY sh_id""".stripMargin,
    "q_dedup_index" -> dedupIndexSql,
    // the bucketed serving layout must produce the SAME hits and
    // estimates as flat serving — one oracle, two plans, both hash-gated
    "q_dedup_index_banded" -> dedupIndexSql,
    // the lifecycle-grown tables hold row-for-row what the full build
    // holds (geometry rides with the tables; signatures deterministic
    // per doc), so the append path shares the same oracle
    "q_dedup_index_ingest" -> dedupIndexSql,
    // ...and serving after a takedown ≡ never having indexed the
    // victims: the same replay over the fixture index minus their ids
    "q_dedup_index_delete" -> dedupIndexDeleteSql,
    "q_embed_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])))*1000000.0 + 0.5)/1000000.0 AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4""".stripMargin,
    "q_embed_lsh_pairs" ->
      """WITH corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |         CAST(list_concat([-embedding[1]], embedding[2:]) AS DOUBLE[]) FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       floor((list_cosine_similarity(a.v, b.v))*1000000.0 + 0.5)/1000000.0 AS cosine
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.95""".stripMargin,
    "q_embed_clusters" ->
      """WITH corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |         CAST(list_concat([-embedding[1]], embedding[2:]) AS DOUBLE[]) FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.95),
        |e AS (SELECT id_a AS u, id_b AS v FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |r AS (
        |  WITH RECURSIVE reach(u, v) AS (
        |    SELECT u, v FROM e
        |    UNION
        |    SELECT reach.u, e.v FROM reach JOIN e ON reach.v = e.u)
        |  SELECT u, v FROM reach)
        |SELECT u AS vec_id, least(u, min(v)) AS cluster_rep
        |FROM r GROUP BY u""".stripMargin,
    "q_vocab_by_lang" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |c AS (SELECT lang, token, count(*) AS n FROM toks WHERE token <> '' GROUP BY lang, token)
        |SELECT lang, token, n,
        |       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INT) AS rank
        |FROM c QUALIFY rank <= 5""".stripMargin,
    "q_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                              w -> w <> '')) AS INT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h,
        |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, shard,
        |         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |       shard * 1099511627776 + CAST(floor(cum / 256.0) AS BIGINT) AS bin
        |FROM c""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT <
        |  CASE source WHEN 'src0' THEN 65536 WHEN 'src1' THEN 32768
        |              WHEN 'src2' THEN 16384 ELSE 6553 END""".stripMargin,
    // temperature mixture: α-tempered shares over doc counts, budget =
    // half the corpus — no stratum caps at these sizes, so the single
    // closed-form pass is exact; membership is the same md5-cutoff
    // mechanism as q_sample_stratified
    "q_sample_temperature" ->
      """WITH sz AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        | w AS (SELECT source, n, pow(n, 0.5) AS wgt FROM sz),
        | f AS (
        |  SELECT source, n,
        |         (SELECT count(*)//2 FROM documents)
        |           * (wgt / (SELECT sum(wgt) FROM w)) / n AS frac
        |  FROM w)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN f USING (source)
        |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
        |      < floor(f.frac * 65536)""".stripMargin,
    "q_sample_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                              w -> w <> '')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents),
        | b(lang, budget) AS (
        |  VALUES ('en', 5000), ('de', 100000), ('zh', 2000), ('es', 0)),
        | c AS (
        |  SELECT t.*, b.budget,
        |         sum(n_tokens) OVER (PARTITION BY t.lang ORDER BY key, doc_id
        |                             ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t JOIN b USING (lang))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, n_tokens
        |FROM c WHERE cum <= budget""".stripMargin,
    "q_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY token)
        |SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // the LSH scale-path twin: same dominated rule, EXACT pair scan in
    // the oracle (sized geometry makes the engine's LSH candidates
    // complete to within the stated 1e-6/pair miss bound) over the
    // planted corpus's dumped labels at τ = 0.95
    "q_semdedup_lsh" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KmeansFixture/semcorpus/*.parquet')),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |       UNION ALL
        |       SELECT vec_id + 1000000,
        |              CAST(list_concat([-embedding[1]], embedding[2:]) AS DOUBLE[])
        |       FROM embeddings),
        | losers AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM c a JOIN c b ON a.coarse = b.coarse AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.95)
        |SELECT c.vec_id, c.coarse,
        |       c.vec_id NOT IN (SELECT vec_id FROM losers) AS kept
        |FROM c""".stripMargin,
    // BPE round-0 pair statistics: chars + '</w>' per word, adjacent
    // pairs weighted by word frequency — plain SQL end to end
    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, count(*) AS wn
        |  FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |                                  x -> x <> '')) AS word
        |        FROM documents) GROUP BY word),
        | s AS (
        |  SELECT wn,
        |         list_append(list_transform(range(1, length(word)+1),
        |                                    i -> substring(word, CAST(i AS INT), 1)),
        |                     '</w>') AS syms
        |  FROM w),
        | p AS (
        |  SELECT wn, syms[CAST(i AS INT)] AS lhs, syms[CAST(i+1 AS INT)] AS rhs
        |  FROM s, LATERAL unnest(range(1, len(syms))) AS t(i)),
        | c AS (SELECT lhs, rhs, CAST(sum(wn) AS BIGINT) AS n FROM p GROUP BY 1, 2)
        |SELECT lhs, rhs, n FROM c ORDER BY n DESC, lhs, rhs LIMIT 50""".stripMargin,
    // BPE encoding re-assembly: GIVEN the learned per-word symbol
    // sequences (engine-bound iterative training, dumped as a fixture),
    // the corpus-wide encode is positions ⋈ encodings flattened in doc
    // order — replayed here against the positional token fixture
    "q_bpe_encode" ->
      s"""WITH t AS (
        |  SELECT sh_id, pos, token FROM read_parquet('$SpanTokFixture/*.parquet')),
        | w AS (SELECT word, syms FROM read_parquet('$BpeFixture/*.parquet')),
        | j AS (
        |  SELECT t.sh_id, t.pos,
        |         array_to_string(w.syms, ' ') AS sym_str, len(w.syms) AS n_syms
        |  FROM t JOIN w ON t.token = w.word),
        | pd AS (
        |  SELECT sh_id, CAST(sum(n_syms) AS INT) AS n_bpe_tokens,
        |         string_agg(sym_str, ' ' ORDER BY pos) AS full_str
        |  FROM j GROUP BY sh_id)
        |SELECT CAST(d.sh_id AS BIGINT) AS doc_id,
        |       coalesce(pd.n_bpe_tokens, 0) AS n_bpe_tokens,
        |       md5(coalesce(pd.full_str, '')) AS bpe_md5
        |FROM (SELECT DISTINCT sh_id FROM t) d LEFT JOIN pd USING (sh_id)""".stripMargin,
    // pre-tokenized BPE encode: the oracle replays the GPT-2-style split
    // itself via the lookaround-free equivalent (alnum runs | single
    // non-alnum, whitespace dropped), then reassembles from the
    // engine's encoded-word fixture — tokenization AND reassembly both
    // inside the hash gate
    "q_bpe_encode_pre" ->
      s"""WITH d AS (
        |  SELECT event_id,
        |         list_filter(regexp_extract_all(props, '[A-Za-z0-9]+|[^A-Za-z0-9]'),
        |                     x -> NOT regexp_matches(x, '^\\s*$$')) AS w
        |  FROM events),
        | t AS (
        |  SELECT event_id, i AS pos, w[CAST(i AS INT)] AS token
        |  FROM d, LATERAL unnest(range(1, len(w) + 1)) AS u(i)),
        | wfix AS (SELECT word, syms FROM read_parquet('$BpePreFixture/*.parquet')),
        | j AS (
        |  SELECT t.event_id, t.pos,
        |         array_to_string(wfix.syms, ' ') AS sym_str, len(wfix.syms) AS n_syms
        |  FROM t JOIN wfix ON t.token = wfix.word),
        | pd AS (
        |  SELECT event_id, CAST(sum(n_syms) AS INT) AS n_bpe_tokens,
        |         string_agg(sym_str, ' ' ORDER BY pos) AS full_str
        |  FROM j GROUP BY event_id)
        |SELECT CAST(d.event_id AS BIGINT) AS event_id,
        |       coalesce(pd.n_bpe_tokens, 0) AS n_bpe_tokens,
        |       md5(coalesce(pd.full_str, '')) AS bpe_md5
        |FROM d LEFT JOIN pd USING (event_id)""".stripMargin,
    // BM25: exact tf/df/dl counts + the closed "+1"-smoothed idf, all
    // replayable in SQL; df comes from the FULL postings (then filtered
    // to the query terms), dl/avgdl count every corpus doc
    "q_bm25" -> bm25Sql,
    // RRF fusion replay: the q_bm25 score CTE and the dumped cosines each
    // ranked (rounded score DESC, doc_id) with a LIMIT-50 cut, fused by
    // 1/(60+rank) sums (two IEEE divisions + one add — identical operands
    // both sides), top 20 by (rrf DESC, doc_id)
    "q_hybrid_rrf" ->
      s"""WITH b AS ($bm25Sql),
        | bt AS (SELECT doc_id, score FROM b ORDER BY score DESC, doc_id LIMIT $HybridTopN),
        | br AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS r_bm25 FROM bt),
        | c AS (SELECT doc_id, cos_r FROM read_parquet('$HybridCosFixture/*.parquet')
        |       WHERE cos_r IS NOT NULL),
        | ct AS (SELECT doc_id, cos_r FROM c ORDER BY cos_r DESC, doc_id LIMIT $HybridTopN),
        | cr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_r DESC, doc_id) AS INT) AS r_emb FROM ct),
        | f AS (
        |  SELECT coalesce(br.doc_id, cr.doc_id) AS doc_id, br.r_bm25, cr.r_emb,
        |         coalesce(CAST(1.0 AS DOUBLE)/($RrfK + br.r_bm25), 0) + coalesce(CAST(1.0 AS DOUBLE)/($RrfK + cr.r_emb), 0) AS rrf
        |  FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id)
        |SELECT doc_id, r_bm25, r_emb,
        |       floor(rrf*1000000000.0 + 0.5)/1000000000.0 AS rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // the epoch-grown persisted layout answers the SAME oracle: counts,
    // df, N and Σdl are additive over the id-disjoint thirds and avgdl
    // derives from exact integer sums, so growth reproduces the
    // one-shot statistics bit for bit
    "q_bm25_served" -> bm25Sql,
    // exact-phrase: the oracle replays adjacency directly on the raw
    // token arrays (w[i]='hash' ∧ w[i+1]='join'), then the
    // phrase-as-one-term BM25 (tf = occurrences, df = |matching docs|)
    "q_bm25_phrase" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
        | occ AS (
        |  SELECT doc_id, len(w) AS dl,
        |         len(list_filter(range(1, len(w)),
        |             i -> w[CAST(i AS INT)] = 'hash'
        |              AND w[CAST(i+1 AS INT)] = 'join')) AS n_occurrences
        |  FROM d),
        | m AS (SELECT * FROM occ WHERE n_occurrences > 0),
        | dfp AS (SELECT count(*) AS dfp FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_occurrences,
        |       floor((ln(1 + (stats.n - dfp.dfp + 0.5) / (dfp.dfp + 0.5)) *
        |              (n_occurrences * (1.2 + 1)) /
        |              (n_occurrences + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl))
        |             )*1000000.0 + 0.5)/1000000.0 AS score
        |FROM m CROSS JOIN dfp CROSS JOIN stats""".stripMargin,
    // windowed co-occurrence: anchor = each 'hash' position; a doc
    // counts the anchors with a 'join' within |q−p| ≤ 3 (any order,
    // boundary inclusive), scored match-as-one-term with df = |docs|
    "q_bm25_window" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
        | pos AS (
        |  SELECT doc_id, len(w) AS dl,
        |         list_filter(range(1, len(w) + 1),
        |                     i -> w[CAST(i AS INT)] = 'hash') AS hp,
        |         list_filter(range(1, len(w) + 1),
        |                     i -> w[CAST(i AS INT)] = 'join') AS jp
        |  FROM d),
        | occ AS (
        |  SELECT doc_id, dl,
        |         len(list_filter(hp,
        |             p -> len(list_filter(jp, q -> abs(q - p) <= 3)) > 0)) AS n_occurrences
        |  FROM pos),
        | m AS (SELECT * FROM occ WHERE n_occurrences > 0),
        | dfw AS (SELECT count(*) AS dfw FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_occurrences,
        |       floor((ln(1 + (stats.n - dfw.dfw + 0.5) / (dfw.dfw + 0.5)) *
        |              (n_occurrences * (1.2 + 1)) /
        |              (n_occurrences + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl))
        |             )*1000000.0 + 0.5)/1000000.0 AS score
        |FROM m CROSS JOIN dfw CROSS JOIN stats""".stripMargin,
    // batch phrase matching: the oracle replays each VALUES phrase's
    // adjacency on the raw token arrays and the per-phrase df scoring —
    // the one-pass batch algebra ≡ per-phrase singles, hash-checked
    "q_bm25_phrase_batch" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | stats AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
        | q(phrase_id, t0, t1) AS (VALUES
        |   (1, 'hash', 'join'), (2, 'sort', 'merge'), (3, 'the', 'fast')),
        | occ AS (
        |  SELECT q.phrase_id, d.doc_id, len(d.w) AS dl,
        |         len(list_filter(range(1, len(d.w)),
        |             i -> d.w[CAST(i AS INT)] = q.t0
        |              AND d.w[CAST(i+1 AS INT)] = q.t1)) AS n_occurrences
        |  FROM d CROSS JOIN q),
        | m AS (SELECT * FROM occ WHERE n_occurrences > 0),
        | dfp AS (SELECT phrase_id, count(*) AS dfp FROM m GROUP BY 1)
        |SELECT CAST(m.phrase_id AS BIGINT) AS phrase_id,
        |       CAST(m.doc_id AS BIGINT) AS doc_id, m.n_occurrences,
        |       floor((ln(1 + (stats.n - dfp.dfp + 0.5) / (dfp.dfp + 0.5)) *
        |              (m.n_occurrences * (1.2 + 1)) /
        |              (m.n_occurrences + 1.2 * (1 - 0.75 + 0.75 * m.dl / stats.avgdl))
        |             )*1000000.0 + 0.5)/1000000.0 AS score
        |FROM m JOIN dfp USING (phrase_id) CROSS JOIN stats""".stripMargin,
    // the decontamination capstone: verbatim adjacency replayed per
    // VALUES phrase on the raw token arrays, hit set complemented —
    // survivors with their token counts
    "q_decontaminate_phrase" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | q(t0, t1) AS (VALUES ('hash', 'join'), ('sort', 'merge'), ('the', 'fast')),
        | hit AS (
        |  SELECT DISTINCT d.doc_id
        |  FROM d CROSS JOIN q
        |  WHERE len(list_filter(range(1, len(d.w)),
        |        i -> d.w[CAST(i AS INT)] = q.t0
        |         AND d.w[CAST(i+1 AS INT)] = q.t1)) > 0)
        |SELECT doc_id, CAST(len(w) AS INT) AS n_tokens
        |FROM d WHERE doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin,
    // top-k with block-max pruning: the oracle is EXHAUSTIVE scoring
    // (bm25Sql verbatim) plus the same rounded k-cut — ORDER BY the
    // 6-decimal-rounded score then doc_id, LIMIT 25 — so the hash gate
    // pins pruned serving's top-k equal to full scoring's
    "q_bm25_topk" ->
      s"""SELECT doc_id, n_matched, score FROM (
        |$bm25Sql
        |) ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    // batch serve: one pass, N queries — the oracle scores each VALUES
    // query with the single-query arithmetic (per-query distinct terms),
    // so batch ≡ per-query algebra is hash-checked
    "q_bm25_batch" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents),
        | d AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x <> '')) AS dl
        |  FROM documents),
        | stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
        | q(query_id, query) AS (VALUES
        |   (1, 'spark hash join stream'), (2, 'dup'), (3, 'the quick sort merge')),
        | qt AS (
        |  SELECT query_id,
        |         unnest(list_distinct(list_filter(
        |           string_split_regex(trim(query), '\s+'), x -> x <> ''))) AS term
        |  FROM q),
        | tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
        | df AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM tok)
        |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
        | sc AS (
        |  SELECT qt.query_id, tf.doc_id,
        |         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
        |         (tf.tf * (1.2 + 1)) /
        |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / stats.avgdl)) AS part
        |  FROM qt JOIN tf USING (term) JOIN df USING (term)
        |  JOIN d ON d.doc_id = tf.doc_id
        |  CROSS JOIN stats)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       CAST(doc_id AS BIGINT) AS doc_id, count(*) AS n_matched,
        |       floor(sum(part)*1000000.0 + 0.5)/1000000.0 AS score
        |FROM sc GROUP BY 1, 2""".stripMargin,
    // the served-pruned-model twin: bigrams below count 2 are pruned
    // from the model, so scoring coalesces them to the unseen floor
    // (0 + α)/(n1 + αV) — contexts and V are NOT pruned (the operator's
    // contract: pruned xent upper-bounds exact)
    "q_lm_xent_served" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c12p AS (SELECT * FROM c12 WHERE n12 >= 2),
        | c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln((coalesce(c12p.n12, 0) + 0.5) / (c1.n1 + 0.5 * v.vs)) AS logp
        |  FROM bg LEFT JOIN c12p USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    // SemDeDup: the fixture's k-means labels bound the pair scan; a row
    // is dropped iff a smaller-id same-cluster row sits at cosine ≥ 0.4
    "q_semdedup" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KmeansFixture/corpus/*.parquet')),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | losers AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM c a JOIN c b ON a.coarse = b.coarse AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4)
        |SELECT c.vec_id, c.coarse,
        |       c.vec_id NOT IN (SELECT vec_id FROM losers) AS kept
        |FROM c""".stripMargin,
    // the paper-exact SemDeDup rule: dominance is (centroid_dist DESC,
    // vec_id ASC) over the fixture's engine-computed distances; both
    // orders of a pair are examined, so no a<b pre-filter
    "q_semdedup_cdist" ->
      s"""WITH c AS (SELECT * FROM read_parquet('$KmeansFixture/corpus/*.parquet')),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | losers AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM c a JOIN c b ON a.coarse = b.coarse AND a.vec_id <> b.vec_id
        |   AND (a.centroid_dist > b.centroid_dist OR
        |        (a.centroid_dist = b.centroid_dist AND a.vec_id < b.vec_id))
        |  JOIN e ea ON ea.vec_id = a.vec_id
        |  JOIN e eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4)
        |SELECT c.vec_id, c.coarse,
        |       c.vec_id NOT IN (SELECT vec_id FROM losers) AS kept
        |FROM c""".stripMargin,
    // interpolated (Jelinek-Mercer) bigram/unigram LM, λ = 0.7: the
    // mixture λ·P₂ + (1−λ)·P₁ replayed with the same literal double
    // arithmetic ((1 - 0.7), not 0.3 — identical IEEE ops both sides);
    // self-scoring keeps every joined count seen, so inner joins
    "q_lm_xent_interp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | uni AS (SELECT token, count(*) AS nw FROM tok GROUP BY 1),
        | v AS (SELECT count(*) AS vs, CAST(sum(nw) AS DOUBLE) AS tt FROM uni),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln(0.7 * ((c12.n12 + 0.5) / (c1.n1 + 0.5 * v.vs))
        |          + (1 - 0.7) * ((uni.nw + 0.5) / (v.tt + 0.5 * v.vs))) AS logp
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |  JOIN uni ON uni.token = bg.w2 CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    // the served PRUNED interpolated model: bigrams below count 2 fall
    // to the unseen floor inside the mixture's P2 leg (LEFT JOIN +
    // coalesce); the unigram leg never prunes, so backoff still ranks
    // by word frequency
    "q_lm_xent_interp_served" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | uni AS (SELECT token, count(*) AS nw FROM tok GROUP BY 1),
        | v AS (SELECT count(*) AS vs, CAST(sum(nw) AS DOUBLE) AS tt FROM uni),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c12p AS (SELECT * FROM c12 WHERE n12 >= 2),
        | c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln(0.7 * ((coalesce(c12p.n12, 0) + 0.5) / (c1.n1 + 0.5 * v.vs))
        |          + (1 - 0.7) * ((uni.nw + 0.5) / (v.tt + 0.5 * v.vs))) AS logp
        |  FROM bg LEFT JOIN c12p USING (w1, w2) JOIN c1 USING (w1)
        |  JOIN uni ON uni.token = bg.w2 CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    // Kneser-Ney bigram LM (D = 0.75, continuation floor β = 0.5),
    // self-scored: the discounted first term, the D·fanout/n1 backoff
    // weight, and the continuation distribution N1+(·w2)/N1+(··) are
    // all replayed with the same literal IEEE association as the
    // engine — self-scoring keeps every joined count seen, so inner
    // joins on the DuckDB side
    "q_lm_xent_kn" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c1 AS (SELECT w1, sum(n12) AS n1, count(*) AS fo FROM c12 GROUP BY 1),
        | ct AS (SELECT w2, count(*) AS nct FROM c12 GROUP BY 1),
        | nt AS (SELECT count(*) AS nbt FROM c12),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln(greatest(c12.n12 - 0.75, 0.0) / c1.n1
        |          + (0.75 * c1.fo / c1.n1)
        |            * ((ct.nct + 0.5) / (nt.nbt + 0.5 * v.vs))) AS logp
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |  JOIN ct ON ct.w2 = bg.w2 CROSS JOIN nt CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    // the served PRUNED KN model: bigrams below count 2 lose their
    // discounted first term (LEFT JOIN + coalesce → greatest(·,0) = 0)
    // and fall to the discounted-backoff leg alone; contexts,
    // continuation counts and the totals keep describing the full
    // corpus, so pruned xent upper-bounds exact
    "q_lm_xent_kn_served" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c12p AS (SELECT * FROM c12 WHERE n12 >= 2),
        | c1 AS (SELECT w1, sum(n12) AS n1, count(*) AS fo FROM c12 GROUP BY 1),
        | ct AS (SELECT w2, count(*) AS nct FROM c12 GROUP BY 1),
        | nt AS (SELECT count(*) AS nbt FROM c12),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln(greatest(coalesce(c12p.n12, 0) - 0.75, 0.0) / c1.n1
        |          + (0.75 * c1.fo / c1.n1)
        |            * ((ct.nct + 0.5) / (nt.nbt + 0.5 * v.vs))) AS logp
        |  FROM bg LEFT JOIN c12p USING (w1, w2) JOIN c1 USING (w1)
        |  JOIN ct ON ct.w2 = bg.w2 CROSS JOIN nt CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    // trigram Kneser-Ney (D = 0.75, β = 0.5), self-scored: the full
    // order recursion replayed — raw-count discounting over the
    // trigram table, continuation-TYPE discounting over the per-(w2,w3)
    // distinct-left-context table derived from it, the floored
    // continuation unigram at the bottom — with the engine's literal
    // IEEE association at every level
    // trigram Kneser-Ney (D = 0.75, β = 0.5), self-scored / served
    // pruned: since r15 the engine serves order 3 through the generic
    // KN-N cascade, so the oracle is knNOracleSql(3, …) — the same
    // mechanically-generated recursion as kn5, never a second
    // hand-transcription of it (the bespoke KN3 path survives only as
    // LanguageModelSpec's bit-identity witness)
    "q_lm_xent_kn3" -> knNOracleSql(3, pruned = false),
    "q_lm_xent_kn3_served" -> knNOracleSql(3, pruned = true),
    // 5-gram Kneser-Ney (D = 0.75, β = 0.5), self-scored / served
    // pruned: the SAME recursion as kn3, mechanically generated at
    // order 5 by knNOracleSql — five discount/backoff levels, the
    // engine's literal IEEE association at each
    "q_lm_xent_kn5" -> knNOracleSql(5, pruned = false),
    "q_lm_xent_kn5_served" -> knNOracleSql(5, pruned = true),
    // MODIFIED Kneser-Ney (Chen & Goodman count-of-counts discounts)
    // at order 3, self-scored / served pruned: the oracle re-derives
    // the per-level D1/D2/D3+ estimates from the count histograms in
    // SQL — the discount estimation sits under the hash gate too
    "q_lm_xent_mkn" -> mknOracleSql(3, pruned = false),
    "q_lm_xent_mkn_served" -> mknOracleSql(3, pruned = true),
    "q_lm_xent_mkn5" -> mknOracleSql(5, pruned = false),
    "q_lm_xent_mkn5_served" -> mknOracleSql(5, pruned = true),
    // bigram LM, add-0.5 smoothing, self-scored: contexts derive from
    // the bigram table (Σ n12 per w1, NOT unigram occurrence counts),
    // V = distinct corpus tokens; every doc appears — 0 bigrams / NULL
    // xent for docs under 2 tokens. Self-scoring keeps every scored
    // bigram seen, so the model joins are inner on the DuckDB side.
    "q_lm_xent" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        | tok AS (SELECT unnest(w) AS token FROM d),
        | v AS (SELECT count(DISTINCT token) AS vs FROM tok),
        | bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i+1 AS INT)] AS w2
        |  FROM d, LATERAL unnest(range(1, greatest(len(w), 1))) AS t(i)),
        | c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
        | c1 AS (SELECT w1, sum(n12) AS n1 FROM c12 GROUP BY 1),
        | sc AS (
        |  SELECT bg.doc_id,
        |         ln((c12.n12 + 0.5) / (c1.n1 + 0.5 * v.vs)) AS logp
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        | pd AS (SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS xent
        |        FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
        |       floor(pd.xent*1000000.0 + 0.5)/1000000.0 AS xent
        |FROM d LEFT JOIN pd USING (doc_id)""".stripMargin,
    "q_ann_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT query_id, nn_id, floor((cos)*1000000.0 + 0.5)/1000000.0 AS cosine,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS INT) AS rank
        |FROM scored QUALIFY rank <= 5""".stripMargin,
    "q_ann_ivf" -> annIvfSql,
    "q_ann_ivf_q8" -> annIvfSql, // quantized index + exact re-score ≡ exact by design
    "q_ann_ivf_pruned" -> annIvfSql, // partition pruning is exact — same answer from disk
    // IVF-PQ: given ONLY the dumped codebooks (the engine-bound Lloyd
    // fits), the oracle re-derives every corpus vector's PQ codes
    // (per-subspace squared-L2 argmin, ties to the lower code — the
    // same sequential IEEE sums), replays the asymmetric-distance
    // shortlist (k·factor = 12 per query, ADC rounded to 6 decimals
    // before ranking on BOTH sides — Σ-over-subspaces is aggregation-
    // order-sensitive at the ulp), and exact-rescores the shortlist —
    // the full product-quantization serving path in SQL
    "q_ann_pq" -> annPqSql,
    "q_ann_opq" -> annOpqSql,
    "q_ann_opq_served" -> annOpqSql,
    "q_ann_opq_res" -> annOpqResSql,
    "q_ann_pq_res" -> annPqResSql,
    "q_ann_pq_res_served" -> annPqResSql,
    "q_ann_pq_res_pruned" -> annPqResSql,
    // the persisted-code serving twin answers the SAME replay: integer
    // codes round-trip parquet exactly, so the served shortlist and the
    // inline one are the same shortlist
    "q_ann_pq_served" -> annPqSql,
    // learned IVF: the engine dumps the labels its centroids induce
    // (corpus = one cell each, queries = nprobe=2 fan-out); the oracle
    // replays the cell-restricted candidate join + exact-cosine ranking.
    // A corpus row has ONE cell, so a probed query meets it at most once —
    // no dedup needed, mirroring withProbeLabels' contract.
    "q_ann_kmeans" -> kmeansIvfSql,
    // the full serving composition (learned + on-disk pruned + quantized
    // shortlist + exact re-score) answers from the SAME induced cells,
    // so it shares q_ann_kmeans's oracle verbatim
    "q_ann_serve" -> kmeansIvfSql,
    // ...and the lifecycle-grown index holds row-for-row what the full
    // build holds (appends label with the riding quantizer), so the
    // append path sits under the same oracle too
    "q_ann_ingest" -> kmeansIvfSql,
    // serving after a takedown ≡ never having indexed the victims: the
    // same replay over the fixture corpus minus the tombstoned ids
    "q_ann_delete" -> kmeansIvfDeleteSql,
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))/127.0 AS s
        |  FROM embeddings),
        | e AS (
        |  SELECT vec_id, s,
        |         CAST(unnest(range(0, len(v))) AS INT) AS pos,
        |         unnest(v) AS x
        |  FROM q)
        |SELECT vec_id, pos,
        |       CASE WHEN s = 0 THEN 0 ELSE CAST(floor(x/s + 0.5) AS INT) END AS code,
        |       s AS q8_scale,
        |       CAST(abs((CASE WHEN s = 0 THEN 0 ELSE CAST(floor(x/s + 0.5) AS INT) END) * s - x) <= s/2 AS INT) AS in_bound
        |FROM e""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks,
        |         (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))*1.0
        |           / greatest(length(text), 1) AS pr,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |             w -> w IN ('the','a','an','and','or','of','to','in','is','it',
        |                        'on','for','with','as','at','by','from','that','this')))*1.0
        |           / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS sr
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
        |       floor((pr)*1000000.0 + 0.5)/1000000.0 AS punct_ratio,
        |       floor((sr)*1000000.0 + 0.5)/1000000.0 AS stopword_ratio,
        |       floor((COALESCE(list_sum(list_transform(list_filter(toks, w -> w <> ''),
        |                w -> length(w))), 0)*1.0
        |              / greatest(len(list_filter(toks, w -> w <> '')), 1))*1000000.0 + 0.5)/1000000.0 AS mean_word_len,
        |       floor((least(greatest(
        |         0.4 * least(len(toks)/64.0, 1.0) + 0.4 * least(sr*4.0, 1.0)
        |           + 0.2 * (1.0 - least(pr*5.0, 1.0)), 0.0), 1.0))*1000000.0 + 0.5)/1000000.0 AS quality_score
        |FROM t""".stripMargin,
    "q_text_langid" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w IN ('der','die','das','und','ist','nicht','ein')))*1.0
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_de,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w IN ('the','a','an','and','or','of','to','in','is','it',
        |                   'on','for','with','as','at','by','from','that','this')))*1.0
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_en,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w IN ('el','la','los','de','que','y','un','una')))*1.0
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_es,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w IN ('le','la','les','et','des','un','une','est')))*1.0
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_fr,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        w -> w IN ('的','是','不','了','在')))*1.0
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) <= 0.0 THEN 'und'
        |            WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
        |            WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
        |            WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
        |            WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
        |            ELSE 'zh' END AS pred_lang,
        |       floor((greatest(s_de,s_en,s_es,s_fr,s_zh))*1000000.0 + 0.5)/1000000.0 AS lang_score
        |FROM s""".stripMargin,
    "q_text_fingerprint" ->
      """WITH n AS (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
        |           FROM documents)
        |SELECT doc_id, md5(norm) AS md5_fp,
        |       (SELECT min(md5(substring(norm, CAST(i AS INT), 8)))
        |        FROM unnest(range(1, greatest(length(norm)-6, 2))) AS t(i)) AS min_shingle_fp
        |FROM n""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS lines,
        |         list_filter(string_split_regex(trim(text), '\s+'), w -> length(w) > 0) AS toks
        |  FROM documents),
        | b AS (
        |  SELECT doc_id, lines,
        |         list_transform(range(1, greatest(len(toks), 1)), i -> toks[i] || ' ' || toks[i+1]) AS bigrams
        |  FROM t)
        |SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
        |       floor((CASE WHEN len(lines)=0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines) END)*1000000.0 + 0.5)/1000000.0 AS dup_line_frac,
        |       floor((CASE WHEN len(bigrams)=0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)/len(bigrams) END)*1000000.0 + 0.5)/1000000.0 AS dup_bigram_frac
        |FROM b""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), w -> length(w) > 0) AS toks
        |  FROM documents),
        | c AS (
        |  SELECT doc_id, toks, CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) + 1 AS INT) AS n_chunks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx,
        |  unnest(list_transform(range(0, n_chunks), i -> md5(array_to_string(list_slice(toks, i*48+1, i*48+64), ' ')))) AS chunk_md5,
        |  CAST(unnest(list_transform(range(0, n_chunks), i -> len(list_slice(toks, i*48+1, i*48+64)))) AS INT) AS chunk_tokens
        |FROM c""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS INT):CAST(i+2 AS INT)], ' ') AS s
        |       FROM toks, LATERAL unnest(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
        |SELECT tr.doc_id, count(*) AS n_contaminated_ngrams
        |FROM tr JOIN ev ON tr.s = ev.s
        |GROUP BY tr.doc_id""".stripMargin,
    "q_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com or 555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |    CAST((doc_id * 7) % 256 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')) AS red_md5
        |FROM p""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS asset_id, 'text/plain' AS mime,
        |       octet_length(encode(text)) AS n_bytes,
        |       CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
        |       md5(text) AS content_md5
        |FROM documents""".stripMargin,
    "q_multimodal_dims" ->
      """SELECT doc_id AS asset_id,
        |       CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png'
        |            WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS fmt,
        |       CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 1080 + 1 AS INTEGER) AS height
        |FROM documents""".stripMargin,
    // no codec on the oracle side: every header field and pixel byte is
    // sliced out of the BMP blob via its hex dump (DuckDB v1.0 has no
    // direct blob subscript) — hx[2k+1..2k+2] is byte k, '0x'-cast to int
    "q_multimodal_pixels" ->
      s"""WITH b AS (SELECT doc_id, hex(img) AS hx
        |            FROM read_parquet('$BmpFixture/*.parquet')),
        | hdr AS (
        |  SELECT doc_id, hx,
        |         ${(0 to 3).map(k => s"CAST(concat('0x', substring(hx, ${2 * (10 + k) + 1}, 2)) AS BIGINT) * ${1L << (8 * k)}").mkString(" + ")} AS off,
        |         ${(0 to 3).map(k => s"CAST(concat('0x', substring(hx, ${2 * (18 + k) + 1}, 2)) AS BIGINT) * ${1L << (8 * k)}").mkString(" + ")} AS w,
        |         ${(0 to 3).map(k => s"CAST(concat('0x', substring(hx, ${2 * (22 + k) + 1}, 2)) AS BIGINT) * ${1L << (8 * k)}").mkString(" + ")} AS h
        |  FROM b),
        | px AS (
        |  SELECT doc_id, w, h,
        |         CAST(concat('0x', substring(hx, CAST(2*(off + (h-1 - t.i//w)*((3*w+3) - (3*w+3)%4) + 3*(t.i%w) + 2)+1 AS INT), 2)) AS BIGINT) AS r,
        |         CAST(concat('0x', substring(hx, CAST(2*(off + (h-1 - t.i//w)*((3*w+3) - (3*w+3)%4) + 3*(t.i%w) + 1)+1 AS INT), 2)) AS BIGINT) AS g,
        |         CAST(concat('0x', substring(hx, CAST(2*(off + (h-1 - t.i//w)*((3*w+3) - (3*w+3)%4) + 3*(t.i%w))+1 AS INT), 2)) AS BIGINT) AS bl
        |  FROM hdr, LATERAL unnest(range(w*h)) AS t(i))
        |SELECT doc_id AS asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(w*h AS INT) AS n_px,
        |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |       CAST(sum(bl) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "q_multimodal_features" ->
      s"""SELECT asset_id, CAST(len(feature) AS INT) AS feat_dim,
        |       floor((CAST(feature[1] AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS feat0
        |FROM read_parquet('$MultimodalFixture/*.parquet')""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount > 0.05""".stripMargin,
    "q_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_multi" ->
      """SELECT l_returnflag,
        |       floor((CAST(sum(l_quantity) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_qty,
        |       floor((CAST(sum(l_extendedprice) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_price,
        |       floor((CAST(avg(l_discount) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_disc,
        |       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_agg_mean" ->
      """SELECT event_type, floor((CAST(avg(value) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_value,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "q_collect_str" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |       count(*) AS n_customers
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       floor((CAST(avg(CASE WHEN event_type='click' THEN value END) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_click,
        |       floor((CAST(avg(CASE WHEN event_type='error' THEN value END) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_error,
        |       floor((CAST(avg(CASE WHEN event_type='purchase' THEN value END) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_purchase,
        |       floor((CAST(avg(CASE WHEN event_type='signup' THEN value END) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_signup,
        |       floor((CAST(avg(CASE WHEN event_type='view' THEN value END) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_view
        |FROM events GROUP BY user_id""".stripMargin,
    "q_window_lag" ->
      """SELECT user_id, event_id,
        |       value - lag(value) OVER w AS delta_value,
        |       (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6 AS dt_sec
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |QUALIFY dt_sec >= 0.1 AND delta_value >= 0.0""".stripMargin,
    "q_interval_join" -> intervalJoinSql,
    "q_interval_join_bucketed" -> intervalJoinSql, // bucketed ≡ broadcast by design
    "q_interval_join_auto" ->
      """WITH a AS (SELECT user_id, min(ts) AS s, min(ts) + INTERVAL 30 MINUTE AS e
        |           FROM events GROUP BY user_id)
        |SELECT CAST(ev.user_id AS BIGINT) AS user_id, count(*) AS n_rows,
        |       floor((CAST(sum(ev.value) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_v
        |FROM events ev JOIN a ON ev.user_id = a.user_id AND ev.ts >= a.s AND ev.ts < a.e
        |GROUP BY ev.user_id""".stripMargin,
    "q_interval_join_incl" ->
      """WITH r AS (SELECT user_id, ts,
        |            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |           FROM events),
        |a AS (SELECT user_id AS auid, min(ts) AS s, max(ts) AS e
        |      FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT CAST(ev.user_id AS BIGINT) AS user_id, count(*) AS n_rows,
        |       floor((CAST(sum(ev.value) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS sum_v
        |FROM events ev JOIN a ON ev.user_id = a.auid AND ev.ts >= a.s AND ev.ts <= a.e
        |GROUP BY ev.user_id""".stripMargin,
    "q_join3" ->
      """SELECT r_name, count(*) AS n_customers,
        |       floor((CAST(sum(c_acctbal) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')""".stripMargin,
    "q_union_dedup" ->
      """SELECT event_type, count(*) AS n_rows FROM (
        |  SELECT * FROM events WHERE value > 150
        |  UNION
        |  SELECT * FROM events WHERE event_type = 'error'
        |) GROUP BY event_type""".stripMargin,
    "q_jid_normalize" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 4 = 0 THEN 'jobID' || o_orderkey
        |              WHEN o_orderkey % 4 = 1 THEN 'JOB' || o_orderkey
        |              WHEN o_orderkey % 4 = 2 THEN CAST(o_orderkey AS VARCHAR)
        |              ELSE 'task-' || o_orderkey END AS raw_id
        |  FROM orders)
        |SELECT o_orderkey, raw_id,
        |       replace(replace(raw_id, 'jobID', 'JOB'), 'job', 'JOB') AS std_id,
        |       coalesce(nullif(regexp_extract(raw_id, '([0-9]+)$', 1), ''), raw_id) AS jid,
        |       replace(replace(raw_id, 'jobID', 'JOB'), 'job', 'JOB') || '_S' AS suffixed
        |FROM t""".stripMargin,
    "q_dates" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS day_str,
        |       strftime(o_orderdate, '%Y-%m') AS month_str,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_session_bucket" ->
      """WITH b AS (
        |  SELECT CAST(user_id AS BIGINT) AS user_id, value,
        |         CAST(floor((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
        |                    / 600000000) AS BIGINT) AS bucket
        |  FROM events)
        |SELECT user_id, bucket, count(*) AS n_events,
        |       floor((CAST(avg(value) AS DOUBLE))*1000000.0 + 0.5)/1000000.0 AS avg_value
        |FROM b GROUP BY user_id, bucket""".stripMargin,
    "q_skew_salted" ->
      """SELECT event_type, count(*) AS n_events,
        |       floor((CAST(sum(value) AS DOUBLE))*10000.0 + 0.5)/10000.0 AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM o)
        |SELECT CAST(user_id AS BIGINT) AS user_id, CAST(sess AS BIGINT) AS session_idx,
        |       count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts,
        |       floor((avg(value))*1000000.0 + 0.5)/1000000.0 AS mean_value
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "q_dedup_exact" ->
      """SELECT lang, count(DISTINCT text) AS n_distinct_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_safediv_clamp" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor((least(greatest(
        |         CASE WHEN l_quantity <> 0 THEN l_extendedprice / l_quantity ELSE 0.0 END,
        |         0.0), 1500.0))*1000000.0 + 0.5)/1000000.0 AS unit_price_clamped
        |FROM lineitem""".stripMargin,
    "q_profile" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  floor((min(value))*1000000.0 + 0.5)/1000000.0 AS min_v,
        |  floor((max(value))*1000000.0 + 0.5)/1000000.0 AS max_v,
        |  floor((quantile_cont(value, 0.25))*1000000.0 + 0.5)/1000000.0 AS p25,
        |  floor((quantile_cont(value, 0.5))*1000000.0 + 0.5)/1000000.0 AS p50,
        |  floor((quantile_cont(value, 0.75))*1000000.0 + 0.5)/1000000.0 AS p75
        |FROM events GROUP BY event_type""".stripMargin,
    "q_profile_approx" ->
      """SELECT event_type, count(*) AS n,
        |  floor((quantile_disc(value, 0.25))*1000000.0 + 0.5)/1000000.0 AS p25_approx,
        |  floor((quantile_disc(value, 0.5))*1000000.0 + 0.5)/1000000.0 AS p50_approx,
        |  floor((quantile_disc(value, 0.75))*1000000.0 + 0.5)/1000000.0 AS p75_approx
        |FROM events GROUP BY event_type""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin)
}
