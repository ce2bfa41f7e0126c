package graft

import org.apache.spark.sql.functions._

import graft.functions.Exprs._

/** Unit specs for the expression helpers (SURVEY.md §2.8/§2.10), including
  * the jid variant zoo of FIXTURES.md §5.3. */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect()(0).get(0)

  test("normalizeJobId: trailing digits with fallback to original") {
    val got = Seq("123", "jobID123", "JOB123", "JOBID123", "job45ID7", "nodigits")
      .toDF("id").select(normalizeJobId($"id").as("jid")).as[String].collect()
    assert(got.toSeq == Seq("123", "123", "123", "123", "7", "nodigits"))
  }

  test("standardizeJobId: jobID→JOB then job→JOB, order matters") {
    val got = Seq("jobID123", "job123", "JOB123", "job45ID7")
      .toDF("id").select(standardizeJobId($"id").as("s")).as[String].collect()
    assert(got.toSeq == Seq("JOB123", "JOB123", "JOB123", "JOB45ID7"))
  }

  test("finalizeJid: drop FIRST ID, FIRST job→JOB, append _S") {
    val got = Seq("jobID123", "JOB123", "1238067", "job45ID7", "jobID12job", "aIDbIDc")
      .toDF("id").select(finalizeJid($"id").as("s")).as[String].collect()
    // Polars str.replace(literal=True) is first-occurrence-only:
    // "jobID12job" -> drop first "ID" -> "job12job" -> first "job"->"JOB"
    // -> "JOB12job_S"; second occurrences untouched
    assert(got.toSeq == Seq("JOB123_S", "JOB123_S", "1238067_S", "JOB457_S",
      "JOB12job_S", "abIDc_S"))
  }

  test("safeDiv: zero denominator yields default") {
    assert(one(safeDiv(lit(10.0), lit(0.0))) == 0.0)
    assert(one(safeDiv(lit(10.0), lit(4.0))) == 2.5)
  }

  test("clampMetric: clamps and null-defaults to lo") {
    assert(one(clampMetric(lit(150.0), 0, 100)) == 100.0)
    assert(one(clampMetric(lit(-5.0), 0, 100)) == 0.0)
    assert(one(clampMetric(lit(null).cast("double"), 0, 100)) == 0.0)
  }

  test("bucket index / start / end / midpoint in µs arithmetic") {
    val start = to_timestamp(lit("2013-01-01 10:00:00"))
    val end = to_timestamp(lit("2013-01-01 10:01:30"))
    val ts = to_timestamp(lit("2013-01-01 10:01:15"))
    val min = 60L * 1000000L
    assert(one(bucketIndex(ts, start, min)) == 1L)
    assert(one(bucketStart(start, lit(1L), min)).toString == "2013-01-01 10:01:00.0")
    // bucket 1 end is clipped at the job end 10:01:30 (not 10:02:00)
    assert(one(bucketEnd(start, lit(1L), min, end)).toString == "2013-01-01 10:01:30.0")
    assert(one(intervalMidpoint(start, end)).toString == "2013-01-01 10:00:45.0")
  }

  test("µs helpers accept TIMESTAMP_NTZ inputs (naive parquet reads)") {
    // parquet written with isAdjustedToUTC=false reads as TIMESTAMP_NTZ
    // under default sessions; `unix_micros` rejects that type outright, so
    // every µs helper routes through tsMicros' session-zoned cast. The
    // 2026-08 testdata regeneration shipped exactly this encoding and
    // silently dropped five queries from the gate — this spec pins the
    // fix: each helper must yield the SAME value on ntz and zoned twins.
    val startS = "2013-01-01 10:00:00"; val endS = "2013-01-01 10:01:30"
    def zoned(s: String) = to_timestamp(lit(s))
    def ntz(s: String) = lit(s).cast("timestamp_ntz")
    assert(one(tsMicros(ntz(startS))) == one(tsMicros(zoned(startS))))
    assert(one(secondsBetween(ntz(endS), ntz(startS))) == 90.0)
    assert(one(bucketIndex(ntz(endS), ntz(startS), 60L * 1000000L)) == 1L)
    assert(one(intervalMidpoint(ntz(startS), ntz(endS))).toString ==
      "2013-01-01 10:00:45.0")
    assert(one(bucketEnd(ntz(startS), lit(1L), 60L * 1000000L, ntz(endS)))
      .toString == "2013-01-01 10:01:30.0")
  }

  test("hostList: sorted comma-joined distinct, empties and nulls excluded") {
    val got = Seq(("j", "N2"), ("j", "N1"), ("j", "N2"), ("j", ""), ("j", null))
      .toDF("job", "host").groupBy("job").agg(hostList($"host").as("hl"))
      .select("hl").as[String].collect()
    assert(got.toSeq == Seq("N1,N2"))
  }

  test("parseRawTs accepts unpadded month/day/hour fields") {
    val got = Seq("1/5/2013 3:04:05")
      .toDF("t").select(parseRawTs($"t").as("ts")).collect()
    assert(got(0).getTimestamp(0).toString == "2013-01-05 03:04:05.0")
  }

  test("parseTsMulti: first matching format wins, null when none match") {
    val formats = Seq("MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss")
    val got = Seq("02/27/2013 13:05:00", "2013-02-27 13:05:00", "27.02.2013")
      .toDF("t").select(parseTsMulti($"t", formats).as("ts")).collect()
    assert(got(0).getTimestamp(0).toString == "2013-02-27 13:05:00.0")
    assert(got(1).getTimestamp(0).toString == "2013-02-27 13:05:00.0")
    assert(got(2).isNullAt(0))
  }

  test("parseRawTs: MM/dd/yyyy, null on garbage") {
    val got = Seq("02/27/2013 13:05:00", "garbage")
      .toDF("t").select(parseRawTs($"t").as("ts")).collect()
    assert(got(0).getTimestamp(0).toString == "2013-02-27 13:05:00.0")
    assert(got(1).isNullAt(0))
  }
}
