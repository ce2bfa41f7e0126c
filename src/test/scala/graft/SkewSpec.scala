package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted aggregation / join must be value-identical to the unsalted
  * equivalents — salting only changes the physical key distribution. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = // one hot key (90%), several cold ones
    ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold${i % 7}", i.toDouble))).toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("tot"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
        "n" -> (count(lit(1)), (ps: org.apache.spark.sql.Column) => sum(ps)),
        "tot" -> (sum($"v"), (ps: org.apache.spark.sql.Column) => sum(ps)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", 8).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }
}
