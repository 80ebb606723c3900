package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Bounded-heap top-k Aggregator: agreement with the brute-force sort
 * across random inputs (covers reduce insertion, bounded merge across
 * partitions, tiebreak determinism). */
class TopKSpec extends SparkTestBase {

  import spark.implicits._

  test("TopKAgg == sort-take-k over random data, ties broken by id asc") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map { id =>
      (s"g${id % 7}", rnd.nextInt(40).toLong, id) // dense ties
    }
    val df = rows.toDF("g", "v", "id").repartition(8)
    val top3 = udaf(new TopK.TopKAgg(3))
    val got = df.groupBy("g").agg(top3(col("v"), col("id")).as("t"))
      .select(col("g"), col("t").getField("items").as("items"))
      .as[(String, Seq[(Long, Long)])].collect()
      .map { case (g, items) => g -> items }.toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (v, id) => (-v, id) }
        .take(3).toSeq
    }
    assert(got === want)
  }

  test("TopKAgg: k larger than group size returns the whole group sorted") {
    val df = Seq(("a", 1L, 10L), ("a", 5L, 11L)).toDF("g", "v", "id")
    val top9 = udaf(new TopK.TopKAgg(9))
    val got = df.groupBy("g").agg(top9(col("v"), col("id")).as("t"))
      .select(col("t").getField("items")).as[Seq[(Long, Long)]]
      .collect().head
    assert(got === Seq((5L, 11L), (1L, 10L)))
  }

  test("TopKAgg: null value/id rows are skipped, not fatal") {
    val df = Seq(("a", Some(1L), Some(10L)), ("a", None, Some(11L)),
      ("a", Some(9L), None), ("a", Some(5L), Some(12L)))
      .toDF("g", "v", "id")
    val top2 = udaf(new TopK.TopKAgg(2))
    val got = df.groupBy("g").agg(top2(col("v"), col("id")).as("t"))
      .select(col("t").getField("items")).as[Seq[(Long, Long)]]
      .collect().head
    assert(got === Seq((5L, 12L), (1L, 10L)))
  }
}
