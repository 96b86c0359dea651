package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Invariants and differential checks for the round-5 operators: sliding
  * windows, int8 quantization, label centroids, bag-of-words dedup, exact
  * mode, quality-filter gate, k-fold split, LISTAGG, and parse_url. */
class Round5Spec extends SparkSpec {

  test("sliding 15m windows on the hour grid equal the tumbling hourly aggregation") {
    val slide = Events.slidingQuarterHour(spark, sfDir)
      .filter(expr("minute(win_start) = 0 and second(win_start) = 0"))
      .select(col("win_start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))
    val tumble = Events.tumblingHourly(spark, sfDir)
      .select(col("bucket"), col("event_type"), col("n_events"), col("sum_value"))
    assert(slide.exceptAll(tumble).isEmpty, "sliding hour-grid rows not in tumbling")
    assert(tumble.exceptAll(slide).isEmpty, "tumbling rows not in sliding hour grid")
  }

  test("every event lands in exactly size/slide = 4 sliding windows") {
    val windowed = Events.slidingQuarterHour(spark, sfDir)
      .agg(sum(col("n_events"))).head.getLong(0)
    assert(windowed == 4L * Tables.events(spark, sfDir).count())
  }

  test("int8 quantization: error within half a step, codes bounded") {
    val q = Similarity.quantizeInt8(spark, sfDir)
    // per-element |v - q*scale| <= scale/2, so mse <= scale^2/4
    assert(q.filter(col("mse") > col("scale") * col("scale") / 4.0 + 1e-18).count() == 0)
    // |q_i| <= 127 => L1 <= 127*64; the max element quantizes to exactly 127
    assert(q.filter(col("q_l1") > 127L * 64 || col("q_l1") < 127L).count() == 0)
  }

  test("label centroid cosines cover all label pairs and stay in [-1, 1]") {
    val c = Similarity.labelCentroids(spark, sfDir).collect()
    val nLabels = Tables.embeddings(spark, sfDir)
      .select(col("label")).distinct().count()
    assert(c.length == nLabels * (nLabels - 1) / 2)
    c.foreach(r => assert(math.abs(r.getAs[Double]("centroid_cos")) <= 1.0 + 1e-12))
  }

  test("bow fingerprint group sizes equal the naive sorted-token grouping") {
    val naive = Tables.documents(spark, sfDir)
      .withColumn("key", concat_ws(" ", array_sort(split(col("text"), "\\s+"))))
    val sizes = naive.groupBy("key").agg(count(lit(1)).as("n"))
    val expect = naive.join(sizes, "key").select(col("doc_id"), col("n"))
    val got = Dedup.bowFingerprint(spark, sfDir)
      .select(col("doc_id"), col("bow_group_size"))
    assert(got.join(expect, "doc_id")
      .filter(col("bow_group_size") =!= col("n")).count() == 0)
  }

  test("mode per status equals the max per-group count (differential)") {
    val naive = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .groupBy("o_orderstatus").agg(max(col("count")).as("mx"))
    val m = AdvancedAggs.modePriority(spark, sfDir)
    assert(m.join(naive, "o_orderstatus")
      .filter(col("mode_count") =!= col("mx")).count() == 0)
  }

  test("quality filter accounting covers every document") {
    val qf = TextAnalysis.qualityFilter(spark, sfDir)
    assert(qf.filter(col("n_pass") > col("n_docs")).count() == 0)
    assert(qf.agg(sum(col("n_docs"))).head.getLong(0) ==
      Tables.documents(spark, sfDir).count())
  }

  test("kfold partitions every document into folds 0..4 exactly once") {
    val kf = TrainingPipeline.kfold(spark, sfDir)
    assert(kf.agg(sum(col("n_docs"))).head.getLong(0) ==
      Tables.documents(spark, sfDir).count())
    assert(kf.filter(col("fold") < 0 || col("fold") > 4).count() == 0)
  }

  test("listagg csv carries exactly n_nations entries in sorted order") {
    AdvancedAggs.stringAggNations(spark, sfDir).collect().foreach { r =>
      val names = r.getAs[String]("nations_csv").split(",")
      assert(names.length == r.getAs[Long]("n_nations"))
      assert(names.sorted.sameElements(names))
    }
  }

  test("parse_url components reassemble the original url") {
    val bad = ScalarFunctions.urlFuncs(spark, sfDir)
      .filter(concat(col("scheme"), lit("://"), col("host"), col("path"),
        lit("?"), col("query")) =!= col("url"))
      .count()
    assert(bad == 0)
  }
}
