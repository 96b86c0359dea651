package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 fifth wave: modularity of the CC partition, HLL shard
  * mergeability, and soft-dedup cluster weights. Driver recomputes are
  * independent (pure-Scala union-find / hash folds), never the Spark
  * plan under test. */
class Round7eSpec extends SparkSpec {

  import spark.implicits._

  private def h60(s: String): Long =
    graft.functions.HashUtil.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /** Tiny union-find for driver-side component recomputes. */
  private class UF {
    val p = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = p.getOrElseUpdate(x, x)
      if (px == x) x else { val r = find(px); p(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) p(rb) = ra else p(ra) = rb }
    }
  }

  // ---- modularity ----

  test("modularity matches a driver union-find recompute of the CC " +
    "partition score") {
    val edges = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        date_trunc("hour", col("ts")).as("hr"))
      .distinct()
      .as[(Long, Int, java.sql.Timestamp)].collect()
    val buckets = edges.groupBy(r => (r._2, r._3)).values
      .filter(_.length <= Graph.HubCap)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    buckets.foreach { b =>
      val us = b.map(_._1).sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        pairCount((us(i), us(j))) = pairCount.getOrElse((us(i), us(j)), 0L) + 1
    }
    val e = pairCount.filter(_._2 >= 2L).keys.toSeq
    val uf = new UF
    e.foreach { case (a, b) => uf.union(a, b) }
    val m = BigInt(e.length)
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    e.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val byC = deg.keys.toSeq.groupBy(uf.find)
    val q = byC.map { case (c, vs) =>
      val dC = BigInt(vs.map(deg).sum)
      val eC = BigInt(e.count { case (a, b) => uf.find(a) == c && uf.find(b) == c })
      val num = 4 * m * eC - dC * dC
      val den = 4 * m * m
      if (num >= 0) (num * 1000000 / den).toLong
      else -((-num) * 1000000 / den).toLong
    }.sum
    val got = Graph.modularity(spark, sfDir)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((e.length.toLong, byC.size.toLong, q)))
  }

  // ---- HLL merge ----

  test("hll shard merge equals the direct sketch on every register") {
    val users = graft.core.Tables.events(spark, sfDir)
      .select("event_type", "user_id").as[(String, Long)].collect()
    def reg(u: Long): (Long, Int) = {
      val h = h60(s"hll:$u")
      val rem = h % 18014398509481984L
      (h / 18014398509481984L,
        if (rem == 0) 55 else 55 - java.lang.Long.toBinaryString(rem).length)
    }
    val direct = users.map(u => reg(u._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val shards = users.groupBy(_._1).values.map(_.map(u => reg(u._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap).toSeq
    val merged = shards.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    val nShards = (0L until 64L).map(r =>
      r -> shards.count(_.contains(r)).toLong).toMap
    val expected = (0L until 64L).map { r =>
      (r, nShards(r), merged.getOrElse(r, 0), direct.getOrElse(r, 0),
        if (merged.getOrElse(r, 0) == direct.getOrElse(r, 0)) 1 else 0)
    }
    val got = AdvancedAggs.hllMerge(spark, sfDir)
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    assert(got == expected)
    // mergeability is the theorem under test: every register must agree
    assert(got.forall(_._5 == 1))
  }

  // ---- cluster weights ----

  test("cluster weights match a driver union-find over jaccard-0.8 " +
    "shingle pairs and sum to one per cluster in micro units") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) =>
      val toks = t.split("\\s+")
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .map(h60).toSet
    }.toMap
    val ids = docs.map(_._1).sorted
    val uf = new UF
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (sh(ids(i)), sh(ids(j)))
      val inter = (a & b).size
      if (inter > 0 &&
        inter.toDouble / (a.size + b.size - inter) >= 0.8) uf.union(ids(i), ids(j))
    }
    val clustered = ids.filter(id => uf.p.contains(id)) // touched by union-find
    val sizes = ids.groupBy(uf.find).view.mapValues(_.length.toLong).toMap
    val expected = ids.toSeq.map { id =>
      val root = uf.find(id)
      val inGraph = sizes(root) > 1
      val (cid, cs) = if (inGraph) (root, sizes(root)) else (id, 1L)
      (id, cid, cs, 1000000L / cs)
    }
    val got = TrainingPipeline.clusterWeights(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(clustered.nonEmpty || got.forall(_._3 == 1L))
  }
}
