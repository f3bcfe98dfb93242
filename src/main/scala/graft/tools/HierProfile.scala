package graft.tools

import org.apache.spark.sql.SparkSession
import graft.hier.{Hierarchy, PlacePipeline}
import graft.synth.SynthWorld

/** Stage-by-stage timing of the hierarchy build, including the exact Bench
  * protocol (clearCache → re-cache input → build+stats) with a job-level
  * listener so the per-job cost distribution is visible. */
object HierProfile {

  /** Collects (jobId, description, wall seconds) for every completed job. */
  class JobTimer extends org.apache.spark.scheduler.SparkListener {
    case class J(id: Int, desc: String, start: Long)
    private val inflight = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val d = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
      inflight.put(js.jobId, J(js.jobId, d, js.time))
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val j = inflight.remove(je.jobId)
      if (j != null) done.add((j.id, j.desc, (je.time - j.start) / 1e3))
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double, Double, Double, Long)]()
    override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
      val m = i.taskMetrics
      stages.add((i.stageId, i.name.take(80), wall, m.executorRunTime / 1e3,
        m.jvmGCTime / 1e3, i.numTasks.toLong))
    }
    def reset(): Unit = { done.clear(); stages.clear() }
    def dump(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._1)
      println(f"[hier] --- jobs for $label: n=${js.size}, sum=${js.map(_._3).sum}%.2f s")
      js.foreach { case (id, d, s) => if (s > 0.2) println(f"[hier]   job $id%4d $s%6.2f s  $d") }
      val ss = stages.asScala.toSeq.sortBy(_._1)
      println(f"[hier] --- stages for $label: n=${ss.size}, wallSum=${ss.map(_._3).sum}%.2f s, " +
        f"taskTimeSum=${ss.map(_._4).sum}%.2f s, gcSum=${ss.map(_._5).sum}%.2f s")
      ss.foreach { case (id, n, w, tt, gc, nt) =>
        if (w > 0.2) println(f"[hier]   stage $id%4d wall=$w%6.2f tt=$tt%7.2f gc=$gc%5.2f tasks=$nt%3d  $n") }
    }
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    val cfg = SynthWorld.Config(seed = 42L, gridP = 8, gridC = 4,
      streetsPerCity = 10, buildingsPerStreet = 8)
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hier] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    var bounds: Seq[graft.hier.Boundary] = null
    var elems: org.apache.spark.sql.Dataset[graft.hier.BoundaryElem] = null
    time("generate extracts (driver)") {
      val be = SynthWorld.boundaryExtracts(spark, cfg); bounds = be._1; elems = be._2; bounds.size
    }
    val metas = Hierarchy.metadata(bounds)
    // Bench warmup equivalent: small world first
    locally {
      val wCfg = SynthWorld.Config(seed = 1L, gridP = 2, gridC = 2,
        streetsPerCity = 4, buildingsPerStreet = 3)
      val (wb, we) = SynthWorld.boundaryExtracts(spark, wCfg)
      PlacePipeline.stats(PlacePipeline.build(spark, we, Hierarchy.metadata(wb)))
      spark.catalog.clearCache()
    }
    val cached = elems.repartition(64).cache()
    time("materialize input")(cached.count())
    // the EXACT Bench protocol, 3 rounds: clearCache → re-cache input →
    // time(build+stats)
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      cached.cache().count()
      timer.reset()
      time(s"bench-protocol round $i") {
        PlacePipeline.stats(PlacePipeline.build(spark, cached, metas))
      }
      timer.dump(s"round $i")
    }
    // sequential-stats experiment: same build, counts consumed one by one
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      cached.cache().count()
      timer.reset()
      time(s"bench-protocol seq-stats $i") {
        val t = PlacePipeline.build(spark, cached, metas)
        val eAgg = t.junctionEdges
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.col("outer_name")),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("n_ports")),
              org.apache.spark.sql.functions.lit(0L))).collect()(0)
        (t.boundaries.count(), t.streets.count(), t.buildings.count(),
          eAgg.getLong(0), eAgg.getLong(1), eAgg.getLong(2))
      }
      timer.dump(s"seq-stats $i")
    }
    // AQE on/off experiment (same protocol)
    for ((aqe, label) <- Seq("false" -> "aqe-off", "true" -> "aqe-on")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.catalog.clearCache()
      cached.cache().count()
      timer.reset()
      time(s"bench-protocol $label") {
        PlacePipeline.stats(PlacePipeline.build(spark, cached, metas))
      }
      timer.dump(label)
    }
    // prefix-pipeline timings: each intermediate materialized alone
    locally {
      import org.apache.spark.sql.functions._
      spark.catalog.clearCache()
      cached.cache().count()
      def tag(k: String) = col("tags").getItem(k)
      import spark.implicits._
      val metaDf = broadcast(
        metas.map(m => (m.bkey, m.level, m.name, m.parentKey, m.postIdx, m.path, m.nameChain))
          .toDF("bkey", "level", "bname_", "parent_bkey", "post_idx", "path", "chain"))
      val classified = cached.toDF()
        .withColumn("cls",
          when(tag("building").isNotNull,
            when(tag("addr:street").isNotNull, lit("bldg_street"))
              .otherwise(lit("bldg_plain")))
            .when(tag("admin_level").isNotNull, lit("admin"))
            .when(col("kind") === "node", lit("outer"))
            .when(tag("highway").isNotNull, lit("highway"))
            .otherwise(lit("error")))
        .withColumn("elem_key", concat(col("kind"), lit(" "), col("id")))
      val withMeta = classified
        .withColumn("b_street",
          when(col("cls") === "bldg_street", tag("addr:street")).otherwise(lit(null)))
        .withColumn("b_name",
          when(col("cls") === "bldg_street",
            coalesce(tag("name"), concat(tag("addr:housenumber"), lit(" "), tag("addr:street"))))
            .when(col("cls") === "bldg_plain", tag("name")))
        .withColumn("s_name",
          when(col("cls") === "highway", coalesce(tag("name"), tag("ref"), col("elem_key"))))
        .drop("tags")
        .join(metaDf, "bkey")
        .cache()
      time("withMeta materialize")(withMeta.count())
      val outerNodes = withMeta.filter(col("cls") === "outer")
        .select(col("bkey"), col("id").as("nd")).distinct().cache()
      time("outerNodes materialize")(outerNodes.count())
      val streetCandidates = withMeta.filter(col("cls") === "highway")
        .withColumn("street", col("s_name"))
        .select("bkey", "kind", "elem_key", "street", "nds", "chain", "post_idx")
      val wayCandidates = streetCandidates.filter(col("kind") === "way")
      val outerSets = outerNodes.groupBy(col("bkey"))
        .agg(collect_set(col("nd")).as("outer_nds"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("elem_key")).orderBy(col("post_idx"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val waysIncluded = wayCandidates
        .join(broadcast(outerSets), Seq("bkey"), "left")
        .withColumn("crossing",
          coalesce(arrays_overlap(col("nds"), col("outer_nds")), lit(false)))
        .drop("outer_nds")
        .withColumn("included", coalesce(min(col("crossing")).over(wPrev), lit(true)))
        .filter(col("included"))
        .cache()
      time("waysIncluded materialize")(waysIncluded.count())
      val wayNodes = waysIncluded
        .select(col("bkey"), col("street"), explode(col("nds")).as("nd"))
      val qualified = wayNodes
        .groupBy(col("bkey"), col("nd"))
        .agg(collect_set(col("street")).as("ss"))
        .join(broadcast(outerNodes.withColumn("is_outer", lit(true))), Seq("bkey", "nd"), "left")
        .filter(size(col("ss")) > 1 || col("is_outer"))
      time("qualified (agg only)")(qualified.count())
    }
    // per-table timings (shared caches build up progressively)
    spark.catalog.clearCache()
    cached.cache().count()
    val t = PlacePipeline.build(spark, cached, metas)
    time("boundaries")(t.boundaries.count())
    time("buildings (claims window)")(t.buildings.count())
    time("streets (incl. crossing/inclusion windows)")(t.streets.count())
    time("junction atoms")(t.junctionAtoms.count())
    time("junction edges (closure)")(t.junctionEdges.count())
    time("full stats (cached)")(PlacePipeline.stats(t))
    spark.stop()
  }
}
