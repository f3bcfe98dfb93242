package graft

import org.apache.spark.sql.SparkSession

/** Extra isolated benchmarks (guide §1.4 posture) — NOT part of the driver
  * bench contract; cited in OPTIMIZATION_r06.md. Usage:
  * `runMain graft.BenchExtra <section…>` with sections from:
  * ivf, hier2shard, warc, curate. Defaults to all. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sections = if (args.nonEmpty) args.toSet else Set("ivf", "hier2shard", "warc", "curate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[extra] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    if (sections("hier2shard")) {
      import graft.hier.{Hierarchy, PlacePipeline}
      import graft.synth.SynthWorld
      val shCfg = SynthWorld.Config(seed = 42L, gridP = 4, gridC = 4,
        streetsPerCity = 10, buildingsPerStreet = 8)
      val (b1, e1) = SynthWorld.boundaryExtracts(spark, shCfg)
      val (b2, e2) = SynthWorld.shiftWorld(spark, b1, e1,
        off = 1000000000000L, suffix = " B")
      val metas2 = Hierarchy.metadata(b1 ++ b2)
      val cached2 = e1.union(e2)
        .repartition(spark.sparkContext.defaultParallelism * 2).cache()
      cached2.count()
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        cached2.cache().count()
        time(s"hierarchy_build_2shard run$i") {
          PlacePipeline.stats(PlacePipeline.build(spark, cached2, metas2)).nNodes
        }
      }
      cached2.unpersist()
      spark.catalog.clearCache()
    }

    if (sections("warc") || sections("curate")) {
      val timer = new graft.tools.HierProfile.JobTimer
      spark.sparkContext.addSparkListener(timer)
      val iCfg = Bench.benchCfg(200000L)
      val dir = graft.web.Flagship.materializePages(spark, iCfg)
      if (sections("curate")) {
        // run twice (fresh outDir each) — run 2 is the steady-state number
        for (i <- 1 to 2) {
          val outDir = java.nio.file.Files.createTempDirectory("graft-curate-extra").toString
          timer.reset()
          time(s"curate_e2e_200k run$i") {
            graft.web.Curation.curate(spark,
              spark.read.parquet(dir).select("url", "warc_ts", "text", "lang"),
              outDir, "extra-curate", minTokens = 10,
              minMeanLenX100 = 100, maxMeanLenX100 = 2000, minStopwordBp = 0).pending.size
          }
          Thread.sleep(300)
          if (i == 2) timer.dump("curate run2")
        }
      }
      if (sections("warc")) {
        val cfgKey = s"${iCfg.seed}-${iCfg.gridP}-${iCfg.gridC}-" +
          s"${iCfg.streetsPerCity}-${iCfg.buildingsPerStreet}-${iCfg.pages}"
        val warcDir = s"${sys.props("java.io.tmpdir")}/graft-warc-bench-$cfgKey"
        if (!new java.io.File(s"$warcDir/_DONE").exists()) {
          new java.io.File(warcDir).mkdirs()
          graft.synth.SynthWorld.pages(spark, iCfg).repartition(32)
            .foreachPartition { (it: Iterator[graft.synth.SynthWorld.Page]) =>
              val recs = it.map(p => (p.url, p.warc_ts, p.html)).toSeq
              if (recs.nonEmpty) {
                val pid = org.apache.spark.TaskContext.getPartitionId()
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(warcDir, f"crawl-$pid%02d.warc"),
                  graft.sources.WarcSource.writeWarc(recs))
              }
              ()
            }
          java.nio.file.Files.writeString(java.nio.file.Paths.get(warcDir, "_DONE"), "ok")
        }
        for (i <- 1 to 2) {
          val outDir = java.nio.file.Files.createTempDirectory("graft-ingest-extra").toString
          timer.reset()
          time(s"warc_ingest_e2e_200k run$i") {
            graft.web.Flagship.ingestWarc(spark, warcDir, iCfg, outDir, "extra-snap").pending.size
          }
          Thread.sleep(300)
          if (i == 2) timer.dump("warc run2")
        }
      }
    }

    if (sections("ivf")) {
      val rs = StressBench.runIvf(spark)
      println(s"[extra] ivf: ${rs.map { case (k, v) => s"$k=$v" }.mkString(", ")}")
    }

    if (sections("dedupstress")) {
      // the q25/q26 stress 10x legs in isolation, 3 rounds each — variance probe
      val tmp = sys.props("java.io.tmpdir")
      def docsDir(n: Long): String = {
        val d = s"$tmp/graft-stress-docs-$n"
        if (!new java.io.File(s"$d/documents.parquet/_SUCCESS").exists())
          StressBench.writeDocs(spark, n, d)
        d
      }
      docsDir(200000L)
      val timer = new graft.tools.HierProfile.JobTimer
      spark.sparkContext.addSparkListener(timer)
      for (i <- 1 to 3) {
        timer.reset()
        time(s"q25_jaccard_10x round$i") {
          graft.text.NearDup.jaccardPairs(spark, docsDir(200000L),
            thresholdPct = 80, maxDf = 1000, maxDocId = Long.MaxValue)
            .write.format("noop").mode("overwrite").save()
        }
        Thread.sleep(300)
        timer.dump(s"q25 round$i")
        spark.catalog.clearCache()
        time(s"q26_minhash_10x round$i") {
          graft.text.NearDup.minhashLsh(spark, docsDir(200000L),
            numHashes = 16, bands = 4, thresholdPct = 80, maxDocId = Long.MaxValue)
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
    }

    if (sections("ivfprof")) {
      val timer = new graft.tools.HierProfile.JobTimer
      spark.sparkContext.addSparkListener(timer)
      val dir = s"${sys.props("java.io.tmpdir")}/graft-stress-emb-50000"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists())
        StressBench.writeEmbeddings(spark, 50000L, dir)
      time("ivfTopK 50k noop") {
        graft.sim.Ann.ivfTopK(spark, dir, k = 3)
          .write.format("noop").mode("overwrite").save()
      }
      Thread.sleep(500)
      timer.dump("ivfTopK 50k")
    }
    spark.stop()
  }
}
