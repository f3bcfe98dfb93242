package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.WarcSource
import graft.synth.SynthWorld

/** WARC source: round-trip, CRLF-in-payload safety, and the end-to-end
  * flow WARC → pages shape → flagship geocode. */
class WarcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("WARC round-trip preserves url, timestamp and exact payload bytes") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val recs = Seq(
      ("https://a.example/1", ts, "<html>\r\n\r\nbody with CRLFCRLF inside</html>".getBytes("UTF-8")),
      ("https://a.example/2", new java.sql.Timestamp(ts.getTime + 1000),
        Array.tabulate(300)(i => (SynthWorld.mix(i.toLong) & 0xff).toByte)))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    java.nio.file.Files.write(dir.resolve("part-0.warc"), WarcSource.writeWarc(recs))

    val got = WarcSource.readPages(spark, dir.toString)
      .orderBy("url").collect()
    assert(got.length == 2)
    for (((url, t, payload), r) <- recs.zip(got)) {
      assert(r.getString(0) == url)
      assert(r.getTimestamp(1).getTime == t.getTime)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), payload))
    }
  }

  test("gzipped WARC with per-record members (the Common-Crawl layout) reads identically") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val recs = Seq(
      ("https://gz.example/1", ts, "first".getBytes("UTF-8")),
      ("https://gz.example/2", ts, "second".getBytes("UTF-8")))
    // gzip EACH record as its own member, then concatenate — CC's layout
    val out = new java.io.ByteArrayOutputStream()
    for (r <- recs) {
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(graft.sources.WarcSource.writeWarc(Seq(r)))
      g.finish()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgz")
    java.nio.file.Files.write(dir.resolve("crawl.warc.gz"), out.toByteArray)
    val got = WarcSource.readPages(spark, dir.toString).orderBy("url").collect()
    assert(got.map(_.getString(0)).toSeq == recs.map(_._1))
    assert(new String(got(0).getAs[Array[Byte]](2), "UTF-8") == "first")
    assert(new String(got(1).getAs[Array[Byte]](2), "UTF-8") == "second")
  }

  test("non-response records are skipped; truncated tail does not throw") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val good = WarcSource.writeWarc(Seq(("https://a.example/ok", ts, "hi".getBytes)))
    val warcinfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n")
      .getBytes("UTF-8")
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target".getBytes("UTF-8")
    val all = warcinfo ++ good ++ truncated
    val recs = WarcSource.parseRecords(all).toSeq
    assert(recs.map(_._1) == Seq("https://a.example/ok"))
  }

  test("malformed or oversized Content-Length stops the parse instead of fabricating records") {
    // payload that CONTAINS a fake WARC record — must never be parsed as one
    val fake = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://evil/x\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n"
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/1\r\n\r\n" +
      fake).getBytes("UTF-8")
    assert(WarcSource.parseRecords(noLen).isEmpty, "missing Content-Length must stop")
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/2\r\n" +
      "Content-Length: 3000000000\r\n\r\nclipped").getBytes("UTF-8")
    val recs = WarcSource.parseRecords(huge).toSeq
    // >Int.MaxValue length parses as Long and clamps to the file tail
    assert(recs.map(_._1) == Seq("https://a/2"))
    assert(new String(recs.head._3, "UTF-8") == "clipped")
  }

  test("WARC pages flow end-to-end through the flagship geocode") {
    val cfg = SynthWorld.Config(seed = 42L, gridP = 2, gridC = 2,
      streetsPerCity = 3, buildingsPerStreet = 4, pages = 200L)
    // synthesize pages, container them as WARC, read back, geocode
    val pages = SynthWorld.pages(spark, cfg).collect()
      .map(p => (p.url, p.warc_ts, p.html))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-e2e")
    java.nio.file.Files.write(dir.resolve("crawl-0.warc"), WarcSource.writeWarc(pages.take(100)))
    java.nio.file.Files.write(dir.resolve("crawl-1.warc"), WarcSource.writeWarc(pages.drop(100)))

    val fromWarc = WarcSource.readPages(spark, dir.toString)
      .withColumn("text", expr("decode(html, 'UTF-8')")) // synth html wraps text
      .withColumn("lang", lit("en"))
    val geo = graft.web.Flagship.geocodePages(spark, fromWarc, cfg)
    assert(geo.count() == 200)
    assert(geo.filter(col("admin_chain").isNull).count() == 0)
  }

  test("WARC ingest (fetch->build->write) resumes a killed run without recomputing finished buckets") {
    import graft.web.{Flagship, Lineage}
    val cfg = SynthWorld.Config(seed = 42L, gridP = 2, gridC = 2,
      streetsPerCity = 3, buildingsPerStreet = 4, pages = 400L)
    val pages = SynthWorld.pages(spark, cfg).collect().map(p => (p.url, p.warc_ts, p.html))
    val warcDir = java.nio.file.Files.createTempDirectory("graft-warc-ingest")
    pages.grouped(100).zipWithIndex.foreach { case (g, i) =>
      java.nio.file.Files.write(warcDir.resolve(s"crawl-$i.warc"), WarcSource.writeWarc(g.toSeq))
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft-ingest-out").toString

    val r1 = Flagship.ingestWarc(spark, warcDir.toString, cfg, outDir, "snap-1")
    assert(r1.skipped.isEmpty && r1.pending.nonEmpty && r1.pending.length > 1)
    val total = spark.read.parquet(s"$outDir/data").count()
    assert(total == 400L)

    // simulate a mid-ingest kill: some buckets never completed — their
    // manifests and data are absent
    val victims = r1.pending.take(r1.pending.length / 2)
    for (b <- victims) {
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(outDir, "_manifests", s"bucket-$b.json"))
      val dataDir = java.nio.file.Paths.get(outDir, "data", s"bucket=$b")
      java.nio.file.Files.walk(dataDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }

    // the rerun recomputes ONLY the killed buckets
    val r2 = Flagship.ingestWarc(spark, warcDir.toString, cfg, outDir, "snap-2")
    assert(r2.pending.sorted.toSeq == victims.sorted.toSeq,
      s"rerun must recompute exactly the killed buckets, got ${r2.pending}")
    assert(r2.skipped.sorted.toSeq == r1.pending.filterNot(victims.contains).sorted.toSeq)

    // store is complete and lineage-consistent again
    val out = spark.read.parquet(s"$outDir/data")
    assert(out.count() == 400L)
    assert(out.select("url").distinct().count() == 400L)
    assert(Lineage.audit(spark, outDir).isEmpty)
  }
}
