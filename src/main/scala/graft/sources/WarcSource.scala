package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** WARC source (ISO 28500, the Common-Crawl container format — written
  * from the public spec): parses `response` records into the pages shape
  * `(url, warc_ts, html BINARY)`.
  *
  * Scale posture: files load via Spark's `binaryFile` source and records
  * parse per-file inside a narrow mapPartitions. Common Crawl gzips each
  * record as its own gzip member, so at 100 TB the per-FILE unit is already
  * ~1 GB and the fleet parallelizes across the ~64k files of a crawl; a
  * member-splitting input format is the further refinement if single files
  * ever dominate.
  */
object WarcSource {

  private val CRLF = "\r\n"

  /** Parse one WARC file's bytes into (url, dateIso, payload) records.
    * Header names are case-insensitive per spec; payload length comes from
    * Content-Length (payload may itself contain CRLFCRLF). */
  def parseRecords(bytes: Array[Byte]): Iterator[(String, String, Array[Byte])] = {
    var pos = 0
    val n = bytes.length
    // named findBytes, NOT indexOf: inside `new Iterator {}` a helper named
    // indexOf is shadowed by Iterator's own indexOf member, which silently
    // consumes the iterator and returns -1
    def findBytes(pattern: Array[Byte], from: Int): Int = {
      var i = from
      val m = pattern.length
      var found = -1
      while (found < 0 && i <= n - m) {
        var j = 0
        while (j < m && bytes(i + j) == pattern(j)) j += 1
        if (j == m) found = i else i += 1
      }
      found
    }
    val headerEnd = (CRLF + CRLF).getBytes(StandardCharsets.US_ASCII)
    val magic = "WARC/".getBytes(StandardCharsets.US_ASCII)
    new Iterator[(String, String, Array[Byte])] {
      private var nextRec: (String, String, Array[Byte]) = null
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos < n) {
          val start = findBytes(magic, pos)
          val he = if (start < 0) -1 else findBytes(headerEnd, start)
          if (start < 0 || he < 0) { pos = n } // truncated/garbled tail: stop
          else {
            val header = new String(bytes, start, he - start, StandardCharsets.UTF_8)
            val fields = header.split(CRLF).drop(1).flatMap { line =>
              val i = line.indexOf(':')
              if (i > 0) Some(line.substring(0, i).trim.toLowerCase ->
                line.substring(i + 1).trim)
              else None
            }.toMap
            // Content-Length is mandatory: a record without a parseable one
            // cannot be skipped safely (scanning its payload for "WARC/"
            // would fabricate records out of crawled pages ABOUT warc), so
            // stop at the malformed record. Long-typed: ISO 28500 allows
            // payloads past Int.MaxValue.
            fields.get("content-length").flatMap(_.toLongOption).filter(_ >= 0) match {
              case None => pos = n
              case Some(len) =>
                val payloadStart = he + 4
                val payloadEnd = math.min(n.toLong, payloadStart.toLong + len).toInt
                pos = payloadEnd
                if (fields.get("warc-type").contains("response")) {
                  val url = fields.getOrElse("warc-target-uri", "")
                  val date = fields.getOrElse("warc-date", "")
                  nextRec = (url, date, java.util.Arrays.copyOfRange(bytes, payloadStart, payloadEnd))
                }
            }
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, String, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Inflate a .warc.gz payload. Common Crawl gzips each record as its own
    * member; GZIPInputStream reads concatenated members transparently, so
    * one pass inflates the whole file. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    // initial capacity HINT sized in Long arithmetic (`bytes.length * 4` in
    // Int overflows negative past 512 MB) and capped at 64 MB — an eager
    // near-2GB allocation per large file would be an OOM spike even when
    // the member inflates small; the stream grows as needed. The inflated
    // output is still bounded by the JVM's 2 GB Array[Byte] ceiling
    // (ByteArrayOutputStream throws past it); files inflating larger need
    // the member-splitting input format noted in the header.
    val out = new java.io.ByteArrayOutputStream(
      math.min(64L * 1024 * 1024, bytes.length.toLong * 4).toInt)
    val buf = new Array[Byte](64 * 1024)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    out.toByteArray
  }

  /** Read a directory of .warc / .warc.gz files into the pages shape
    * (url, warc_ts TIMESTAMP, html BINARY). */
  def readPages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, content) =>
        parseRecords(if (path.endsWith(".gz")) gunzip(content) else content)
      })
      .toDF("url", "warc_date", "html")
      .select(col("url"),
        to_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_ts"),
        col("html"))
  }

  /** Serialize pages (url, warc_ts, html) into WARC bytes — the writer used
    * by tests and by round-trip checks; format per ISO 28500. */
  def writeWarc(records: Seq[(String, java.sql.Timestamp, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
    for ((url, ts, payload) <- records) {
      val header =
        s"WARC/1.0${CRLF}WARC-Type: response${CRLF}WARC-Target-URI: $url$CRLF" +
          s"WARC-Date: ${fmt.format(ts.toInstant)}$CRLF" +
          s"Content-Length: ${payload.length}$CRLF$CRLF"
      out.write(header.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write(s"$CRLF$CRLF".getBytes(StandardCharsets.US_ASCII))
    }
    out.toByteArray
  }
}
