package graft.web

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.CellIndex
import graft.spatial.{BoundaryCellIndex, PointCellIndex, SpatialBoundary}

/** The north-star pipeline (BASELINE.json:6): geoparse Common-Crawl-style
  * pages, spatially join each page's point into the admin-boundary
  * hierarchy (cell-cover prejoin + exact PIP refine), assign its tile at
  * `tileLevel`, and kNN-snap to the nearest building.
  *
  * Plan shape at 100 TB: the pages scan is the only wide input; the
  * boundary index and building index are broadcast dimensions, so the whole
  * geocode is a single narrow mapPartitions over the scan — no shuffle, no
  * skew surface. Filters (`geo:` presence) and the 3-column projection push
  * into the parquet scan.
  */
object Geocode {

  val GeoPattern = "geo:(-?[0-9]+\\.[0-9]+),(-?[0-9]+\\.[0-9]+)"

  /** Deterministic text extraction from html — must be byte-identical to
    * the original `text` (the BASELINE.json:15 invariant, asserted by
    * [[checkExtractionInvariant]]). */
  val extractText: Array[Byte] => String = (html: Array[Byte]) => {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val body = s.indexOf("<body>")
    val end = s.indexOf("</body>")
    if (body >= 0 && end > body) s.substring(body + 6, end)
    else s.replaceAll("<[^>]*>", "")
  }

  /** Geoparse: pull the first embedded geo:lat,lon marker out of `text`.
    * ONE regexp evaluation per row (the full match), then cheap string
    * splits — the naive per-group extraction would re-run the regex for
    * every group reference in the plan. Pages without a marker keep null
    * coordinates — a gazetteer join is the fallback
    * (see [[geoparseWithGazetteer]]). */
  def geoparse(pages: DataFrame): DataFrame =
    pages
      .withColumn("geo_m", regexp_extract(col("text"), GeoPattern, 0))
      .withColumn("lat", when(col("geo_m") =!= "",
        substring_index(substring_index(col("geo_m"), ":", -1), ",", 1).cast("double")))
      .withColumn("lon", when(col("geo_m") =!= "",
        substring_index(col("geo_m"), ",", -1).cast("double")))
      .drop("geo_m")

  /** Geoparse for the flagship hot path: pages WITHOUT a marker are dropped
    * up front by a single cheap RLIKE predicate — the one regex in the plan's
    * Filter, pushed against the scan — and the surviving rows extract
    * coordinates without a `when` guard. The round-1/round-2 shape filtered
    * on lat.isNotNull AFTER extraction, which Catalyst pushed down as FOUR
    * regexp_extract copies in the Filter condition; here the single
    * evaluation is structural, not a codegen-subexpression accident.
    * Output rows and values are identical to
    * geoparse(pages).filter(lat.isNotNull && lon.isNotNull): the pattern
    * guarantees both captures cast to non-null doubles. */
  def geoparsePresent(pages: DataFrame): DataFrame =
    pages
      .filter(col("text").rlike(GeoPattern))
      .withColumn("geo_m", regexp_extract(col("text"), GeoPattern, 0))
      .withColumn("lat",
        substring_index(substring_index(col("geo_m"), ":", -1), ",", 1).cast("double"))
      .withColumn("lon", substring_index(col("geo_m"), ",", -1).cast("double"))
      .drop("geo_m")

  /** Inverted-index gazetteer match — deployment's de-facto hot path (in
    * real Common Crawl most pages carry NO `geo:` marker, so the
    * reference-scale analogue of name-based area lookup,
    * query-raw.overpassql:6, runs on nearly every page).
    *
    * Semantics: a gazetteer `place_name` matches a page iff its
    * space-joined token sequence occurs in the page's whitespace-token
    * stream, where tokens are maximal `\\s+`-separated runs — tabs,
    * newlines, and space runs all delimit (token-boundary match — "Dover"
    * does NOT match "Dovercourt"; equivalently, after collapsing
    * whitespace to single spaces, `' '+text+' '` contains
    * `' '+place_name+' '`). Gazetteer names themselves are
    * SINGLE-SPACE-separated by contract (the dimension is curated; its
    * tokenization is a plain split on ' ').
    *
    * Shape at 100 TB: the page side tokenizes ONCE
    * (explode(array_distinct(split))) and equi-joins a BROADCAST
    * first-token index of the gazetteer — a codegen'd hash join whose
    * candidate count is Σ df(firstToken(name)) over names, the same
    * sub-quadratic law as [[graft.text.NearDup]]; multi-word names verify
    * on candidates only. The round-3 shape — a broadcast nested-loop
    * `text.contains(place_name)` join — evaluated O(pages × names)
    * substring scans and is gone.
    *
    * Returns one row per page + the canonically-first matching entry's
    * (place_name, g_lat, g_lon) — min by place name, the deterministic
    * tie-break — with nulls when `keepUnmatched` and no name matches;
    * unmatched pages drop when !keepUnmatched.
    *
    * `keyCols`: when the caller names the page identity (e.g. `url` or
    * `doc_id`), nothing text-sized ever rides a shuffle: single-token
    * names match on an exploded (keys, token) stream with the text column
    * PRUNED; multi-token candidates (the rare class) semi-filter the pages
    * scan by a broadcast of their keys and verify the full sequence on
    * that tiny subset. The output is keys + (place_name, g_lat, g_lon) —
    * the 100 TB shape; re-attach columns by key downstream if needed.
    * Empty `keyCols` (the default) uses every page column as the identity
    * and returns them all — correct for key-less frames, text-wide through
    * the shuffles. Output has SET semantics per page identity: one row per
    * distinct key, matched or (under `keepUnmatched`) null-extended.
    * Duplicate keys are safe: (keys, text) rows dedup before
    * tokenization and the n-gram window partitions per distinct text (a
    * 64-bit text discriminator joins the partition key), so streams never
    * interleave; a key carrying several distinct texts matches the UNION
    * of its texts' names, min-name tie-break across the union.
    *
    * `broadcastDim`: true (default) broadcasts the gazetteer — the fast
    * plan up to [[maxNames]]. false is the FACT×FACT path for planetary
    * gazetteers (10⁸⁺ names): the single-token equi-join and the m-gram
    * verify join run as shuffle joins on (token / n-gram string) instead —
    * same joins, same keys, no broadcast and no name-count bound. Hot
    * first tokens (a name starting with a stopword meeting a stopword-heavy
    * corpus) are a skew surface on that key; AQE skew-join splitting
    * handles it, and [[graft.ops.Skew.saltedJoin]] composes if an exchange
    * is reused. The multi-token LENGTH set still collects driver-side —
    * it is ≤ the distinct name lengths (tens), never the names. */
  def gazetteerMatch(pages: DataFrame, gazetteer: DataFrame,
                     keepUnmatched: Boolean = true,
                     keyCols: Seq[String] = Nil,
                     maxNames: Long = 10000000L,
                     broadcastDim: Boolean = true): DataFrame = {
    val reserved = Set("place_name", "g_lat", "g_lon", "tok0", "multi", "g0", "g",
      "pos", "tok", "t_disc", "ngram")
    require(pages.columns.forall(c =>
        !reserved.contains(c) && !c.matches("lead_\\d+")),
      s"page columns collide with reserved names: ${reserved.mkString(",")}, lead_N")
    require(keyCols.forall(pages.columns.contains),
      s"keyCols ${keyCols.mkString(",")} must be page columns")
    val keys = if (keyCols.nonEmpty) keyCols else pages.columns.toSeq
    // BROADCAST CONTRACT (one agg job computes the guard count AND the
    // multi-token length set): the gazetteer is a broadcast dimension —
    // ~10⁷ names (≈ hundreds of MB broadcast) is the practical ceiling.
    // Past maxNames this FAILS LOUDLY (the exactTopK posture) instead of
    // silently OOMing executors; a 10⁸-row planetary gazetteer needs a
    // shuffle-based first-token join (the DistributedPip pattern), not a
    // raised bound.
    val gzMeta = gazetteer.agg(count(lit(1)).as("n"),
      collect_set(when(size(split(col("place_name"), " ")) > 1,
        size(split(col("place_name"), " ")))).as("lens")).head()
    require(!broadcastDim || gzMeta.getLong(0) <= maxNames,
      s"gazetteerMatch broadcasts the gazetteer: ${gzMeta.getLong(0)} names > " +
        s"maxNames=$maxNames. Raise maxNames deliberately only if the broadcast " +
        "fits executor memory, or pass broadcastDim=false for the shuffled " +
        "first-token join (the planetary-gazetteer path).")
    // dim-side join wrapper: the join-strategy hint is the ONLY plan
    // difference between the two paths. shuffle_hash (not just dropping the
    // broadcast hint): a small test gazetteer would still auto-broadcast
    // from stats, silently testing the wrong plan — the hint pins the
    // fact×fact shape at every size, and it is what accurate stats would
    // pick past broadcast size anyway
    def dim(df: DataFrame): DataFrame =
      if (broadcastDim) broadcast(df) else df.hint("shuffle_hash")
    val gz = gazetteer
      .select(col("place_name"), col("g_lat"), col("g_lon"),
        split(col("place_name"), " ").getItem(0).as("tok0"),
        (size(split(col("place_name"), " ")) > 1).as("multi"))
    val g0 = struct(col("place_name"), col("g_lat"), col("g_lon")).as("g0")
    // exact-duplicate rows collapse BEFORE tokenization: tied window
    // positions from identical copies would manufacture n-grams the text
    // does not contain ("a b" twice → stream [a,a,b,b] → bigram "a a")
    val distinctPages = pages
      .select((keys :+ "text").distinct.map(col): _*).distinct()
    // tokens stream: keys + one token per row — text PRUNED before the
    // explode, so a 10k-token page costs 10k narrow rows, not 10k copies
    // of its text (keyCols empty degrades gracefully: keys ⊇ text)
    val toks = distinctPages
      .select(keys.map(col) :+
        explode(array_distinct(split(col("text"), "\\s+"))).as("tok0"): _*)
      .filter(col("tok0") =!= "") // leading whitespace splits to one "" token
    // single-token names are fully proven by the token equi-join
    val singleHits = toks.join(dim(gz.filter(!col("multi"))), "tok0")
      .select(keys.map(col) :+ g0: _*)
    // multi-token names verify ON THE TOKEN STREAM: position-ordered
    // tokens + window leads build every m-gram present in the gazetteer
    // (m collected driver-side from the dimension table), then ONE
    // broadcast equi-join m-gram = place_name. String equality implies
    // equal token counts, so no length key is needed; `concat` (not
    // concat_ws) keeps tail positions null so short suffixes never alias
    // shorter names. No text column is ever joined back or shuffled.
    val multiLens = gzMeta.getSeq[Int](1).sorted
    val multiHits =
      if (multiLens.isEmpty)
        singleHits.limit(0)
      else {
        // partition per distinct TEXT, not per key: a key carrying two
        // different texts (re-crawled url) must not interleave their token
        // streams — t_disc discriminates them (64-bit hash; a collision
        // merges two streams, ~2⁻⁶⁴ per duplicate-key pair)
        val wPos = org.apache.spark.sql.expressions.Window
          .partitionBy((keys.map(col) :+ col("t_disc")): _*).orderBy(col("pos"))
        // empty tokens (leading whitespace) are filtered BEFORE the lead
        // windows so n-grams span real tokens only; pos gaps don't matter —
        // the window orders by pos, it doesn't difference it
        val toksPos = distinctPages
          .select(keys.map(col) ++ Seq(xxhash64(col("text")).as("t_disc"),
            posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok"))): _*)
          .filter(col("tok") =!= "")
        val maxM = multiLens.max
        val withLeads = (1 until maxM).foldLeft(toksPos)((df, i) =>
          df.withColumn(s"lead_$i", lead(col("tok"), i).over(wPos)))
        def ngram(m: Int) =
          concat((1 until m).foldLeft(Seq(col("tok")))((acc, i) =>
            acc ++ Seq(lit(" "), col(s"lead_$i"))): _*)
        val ngrams = withLeads.select(keys.map(col) :+
          explode(array(multiLens.map(m => ngram(m)): _*)).as("ngram"): _*)
        ngrams.join(dim(gz.filter(col("multi"))),
            col("ngram") === col("place_name"))
          .select(keys.map(col) :+ g0: _*)
      }
    val matched = singleHits.unionByName(multiHits)
      .groupBy(keys.map(col): _*)
      .agg(min(col("g0")).as("g"))
      .select(keys.map(col) ++ Seq(col("g.place_name").as("place_name"),
        col("g.g_lat").as("g_lat"), col("g.g_lon").as("g_lon")): _*)
    if (!keepUnmatched) matched
    else {
      // single evaluation of `matched` (a left join, not union + anti) and
      // null-safe key equality so null-bearing key-less frames neither
      // drop nor duplicate rows
      val pageSide = pages.select(keys.map(col): _*).distinct()
      val cond = keys.map(k => pageSide(k) <=> matched(k)).reduce(_ && _)
      pageSide.join(matched, cond, "left")
        .select(keys.map(pageSide(_)) ++
          Seq(matched("place_name"), matched("g_lat"), matched("g_lon")): _*)
    }
  }

  /** Gazetteer fallback: pages with no coordinate marker are matched by
    * place-name mention (token-boundary semantics, [[gazetteerMatch]])
    * against a broadcast gazetteer (name → centroid). `keyCols` names the
    * crawl-record identity — default (url, warc_ts), so a re-crawled url
    * with different text matches against ITS OWN text, not its sibling's.
    * The match runs entirely on text-pruned token streams; full rows
    * re-attach by ONE null-safe key join where text rides as a value —
    * never as a shuffle key (the all-columns grouping would hash megabyte
    * text strings as part of the key). Unmatched pages null-extend via
    * the left join itself (keepUnmatched=false: no redundant distinct +
    * second join inside the match). Row multiplicity is preserved:
    * duplicate pages by key each keep their row, as in the marker
    * branch. */
  def geoparseWithGazetteer(pages: DataFrame, gazetteer: DataFrame,
                            keyCols: Seq[String] = Seq("url", "warc_ts")): DataFrame = {
    val parsed = geoparse(pages)
    val withCoords = parsed.filter(col("lat").isNotNull)
    val without = parsed.filter(col("lat").isNull).drop("lat", "lon")
    // match-side keys renamed before the re-attach join: `matched` derives
    // from `without`, and same-name refs across that lineage trip Spark's
    // ambiguous-self-join detection
    val matched = keyCols.foldLeft(
        gazetteerMatch(without, gazetteer, keepUnmatched = false, keyCols = keyCols)
          .select(keyCols.map(col) ++ Seq(col("g_lat"), col("g_lon")): _*))(
        (df, k) => df.withColumnRenamed(k, s"__m_$k"))
    val cond = keyCols.map(k => col(k) <=> col(s"__m_$k")).reduce(_ && _)
    withCoords.unionByName(
      without.join(matched, cond, "left")
        .select(without.columns.map(col) ++
          Seq(col("g_lat").as("lat"), col("g_lon").as("lon")): _*))
  }

  /** One geocode result bundle — single struct so the whole spatial join
    * costs one UDF serde per row. */
  case class GeoResult(cell_id: Long,
                       boundary_id: java.lang.Long, admin_level: java.lang.Integer,
                       admin_chain: String,
                       nearest_building_id: java.lang.Long,
                       nearest_building_dist_m: java.lang.Double)

  /** Per-task geocode kernel: broadcast values resolved once per
    * deserialized task closure (transient lazy), not per row. */
  private class GeoHelper(
      bIdxB: org.apache.spark.broadcast.Broadcast[BoundaryCellIndex],
      pIdxB: org.apache.spark.broadcast.Broadcast[PointCellIndex],
      tileLevel: Int) extends Serializable {
    @transient private lazy val b = bIdxB.value
    @transient private lazy val p = pIdxB.value
    def apply(lat: Double, lon: Double): GeoResult = {
      val place = b.resolve(lat, lon)
      val near = p.nearest(lat, lon)
      GeoResult(
        CellIndex.cellOf(lat, lon, tileLevel),
        place.map(x => java.lang.Long.valueOf(x.id)).orNull,
        place.map(x => java.lang.Integer.valueOf(x.level)).orNull,
        place.map(_.chain).orNull,
        near.map(n => java.lang.Long.valueOf(n._1)).orNull,
        near.map(n => java.lang.Double.valueOf(n._2)).orNull)
    }
  }

  /** Core spatial join: point → deepest admin boundary + tile + kNN snap.
    * One narrow pass, one combined UDF; both indexes broadcast — the pages
    * scan is the only wide input, zero shuffle (SURVEY.md §2.3 J7/J9). */
  // broadcast indexes are built once per (session, dimension-set) and
  // reused across jobs — deployment shape: the boundary index outlives
  // every micro-batch of pages. BOUNDED: one live entry per
  // (coverLevel, tileLevel, snapLevel); a new dimension set (evolving
  // boundaries under a long-lived streaming session) displaces the old
  // entry and destroys its broadcasts instead of accumulating forever.
  private case class CachedIdx(contentKey: String,
      b: org.apache.spark.broadcast.Broadcast[BoundaryCellIndex],
      p: org.apache.spark.broadcast.Broadcast[PointCellIndex])
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), CachedIdx]()

  /** `assumeCoords = true` skips the defensive null filter — callers that
    * already guarantee non-null coordinates ([[geoparsePresent]]) use it so
    * the filter's pushed-down copy of the coordinate extraction (4 regexps
    * in the round-2 plan) never reaches the Filter condition. */
  def assign(spark: SparkSession, parsed: DataFrame,
             boundaries: Seq[SpatialBoundary], buildings: Seq[(Long, Double, Double)],
             coverLevel: Int, tileLevel: Int, snapLevel: Int,
             assumeCoords: Boolean = false): DataFrame = {
    // content-derived key: equal-sized but different dimension sets
    // must NOT collide (ids + geometry bytes + points all hashed)
    val bHash = boundaries.foldLeft(17L)((h, b) =>
      h * 31 + b.id * 7 + b.level + java.util.Arrays.hashCode(b.wkb))
    val pHash = buildings.foldLeft(19L)((h, p) =>
      h * 31 + p._1 * 7 + java.lang.Double.hashCode(p._2) + java.lang.Double.hashCode(p._3))
    val contentKey = spark.sparkContext.applicationId + "/" + bHash + "/" + pHash
    val cached = indexCache.compute((coverLevel, tileLevel, snapLevel), (_, old) =>
      if (old != null && old.contentKey == contentKey) old
      else {
        // unpersist, NOT destroy: a lazy DataFrame or in-flight micro-batch
        // from a prior assign() may still hold the old broadcasts — destroy
        // would fail those tasks; unpersist frees executor copies and lets
        // stragglers re-fetch from the driver
        if (old != null) { old.b.unpersist(false); old.p.unpersist(false) }
        CachedIdx(contentKey,
          spark.sparkContext.broadcast(BoundaryCellIndex.build(boundaries, coverLevel)),
          spark.sparkContext.broadcast(PointCellIndex.build(buildings, snapLevel)))
      })
    val (bIdx, pIdx) = (cached.b, cached.p)

    val helper = new GeoHelper(bIdx, pIdx, tileLevel)
    val geo = udf { (lat: Double, lon: Double) => helper(lat, lon) }

    (if (assumeCoords) parsed
     else parsed.filter(col("lat").isNotNull && col("lon").isNotNull))
      .select(col("url"), col("warc_ts"), col("lang"), col("lat"), col("lon"),
        geo(col("lat"), col("lon")).as("g"))
      .select(col("url"), col("warc_ts"), col("lang"), col("lat"), col("lon"),
        col("g.cell_id").as("cell_id"),
        col("g.boundary_id").as("boundary_id"),
        col("g.admin_level").as("admin_level"),
        col("g.admin_chain").as("admin_chain"),
        col("g.nearest_building_id").as("nearest_building_id"),
        col("g.nearest_building_dist_m").as("nearest_building_dist_m"))
  }

  /** BASELINE.json:15 invariant: extracted text is byte-identical per url.
    * Returns violation count (0 = pass). */
  def checkExtractionInvariant(pages: DataFrame): Long = {
    val extract = udf(extractText)
    pages.filter(md5(to_binary(extract(col("html")).cast("string"), lit("utf-8"))) =!=
      md5(to_binary(col("text"), lit("utf-8")))).count()
  }
}
