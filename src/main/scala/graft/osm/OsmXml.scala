package graft.osm

import java.io.InputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** One OSM element (node | way | relation) flattened to a single row shape.
  * Mirrors the reference's parsed ADTs (osm_xml pin, SURVEY.md §1.1) but as
  * a Spark-encodable case class. `nds` order is significant.
  */
case class OsmElement(
    kind: String, // "node" | "way" | "relation"
    id: Long,
    lat: Double, // NaN for way/relation
    lon: Double,
    nds: Seq[Long], // way member node refs, ordered
    members: Seq[OsmMember], // relation members, ordered
    tags: Map[String, String])

case class OsmMember(mtype: String, ref: Long, role: String)

/** Streaming StAX parser for `.osm` XML — runs inside `mapPartitions`
  * (S3 in SURVEY.md §2.1), one pass, O(element) memory. Public-format
  * parser written from the OSM XML spec; no reference code involved.
  */
object OsmXml {
  private def norm(s: String): String =
    if (s == null) null else s.trim.replaceAll("\\s+", " ")

  def parse(in: InputStream): Iterator[OsmElement] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)
    new Iterator[OsmElement] {
      private var nextElem: OsmElement = _
      private var done = false
      advance()

      private def attr(name: String): String = {
        var i = 0
        while (i < r.getAttributeCount) {
          if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
          i += 1
        }
        null
      }

      private def readElement(kind: String): OsmElement = {
        val id = attr("id").toLong
        val lat = if (kind == "node") Option(attr("lat")).map(_.toDouble).getOrElse(Double.NaN) else Double.NaN
        val lon = if (kind == "node") Option(attr("lon")).map(_.toDouble).getOrElse(Double.NaN) else Double.NaN
        val nds = mutable.ArrayBuffer.empty[Long]
        val members = mutable.ArrayBuffer.empty[OsmMember]
        val tags = mutable.HashMap.empty[String, String]
        var depth = 1
        while (depth > 0 && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              depth += 1
              r.getLocalName match {
                case "nd" => nds += attr("ref").toLong
                case "member" =>
                  members += OsmMember(attr("type"), attr("ref").toLong, Option(attr("role")).getOrElse(""))
                // tag values normalize whitespace the way the reference's
                // parser does: surrounding whitespace stripped and internal
                // runs collapsed (golden output has "Peterhouse Crescent",
                // raw 10-256866-March.osm:363 has a trailing space; golden
                // "Clayton Hotel London Wall" vs raw double space at
                // 6-51800-City of London.osm:23589)
                case "tag" => tags(norm(attr("k"))) = norm(attr("v"))
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT => depth -= 1
            case _ =>
          }
        }
        OsmElement(kind, id, lat, lon, nds.toSeq, members.toSeq, tags.toMap)
      }

      private def advance(): Unit = {
        nextElem = null
        while (nextElem == null && !done) {
          if (!r.hasNext) { done = true; r.close() }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case k @ ("node" | "way" | "relation") => nextElem = readElement(k)
                case _ =>
              }
            case _ =>
          }
        }
      }

      override def hasNext: Boolean = nextElem != null
      override def next(): OsmElement = {
        val e = nextElem; advance(); e
      }
    }
  }

  def parseFile(path: String): Iterator[OsmElement] =
    parse(new java.io.BufferedInputStream(new java.io.FileInputStream(path), 1 << 16))
}
