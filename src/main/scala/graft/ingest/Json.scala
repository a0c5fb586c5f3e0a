package graft.ingest

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Minimal compact JSON layer over Jackson (already on the Spark
  * classpath). Rendering matches python json.dumps(separators=(',', ':'))
  * — no whitespace, insertion order preserved — so prompt payloads are
  * byte-comparable with the reference's.
  */
object Json {
  private val mapper = new ObjectMapper(new JsonFactory())

  /** python-json.dumps-compatible string escaping (default
    * ensure_ascii=True): shortcuts for the common escapes, lowercase
    * \uXXXX for other control chars AND all non-ASCII.
    */
  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case c if c < ' ' || c > '~' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').result()
  }

  /** Render strings/numbers/booleans/null, Seq and ordered Map. */
  def write(v: Any): String = v match {
    case null            => "null"
    case s: String       => quote(s)
    // binary payloads render as deterministic base64, never JVM
    // identity strings
    case b: Array[Byte]  => quote(java.util.Base64.getEncoder.encodeToString(b))
    // python json.dumps prints whole doubles as "10000000.0" while
    // Double.toString switches to scientific notation at 1e7 — format
    // whole doubles explicitly for prompt byte-parity
    case d: Double       => if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0"
                            else mapper.writeValueAsString(d)
    case f: Float        => write(f.toDouble)
    case n: Number       => n.toString
    case b: Boolean      => b.toString
    case m: collection.Map[_, _] =>
      m.map { case (k, vv) => s"${write(k.toString)}:${write(vv)}" }
        .mkString("{", ",", "}")
    case s: Iterable[_]  => s.map(write).mkString("[", ",", "]")
    case other           => quote(other.toString)
  }

  private def toScala(n: JsonNode): Any = {
    if (n.isObject)
      n.properties().asScala.foldLeft(
        scala.collection.mutable.LinkedHashMap.empty[String, Any]) {
        (acc, e) => acc += (e.getKey -> toScala(e.getValue)); acc
      }
    else if (n.isArray) n.elements().asScala.map(toScala).toVector
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else null
  }

  /** Parse a JSON object into an insertion-ordered Map. */
  def parseObject(s: String): collection.Map[String, Any] =
    toScala(mapper.readTree(s)).asInstanceOf[collection.Map[String, Any]]

  /** Parse a JSON array of objects. */
  def parseArray(s: String): Seq[collection.Map[String, Any]] =
    toScala(mapper.readTree(s)).asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[collection.Map[String, Any]])
}
