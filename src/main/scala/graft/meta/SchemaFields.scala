package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.FieldSpec
import scala.jdk.CollectionConverters._

/** JSONSchema-driven field ordering and titles (SURVEY.md §2.3 P9).
  *
  * The reference accepts a JSONSchema whose property order drives output
  * field order, with optional titles slugified as `full | slug |
  * underscore_slug` (`/root/reference/docs/options.md:663-688,733-756`).
  * We translate a schema document into [[FieldSpec]]s for the planner's
  * field-control pass — metadata only, no data-path work.
  *
  * Nested `object` properties map to promoted column names
  * (`parent<sep>child`); `array` of `object` properties map to the child
  * table of the same name.
  */
object SchemaFields {

  sealed trait TitleMode
  case object FullTitle extends TitleMode
  case object Slug extends TitleMode
  case object UnderscoreSlug extends TitleMode
  case object NoTitle extends TitleMode

  private val mapper = new ObjectMapper()

  /** Parse a JSONSchema string into planner field specs. */
  def fromJsonSchema(schemaJson: String, mainTable: String = "main",
      pathSeparator: String = "_", titleMode: TitleMode = NoTitle): Seq[FieldSpec] = {
    val root = mapper.readTree(schemaJson)
    val out = Seq.newBuilder[FieldSpec]
    walk(root, mainTable, Nil, out, pathSeparator, titleMode)
    out.result()
  }

  private def walk(node: JsonNode, table: String, prefix: Seq[String],
      out: scala.collection.mutable.Builder[FieldSpec, Seq[FieldSpec]],
      sep: String, titleMode: TitleMode): Unit = {
    val props = Option(node.get("properties")).getOrElse(return)
    props.properties().asScala.foreach { e =>
      val (name, spec) = (e.getKey, e.getValue)
      val tpe = Option(spec.get("type")).map(_.asText()).getOrElse("string")
      tpe match {
        case "object" =>
          walk(spec, table, prefix :+ name, out, sep, titleMode)
        case "array" =>
          val items = Option(spec.get("items"))
          val childTable = (prefix :+ name).mkString(sep)
          items.filter(i => Option(i.get("type")).exists(_.asText() == "object"))
            .foreach(i => walk(i, childTable, Nil, out, sep, titleMode))
        case _ =>
          val colName = (prefix :+ name).mkString(sep)
          out += FieldSpec(table, colName, title(spec, titleMode))
      }
    }
  }

  private def title(spec: JsonNode, mode: TitleMode): Option[String] = {
    val t = Option(spec.get("title")).map(_.asText()).filter(_.nonEmpty)
    mode match {
      case NoTitle        => None
      case FullTitle      => t
      case Slug           => t.map(slugify(_, "-"))
      case UnderscoreSlug => t.map(slugify(_, "_"))
    }
  }

  /** Lowercase, strip non-alphanumerics, spaces → sep
    * (`docs/options.md:738-739`). */
  def slugify(s: String, sep: String): String =
    s.toLowerCase
      .replaceAll("[^a-z0-9\\s]", "")
      .trim
      .replaceAll("\\s+", sep)
}
