package graft.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** The reference's second schema system: typed "Models" with declared field
  * kinds, validation, and schema inference from JSON-schema documents
  * (reference: crates/cdl-openapi/src/model.rs:500-553 for the kinds;
  * crates/cdl-k8s-operator/src/validator/model.rs:165-293 for inference;
  * crates/cdl-k8s-provider/src/parser.rs:7-76 for value constraints).
  *
  * Spark mapping per SURVEY §1.4: Object → StructType, ObjectArray →
  * ArrayType(StructType), StringArray → ArrayType(StringType), DateTime →
  * TimestampType, Ip/Uuid → StringType (+ check), Integer → LongType,
  * Number → DoubleType. Field name paths are `/`-separated with parent
  * objects synthesized.
  */
object ModelSchema {

  sealed trait FieldKind
  object FieldKind {
    case object NoneKind extends FieldKind
    case object BooleanKind extends FieldKind
    final case class IntegerKind(min: Option[Long] = None, max: Option[Long] = None,
        default: Option[Long] = None) extends FieldKind
    final case class NumberKind(min: Option[Double] = None, max: Option[Double] = None,
        default: Option[Double] = None) extends FieldKind
    final case class StringKind(
        constraint: StringConstraint = StringConstraint.Dynamic,
        default: Option[String] = None) extends FieldKind
    final case class OneOfStrings(choices: Seq[String],
        default: Option[String] = None) extends FieldKind
    final case class DateTimeKind(defaultNow: Boolean = false) extends FieldKind
    case object IpKind extends FieldKind
    case object UuidKind extends FieldKind
    case object StringArrayKind extends FieldKind
    final case class ObjectKind(children: Seq[ModelField],
        dynamic: Boolean = false) extends FieldKind
    final case class ObjectArrayKind(children: Seq[ModelField]) extends FieldKind
    /** Model-in-model composition: the field's subtree is another model's
      * field list, loaded by name and merged under this field's path
      * (reference `ModelFieldKindExtendedSpec::Model`,
      * crates/cdl-openapi/src/model.rs:667-670; merge at
      * crates/cdl-k8s-operator/src/validator/model.rs:33-70,451-471).
      * Must be resolved via `resolveRefs` before any Spark mapping. */
    final case class ModelRef(model: String) extends FieldKind
  }

  sealed trait StringConstraint
  object StringConstraint {
    case object Dynamic extends StringConstraint
    final case class Static(length: Long) extends StringConstraint
    final case class Range(min: Option[Long], max: Option[Long]) extends StringConstraint
  }

  /** One declared field. `name` is the `/`-separated path ("/meta/owner/"). */
  final case class ModelField(name: String, kind: FieldKind, optional: Boolean = false) {
    def leafName: String = name.split('/').filter(_.nonEmpty).lastOption.getOrElse("")
  }

  import FieldKind._

  def toSparkType(kind: FieldKind): DataType = kind match {
    case NoneKind            => NullType
    case BooleanKind         => BooleanType
    case _: IntegerKind      => LongType
    case _: NumberKind       => DoubleType
    case _: StringKind       => StringType
    case _: OneOfStrings     => StringType
    case _: DateTimeKind     => TimestampType
    case IpKind | UuidKind   => StringType
    case StringArrayKind     => ArrayType(StringType)
    case ObjectKind(ch, _)   => StructType(ch.map(toStructField))
    case ObjectArrayKind(ch) => ArrayType(StructType(ch.map(toStructField)))
    case ModelRef(m) => throw new IllegalStateException(
      s"unresolved model reference '$m' — apply ModelSchema.resolveRefs first")
  }

  def toStructField(f: ModelField): StructField =
    StructField(f.leafName, toSparkType(f.kind), nullable = f.optional)

  def toStructType(fields: Seq[ModelField]): StructType =
    StructType(resolvePaths(fields).map(toStructField))

  /** Fold a flat `/`-path field list into a nested tree (the reference's
    * parent-object synthesis, validator/model.rs:473-650). Fields are
    * ordered by name (BTreeMap order in the reference). */
  def resolvePaths(fields: Seq[ModelField]): Seq[ModelField] = {
    val sorted = fields.sortBy(_.name)
    def build(prefix: String): Seq[ModelField] = {
      val depth = prefix.count(_ == '/')
      sorted
        .filter(f => f.name.startsWith(prefix) &&
          f.name.stripSuffix("/").count(_ == '/') == depth)
        .map { f =>
          f.kind match {
            case ObjectKind(_, dyn) =>
              f.copy(kind = ObjectKind(build(f.name.stripSuffix("/") + "/"), dyn))
            case ObjectArrayKind(_) =>
              f.copy(kind = ObjectArrayKind(build(f.name.stripSuffix("/") + "/")))
            case _ => f
          }
        }
    }
    build("/")
  }

  // ---- model-in-model resolution (validator/model.rs:33-70,451-471) ----

  /** `merge_name`: child paths of a referenced model re-root under the
    * referring field's path; the referenced model's own root "/" maps to
    * the referring path itself (becoming its Object field). */
  def mergeName(parent: String, child: String): String = {
    val p = if (parent.endsWith("/")) parent else parent + "/"
    p + child.stripPrefix("/")
  }

  /** Replace every `ModelRef` field with the referenced model's fields,
    * re-prefixed under the referring path — recursively, so referenced
    * models may themselves reference models. `registry` is the model
    * store lookup (the reference loads via its K8s storage client;
    * here any name→fields function). Cycles and unknown names error. */
  def resolveRefs(
      fields: Seq[ModelField],
      registry: String => Option[Seq[ModelField]],
      seen: Set[String] = Set.empty): Either[String, Seq[ModelField]] = {
    val resolved = fields.map { f =>
      f.kind match {
        case ModelRef(name) =>
          if (seen.contains(name)) Left(s"cyclic model reference: $name")
          else registry(name).toRight(s"unknown model: $name").flatMap { refFields =>
            resolveRefs(refFields, registry, seen + name).map(_.map(rf =>
              rf.copy(name = mergeName(f.name, rf.name))))
          }
        case _ => Right(Seq(f))
      }
    }
    resolved.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(resolved.collect { case Right(fs) => fs }.flatten))
  }

  // ---- value validation (reference parser.rs:7-76) ----

  def validateValue(f: ModelField, v: JsonNode): Either[String, Unit] = f.kind match {
    case StringKind(StringConstraint.Static(len), _) =>
      if (v.isTextual && v.asText.length == len) Right(())
      else Left(s"${f.name}: static string length $len violated")
    case StringKind(StringConstraint.Range(min, max), _) =>
      val n = if (v.isTextual) v.asText.length.toLong else -1L
      if (n >= 0 && min.forall(n >= _) && max.forall(n <= _)) Right(())
      else Left(s"${f.name}: string length $n outside [$min,$max]")
    case OneOfStrings(choices, _) =>
      if (v.isTextual && choices.contains(v.asText)) Right(())
      else Left(s"${f.name}: '${v.asText}' not in ${choices.mkString(",")}")
    case IntegerKind(min, max, _) =>
      if (v.canConvertToLong && min.forall(v.asLong >= _) && max.forall(v.asLong <= _))
        Right(())
      else Left(s"${f.name}: integer out of range")
    case NumberKind(min, max, _) =>
      if (v.isNumber && min.forall(v.asDouble >= _) && max.forall(v.asDouble <= _))
        Right(())
      else Left(s"${f.name}: number out of range")
    case IpKind =>
      val ip = "^((25[0-5]|2[0-4]\\d|1?\\d?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1?\\d?\\d)$".r
      if (v.isTextual && ip.matches(v.asText)) Right(())
      else Left(s"${f.name}: not an IPv4 address")
    case UuidKind =>
      val u = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
      if (v.isTextual && u.matches(v.asText)) Right(())
      else Left(s"${f.name}: not a UUID")
    case _ => Right(())
  }

  // ---- inference from a JSON-schema document (validator/model.rs:165-293) ----

  private val mapper = new ObjectMapper()

  def inferFromJsonSchema(json: String): Either[String, Seq[ModelField]] =
    inferNode("/", mapper.readTree(json), required = true)

  private def inferNode(path: String, node: JsonNode,
      required: Boolean): Either[String, Seq[ModelField]] = {
    val ty = Option(node.get("type")).map(_.asText).getOrElse("object")
    val fmt = Option(node.get("format")).map(_.asText)
    val enums = Option(node.get("enum"))
      .map(_.elements().asScala.map(_.asText).toSeq)
    def leaf(k: FieldKind) = Right(Seq(ModelField(path, k, optional = !required)))
    ty match {
      case "boolean" => leaf(BooleanKind)
      case "integer" => leaf(IntegerKind())
      case "number"  => leaf(NumberKind())
      case "string" =>
        (fmt, enums) match {
          case (_, Some(cs))        => leaf(OneOfStrings(cs))
          case (Some("date-time"), _) => leaf(DateTimeKind())
          case (Some("ip"), _)      => leaf(IpKind)
          case (Some("uuid"), _)    => leaf(UuidKind)
          case _                    => leaf(StringKind())
        }
      case "object" =>
        val requiredSet = Option(node.get("required"))
          .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty)
        val props = Option(node.get("properties"))
          .map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
        val children = props.map { e =>
          inferNode(s"$path${e.getKey}/", e.getValue, requiredSet.contains(e.getKey))
        }
        children.collectFirst { case Left(e) => Left(e) }.getOrElse {
          val flat = children.collect { case Right(fs) => fs }.flatten
          Right(ModelField(path, ObjectKind(Nil), optional = !required) +: flat)
        }
      case "array" =>
        val items = Option(node.get("items"))
        items.map(i => Option(i.get("type")).map(_.asText).getOrElse("object")) match {
          case Some("object") =>
            inferNode(path, items.get, required).map { fs =>
              // re-kind the synthesized object as an object-array
              fs.map(f => if (f.name == path) f.copy(kind = ObjectArrayKind(Nil)) else f)
            }
          case Some("string") => leaf(StringArrayKind)
          case other =>
            // reference warns & rejects arrays of non-objects (model.rs:265-274)
            Left(s"$path: unsupported array item type $other")
        }
      case other => Left(s"$path: unsupported type $other")
    }
  }
}
