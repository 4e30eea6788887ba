package graft.model

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import ModelSchema._
import ModelSchema.FieldKind._

/** Model field kinds → StructType mapping and JSON-schema inference
  * (FIXTURES §A4; reference validator/model.rs:165-293, parser.rs:7-76). */
class ModelSchemaSpec extends AnyFunSuite {

  test("flat field kinds map to the SURVEY §1.4 Spark types") {
    val fields = Seq(
      ModelField("/id/", UuidKind),
      ModelField("/label/", StringKind()),
      ModelField("/kind/", OneOfStrings(Seq("hot", "cold"))),
      ModelField("/score/", NumberKind(Some(0.0), Some(1.0))),
      ModelField("/count/", IntegerKind(Some(0L), None)),
      ModelField("/when/", DateTimeKind()),
      ModelField("/addr/", IpKind),
      ModelField("/tags/", StringArrayKind))
    val st = toStructType(fields)
    val m = st.fields.map(f => f.name -> f.dataType).toMap
    assert(m("id") == StringType)
    assert(m("kind") == StringType)
    assert(m("score") == DoubleType)
    assert(m("count") == LongType)
    assert(m("when") == TimestampType)
    assert(m("tags") == ArrayType(StringType))
  }

  test("nested object paths synthesize StructType children") {
    val fields = Seq(
      ModelField("/meta/", ObjectKind(Nil)),
      ModelField("/meta/owner/", StringKind()),
      ModelField("/items/", ObjectArrayKind(Nil)),
      ModelField("/items/sku/", StringKind()))
    val st = toStructType(fields)
    val meta = st("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("owner"))
    val items = st("items").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(items.fieldNames.toSeq == Seq("sku"))
  }

  test("value validation: static length, enum, integer range, ip, uuid") {
    val m = new ObjectMapper()
    def j(s: String) = m.readTree(s)
    assert(validateValue(ModelField("/s/",
      StringKind(StringConstraint.Static(4))), j("\"abcd\"")).isRight)
    assert(validateValue(ModelField("/s/",
      StringKind(StringConstraint.Static(4))), j("\"abc\"")).isLeft)
    assert(validateValue(ModelField("/k/",
      OneOfStrings(Seq("hot", "cold"))), j("\"warm\"")).isLeft)
    assert(validateValue(ModelField("/i/",
      IntegerKind(Some(0), Some(10))), j("11")).isLeft)
    assert(validateValue(ModelField("/i/",
      IntegerKind(Some(0), Some(10))), j("7")).isRight)
    assert(validateValue(ModelField("/a/", IpKind), j("\"10.0.0.1\"")).isRight)
    assert(validateValue(ModelField("/a/", IpKind), j("\"999.0.0.1\"")).isLeft)
    assert(validateValue(ModelField("/u/", UuidKind),
      j("\"123e4567-e89b-12d3-a456-426614174000\"")).isRight)
    assert(validateValue(ModelField("/u/", UuidKind), j("\"nope\"")).isLeft)
  }

  test("JSON-schema inference maps types and formats") {
    val schema =
      """{"type":"object","required":["name","n"],"properties":{
        |  "name":{"type":"string"},
        |  "n":{"type":"integer"},
        |  "score":{"type":"number"},
        |  "ok":{"type":"boolean"},
        |  "when":{"type":"string","format":"date-time"},
        |  "kind":{"type":"string","enum":["a","b"]},
        |  "tags":{"type":"array","items":{"type":"string"}},
        |  "children":{"type":"array","items":{"type":"object","properties":{
        |     "x":{"type":"string"}}}}
        |}}""".stripMargin
    val fields = inferFromJsonSchema(schema).toOption.get
    val byName = fields.map(f => f.name -> f).toMap
    assert(byName("/name/").kind == StringKind())
    assert(!byName("/name/").optional) // in required list
    assert(byName("/score/").optional)
    assert(byName("/n/").kind == IntegerKind())
    assert(byName("/ok/").kind == BooleanKind)
    assert(byName("/when/").kind == DateTimeKind())
    assert(byName("/kind/").kind == OneOfStrings(Seq("a", "b")))
    assert(byName("/tags/").kind == StringArrayKind)
    assert(byName("/children/").kind.isInstanceOf[ObjectArrayKind])
  }

  test("array of non-object/non-string items is rejected (ref warns)") {
    val schema = """{"type":"object","properties":{
      |  "xs":{"type":"array","items":{"type":"integer"}}}}""".stripMargin
    assert(inferFromJsonSchema(schema).isLeft)
  }

  test("Model{name} reference resolves into flattened, ordered fields") {
    // "address" model: its own root object + two leaves
    val address = Seq(
      ModelField("/", ObjectKind(Nil)),
      ModelField("/city/", StringKind()),
      ModelField("/zip/", IntegerKind()))
    // "person" model references address twice (home/work) + a leaf
    val person = Seq(
      ModelField("/name/", StringKind()),
      ModelField("/home/", ModelRef("address")),
      ModelField("/work/", ModelRef("address")))
    val registry = Map("address" -> address).get _
    val flat = resolveRefs(person, registry).toOption.get
    // the referenced root "/" becomes the referring field's Object
    assert(flat.map(_.name).sorted == Seq(
      "/home/", "/home/city/", "/home/zip/", "/name/",
      "/work/", "/work/city/", "/work/zip/"))
    // BTreeMap-ordered struct with the merged subtrees nested
    val st = toStructType(flat)
    assert(st.fieldNames.toSeq == Seq("home", "name", "work"))
    val home = st("home").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(home.fieldNames.toSeq == Seq("city", "zip"))
    assert(home("zip").dataType == org.apache.spark.sql.types.LongType)
  }

  test("model refs resolve recursively; cycles and unknown names error") {
    val a = Seq(ModelField("/", ObjectKind(Nil)), ModelField("/x/", StringKind()))
    val b = Seq(ModelField("/", ObjectKind(Nil)), ModelField("/inner/", ModelRef("a")))
    val c = Seq(ModelField("/deep/", ModelRef("b")))
    val registry = Map("a" -> a, "b" -> b).get _
    val flat = resolveRefs(c, registry).toOption.get
    assert(flat.map(_.name).contains("/deep/inner/x/"))

    val cyc = Map(
      "p" -> Seq(ModelField("/q/", ModelRef("q"))),
      "q" -> Seq(ModelField("/p/", ModelRef("p"))))
    assert(resolveRefs(Seq(ModelField("/r/", ModelRef("p"))), cyc.get _).isLeft)
    assert(resolveRefs(Seq(ModelField("/r/", ModelRef("nope"))), cyc.get _).isLeft)
    // unresolved refs must never reach the Spark mapping
    intercept[IllegalStateException] {
      toSparkType(ModelRef("address"))
    }
  }
}
