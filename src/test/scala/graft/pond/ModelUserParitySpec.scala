package graft.pond

import org.scalatest.funsuite.AnyFunSuite

import graft.core.DatasetCatalog

/** ModelUser access-token secret-ref parity (r15 verdict "What's
  * missing" #1; reference crates/cdl-openapi/src/model_user.rs:30-60,
  * consumed at cdl-k8s-provider/src/object.rs:294-321): the ref
  * resolves against a secret store to the S3 credential pair and lands
  * in `storageOptions` as fs.s3a.access.key / secret.key. */
class ModelUserParitySpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  // the minio-tenant shape the reference's owned path emits
  // (object.rs:953-958): CONSOLE_* keys under object-storage-user-0
  private val store: String => Option[Map[String, Array[Byte]]] =
    Map("object-storage-user-0" -> Map(
      "CONSOLE_ACCESS_KEY" -> b("AKIA-TEST"),
      "CONSOLE_SECRET_KEY" -> b("s3cr3t")),
      "custom-secret" -> Map(
        "ak" -> b("other-access"),
        "sk" -> b("other-secret"))).get

  test("defaults mirror the reference's serde defaults") {
    val ref = ModelUser.SecretRef()
    assert(ref.mapAccessKey == "CONSOLE_ACCESS_KEY")
    assert(ref.mapSecretKey == "CONSOLE_SECRET_KEY")
    assert(ref.name == "object-storage-user-0")
  }

  test("a secret-ref resolves through the store into S3A storage options") {
    val spec = ModelUser.Spec(Some(ModelUser.AccessTokenSecretRef()))
    val cat = ModelUser.catalogWith(DatasetCatalog(), spec, store)
      .getOrElse(fail("resolve failed"))
    val opts = cat.storageOptions
    assert(opts("fs.s3a.access.key") == "AKIA-TEST")
    assert(opts("fs.s3a.secret.key") == "s3cr3t")
    // custom key mapping + secret name (the non-default CRD shape)
    val custom = ModelUser.Spec(Some(ModelUser.AccessTokenSecretRef(
      ModelUser.SecretRef(mapAccessKey = "ak", mapSecretKey = "sk",
        name = "custom-secret"))))
    val cat2 = ModelUser.catalogWith(DatasetCatalog(), custom, store)
      .getOrElse(fail("custom resolve failed"))
    assert(cat2.s3AccessKey.contains("other-access") &&
      cat2.s3SecretKey.contains("other-secret"))
  }

  test("token-less spec keeps the catalog's own credentials (ref: provider only on ref)") {
    val base = DatasetCatalog(s3AccessKey = Some("inline"),
      s3SecretKey = Some("inline-secret"))
    val out = ModelUser.catalogWith(base, ModelUser.Spec(None), store)
    assert(out == Right(base))
  }

  test("failure modes mirror the reference's bail! messages") {
    val missingSecret = ModelUser.Spec(Some(ModelUser.AccessTokenSecretRef(
      ModelUser.SecretRef(name = "nope"))))
    assert(ModelUser.resolve(missingSecret, store) ==
      Left("no such secret: nope"))
    val missingKey = ModelUser.Spec(Some(ModelUser.AccessTokenSecretRef(
      ModelUser.SecretRef(mapAccessKey = "MISSING"))))
    assert(ModelUser.resolve(missingKey, store) ==
      Left("no such secret key: object-storage-user-0/MISSING"))
    // invalid UTF-8 value fails like the reference's from_utf8 map_err
    val badStore: String => Option[Map[String, Array[Byte]]] =
      Map("object-storage-user-0" -> Map(
        "CONSOLE_ACCESS_KEY" -> Array[Byte](-1, -2, -3),
        "CONSOLE_SECRET_KEY" -> b("x"))).get
    val spec = ModelUser.Spec(Some(ModelUser.AccessTokenSecretRef()))
    val out = ModelUser.resolve(spec, badStore)
    assert(out.isLeft && out.swap.exists(_.contains("not UTF-8")))
  }
}
