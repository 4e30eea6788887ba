package graft.pond

import graft.core.DatasetCatalog

/** `ModelUser` CRD spec parity — the last unmirrored control-plane spec
  * (reference: crates/cdl-openapi/src/model_user.rs:30-60). A ModelUser
  * carries an optional access token, today always a SECRET REFERENCE:
  * the name of a secret object plus the two keys inside it that map to
  * the storage access/secret key pair. The reference never reconciles
  * ModelUser as its own controller (cdl-k8s-operator/src/main.rs:24-32
  * spawns only 4 CRDs); the spec is CONSUMED where object storage
  * providers resolve credentials
  * (cdl-k8s-provider/src/object.rs:294-321 `load_storage_provider_by_
  * reference`, and :953-958 building the owned tenant's console ref).
  * This module mirrors exactly that consumption: resolve the ref
  * against a secret store and feed the pair into [[DatasetCatalog]]'s
  * credentials → `storageOptions` (S3A).
  *
  * The "secret store" is abstracted as a lookup function
  * (`name → Option[keys → bytes]`) — the K8s `Api<Secret>::get_opt`
  * equivalent without a kube client; tests and non-K8s deployments
  * supply a map, a K8s deployment supplies a real secret reader. */
object ModelUser {

  /** model_user.rs:48-60 with the reference's serde defaults
    * (:70-82): CONSOLE_* key names and the minio tenant's user-0
    * secret, the shape `get_or_create_minio_tenant` emits
    * (object.rs:953-958). */
  final case class SecretRef(
      mapAccessKey: String = "CONSOLE_ACCESS_KEY",
      mapSecretKey: String = "CONSOLE_SECRET_KEY",
      name: String = "object-storage-user-0")

  /** model_user.rs:36-39 — a one-variant enum today; kept as a sealed
    * trait so a future token kind extends instead of breaking. */
  sealed trait AccessToken
  final case class AccessTokenSecretRef(ref: SecretRef = SecretRef())
    extends AccessToken

  /** model_user.rs:29-33 (`ModelUserSpec { access_token: Option<…> }`). */
  final case class Spec(accessToken: Option[AccessToken] = None)

  /** Resolve the spec to an (accessKey, secretKey) pair through the
    * secret store, with the reference's exact failure modes
    * (object.rs:304-318): a missing secret is
    * "no such secret: <name>", a missing key inside it is
    * "no such secret key: <name>/<key>", and values must be UTF-8. A
    * spec with no access token resolves to None — the caller keeps
    * whatever credentials it already has (the reference only builds a
    * provider when a ref is present). */
  def resolve(
      spec: Spec,
      secrets: String => Option[Map[String, Array[Byte]]])
    : Either[String, Option[(String, String)]] = spec.accessToken match {
    case None => Right(None)
    case Some(AccessTokenSecretRef(ref)) =>
      secrets(ref.name) match {
        case None => Left(s"no such secret: ${ref.name}")
        case Some(data) =>
          def key(k: String): Either[String, String] = data.get(k) match {
            case None => Left(s"no such secret key: ${ref.name}/$k")
            case Some(bytes) =>
              try Right(
                java.nio.charset.StandardCharsets.UTF_8.newDecoder()
                  .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
                  .decode(java.nio.ByteBuffer.wrap(bytes)).toString)
              catch {
                case _: java.nio.charset.CharacterCodingException =>
                  Left(s"failed to parse secret key (${ref.name}/$k): not UTF-8")
              }
          }
          for {
            ak <- key(ref.mapAccessKey)
            sk <- key(ref.mapSecretKey)
          } yield Some((ak, sk))
      }
  }

  /** The consumption path end-to-end: resolve the ModelUser's token and
    * graft it onto a catalog as the S3 credential pair, so
    * `catalog.storageOptions` carries `fs.s3a.access.key`/`secret.key`
    * exactly as `load_storage_provider_by_reference` builds its
    * `StaticProvider` (object.rs:319-321). A token-less spec returns
    * the catalog unchanged. */
  def catalogWith(
      catalog: DatasetCatalog,
      spec: Spec,
      secrets: String => Option[Map[String, Array[Byte]]])
    : Either[String, DatasetCatalog] =
    resolve(spec, secrets).map {
      case None => catalog
      case Some((ak, sk)) =>
        catalog.copy(s3AccessKey = Some(ak), s3SecretKey = Some(sk))
    }
}
