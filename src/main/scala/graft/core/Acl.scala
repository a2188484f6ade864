package graft.core

/** ACL analogue of the reference's per-user key permissions.
  *
  * The reference attaches the loading user to every library
  * (`GearsLibraryMetaData`, `redisgears_core/src/lib.rs:196-203`) and
  * checks that user's ACL on EVERY key access: inside function calls
  * (`lib.rs:506-517` via `call_redis_command`'s verify-ACL option),
  * on each stream record before delivery
  * (`stream_run_ctx.rs:144-153` — a denied stream key is a Nack), and
  * on each keyspace notification before the consumer fires. The test
  * shapes are `pytests/test_acl.py` (denied key read, denied command,
  * user revoked while the library is loaded).
  *
  * Here a user is a set of prefix rules — consistent with the engine's
  * prefix-subscription semantics — each granting read and/or write on
  * keys under the prefix. The empty prefix matches everything. A
  * library is loaded AS a user ([[LibraryDefinition.user]]) and every
  * [[FunctionContext]] key access re-resolves that user at call time,
  * so revoking the user (aclDelUser) immediately cuts off an
  * already-loaded library, like the reference's user-deleted-while-
  * running test.
  */
case class AclRule(prefix: String, read: Boolean = true, write: Boolean = true)

/** Raised on any denied key access — message shape mirrors the
  * reference's "User '<u>' has no permissions on key '<k>'". */
final class AclException(msg: String) extends RuntimeException(msg)

object Acl {
  /** The implicit all-access user every engine starts with. */
  val DefaultUser = "default"
  val AllAccess: Seq[AclRule] = Seq(AclRule("", read = true, write = true))

  def check(user: String, rules: Option[Seq[AclRule]], key: String,
      write: Boolean): Unit = {
    val rs = rules.getOrElse(throw new AclException(
      s"ACL user '$user' does not exist (revoked?)"))
    val ok = rs.exists(r =>
      key.startsWith(r.prefix) && (if (write) r.write else r.read))
    if (!ok) throw new AclException(
      s"User '$user' has no ${if (write) "write" else "read"} permissions on key '$key'")
  }
}
