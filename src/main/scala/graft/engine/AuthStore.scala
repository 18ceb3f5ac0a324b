package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import java.security.MessageDigest
import scala.collection.mutable
import scala.util.Random

/** One user-directory row (ref: AuthTableEntry {username, salt, pass_hash,
  * content}, p5/server/authtableentry.h:7-12). */
final case class AuthEntry(username: String, salt: Array[Byte],
    passHash: Array[Byte], content: Array[Byte])

/** The user directory: registration, salted-SHA-256 authentication, profile
  * blobs (ref: auth_table, p5/server/my_storage.cc:29; hashing
  * p3/server/my_storage.cc:77-88).
  *
  * The directory is session-control metadata — tiny relative to the KV table
  * (one row per user) — so a driver-side map with a Dataset projection for
  * analytics (`view`, ALL) is the scale-appropriate design; it is the analog
  * of the reference's in-memory auth map + WAL records.
  */
final class AuthStore(spark: SparkSession, rng: Random = new Random()) {
  import Codes._

  private val users = mutable.LinkedHashMap.empty[String, AuthEntry]
  // (user, pass) pairs that already passed the salted-hash check. Passwords
  // are immutable after REG in this API, so positive results stay valid;
  // the cache avoids re-hashing on every point op (hot path).
  private val verified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = digest.get()
    md.reset()
    parts.foreach(md.update)
    md.digest()
  }

  /** REG: random 16-byte salt, SHA-256(pass ‖ salt), empty content
    * (ref: p3/server/my_storage.cc:75-126). */
  def addUser(user: String, pass: String): Result = synchronized {
    if (users.contains(user)) Result(false, ERR_USER_EXISTS)
    else {
      val salt = new Array[Byte](16)
      rng.nextBytes(salt)
      users.update(user,
        AuthEntry(user, salt, sha256(pass.getBytes("UTF-8"), salt),
          Array.emptyByteArray))
      Result(true, OK)
    }
  }

  /** Salted-hash credential check (ref: p3/server/my_storage.cc:232-250). */
  def auth(user: String, pass: String): Result = {
    if (verified.contains((user, pass))) return Result(true, OK)
    val ok = synchronized {
      users.get(user) match {
        case Some(e) => MessageDigest.isEqual(e.passHash,
          sha256(pass.getBytes("UTF-8"), e.salt))
        case None => false
      }
    }
    if (ok) { verified.add((user, pass)); Result(true, OK) }
    else Result(false, ERR_LOGIN)
  }

  /** SET: replace caller's profile blob (ref: p3/server/my_storage.cc:136-173). */
  def setUserData(user: String, pass: String, content: Array[Byte]): Result =
    synchronized {
      val a = auth(user, pass)
      if (!a.succeeded) a
      else if (content.length > LEN_PROFILE_FILE) Result(false, ERR_REQ_FMT)
      else {
        users.update(user, users(user).copy(content = content))
        Result(true, OK)
      }
    }

  /** GET: fetch ANY user's profile; empty → ERR_NO_DATA, missing user →
    * ERR_NO_USER (ref: p3/server/my_storage.cc:184-200). */
  def getUserData(user: String, pass: String, who: String): Result =
    synchronized {
      val a = auth(user, pass)
      if (!a.succeeded) a
      else users.get(who) match {
        case None => Result(false, ERR_NO_USER)
        case Some(e) if e.content.isEmpty => Result(false, ERR_NO_DATA)
        case Some(e) => Result(true, OK, e.content)
      }
    }

  /** ALL: newline-joined usernames, unsorted, no trailing newline
    * (ref: p3/server/my_storage.cc:209-224). */
  def getAllUsers(user: String, pass: String): Result = synchronized {
    val a = auth(user, pass)
    if (!a.succeeded) a
    else Result(true, OK, users.keys.mkString("\n").getBytes("UTF-8"))
  }

  /** Typed projection for analytics (SURVEY §1.4). */
  def view: Dataset[AuthEntry] = {
    import spark.implicits._
    spark.createDataset(synchronized(users.values.toSeq))
  }
}
