package graft.engine

/** Result envelope mirroring the reference's `result_t {succeeded, msg, data}`
  * (ref: p5/server/storage.h:39-44). */
final case class Result(succeeded: Boolean, msg: String,
    data: Array[Byte] = Array.emptyByteArray) {
  def dataUtf8: String = new String(data, "UTF-8")
}

/** Response codes, 1:1 with the reference wire protocol
  * (ref: p5/common/protocol.h:213-246, :375-383, :419-427, :502-506). */
object Codes {
  val OK = "___OK___"
  val OK_INSERT = "OK_INSERT"
  val OK_UPDATE = "OK_UPDATE"
  val ERR_USER_EXISTS = "ERR_USER_EXISTS"
  val ERR_LOGIN = "ERR_LOGIN"
  val ERR_REQ_FMT = "ERR_REQ_FMT"
  val ERR_NO_DATA = "ERR_NO_DATA"
  val ERR_NO_USER = "ERR_NO_USER"
  val ERR_KEY = "ERR_KEY"
  val ERR_QUOTA_DOWN = "ERR_QUOTA_DOWN"
  val ERR_QUOTA_UP = "ERR_QUOTA_UP"
  val ERR_QUOTA_REQ = "ERR_QUOTA_REQ"
  val ERR_FUNC = "ERR_FUNC"
  val ERR_SO = "ERR_SO"
  val ERR_SERVER = "ERR_SERVER"

  /** Size limits (ref: p5/common/protocol.h:66, :257, :260, :438, :441). */
  val LEN_KEY = 1024
  val LEN_VAL = 1048576
  val LEN_PROFILE_FILE = 1048576
  val LEN_FNAME = 32
  val LEN_SO = 16777216
}
