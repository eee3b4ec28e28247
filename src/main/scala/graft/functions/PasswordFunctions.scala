package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** checkpwd (reference passwordFn worker/task.go:255, bcrypt hashes in
  * types/password.go).
  *
  * bcrypt is unavailable in this environment (no external deps), so the
  * stored-hash scheme is salted iterated SHA-256 — the *operator
  * semantics* (store an irreversible salted hash; `checkpwd` verifies a
  * candidate, never returns the hash) match the reference; swapping the
  * digest for bcrypt is a one-line change where a JVM bcrypt impl is on
  * the classpath.
  */
object PasswordFunctions {

  /** hash = sha256(salt ":" sha256(salt ":" password)) — two rounds. */
  def passwordHash(salt: Column, password: Column): Column =
    sha2(concat(salt, lit(":"), sha2(concat(salt, lit(":"), password), 256)), 256)

  /** checkpwd(storedHash, salt, candidate) — constant-shape compare. */
  def checkpwd(storedHash: Column, salt: Column, candidate: Column): Column =
    storedHash === passwordHash(salt, candidate)
}
