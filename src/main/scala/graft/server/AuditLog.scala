package graft.server

import java.io.{BufferedWriter, FileWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.core.Encryption

/** Audit logging (reference `ee/audit/`: every gRPC/HTTP request is
  * appended to a rolling audit log with endpoint, user, client, and the
  * request body; when an encryption key is configured the log itself is
  * encrypted with it — `audit.go` InitAuditorIfNecessary +
  * interceptor.go's per-request AuditHttp/AuditGrpc).
  *
  * Entries are JSON lines `{"ts":…,"endpoint":…,"user":…,"query":…}`.
  * With a key, each line is AES-GCM-sealed independently (base64,
  * fresh IV per line) — a reader can decrypt any suffix of a partially
  * shipped log, and flipping one byte anywhere in a line fails that
  * line's tag instead of silently corrupting, which is the property an
  * AUDIT log needs. Writes are append-only and synchronized; flush per
  * entry so a crash loses at most the in-flight line (the reference
  * accepts the same bound via its buffered writer).
  */
final class AuditLog(path: String, key: Option[Array[Byte]] = None) {
  private val M = new ObjectMapper()
  private val out = new BufferedWriter(new FileWriter(path, true))

  def log(endpoint: String, user: String, query: String): Unit = {
    val node = M.createObjectNode()
    node.put("ts", java.time.Instant.now().toString)
    node.put("endpoint", endpoint)
    node.put("user", user)
    node.put("query", query)
    val line = M.writeValueAsString(node)
    val rendered = key match {
      case Some(k) =>
        Base64.getEncoder.encodeToString(
          Encryption.gcmEncrypt(k, line.getBytes(UTF_8)))
      case None => line
    }
    synchronized { out.write(rendered); out.newLine(); out.flush() }
  }

  def close(): Unit = synchronized(out.close())
}

object AuditLog {
  /** Decrypt + parse an audit log back to its JSON lines (operator
    * tooling — reference `audit decrypt` subcommand).
    */
  def readEntries(path: String, key: Option[Array[Byte]] = None): Seq[String] = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray(Array.empty[String]).toSeq
    key match {
      case Some(k) => lines.map(l =>
        new String(Encryption.gcmDecrypt(k, Base64.getDecoder.decode(l)), UTF_8))
      case None => lines
    }
  }
}
