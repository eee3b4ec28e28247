package graft.core

import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.keytools.KmsClient
import org.apache.spark.sql.SparkSession

/** Encryption at rest (reference `ee/enc/util.go` ReadKey + the
  * `--encryption key-file=` flag: a raw 16/24/32-byte key file selects
  * AES-128/192/256 and every store file is encrypted with it).
  *
  * Spark-native mapping: the store IS parquet, so encryption at rest is
  * Parquet Modular Encryption (PME) — footer + column encryption built
  * into parquet-hadoop, applied by the normal distributed writers and
  * transparently decrypted by the normal distributed scans. No custom
  * read/write path: executors encrypt in parallel as they write, column
  * pruning and predicate pushdown keep working on encrypted files
  * (plaintext footer mode is NOT used — footers are encrypted too,
  * matching the reference's everything-encrypted posture).
  *
  * Key architecture (PME's envelope model): each file gets fresh data
  * encryption keys (DEKs), wrapped by the MASTER key(s) this module
  * manages. [[LocalKms]] is the KmsClient that wraps/unwraps DEKs with
  * AES-GCM under master keys read from the reference-style key file —
  * master keys never land in file metadata, only wrapped DEKs do. At
  * 100 TB this is the layout you want: re-keying rotates one master key
  * and re-wraps KEKs, not 100 TB of data.
  *
  * Usage:
  * {{{
  *   Encryption.enable(spark, keyFile, footerKeyId = "k1")
  *   df.write.option("parquet.encryption.footer.key", "k1")
  *     .option("parquet.encryption.column.keys", "k1:value,lang")
  *     .parquet(dir)                       // encrypted
  *   spark.read.parquet(dir)               // decrypts transparently
  * }}}
  */
object Encryption {

  /** Read a master key file, reference contract (ee/enc/util.go
    * ReadKey): exactly 16, 24, or 32 raw bytes → AES-128/192/256.
    */
  def readKeyFile(path: String): Array[Byte] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (!Set(16, 24, 32).contains(bytes.length))
      throw new IllegalArgumentException(
        s"encryption key file must be 16, 24, or 32 bytes, got ${bytes.length}")
    bytes
  }

  /** Enable PME on the session: registers the crypto factory + the
    * local KMS, and publishes the master key(s) to the KMS via the
    * hadoop conf (base64 — conf is in-process; a cluster deployment
    * points LocalKms at the key file on shared secure storage instead).
    * Multiple ids enable key rotation (`k1` live, `k2` staged).
    */
  def enable(spark: SparkSession, keys: Map[String, Array[Byte]]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("parquet.crypto.factory.class",
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
    conf.set("parquet.encryption.kms.client.class",
      "graft.core.LocalKms")
    // MERGE into the session's key ring (new ids win): a second enable
    // (another store, a backup key) must not orphan files written under
    // the earlier master key
    val existing = Option(conf.get(LocalKms.KeysConf)).getOrElse("")
      .split(",").filter(_.contains(":")).map { kv =>
        val i = kv.indexOf(':')
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }.toMap
    val merged = existing ++ keys.map { case (id, k) =>
      id -> Base64.getEncoder.encodeToString(k)
    }
    conf.set(LocalKms.KeysConf, merged.toSeq.sortBy(_._1)
      .map { case (id, b) => s"$id:$b" }.mkString(","))
    // parquet caches KmsClient instances per process — a client built
    // from the pre-merge conf would not know the new ids
    org.apache.parquet.crypto.keytools.KeyToolkit
      .removeCacheEntriesForAllTokens()
  }

  /** enable() from a reference-style key file: one master key id. */
  def enable(spark: SparkSession, keyFile: String, keyId: String): Unit =
    enable(spark, Map(keyId -> readKeyFile(keyFile)))

  /** Write options for an encrypted frame: footer key + every listed
    * column under the same master key (helper for call sites).
    */
  def writeOptions(keyId: String, columns: Seq[String]): Map[String, String] =
    Map("parquet.encryption.footer.key" -> keyId,
      "parquet.encryption.column.keys" -> s"$keyId:${columns.mkString(",")}")

  // AES-GCM wrap/unwrap shared with LocalKms (and the audit log)
  private[graft] def gcmEncrypt(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](12)
    // default SecureRandom (NativePRNG/urandom) — getInstanceStrong can
    // block on entropy and a GCM IV needs uniqueness, not blocking
    new java.security.SecureRandom().nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, iv))
    iv ++ c.doFinal(plain)
  }

  private[graft] def gcmDecrypt(key: Array[Byte], blob: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, blob.take(12)))
    c.doFinal(blob.drop(12))
  }
}

/** Parquet KmsClient over locally-held master keys: wraps each file's
  * DEK with AES-GCM under the named master key. Instantiated by
  * parquet-hadoop on BOTH the write and read paths (class name in the
  * hadoop conf), on whichever executor is writing/reading — so all
  * state rides the Configuration.
  */
final class LocalKms extends KmsClient {
  private var keys: Map[String, Array[Byte]] = Map.empty

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    keys = Option(configuration.get(LocalKms.KeysConf)).getOrElse("")
      .split(",").filter(_.contains(":")).map { kv =>
        val i = kv.indexOf(':')
        kv.substring(0, i).trim -> Base64.getDecoder.decode(kv.substring(i + 1).trim)
      }.toMap
  }

  private def key(id: String): Array[Byte] =
    keys.getOrElse(id, throw new IllegalArgumentException(
      s"unknown master key '$id' — is ${LocalKms.KeysConf} set?"))

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String =
    Base64.getEncoder.encodeToString(
      Encryption.gcmEncrypt(key(masterKeyIdentifier), keyBytes))

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] =
    Encryption.gcmDecrypt(key(masterKeyIdentifier),
      Base64.getDecoder.decode(wrappedKey))
}

object LocalKms {
  /** Hadoop-conf key carrying `id:base64key[,id2:base64key2…]`. */
  val KeysConf = "graft.encryption.key.list"
}
