package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Encryption
import graft.server.AuditLog

/** Encryption at rest (reference ee/enc: raw 16/24/32-byte key file,
  * everything-encrypted store) via Parquet Modular Encryption, and the
  * audit log (reference ee/audit: per-request entries, encrypted when a
  * key is configured).
  */
class EncryptionSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("key file contract: 16/24/32 bytes accepted, anything else rejected") {
    val f = Files.createTempFile("graft_key", ".bin")
    Files.write(f, Array.fill[Byte](32)(7))
    assert(Encryption.readKeyFile(f.toString).length == 32)
    Files.write(f, Array.fill[Byte](16)(7))
    assert(Encryption.readKeyFile(f.toString).length == 16)
    Files.write(f, Array.fill[Byte](20)(7))
    val e = intercept[IllegalArgumentException](Encryption.readKeyFile(f.toString))
    assert(e.getMessage.contains("16, 24, or 32"))
  }

  test("parquet modular encryption: encrypted write round-trips, ciphertext hides values, no-key read fails") {
    import spark.implicits._
    val key = Array.tabulate[Byte](16)(_.toByte)
    Encryption.enable(spark, Map("k1" -> key))
    val dir = tmpDir("graft_enc_parquet")
    val df = Seq((1L, "SECRETVALUE_xyzzy"), (2L, "plutonium")).toDF("uid", "value")
    val w = df.write.mode("overwrite")
    Encryption.writeOptions("k1", Seq("value")).foreach { case (k, v) => w.option(k, v) }
    w.parquet(s"$dir/t")
    // transparent decrypt through the normal distributed scan
    val back = spark.read.parquet(s"$dir/t").orderBy("uid").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("SECRETVALUE_xyzzy", "plutonium"))
    // the value must not appear in the file bytes (footer + column sealed)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val bytes = Files.readAllBytes(f.toPath)
      assert(!new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("SECRETVALUE_xyzzy"), s"plaintext leaked into ${f.getName}")
    }
    // a session without the master key cannot read the data (clear the
    // process-wide KEK/KMS caches first — PME caches unwrapped key
    // material per JVM, which would mask the missing key)
    val conf = spark.sparkContext.hadoopConfiguration
    val saved = conf.get(graft.core.LocalKms.KeysConf)
    conf.set(graft.core.LocalKms.KeysConf, "")
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    try {
      val e = intercept[Throwable] {
        spark.read.parquet(s"$dir/t").collect()
      }
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(chain.contains("k1") || chain.toLowerCase.contains("key"), chain)
    } finally {
      conf.set(graft.core.LocalKms.KeysConf, saved)
      org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    }
    // and with the key restored, reads work again
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }

  test("audit log: plaintext entries, encrypted entries, tamper detection") {
    val dir = tmpDir("graft_audit")
    // plaintext
    val plain = new AuditLog(s"$dir/plain.log")
    plain.log("/query", "groot", "{ q(func: has(name)) { name } }")
    plain.log("/mutate", "alice", """{"set":[{"name":"x"}]}""")
    plain.close()
    val lines = AuditLog.readEntries(s"$dir/plain.log")
    assert(lines.size == 2)
    assert(lines.head.contains("\"endpoint\":\"/query\""))
    assert(lines.head.contains("\"user\":\"groot\""))
    assert(lines(1).contains("alice"))
    // encrypted: sealed per line, decrypts with the key, raw file hides content
    val key = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val enc = new AuditLog(s"$dir/enc.log", Some(key))
    enc.log("/alter", "groot", "name: string @index(term) .")
    enc.close()
    val raw = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/enc.log")), UTF_8)
    assert(!raw.contains("groot") && !raw.contains("/alter"))
    val dec = AuditLog.readEntries(s"$dir/enc.log", Some(key))
    assert(dec.size == 1 && dec.head.contains("/alter") && dec.head.contains("groot"))
    // flip one ciphertext byte -> the GCM tag fails loudly
    val tampered = raw.trim.toCharArray
    val mid = tampered.length / 2
    tampered(mid) = if (tampered(mid) == 'A') 'B' else 'A'
    Files.write(java.nio.file.Paths.get(s"$dir/tampered.log"),
      new String(tampered).getBytes(UTF_8))
    intercept[Throwable] {
      AuditLog.readEntries(s"$dir/tampered.log", Some(key))
    }
  }

  test("encrypted backup: sealed triples + manifest, restore with key, ciphertext hides values") {
    import spark.implicits._
    import graft.core.{SchemaRegistry, TripleFrameStore}
    import graft.operators.Backup
    import graft.sources.RdfSource
    val (preds, types) = SchemaRegistry.parseAlter("name: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq(
      """<0x1> <name> "SEALED_backup_value" .""",
      """<0x2> <name> "tungsten" .""").toDF("line"))
    val store = new TripleFrameStore(spark, reg, triples, Map.empty,
      materialize = false)
    val key = Array.tabulate[Byte](32)(i => (i * 5 + 1).toByte)
    val dir = tmpDir("graft_enc_backup")
    Backup.full(store, dir, encKey = Some("bk1" -> key))
    // manifest is sealed, not plaintext
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "schema.graft")))
    val manifestRaw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "schema.graft.enc"))
    assert(!new String(manifestRaw, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("name: string"))
    // triples parquet hides the values
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        case d if d.isDirectory => parquetFiles(d)
        case p if p.getName.endsWith(".parquet") => Seq(p)
        case _ => Nil
      }
    val files = parquetFiles(new java.io.File(s"$dir/triples"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val raw = new String(Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!raw.contains("SEALED_backup_value"), f.getName)
    }
    // restore with the key round-trips
    val restored = Backup.restore(spark, dir, encKey = Some("bk1" -> key))
    val names = restored.attr("name").select("value").as[String].collect().sorted
    assert(names.toSeq == Seq("SEALED_backup_value", "tungsten"))
  }

  test("HTTP front door writes audit entries with the token's user") {
    import spark.implicits._
    import graft.core.{Acl, SchemaRegistry}
    import graft.server.HttpEndpoint
    import graft.sources.RdfSource
    val (preds, types) = SchemaRegistry.parseAlter("name: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq("""<0x1> <name> "n1" .""").toDF("line"))
    val acl = new Acl(
      users = Map(
        "groot" -> Acl.User("groot", Acl.hashPassword("groot", "password"),
          groups = Set("guardians"))),
      groups = Map.empty,
      secret = "audit-secret-0123456789abcdef!!")
    val dir = tmpDir("graft_audit_http")
    val audit = new AuditLog(s"$dir/http.log")
    val ep = new HttpEndpoint(spark, reg, triples, acl = Some(acl),
      audit = Some(audit))
    val port = ep.start()
    try {
      def post(path: String, body: String, tok: Option[String] = None): String = {
        val c = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST"); c.setDoOutput(true)
        tok.foreach(t => c.setRequestProperty("X-Dgraph-AccessToken", t))
        c.getOutputStream.write(body.getBytes(UTF_8))
        new String(c.getInputStream.readAllBytes(), UTF_8)
      }
      val login = post("/login", """{"userid":"groot","password":"password"}""")
      val jwt = """accessJWT":"([^"]+)"""".r.findFirstMatchIn(login)
        .map(_.group(1)).getOrElse(fail(s"no jwt in $login"))
      post("/query", "{ q(func: has(name)) { name } }", Some(jwt))
      audit.close()
      val entries = AuditLog.readEntries(s"$dir/http.log")
      // /login (anonymous — no token yet) then /query as groot
      assert(entries.exists(e => e.contains("\"/login\"")
        && e.contains("anonymous")), entries.mkString("\n"))
      assert(entries.exists(e => e.contains("\"/query\"")
        && e.contains("\"user\":\"groot\"")
        && e.contains("has(name)")), entries.mkString("\n"))
      // plaintext credentials never reach the log: the /login body is
      // replaced wholesale (reference audit/interceptor.go
      // skipReqBodyGrpc["Login"] + maskPasswordFieldsInGQL)
      assert(!entries.exists(_.contains("password")),
        entries.mkString("\n"))
      assert(entries.exists(e => e.contains("\"/login\"")
        && e.contains("*******")), entries.mkString("\n"))
    } finally ep.stop()
  }

  test("password mask covers GraphQL-escaped quotes — no tail leaks") {
    import spark.implicits._
    import graft.core.{Acl, SchemaRegistry}
    import graft.server.HttpEndpoint
    import graft.sources.RdfSource
    val (preds, types) = SchemaRegistry.parseAlter("name: string @index(exact) .")
    val reg = new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
    val triples = RdfSource.parse(Seq("""<0x1> <name> "n1" .""").toDF("line"))
    val dir = tmpDir("graft_audit_mask")
    val audit = new AuditLog(s"$dir/mask.log")
    val ep = new HttpEndpoint(spark, reg, triples, audit = Some(audit))
    val port = ep.start()
    try {
      val c = new java.net.URL(s"http://127.0.0.1:$port/graphql")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      // GraphQL source: password: "p@ss\"secrettail" — the embedded
      // quote arrives JSON-encoded as \\\" ; the old content class
      // stopped there and leaked `secrettail` into the log
      c.getOutputStream.write(
        """{"query":"mutation { login(userId: \"u\", password: \"p@ss\\\"secrettail\") { token } }"}"""
          .getBytes(UTF_8))
      c.getResponseCode // drive the request (response content irrelevant)
      audit.close()
      val entries = AuditLog.readEntries(s"$dir/mask.log")
      assert(entries.exists(_.contains("*******")), entries.mkString("\n"))
      assert(!entries.exists(_.contains("secrettail")), entries.mkString("\n"))
      assert(!entries.exists(_.contains("p@ss")), entries.mkString("\n"))
    } finally ep.stop()
  }
}
