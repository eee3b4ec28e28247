package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bcrypt

/** bcrypt against PUBLIC test vectors (the jBCrypt/OpenBSD suite that every
  * interoperable implementation checks), plus round-trip properties. A pass
  * here means hashes are interchangeable with the reference's bcrypt
  * (types/password.go uses golang.org/x/crypto/bcrypt — same vectors).
  */
class BcryptSpec extends AnyFunSuite {

  // (password, salt, expected full hash) — public interop vectors
  private val vectors = Seq(
    ("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.",
      "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO",
      "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu",
      "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    ("abcdefghijklmnopqrstuvwxyz", "$2a$06$.rCVZVOThsIa97pEDOxvGu",
      "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC"),
    ("~!@#$%^&*()      ~!@#$%^&*()PNBFRD", "$2a$06$fPIsBO8qRqkjj273rfaOI.",
      "$2a$06$fPIsBO8qRqkjj273rfaOI.HtSV9jLDpTbZn782DC6/t7qT67P6FfO"))

  test("public interop vectors hash exactly") {
    for ((pw, salt, expected) <- vectors)
      assert(Bcrypt.hashpw(pw, salt) == expected, s"for password '$pw'")
  }

  test("checkpw accepts the right password and rejects others") {
    for ((pw, _, stored) <- vectors) {
      assert(Bcrypt.checkpw(pw, stored))
      assert(!Bcrypt.checkpw(pw + "x", stored))
    }
  }

  test("full hash string works as the salt argument (crypt convention)") {
    val (pw, _, stored) = vectors(3)
    assert(Bcrypt.hashpw(pw, stored) == stored)
  }

  test("deterministic fixture salts round-trip at cost 4") {
    val salt = Bcrypt.saltFromSeed("cust-42", 4)
    assert(salt.startsWith("$2a$04$") && salt.length == 29)
    val h = Bcrypt.hashpw("pw_42", salt)
    assert(h.length == 60)
    assert(Bcrypt.checkpw("pw_42", h))
    assert(!Bcrypt.checkpw("pw_43", h))
    // deterministic: same seed, same salt, same hash
    assert(Bcrypt.hashpw("pw_42", Bcrypt.saltFromSeed("cust-42", 4)) == h)
  }

  test("passwords over 72 bytes are rejected (reference behavior)") {
    intercept[IllegalArgumentException] {
      Bcrypt.hashpw("x" * 73, "$2a$06$DCq7YPn5Rq63x1Lad4cll.")
    }
  }
}
