package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Recurse, ShortestPath}

/** Property tests against in-memory reference implementations
  * (SURVEY §5 adopted plan item 3: set algebra / traversal vs oracles
  * computed in plain Scala). Raw ScalaCheck generators sampled with
  * fixed seeds (the scalatest-scalacheck bridge isn't on the classpath).
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val graphGen: Gen[Seq[(Long, Long)]] =
    Gen.listOfN(20, for {
      a <- Gen.choose(0L, 7L); b <- Gen.choose(0L, 7L)
    } yield (a, b)).map(_.filter(e => e._1 != e._2).distinct)

  test("Recurse.expand equals BFS reachability with min depth (12 random graphs)") {
    samples(graphGen, 12).filter(_.nonEmpty).foreach { edges =>
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var frontier = Set(0L); var seen = Set(0L)
      var expected = Map.empty[Long, Int]
      var d = 1
      while (frontier.nonEmpty && d <= 4) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- seen
        next.foreach(n => expected += n -> d)
        seen ++= next; frontier = next; d += 1
      }
      val got = Recurse.expand(Seq(0L).toDF("start"),
          edges.toDF("subject", "object"), maxDepth = 4)
        .as[(Long, Long, Int)].collect()
        .map { case (_, n, dep) => n -> dep }.toMap
      assert(got == expected, s"edges=$edges")
    }
  }

  private val dagGen: Gen[Seq[(Long, Long, Long)]] =
    Gen.listOfN(15, for {
      a <- Gen.choose(0L, 6L); b <- Gen.choose(1L, 7L)
      w <- Gen.choose(1L, 9L)
    } yield (a, b, w))
      .map(_.filter(e => e._2 > e._1)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq)

  test("sssp equals topological relaxation on random weighted DAGs (12 samples)") {
    samples(dagGen, 12).filter(_.nonEmpty).foreach { edges =>
      val byStart = edges.groupBy(_._1)
      var dist = Map(0L -> 0L)
      (0L to 7L).foreach { n =>
        dist.get(n).foreach { dn =>
          byStart.getOrElse(n, Nil).foreach { case (_, b, w) =>
            if (!dist.contains(b) || dist(b) > dn + w) dist += b -> (dn + w)
          }
        }
      }
      val got = ShortestPath.sssp(spark, 0L, edges.toDF("src", "dst", "w"))
        .as[(Long, Double)].collect().toMap
      assert(got == dist.map { case (k, v) => k -> v.toDouble }, s"edges=$edges")
    }
  }

  private val corpusGen: Gen[Seq[String]] =
    Gen.listOfN(8, Gen.listOfN(14,
      Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" ")))

  test("boilerplate_lines invariants vs in-memory reference (8 random corpora)") {
    samples(corpusGen, 8).foreach { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft_bpp").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = graft.queries.QualityQueries
        .queries("boilerplate_lines")(spark, dir)
        .select("doc_id", "line_idx", "n_words", "keep", "reason")
        .as[(Long, Long, Long, Boolean, Option[String])].collect().toSeq
      // in-memory reference: 8-word lines, keep = >=5 words AND first
      // occurrence of the line text in (doc_id, line_idx) order
      val expected = texts.zipWithIndex.flatMap { case (t, i) =>
        val ws = t.split(" ")
        ws.grouped(8).zipWithIndex.map { case (g, li) =>
          (i.toLong, li.toLong, g.mkString(" "), g.length.toLong)
        }
      }.sortBy(r => (r._1, r._2))
      val seen = scala.collection.mutable.Set.empty[String]
      val expRows = expected.map { case (id, li, line, nw) =>
        val first = seen.add(line)
        val keep = nw >= 5 && first
        val reason = if (nw < 5) Some("short")
          else if (!first) Some("dup_line") else None
        (id, li, nw, keep, reason)
      }
      assert(got == expRows, s"texts=$texts")
    }
  }

  test("dedup_substring_spans equals brute-force cross-doc 5-gram coverage (8 random corpora)") {
    samples(corpusGen, 8).foreach { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft_ssp").toString
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = graft.queries.QualityQueries
        .queries("dedup_substring_spans")(spark, dir)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val sets = texts.map(_.split(" ").sliding(5).map(_.mkString(" ")).toSet)
      sets.zipWithIndex.foreach { case (s0, i) =>
        val others = sets.zipWithIndex.filter(_._2 != i).map(_._1)
          .foldLeft(Set.empty[String])(_ ++ _)
        val nDup = s0.count(others.contains)
        assert(got(i.toLong) == (s0.size.toLong, nDup.toLong),
          s"doc $i texts=$texts")
      }
    }
  }
}
