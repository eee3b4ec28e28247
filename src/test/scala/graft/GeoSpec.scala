package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoFunctions._

/** Haversine sanity on known city pairs (the spherical path is not in the
  * hash-compared oracle surface; see GeoFunctions).
  */
class GeoSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("haversine matches known distances within 0.5%") {
    // (lat1, lon1, lat2, lon2, expected km)
    val cases = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278, 343.5),   // Paris–London
      (40.7128, -74.0060, 34.0522, -118.2437, 3935.7), // NYC–LA
      (0.0, 0.0, 0.0, 90.0, 10007.5))               // quarter equator
    val df = cases.toDF("lat1", "lon1", "lat2", "lon2", "expected")
    val got = df.select(
      haversineKm($"lat1", $"lon1", $"lat2", $"lon2").as("km"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (km, exp) =>
      assert(math.abs(km - exp) / exp < 0.005, s"$km vs $exp")
    }
  }

  test("planar predicates: boundary points count as inside") {
    val df = Seq((0L, 0L), (7200L, 0L), (3600L, 3400L), (3600L, -1L))
      .toDF("x", "y")
    val in = df.filter(pointInConvexPoly($"x", $"y",
      Seq((0L, 0L), (7200L, 0L), (3600L, 3400L)))).count()
    assert(in == 3) // the three vertices yes, the outside point no
  }
}
