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

  test("ray casting: non-convex ring with hole via GeoJSON") {
    // L-shape: (0,0)-(40,0)-(40,20)-(20,20)-(20,40)-(0,40); hole 5..15²
    val js = """{"type":"Polygon","coordinates":[
               | [[0,0],[40,0],[40,20],[20,20],[20,40],[0,40],[0,0]],
               | [[5,5],[15,5],[15,15],[5,15],[5,5]]
               |]}""".stripMargin
    val pts = Seq(
      (30L, 10L, true),   // in the L's foot
      (10L, 30L, true),   // in the L's upright
      (30L, 30L, false),  // in the notch (outside, convex hull would say in)
      (10L, 10L, false),  // inside the hole
      (3L, 10L, true),    // between hole and boundary
      (50L, 10L, false))  // fully outside
    val df = pts.map(p => (p._1, p._2)).toDF("x", "y")
    val got = df.filter(withinGeoJson($"x", $"y", js))
      .as[(Long, Long)].collect().toSet
    assert(got == pts.filter(_._3).map(p => (p._1, p._2)).toSet)
    // MultiPolygon = union of members
    val mp = """{"type":"MultiPolygon","coordinates":[
               | [[[0,0],[10,0],[10,10],[0,10],[0,0]]],
               | [[[20,20],[30,20],[30,30],[20,30],[20,20]]]
               |]}""".stripMargin
    val got2 = Seq((5L, 5L), (25L, 25L), (15L, 15L)).toDF("x", "y")
      .filter(withinGeoJson($"x", $"y", mp)).as[(Long, Long)].collect().toSet
    assert(got2 == Set((5L, 5L), (25L, 25L)))
  }
}
