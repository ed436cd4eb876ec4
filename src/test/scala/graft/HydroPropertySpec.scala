package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.HydroPipeline

// generated input shapes (schema-compatible with WaterML.timeSeries);
// top-level because Spark encoders can't reach inner classes of a suite
case class SiteCodeE(value: String)
case class GeogLocationE(srs: String, latitude: Double, longitude: Double)
case class GeoLocationE(geogLocation: GeogLocationE)
case class SourceInfoE(siteName: String, siteCode: Seq[SiteCodeE], geoLocation: GeoLocationE)
case class VarCodeE(value: String)
case class UnitE(unitAbbreviation: String)
case class VariableE(variableCode: Seq[VarCodeE], unit: UnitE, noDataValue: Double)
case class ObsE(value: String, dateTime: String)
case class ValuesE(value: Seq[ObsE])
case class TsE(name: String, sourceInfo: SourceInfoE, variable: VariableE, values: Seq[ValuesE])

// pre-projected Feature shapes for feeding mergeSites DIRECTLY,
// bypassing toFeatures' null-coalescing — the caller contract the
// ordKey's internal coalescing exists to protect
case class VarAttrE(variableCode: String, variableUnit: String,
                    noDataValue: String, value: String, timeStamp: String)
case class PropsE(record: String, id: String, site: String, srs: String,
                  siteCode: String, variables: Seq[VarAttrE])
case class GeomE(`type`: String, coordinates: Seq[Double])
case class FeatureE(`type`: String, geometry: GeomE, properties: PropsE)

/** Property-based invariants for the hydro pipeline (SURVEY.md §5.3)
  * over scalacheck-generated WaterML time series, plus the §5.2
  * end-to-end golden-file check. */
class HydroPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val genTs: Gen[TsE] = for {
    site <- Gen.oneOf((1 to 8).map(i => f"0$i%07d"))
    code <- Gen.oneOf("00060", "00065", "00010")
    lat <- Gen.chooseNum(25.0, 49.0)
    lon <- Gen.chooseNum(-125.0, -67.0)
    reading <- Gen.chooseNum(0, 99999)
    hasObs <- Gen.frequency(4 -> true, 1 -> false)
  } yield TsE(
    name = s"USGS:$site:$code:00000",
    sourceInfo = SourceInfoE(s"SITE $site", Seq(SiteCodeE(site)),
      GeoLocationE(GeogLocationE("EPSG:4326", lat, lon))),
    variable = VariableE(Seq(VarCodeE(code)), UnitE("u"), -999999.0),
    values = if (hasObs) Seq(ValuesE(Seq(ObsE(reading.toString, "2026-01-01T00:00:00Z"))))
             else Seq(ValuesE(Seq.empty)))

  private lazy val sample: Seq[TsE] =
    Gen.listOfN(120, genTs).pureApply(Gen.Parameters.default, Seed(42L))

  private def run(tss: Seq[TsE]) =
    HydroPipeline.mergeSites(HydroPipeline.toFeatures(tss.toDF()))

  test("invariant: exactly one merged row per site having any observed variable") {
    val merged = run(sample)
    val expected = sample
      .filter(_.values.head.value.nonEmpty)
      .map(_.sourceInfo.siteCode.head.value).distinct.size
    assert(merged.count() == expected)
    assert(merged.groupBy($"properties.siteCode").count().filter($"count" > 1).count() == 0)
  }

  test("invariant: every observed 00060 series surfaces as non-null streamFlow") {
    val merged = run(sample)
    val sitesWithFlow = sample
      .filter(t => t.variable.variableCode.head.value == "00060" && t.values.head.value.nonEmpty)
      .map(_.sourceInfo.siteCode.head.value).toSet
    val got = merged.filter($"properties.streamFlow".isNotNull)
      .select($"properties.siteCode").collect().map(_.getString(0)).toSet
    assert(got == sitesWithFlow)
  }

  test("invariant: coordinates are [lon, lat] doubles in range") {
    val coords = HydroPipeline.toFeatures(sample.toDF())
      .select($"geometry.coordinates").collect().map(_.getSeq[Double](0))
    assert(coords.forall(c => c.length == 2 &&
      c.head >= -125.0 && c.head <= -67.0 && c(1) >= 25.0 && c(1) <= 49.0))
  }

  test("invariant: pipeline output is invariant under input permutation") {
    val base = run(sample).select($"properties.siteCode", to_json($"properties"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Seq(1, 7).foreach { s =>
      val shuffled = new scala.util.Random(s).shuffle(sample)
      val got = run(shuffled).select($"properties.siteCode", to_json($"properties"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == base, s"permutation seed $s changed output")
    }
  }

  test("regression: redelivered series with revised metadata merges order-independently") {
    // the round-11 ordKey fix, pinned: a feed redelivers a series with
    // IDENTICAL (id, value, timeStamp) — the whole key head — and only
    // a revised variableUnit (resp. noDataValue). Those fields live in
    // the xxhash64 metadata tail; remove them from the tail and the
    // two rows tie on ord_key, min_by degrades to encounter order, and
    // reversing the delivery flips the winner — failing this test.
    def ts(unit: String, noData: Double) = TsE(
      name = "USGS:00000001:00060:00000",
      sourceInfo = SourceInfoE("SITE 1", Seq(SiteCodeE("00000001")),
        GeoLocationE(GeogLocationE("EPSG:4326", 40.0, -100.0))),
      variable = VariableE(Seq(VarCodeE("00060")), UnitE(unit), noData),
      values = Seq(ValuesE(Seq(ObsE("42", "2026-01-01T00:00:00Z")))))
    Seq(
      ("revised unit", ts("ft3/s", -999999.0), ts("m3/s", -999999.0)),
      ("revised noDataValue", ts("ft3/s", -999999.0), ts("ft3/s", -888888.0))
    ).foreach { case (label, a, b) =>
      val fwd = run(Seq(a, b)).select(to_json($"properties")).head().getString(0)
      val rev = run(Seq(b, a)).select(to_json($"properties")).head().getString(0)
      assert(fwd == rev, s"$label: winner depends on delivery order")
    }
  }

  test("regression: null-position metadata twins merge order-independently without upstream coalescing") {
    // the round-13 ordKey fix, pinned: two features share the whole
    // key head and their metadata differs ONLY in which of two fields
    // is null — with EQUAL non-null values in swapped positions. A
    // hash tail that skips null children collapses both to one key
    // (tie → encounter order → the winner flips with delivery order);
    // the per-field NUL coalescing keeps the keys distinct. These
    // features go straight into mergeSites, NOT through toFeatures,
    // because toFeatures' own undef() coalescing would mask the gap.
    def feat(site: String, srs: String) = FeatureE("Feature",
      GeomE("Point", Seq(-100.0, 40.0)),
      PropsE("usgs-water", "USGS:00000001:00060:00000", site, srs,
        "00000001",
        Seq(VarAttrE("00060", "ft3/s", "-999999", "42",
          "2026-01-01T00:00:00Z"))))
    val a = feat(null, "EPSG:4326")
    val b = feat("EPSG:4326", null)
    def outOf(fs: Seq[FeatureE]) = HydroPipeline.mergeSites(fs.toDF())
      .select(to_json(struct($"geometry", $"properties"))).head().getString(0)
    assert(outOf(Seq(a, b)) == outOf(Seq(b, a)),
      "winner depends on delivery order when metadata nulls swap positions")
  }

  test("golden: fixture corpus end-to-end matches the checked-in FeatureCollection") {
    val got = HydroPipeline.run(spark, "src/test/resources/waterml")
      .select(to_json(struct(lit("FeatureCollection").as("type"), col("data"))))
      .head().getString(0)
    val golden = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/waterml_golden.json"))).trim
    assert(got == golden)
  }
}
