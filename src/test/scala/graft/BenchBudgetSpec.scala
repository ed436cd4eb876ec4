package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.loadBudget against the two HISTORICAL silent-exemption
  * bugs (r19: a strict `"sf":"` regex missed python json.dump's
  * `"sf": "..."` whitespace; r20 ADVICE: the lastIndexOf string scan
  * broke on key reordering / nesting) and the fail-LOUD contract that
  * replaced them: a budget file that exists but yields zero budgets
  * must be distinguishable from "no budget file" — main() emits
  * budget_loaded from this map's size.
  *
  * No SparkSession needed — the loader is pure file parsing. */
class BenchBudgetSpec extends AnyFunSuite {

  private val SF = "/root/testdata/sf0.1"

  private def write(content: String): String = {
    val f = Files.createTempFile("budget", ".json")
    Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("python json.dump formatting (indent + spaces) loads every row") {
    // the exact shape tools/make_bench_budget.py writes — the r19
    // regex parser silently exempted every query on this
    val p = write(
      s"""{
         | "sf": "$SF",
         | "source": "bench_ref_clean.json",
         | "rule": "2x clean-box median per query",
         | "n": 2,
         | "budgets": {
         |  "q01_agg_pricing": 0.5,
         |  "q46_sim_ivf": 4.273
         | }
         |}""".stripMargin)
    val b = Bench.loadBudget(p, SF)
    assert(b == Map("q01_agg_pricing" -> 0.5, "q46_sim_ivf" -> 4.273))
  }

  test("key order, compact formatting, and extra fields don't matter") {
    // the string-scan parser anchored on lastIndexOf("budgets") and
    // the FIRST closing brace — reordering or nesting broke it
    val p = write(
      s"""{"budgets":{"qa":1.25,"qb":0.001},"extra":{"nested":{"x":1}},"sf":"$SF"}""")
    assert(Bench.loadBudget(p, SF) == Map("qa" -> 1.25, "qb" -> 0.001))
  }

  test("sf mismatch exempts everything (ceilings only mean anything at their own scale)") {
    val p = write(s"""{"sf":"/root/testdata/sf0.01","budgets":{"qa":1.0}}""")
    assert(Bench.loadBudget(p, SF).isEmpty)
  }

  test("missing file, malformed json, and non-numeric rows fail open but never throw") {
    assert(Bench.loadBudget("/nonexistent/budget.json", SF).isEmpty)
    val malformed = write("""{"sf": not json at all""")
    assert(Bench.loadBudget(malformed, SF).isEmpty)
    val mixed = write(
      s"""{"sf":"$SF","budgets":{"qa":1.5,"qbad":"not-a-number","qc":2.0}}""")
    assert(Bench.loadBudget(mixed, SF) == Map("qa" -> 1.5, "qc" -> 2.0))
  }

  test("loadRef accepts BOTH reference formats: the bench detail line and json.dump") {
    // r21 found the median_ratio_vs_ref self-check silently dead: the
    // r20 box_era refresh rewrote bench_ref_clean.json via python
    // json.dump ("sf": "..." with a space) and Bench's regex required
    // the compact form — every run since read -1 "reference
    // unavailable" (the budget parser's historical fails-open mode,
    // third instance). Pin both formats.
    val compact = write(
      s"""{"metric":"total","value":220.0,"sf":"$SF","queries":{"qa":1.5,"qb":0.25}}""")
    assert(Bench.loadRef(compact, SF) == Map("qa" -> 1.5, "qb" -> 0.25))
    val dumped = write(
      s"""{
         | "metric": "total",
         | "sf": "$SF",
         | "queries": {
         |  "qa": 1.5,
         |  "qb": 0.25
         | }
         |}""".stripMargin)
    assert(Bench.loadRef(dumped, SF) == Map("qa" -> 1.5, "qb" -> 0.25))
  }

  test("loadRef: sf mismatch, missing file, malformed json all degrade to no-reference") {
    val p = write(s"""{"sf":"/root/testdata/sf0.01","queries":{"qa":1.0}}""")
    assert(Bench.loadRef(p, SF).isEmpty)
    assert(Bench.loadRef("/nonexistent/ref.json", SF).isEmpty)
    assert(Bench.loadRef(write("{broken"), SF).isEmpty)
  }

  test("the COMMITTED bench_ref_clean.json is loadable by the self-check at its own sf") {
    // the regression that motivated loadRef: the committed artifact
    // must actually parse, whatever tool last wrote it
    val ref = Bench.loadRef("bench_ref_clean.json", SF)
    assert(ref.size >= 200, s"committed reference yields only ${ref.size} query rows")
  }

  test("the committed bench_budget.json parses, matches its sf, and covers the registry") {
    val b = Bench.loadBudget("bench_budget.json", SF)
    assert(b.size == SparkEntry.queries.size,
      s"committed budget rows (${b.size}) != registry size (${SparkEntry.queries.size})")
    assert(SparkEntry.queries.keySet.subsetOf(b.keySet),
      s"registry queries missing budget rows: ${SparkEntry.queries.keySet -- b.keySet}")
    assert(b.values.forall(v => v > 0 && v < 60), "budget ceilings sane (0, 60s)")
  }
}
