package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame

/** Golden-file comparison harness — the reference's dominant test pattern
  * (check_results_against_json + VULNERABLECODE_REGEN_TEST_FIXTURES,
  * vulnerabilities/tests/util_tests.py:24-60).
  *
  * `check(name, df)` canonicalizes the DataFrame to sorted JSON lines and
  * compares against src/test/resources/expected/<name>.json. Set
  * GRAFT_REGEN=1 to (re)write the expected files instead of asserting.
  */
object GoldenFiles {

  private val expectedDir: Path =
    Paths.get(sys.env.getOrElse("GRAFT_EXPECTED_DIR",
      "src/test/resources/expected"))

  val regen: Boolean = sys.env.get("GRAFT_REGEN").contains("1")

  /** Canonical serialization: toJSON rows sorted lexically (column order
    * inside a row follows the schema; row order is made deterministic by
    * the sort). */
  def canonicalize(df: DataFrame): Seq[String] =
    df.toJSON.collect().toSeq.sorted

  def check(name: String, df: DataFrame): Unit = {
    val got = canonicalize(df)
    val path = expectedDir.resolve(s"$name.json")
    if (regen) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, got.mkString("\n") + "\n")
    } else {
      assert(Files.exists(path),
        s"missing golden file $path — run with GRAFT_REGEN=1 to create")
      val want = Files.readString(path).split("\n").toSeq.filter(_.nonEmpty)
      if (got != want) {
        val diff = (want.diff(got).map("- " + _) ++ got.diff(want).map("+ " + _))
          .take(10).mkString("\n")
        throw new AssertionError(
          s"golden mismatch for $name (want ${want.size} rows, got ${got.size}):\n$diff")
      }
    }
  }
}
