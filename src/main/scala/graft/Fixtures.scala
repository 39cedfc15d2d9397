package graft

/** Locates the checked-in driver-gate fixtures (`fixtures/` at the repo
  * root) without baking one machine's checkout path into the gate.
  *
  * Resolution order: `GRAFT_FIXTURES_DIR` env var, `graft.fixtures.dir`
  * system property, then `fixtures/` under the current working directory
  * (sbt runs from the repo root, so this is the repo's `fixtures/`).
  * The result is absolutized once at class-load so the SAME string lands
  * in both the Spark readers and the generated DuckDB oracle SQL — the
  * two sides of the correctness gate can never disagree on the path.
  */
object Fixtures {
  val dir: String =
    sys.env.get("GRAFT_FIXTURES_DIR")
      .orElse(sys.props.get("graft.fixtures.dir"))
      .getOrElse(new java.io.File("fixtures").getAbsolutePath)
}
