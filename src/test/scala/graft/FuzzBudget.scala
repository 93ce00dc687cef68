package graft

/** The one fuzz-budget knob (round-12 convention), validated in one
  * place. `GRAFT_FUZZ_SCALE` multiplies every per-target case count in
  * CodecFuzzSpec and DbcFuzzSpec; an unvalidated `.toInt` let 0 or a
  * negative value zero all the counts so the whole tier passed having
  * executed NOTHING, and a non-numeric value crashed with a bare
  * NumberFormatException. Both now fail by name before any test runs.
  */
object FuzzBudget {
  val scale: Int = {
    val raw = sys.env.getOrElse("GRAFT_FUZZ_SCALE", "1")
    val v =
      try raw.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"GRAFT_FUZZ_SCALE must be a positive integer, got '$raw'")
      }
    require(v >= 1, s"GRAFT_FUZZ_SCALE must be >= 1, got $v")
    v
  }
}
