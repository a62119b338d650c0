package graft.workflow

import java.sql.Timestamp

import graft.SparkSpec

class CheckpointsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def cps = {
    import spark.implicits._
    Seq(
      Checkpoint("c1", "run1", "n1", "main", 1L, None, """{"x":1}""", ts("2024-01-01 00:00:00")),
      Checkpoint("c2", "run1", "n2", "main", 2L, Some("c1"), """{"x":2}""", ts("2024-01-01 01:00:00")),
      Checkpoint("c3", "run1", "n2", "alt", 1L, Some("c1"), """{"x":9}""", ts("2024-01-01 01:00:00")),
      Checkpoint("c4", "run2", "n1", "main", 1L, None, """{"y":1}""", ts("2024-01-02 00:00:00"))).toDS()
  }

  test("latest per (run, branch)") {
    val latest = Checkpoints.latest(cps).collect()
      .map(r => (r.getAs[String]("runId"), r.getAs[String]("branchId")) -> r.getAs[String]("id"))
      .toMap
    assert(latest == Map(("run1", "main") -> "c2", ("run1", "alt") -> "c3", ("run2", "main") -> "c4"))
  }

  test("parent chain walks back to the root") {
    assert(Checkpoints.parentChain(cps, "c2").map(_.id) == Seq("c2", "c1"))
    assert(Checkpoints.parentChain(cps, "c4").map(_.id) == Seq("c4"))
    assert(Checkpoints.parentChain(cps, "nope").isEmpty)
  }

  test("state hash is deterministic sha256 of the state") {
    val hashed = Checkpoints.withStateHash(cps.toDF())
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("state_hash")).toMap
    assert(hashed("c1") ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("""{"x":1}""".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("branch states merge key-wise with named reducers") {
    import spark.implicits._
    val states = Seq(
      ("b1", "counter", "5", 1L), ("b2", "counter", "7", 2L),
      ("b1", "last_log", "first", 1L), ("b2", "last_log", "second", 2L),
      ("b1", "other", "x", 1L)).toDF("branch", "key", "value", "seq")
    val merged = Checkpoints.mergeBranchStates(
      states, Map("counter" -> "sum", "last_log" -> "last_value"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Integral results render like the reference's int reducers — "12",
    // never "12.0".
    assert(merged("counter") == "12")
    assert(merged("last_log") == "second")
    assert(merged("other") == "x")
  }

  test("numeric reducers render integral results without .0, fractional as-is") {
    import spark.implicits._
    val states = Seq(
      ("b1", "int_max", "10", 1L), ("b2", "int_max", "3", 2L),
      ("b1", "frac_sum", "1.5", 1L), ("b2", "frac_sum", "2.25", 2L),
      ("b1", "no_nums", "abc", 1L), ("b2", "no_nums", "def", 2L)).toDF("branch", "key", "value", "seq")
    val merged = Checkpoints.mergeBranchStates(
      states, Map("int_max" -> "max", "frac_sum" -> "sum", "no_nums" -> "sum"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged("int_max") == "10") // not "10.0"; numeric compare, not lexicographic
    assert(merged("frac_sum") == "3.75")
    assert(merged("no_nums") == "0") // reference SumReducer's int-0 accumulator
  }

  test("rendering is type-preserving: float-syntax inputs keep their .0") {
    import spark.implicits._
    val states = Seq(
      // float("10.0") is the max → Python renders "10.0", not "10".
      ("b1", "float_max", "10.0", 1L), ("b2", "float_max", "3", 2L),
      // int 10 beats float 3.5 → the WINNER's syntax renders: "10".
      ("b1", "mixed_max", "10", 1L), ("b2", "mixed_max", "3.5", 2L),
      // int + float = float in Python, even when the sum is integral.
      ("b1", "mixed_sum", "1.5", 1L), ("b2", "mixed_sum", "2.5", 2L),
      // tie between "2" (seq 1) and "2.0" (seq 2): first arrival wins.
      ("b1", "tie_min", "2", 1L), ("b2", "tie_min", "2.0", 2L)
    ).toDF("branch", "key", "value", "seq")
    val merged = Checkpoints.mergeBranchStates(
      states, Map("float_max" -> "max", "mixed_max" -> "max",
        "mixed_sum" -> "sum", "tie_min" -> "min"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged("float_max") == "10.0")
    assert(merged("mixed_max") == "10")
    assert(merged("mixed_sum") == "4.0")
    assert(merged("tie_min") == "2")
  }

  test("integral rendering is magnitude-guarded: past 2^53 no long is fabricated") {
    import spark.implicits._
    val states = Seq(
      // 2^53 - 1: the largest integral a double can still certify.
      ("b1", "in_range", "9007199254740991", 1L),
      // 2^53 itself is ambiguous (reachable from 2^53 AND 2^53 + 1 —
      // "9007199254740993" casts to the same double) — the guard routes
      // to the double rendering instead of printing a long the input
      // may never have been. The documented domain is (-2^53, 2^53).
      ("b1", "at_2p53", "9007199254740993", 1L),
      ("b1", "huge", "123456789012345678901234567890", 1L)
    ).toDF("branch", "key", "value", "seq")
    val merged = Checkpoints.mergeBranchStates(
      states, Map("in_range" -> "max", "at_2p53" -> "max", "huge" -> "max"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged("in_range") == "9007199254740991")
    // Both out-of-domain results render as the double they became —
    // visibly lossy (scientific notation), never a silently wrong long.
    assert(merged("at_2p53") == "9.007199254740992E15")
    assert(merged("huge") == "1.2345678901234568E29")
  }
}
