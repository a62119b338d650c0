package graft.graph

import java.sql.Timestamp

import graft.SparkSpec

class GraphStoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def g = {
    import spark.implicits._
    val entities = Seq(
      Entity("a", "alice", "person", Map.empty),
      Entity("b", "bob", "person", Map.empty),
      Entity("c", "carol", "person", Map.empty),
      Entity("d", "dave", "person", Map.empty),
      Entity("e", "eve", "person", Map.empty)).toDS()
    // a—b—c—d chain, plus an expired a—e edge.
    val rels = Seq(
      Relationship("r1", "a", "b", "knows", 1.0, Some(ts("2024-01-01 00:00:00")), None),
      Relationship("r2", "b", "c", "knows", 1.0, Some(ts("2024-01-01 00:00:00")), None),
      Relationship("r3", "c", "d", "knows", 1.0, Some(ts("2024-01-01 00:00:00")), None),
      Relationship("r4", "a", "e", "knows", 1.0,
        Some(ts("2023-01-01 00:00:00")), Some(ts("2023-06-01 00:00:00")))).toDS()
    new GraphStore(entities, rels)
  }

  test("as-of filter keeps only relationships valid at T") {
    val live = g.asOf(ts("2024-02-01 00:00:00")).collect().map(_.id).toSet
    assert(live == Set("r1", "r2", "r3"))
    val past = g.asOf(ts("2023-03-01 00:00:00")).collect().map(_.id).toSet
    assert(past == Set("r4"))
  }

  test("bfs respects max hops and records minimum hop") {
    val hops = g.bfs(Seq("a"), maxHops = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hops == Map("a" -> 0, "b" -> 1, "e" -> 1, "c" -> 2))
    val all = g.bfs(Seq("a"), maxHops = 3).collect()
      .map(r => r.getString(0)).toSet
    assert(all == Set("a", "b", "c", "d", "e"))
  }

  test("bfsPaths records the traversal path per reached entity") {
    val paths = g.bfsPaths(Seq("a"), maxHops = 3).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(paths("a") == Seq("a"))
    assert(paths("b") == Seq("a", "b"))
    assert(paths("c") == Seq("a", "b", "c"))
    assert(paths("d") == Seq("a", "b", "c", "d"))
    assert(paths("e") == Seq("a", "e"))
  }

  test("bfsPaths picks one deterministic shortest path on diamonds") {
    import spark.implicits._
    // a→b→d and a→c→d: both 2 hops; the lexicographically smaller
    // path (through b) must win.
    val rels = Seq(
      Relationship("x1", "a", "b", "knows", 1.0, None, None),
      Relationship("x2", "a", "c", "knows", 1.0, None, None),
      Relationship("x3", "b", "d", "knows", 1.0, None, None),
      Relationship("x4", "c", "d", "knows", 1.0, None, None)).toDS()
    val paths = new GraphStore(g.entities, rels).bfsPaths(Seq("a"), maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(paths("d") == Seq("a", "b", "d"))
  }

  test("query finds seeds by name pattern and annotates reachability") {
    val out = g.query("^ali", maxHops = 1).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSet == Set(("a", 0, "alice"), ("b", 1, "bob"), ("e", 1, "eve")))
  }

  test("bfsFrom seeds the frontier from a DataFrame without a collect") {
    import spark.implicits._
    val seeds = Seq("a", "a", "d").toDF("entity_id") // dup seed must not double-visit
    val hops = g.bfsFrom(seeds, maxHops = 1, None).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hops == Map("a" -> 0, "d" -> 0, "b" -> 1, "e" -> 1, "c" -> 1))
  }

  test("query with a pattern matching nothing returns an empty frame") {
    assert(g.query("no-such-entity", maxHops = 2).collect().isEmpty)
  }

  test("latestPerEdge keeps the newest version of a duplicated edge") {
    import spark.implicits._
    val rels = Seq(
      Relationship("old", "a", "b", "knows", 1.0, Some(ts("2023-01-01 00:00:00")), None),
      Relationship("new", "a", "b", "knows", 1.0, Some(ts("2024-01-01 00:00:00")), None)).toDS()
    val gs = new GraphStore(g.entities, rels)
    assert(gs.latestPerEdge().collect().map(_.getAs[String]("id")).toSeq == Seq("new"))
  }
}
