package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class DsuSpec extends AnyFunSuite {
  test("union-find groups ids sharing keys (pipes/group_advisories.py:182-245)") {
    val members = Seq(
      1L -> Seq("CVE-1", "GHSA-a"),
      2L -> Seq("CVE-1"),            // shares CVE-1 with 1
      3L -> Seq("GHSA-a", "CVE-9"),  // shares GHSA-a with 1
      4L -> Seq("CVE-2"),            // isolated group
      5L -> Seq("CVE-9"),            // chains to 3 → 1
      6L -> Seq.empty)               // no keys: own group
    val roots = ConnectedComponents.dsu(members)
    assert(roots(1L) == 1L && roots(2L) == 1L && roots(3L) == 1L && roots(5L) == 1L)
    assert(roots(4L) == 4L)
    assert(roots(6L) == 6L)
  }

  test("chain unions collapse to min id") {
    val members = (1L to 10L).map(i => i -> Seq(s"k$i", s"k${i + 1}"))
    val roots = ConnectedComponents.dsu(members)
    assert(roots.values.toSet == Set(1L))
  }
}

class LabelPropagationSpec extends AnyFunSuite with SparkTestSession {
  test("components over chain + star + isolated") {
    import spark.implicits._
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("src", "dst")
    val cc = ConnectedComponents.labelPropagation(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
  }

  test("distributed loop path (finishThreshold = 0) matches the fast path") {
    import spark.implicits._
    // a longer chain (diameter 8) + hub + pair; threshold 0 disables the
    // round-0 collect AND the bounded local finish until the contracted
    // graph is empty, so the iterative neighbor-min/pointer-jump rounds
    // themselves must converge
    val edges = (
      (1L to 8L).map(i => (i, i + 1)) ++
        Seq((100L, 101L), (100L, 102L), (100L, 103L), (100L, 104L)) ++
        Seq((200L, 201L))).toDF("src", "dst")
    val slow = ConnectedComponents
      .labelPropagation(spark, edges, finishThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = ConnectedComponents.labelPropagation(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slow == fast)
    assert((1L to 9L).forall(slow(_) == 1L))
    assert(Seq(100L, 101L, 102L, 103L, 104L).forall(slow(_) == 100L))
  }
}
