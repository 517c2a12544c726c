package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}

import graft.operators.Components

/** Property checks for distributed connected components: the
  * pointer-doubling label propagation must reach exactly the union-find
  * fixpoint (component = min member id) on arbitrary graph shapes —
  * random sparse/dense graphs, self-loops, duplicate edges, and long
  * PATH graphs, where plain neighbor propagation would need O(diameter)
  * rounds and only the pointer jump's O(log n) convergence fits the
  * maxIter budget. */
object ComponentsProps extends Properties("ConnectedComponents") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10)

  /** Reference union-find (path compression, driver-side). */
  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root then relabel every vertex with its component's min id (the
    // min always wins the unions above, so the root IS the min)
    edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(v => v -> find(v)).toMap
  }

  private val genRandomGraph: Gen[List[(Long, Long)]] = for {
    nV <- Gen.choose(2, 40)
    nE <- Gen.choose(1, 60)
    es <- Gen.listOfN(nE, for {
      a <- Gen.choose(0L, nV.toLong - 1)
      b <- Gen.choose(0L, nV.toLong - 1) // self-loops allowed
    } yield (a, b))
  } yield es

  private val genChain: Gen[List[(Long, Long)]] = for {
    len <- Gen.choose(50, 200)
    shuffled <- Gen.const((0 until len).map(i => (i.toLong, i + 1L)).toList)
  } yield shuffled

  private def check(edges: List[(Long, Long)]): Prop = {
    import TestSpark.spark
    import spark.implicits._
    val got = Components.connectedComponents(
        edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(edges)
    Prop(got == want) :| s"got=$got want=$want"
  }

  property("== union-find on random graphs (self-loops, dup edges)") =
    Prop.forAll(genRandomGraph)(check)

  property("empty edge list yields an empty labeling (no NPE)") = {
    import TestSpark.spark
    import spark.implicits._
    Prop(Components.connectedComponents(
      List.empty[(Long, Long)].toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .count() == 0L)
  }

  property("== union-find on 200-long path graphs (needs the pointer jump)") =
    Prop.forAll(genChain)(check)
}
