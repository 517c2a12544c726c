package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The SQL-registered function surface (GraftExtensions →
  * GraftFunctions): every graft_* name callable from spark.sql must
  * agree with the Column API, like the reference's
  * createTemporaryFunction'd UDFs agree with their Java classes. */
class SqlFunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("SQL path and Column path produce identical results for the text functions") {
    import spark.implicits._
    val df = Seq(
      ("[jira] [Created] (FLINK-321) T", "\"A B (Jira)\" <jira@apache.org>", "bob@example.com",
        "flink-core/src/main/java/X.java"),
      ("Re: AW: hello", "someone@x.org", "no-at-sign", "LICENSE")
    ).toDF("subject", "from_raw", "email", "path")
    df.createOrReplaceTempView("t")

    val sql = spark.sql(
      """SELECT graft_source_component(path) c, graft_email_thread(subject) th,
        |  graft_jira_ticket_action(subject) a, graft_jira_ticket_number(subject) n,
        |  graft_jira_ticket_from(from_raw) f, graft_is_jira_ticket(from_raw) i,
        |  graft_obfuscate(email) o
        |FROM t""".stripMargin).collect()
    val col0 = df.select(
      TextFunctions.sourceComponent(col("path")).as("c"),
      TextFunctions.normalizeEmailThread(col("subject")).as("th"),
      TextFunctions.jiraTicketAction(col("subject")).as("a"),
      TextFunctions.jiraTicketNumber(col("subject")).as("n"),
      TextFunctions.jiraTicketFrom(col("from_raw")).as("f"),
      TextFunctions.isJiraTicket(col("from_raw")).as("i"),
      TextFunctions.obfuscate(col("email")).as("o")).collect()
    assert(sql.toSeq == col0.toSeq)
  }

  test("graft_components_split is bracket-aware from SQL") {
    val got = spark.sql(
      "SELECT graft_components_split('Formats (JSON, Avro), API / Python') s")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("Formats (JSON, Avro)", "API / Python"))
  }

  test("graft_cosine: codegen result matches interpreted eval and the HOF composition") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vv")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) c FROM vv").collect()(0).getDouble(0)
    val viaHof = df.select(
      graft.functions.Similarity.cosine(col("a"), col("b")).as("c")).collect()(0).getDouble(0)
    assert(viaSql == viaHof, s"codegen $viaSql != HOF $viaHof")
    // interpreted path (constant folding disabled by non-foldable input is
    // hard to force; evaluate the expression directly instead)
    val e = graft.plans.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f, 2.0f, 3.0f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(3.0f, 2.0f, 1.0f)))
    assert(e.eval(null).asInstanceOf[Double] == viaSql)
  }

  test("graft_cosine null/mismatch/zero-norm semantics") {
    val r = spark.sql(
      """SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) a,
        |       graft_cosine(array(1.0F), array(1.0F, 2.0F)) b,
        |       graft_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)) c""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.isNullAt(2), "zero-norm must be NULL, never NaN")
    // interpreted path agrees
    val e = graft.plans.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(0.0f, 0.0f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f, 2.0f)))
    assert(e.eval(null) == null)
  }

  test("graft_array_agg is generic over element types and skips nulls") {
    import spark.implicits._
    Seq((1, Option("a"), Option(10)), (1, None, None), (1, Option("b"), Option(5)),
      (2, None, Option(7)))
      .toDF("k", "s", "n").createOrReplaceTempView("ma")
    val r = spark.sql(
      """SELECT k, sort_array(graft_array_agg(s)) ss, sort_array(graft_array_agg(n)) ns
        |FROM ma GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r(0).getSeq[String](1) == Seq("a", "b"))   // strings, null skipped
    assert(r(0).getSeq[Int](2) == Seq(5, 10))         // ints — same registration
    assert(r(1).getSeq[String](1).isEmpty)
    assert(r(1).getSeq[Int](2) == Seq(7))
  }

  test("graft_last_non_null orders by its 2nd argument and ignores null values") {
    import spark.implicits._
    Seq((1, Option("a"), 10), (1, None, 20), (1, Option("b"), 5), (2, Option.empty[String], 1))
      .toDF("k", "v", "t").createOrReplaceTempView("ln")
    val r = spark.sql("SELECT k, graft_last_non_null(v, t) lv FROM ln GROUP BY k ORDER BY k")
      .collect()
    assert(r(0).getString(1) == "a", "latest NON-NULL is (a, t=10); the null at t=20 must not win")
    assert(r(1).isNullAt(1))
  }

  test("graft_expand_components emits one row per component, zero rows when absent") {
    import spark.implicits._
    Seq(
      (1, "x\n" + (" " * 10) + "Components: Formats (JSON, Avro), API / Python"),
      (2, "no components line")).toDF("id", "body").createOrReplaceTempView("ec")
    val r = spark.sql("SELECT id, graft_expand_components(body) c FROM ec").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "Formats (JSON, Avro)"), (1, "API / Python")))
  }

  test("graft_* functions report wrong arity cleanly") {
    val ex = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0F))"))
    assert(ex.getMessage.contains("requires 2 argument"), ex.getMessage)
  }

  test("ANN: IVF top-k within the probed cell matches brute force restricted to that cell") {
    import graft.sources.Tables
    val emb = Tables(spark, sfDir).embeddings
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("label").as("cell"), col("vec_id").as("corpus_id"), col("embedding").as("ce"))
    val ivf = operators.Ann.ivfTopK(queries, corpus, k = 10, nprobe = 1)
      .select("query_id", "cell", "corpus_id", "rnk").collect()
    assert(ivf.nonEmpty)
    val cellOf = ivf.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getInt(1)).toSet }
    // nprobe=1 → every result row of a query comes from one cell
    assert(cellOf.values.forall(_.size == 1))
    val brute = operators.Ann.bruteForceTopK(queries, corpus.drop("cell"), k = 200)
    val bruteRanked = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // IVF's top hit for each query must appear in the brute-force ranking
    val top1 = ivf.filter(_.getInt(3) == 1).map(r => (r.getLong(0), r.getLong(2)))
    assert(top1.forall(bruteRanked.contains))
  }
}
