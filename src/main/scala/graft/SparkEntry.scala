package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plan.{FieldOrdering, MappingNode, Translator}
import graft.plan.MappingNode.{Constant, Message, Scalar}
import graft.ext.{Dedup, TextAnalysis}
import graft.functions.VectorFunctions

/** Driver contract — declared queries (SURVEY.md §2.11) + DuckDB oracles.
  *
  * Conventions shared by every query/oracle pair (the driver hash-compares
  * after sorting columns by NAME, so names must match exactly on both sides):
  *  - every aggregate/computed column is aliased identically in Spark and SQL
  *  - every query ends with an ORDER BY on a unique key
  *  - timestamps are rendered as formatted strings (engine-portable hashing;
  *    also faithful to the reference, where dates are GAQL ISO strings —
  *    SURVEY §2.8)
  *  - double SUMs over many rows go through DECIMAL(18,6) so the result is
  *    addition-order independent (Spark partial aggregation vs DuckDB
  *    sequential scan would otherwise diverge in the last float bits)
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape of the reference's production query
    * (CampaignCriterionStructureReport.scala:48-51): filter + nested
    * projection + lifted ids + metadata struct.
    */
  def entry(spark: SparkSession): DataFrame =
    q09FieldOrdering(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- shaping
  // The reference consumes an already-nested proto row; the testdata is flat
  // TPC-H. Each query first shapes a nested frame (the "descriptor"), then
  // exercises the library on it.

  /** customer rows nested as customer{custkey, mktsegment, name} + acctbal. */
  private def nestedCustomer(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      struct(
        col("c_custkey").as("custkey"),
        col("c_name").as("name"),
        col("c_mktsegment").as("mktsegment")
      ).as("customer"),
      col("c_acctbal"))

  /** orders with an info{} struct and sibling columns to prune. */
  private def nestedOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      struct(
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("orderdate"),
        col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("totalprice")
      ).as("info"),
      col("o_custkey"))

  private def metadataNode(downloadDate: String): (String, MappingNode) =
    "metadata" -> Message("metadata", Seq(
      "author"        -> Constant(StringType, "Ben"),
      "download_date" -> Constant(StringType, downloadDate),
      "report_date"   -> Scalar("report_date_src")
    ))

  private val DownloadDate = "2026-08-12" // fixed literal — never now()

  // ---------------------------------------------------------------- queries

  /** DQ1 (P1): path projection — keep exactly customer.{custkey,name},
    * pruning mktsegment inside the struct and acctbal beside it. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Translator(List("customer.custkey", "customer.name"))(nestedCustomer(s, dir))
      .orderBy(col("customer.custkey"))

  /** DQ2 (P1/P2): a path ending at a struct keeps the whole subtree. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Translator(List("o_orderkey", "info"))(nestedOrders(s, dir))
      .orderBy("o_orderkey")

  /** DQ3 (P4): scalar flattening — lift customer.custkey to top level. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Translator(
      List("customer.custkey", "customer.name"),
      userDefinedMappings = List("customer_id" -> Scalar("customer.custkey"))
    )(nestedCustomer(s, dir)).orderBy("customer_id")

  /** DQ4 (P5): constant columns (mirrors ProtoToAvroMappingTest.scala:61-62). */
  private def q04(s: SparkSession, dir: String): DataFrame =
    Translator(
      List("n_nationkey", "n_name"),
      userDefinedMappings = List(
        "author"   -> Constant(StringType, "Ben"),
        "test_run" -> Constant(IntegerType, 1))
    )(t(s, dir, "nation")).orderBy("n_nationkey")

  /** DQ5 (P6): struct construction from constants + a lifted column
    * (mirrors Main.scala:175-185). */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val shaped = t(s, dir, "orders").select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("report_date_src"))
    Translator(List("o_orderkey"), userDefinedMappings = List(metadataNode(DownloadDate)))(shaped)
      .orderBy("o_orderkey")
  }

  /** DQ6 (P7): the GAQL WHERE shape — date BETWEEN + numeric comparison
    * (CampaignCriterionStructureReport.scala:49-51). Both predicates push
    * down to the parquet scan. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1996-02-01"))
        && col("l_quantity") > 0)
      .transform(Translator(List("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")).apply)
      .orderBy("l_orderkey", "l_linenumber")

  /** DQ7 (P8): proto null/default semantics — empty string → null,
    * unset numeric → zero-default. */
  private def q07(s: SparkSession, dir: String): DataFrame =
    Translator(List("event_id", "props", "value"))(t(s, dir, "events"))
      .orderBy("event_id")

  /** DQ8 (P9): enum-as-symbol-string passthrough. */
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_orderstatus").distinct().orderBy("o_orderstatus")

  /** DQ9 (O1/O2): id-first / metadata-last top-level ordering
    * (Main.scala:148-168) over lifted ids + metadata struct. */
  private def q09FieldOrdering(s: SparkSession, dir: String): DataFrame = {
    val shaped = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("report_date_src"))
    Translator(
      List("o_totalprice"),
      userDefinedMappings = List(
        "order_id"    -> Scalar("o_orderkey"),
        "customer_id" -> Scalar("o_custkey"),
        metadataNode(DownloadDate)),
      ordering = FieldOrdering.idFirst(List("order_id", "customer_id"))
    )(shaped).orderBy("order_id")
  }

  /** DQ10 (S4): Avro-style JSON encoding of a projected struct. */
  private def q10(s: SparkSession, dir: String): DataFrame =
    q01(s, dir).select(
      col("customer.custkey").as("c_custkey"),
      to_json(col("customer")).as("customer_json"))
      .orderBy("c_custkey")

  /** DQ11 (EXT): equi-join on the lifted id — the downstream join the P4
    * design enables. Shuffle hash/SMJ on the key; AQE may broadcast the
    * smaller side at runtime. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey").as("customer_id"),
        col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** DQ12 (EXT): TPC-H Q1 core. Decimal-typed SUM for addition-order
    * independence; partial (map-side) aggregation is automatic. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"),
        sum(col("l_quantity").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_qty"),
        (sum(col("l_quantity").cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** DQ13 (EXT): exact dedup keeping the min-event_id row per
    * (user_id, event_type) — deterministic survivor, one shuffle. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(t(s, dir, "events"), Seq("user_id", "event_type"), col("event_id"))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("user_id", "event_type")

  /** DQ14 (EXT): brute-force cosine top-k vs the vec_id=1 query vector.
    * The 1-row query side is broadcast; ORDER BY+LIMIT compiles to
    * TakeOrderedAndProject (no global sort) — the pattern that survives a
    * 100 TB scan. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 1)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.cosine(col("embedding"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** DQ15 (EXT): token counting — lower → split \W+ → explode → count. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq01_nested_projection"   -> (q01 _),
    "dq02_select_all_expansion" -> (q02 _),
    "dq03_scalar_flatten"      -> (q03 _),
    "dq04_constant_columns"    -> (q04 _),
    "dq05_struct_construction" -> (q05 _),
    "dq06_filter_predicates"   -> (q06 _),
    "dq07_null_semantics"      -> (q07 _),
    "dq08_enum_passthrough"    -> (q08 _),
    "dq09_field_ordering"      -> ((s: SparkSession, d: String) => q09FieldOrdering(s, d)),
    "dq10_json_sink"           -> (q10 _),
    "dq11_join"                -> (q11 _),
    "dq12_aggregation"         -> (q12 _),
    "dq13_dedup_exact"         -> (q13 _),
    "dq14_similarity_topk"     -> (q14 _),
    "dq15_text_tokens"         -> (q15 _)
  )

  /** DuckDB-equivalent SQL per query (same column names, same ORDER BY). */
  def oracleSql: Map[String, String] = Map(
    "dq01_nested_projection" ->
      """SELECT {'custkey': c_custkey, 'name': c_name} AS customer
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "dq02_select_all_expansion" ->
      """SELECT o_orderkey, {'orderdate': strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
        |  'priority': o_orderpriority, 'status': o_orderstatus,
        |  'totalprice': o_totalprice} AS info
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "dq03_scalar_flatten" ->
      """SELECT {'custkey': c_custkey, 'name': c_name} AS customer,
        |  c_custkey AS customer_id
        |FROM customer ORDER BY customer_id""".stripMargin,
    "dq04_constant_columns" ->
      """SELECT 'Ben' AS author, n_name, n_nationkey, 1 AS test_run
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "dq05_struct_construction" ->
      """SELECT {'author': 'Ben', 'download_date': '2026-08-12',
        |  'report_date': strftime(o_orderdate, '%Y-%m-%d')} AS metadata, o_orderkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "dq06_filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-02-01' AND l_quantity > 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "dq07_null_semantics" ->
      """SELECT event_id, CASE WHEN props = '' THEN NULL ELSE props END AS props,
        |  COALESCE(value, 0) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "dq08_enum_passthrough" ->
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",
    "dq09_field_ordering" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id, o_totalprice,
        |  {'author': 'Ben', 'download_date': '2026-08-12',
        |   'report_date': strftime(o_orderdate, '%Y-%m-%d')} AS metadata
        |FROM orders ORDER BY order_id""".stripMargin,
    "dq10_json_sink" ->
      """SELECT c_custkey,
        |  to_json({'custkey': c_custkey, 'name': c_name})::VARCHAR AS customer_json
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "dq11_join" ->
      """SELECT o_orderkey, c_custkey AS customer_id, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "dq12_aggregation" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "dq13_dedup_exact" ->
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "dq14_similarity_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        |  list_sum(list_transform(range(1, len(e.embedding) + 1),
        |    i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
        |  / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
        |     * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))) AS sim
        |FROM embeddings e, q WHERE e.vec_id <> 1
        |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "dq15_text_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
        |    t -> len(t) > 0)) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin
  )
}
