package graft

import graft.core._

/** The runtime TPC-H-ish project over `/root/testdata/sf*` parquet tables.
  *
  * Adapted from the reference's sample project
  * (reference: cli/dataforge/resources/project/sources directory,
  * relations.yaml, outputs/feature_customer.yaml) to the driver-generated
  * fixture schemas (FIXTURES.md §C: no partsupp, monetary columns are
  * double, dates are timestamps, some narrow columns absent).
  *
  * Exercises: derived columns, rule-on-rule composition, implicit 2- and
  * 4-hop path inference, explicit path parameters, computed-key equi join,
  * M-aggregates (forward and reverse traversal), window rules, aggregate
  * output channels with filters, and multi-channel UNION ALL.
  */
object SampleProject {

  private def attrs(s: String): Seq[RawAttr] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map(RawAttr.parse).toSeq

  val region = SourceDef("tpch_region", "region",
    attrs("r_regionkey int, r_name string"))

  val nation = SourceDef("tpch_nation", "nation",
    attrs("n_nationkey int, n_name string, n_regionkey int"),
    rules = Seq(
      // M-aggregate over a forward 1-M relation. Money sums are computed as
      // exact integer cents: a bare double sum is summation-order-dependent,
      // and double→decimal casts differ between engines (Spark rounds the
      // shortest decimal representation, DuckDB the exact binary expansion),
      // so neither is hash-stable across engines. The source values are
      // 2-decimal, so round(x*100) is an exact integer in both.
      RuleDef("supplier_cnt", "count([tpch_supplier].s_suppkey)"),
      RuleDef("supplier_acctbal_cents",
        "sum(CAST(round([tpch_supplier].s_acctbal * 100) AS LONG))")))

  val customer = SourceDef("tpch_customer", "customer",
    attrs("c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"),
    rules = Seq(
      // M-aggregates over the reverse (customer <- orders) M side
      RuleDef("order_cnt", "count([tpch_orders].o_orderkey)"),
      RuleDef("total_spent_cents",
        "sum(CAST(round([tpch_orders].o_totalprice * 100) AS LONG))"),
      // two aggregate spans + outer arithmetic in one rule
      RuleDef("avg_order_value",
        "CAST(sum(CAST(round([tpch_orders].o_totalprice * 100) AS LONG)) AS DOUBLE) / 100.0 / CAST(count([tpch_orders].o_orderkey) AS DOUBLE)"),
      // scalar lookup: customer -> nation
      RuleDef("nation_name", "[tpch_nation].n_name"),
      // percentile/median/collection/boolean aggregates over the same path
      // (allow-list A5; array_sort makes collect_set hash-stable)
      RuleDef("median_order", "median([tpch_orders].o_totalprice)"),
      RuleDef("p25_order", "percentile([tpch_orders].o_totalprice, 0.25)"),
      RuleDef("statuses",
        "array_join(array_sort(collect_set([tpch_orders].o_orderstatus)), ',')"),
      RuleDef("has_open_order", "bool_or([tpch_orders].o_orderstatus = 'O')"),
      RuleDef("approx_orders", "approx_count_distinct([tpch_orders].o_orderkey)")))

  val supplier = SourceDef("tpch_supplier", "supplier",
    attrs("s_suppkey long, s_name string, s_nationkey int, s_acctbal double"))

  val part = SourceDef("tpch_part", "part",
    attrs("p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double"))

  val orders = SourceDef("tpch_orders", "orders",
    attrs("o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
    rules = Seq(
      RuleDef("o_year", "year([This].o_orderdate)"),
      // NOTE: no lookup into tpch_customer here — customer aggregates over
      // orders, so a reverse lookup would be a source-level cycle (the
      // reference fails the same way: "Circular dependencies in sources")
      // window rule (pass-through OVER clause; deterministic tiebreak)
      RuleDef("price_rank_in_cust",
        "rank() OVER (PARTITION BY [This].o_custkey ORDER BY [This].o_totalprice DESC, [This].o_orderkey)")))

  val lineitem = SourceDef("tpch_lineitem", "lineitem",
    attrs("l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, " +
      "l_quantity double, l_extendedprice double, l_discount double, l_tax double, " +
      "l_returnflag string, l_linestatus string, l_shipdate timestamp"),
    rules = Seq(
      RuleDef("net_price",
        "([This].l_extendedprice - [This].l_tax - [This].l_discount) * 100"),
      // rule-on-rule composition
      RuleDef("net_price_no_returns",
        "CASE WHEN [This].l_returnflag = 'R' THEN 0.0 ELSE [This].net_price END"),
      // exact integer-cents form of net_price for hash-stable aggregation
      RuleDef("net_price_cents",
        "CAST(round(([This].l_extendedprice - [This].l_tax - [This].l_discount) * 100) AS LONG)"),
      // implicit 2-hop path: lineitem -> orders -> customer
      RuleDef("c_name", "[tpch_customer].c_name"),
      // explicit 3-relation path to nation (mirrors the sample's c_n_name)
      RuleDef("c_n_name", "[tpch_nation].n_name",
        parameters = Seq(ParamSpec("tpch_nation",
          Seq("[tpch_lineitem]- orderkey -[tpch_orders]",
            "[tpch_orders]- custkey -[tpch_customer]",
            "[tpch_customer]- nationkey -[tpch_nation]")))),
      // explicit path exercising a REVERSE cardinality-1 hop (supplier ->
      // nation traverses [tpch_nation]- nationkey -[tpch_supplier] backward);
      // implicit inference is ambiguous here (a second route exists via
      // orders -> customer -> nation), mirroring reference behavior
      RuleDef("r_name", "[tpch_region].r_name",
        parameters = Seq(ParamSpec("tpch_region",
          Seq("[tpch_lineitem]- suppkey -[tpch_supplier]",
            "[tpch_nation]- nationkey -[tpch_supplier]",
            "[tpch_nation]- regionkey -[tpch_region]")))),
      // 1-hop lookups
      RuleDef("part_type", "[tpch_part].p_type"),
      RuleDef("supp_name", "[tpch_supplier].s_name"),
      // computed-key rule used as a join key elsewhere (mirrors partsupp_pkey)
      RuleDef("order_line_key",
        "CONCAT([This].l_orderkey, '|', [This].l_linenumber)"),
      RuleDef("order_ym", "date_format([tpch_orders].o_orderdate, 'yyyyMM')")))

  val relations: Seq[RelationDef] = Seq(
    RelationDef("[tpch_lineitem]- orderkey -[tpch_orders]",
      "[This].l_orderkey = [Related].o_orderkey", Cardinality.ManyOne),
    RelationDef("[tpch_orders]- custkey -[tpch_customer]",
      "[This].o_custkey = [Related].c_custkey", Cardinality.ManyOne),
    RelationDef("[tpch_customer]- nationkey -[tpch_nation]",
      "[This].c_nationkey = [Related].n_nationkey", Cardinality.ManyOne),
    RelationDef("[tpch_nation]- regionkey -[tpch_region]",
      "[This].n_regionkey = [Related].r_regionkey", Cardinality.ManyOne),
    RelationDef("[tpch_nation]- nationkey -[tpch_supplier]",
      "[This].n_nationkey = [Related].s_nationkey", Cardinality.OneMany),
    RelationDef("[tpch_lineitem]- partkey -[tpch_part]",
      "[This].l_partkey = [Related].p_partkey", Cardinality.ManyOne),
    RelationDef("[tpch_lineitem]- suppkey -[tpch_supplier]",
      "[This].l_suppkey = [Related].s_suppkey", Cardinality.ManyOne))

  /** Aggregate output with filter (mirrors outputs/feature_customer.yaml,
    * l_shipdate standing in for the absent l_receiptdate).
    */
  val featureCustomer = OutputDef(
    name = "feature_customer",
    columns = Seq(
      OutputCol.parse("customer string"),
      OutputCol.parse("ship_ym string"),
      OutputCol.parse("net_price_100 long")),
    channels = Seq(Channel(
      sourceName = "tpch_lineitem",
      mappings = Seq(
        Mapping.parse("c_name customer"),
        Mapping.parse("order_ym ship_ym"),
        Mapping.parse("sum(net_price_cents) net_price_100")),
      filter = Some("[This].l_shipdate BETWEEN '1993-01-01' AND '1998-12-31'"),
      operationType = OperationType.Aggregate)))

  /** Two-channel UNION ALL output with NULL-filled unmapped columns. */
  val partySummary = OutputDef(
    name = "party_summary",
    columns = Seq(
      OutputCol.parse("party_name string"),
      OutputCol.parse("party_type string"),
      OutputCol.parse("acctbal double"),
      OutputCol.parse("nation_key int")),
    channels = Seq(
      Channel("tpch_customer", Seq(
        Mapping.parse("c_name party_name"),
        Mapping.parse("c_mktsegment party_type"),
        Mapping.parse("c_acctbal acctbal"),
        Mapping.parse("c_nationkey nation_key"))),
      Channel("tpch_supplier", Seq(
        Mapping.parse("s_name party_name"),
        Mapping.parse("s_acctbal acctbal"),
        Mapping.parse("s_nationkey nation_key")))))

  /** Aggregate channel with DISTINCT aggregates and min/max (A3/A2). */
  val orderStats = OutputDef(
    name = "order_stats",
    columns = Seq(
      OutputCol.parse("o_year int"),
      OutputCol.parse("n_customers long"),
      OutputCol.parse("n_orders long"),
      OutputCol.parse("max_price double"),
      OutputCol.parse("min_price double")),
    channels = Seq(Channel(
      sourceName = "tpch_orders",
      mappings = Seq(
        Mapping.parse("o_year o_year"),
        Mapping.parse("count(DISTINCT o_custkey) n_customers"),
        Mapping.parse("count(o_orderkey) n_orders"),
        Mapping.parse("max(o_totalprice) max_price"),
        Mapping.parse("min(o_totalprice) min_price")),
      operationType = OperationType.Aggregate)))

  val project: Project = Project(
    sources = Seq(region, nation, customer, supplier, part, orders, lineitem),
    relations = relations,
    outputs = Seq(featureCustomer, partySummary, orderStats))
}
