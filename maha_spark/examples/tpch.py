"""Example cube registry over the driver's TPC-H-ish synthetic star
(TESTDATA.md / FIXTURES.md §4): lineitem fact + orders→customer→nation→region
snowflake chain + part/supplier dims.

This registry plays the role of the reference's test fixtures
(`BaseOracleQueryGeneratorTest.scala:48-244` advertiser star and
`SampleSchemaRegistrationFactory.scala:35-99` student cube): it exercises
FK chains (levels like keyword→ad_group→campaign→advertiser), static enum
mappings, safe-divide custom rollups, forced filters, schema-required
filters and a rollup table.
"""

from __future__ import annotations

from ..core.columns import DerivedDimCol, DerivedFactCol, DimCol, FactCol, safe_div
from ..core.filters import ALL_OPS, IN_BETWEEN_EQUALITY, IN_NOTIN_BETWEEN_EQUALITY
from ..core.grain import DAILY, HOURLY
from ..core.rollup import (
    AverageRollup, CardinalityRollup, CountRollup, FilteredRollup, MaxRollup,
    MinRollup, NoopRollup, SumRollup,
)
from ..core.types import DateType, DecType, IntType, StaticMapping, StrType, TimestampType
from ..registry.cube import (
    DimensionTable, FactTable, PubCol, PublicDimension, PublicFact, Registry,
)

ORDER_STATUS_MAP = StaticMapping({"O": "OPEN", "F": "FULFILLED", "P": "PENDING"},
                                 "UNKNOWN")
RETURN_FLAG_MAP = StaticMapping({"A": "ACCEPTED", "N": "NONE", "R": "RETURNED"},
                                "UNKNOWN")


def build_registry() -> Registry:
    reg = Registry()

    # ------------------------------------------------------------- dims
    # The same physical nation/region tables serve two roles (customer's
    # nation vs supplier's nation), so they are registered as DISTINCT
    # public dimensions with role-specific aliases — exactly how the
    # reference distinguishes e.g. advertiser-level vs campaign-level
    # attributes on shared lookup tables (SharedDimSchema.scala).
    def nation_region(prefix: str, role: str) -> None:
        region_t = DimensionTable(
            name="region", primary_key="r_regionkey", level=1, cost=5,
            columns={
                "r_regionkey": DimCol("r_regionkey", IntType()),
                "r_name": DimCol("r_name", StrType()),
            })
        reg.register_dimension(PublicDimension(
            name=f"{role}_region", table=region_t,
            pub_cols=[
                PubCol(f"{prefix}Region ID", "r_regionkey"),
                PubCol(f"{prefix}Region Name", "r_name"),
            ]))
        nation_t = DimensionTable(
            name="nation", primary_key="n_nationkey", level=2, cost=25,
            parent_keys={"n_regionkey": f"{role}_region"},
            columns={
                "n_nationkey": DimCol("n_nationkey", IntType()),
                "n_name": DimCol("n_name", StrType()),
                "n_regionkey": DimCol("n_regionkey", IntType(),
                                      foreign_key=f"{role}_region"),
            })
        reg.register_dimension(PublicDimension(
            name=f"{role}_nation", table=nation_t,
            pub_cols=[
                PubCol(f"{prefix}Nation ID", "n_nationkey"),
                PubCol(f"{prefix}Nation Name", "n_name"),
            ]))

    nation_region("", "customer")       # "Nation Name", "Region Name"
    nation_region("Supplier ", "supplier")  # "Supplier Nation Name", ...

    customer = DimensionTable(
        name="customer", primary_key="c_custkey", level=3, cost=150,
        parent_keys={"c_nationkey": "customer_nation"},
        schema_col_map={"customer": "c_custkey"},
        columns={
            "c_custkey": DimCol("c_custkey", IntType()),
            "c_name": DimCol("c_name", StrType(), case_insensitive=True),
            "c_nationkey": DimCol("c_nationkey", IntType(), foreign_key="customer_nation"),
            "c_acctbal": DimCol("c_acctbal", DecType()),
            "c_mktsegment": DimCol("c_mktsegment", StrType()),
        })
    reg.register_dimension(PublicDimension(
        name="customer", table=customer,
        pub_cols=[
            PubCol("Customer ID", "c_custkey"),
            PubCol("Customer Name", "c_name"),
            PubCol("Market Segment", "c_mktsegment"),
            PubCol("Customer Account Balance", "c_acctbal"),
        ]))

    orders = DimensionTable(
        name="orders", primary_key="o_orderkey", level=4, cost=1500,
        parent_keys={"o_custkey": "customer"},
        columns={
            "o_orderkey": DimCol("o_orderkey", IntType()),
            "o_custkey": DimCol("o_custkey", IntType(), foreign_key="customer"),
            "o_orderstatus": DimCol("o_orderstatus",
                                    StrType(static_mapping=ORDER_STATUS_MAP)),
            "o_totalprice": DimCol("o_totalprice", DecType()),
            "o_orderdate": DimCol("o_orderdate", TimestampType()),
            "o_orderpriority": DimCol("o_orderpriority", StrType()),
            "order_day": DerivedDimCol("order_day", DateType(),
                                       expr="CAST({o_orderdate} AS DATE)"),
        })
    reg.register_dimension(PublicDimension(
        name="orders", table=orders,
        pub_cols=[
            PubCol("Order Key", "o_orderkey"),
            PubCol("Order Status", "o_orderstatus"),
            PubCol("Order Total", "o_totalprice"),
            PubCol("Order Date", "order_day"),
            PubCol("Order Priority", "o_orderpriority"),
        ]))

    part = DimensionTable(
        name="part", primary_key="p_partkey", level=4, cost=200,
        columns={
            "p_partkey": DimCol("p_partkey", IntType()),
            "p_name": DimCol("p_name", StrType(), case_insensitive=True),
            "p_brand": DimCol("p_brand", StrType()),
            "p_type": DimCol("p_type", StrType()),
            "p_size": DimCol("p_size", IntType()),
            "p_retailprice": DimCol("p_retailprice", DecType()),
        })
    reg.register_dimension(PublicDimension(
        name="part", table=part,
        pub_cols=[
            PubCol("Part ID", "p_partkey"),
            PubCol("Part Name", "p_name"),
            # dependsOnColumns (fact/Fact.scala:1650): Brand is only
            # meaningful alongside Part Type in this registry
            PubCol("Brand", "p_brand",
                   depends_on_columns=frozenset({"Part Type"})),
            PubCol("Part Type", "p_type"),
            PubCol("Part Size", "p_size"),
            PubCol("Retail Price", "p_retailprice"),
        ]))

    supplier = DimensionTable(
        name="supplier", primary_key="s_suppkey", level=4, cost=10,
        parent_keys={"s_nationkey": "supplier_nation"},
        columns={
            "s_suppkey": DimCol("s_suppkey", IntType()),
            "s_name": DimCol("s_name", StrType()),
            "s_nationkey": DimCol("s_nationkey", IntType(), foreign_key="supplier_nation"),
            "s_acctbal": DimCol("s_acctbal", DecType()),
        })
    reg.register_dimension(PublicDimension(
        name="supplier", table=supplier,
        pub_cols=[
            PubCol("Supplier ID", "s_suppkey"),
            PubCol("Supplier Name", "s_name"),
            PubCol("Supplier Account Balance", "s_acctbal"),
        ]))

    # ------------------------------------------------------------- fact
    li_cols = {
        "l_orderkey": DimCol("l_orderkey", IntType(), foreign_key="orders"),
        "l_partkey": DimCol("l_partkey", IntType(), foreign_key="part"),
        "l_suppkey": DimCol("l_suppkey", IntType(), foreign_key="supplier"),
        "l_linenumber": DimCol("l_linenumber", IntType()),
        "l_returnflag": DimCol("l_returnflag",
                               StrType(static_mapping=RETURN_FLAG_MAP)),
        "l_linestatus": DimCol("l_linestatus", StrType()),
        "l_shipdate": DimCol("l_shipdate", TimestampType(), is_day_column=True),
        "ship_day": DerivedDimCol("ship_day", DateType(),
                                  expr="CAST({l_shipdate} AS DATE)"),
        "ship_month": DerivedDimCol("ship_month", DateType(),
                                    expr="GET_INTERVAL_DATE({l_shipdate}, 'M')"),
        "ship_week": DerivedDimCol("ship_week", DateType(),
                                   expr="GET_INTERVAL_DATE({l_shipdate}, 'W')"),
        "l_quantity": FactCol("l_quantity", DecType(default_value=0.0)),
        "l_extendedprice": FactCol("l_extendedprice", DecType(default_value=0.0)),
        "l_discount": FactCol("l_discount", DecType(), rollup=AverageRollup()),
        "l_tax": FactCol("l_tax", DecType()),
        "disc_price": FactCol("disc_price", DecType(default_value=0.0),
                              expr="{l_extendedprice} * (1 - {l_discount})"),
        "charge": FactCol("charge", DecType(),
                          expr="{l_extendedprice} * (1 - {l_discount}) * (1 + {l_tax})"),
        "max_price": FactCol("max_price", DecType(), rollup=MaxRollup(),
                             expr="{l_extendedprice}"),
        "min_price": FactCol("min_price", DecType(), rollup=MinRollup(),
                             expr="{l_extendedprice}"),
        "avg_price": FactCol("avg_price", DecType(), rollup=AverageRollup(),
                             expr="{l_extendedprice}"),
        "line_count": FactCol("line_count", IntType(), rollup=CountRollup()),
        "returned_qty": FactCol(
            "returned_qty", DecType(default_value=0.0),
            rollup=FilteredRollup(condition_sql="l_returnflag = 'R'"),
            expr="{l_quantity}", depends_on=("l_returnflag", "l_quantity")),
        "order_count_distinct": FactCol(
            "order_count_distinct", IntType(),
            rollup=CardinalityRollup(exact=True), expr="{l_orderkey}",
            depends_on=("l_orderkey",)),
        "order_count_approx": FactCol(
            "order_count_approx", IntType(),
            rollup=CardinalityRollup(exact=False), expr="{l_orderkey}",
            depends_on=("l_orderkey",)),
        # safe-divide custom rollups (aggregate-then-divide, never re-averaged)
        "avg_discount_rate": DerivedFactCol(
            "avg_discount_rate", DecType(),
            expr=safe_div("{disc_price}", "{l_extendedprice}")),
        "avg_item_price": DerivedFactCol(
            "avg_item_price", DecType(),
            expr=safe_div("{l_extendedprice}", "{l_quantity}")),
    }

    lineitem = FactTable(
        name="lineitem", columns=li_cols, grain=DAILY,
        day_column="l_shipdate", cost=6000,
    )

    # rollup candidate: same data minus part/supplier detail, cheaper.
    # (In production this points at a physically pre-aggregated table; the
    # planner picks it whenever the request doesn't need the detail cols —
    # FactBuilder.newRollUp semantics, fact/Fact.scala:1385.)
    rollup_cols = {k: v for k, v in li_cols.items()
                   if k not in ("l_partkey", "l_suppkey", "l_linenumber")}
    lineitem_rollup = FactTable(
        name="lineitem", columns=rollup_cols, grain=DAILY,
        day_column="l_shipdate", cost=2000,
        discarded={"l_partkey", "l_suppkey", "l_linenumber"},
    )

    cube = PublicFact(
        name="lineitem_stats",
        tables=[lineitem, lineitem_rollup],
        pub_cols=[
            PubCol("Day", "ship_day", IN_BETWEEN_EQUALITY),
            PubCol("Month", "ship_month", IN_BETWEEN_EQUALITY),
            PubCol("Week", "ship_week", IN_BETWEEN_EQUALITY),
            PubCol("Return Flag", "l_returnflag"),
            PubCol("Line Status", "l_linestatus"),
            PubCol("Line Number", "l_linenumber"),
            PubCol("Order Key", "l_orderkey"),
            PubCol("Part ID", "l_partkey"),
            PubCol("Supplier ID", "l_suppkey"),
        ],
        pub_fact_cols=[
            PubCol("Total Quantity", "l_quantity"),
            PubCol("Total Price", "l_extendedprice"),
            PubCol("Revenue", "disc_price"),
            PubCol("Charge", "charge"),
            PubCol("Average Discount", "l_discount"),
            PubCol("Average Price", "avg_price"),
            PubCol("Max Price", "max_price"),
            PubCol("Min Price", "min_price"),
            PubCol("Line Count", "line_count"),
            PubCol("Returned Quantity", "returned_qty"),
            PubCol("Order Count", "order_count_distinct"),
            PubCol("Order Count Approx", "order_count_approx"),
            PubCol("Discount Rate", "avg_discount_rate"),
            PubCol("Average Item Price", "avg_item_price"),
        ],
        schema_required_alias={"customer": "Customer ID"},
        max_days_window=3700,
        day_alias="Day",
    )
    reg.register_fact(cube)

    # events cube (hourly grain) for timeseries / streaming parity
    ev_cols = {
        "event_id": DimCol("event_id", IntType()),
        "ts": DimCol("ts", TimestampType(), is_day_column=True),
        "event_day": DerivedDimCol("event_day", DateType(),
                                   expr="CAST({ts} AS DATE)"),
        "event_hour": DerivedDimCol("event_hour", TimestampType(),
                                    expr="date_trunc('hour', {ts})"),
        "user_id": DimCol("user_id", IntType()),
        "event_type": DimCol("event_type", StrType()),
        "value": FactCol("value", DecType(default_value=0.0)),
        "event_count": FactCol("event_count", IntType(), rollup=CountRollup()),
        "user_count": FactCol("user_count", IntType(),
                              rollup=CardinalityRollup(exact=True),
                              expr="{user_id}", depends_on=("user_id",)),
        "max_value": FactCol("max_value", DecType(), rollup=MaxRollup(),
                             expr="{value}"),
    }
    events = FactTable(name="events", columns=ev_cols, grain=HOURLY,
                       day_column="ts", cost=1000)
    reg.register_fact(PublicFact(
        name="user_events",
        tables=[events],
        pub_cols=[
            PubCol("Day", "event_day", IN_BETWEEN_EQUALITY),
            PubCol("Hour", "event_hour"),
            PubCol("Event Type", "event_type"),
            PubCol("User ID", "user_id"),
        ],
        pub_fact_cols=[
            PubCol("Total Value", "value"),
            PubCol("Event Count", "event_count"),
            PubCol("User Count", "user_count"),
            PubCol("Max Value", "max_value"),
        ],
        day_alias="Day",
    ))

    return reg
