"""DIN-SQL tiered few-shot example banks, at reference scale.

The reference ships ~15 EASY / ~10 MEDIUM / ~8 HARD worked examples inside
its tier prompts (``DINSQLGenerate.py:230-436``), each in a fixed line
shape per tier. Round 4 carried 1-2 compact examples per tier; this module
closes the gap (r4 verdict #4): full-size banks in the reference's EXACT
line shapes — EASY ``Q:/schema_links:/SQL:`` triples, MEDIUM
``Q:/Schema_links:/A: Let's think step by step ... Intermediate_
representation:/SQL:`` chains (with the last two in the longer
classification-analysis variant, as the reference's bank mixes), HARD
``# [Question]/# [Schema links]/# [Analysis]/sub-question/Intermediate_
representation/# [Sql]`` decompositions.

The example CONTENT is this engine's own (TPC-H star-schema domain, the
tables the engine actually serves) covering the same SQL shape families as
the reference bank: DISTINCT+WHERE, BETWEEN, ORDER..LIMIT, OR-disjunction,
LIKE, GROUP+ORDER-on-aggregate, COUNT(DISTINCT), HAVING over AVG/COUNT,
scalar-average subqueries, multi-join with T1/T2 aliases, EXCEPT, NOT IN,
<-max subqueries, IN chains. Verbatim SHAPE, not verbatim text — prompts
stay interface-compatible without copying the reference's prose.

Examples are stored structured and rendered once at import; the rendered
bank strings are embedded into ``DINSQLGenerator``'s tier prompts.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# EASY: single-table queries; shape per reference EASY_PROMPT examples
# (q, schema_links, sql)

DIN_EASY_EXAMPLES: list[tuple[str, str, str]] = [
    (
        "Find the market segments of customers with balance above 1000.",
        "[customer.c_mktsegment,customer.c_acctbal,1000]",
        "SELECT DISTINCT c_mktsegment FROM customer WHERE c_acctbal  >  1000",
    ),
    (
        "Find the name of the parts which are sized 10 to 20 and their brands.",
        "[part.p_name,part.p_brand,part.p_size,10,20]",
        "SELECT p_name ,  p_brand FROM part WHERE p_size BETWEEN 10 AND 20",
    ),
    (
        "Give the name of the supplier in nation 3 with the most balance.",
        "[supplier.s_name,supplier.s_nationkey,supplier.s_acctbal,3]",
        "SELECT s_name FROM supplier WHERE s_nationkey  =  3 ORDER BY s_acctbal DESC LIMIT 1",
    ),
    (
        "Find the total balances of the BUILDING or MACHINERY segment customers.",
        "[customer.c_acctbal,customer.c_mktsegment,BUILDING,MACHINERY]",
        "SELECT sum(c_acctbal) FROM customer WHERE c_mktsegment  =  'BUILDING' OR c_mktsegment  =  'MACHINERY'",
    ),
    (
        "Find the brand of the parts whose name contains 'bolt'.",
        "[part.p_brand,part.p_name,bolt]",
        "SELECT p_brand FROM part WHERE p_name LIKE '%bolt%'",
    ),
    (
        "What is the brand of the parts with the most total retail price?",
        "[part.p_brand,part.p_retailprice]",
        "SELECT p_brand FROM part GROUP BY p_brand ORDER BY sum(p_retailprice) DESC LIMIT 1",
    ),
    (
        "How many customers placed an order with the priority of 1-URGENT?",
        "[orders.o_custkey,orders.o_orderpriority,1-URGENT]",
        "SELECT COUNT (DISTINCT o_custkey) FROM orders WHERE o_orderpriority  =  '1-URGENT'",
    ),
    (
        "Find the name of the nations and their region keys sorted by their nation key in ascending order.",
        "[nation.n_name,nation.n_regionkey,nation.n_nationkey]",
        "SELECT n_name ,  n_regionkey FROM nation ORDER BY n_nationkey",
    ),
    (
        "Find the order priority which covers the largest number of orders.",
        "[orders.o_orderpriority,orders.*]",
        "SELECT o_orderpriority FROM orders GROUP BY o_orderpriority ORDER BY count(*) DESC LIMIT 1",
    ),
    (
        "What are the segments and average balances for segments with average balance higher than 100?",
        "[customer.c_mktsegment,customer.c_acctbal,100]",
        "SELECT c_mktsegment ,  AVG (c_acctbal) FROM customer GROUP BY c_mktsegment HAVING AVG (c_acctbal)  >  100",
    ),
    (
        "How many parts in each brand have a size of over 30?",
        "[part.*,part.p_brand,part.p_size,30]",
        "SELECT count(*) ,  p_brand FROM part WHERE p_size  >  30 GROUP BY p_brand",
    ),
    (
        "Find the names of the top 3 brands that provide the largest amount of parts?",
        "[part.p_brand,part.*]",
        "SELECT p_brand FROM part GROUP BY p_brand ORDER BY count(*) DESC LIMIT 3",
    ),
    (
        "Find the maximum and average retail price among parts in each brand.",
        "[part.p_brand,part.p_retailprice]",
        "SELECT max(p_retailprice) ,  avg(p_retailprice) ,  p_brand FROM part GROUP BY p_brand",
    ),
    (
        "Find the name of the parts that is offered under more than one brand.",
        "[part.p_name]",
        "SELECT p_name FROM part GROUP BY p_name HAVING count(*)  >  1",
    ),
    (
        "Show the segments shared by customers with balance bigger than 5000 and smaller than 1000.",
        "[customer.c_mktsegment,customer.c_acctbal,5000,1000]",
        "SELECT DISTINCT c_mktsegment FROM customer WHERE c_acctbal > 5000 AND c_acctbal < 1000",
    ),
    (
        "Show the key, the date of ordering, the priority, and other order detail for all orders.",
        "[orders.o_orderkey,orders.o_orderdate,orders.o_orderpriority,orders.o_orderstatus]",
        "SELECT o_orderkey, o_orderdate, o_orderpriority, o_orderstatus FROM orders",
    ),
]


# --------------------------------------------------------------------------
# MEDIUM: joins/IR; (q, links, tables_list, intermediate_representation, sql)
# rendered in the short CoT form; entries with a 5th element use the longer
# classification-analysis variant (the reference bank mixes both)

DIN_MEDIUM_EXAMPLES: list[dict] = [
    dict(
        q="Find the total balances of the BUILDING or AUTOMOBILE segment customers.",
        links="[customer.c_acctbal,customer.c_mktsegment,BUILDING,AUTOMOBILE]",
        tables="[]",
        ir='select sum(customer.c_acctbal) from customer  where  customer.c_mktsegment = "BUILDING"  or  customer.c_mktsegment = "AUTOMOBILE"',
        sql="SELECT sum(c_acctbal) FROM customer WHERE c_mktsegment  =  'BUILDING' OR c_mktsegment  =  'AUTOMOBILE'",
    ),
    dict(
        q="Find the name and region key of the nation with the highest nation key.",
        links="[nation.n_nationkey,nation.n_name,nation.n_regionkey]",
        tables="[]",
        ir="select nation.n_name , nation.n_regionkey from nation  order by nation.n_nationkey desc limit 1",
        sql="SELECT n_name ,  n_regionkey FROM nation ORDER BY n_nationkey DESC LIMIT 1",
    ),
    dict(
        q="What is the name and brand of the parts whose retail price is more than the average retail price?",
        links="[part.p_retailprice,part.p_name,part.p_brand]",
        tables="[]",
        ir="select part.p_name , part.p_brand from part  where  @.@ > avg ( part.p_retailprice )",
        sql="SELECT p_name ,  p_brand FROM part WHERE p_retailprice  >  (SELECT avg(p_retailprice) FROM part)",
    ),
    dict(
        q="Find the total number of customers and total number of suppliers for each nation.",
        links="[nation.n_nationkey = customer.c_nationkey,customer.c_custkey,nation.n_nationkey = supplier.s_nationkey,supplier.s_suppkey]",
        tables="[nation,customer,supplier]",
        ir="select count( distinct customer.c_custkey) , count( distinct supplier.s_suppkey) , nation.n_name from nation  group by supplier.s_nationkey",
        sql="SELECT count(DISTINCT T2.c_custkey) ,  count(DISTINCT T3.s_suppkey) ,  T1.n_name FROM nation AS T1 JOIN customer AS T2 ON T1.n_nationkey  =  T2.c_nationkey JOIN supplier AS T3 ON T1.n_nationkey  =  T3.s_nationkey GROUP BY T1.n_name",
    ),
    dict(
        q="Find the name of customers that have two orders?",
        links="[customer.c_name,customer.c_custkey = orders.o_custkey]",
        tables="[customer,orders]",
        ir="select customer.c_name from customer  where  count ( orders.* )  = 2  group by orders.o_custkey",
        sql="SELECT T1.c_name FROM customer AS T1 JOIN orders AS T2 ON T1.c_custkey  =  T2.o_custkey GROUP BY T2.o_custkey HAVING count(*)  =  2",
    ),
    dict(
        q="Find the name of customers who placed any order in the years of 1995 and 1996.",
        links="[customer.c_name,customer.c_custkey = orders.o_custkey,orders.o_orderdate,1995,1996]",
        tables="[customer,orders]",
        ir="select  distinct customer.c_name from customer  where  year ( orders.o_orderdate ) = 1995  or  year ( orders.o_orderdate ) = 1996",
        sql="SELECT DISTINCT T1.c_name FROM customer AS T1 JOIN orders AS T2 ON T1.c_custkey  =  T2.o_custkey WHERE year(T2.o_orderdate)  =  1995 OR year(T2.o_orderdate)  =  1996",
    ),
    dict(
        q="list in alphabetic order all nation names and their customers' names in the region of ASIA.",
        links="[nation.n_name,nation.n_nationkey = customer.c_nationkey,customer.c_name,nation.n_regionkey = region.r_regionkey,region.r_name,ASIA]",
        tables="[nation,customer,region]",
        ir='select nation.n_name , customer.c_name from nation  where  region.r_name = "ASIA"  order by nation.n_name asc',
        sql="SELECT T1.n_name ,  T2.c_name FROM nation AS T1 JOIN customer AS T2 ON T1.n_nationkey  =  T2.c_nationkey JOIN region AS T3 ON T1.n_regionkey  =  T3.r_regionkey WHERE T3.r_name  =  'ASIA' ORDER BY T1.n_name",
    ),
    dict(
        q="What are the names of all suppliers in the nations of the AFRICA region sorted by account balance.",
        links="[supplier.s_name,supplier.s_acctbal,supplier.s_nationkey = nation.n_nationkey,nation.n_regionkey = region.r_regionkey,region.r_name,AFRICA]",
        tables="[supplier,nation,region]",
        classify=True,
        ir="select supplier.s_name from supplier join nation on supplier.s_nationkey = nation.n_nationkey join region on nation.n_regionkey = region.r_regionkey where region.r_name = 'AFRICA' order by supplier.s_acctbal",
        sql="SELECT T1.s_name FROM supplier AS T1 JOIN nation AS T2 ON T1.s_nationkey = T2.n_nationkey JOIN region AS T3 ON T2.n_regionkey = T3.r_regionkey WHERE T3.r_name = 'AFRICA' ORDER BY T1.s_acctbal",
    ),
    dict(
        q="Find the name, balance, and nation key of customers that have more than five orders?",
        links="[customer.c_name,customer.c_acctbal,customer.c_nationkey,customer.c_custkey = orders.o_custkey]",
        tables="[customer,orders]",
        classify=True,
        ir="select customer.c_name , customer.c_acctbal , customer.c_nationkey from customer join orders on customer.c_custkey = orders.o_custkey group by orders.o_custkey having count(*) > 5",
        sql="SELECT T1.c_name , T1.c_acctbal , T1.c_nationkey FROM customer AS T1 JOIN orders AS T2 ON T1.c_custkey = T2.o_custkey GROUP BY T2.o_custkey HAVING count(*) > 5",
    ),
]


# --------------------------------------------------------------------------
# HARD: sub-question decompositions;
# (q, links, sub_question, sub_sql, intermediate_representation, sql)

DIN_HARD_EXAMPLES: list[dict] = [
    dict(
        q="Find the name of customers that have two orders?",
        links="[customer.c_name,customer.c_custkey = orders.o_custkey]",
        sub="What are the names for customers with two orders?",
        sub_sql="SELECT T1.c_name FROM customer AS T1 JOIN orders AS T2 ON T1.c_custkey  =  T2.o_custkey GROUP BY T2.o_custkey HAVING count(*)  =  2",
        ir="select customer.c_name from customer  where  count ( orders.* )  = 2  group by orders.o_custkey",
        sql="SELECT T1.c_name FROM customer AS T1 JOIN orders AS T2 ON T1.c_custkey  =  T2.o_custkey GROUP BY T2.o_custkey HAVING count(*)  =  2",
    ),
    dict(
        q="Find the name and segment of the customer with the highest balance.",
        links="[customer.c_name,customer.c_mktsegment,customer.c_acctbal]",
        sub="What is the customer name and corresponding segment for the customer with the greatest balance?",
        sub_sql="SELECT c_name ,  c_mktsegment FROM customer ORDER BY c_acctbal DESC LIMIT 1",
        ir="select customer.c_name , customer.c_mktsegment from customer  order by customer.c_acctbal desc limit 1",
        sql="SELECT c_name ,  c_mktsegment FROM customer ORDER BY c_acctbal DESC LIMIT 1",
    ),
    dict(
        q="Find the name, brand, and type of parts that have more than one supplier?",
        links="[part.p_name,part.p_brand,part.p_type,part.p_partkey = lineitem.l_partkey,lineitem.l_suppkey]",
        sub="What is the name, brand, and type for parts with more than one distinct supplier?",
        sub_sql="SELECT T1.p_name ,  T1.p_brand , T1.p_type FROM part AS T1 JOIN lineitem AS T2 ON T1.p_partkey  =  T2.l_partkey GROUP BY T2.l_partkey HAVING count(DISTINCT T2.l_suppkey)  >  1",
        ir="select part.p_name , part.p_brand , part.p_type from part  where  count ( distinct lineitem.l_suppkey )  > 1  group by lineitem.l_partkey",
        sql="SELECT T1.p_name ,  T1.p_brand , T1.p_type FROM part AS T1 JOIN lineitem AS T2 ON T1.p_partkey  =  T2.l_partkey GROUP BY T2.l_partkey HAVING count(DISTINCT T2.l_suppkey)  >  1",
    ),
    dict(
        q="Give the name and nation key of the suppliers with greater than average balance.",
        links="[supplier.s_name,supplier.s_nationkey,supplier.s_acctbal]",
        sub="What is the average balance of suppliers?",
        sub_sql="SELECT avg(s_acctbal) FROM supplier",
        ir="select supplier.s_name , supplier.s_nationkey from supplier  where  @.@ > avg ( supplier.s_acctbal )",
        sql="SELECT s_name ,  s_nationkey FROM supplier WHERE s_acctbal  >  (SELECT avg(s_acctbal) FROM supplier)",
    ),
    dict(
        q="Find the key of customers who placed an order in 1995 but not in 1996.",
        links="[orders.o_custkey,orders.o_orderdate,1995,1996]",
        sub="Find the key of customers who placed an order in 1996",
        sub_sql="SELECT o_custkey FROM orders WHERE year(o_orderdate)  =  1996",
        ir='select orders.o_custkey from orders  where  year ( orders.o_orderdate ) = 1995  and  year ( orders.o_orderdate ) != 1996',
        sql="SELECT o_custkey FROM orders WHERE year(o_orderdate)  =  1995 EXCEPT SELECT o_custkey FROM orders WHERE year(o_orderdate)  =  1996",
    ),
    dict(
        q="Find the name of the nations that do not have any customers?",
        links="[nation.n_name,nation.n_nationkey]",
        sub="What are the nations that have any customers?",
        sub_sql="SELECT c_nationkey FROM customer",
        ir="select nation.n_name from nation  where  @.@ not in customer.c_nationkey",
        sql="SELECT n_name FROM nation WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer)",
    ),
    dict(
        q="Find the balances of all distinct suppliers that are less than the largest balance.",
        links="[supplier.s_acctbal]",
        sub="What is the largest balance of suppliers",
        sub_sql="SELECT max(s_acctbal) FROM supplier",
        ir="select  distinct supplier.s_acctbal from supplier  where  @.@ < max ( supplier.s_acctbal )",
        sql="SELECT DISTINCT s_acctbal FROM supplier WHERE s_acctbal  <  (SELECT max(s_acctbal) FROM supplier)",
    ),
    dict(
        q="Find the names of customers who have placed any order with the priority of 1-URGENT.",
        links="[customer.c_name,customer.c_custkey,orders.o_custkey,orders.o_orderpriority,1-URGENT]",
        sub="What are the customers that placed an order with the priority of 1-URGENT?",
        sub_sql="SELECT o_custkey FROM orders WHERE o_orderpriority  =  '1-URGENT'",
        ir="select customer.c_name from customer  where  @.@ in orders.o_custkey  and  orders.o_orderpriority = \"1-URGENT\"",
        sql="SELECT c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority  =  '1-URGENT')",
    ),
]


# --------------------------------------------------------------------------
# renderers: reference line shapes, one string per tier


def render_easy_bank() -> str:
    blocks = [
        f'Q: "{q}"\nschema_links: {links}\nSQL: {sql}'
        for q, links, sql in DIN_EASY_EXAMPLES
    ]
    return (
        "### Here are some reference examples:\n# \n"
        + "\n\n".join(blocks)
        + "\n\n###\n"
    )


_MEDIUM_COT = (
    "A: Let's think step by step. For creating the SQL for the given "
    "question, we need to join these tables = {tables}. First, create an "
    "intermediate representation, then use it to construct the SQL query."
)

_MEDIUM_CLASSIFY = (
    'A: Let\'s think step by step. The SQL query for the question "{q}" '
    "needs these tables = {tables}, so we need JOIN.\n"
    "Plus, it doesn't need nested queries with (INTERSECT, UNION, EXCEPT, "
    'IN, NOT IN), and we need the answer to the questions = [""].\n'
    "So, we need JOIN and don't need nested queries, then the the SQL "
    'query can be classified as "NON-NESTED".'
)


def render_medium_bank() -> str:
    blocks = []
    for ex in DIN_MEDIUM_EXAMPLES:
        cot = (
            _MEDIUM_CLASSIFY.format(q=ex["q"], tables=ex["tables"])
            if ex.get("classify")
            else _MEDIUM_COT.format(tables=ex["tables"])
        )
        links_tag = "schema_links" if ex.get("classify") else "Schema_links"
        blocks.append(
            f'Q: "{ex["q"]}"\n{links_tag}: {ex["links"]}\n{cot}\n'
            f"Intermediate_representation: {ex['ir']}\nSQL: {ex['sql']}"
        )
    return (
        "### Here are some reference examples:\n# \n"
        + "\n\n".join(blocks)
        + "\n\n###\n"
    )


def render_hard_bank() -> str:
    blocks = []
    for ex in DIN_HARD_EXAMPLES:
        blocks.append(
            f'# [Question]: "{ex["q"]}"\n'
            f"# [Schema links]: {ex['links']}\n"
            f"# [Analysis]: Let's think step by step. \"{ex['q']}\" can be "
            "solved by knowing the answer to the following sub-question "
            f"\"{ex['sub']}\".\n"
            f"The SQL query for the sub-question \"{ex['sub']}\" is "
            f"{ex['sub_sql']}\n"
            f"So, the answer to the question \"{ex['q']}\" is =\n"
            f"Intermediate_representation: {ex['ir']}\n"
            f"# [Sql]: {ex['sql']}"
        )
    return (
        "### Here are some reference examples:\n# \n"
        + "\n\n".join(blocks)
        + "\n\n###\n"
    )


DIN_EASY_BANK = render_easy_bank()
DIN_MEDIUM_BANK = render_medium_bank()
DIN_HARD_BANK = render_hard_bank()


# --------------------------------------------------------------------------
# Schema-linking examples (reference SCHEMA_LINKING_PROMPT shape,
# DINSQLGenerate.py:49-158): per-example mini schema block + stepwise
# phrase -> column analysis ending in the Schema_links line.

_TPCH_CORE_SCHEMA = (
    "Table nation, columns = [*,n_nationkey,n_name,n_regionkey]\n"
    "Table region, columns = [*,r_regionkey,r_name]\n"
    "Table customer, columns = [*,c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment]\n"
    "Table orders, columns = [*,o_orderkey,o_custkey,o_orderstatus,o_orderdate,o_orderpriority]\n"
    "Foreign_keys = [nation.n_regionkey = region.r_regionkey,"
    "customer.c_nationkey = nation.n_nationkey,orders.o_custkey = customer.c_custkey]"
)

_TPCH_PARTS_SCHEMA = (
    "Table part, columns = [*,p_partkey,p_name,p_brand,p_type,p_size,p_retailprice]\n"
    "Table supplier, columns = [*,s_suppkey,s_name,s_nationkey,s_acctbal]\n"
    "Table lineitem, columns = [*,l_orderkey,l_partkey,l_suppkey,l_quantity,l_extendedprice,l_discount,l_shipdate]\n"
    "Foreign_keys = [lineitem.l_partkey = part.p_partkey,"
    "lineitem.l_suppkey = supplier.s_suppkey]"
)

# (schema_block, q, [(phrase, columns)], fks, cell_values, schema_links)
DIN_LINK_EXAMPLES: list[dict] = [
    dict(
        schema=_TPCH_CORE_SCHEMA,
        q="Find the names of customers with balance more than 1000.",
        steps=[("names of customers", "[customer.c_name]"),
               ("balance more than", "[customer.c_acctbal]")],
        fks="[]",
        cells="[1000]",
        links="[customer.c_name,customer.c_acctbal,1000]",
    ),
    dict(
        schema=_TPCH_CORE_SCHEMA,
        q="How many orders have the priority of 1-URGENT ?",
        steps=[("How many orders", "[orders.*]"),
               ("the priority of", "[orders.o_orderpriority]")],
        fks="[]",
        cells="['1-URGENT']",
        links="[orders.*,orders.o_orderpriority,'1-URGENT']",
    ),
    dict(
        schema=_TPCH_CORE_SCHEMA,
        q="what are the distinct order dates of the orders placed by a customer in the BUILDING segment?",
        steps=[("distinct order dates of the orders", "[orders.o_orderdate]"),
               ("orders placed by", "[orders.o_custkey]"),
               ("customer in the", "[customer.c_mktsegment]")],
        fks="[orders.o_custkey = customer.c_custkey]",
        cells="['BUILDING']",
        links="[orders.o_orderdate,orders.o_custkey = customer.c_custkey,"
              "customer.c_mktsegment,'BUILDING']",
    ),
    dict(
        schema=_TPCH_CORE_SCHEMA,
        q="List the key of customers who never placed an order?",
        steps=[("key of customers", "[customer.c_custkey]"),
               ("never placed an order", "[orders.o_custkey]")],
        fks="[customer.c_custkey = orders.o_custkey]",
        cells="[]",
        links="[customer.c_custkey = orders.o_custkey]",
    ),
    dict(
        schema=_TPCH_PARTS_SCHEMA,
        q="Find the names of suppliers who shipped a part of the brand Brand#3.",
        steps=[("names of suppliers", "[supplier.s_name]"),
               ("shipped a part", "[lineitem.l_suppkey]"),
               ("the brand", "[part.p_brand]")],
        fks="[lineitem.l_suppkey = supplier.s_suppkey,"
            "lineitem.l_partkey = part.p_partkey]",
        cells="['Brand#3']",
        links="[supplier.s_name,lineitem.l_suppkey = supplier.s_suppkey,"
              "lineitem.l_partkey = part.p_partkey,part.p_brand,'Brand#3']",
    ),
    dict(
        schema=_TPCH_PARTS_SCHEMA,
        q="Find the name and retail price of parts sized over 40 sorted by retail price.",
        steps=[("name and retail price of parts", "[part.p_name,part.p_retailprice]"),
               ("sized over", "[part.p_size]")],
        fks="[]",
        cells="[40]",
        links="[part.p_name,part.p_retailprice,part.p_size,40]",
    ),
]


def render_link_bank() -> str:
    blocks = []
    for ex in DIN_LINK_EXAMPLES:
        lines = [ex["schema"], f'Q: "{ex["q"]}"']
        lines.append(
            f"A: Let's think step by step. In the question \"{ex['q']}\", "
            "we are asked:"
        )
        for phrase, cols in ex["steps"]:
            lines.append(f'"{phrase}" so we need column = {cols}')
        lines.append(
            "Based on the columns and tables, we need these "
            f"Foreign_keys = {ex['fks']}."
        )
        lines.append(
            "Based on the tables, columns, and Foreign_keys, The set of "
            f"possible cell values are = {ex['cells']}. So the Schema_links "
            "are:"
        )
        lines.append(f"Schema_links: {ex['links']}")
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n\n"


# --------------------------------------------------------------------------
# Classification examples (reference CLASSIFICATION_PROMPT shape,
# DINSQLGenerate.py:160-229): Q + schema_links + tables/JOIN/nesting CoT +
# Label line. `subs` non-empty renders the NESTED sub-question list.

DIN_CLASSIFY_EXAMPLES: list[dict] = [
    dict(
        q="How many regions are there?",
        links="[region.*]",
        tables="[region]",
        label="EASY",
        subs=[],
    ),
    dict(
        q="Find the names of parts sized between 10 and 20.",
        links="[part.p_name,part.p_size,10,20]",
        tables="[part]",
        label="EASY",
        subs=[],
    ),
    dict(
        q="Show the order priority which covers the most orders.",
        links="[orders.o_orderpriority,orders.*]",
        tables="[orders]",
        label="EASY",
        subs=[],
    ),
    dict(
        q="Find the names of customers in nations of the ASIA region.",
        links="[customer.c_name,customer.c_nationkey = nation.n_nationkey,"
              "nation.n_regionkey = region.r_regionkey,region.r_name,ASIA]",
        tables="[customer,nation,region]",
        label="NON-NESTED",
        subs=[],
    ),
    dict(
        q="List the name of each nation and the number of its customers.",
        links="[nation.n_name,nation.n_nationkey = customer.c_nationkey,customer.*]",
        tables="[nation,customer]",
        label="NON-NESTED",
        subs=[],
    ),
    dict(
        q="Find the nations that have no orders.",
        links="[nation.n_name,nation.n_nationkey = customer.c_nationkey,"
              "customer.c_custkey = orders.o_custkey]",
        tables="[nation,customer,orders]",
        label="NESTED",
        subs=["Which nations have orders?"],
    ),
    dict(
        q="Find the names of parts whose retail price is above the average retail price.",
        links="[part.p_name,part.p_retailprice]",
        tables="[part]",
        label="NESTED",
        subs=["What is the average retail price of parts?"],
    ),
]


def render_classify_bank() -> str:
    blocks = []
    for ex in DIN_CLASSIFY_EXAMPLES:
        needs_join = "," in ex["tables"]
        nested = ex["label"] == "NESTED"
        join_clause = "so we need JOIN" if needs_join else "so we don't need JOIN"
        nest_clause = (
            "it requires nested queries with (INTERSECT, UNION, EXCEPT, IN, "
            "NOT IN)"
            if nested
            else "it doesn't require nested queries with (INTERSECT, UNION, "
            "EXCEPT, IN, NOT IN)"
        )
        subs = ",".join(f'"{s}"' for s in ex["subs"]) if ex["subs"] else '""'
        verdict = {
            "EASY": "we don't need JOIN and don't need nested queries",
            "NON-NESTED": "we need JOIN and don't need nested queries",
            "NESTED": "we need JOIN and need nested queries"
            if needs_join
            else "we need nested queries",
        }[ex["label"]]
        blocks.append(
            f'Q: "{ex["q"]}"\n'
            f"schema_links: {ex['links']}\n"
            "A: Let's think step by step. The SQL query for the question "
            f"needs these tables = {ex['tables']}, {join_clause}.\n"
            f"Plus, {nest_clause}, and we need the answer to the questions "
            f"= [{subs}].\n"
            f"So, {verdict}, then the SQL query can be classified as "
            f'"{ex["label"]}".\n'
            f'Label: "{ex["label"]}"'
        )
    return "\n".join(["\n\n".join(blocks), ""])


DIN_LINK_BANK = render_link_bank()
DIN_CLASSIFY_BANK = render_classify_bank()
