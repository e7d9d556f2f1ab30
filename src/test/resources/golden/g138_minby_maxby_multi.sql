SELECT o_orderstatus,
  min_by(o_orderkey, o_totalprice) AS cheapest,
  max_by(o_orderkey, o_totalprice) AS dearest,
  min_by(o_custkey, o_orderdate) AS first_cust
FROM orders GROUP BY o_orderstatus
