-- auto_join_reordering_values.q: a five-way join chain whose keys are
-- different COLUMNS of the same driving table (order key/date/customer/
-- priority) so join reordering must keep value semantics; ordered+limited
-- like the reference but made deterministic with ORDER BY before LIMIT.
SELECT dim_pay_date.d AS pay_date, deal.dl AS dealid
FROM (SELECT o_orderkey AS dl, o_orderdate AS d, o_custkey AS city,
             o_orderpriority AS pri
      FROM orders WHERE o_orderkey <= 40) orderpayment
JOIN (SELECT DISTINCT o_orderdate AS d FROM orders) dim_pay_date
  ON dim_pay_date.d = orderpayment.d
JOIN (SELECT DISTINCT o_orderkey AS dl FROM orders) deal
  ON deal.dl = orderpayment.dl
JOIN (SELECT DISTINCT o_custkey AS city FROM orders) order_city
  ON order_city.city = orderpayment.city
JOIN (SELECT DISTINCT o_orderpriority AS pri FROM orders) usr
  ON usr.pri = orderpayment.pri
ORDER BY pay_date, dealid LIMIT 5
