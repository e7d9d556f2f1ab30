-- vectorization_8.q shape: double/float arithmetic battery with
-- mixed-sign expressions, unary minus, and a compound WHERE over the
-- lineitem doubles — the codegen'd expression chain end-to-end.
SELECT count(*) AS n,
       round(sum(-(l_extendedprice) + l_tax * l_discount), 4) AS s1,
       round(avg(l_extendedprice * (1 - l_discount)), 4) AS s2,
       round(min(-(l_tax - l_discount)), 4) AS mn,
       round(max(l_extendedprice / (l_quantity + 1)), 4) AS mx
FROM lineitem
WHERE (l_discount < 0.05 AND l_tax > 0.01) OR l_quantity > 45
