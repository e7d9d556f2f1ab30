-- windowing_decimal.q: windowed aggregates over DECIMAL keep exact scale
SELECT l_orderkey, l_linenumber,
  sum(cast(l_extendedprice as decimal(12,2))) over
    (partition by l_orderkey order by l_linenumber) as runsum,
  max(cast(l_discount as decimal(4,2))) over (partition by l_orderkey) as maxd
FROM lineitem WHERE l_orderkey <= 100
