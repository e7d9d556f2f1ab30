SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) / 100 AS charge
FROM lineitem GROUP BY l_returnflag
