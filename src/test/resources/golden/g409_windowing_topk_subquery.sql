-- top-k per group through a Hive-dialect ranked subquery (the
-- WindowGroupLimit pushdown shape)
SELECT p_brand, p_name, r FROM (
  SELECT p_brand, p_name,
    rank() over(distribute by p_brand sort by p_retailprice desc, p_partkey) as r
  FROM part
) t WHERE r <= 3
