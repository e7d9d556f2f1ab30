-- windowing.q value-RANGE frames: peers dedup by ORDER-BY VALUE, so ties
-- are deterministic without a tiebreaker column
SELECT p_brand, p_size,
  sum(p_size) over (distribute by p_brand sort by p_size
    range between 5 preceding and current row) AS s_5p,
  sum(p_size) over (distribute by p_brand sort by p_size
    range between current row and 10 following) AS s_10f
FROM part
