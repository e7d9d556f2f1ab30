-- windowing.q t11/t13: named WINDOW spec in Hive dialect; first_value /
-- last_value(x, false) over a symmetric ROWS frame + a current-row-only sum
SELECT p_brand, p_name, p_size,
  sum(p_size) over (distribute by p_brand sort by p_name, p_partkey
    rows between current row and current row) as s2,
  first_value(p_size) over w1 as f,
  last_value(p_size, false) over w1 as l
FROM part
window w1 as (distribute by p_brand sort by p_name, p_partkey
  rows between 2 preceding and 2 following)
