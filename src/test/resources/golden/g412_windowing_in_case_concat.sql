-- window results consumed inside CASE and string expressions
SELECT p_brand, p_name,
  CASE WHEN rank() over w <= 2 THEN 'top' ELSE 'rest' END AS tier,
  concat(p_brand, '#', cast(row_number() over w AS STRING)) AS tag
FROM part
window w as (distribute by p_brand sort by p_retailprice desc, p_partkey)
